"""Blind noise-level estimation: statistical recovery + golden parity."""

import os

import numpy as np
import pytest
import jax.numpy as jnp

from cdlnet_tpu.nle import noise_level, nle_mad, nle_pca

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def make_noisy(sigma_255, shape=(1, 1, 128, 128), seed=0):
    rng = np.random.default_rng(seed)
    clean = 0.5 + 0.2 * np.sin(np.linspace(0, 8, shape[-1]))[None, None, None, :]
    clean = np.broadcast_to(clean, shape).astype(np.float32)
    return clean + (sigma_255 / 255.0) * rng.standard_normal(shape).astype(np.float32)


@pytest.mark.parametrize("sigma", [10.0, 25.0, 50.0])
def test_mad_recovers_sigma(sigma):
    y = jnp.asarray(make_noisy(sigma))
    est = 255.0 * np.asarray(nle_mad(y)).item()
    # bior4.4 HH norm is 0.983, so expect slight underestimate; 10% tolerance
    assert abs(est - sigma) / sigma < 0.10, (est, sigma)


@pytest.mark.parametrize("sigma", [10.0, 25.0])
def test_pca_recovers_sigma(sigma):
    y = jnp.asarray(make_noisy(sigma, seed=3))
    est, tau, num = nle_pca(y)
    est = 255.0 * float(est)
    assert abs(est - sigma) / sigma < 0.15, (est, sigma)
    assert float(num) > 49


def test_mad_batched_and_multichannel():
    y = jnp.asarray(
        np.concatenate([make_noisy(10.0, (1, 3, 64, 64), 1), make_noisy(30.0, (1, 3, 64, 64), 2)])
    )
    est = 255.0 * np.asarray(nle_mad(y)).reshape(-1)
    assert est.shape == (2,)
    assert abs(est[0] - 10) < 3 and abs(est[1] - 30) < 5


def test_dispatch():
    y = jnp.asarray(make_noisy(25.0))
    np.testing.assert_allclose(
        np.asarray(noise_level(y, True)), np.asarray(nle_mad(y))
    )
    with pytest.raises(NotImplementedError):
        noise_level(y, "nope")


@pytest.mark.skipif(
    not os.path.exists(os.path.join(GOLDEN, "nle.npz")), reason="golden not generated"
)
def test_nle_golden_parity():
    g = np.load(os.path.join(GOLDEN, "nle.npz"))
    y = jnp.asarray(g["y"])
    mad = np.asarray(nle_mad(y)).reshape(-1)
    np.testing.assert_allclose(mad, g["mad"].reshape(-1), rtol=1e-3)
    est, tau, num = nle_pca(y)
    np.testing.assert_allclose(float(est), float(g["pca"]), rtol=1e-2)
