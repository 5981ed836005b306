"""Padding math parity with the reference formulas (model/utils.py:35-68)."""

import numpy as np
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from cdlnet_tpu.core.pad import (
    calc_pad_1d,
    calc_pad_2d,
    calc_pad_3d,
    pad_reflect_2d,
    pad_reflect_3d,
    unpad,
    unpad_3d,
)


def ref_calc_pad_1d(L, M):
    if L % M == 0:
        return [0, 0]
    Lprime = np.ceil(L / M) * M
    Ldiff = Lprime - L
    return [int(np.floor(Ldiff / 2)), int(np.ceil(Ldiff / 2))]


def test_calc_pad_1d_parity():
    for L in range(1, 50):
        for M in range(1, 9):
            assert list(calc_pad_1d(L, M)) == ref_calc_pad_1d(L, M), (L, M)


def test_calc_pad_2d_3d_shapes():
    assert calc_pad_2d(5, 7, 2) == (0, 1, 0, 1)
    assert calc_pad_2d(4, 4, 2) == (0, 0, 0, 0)
    pad = calc_pad_3d(3, 5, 7, 4)
    # W pads first, then H, then D
    assert pad == (0, 1, 1, 2, 0, 1)


def test_reflect_pad_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 11, 13)).astype(np.float32)
    pad = calc_pad_2d(11, 13, 4)
    ours = np.asarray(pad_reflect_2d(jnp.asarray(x), pad))
    theirs = F.pad(torch.from_numpy(x), pad, mode="reflect").numpy()
    np.testing.assert_allclose(ours, theirs, rtol=0, atol=0)


def test_reflect_pad_3d_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 1, 5, 11, 13)).astype(np.float32)
    pad = calc_pad_3d(5, 11, 13, 4)
    ours = np.asarray(pad_reflect_3d(jnp.asarray(x), pad))
    theirs = F.pad(torch.from_numpy(x), pad, mode="reflect").numpy()
    np.testing.assert_allclose(ours, theirs, rtol=0, atol=0)


def test_unpad_roundtrip():
    rng = np.random.default_rng(2)
    for H, W, M in [(11, 13, 4), (8, 8, 2), (7, 9, 2), (12, 10, 5)]:
        x = jnp.asarray(rng.standard_normal((1, 1, H, W)).astype(np.float32))
        pad = calc_pad_2d(H, W, M)
        assert unpad(pad_reflect_2d(x, pad), pad).shape == x.shape
        np.testing.assert_array_equal(np.asarray(unpad(pad_reflect_2d(x, pad), pad)), np.asarray(x))


def test_unpad_3d_roundtrip():
    rng = np.random.default_rng(3)
    for D, H, W, M in [(5, 11, 13, 4), (16, 8, 8, 2), (3, 7, 9, 2)]:
        x = jnp.asarray(rng.standard_normal((1, 1, D, H, W)).astype(np.float32))
        pad = calc_pad_3d(D, H, W, M)
        out = unpad_3d(pad_reflect_3d(x, pad), pad)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(x))
