"""Noise injection and observation masks — device-side, PRNG-key driven.

Reference semantics (utils.py:13-55): AWGN with sigma fixed or per-sample
uniform in [lo, hi] (on the [0,255] scale, applied /255); RGGB Bayer masks.
Unlike the reference these run on device inside the jitted train step, so the
host never touches the noise tensors.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _awgn(key, x: jnp.ndarray, noise_std, ndim_sigma: int):
    kn, ks = jax.random.split(key)
    if isinstance(noise_std, (list, tuple)):
        # Reference semantics (utils.py:37-41): only noise_std[0]/[1] are
        # read, so longer lists (args3dmri.json ships a 10-value one) sample
        # uniformly between the first two entries.
        lo, hi = noise_std[0], noise_std[1]
        sigma = lo + (hi - lo) * jax.random.uniform(
            ks, (x.shape[0],) + (1,) * (ndim_sigma - 1), x.dtype
        )
    else:
        sigma = jnp.asarray(noise_std, x.dtype)
    noisy = x + jax.random.normal(kn, x.shape, x.dtype) * (sigma / 255.0)
    return noisy, sigma


def awgn(key, x: jnp.ndarray, noise_std):
    """AWGN for (N, C, H, W); returns (noisy, sigma) with sigma (N,1,1,1) when
    noise_std is a (lo, hi) range."""
    return _awgn(key, x, noise_std, 4)


def awgn3d(key, x: jnp.ndarray, noise_std):
    """AWGN for (N, C, D, H, W); sigma shaped (N,1,1,1,1) for ranges."""
    return _awgn(key, x, noise_std, 5)


def gen_bayer_mask(x: jnp.ndarray) -> jnp.ndarray:
    """RGGB mask for (N, 3, H, W) color batches (utils.py:13-19)."""
    m = jnp.zeros_like(x)
    m = m.at[:, 0, 0::2, 0::2].set(1)  # R
    m = m.at[:, 1, 0::2, 1::2].set(1)  # G1
    m = m.at[:, 1, 1::2, 0::2].set(1)  # G2
    m = m.at[:, 2, 1::2, 1::2].set(1)  # B
    return m


def gen_bayer_mask3d(x: jnp.ndarray, degenerate: bool = True) -> jnp.ndarray:
    """Bayer mask for (N, C, D, H, W) video batches.

    The reference's version (utils.py:21-27) sets EVERY pixel of every channel
    to 1 — 3D demosaicing is effectively wired off. degenerate=True replicates
    that; degenerate=False applies a real per-frame RGGB pattern (fix)."""
    if degenerate:
        return jnp.ones_like(x)
    m = jnp.zeros_like(x)
    m = m.at[:, 0, :, 0::2, 0::2].set(1)
    m = m.at[:, 1, :, 0::2, 1::2].set(1)
    m = m.at[:, 1, :, 1::2, 0::2].set(1)
    m = m.at[:, 2, :, 1::2, 1::2].set(1)
    return m
