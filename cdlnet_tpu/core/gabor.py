"""Gabor filterbank synthesis from raw parameters.

h = exp(-||a * (x - x0)||^2) * cos(<w0, (x - x0)> + psi), evaluated on a
ks x ks grid centered at x0 = ((ks-1)/2, (ks-1)/2), batched over
(order, out_chan, in_chan). Reference: model/gabor.py:7-28.
"""

from __future__ import annotations

import jax.numpy as jnp


def gabor_kernel(a: jnp.ndarray, w0: jnp.ndarray, psi: jnp.ndarray, ks: int) -> jnp.ndarray:
    """Generate a batch of Gabor filters.

    a   (inverse width): (batch, oc, ic, 2)
    w0  (center freq):   (batch, oc, ic, 2)
    psi (phase):         (batch, oc, ic)
    returns h:           (batch, oc, ic, ks, ks)
    """
    a = a[:, :, :, None, None, :]
    w0 = w0[:, :, :, None, None, :]
    psi = psi[:, :, :, None, None]

    i = jnp.arange(ks, dtype=a.dtype)
    # grid of (i, j) coordinates, shape (ks, ks, 2) with 'ij' indexing
    x = jnp.stack(jnp.meshgrid(i, i, indexing="ij"), axis=2)[None, None]
    x0 = jnp.full((2,), (ks - 1) / 2.0, dtype=a.dtype)

    d = x - x0
    h = jnp.exp(-jnp.sum((a * d) ** 2, axis=-1)) * jnp.cos(jnp.sum(w0 * d, axis=-1) + psi)
    return h
