"""Stride-divisibility padding math.

Pure-Python shape arithmetic (static under jit) plus jnp slicing.
Semantics match the reference formulas in model/utils.py:35-68,100-122
(pad split floor/ceil, reflect mode, unpad as negative slicing).

Pad tuples follow the torch F.pad ordering used by the reference:
  2D: (left, right, top, bottom)             — i.e. W first, then H
  3D: (left, right, top, bottom, front, back) — W, H, then D
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def calc_pad_1d(L: int, M: int) -> tuple[int, int]:
    """Pad sizes (lo, hi) so a length-L signal is divisible by M."""
    if L % M == 0:
        return (0, 0)
    Ldiff = math.ceil(L / M) * M - L
    return (Ldiff // 2, Ldiff - Ldiff // 2)


def calc_pad_2d(H: int, W: int, M: int) -> tuple[int, int, int, int]:
    """(left, right, top, bottom) pads so (H, W) divide M."""
    return (*calc_pad_1d(W, M), *calc_pad_1d(H, M))


def calc_pad_3d(D: int, H: int, W: int, M: int) -> tuple[int, int, int, int, int, int]:
    """(left, right, top, bottom, front, back) pads so (D, H, W) divide M."""
    return (*calc_pad_1d(W, M), *calc_pad_1d(H, M), *calc_pad_1d(D, M))


def pad_reflect_2d(x: jnp.ndarray, pad: tuple[int, int, int, int]) -> jnp.ndarray:
    """Reflect-pad the trailing (H, W) dims of an (..., H, W) array."""
    l, r, t, b = pad
    if l == r == t == b == 0:
        return x
    widths = [(0, 0)] * (x.ndim - 2) + [(t, b), (l, r)]
    return jnp.pad(x, widths, mode="reflect")


def pad_reflect_3d(x: jnp.ndarray, pad: tuple[int, int, int, int, int, int]) -> jnp.ndarray:
    """Reflect-pad the trailing (D, H, W) dims of an (..., D, H, W) array."""
    l, r, t, b, f, k = pad
    if l == r == t == b == f == k == 0:
        return x
    widths = [(0, 0)] * (x.ndim - 3) + [(f, k), (t, b), (l, r)]
    return jnp.pad(x, widths, mode="reflect")


def unpad(x: jnp.ndarray, pad: tuple[int, int, int, int]) -> jnp.ndarray:
    """Invert pad_reflect_2d on the trailing (H, W) dims."""
    l, r, t, b = pad
    H, W = x.shape[-2], x.shape[-1]
    return x[..., t : H - b, l : W - r]


def unpad_3d(x: jnp.ndarray, pad: tuple[int, int, int, int, int, int]) -> jnp.ndarray:
    """Invert pad_reflect_3d on the trailing (D, H, W) dims."""
    l, r, t, b, f, k = pad
    D, H, W = x.shape[-3], x.shape[-2], x.shape[-1]
    return x[..., f : D - k, t : H - b, l : W - r]


def conv_pad(x: jnp.ndarray, ks: int, mode: str) -> jnp.ndarray:
    """Pad trailing 2 dims for a same-size convolution with kernel size ks."""
    lo, hi = (ks - 1) // 2, ks - 1 - (ks - 1) // 2
    widths = [(0, 0)] * (x.ndim - 2) + [(lo, hi), (lo, hi)]
    return jnp.pad(x, widths, mode=mode)
