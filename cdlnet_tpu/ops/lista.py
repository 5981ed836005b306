"""Unrolled LISTA iterations as a lax.scan over stacked per-iteration weights.

The reference's hot loop (model/net.py:85-87 for 2D, :200-207 for 3D):

    z0    = ST(A0 y, tau_0)
    z_k   = ST(z - A_k (mask * B_k z - y), tau_k),   k = 1..K-1
    tau_k = t[k,0] + c * t[k,1]          (c = sigma/255 if adaptive else 0)

Here all K analysis filters are stacked into A: (K, M, C, *P), synthesis
filters into B: (K, M, C, *P), and thresholds into t: (K, 2, M, 1, 1[, 1]),
so a single traced conv/conv-transpose pair covers any K — XLA compiles the
body once and the scan iterates on device. Set unroll>1 to trade compile time
for fusion across iterations.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from cdlnet_tpu.core.ops import ST
from cdlnet_tpu.ops.conv import (
    conv2d,
    conv3d,
    conv_transpose2d,
    conv_transpose3d,
)


def _threshold(t_k, c):
    """tau_k = t[k, 0:1] + c * t[k, 1:2]; broadcasts (1,M,1,1[,1]) with c."""
    return t_k[0:1] + c * t_k[1:2]


def lista_2d(yp, A, B, t, c, mask=None, stride=1, unroll=1, return_codes=False):
    """Run the K-iteration 2D LISTA loop.

    yp:   (N, C, H, W) pre-processed input (mean-subtracted, stride-padded)
    A:    (K, M, C, P, P) analysis conv weights (torch OIHW layout)
    B:    (K, M, C, P, P) synthesis conv-transpose weights
    t:    (K, 2, M, 1, 1) thresholds
    c:    scalar or (N, 1, 1, 1) threshold scale factor (sigma/255)
    mask: optional (N, C, H, W) observation mask (JDD); None = no mask
    Returns final codes z: (N, M, H/s, W/s); with return_codes=True also the
    per-iteration stack (K, N, M, H/s, W/s).
    """
    P = A.shape[-1]
    pad = (P - 1) // 2

    def analysis(x, w):
        return conv2d(x, w, stride=stride, padding=pad)

    def synthesis(z, w):
        return conv_transpose2d(z, w, stride=stride, padding=pad, output_padding=stride - 1)

    return _lista(yp, A, B, t, c, mask, analysis, synthesis, unroll, return_codes)


def lista_3d(
    yp, A, B, t, c, mask=None, stride=1, residual=None, unroll=1, return_codes=False
):
    """Run the K-iteration 3D (video) LISTA loop.

    yp: (N, C, D, H, W); A, B: (K, M, C, Pd, Ph, Pw); t: (K, 2, M, 1, 1, 1).
    residual: optional dict with conv1/conv2: (K, M, M, 3, 3, 3) — per-iteration
    ResidualBlocks applied after each threshold (model/net.py:146-151,200-207).
    """
    Pd, Ph, Pw = A.shape[-3:]
    pad = (Pd // 2, Ph // 2, Pw // 2)

    def analysis(x, w):
        return conv3d(x, w, stride=stride, padding=pad)

    def synthesis(z, w):
        return conv_transpose3d(z, w, stride=stride, padding=pad, output_padding=stride - 1)

    if residual is None:
        return _lista(yp, A, B, t, c, mask, analysis, synthesis, unroll, return_codes)

    def res_block(z, w1, w2):
        out = jax.nn.relu(conv3d(z, w1, stride=1, padding=1))
        out = conv3d(out, w2, stride=1, padding=1)
        return jax.nn.relu(out + z)

    z = ST(analysis(yp, A[0]), _threshold(t[0], c))
    z = res_block(z, residual["conv1"][0], residual["conv2"][0])
    codes = [z] if return_codes else None

    def body(z, wk):
        Ak, Bk, tk, r1, r2 = wk
        Bz = synthesis(z, Bk)
        r = Bz - yp if mask is None else mask * Bz - yp
        z = ST(z - analysis(r, Ak), _threshold(tk, c))
        z = res_block(z, r1, r2)
        return z, (z if return_codes else None)

    xs = (A[1:], B[1:], t[1:], residual["conv1"][1:], residual["conv2"][1:])
    z, ys = lax.scan(body, z, xs, unroll=unroll)
    if return_codes:
        return z, jnp.concatenate([codes[0][None], ys], axis=0)
    return z


def _lista(yp, A, B, t, c, mask, analysis, synthesis, unroll, return_codes):
    z = ST(analysis(yp, A[0]), _threshold(t[0], c))

    def body(z, wk):
        Ak, Bk, tk = wk
        Bz = synthesis(z, Bk)
        r = Bz - yp if mask is None else mask * Bz - yp
        z = ST(z - analysis(r, Ak), _threshold(tk, c))
        return z, (z if return_codes else None)

    z_final, ys = lax.scan(body, z, (A[1:], B[1:], t[1:]), unroll=unroll)
    if return_codes:
        return z_final, jnp.concatenate([z[None], ys], axis=0)
    return z_final
