"""Convolution / transposed-convolution with reference (PyTorch) semantics.

Weights use the torch layout so reference checkpoints map 1:1
(compat/torch_ckpt.py):
  conv:           (out_ch, in_ch, *kernel)        — cross-correlation
  conv_transpose: (in_ch, out_ch, *kernel)        — gradient of conv

conv_transpose reproduces torch's
  ConvTranspose{2,3}d(stride=s, padding=p, output_padding=op)
exactly via lhs_dilation: dilate the input by s, pad each spatial dim with
(k-1-p) low / (k-1-p+op) high, and correlate with the spatially-flipped,
channel-swapped kernel. The reference always uses p=(P-1)//2 (or P//2 per-dim
in 3D) and op=s-1, giving exact sx upsampling (model/net.py:33,141).

Everything lowers to lax.conv_general_dilated, which XLA tiles onto the MXU;
the fused Pallas path lives in kernels/.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

_DIMNUMS = {
    2: ("NCHW", "OIHW", "NCHW"),
    3: ("NCDHW", "OIDHW", "NCDHW"),
}


def _tup(v, n):
    return tuple(v) if isinstance(v, (tuple, list)) else (v,) * n


def _convnd(x, w, stride, padding, nd):
    stride = _tup(stride, nd)
    if isinstance(padding, int):
        padding = [(padding, padding)] * nd
    elif padding and isinstance(padding[0], int):
        padding = [(p, p) for p in padding]
    return lax.conv_general_dilated(
        x,
        w,
        window_strides=stride,
        padding=padding,
        dimension_numbers=_DIMNUMS[nd],
        preferred_element_type=x.dtype,
    )


def _conv_transpose_nd(x, w, stride, padding, output_padding, nd):
    stride = _tup(stride, nd)
    padding = _tup(padding, nd)
    output_padding = _tup(output_padding, nd)
    k = w.shape[2:]
    # swap in/out channels, flip spatial dims
    w_t = jnp.swapaxes(w, 0, 1)[(slice(None), slice(None)) + (slice(None, None, -1),) * nd]
    pads = [
        (k[i] - 1 - padding[i], k[i] - 1 - padding[i] + output_padding[i])
        for i in range(nd)
    ]
    return lax.conv_general_dilated(
        x,
        w_t,
        window_strides=(1,) * nd,
        padding=pads,
        lhs_dilation=stride,
        dimension_numbers=_DIMNUMS[nd],
        preferred_element_type=x.dtype,
    )


def conv2d(x, w, stride=1, padding=0):
    """(N, C, H, W) x (M, C, kh, kw) -> (N, M, H', W'), torch Conv2d semantics."""
    return _convnd(x, w, stride, padding, 2)


def conv3d(x, w, stride=1, padding=0):
    """(N, C, D, H, W) x (M, C, kd, kh, kw) -> (N, M, ...), torch Conv3d semantics."""
    return _convnd(x, w, stride, padding, 3)


def conv_transpose2d(x, w, stride=1, padding=0, output_padding=0):
    """(N, M, H, W) x (M, C, kh, kw) -> (N, C, sH, sW), torch ConvTranspose2d."""
    return _conv_transpose_nd(x, w, stride, padding, output_padding, 2)


def conv_transpose3d(x, w, stride=1, padding=0, output_padding=0):
    """(N, M, D, H, W) x (M, C, kd, kh, kw) -> torch ConvTranspose3d semantics."""
    return _conv_transpose_nd(x, w, stride, padding, output_padding, 3)
