"""Differentiable wrappers for the fused Pallas kernels.

Pallas kernels have no VJP, so a bare backend="pallas" model crashes under
jax.grad. These wrappers make the fused forward differentiable by pairing
it with the XLA scan path's gradient: the primal runs the fused kernel
(fast inference, and fast loss evaluation inside value_and_grad), while the
backward pass re-runs the XLA forward under jax.vjp and pulls gradients
through it.

Cost model: a training step through these wrappers pays
  pallas_forward + xla_forward + xla_backward
— i.e. training is never SLOWER than the pure XLA path by more than the
(cheap) fused forward, eval inside the same jitted graph gets the fused
speed, and gradients are exactly the XLA path's gradients evaluated at the
same inputs (the two forwards agree to kernel tolerance, ~1e-4 RMS, so the
loss cotangent fed into the VJP carries that deviation; over hundreds of
steps trajectories drift apart like any reordered-float training run, but
each step's gradient matches to ~1e-5). A hand-fused backward kernel can
replace the bwd half without touching callers.
"""

from __future__ import annotations

import functools

import jax


def _xla_forward_2d(yp, A, B, t, c, mask, stride):
    from cdlnet_tpu.ops.conv import conv_transpose2d
    from cdlnet_tpu.ops.lista import lista_2d

    P = A.shape[-1]
    z = lista_2d(yp, A, B, t, c, mask=mask, stride=stride)
    xphat = conv_transpose2d(
        z, B[0], stride=stride, padding=(P - 1) // 2, output_padding=stride - 1
    )
    return xphat


def _xla_forward_3d(yp, A, B, t, c, mask, stride):
    from cdlnet_tpu.ops.conv import conv_transpose3d
    from cdlnet_tpu.ops.lista import lista_3d

    pads = tuple(p // 2 for p in A.shape[-3:])
    z = lista_3d(yp, A, B, t, c, mask=mask, stride=stride)
    return conv_transpose3d(
        z, B[0], stride=stride, padding=pads, output_padding=stride - 1
    )


def _make_diff(fused_fn, xla_fn):
    @functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
    def diff(yp, A, B, t, c, mask, stride):
        x, _ = fused_fn(yp, A, B, t, c, stride=stride, mask=mask, return_z=False)
        return x

    def fwd(yp, A, B, t, c, mask, stride):
        x, _ = fused_fn(yp, A, B, t, c, stride=stride, mask=mask, return_z=False)
        return x, (yp, A, B, t, c, mask)

    def bwd(stride, res, g):
        yp, A, B, t, c, mask = res
        _, vjp = jax.vjp(
            lambda yp, A, B, t, c, mask: xla_fn(yp, A, B, t, c, mask, stride),
            yp, A, B, t, c, mask,
        )
        return vjp(g)

    diff.defvjp(fwd, bwd)
    return diff


def _fused_2d(*a, **kw):
    from cdlnet_tpu.kernels.lista2d import lista2d_fused

    return lista2d_fused(*a, **kw)


def _fused_3d(*a, **kw):
    from cdlnet_tpu.kernels.lista3d import lista3d_fused

    return lista3d_fused(*a, **kw)


_diff_2d = _make_diff(_fused_2d, _xla_forward_2d)
_diff_3d = _make_diff(_fused_3d, _xla_forward_3d)


def lista2d_fused_diff(yp, A, B, t, c, stride=1, mask=None):
    """Differentiable fused 2D LISTA + final synthesis. Returns xphat."""
    return _diff_2d(yp, A, B, t, c, mask, stride)


def lista3d_fused_diff(yp, A, B, t, c, stride=1, mask=None):
    """Differentiable fused 3D LISTA + final synthesis. Returns xphat."""
    return _diff_3d(yp, A, B, t, c, mask, stride)
