"""Differentiable wrappers for the fused Pallas kernels.

Pallas kernels have no VJP, so a bare backend="pallas" model crashes under
jax.grad. Two strategies:

2D (lista2d_fused_diff): FULLY fused custom VJP. The forward runs the
fused kernel with per-iteration codes streamed to HBM (return_hist); the
backward runs the hand-written reverse kernel (lista2d._kernel_bwd) that
recomputes each iteration from the stored code and accumulates weight /
threshold gradients VMEM-resident — no XLA scan on either side. Batch
folding (incl. per-sample sigma via the kernel's crow lane scales) happens
OUTSIDE the custom_vjp in plain differentiable reshapes, so the forward
and backward always agree on layout. Gradients match the XLA scan path to
kernel tolerance (~1e-5 on 1e0-scale weights, tested). Input / sigma /
mask cotangents are zero by construction: training differentiates w.r.t.
parameters only (MC-SURE's divergence term also only needs parameter
gradients, train.py:87-93).

3D (lista3d_fused_diff): also fully fused. return_hists=True collects
each iteration's code and residual (hist3d_dtype — bf16 by default,
CDLNET_HIST_DTYPE=f32 for exact grads): where it fits, the RESIDENT
forward DMA-streams them to HBM from inside the kernel (fp32 iteration,
only the stored copies round — the 2D contract); else the pair path
stacks them as scan outputs (there the carry IS the iteration state, so
bf16 also rounds the training primal). The backward is the
whole-reverse-RESIDENT kernel (kernels/lista3d_bwd_resident: one program
per sample, dv cotangent resident in VMEM across all K, DMA-streamed
histories/banks) when its working set fits, else a reverse lax.scan over
TWO merged pair-style kernels (kernels/lista3d_bwd) — the whole analysis
adjoint and the whole synthesis adjoint — with the ST subgradient read
straight off the stored codes. Routing lives in ONE place,
lista3d_reverse_path / lista3d_train_supported.

Input cotangents are ZERO BY CONSTRUCTION on the fused paths: training
differentiates w.r.t. parameters only (MC-SURE's divergence term is a
finite difference of two forwards, train.py:87-93, so it also needs only
parameter gradients). Do not use these wrappers for input-gradient work
(saliency, input optimization) — use backend="xla" for that.

When the reverse working set exceeds VMEM (big single images for 2D, big
frames for 3D), the custom VJPs keep the fused forward and fall back to
the XLA scan's gradient internally (fused_fwd + xla_fwd + xla_bwd) —
callers never lose the fused forward to a backward-size gate.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def nondifferentiable(fn, hint: str):
    """Wrap a positional-arg function so differentiating it raises a clear
    NotImplementedError (``hint``) instead of the internal pallas-call JVP
    assertion a bare kernel produces. Used on the inference-grade
    return_z=True kernel paths, which have no VJP by design (the
    differentiable paths are selected with return_z=False)."""
    wrapped = jax.custom_jvp(fn)

    @wrapped.defjvp
    def _jvp(primals, tangents):
        raise NotImplementedError(hint)

    return wrapped


_RETURN_Z_HINT = (
    "backend='pallas' apply() with return_z=True runs the inference-grade "
    "fused kernel, which has no gradient. To differentiate, call "
    "apply(..., return_z=False, train=True) (what train.fit does), or use "
    "backend='xla'."
)


def hist3d_dtype():
    """Back-compat alias of lista2d.hist_dtype (shared by 2D and 3D)."""
    from cdlnet_tpu.kernels.lista2d import hist_dtype

    return hist_dtype()


# ---------------------------------------------------------------------------
# 3D: fully fused custom VJP (pair-path forward collecting z/r histories +
# resident or scan reverse kernels). History carry per hist3d_dtype: bf16
# default; CDLNET_HIST_DTYPE=f32 matches the XLA scan's gradients to MXU
# reassociation tolerance.
# ---------------------------------------------------------------------------


def _xla_forward_3d(yp, A, B, t, c, mask, stride):
    """XLA scan forward (gradient fallback when the f32 history path's
    working set does not fit VMEM)."""
    from cdlnet_tpu.ops.conv import conv_transpose3d
    from cdlnet_tpu.ops.lista import lista_3d

    pads = tuple(p // 2 for p in A.shape[-3:])
    z = lista_3d(yp, A, B, t, c, mask=mask, stride=stride)
    return conv_transpose3d(
        z, B[0], stride=stride, padding=pads, output_padding=stride - 1
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _core3d(yp, A, B, t, c, mask, stride, interpret):
    # primal (no differentiation): inference-grade bf16 code carry — the
    # dtype the VMEM gate budgets and serve/streaming expect
    from cdlnet_tpu.kernels.lista3d import lista3d_fused

    x, _ = lista3d_fused(
        yp, A, B, t, c, stride=stride, mask=mask, return_z=False,
        interpret=interpret,
    )
    return x


def lista3d_reverse_path(M, C, P, s, K, D, H, W):
    """Which fused 3D reverse path the VJP will run: "resident",
    "scan", or None (XLA gradient fallback).

    The ONE routing decision shared by _core3d_fwd (store histories or
    not), _core3d_bwd (which reverse kernel), and
    CDLNetVideo._pallas_path (route the training step to pallas at all) —
    keeping three sites in sync by construction. Honors
    CDLNET_LISTA3D_BWD_RESIDENT=0 (force the scan-of-kernels reverse),
    still subject to the scan path's own VMEM gate."""
    import os

    from cdlnet_tpu.kernels.lista3d_bwd import lista3d_bwd_supported
    from cdlnet_tpu.kernels.lista3d_bwd_resident import (
        lista3d_bwd_resident_supported,
    )

    env = os.environ.get("CDLNET_LISTA3D_BWD_RESIDENT")
    if env != "0" and lista3d_bwd_resident_supported(M, C, P, s, K, D, H, W):
        return "resident"
    if lista3d_bwd_supported(M, C, P, s, K, D, H, W):
        return "scan"
    return None


def lista3d_train_supported(M, C, P, s, K, D, H, W):
    """True when the fully-fused 3D training path runs: a history-
    collecting forward fits (resident-hist or pair, at hist3d_dtype —
    lista3d_hist_forward_path) AND a reverse kernel fits."""
    from cdlnet_tpu.kernels.lista3d import lista3d_hist_forward_path

    return (
        lista3d_hist_forward_path(M, C, P, s, K, D, H, W) is not None
        and lista3d_reverse_path(M, C, P, s, K, D, H, W) is not None
    )


def _core3d_fwd(yp, A, B, t, c, mask, stride, interpret):
    from cdlnet_tpu.kernels.lista3d import lista3d_fused

    K, M = A.shape[0], A.shape[1]
    C = yp.shape[1]
    D, H, W = yp.shape[-3], yp.shape[-2], yp.shape[-1]
    if lista3d_train_supported(M, C, A.shape[-3:], stride, K, D, H, W):
        # fused gradient path. Resident-hist forward (the default where it
        # fits): fp32 iteration, histories DMA-streamed to HBM from inside
        # the kernel, only the STORED copies rounding to hist3d_dtype —
        # same contract as 2D. Pair fallback: the histories ARE the
        # iteration carry (bf16 default also rounds the training primal).
        x, _, (z_hist, r_hist) = lista3d_fused(
            yp, A, B, t, c, stride=stride, mask=mask, return_z=False,
            z_dtype=hist3d_dtype(), interpret=interpret, return_hists=True,
        )
        return x, (yp, A, B, t, c, mask, z_hist, r_hist)
    # history working set too big: bf16 fused forward + XLA grad fallback
    x, _ = lista3d_fused(
        yp, A, B, t, c, stride=stride, mask=mask, return_z=False,
        interpret=interpret,
    )
    return x, (yp, A, B, t, c, mask, None, None)


def _core3d_bwd(stride, interpret, res, gx):
    yp, A, B, t, c, mask, z_hist, r_hist = res
    if z_hist is None:  # XLA-gradient fallback
        _, vjp = jax.vjp(
            lambda A, B, t: _xla_forward_3d(yp, A, B, t, c, mask, stride),
            A, B, t,
        )
        dA, dB, dt = vjp(gx)
    else:
        from cdlnet_tpu.kernels.lista3d_bwd import lista3d_fused_bwd
        from cdlnet_tpu.kernels.lista3d_bwd_resident import (
            lista3d_fused_bwd_resident,
        )

        K, M = A.shape[0], A.shape[1]
        C = yp.shape[1]
        D, H, W = yp.shape[-3], yp.shape[-2], yp.shape[-1]
        # same routing decision _core3d_fwd made when it chose to store
        # histories (resident when it fits unless the env forces scan —
        # the whole-reverse-resident kernel keeps dv in VMEM, ~3.7x less
        # HBM traffic than the scan reverse)
        path = lista3d_reverse_path(M, C, A.shape[-3:], stride, K, D, H, W)
        run = (lista3d_fused_bwd_resident if path == "resident"
               else lista3d_fused_bwd)
        dA, dB, dt = run(
            gx, yp, A, B, t, c, mask, z_hist, r_hist, stride=stride,
            interpret=interpret,
        )
    dc = jnp.zeros_like(jnp.asarray(c))
    dmask = None if mask is None else jnp.zeros_like(mask)
    return (jnp.zeros_like(yp), dA, dB, dt, dc, dmask)


_core3d.defvjp(_core3d_fwd, _core3d_bwd)


# ---------------------------------------------------------------------------
# 2D: fully fused custom VJP (fused forward + hand-written reverse kernel)
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _core2d(yp, A, B, t, c, mask, stride, period, interpret):
    from cdlnet_tpu.kernels.lista2d import lista2d_fused

    x, _ = lista2d_fused(
        yp, A, B, t, c, stride=stride, mask=mask, return_z=False,
        _row_period=period, interpret=interpret,
    )
    return x


def _xla_forward_2d(yp, A, B, t, c, mask, stride):
    """XLA scan forward (gradient fallback when the reverse kernel's
    working set does not fit VMEM — e.g. big single images)."""
    from cdlnet_tpu.ops.conv import conv_transpose2d
    from cdlnet_tpu.ops.lista import lista_2d

    P = A.shape[-1]
    z = lista_2d(yp, A, B, t, c, mask=mask, stride=stride)
    return conv_transpose2d(
        z, B[0], stride=stride, padding=(P - 1) // 2,
        output_padding=stride - 1,
    )


def _core2d_fwd(yp, A, B, t, c, mask, stride, period, interpret):
    from cdlnet_tpu.kernels.lista2d import lista2d_bwd_supported, lista2d_fused

    K, M = A.shape[0], A.shape[1]
    C = yp.shape[1]
    if lista2d_bwd_supported(
        M, C, A.shape[-1], stride, K, yp.shape[-2], yp.shape[-1]
    ):
        x, _, hist = lista2d_fused(
            yp, A, B, t, c, stride=stride, mask=mask, return_z=False,
            _row_period=period, interpret=interpret, return_hist=True,
        )
        return x, (yp, A, B, t, c, mask, hist)
    # reverse-kernel working set too big: fused forward + XLA gradient
    x, _ = lista2d_fused(
        yp, A, B, t, c, stride=stride, mask=mask, return_z=False,
        _row_period=period, interpret=interpret,
    )
    return x, (yp, A, B, t, c, mask, None)


def _core2d_bwd(stride, period, interpret, res, gx):
    yp, A, B, t, c, mask, hist = res
    if hist is None:  # XLA-gradient fallback (reverse kernel didn't fit)
        # only reachable unfolded (period None): the folding wrapper gates
        # group sizes by the BACKWARD estimate, so folded calls always fit
        assert period is None, "folded shapes are gated to fit the bwd kernel"
        _, vjp = jax.vjp(
            lambda A, B, t: _xla_forward_2d(yp, A, B, t, c, mask, stride),
            A, B, t,
        )
        dA, dB, dt = vjp(gx)
    else:
        from cdlnet_tpu.kernels.lista2d import lista2d_fused_bwd

        dA, dB, dt = lista2d_fused_bwd(
            gx, yp, A, B, t, c, mask, hist, stride=stride,
            interpret=interpret, _row_period=period,
        )
    dc = jnp.zeros_like(jnp.asarray(c))
    dmask = None if mask is None else jnp.zeros_like(mask)
    return (jnp.zeros_like(yp), dA, dB, dt, dc, dmask)


_core2d.defvjp(_core2d_fwd, _core2d_bwd)


def lista2d_fused_diff(yp, A, B, t, c, stride=1, mask=None, interpret=False):
    """Differentiable fused 2D LISTA + final synthesis. Returns xphat.

    Folding (incl. per-sample sigma) lives here, outside the custom_vjp,
    as plain differentiable reshapes — the group size is gated by the
    BACKWARD kernel's VMEM estimate (it is the bigger working set)."""
    from cdlnet_tpu.kernels import lista2d as k2d

    N, C, H, W = yp.shape
    K, M = A.shape[0], A.shape[1]
    c = jnp.asarray(c, yp.dtype)
    if mask is None and N > 1:
        cf = c.reshape(-1)
        if cf.size == 1:
            cf = jnp.broadcast_to(cf, (N,))
        g = N
        while g > 1 and k2d._estimate_bytes_bwd(
            M, C, A.shape[-1], stride, K, g * H, W
        ) * 2.2 > k2d._VMEM_CAPACITY:
            g -= 1
        outs = []
        for i in range(0, N, g):
            grp, cg = yp[i : i + g], cf[i : i + g]
            n = grp.shape[0]
            if n == 1:
                outs.append(_core2d(grp, A, B, t, cg, None, stride, None, interpret))
            else:
                yf = grp.transpose(1, 0, 2, 3).reshape(1, C, n * H, W)
                xf = _core2d(yf, A, B, t, cg, None, stride,
                             H // stride, interpret)
                outs.append(xf.reshape(C, n, H, W).transpose(1, 0, 2, 3))
        return jnp.concatenate(outs, axis=0)
    return _core2d(yp, A, B, t, c, mask, stride, None, interpret)


def lista3d_fused_diff(yp, A, B, t, c, stride=1, mask=None, interpret=False):
    """Differentiable fused 3D LISTA + final synthesis. Returns xphat.

    Fully fused: pair-path forward (hist3d_dtype code carry — bf16 by
    default, so the training primal rounds with it; CDLNET_HIST_DTYPE=f32
    for exactness) collecting the per-iteration z/r histories (they
    stream through HBM anyway), then the whole-reverse-resident kernel —
    or the lista3d_bwd reverse scan — for the gradient
    (lista3d_reverse_path)."""
    return _core3d(yp, A, B, t, jnp.asarray(c), mask, stride, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _tiled2d(yp, A, B, t, c, mask, stride, interpret):
    from cdlnet_tpu.kernels.lista2d_tiled import lista2d_tiled

    x, _ = lista2d_tiled(yp, A, B, t, c, stride=stride, mask=mask,
                         return_z=False, interpret=interpret)
    return x


def _tiled2d_fwd(yp, A, B, t, c, mask, stride, interpret):
    from cdlnet_tpu.kernels.lista2d import hist_dtype
    from cdlnet_tpu.kernels.lista2d_tiled import lista2d_tiled
    from cdlnet_tpu.kernels.lista2d_tiled_bwd import (
        lista2d_tiled_bwd_supported,
    )

    K, M = A.shape[0], A.shape[1]
    C = yp.shape[1]
    H, W = yp.shape[-2], yp.shape[-1]
    if lista2d_tiled_bwd_supported(M, C, A.shape[-1], stride, K, H, W):
        # banded fused gradient path: stack the code/residual streams the
        # banded forward carries through HBM anyway
        x, _, (z_hist, r_hist) = lista2d_tiled(
            yp, A, B, t, c, stride=stride, mask=mask, return_z=False,
            z_dtype=hist_dtype(), interpret=interpret, return_hists=True,
        )
        return x, (yp, A, B, t, c, mask, z_hist, r_hist)
    # banded reverse doesn't fit: banded forward + XLA gradient fallback
    x, _ = lista2d_tiled(yp, A, B, t, c, stride=stride, mask=mask,
                         return_z=False, interpret=interpret)
    return x, (yp, A, B, t, c, mask, None, None)


def _tiled2d_bwd(stride, interpret, res, gx):
    yp, A, B, t, c, mask, z_hist, r_hist = res
    if z_hist is None:  # XLA-gradient fallback
        _, vjp = jax.vjp(
            lambda A, B, t: _xla_forward_2d(yp, A, B, t, c, mask, stride),
            A, B, t,
        )
        dA, dB, dt = vjp(gx)
    else:
        from cdlnet_tpu.kernels.lista2d_tiled_bwd import (
            lista2d_tiled_fused_bwd,
        )

        dA, dB, dt = lista2d_tiled_fused_bwd(
            gx, yp, A, B, t, c, mask, z_hist, r_hist, stride=stride,
            interpret=interpret,
        )
    dc = jnp.zeros_like(jnp.asarray(c))
    dmask = None if mask is None else jnp.zeros_like(mask)
    return (jnp.zeros_like(yp), dA, dB, dt, dc, dmask)


_tiled2d.defvjp(_tiled2d_fwd, _tiled2d_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _tiled3d(yp, A, B, t, c, mask, stride, interpret):
    from cdlnet_tpu.kernels.lista3d_tiled import lista3d_tiled

    x, _ = lista3d_tiled(yp, A, B, t, c, stride=stride, mask=mask,
                         return_z=False, interpret=interpret)
    return x


def _tiled3d_fwd(yp, A, B, t, c, mask, stride, interpret):
    from cdlnet_tpu.kernels.lista2d import hist_dtype
    from cdlnet_tpu.kernels.lista3d_tiled import lista3d_tiled
    from cdlnet_tpu.kernels.lista3d_tiled_bwd import (
        lista3d_tiled_bwd_supported,
    )

    K, M = A.shape[0], A.shape[1]
    C = yp.shape[1]
    D, H, W = yp.shape[-3], yp.shape[-2], yp.shape[-1]
    if lista3d_tiled_bwd_supported(M, C, A.shape[-3:], stride, K, D, H, W):
        # banded fused gradient path: stack the code/residual streams the
        # banded forward carries through HBM anyway (hist dtype carry —
        # bf16 default rounds the training primal like the pair path;
        # CDLNET_HIST_DTYPE=f32 for exactness). The band is picked JOINTLY
        # with the reverse kernels (the histories arrive banded at it).
        from cdlnet_tpu.kernels.lista3d_tiled_bwd import pick_band3_train

        Bh = pick_band3_train(M, C, A.shape[-3:], stride,
                              D // stride, H // stride, W // stride)
        x, _, (z_hist, r_hist) = lista3d_tiled(
            yp, A, B, t, c, stride=stride, mask=mask, return_z=False,
            z_dtype=hist_dtype(), interpret=interpret, return_hists=True,
            band=Bh,
        )
        return x, (yp, A, B, t, c, mask, z_hist, r_hist)
    # banded reverse doesn't fit: banded forward + XLA gradient fallback
    x, _ = lista3d_tiled(yp, A, B, t, c, stride=stride, mask=mask,
                         return_z=False, interpret=interpret)
    return x, (yp, A, B, t, c, mask, None, None)


def _tiled3d_bwd(stride, interpret, res, gx):
    yp, A, B, t, c, mask, z_hist, r_hist = res
    if z_hist is None:  # XLA-gradient fallback
        _, vjp = jax.vjp(
            lambda A, B, t: _xla_forward_3d(yp, A, B, t, c, mask, stride),
            A, B, t,
        )
        dA, dB, dt = vjp(gx)
    else:
        from cdlnet_tpu.kernels.lista3d_tiled_bwd import (
            lista3d_tiled_fused_bwd,
        )

        dA, dB, dt = lista3d_tiled_fused_bwd(
            gx, yp, A, B, t, c, mask, z_hist, r_hist, stride=stride,
            interpret=interpret,
        )
    dc = jnp.zeros_like(jnp.asarray(c))
    dmask = None if mask is None else jnp.zeros_like(mask)
    return (jnp.zeros_like(yp), dA, dB, dt, dc, dmask)


_tiled3d.defvjp(_tiled3d_fwd, _tiled3d_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _ring3d(yp, A, B, t, c, mask, stride, interpret):
    from cdlnet_tpu.kernels.lista3d_ring import lista3d_ring

    x, _ = lista3d_ring(yp, A, B, t, c, stride=stride, mask=mask,
                        return_z=False, interpret=interpret)
    return x


def _ring3d_fwd(yp, A, B, t, c, mask, stride, interpret):
    from cdlnet_tpu.kernels.lista2d import hist_dtype
    from cdlnet_tpu.kernels.lista3d_ring import lista3d_ring
    from cdlnet_tpu.kernels.lista3d_ring_bwd import pick_band_ring_train

    K, M = A.shape[0], A.shape[1]
    C = yp.shape[1]
    D, H, W = yp.shape[-3], yp.shape[-2], yp.shape[-1]
    hb = jnp.dtype(hist_dtype()).itemsize
    # the band is picked JOINTLY with the reverse (histories arrive banded
    # at it); gating happened in the caller (lista3d_bigframe_train_path)
    Bh = pick_band_ring_train(M, C, A.shape[-3:], stride,
                              D // stride, H // stride, W // stride,
                              hist_bytes=hb, use_mask=mask is not None)
    x, _, (z_hist, r_hist) = lista3d_ring(
        yp, A, B, t, c, stride=stride, mask=mask, return_z=False,
        z_dtype=hist_dtype(), interpret=interpret, return_hists=True,
        band=Bh,
    )
    return x, (yp, A, B, t, c, mask, z_hist, r_hist)


def _ring3d_bwd(stride, interpret, res, gx):
    from cdlnet_tpu.kernels.lista3d_ring_bwd import lista3d_ring_fused_bwd

    yp, A, B, t, c, mask, z_hist, r_hist = res
    dA, dB, dt = lista3d_ring_fused_bwd(
        gx, yp, A, B, t, c, mask, z_hist, r_hist, stride=stride,
        interpret=interpret,
    )
    dc = jnp.zeros_like(jnp.asarray(c))
    dmask = None if mask is None else jnp.zeros_like(mask)
    return (jnp.zeros_like(yp), dA, dB, dt, dc, dmask)


_ring3d.defvjp(_ring3d_fwd, _ring3d_bwd)


def lista3d_ring_diff(yp, A, B, t, c, stride=1, mask=None, interpret=False):
    """Depth-ring big-frame 3D fused forward (kernels/lista3d_ring),
    differentiable: the forward collects z/r histories ring-style
    (r on extended rows), the backward is the merged ring reverse
    (kernels/lista3d_ring_bwd) — dv read through a VMEM slab ring instead
    of the banded pair's per-tap band views. Callers gate on
    lista3d_bigframe_train_path. Returns xphat."""
    return _ring3d(yp, A, B, t, jnp.asarray(c), mask, stride, interpret)


def lista3d_bigframe_train_path(M, C, P, s, K, D, H, W, use_mask=False):
    """Which big-frame fused 3D TRAINING path applies: "ring" (merged
    ring reverse), "tiled" (banded pair reverse), or None (XLA gradient).
    The ONE routing decision shared by the model's _pallas_path and the
    diff wrappers. CDLNET_LISTA3D_RING=0 opts the ring out (same switch
    as inference); CDLNET_LISTA3D_RING_BWD=0 opts out only the ring
    REVERSE (banded training keeps running).

    Ring-vs-banded heuristic (measured r5, half-native on-chip): the
    reverse is ISSUE-bound on its per-grid-step tap-stack builds, not
    HBM-bound — the ring's dv-stream savings win modestly where the tap
    stack is small ((7,7,5): T*Cp=384, 334->294 ms/step) but LOSE where
    it is large ((9,9,5): T*Cp=600, 273->316 — the banded path's much
    taller band amortizes the builds better than the ring's f32-dv-ring-
    constrained band 32). Route ring only when T*Cp <= 512."""
    import os

    from cdlnet_tpu.kernels.lista3d_ring_bwd import (
        lista3d_ring_bwd_supported,
    )
    from cdlnet_tpu.kernels.lista3d_tiled import _geometry3

    hb = jnp.dtype(hist3d_dtype()).itemsize
    P_, pads, Qd, Qh, Qw, dlo, hlo, wlo, Hh = _geometry3(P, s)
    small_stack = Qd * Qh * Qw * C * s**3 <= 512
    if (small_stack
            and os.environ.get("CDLNET_LISTA3D_RING", "1") != "0"
            and os.environ.get("CDLNET_LISTA3D_RING_BWD", "1") != "0"
            and lista3d_ring_bwd_supported(M, C, P, s, K, D, H, W,
                                           hist_bytes=hb,
                                           use_mask=use_mask)):
        return "ring"
    if lista3d_tiled_train_supported(M, C, P, s, K, D, H, W):
        return "tiled"
    return None


def lista3d_tiled_diff(yp, A, B, t, c, stride=1, mask=None, interpret=False):
    """Banded big-frame 3D fused forward (kernels/lista3d_tiled),
    differentiable. When the banded reverse kernels fit
    (kernels/lista3d_tiled_bwd), the gradient is fully fused; otherwise
    the custom VJP falls back to the XLA scan's gradient. Returns xphat."""
    return _tiled3d(yp, A, B, t, jnp.asarray(c), mask, stride, interpret)


def lista3d_tiled_train_supported(M, C, P, s, K, D, H, W):
    """True when big-frame 3D training runs FULLY fused: the banded
    forward has a fitting band at the history dtype and the banded
    reverse kernels fit at that band (kernels/lista3d_tiled_bwd)."""
    from cdlnet_tpu.kernels.lista3d_tiled import lista3d_tiled_supported
    from cdlnet_tpu.kernels.lista3d_tiled_bwd import (
        lista3d_tiled_bwd_supported,
    )

    hb = jnp.dtype(hist3d_dtype()).itemsize
    return (
        lista3d_tiled_supported(M, C, P, s, K, D, H, W, z_bytes=hb)
        and lista3d_tiled_bwd_supported(M, C, P, s, K, D, H, W)
    )


def lista2d_tiled_diff(yp, A, B, t, c, stride=1, mask=None, interpret=False):
    """Banded big-image fused forward (kernels/lista2d_tiled),
    differentiable. When the banded whole-reverse-resident kernel fits
    (kernels/lista2d_tiled_bwd), the gradient is fully fused; otherwise
    the custom VJP falls back to the XLA scan's gradient. Returns xphat."""
    return _tiled2d(yp, A, B, t, jnp.asarray(c), mask, stride, interpret)


# ---------------------------------------------------------------------------
# CSR models: fused forward + XLA gradient
# ---------------------------------------------------------------------------


def _xla_lista2d_prox(yp, A, B, t, c, mask, g, zp, g2, za, stride):
    """XLA mirror of lista2d_fused's semantics including the CSR prox
    modes (gradient reference for csr_fused_2d). Returns (xphat, z)."""
    from cdlnet_tpu.core.ops import ST, prox_csr, prox_csr_f2
    from cdlnet_tpu.ops.conv import conv2d, conv_transpose2d

    K = A.shape[0]
    P = A.shape[-1]
    pad = (P - 1) // 2

    def thr(bank, k):
        return bank[k, 0:1] + c * bank[k, 1:2]

    def prox(u, k):
        if zp is not None and za is not None:
            return prox_csr_f2(u, zp, za, thr(t, k), thr(g, k), thr(g2, k))
        if zp is not None:
            return prox_csr(u, zp, thr(t, k), thr(g, k))
        if za is not None:
            return prox_csr(u, za, thr(t, k), thr(g2, k))
        return ST(u, thr(t, k))

    z = prox(conv2d(yp, A[0], stride=stride, padding=pad), 0)
    for k in range(1, K):
        s = conv_transpose2d(z, B[k], stride=stride, padding=pad,
                             output_padding=stride - 1)
        r = (mask * s if mask is not None else s) - yp
        z = prox(z - conv2d(r, A[k], stride=stride, padding=pad), k)
    xphat = conv_transpose2d(z, B[0], stride=stride, padding=pad,
                             output_padding=stride - 1)
    return xphat, z


def csr_fused_2d_train(yp, A, B, t, c, mask=None, g=None, z_prev=None,
                       g2=None, z_after=None, stride=1, interpret=False):
    """FULLY fused CSR training forward + backward.

    The forward runs lista2d_fused with the in-kernel prox (ST / prox_CSR
    / prox_CSR_f2 by neighbor availability), streaming per-iteration
    codes, prox arguments AND residuals to HBM; the backward is the
    hand-written whole-reverse kernel (lista2d._kernel_bwd prox modes),
    which recomputes every prox internal exactly from the stored prox
    argument u_k. Returns (xphat, z).

    Gradients flow to A/B/t/g/g2 AND to the carried neighbor codes
    z_prev/z_after (the frame recurrence in train/fit_csr.py
    backpropagates across frames), and the RETURNED code's cotangent
    seeds the reverse — unlike the parameter-only lista2d_fused_diff
    contract. yp / sigma / mask cotangents are zero by construction.
    Reference semantics: traincsr.py:192-217/:247-273 over
    model/net.py:426-463/:544-564."""
    from cdlnet_tpu.kernels.lista2d import lista2d_fused, lista2d_fused_bwd

    @functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
    def f(args, stride, interpret):
        yp, A, B, t, c, mask, g, zp, g2, za = args
        return lista2d_fused(yp, A, B, t, c, stride=stride, mask=mask,
                             return_z=True, g=g, z_prev=zp, g2=g2,
                             z_after=za, interpret=interpret)

    def fwd(args, stride, interpret):
        yp, A, B, t, c, mask, g, zp, g2, za = args
        x, z, hist = lista2d_fused(yp, A, B, t, c, stride=stride, mask=mask,
                                   return_z=True, g=g, z_prev=zp, g2=g2,
                                   z_after=za, return_hist=True,
                                   interpret=interpret)
        return (x, z), (args, hist)

    def bwd(stride, interpret, res, ct):
        args, hist = res
        yp, A, B, t, c, mask, g, zp, g2, za = args
        dx, dz = ct
        outs = lista2d_fused_bwd(
            dx, yp, A, B, t, c, mask, hist, stride=stride,
            interpret=interpret, g=g, z_prev=zp, g2=g2, z_after=za,
            dz_out=dz,
        )
        if len(outs) == 3:          # prox="st" (first-frame applies)
            dA, dB, dt = outs
            dg = dg2 = dzp = dza = None
        else:
            dA, dB, dt, dg, dg2, dzp, dza = outs

        def ct_of(x, d):
            # an input that was passed but is unused in this prox mode
            # (e.g. g in the z_after-only dispatch) gets a ZERO cotangent,
            # not None — custom_vjp must match the primal pytree
            if x is None:
                return None
            return d if d is not None else jnp.zeros_like(x)

        return ((jnp.zeros_like(yp), dA, dB, dt, jnp.zeros_like(c),
                 ct_of(mask, None), ct_of(g, dg), ct_of(zp, dzp),
                 ct_of(g2, dg2), ct_of(za, dza)),)

    f.defvjp(fwd, bwd)
    return f((yp, A, B, t, jnp.asarray(c), mask, g, z_prev, g2, z_after),
             stride, interpret)


def csr_fused_2d(yp, A, B, t, c, mask=None, g=None, z_prev=None, g2=None,
                 z_after=None, stride=1):
    """Fused CSR forward with XLA-autodiff gradients: the primal (and the
    forward inside value_and_grad) run the fused kernel with the in-kernel
    prox; the backward re-runs the XLA mirror under jax.vjp, so gradients
    flow through ALL differentiable inputs — including the carried
    neighbor codes z_prev / z_after, which the frame-recurrent training
    loop (train/fit_csr.py) backpropagates across frames. Cost model:
    fused_fwd + xla_fwd + xla_bwd per step. Returns (xphat, z)."""
    from cdlnet_tpu.kernels.lista2d import lista2d_fused

    @jax.custom_vjp
    def f(args):
        yp, A, B, t, c, mask, g, zp, g2, za = args
        return lista2d_fused(yp, A, B, t, c, stride=stride, mask=mask,
                             return_z=True, g=g, z_prev=zp, g2=g2, z_after=za)

    def fwd(args):
        return f(args), args

    def bwd(args, ct):
        def run(a):
            yp, A, B, t, c, mask, g, zp, g2, za = a
            return _xla_lista2d_prox(yp, A, B, t, c, mask, g, zp, g2, za,
                                     stride)
        _, vjp = jax.vjp(run, args)
        return vjp(ct)

    f.defvjp(fwd, bwd)
    return f((yp, A, B, t, jnp.asarray(c), mask, g, z_prev, g2, z_after))
