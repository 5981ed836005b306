"""Fused backward for the 3D (video) LISTA iteration pair.

Companion to kernels/lista3d.lista3d_fused(return_hists=True): the forward
pair already streams each iteration's code z_k and residual r_k through
HBM, so the scan simply stacks them and the backward never recomputes the
forward. Like the 2D reverse kernel (lista2d._kernel_bwd), the ST
subgradient comes straight from the stored code — sign(z_k) IS
sign(v_k)*1{active} — and every contraction is MXU-shaped.

The reverse loop is a lax.scan over k (mirroring the forward's structure)
whose body runs four Pallas kernels per iteration:

  _kernel_syn_adj    dz[d]  = sum_j B2m[j]^T stack2(ds[d - dq_j])
                     (adjoint of the synthesis depth gather + roll-out)
  _kernel_syn_wgrad  dB2m[j] += sum_{n,d} stack2(ds[d]) @ z[d + dq_j]^T
                     (contract over Lhw — thousands deep)
  _kernel_ana_wgrad  dA2m += -sum_{n,d} dv[d] @ stack(r_k)[d]^T, and
                     w[d] = -A2m^T dv[d]  (the stack cotangent)
  _kernel_stack_adj  dr[e] = sum_j unroll_j(w[e - dq_aj])
                     (adjoint of the analysis window stacking)

dv / sign bookkeeping and the dt reductions are plain XLA elementwise work
between the kernel calls. (Folding them INTO _kernel_ana_wgrad was tried
and reverted: adding the dv and small dt outputs made XLA fuse the pallas
custom-call with the reverse scan's output dynamic-update-slices into a
fusion whose scoped-vmem stack exceeded the non-overridable 16 MB limit —
"should not be possible ... please file a bug against XLA".) Weight gradients come back per-iteration as scan
outputs and are transported to the torch weight layout through the vjp of
the (linear) polyphase weight prep.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

from cdlnet_tpu.kernels.lista2d import _axis_masks
from cdlnet_tpu.kernels.lista3d import _geom
from cdlnet_tpu.ops import polyphase as pp


def lista3d_bwd_supported(M, C, P, s, K, D, H, W) -> bool:
    """True when the fused 3D backward kernels fit VMEM for a padded input.

    The forward gate (lista3d.lista3d_fused_supported, z_bytes=4) budgets
    only the forward pair's working set; the reverse scan peaks higher in
    _kernel_ana_wgrad — double-buffered (T*Cp, Lhw) w output blocks PLUS a
    same-size stack scratch, dv blocks, Qd r-view blocks, and the resident
    A2m/dA pair (~1.6x the forward's bytes). Mirror of
    lista2d.lista2d_bwd_supported; gate the fp32-history gradient path on
    BOTH estimates (autodiff._core3d_fwd) or near-boundary shapes pass the
    forward check and OOM Mosaic VMEM in the reverse scan at training time.
    """
    if D % s or H % s or W % s:
        return False
    P = (P,) * 3 if isinstance(P, int) else tuple(P)
    pads = tuple(p // 2 for p in P)
    (dlo, dhi), (hlo, hhi), (wlo, whi) = _geom(P, pads, s)
    Qd, Qh, Qw = dhi - dlo + 1, hhi - hlo + 1, whi - wlo + 1
    T = Qd * Qh * Qw
    Cp = C * s**3
    Lhw = (H // s) * (W // s)
    Mp = -(-M // 8) * 8
    est = (
        3 * T * Cp * Lhw        # 2x double-buffered w out blocks + stack scratch
        + 2 * Mp * Lhw          # dv in blocks (double-buffered)
        + 2 * Qd * Cp * Lhw     # Qd r-view blocks (double-buffered)
        + 2 * Mp * T * Cp       # resident A2m + revisited dA accumulator
        + (Qh + Qw) * Lhw       # col/row masks
    ) * 4
    from cdlnet_tpu.kernels.lista3d import _VMEM_BUDGET

    return est < _VMEM_BUDGET


def _roll(pltpu, buf, off, Lhw):
    return pltpu.roll(buf, (-off) % Lhw, 1) if off % Lhw else buf


def _kernel_syn_adj(g_ref, B2m_ref, sm_ref, dz_ref,
                    *, Qd, Qh, Qw, Cp, Wc, dlo, hlo, wlo):
    """dz[d] += valid * B2m[j]^T @ stack2(g[d - dq_j]); grid (N, Dc, Qd),
    depth tap j innermost revisiting the dz block. stack2_t =
    roll(g * sm_t, -off_t) — adjoint of the forward's output-side rolls
    (the roll/mask factors commute with the lane-pointwise contraction,
    see lista3d._kernel_syn)."""
    from jax.experimental.pallas import tpu as pltpu

    d = pl.program_id(1)
    Dc = pl.num_programs(1)
    j = pl.program_id(2)
    Lhw = g_ref.shape[-1]
    roll = functools.partial(_roll, pltpu, Lhw=Lhw)

    @pl.when(j == 0)
    def _init():
        dz_ref[0, 0] = jnp.zeros_like(dz_ref[0, 0])

    dq = j - (Qd - 1) - dlo
    valid = jnp.logical_and(d - dq >= 0, d - dq < Dc)
    g = g_ref[0, 0].astype(jnp.float32)
    rows = []
    for qi in range(Qh):
        for ri in range(Qw):
            t = qi * Qw + ri
            off = (qi - (Qh - 1) - hlo) * Wc + (ri - (Qw - 1) - wlo)
            rows.append(roll(g * sm_ref[t][None, :], -off))
    stack2 = jnp.concatenate(rows, axis=0)  # (Qh*Qw*Cp, Lhw)
    dzc = jax.lax.dot_general(
        B2m_ref[0], stack2, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Mp, Lhw)
    dz_ref[0, 0] += jnp.where(valid, 1.0, 0.0) * dzc


def _kernel_syn_wgrad(g_ref, z_ref, sm_ref, dB_ref,
                      *, Qd, Qh, Qw, Cp, Wc, dlo, hlo, wlo):
    """dB2m[j] += valid * stack2(g[d]) @ z[d + dq_j]^T; grid (Qd, N, Dc) —
    j OUTER so the (1, Qh*Qw*Cp, Mp) accumulator block is revisited over
    consecutive (n, d) steps; contraction over Lhw. (A variant that built
    stack2 once per (n, d) under a single full-dB program measured ~15%
    SLOWER end-to-end — the per-j grid's block pipelining wins over saving
    the repeated stack2 rolls.)"""
    from jax.experimental.pallas import tpu as pltpu

    j = pl.program_id(0)
    n = pl.program_id(1)
    d = pl.program_id(2)
    Dc = pl.num_programs(2)
    Lhw = g_ref.shape[-1]
    roll = functools.partial(_roll, pltpu, Lhw=Lhw)

    @pl.when(jnp.logical_and(n == 0, d == 0))
    def _init():
        dB_ref[0] = jnp.zeros_like(dB_ref[0])

    dq = j - (Qd - 1) - dlo
    valid = jnp.logical_and(d + dq >= 0, d + dq < Dc)
    g = g_ref[0, 0].astype(jnp.float32)
    rows = []
    for qi in range(Qh):
        for ri in range(Qw):
            t = qi * Qw + ri
            off = (qi - (Qh - 1) - hlo) * Wc + (ri - (Qw - 1) - wlo)
            rows.append(roll(g * sm_ref[t][None, :], -off))
    stack2 = jnp.concatenate(rows, axis=0)
    zj = z_ref[0, 0].astype(jnp.float32)
    dB_ref[0] += jnp.where(valid, 1.0, 0.0) * jax.lax.dot_general(
        stack2, zj, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _kernel_ana_wgrad(*refs, Qd, Qh, Qw, Cp, Wc, dlo, hlo, wlo,
                      want_w=True):
    """dA2m += -dv[d] @ stack(r)[d]^T (revisited, contract Lhw) and
    w[d] = -A2m^T @ dv[d]; grid (N, Dc). refs: Qd r views (1,1,Cp,Lhw),
    dv (1,1,Mp,Lhw), A2m (Mp, T*Cp), acol (Qw, Lhw), arow (Qh, Lhw);
    outputs dA (Mp, T*Cp), w (1,1,T*Cp,Lhw); scratch stack (T*Cp, Lhw).
    Window stacking identical to lista3d._kernel_ana. want_w=False (the
    k=0 step, whose dz chain ends) skips the w dot and its HBM write —
    the w output is a dummy scalar."""
    from jax.experimental.pallas import tpu as pltpu

    rviews = refs[:Qd]
    dv_ref, A2m_ref, acol_ref, arow_ref, dA_ref, w_ref, stack_ref = refs[Qd:]
    n = pl.program_id(0)
    d = pl.program_id(1)
    Dc = pl.num_programs(1)
    Lhw = dv_ref.shape[-1]
    roll = functools.partial(_roll, pltpu, Lhw=Lhw)

    @pl.when(jnp.logical_and(n == 0, d == 0))
    def _init():
        dA_ref[:] = jnp.zeros_like(dA_ref)

    for j in range(Qd):
        dq = dlo + j
        valid = jnp.where(jnp.logical_and(d + dq >= 0, d + dq < Dc), 1.0, 0.0)
        rj = rviews[j][0, 0].astype(jnp.float32) * valid
        for qi in range(Qh):
            rowed = roll(rj, (hlo + qi) * Wc) * arow_ref[qi][None, :]
            for ri in range(Qw):
                t = (j * Qh + qi) * Qw + ri
                stack_ref[t * Cp : (t + 1) * Cp] = (
                    roll(rowed, wlo + ri) * acol_ref[ri][None, :]
                )

    dv = dv_ref[0, 0].astype(jnp.float32)
    dA_ref[:] += -jax.lax.dot_general(
        dv, stack_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if want_w:
        w_ref[0, 0] = -jax.lax.dot_general(
            A2m_ref[:], dv, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )


def _kernel_stack_adj(w_ref, acol_ref, arow_ref, dr_ref,
                      *, Qd, Qh, Qw, Cp, Wc, dlo, hlo, wlo):
    """dr[e] += valid * unroll_j(w[e - dq_aj] rows of depth-tap block j);
    grid (N, Dc, Qd), j innermost revisiting the dr block. Adjoint of the
    analysis stacking: inner = roll(acol_ri * w_t, -(wlo+ri)),
    dr += roll(arow_qi * inner, -(hlo+qi)*Wc)."""
    from jax.experimental.pallas import tpu as pltpu

    d = pl.program_id(1)
    Dc = pl.num_programs(1)
    j = pl.program_id(2)
    Lhw = w_ref.shape[-1]
    roll = functools.partial(_roll, pltpu, Lhw=Lhw)

    @pl.when(j == 0)
    def _init():
        dr_ref[0, 0] = jnp.zeros_like(dr_ref[0, 0])

    dq = dlo + j
    valid = jnp.logical_and(d - dq >= 0, d - dq < Dc)
    acc = jnp.zeros(dr_ref.shape[-2:], jnp.float32)
    for qi in range(Qh):
        inner = jnp.zeros(dr_ref.shape[-2:], jnp.float32)
        for ri in range(Qw):
            t = qi * Qw + ri  # depth-tap block selected by the BlockSpec
            wt = w_ref[0, 0, t * Cp : (t + 1) * Cp].astype(jnp.float32)
            inner += roll(acol_ref[ri][None, :] * wt, -(wlo + ri))
        acc += roll(arow_ref[qi][None, :] * inner, -(hlo + qi) * Wc)
    dr_ref[0, 0] += jnp.where(valid, 1.0, 0.0) * acc


def lista3d_fused_bwd(dxp, yp, A, B, t, c, mask, z_hist, r_hist, stride=1,
                      interpret=False):
    """Backward of the fused 3D LISTA + final synthesis.

    dxp: cotangent of xphat (N, C, D, H, W); z_hist (K, N, Dc, Mp, Lhw) and
    r_hist (K-1, N, Dc, Cp, Lhw) from lista3d_fused(return_hists=True).
    Returns (dA, dB, dt) in the torch weight layouts. Input/sigma/mask
    cotangents are zero by construction (training differentiates w.r.t.
    parameters only)."""
    from jax.experimental.pallas import tpu as pltpu

    N, C, D, H, W = yp.shape
    K, M = A.shape[0], A.shape[1]
    P = A.shape[-3:]
    s = stride
    pads = tuple(p // 2 for p in P)
    Dc, Hc, Wc = D // s, H // s, W // s
    Lhw = Hc * Wc
    Cp = C * s**3

    (dlo, dhi), (hlo, hhi), (wlo, whi) = _geom(P, pads, s)
    Qd, Qh, Qw = dhi - dlo + 1, hhi - hlo + 1, whi - wlo + 1
    T = Qd * Qh * Qw
    Mp = -(-M // 8) * 8

    # --- weight prep: the forward's own (shared) layout functions,
    # wrapped in vjp so the polyphase-domain gradients transport back
    # exactly (linear maps) ---
    from cdlnet_tpu.kernels.lista3d import prep_A2m_3d, prep_B2m_3d

    A2m, vjpA = jax.vjp(lambda Aw: prep_A2m_3d(Aw, s, pads), A)
    B2m, vjpB = jax.vjp(lambda Bw: prep_B2m_3d(Bw, s, pads), B)

    y5 = pp.space_to_depth(yp, s, 3)
    y2 = y5.transpose(0, 2, 1, 3, 4).reshape(N, Dc, Cp, Lhw)
    dx5 = pp.space_to_depth(dxp, s, 3)
    dx2 = dx5.transpose(0, 2, 1, 3, 4).reshape(N, Dc, Cp, Lhw)
    use_mask = mask is not None
    m2 = (
        pp.space_to_depth(jnp.broadcast_to(mask, yp.shape), s, 3)
        .transpose(0, 2, 1, 3, 4)
        .reshape(N, Dc, Cp, Lhw)
        if use_mask
        else None
    )

    acol = jnp.asarray(_axis_masks([wlo + ri for ri in range(Qw)], Hc, Wc, 1))
    arow = jnp.asarray(_axis_masks([hlo + qi for qi in range(Qh)], Hc, Wc, 0))
    scol = jnp.asarray(
        _axis_masks([ri - (Qw - 1) - wlo for ri in range(Qw)], Hc, Wc, 1)
    )
    srow = jnp.asarray(
        _axis_masks([qi - (Qh - 1) - hlo for qi in range(Qh)], Hc, Wc, 0)
    )
    sm = (srow[:, None, :] * scol[None, :, :]).reshape(Qh * Qw, Lhw)

    geom = dict(Qd=Qd, Qh=Qh, Qw=Qw, Cp=Cp, Wc=Wc, dlo=dlo, hlo=hlo, wlo=wlo)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)

    def syn_adj(g, B2m_k):
        kern = functools.partial(_kernel_syn_adj, **geom)
        gview = pl.BlockSpec(
            (1, 1, Cp, Lhw),
            lambda n, d, j: (n, jnp.clip(d - (j - (Qd - 1) - dlo), 0, Dc - 1), 0, 0),
            memory_space=pltpu.VMEM,
        )
        return pl.pallas_call(
            kern,
            grid=(N, Dc, Qd),
            in_specs=[gview,
                      pl.BlockSpec((1, Qh * Qw * Cp, Mp),
                                   lambda n, d, j: (j, 0, 0),
                                   memory_space=pltpu.VMEM),
                      full],
            out_specs=pl.BlockSpec((1, 1, Mp, Lhw), lambda n, d, j: (n, d, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N, Dc, Mp, Lhw), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024,
            ),
            interpret=interpret,
        )(g, B2m_k, sm)

    def syn_wgrad(g, z):
        kern = functools.partial(_kernel_syn_wgrad, **geom)
        zview = pl.BlockSpec(
            (1, 1, Mp, Lhw),
            lambda j, n, d: (n, jnp.clip(d + j - (Qd - 1) - dlo, 0, Dc - 1), 0, 0),
            memory_space=pltpu.VMEM,
        )
        return pl.pallas_call(
            kern,
            grid=(Qd, N, Dc),
            in_specs=[pl.BlockSpec((1, 1, Cp, Lhw), lambda j, n, d: (n, d, 0, 0),
                                   memory_space=pltpu.VMEM),
                      zview,
                      full],
            out_specs=pl.BlockSpec((1, Qh * Qw * Cp, Mp),
                                   lambda j, n, d: (j, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Qd, Qh * Qw * Cp, Mp), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024,
            ),
            interpret=interpret,
        )(g, z, sm)

    def ana_wgrad(dv, r, A2m_k, want_w=True):
        kern = functools.partial(_kernel_ana_wgrad, **geom, want_w=want_w)
        rviews = []
        for j in range(Qd):
            dq = dlo + j
            rviews.append(pl.BlockSpec(
                (1, 1, Cp, Lhw),
                lambda n, d, dq=dq: (n, jnp.clip(d + dq, 0, Dc - 1), 0, 0),
                memory_space=pltpu.VMEM,
            ))
        return pl.pallas_call(
            kern,
            grid=(N, Dc),
            in_specs=[*rviews,
                      pl.BlockSpec((1, 1, Mp, Lhw), lambda n, d: (n, d, 0, 0),
                                   memory_space=pltpu.VMEM),
                      full, full, full],
            out_specs=[
                pl.BlockSpec((Mp, T * Cp), lambda n, d: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, T * Cp, Lhw), lambda n, d: (n, d, 0, 0),
                             memory_space=pltpu.VMEM)
                if want_w
                else pl.BlockSpec((1, 1, 1, 1), lambda n, d: (0, 0, 0, 0),
                                  memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((Mp, T * Cp), jnp.float32),
                jax.ShapeDtypeStruct(
                    (N, Dc, T * Cp, Lhw) if want_w else (1, 1, 1, 1),
                    jnp.float32,
                ),
            ],
            scratch_shapes=[pltpu.VMEM((T * Cp, Lhw), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024,
            ),
            interpret=interpret,
        )(*([r] * Qd), dv, A2m_k, acol, arow)

    def stack_adj(w):
        kern = functools.partial(_kernel_stack_adj, **geom)
        # block selects BOTH the source depth slice and the depth-tap row
        # group, so all in-kernel row indexing is static
        wview = pl.BlockSpec(
            (1, 1, Qh * Qw * Cp, Lhw),
            lambda n, d, j: (n, jnp.clip(d - (dlo + j), 0, Dc - 1), j, 0),
            memory_space=pltpu.VMEM,
        )
        return pl.pallas_call(
            kern,
            grid=(N, Dc, Qd),
            in_specs=[wview, full, full],
            out_specs=pl.BlockSpec((1, 1, Cp, Lhw), lambda n, d, j: (n, d, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N, Dc, Cp, Lhw), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024,
            ),
            interpret=interpret,
        )(w, acol, arow)

    c_arr = jnp.asarray(c, jnp.float32).reshape(-1)
    if c_arr.size == 1:
        c_arr = jnp.broadcast_to(c_arr, (N,))

    def dt_terms(z_k, dz):
        """(dt0, dt1) rows for one iteration from stored code + cotangent."""
        sgn = jnp.sign(z_k.astype(jnp.float32))
        per_n = -jnp.sum(sgn * dz, axis=(1, 3))     # (N, Mp)
        return jnp.sum(per_n, axis=0), jnp.sum(c_arr[:, None] * per_n, axis=0)

    # --- init: adjoint of the final dictionary synthesis (B2m[0]) ---
    zK = z_hist[K - 1]
    dz = syn_adj(dx2, B2m[0])
    dB0 = syn_wgrad(dx2, zK)

    # --- reverse scan over k = K-1 .. 1 ---
    def body(dz, xs):
        z_k, z_km1, r_k, A2m_k, B2m_k = xs
        zk32 = z_k.astype(jnp.float32)
        dv = jnp.where(zk32 != 0.0, dz, 0.0)
        dt0, dt1 = dt_terms(z_k, dz)
        dA_k, w = ana_wgrad(dv, r_k, A2m_k)
        dr = stack_adj(w)
        ds = m2 * dr if use_mask else dr
        dz_next = dv + syn_adj(ds, B2m_k)
        dB_k = syn_wgrad(ds, z_km1)
        return dz_next, (dA_k, dB_k, dt0, dt1)

    if K > 1:
        xs = (
            z_hist[1:][::-1],          # z_k, k = K-1..1
            z_hist[:-1][::-1],         # z_{k-1}
            r_hist[::-1],              # r_k
            A2m[1:][::-1],
            B2m[1:][::-1],
        )
        dz, (dA_rev, dB_rev, dt0_rev, dt1_rev) = lax.scan(body, dz, xs)
        dA_rest = dA_rev[::-1]
        dB_rest = dB_rev[::-1]
        dt0_rest = dt0_rev[::-1]
        dt1_rest = dt1_rev[::-1]
    else:
        dA_rest = jnp.zeros((0, Mp, T * Cp), jnp.float32)
        dB_rest = jnp.zeros((0, Qd, Qh * Qw * Cp, Mp), jnp.float32)
        dt0_rest = jnp.zeros((0, Mp), jnp.float32)
        dt1_rest = jnp.zeros((0, Mp), jnp.float32)

    # --- k = 0: z_0 = ST(0 - A2m[0] @ stack(-y2), tau_0) ---
    z032 = z_hist[0].astype(jnp.float32)
    dv0 = jnp.where(z032 != 0.0, dz, 0.0)
    dt0_0, dt1_0 = dt_terms(z_hist[0], dz)
    dA_0, _ = ana_wgrad(dv0, -y2.astype(jnp.float32), A2m[0], want_w=False)

    dA2m = jnp.concatenate([dA_0[None], dA_rest], axis=0)       # (K, Mp, T*Cp)
    dB2m = jnp.concatenate([dB0[None], dB_rest], axis=0)        # (K, Qd, QhQwCp, Mp)
    dt0 = jnp.concatenate([dt0_0[None], dt0_rest], axis=0)      # (K, Mp)
    dt1 = jnp.concatenate([dt1_0[None], dt1_rest], axis=0)

    dA = vjpA(dA2m)[0]
    dB = vjpB(dB2m)[0]
    dt = jnp.stack([dt0[:, :M], dt1[:, :M]], axis=1)[..., None, None, None]
    return dA.astype(A.dtype), dB.astype(B.dtype), dt.astype(t.dtype)
