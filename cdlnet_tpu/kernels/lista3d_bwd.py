"""Fused backward for the 3D (video) LISTA iteration pair.

Companion to kernels/lista3d.lista3d_fused(return_hists=True): the forward
pair already streams each iteration's code z_k and residual r_k through
HBM, so the scan simply stacks them and the backward never recomputes the
forward. Like the 2D reverse kernel (lista2d._kernel_bwd), the ST
subgradient comes straight from the stored code — sign(z_k) IS
sign(v_k)*1{active} — and every contraction is MXU-shaped.

The reverse loop is a lax.scan over k (mirroring the forward's structure)
whose body runs TWO Pallas kernels per iteration:

  _kernel_ana_bwd    dA2m += -sum_{n,d} dv[d] @ stack(r_k)[d]^T,
                     w[d] = -A2m^T dv[d] (VMEM SCRATCH ONLY), and
                     drj[d, j] = unroll_j(w[d] rows of depth-tap j)
                     (the whole analysis adjoint for one (n, d) block)
  _kernel_syn_bwd    dz[e]  = dv_k[e] + sum_j B2m[j]^T stack2_j,
                     dB2m[j] += stack2_j @ z_{k-1}[e]^T,
                     dt rows of iteration k-1, and
                     dv_{k-1}[e] = 1{z_{k-1}[e] != 0} dz[e]
                     with stack2_j = stack2(ds[e - dq_sj]) SHARED between
                     the dz-dot and the dB-dot (the whole synthesis
                     adjoint; z is read once per slice)

plus a cheap XLA combine of the drj depth-tap planes (Qd zero-fill depth
shifts over (Cp, Lhw) planes): dr[e] = sum_j unroll_j(w[e - dq_aj]),
re-expressed per SOURCE slice so the (T*Cp, Lhw) stack cotangent w never
round-trips HBM. The scan carries dv (the ST-masked cotangent), not dz.

Why this shape (r1 ran FOUR kernels + XLA glue; see BASELINE.md for the
measured effect): materializing w between ana_wgrad and stack_adj cost
~670 MB of HBM traffic per flagship iteration; the split syn_adj (grid
(N,Dc,Qd)) + syn_wgrad (grid (Qd,N,Dc)) pair read the 92 MB z-history
slice Qd times per iteration and built every stack2 twice; and the XLA
dv/dt/dz-add glue added four more full sweeps over (N, Dc, Mp, Lhw)
tensors. NB small per-step scan outputs (dA/dB/dt) must pass through
jax.lax.optimization_barrier before the scan stacks them, or XLA fuses
the pallas custom-call with the scan's dynamic-update-slices into a
fusion whose scoped-vmem stack exceeds a non-overridable 16 MB limit
("should not be possible ... file a bug against XLA"). Weight gradients
come back per-iteration as scan outputs and are transported to the torch
weight layout through the vjp of the (linear) polyphase weight prep.
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
    only the forward pair's working set; the reverse scan peaks higher —
    take the larger of the two reverse kernels' working sets:
    _kernel_ana_bwd holds two (T*Cp, Lhw) VMEM scratches (window stack +
    the never-materialized w cotangent) plus double-buffered dv/drj and
    Qd r-view blocks and the resident A2m/dA pair; _kernel_syn_bwd holds
    double-buffered z/base/dv blocks, Qd g views, a (Qh*Qw*Cp, Lhw)
    stack2 scratch and the resident B2m/dB banks. Mirror of
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
    est_ana = (
        2 * T * Cp * Lhw        # stack + w VMEM scratches
        + 2 * Mp * Lhw          # dv in blocks (double-buffered)
        + 4 * Qd * Cp * Lhw     # Qd r views + drj out (double-buffered)
        + 2 * Mp * T * Cp       # resident A2m + revisited dA accumulator
        + (Qh + Qw) * Lhw       # col/row masks
    ) * 4
    est_syn = (
        Qh * Qw * Cp * Lhw      # stack2 scratch
        + 6 * Mp * Lhw          # z + base in, dv out (double-buffered)
        + 2 * Qd * Cp * Lhw     # Qd g views (double-buffered)
        + 2 * Qd * Qh * Qw * Cp * Mp  # resident B2m + dB accumulator
        + (Qh * Qw + 1) * Lhw   # sm masks + crow
    ) * 4
    est = max(est_ana, est_syn)
    from cdlnet_tpu.kernels.lista3d import _VMEM_BUDGET

    return est < _VMEM_BUDGET


def _roll(pltpu, buf, off, Lhw):
    return pltpu.roll(buf, (-off) % Lhw, 1) if off % Lhw else buf


def _kernel_syn_bwd(*refs, Qd, Qh, Qw, Cp, Wc, dlo, hlo, wlo,
                    with_base=False):
    """Whole synthesis-adjoint step for one (n, e) block — the r1 split
    (syn_adj over a (N, Dc, Qd) grid + syn_wgrad over (Qd, N, Dc)) read
    the 92 MB z-history slice Qd times per iteration and built every
    stack2 twice; this merged kernel reads z ONCE and shares each
    stack2_j between the dz-dot and the dB-dot:

      stack2_j  = stack2(g[e - dq_sj]) * valid_j     (Qd g views)
      dz[e]     = base[e] + sum_j B2m[j]^T @ stack2_j
      dB2m[j]  += stack2_j @ z[e]^T                  (contract over Lhw)
      dt[0]    += -sum_L sign(z[e]) dz[e]            (iteration k-1 rows!)
      dt[1]    += -sum_L sign(z[e]) dz[e] * crow
      dv[e]     = 1{z[e] != 0} * dz[e]               (ST subgradient)

    where z is z_{k-1} — the NEXT reverse step's code — so the kernel
    directly emits that step's dv and dt, and the scan carries dv instead
    of dz (the analysis kernel needs only dv). Validity: the dz and dB
    contributions of tap j both exist iff e - dq_sj is in range — one
    mask. with_base=False is the init step (adjoint of the final
    dictionary synthesis: g = dx2, z = z_{K-1}, bank B2m[0], zero base).
    Grid (N, Dc); dB (Qd, Qh*Qw*Cp, Mp) and dt (2, Mp) are revisited
    resident accumulators."""
    from jax.experimental.pallas import tpu as pltpu

    gviews = refs[:Qd]
    rest = refs[Qd:]
    if with_base:
        (z_ref, base_ref, B2m_ref, sm_ref, crow_ref,
         dv_ref, dB_ref, dt_ref, stack_ref) = rest
    else:
        (z_ref, B2m_ref, sm_ref, crow_ref,
         dv_ref, dB_ref, dt_ref, stack_ref) = rest
        base_ref = None
    n = pl.program_id(0)
    e = pl.program_id(1)
    Dc = pl.num_programs(1)
    Lhw = z_ref.shape[-1]
    roll = functools.partial(_roll, pltpu, Lhw=Lhw)

    @pl.when(jnp.logical_and(n == 0, e == 0))
    def _init():
        dB_ref[:] = jnp.zeros_like(dB_ref)
        dt_ref[:] = jnp.zeros_like(dt_ref)

    z = z_ref[0, 0].astype(jnp.float32)
    dz = (base_ref[0, 0].astype(jnp.float32) if with_base
          else jnp.zeros_like(z))
    for j in range(Qd):
        dq = j - (Qd - 1) - dlo
        valid = jnp.where(
            jnp.logical_and(e - dq >= 0, e - dq < Dc), 1.0, 0.0)
        g = gviews[j][0, 0].astype(jnp.float32) * valid
        for qi in range(Qh):
            for ri in range(Qw):
                t = qi * Qw + ri
                off = (qi - (Qh - 1) - hlo) * Wc + (ri - (Qw - 1) - wlo)
                stack_ref[t * Cp : (t + 1) * Cp] = roll(
                    g * sm_ref[t][None, :], -off)
        dz += jax.lax.dot_general(
            B2m_ref[j], stack_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dB_ref[j] += jax.lax.dot_general(
            stack_ref[:], z, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    sgn = jnp.sign(z)
    crow = crow_ref[0, 0][None, :]
    dt_ref[0] += -jnp.sum(sgn * dz, axis=1)
    dt_ref[1] += -jnp.sum(sgn * dz * crow, axis=1)
    dv_ref[0, 0] = jnp.where(z != 0.0, dz, 0.0)


def _kernel_ana_bwd(*refs, Qd, Qh, Qw, Cp, Wc, dlo, hlo, wlo,
                    emit_dr=True):
    """Whole analysis-adjoint step for one (n, d) block, fused so the
    (T*Cp, Lhw) stack cotangent w NEVER touches HBM (it was ~40% of the
    reverse scan's HBM traffic when materialized):

      dA2m     += -dv @ stack(r)[d]^T         (revisited resident output)
      w         = -A2m^T @ dv                 (VMEM scratch only)
      drj[d,j]  = unroll_j(w rows of depth-tap j)   (Qd*Cp rows out)

    The stack-adjoint's cross-slice gather dr[e] = sum_j unroll_j(w[e-dq_j])
    is re-expressed per SOURCE slice: this kernel emits each depth tap's
    contribution at its source d, and the caller combines them with Qd
    zero-fill depth shifts over small (Cp, Lhw) planes in XLA. The ST
    subgradient dv and the dt reductions live in _kernel_syn_bwd, which
    produces each reverse step's dv as it finishes the step's cotangent.

    Grid (N, Dc). refs: Qd r views (1,1,Cp,Lhw), dv (1,1,Mp,Lhw),
    A2m (Mp, T*Cp), acol (Qw, Lhw), arow (Qh, Lhw); outputs
    dA (Mp, T*Cp), drj (1,1,Qd*Cp,Lhw); scratch stack (T*Cp, Lhw),
    w (T*Cp, Lhw). Window stacking identical to lista3d._kernel_ana.
    emit_dr=False (the k=0 step, whose dz chain ends) skips the w dot and
    the drj write."""
    from jax.experimental.pallas import tpu as pltpu

    rviews = refs[:Qd]
    (dv_ref, A2m_ref, acol_ref, arow_ref,
     dA_ref, drj_ref, stack_ref, w_ref) = refs[Qd:]
    n = pl.program_id(0)
    d = pl.program_id(1)
    Dc = pl.num_programs(1)
    Lhw = dv_ref.shape[-1]
    roll = functools.partial(_roll, pltpu, Lhw=Lhw)

    @pl.when(jnp.logical_and(n == 0, d == 0))
    def _init():
        dA_ref[:] = jnp.zeros_like(dA_ref)

    dv = dv_ref[0, 0].astype(jnp.float32)

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

    dA_ref[:] += -jax.lax.dot_general(
        dv, stack_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if emit_dr:
        w_ref[:] = -jax.lax.dot_general(
            A2m_ref[:], dv, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # unroll each depth-tap row group of w at its SOURCE slice (the
        # inverse in-plane rolls/masks of the stacking above)
        for j in range(Qd):
            acc = jnp.zeros((Cp, Lhw), jnp.float32)
            for qi in range(Qh):
                inner = jnp.zeros((Cp, Lhw), jnp.float32)
                for ri in range(Qw):
                    t = (j * Qh + qi) * Qw + ri
                    wt = w_ref[t * Cp : (t + 1) * Cp]
                    inner += roll(acol_ref[ri][None, :] * wt, -(wlo + ri))
                acc += roll(arow_ref[qi][None, :] * inner, -(hlo + qi) * Wc)
            drj_ref[0, 0, j * Cp : (j + 1) * Cp] = acc


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

    c_arr = jnp.asarray(c, jnp.float32).reshape(-1)
    if c_arr.size == 1:
        c_arr = jnp.broadcast_to(c_arr, (N,))
    crow = jnp.broadcast_to(c_arr[:, None, None], (N, 1, Lhw)).astype(jnp.float32)

    def syn_bwd(g, z, B2m_k, base=None):
        """Merged synthesis adjoint; returns (dv, dB_k, dt) where dv/dt
        belong to the NEXT reverse step (z is that step's code)."""
        kern = functools.partial(_kernel_syn_bwd, **geom,
                                 with_base=base is not None)
        gviews = []
        for j in range(Qd):
            dq = j - (Qd - 1) - dlo
            gviews.append(pl.BlockSpec(
                (1, 1, Cp, Lhw),
                lambda n, e, dq=dq: (n, jnp.clip(e - dq, 0, Dc - 1), 0, 0),
                memory_space=pltpu.VMEM,
            ))
        blk = pl.BlockSpec((1, 1, Mp, Lhw), lambda n, e: (n, e, 0, 0),
                           memory_space=pltpu.VMEM)
        ins = ([*([g] * Qd), z] + ([base] if base is not None else [])
               + [B2m_k, sm, crow])
        in_specs = [*gviews, blk] + ([blk] if base is not None else []) + [
            full, full,
            pl.BlockSpec((1, 1, Lhw), lambda n, e: (n, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        return pl.pallas_call(
            kern,
            grid=(N, Dc),
            in_specs=in_specs,
            out_specs=[
                blk,
                pl.BlockSpec((Qd, Qh * Qw * Cp, Mp), lambda n, e: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, Mp), lambda n, e: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((N, Dc, Mp, Lhw), jnp.float32),
                jax.ShapeDtypeStruct((Qd, Qh * Qw * Cp, Mp), jnp.float32),
                jax.ShapeDtypeStruct((2, Mp), jnp.float32),
            ],
            scratch_shapes=[pltpu.VMEM((Qh * Qw * Cp, Lhw), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024,
            ),
            interpret=interpret,
        )(*ins)

    def ana_bwd(dv, r, A2m_k, emit_dr=True):
        """One fused analysis-adjoint sweep; returns (dA_k, drj)."""
        kern = functools.partial(_kernel_ana_bwd, **geom, emit_dr=emit_dr)
        rviews = []
        for j in range(Qd):
            dq = dlo + j
            rviews.append(pl.BlockSpec(
                (1, 1, Cp, Lhw),
                lambda n, d, dq=dq: (n, jnp.clip(d + dq, 0, Dc - 1), 0, 0),
                memory_space=pltpu.VMEM,
            ))
        blk = pl.BlockSpec((1, 1, Mp, Lhw), lambda n, d: (n, d, 0, 0),
                           memory_space=pltpu.VMEM)
        dummy4 = pl.BlockSpec((1, 1, 1, 1), lambda n, d: (0, 0, 0, 0),
                              memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kern,
            grid=(N, Dc),
            in_specs=[*rviews, blk, full, full, full],
            out_specs=[
                pl.BlockSpec((Mp, T * Cp), lambda n, d: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, Qd * Cp, Lhw), lambda n, d: (n, d, 0, 0),
                             memory_space=pltpu.VMEM)
                if emit_dr else dummy4,
            ],
            out_shape=[
                jax.ShapeDtypeStruct((Mp, T * Cp), jnp.float32),
                jax.ShapeDtypeStruct(
                    (N, Dc, Qd * Cp, Lhw) if emit_dr else (1, 1, 1, 1),
                    jnp.float32),
            ],
            scratch_shapes=[pltpu.VMEM((T * Cp, Lhw), jnp.float32),
                            pltpu.VMEM((T * Cp, Lhw), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024,
            ),
            interpret=interpret,
        )(*([r] * Qd), dv, A2m_k, acol, arow)

    def combine_drj(drj):
        """dr[e] = sum_j shift(drj[..., j block], +dq_aj): the cross-slice
        gather of the stack adjoint, over (Cp, Lhw)-sized planes in XLA."""
        dr = jnp.zeros((N, Dc, Cp, Lhw), jnp.float32)
        for j in range(Qd):
            dq = dlo + j
            part = drj[:, :, j * Cp : (j + 1) * Cp]
            if dq >= 0:
                dr = dr.at[:, dq:].add(part[:, : Dc - dq])
            else:
                dr = dr.at[:, : Dc + dq].add(part[:, -dq:])
        return dr

    # --- init: adjoint of the final dictionary synthesis (B2m[0]);
    # emits dv_{K-1}, dB2m[0] and the dt rows of iteration K-1 ---
    dv, dB0, dtK = syn_bwd(dx2, z_hist[K - 1], B2m[0])

    # --- reverse scan over k = K-1 .. 1; the carry is dv_k (the
    # ST-masked cotangent — the analysis adjoint never needs raw dz) ---
    def body(dv, xs):
        z_km1, r_k, A2m_k, B2m_k = xs
        dA_k, drj = ana_bwd(dv, r_k, A2m_k)
        dr = combine_drj(drj)
        ds = m2 * dr if use_mask else dr
        dv_next, dB_k, dt = syn_bwd(ds, z_km1, B2m_k, base=dv)
        # keep the small dA/dB/dt outputs OUT of the fusion XLA builds
        # around the scan's dynamic-update-slices: that fusion's scoped
        # vmem stack exceeds a non-overridable 16 MB limit (see module
        # docstring / CLAUDE.md gotcha)
        dA_k, dB_k, dt = jax.lax.optimization_barrier((dA_k, dB_k, dt))
        # dt belongs to iteration k-1 (z_km1's step) — realigned below
        return dv_next, (dA_k, dB_k, dt[0], dt[1])

    if K > 1:
        xs = (
            z_hist[:-1][::-1],         # z_{k-1}, k = K-1..1
            r_hist[::-1],              # r_k
            A2m[1:][::-1],
            B2m[1:][::-1],
        )
        dv, (dA_rev, dB_rev, dt0_rev, dt1_rev) = lax.scan(body, dv, xs)
        dA_rest = dA_rev[::-1]                  # dA rows k = 1..K-1
        dB_rest = dB_rev[::-1]                  # dB rows k = 1..K-1
        dt0_low = dt0_rev[::-1]                 # dt rows k = 0..K-2
        dt1_low = dt1_rev[::-1]
    else:
        dA_rest = jnp.zeros((0, Mp, T * Cp), jnp.float32)
        dB_rest = jnp.zeros((0, Qd, Qh * Qw * Cp, Mp), jnp.float32)
        dt0_low = jnp.zeros((0, Mp), jnp.float32)
        dt1_low = jnp.zeros((0, Mp), jnp.float32)

    # --- k = 0: z_0 = ST(0 - A2m[0] @ stack(-y2), tau_0); its dt rows
    # were already emitted by the last body step (or by init when K=1) ---
    dA_0, _ = ana_bwd(dv, -y2.astype(jnp.float32), A2m[0], emit_dr=False)

    dA2m = jnp.concatenate([dA_0[None], dA_rest], axis=0)       # (K, Mp, T*Cp)
    dB2m = jnp.concatenate([dB0[None], dB_rest], axis=0)        # (K, Qd, QhQwCp, Mp)
    dt0 = jnp.concatenate([dt0_low, dtK[0][None]], axis=0)      # (K, Mp)
    dt1 = jnp.concatenate([dt1_low, dtK[1][None]], axis=0)

    dA = vjpA(dA2m)[0]
    dB = vjpB(dB2m)[0]
    dt = jnp.stack([dt0[:, :M], dt1[:, :M]], axis=1)[..., None, None, None]
    return dA.astype(A.dtype), dB.astype(B.dtype), dt.astype(t.dtype)
