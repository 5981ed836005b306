"""Fused Pallas TPU kernels for the 3D (video) LISTA iteration.

Two execution strategies, picked by working-set size:

1. Whole-K-resident (_kernel_resident, opt-in CDLNET_LISTA3D_RESIDENT=1):
   the code tensor z
   (Dc, Mp, Lhw) and both weight banks live in VMEM for ALL K iterations —
   HBM sees the clip's inputs/outputs and weights once, independent of K.
   fp32 storage throughout — no bf16 carry rounding; the remaining ~1e-3
   relative deviation vs the XLA scan comes from DEFAULT-precision MXU
   passes, same as every kernel here. This part's usable VMEM probed
   >100 MB, far above the classic ~16 MB guideline, which is what makes
   the ~23 MB flagship code tensor residency possible.

2. Per-iteration pair (fallback for big clips): each iteration is two
   Pallas calls under a lax.scan — synthesis+residual then
   analysis+threshold — gridded over (batch, depth slice), z streamed
   through HBM once per iteration in bfloat16 (~0.5% code deviation,
   <0.02 dB PSNR on trained models). Depth taps arrive as Qd clamped
   BlockSpec views with validity zeroing (the reference Conv3d's zero-pad
   semantics, model/net.py:137-144).

Both paths keep every dot MXU-shaped: the analysis stacks its rolled
windows into ONE T*Cp-deep contraction (384 at the flagship config), and
the synthesis folds all Qh*Qw in-plane taps into ONE (Qh*Qw*Cp)-row dot
(128 rows — a full MXU tile) whose per-tap output slices are lane-rolled
and border-masked into the accumulator (the roll/mask factors commute with
the lane-pointwise contraction; see _kernel_syn).

Training is fused as well: return_hists=True collects each iteration's
code and residual for the reverse kernels (kernels/lista3d_bwd_resident /
lista3d_bwd) — on the resident path by DMA-streaming them to HBM from
inside the kernel (overlapped with the next phase's compute; the forward
then iterates fp32 and only the STORED copies round to the history
dtype, like 2D), on the pair path by stacking them as scan outputs.
Routing: lista3d_hist_forward_path. The pair path's XLA stacking
inserted ~2.8 GB/step of serialized HBM copies at the flagship video
config (history-writing forward 12.9 ms vs 4.45 ms pure — measured
r2, tools/profile_train3d.py), which is what the resident-hist variant
eliminates. Residual-block variants fall back to the XLA scan.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

from cdlnet_tpu.kernels.lista2d import _axis_masks
from cdlnet_tpu.ops import polyphase as pp

_VMEM_BUDGET = int(100 * 1024 * 1024)  # probed >100 MB usable on this part


def _geom(P, pads, s):
    """Per-dim (q_lo, q_hi) tap ranges: dims ordered (D, H, W)."""
    return [pp._tap_ranges(P[i], pads[i], s) for i in range(3)]


def lista3d_fused_supported(M, C, P, s, K, D, H, W, residual=None,
                            z_bytes=2) -> bool:
    """Applicability check for the fused 3D paths (resident or iteration
    pair). The iteration-pair fallback fits whenever the per-slice working
    set does; it is the binding constraint only for very large frames.
    z_bytes: code-carry width — 2 for the default bfloat16 inference
    carry, 4 for the fp32 training/history path (autodiff._core3d_fwd)."""
    if residual is not None:
        return False  # per-iteration ResidualBlocks take the XLA path
    if D % s or H % s or W % s:
        return False
    P = (P,) * 3 if isinstance(P, int) else tuple(P)
    pads = tuple(p // 2 for p in P)
    (dlo, dhi), (hlo, hhi), (wlo, whi) = _geom(P, pads, s)
    Qd, Qh, Qw = dhi - dlo + 1, hhi - hlo + 1, whi - wlo + 1
    Cp = C * s**3
    Lhw = (H // s) * (W // s)
    T = Qd * Qh * Qw
    Mp = -(-M // 8) * 8
    # iteration pair, kernel B is the bigger one: stack + r views + z
    # blocks + u transient + weights
    b = T * Cp * Lhw * z_bytes + Qd * 2 * Cp * Lhw * 4 \
        + 2 * Mp * Lhw * z_bytes + Mp * Lhw * 4 + Mp * T * Cp * z_bytes
    masks = 4 * (Qh + Qw) * Lhw * 4
    # XLA scoped-vmem stack: the pair path's blocked z inputs/outputs live
    # inside the iteration lax.scan, where XLA stack-allocates them
    # double-buffered against a NON-overridable 16 MB scoped limit (Mosaic's
    # vmem_limit_bytes does not govern it — see CLAUDE.md; hit in practice
    # at 240x432: 176x25920 bf16 blocks = 19.03 MB > 16 MB compile error).
    # Shapes past this bound band instead (kernels/lista3d_tiled).
    if 2 * Mp * Lhw * z_bytes >= int(15 * 1024 * 1024):
        return False
    return b + masks < _VMEM_BUDGET


def _resident_plan(M, C, P, s, K, D, H, W, return_z=False, hist_bytes=0):
    """VMEM fit + preroll decision for the whole-K-resident kernel
    (_kernel_resident) — the ONE estimate shared by lista3d_fused's
    dispatch and the training-path gate (lista3d_hist_forward_path).

    hist_bytes > 0 sizes the TRAINING variant that DMA-streams the
    per-iteration z/r histories to HBM (adds the (hist_slots*Dc, Mp, Lhw)
    z staging buffer at the history dtype's width; r streams straight from
    the f32 residual window). Returns (fits, preroll, hist_slots) —
    hist_slots is 2 when a DOUBLE-buffered z staging fits (each history
    DMA then gets ~1.5 iterations of compute to drain instead of one
    synthesis phase; single-buffered staging measured near-ZERO overlap:
    hist forward 7.36 ms vs 3.99 ms pure ≈ the full ~750 MB of history
    traffic serialized), else 1."""
    import os

    if D % s or H % s or W % s:
        return False, False, 0
    P = (P,) * 3 if isinstance(P, int) else tuple(P)
    pads = tuple(p // 2 for p in P)
    (dlo, dhi), (hlo, hhi), (wlo, whi) = _geom(P, pads, s)
    Qd, Qh, Qw = dhi - dlo + 1, hhi - hlo + 1, whi - wlo + 1
    T = Qd * Qh * Qw
    Cp = C * s**3
    Dc = D // s
    Lhw = (H // s) * (W // s)
    Mp = -(-M // 8) * 8
    resident_bytes = (
        Dc * Mp * Lhw * 4            # z scratch
        + 2 * K * Mp * T * Cp * 4    # A2m + B2m (f32, resident)
        + T * Cp * Lhw * 4           # tap stack
        + (Mp + Qh * Qw * Cp + Dc * Cp) * Lhw * 4   # u + merged-dot out + r
        + 4 * Dc * Cp * Lhw * 4      # y2/m2/x2 blocks (double-buffered)
        + (4 * Dc * Mp * Lhw * 4 if return_z else 0)  # z_out blocks
        + Dc * Mp * Lhw * hist_bytes  # z history staging (training)
    )
    # double-buffer the history staging where the extra slot fits —
    # preferred over preroll if only one of the two fits (hiding ~ms of
    # history DMA beats ~9% of forward VPU work)
    hist_slots = 0
    if hist_bytes:
        hist_slots = 1
        if resident_bytes + Dc * Mp * Lhw * hist_bytes < _VMEM_BUDGET:
            hist_slots = 2
            resident_bytes += Dc * Mp * Lhw * hist_bytes
    # preroll (see _kernel_resident docstring): hoist the analysis
    # roll+mask tap copies to once per r frame instead of once per
    # (output frame, depth tap) — ~Qd x less VPU work for a bigger
    # rolled-copies scratch. Measured on hardware (r2, flagship bench
    # A/B x2): 6832/6866 -> 7454/7474 frames/s, a reproducible +9%, so
    # it is the DEFAULT (CDLNET_LISTA3D_PREROLL=0 opts out). Gated
    # SEPARATELY from the resident decision: a shape that fits resident
    # but not resident+preroll keeps the resident kernel (preroll off)
    # rather than silently demoting to the slower iteration-pair path.
    _Ga, _Gahi = max(0, -dlo), max(0, dlo + Qd - 1)
    preroll_extra = ((Dc + _Ga + _Gahi) * Qh * Qw - T) * Cp * Lhw * 4
    preroll = (
        os.environ.get("CDLNET_LISTA3D_PREROLL", "1") != "0"
        and Qd > 1
        and resident_bytes + preroll_extra < _VMEM_BUDGET
    )
    if preroll:
        resident_bytes += preroll_extra
    return resident_bytes < _VMEM_BUDGET, preroll, hist_slots


def lista3d_hist_forward_path(M, C, P, s, K, D, H, W, hist_bytes=None):
    """Which fused 3D forward collects the training z/r histories for this
    shape: "resident" (whole-K-resident kernel DMA-streaming histories
    from inside — no XLA stacking copies), "pair" (per-iteration kernels,
    histories stacked as scan outputs), or None (shape too big for either
    at the history dtype). ONE routing site shared by
    lista3d_fused(return_hists=True) and autodiff's training gate, so the
    gate can never admit a shape the wrapper then rejects."""
    import os

    if hist_bytes is None:
        from cdlnet_tpu.kernels.lista2d import hist_dtype

        hist_bytes = jnp.dtype(hist_dtype()).itemsize
    if os.environ.get("CDLNET_LISTA3D_RESIDENT") != "0" and _resident_plan(
        M, C, P, s, K, D, H, W, return_z=False, hist_bytes=hist_bytes
    )[0]:
        return "resident"
    if lista3d_fused_supported(M, C, P, s, K, D, H, W, z_bytes=hist_bytes):
        return "pair"
    return None


def prep_A2m_3d(A, s, pads):
    """Polyphase 3D analysis bank in kernel layout (K, Mp, T*Cp) f32,
    tap-major (dq, qi, ri, cp) rows, subband dim padded to the sublane
    tile — SHARED by the forward and the backward (lista3d_bwd) so their
    gradients can never desynchronize from a one-sided layout change."""
    K, M = A.shape[0], A.shape[1]
    (dlo, dhi), (hlo, hhi), (wlo, whi) = _geom(A.shape[-3:], pads, s)
    Qd, Qh, Qw = dhi - dlo + 1, hhi - hlo + 1, whi - wlo + 1
    T = Qd * Qh * Qw
    Cp = A.shape[2] * s**3
    A2, _, _, _ = pp.polyphase_weights(A, s, pads, 3)   # (K, M, Cp, Qd, Qh, Qw)
    A2m = A2.transpose(0, 1, 3, 4, 5, 2).reshape(K, M, T * Cp)
    Mp = -(-M // 8) * 8
    if Mp != M:
        A2m = jnp.pad(A2m, ((0, 0), (0, Mp - M), (0, 0)))
    return A2m


def prep_B2m_3d(B, s, pads):
    """Polyphase 3D synthesis bank (K, Qd, Qh*Qw*Cp, Mp), flipped-tap,
    rows (in-plane tap, cp)-major per depth tap, subbands padded."""
    K, M = B.shape[0], B.shape[1]
    (dlo, dhi), (hlo, hhi), (wlo, whi) = _geom(B.shape[-3:], pads, s)
    Qd, Qh, Qw = dhi - dlo + 1, hhi - hlo + 1, whi - wlo + 1
    Cp = B.shape[2] * s**3
    _, B2t, _, _ = pp.polyphase_weights(B, s, pads, 3)
    B2m = B2t.transpose(0, 3, 4, 5, 2, 1).reshape(K, Qd, Qh * Qw, Cp, M)
    Mp = -(-M // 8) * 8
    if Mp != M:
        B2m = jnp.pad(B2m, ((0, 0),) * 4 + ((0, Mp - M),))
    return B2m.reshape(K, Qd, Qh * Qw * Cp, Mp)


def _kernel_syn(z_ref, y2_ref, m2_ref, B2m_ref, sm_ref, r_ref,
                *, Qd, Qh, Qw, Cp, Wc, dlo, hlo, wlo, use_mask, sub_y):
    """r[d] <- [mask *] (B_k z)[d] [- y2[d]], reduced over depth taps.

    Grid (N, Dc, Qd), depth tap j innermost: the output block r[d] is
    revisited across the Qd steps (index map independent of j) and
    accumulates one depth tap's in-plane contribution per step — so only a
    single (M, Lhw) z view is VMEM-resident at a time.

    ALL Qh*Qw in-plane taps run as ONE (Qh*Qw*Cp, M) x (M, Lhw) dot — 128
    output rows at the flagship config, a full MXU tile, vs Qh*Qw separate
    Cp(=8)-row dots that each waste 15/16 of the systolic array. Rolls move
    to the OUTPUT slices: since the contraction is pointwise along lanes,
    B @ (roll(z, ow) * scol) == roll(B @ z, ow) * scol, and the column
    masks are Wc-periodic so they commute with whole-row rolls — each tap's
    slice is rolled once by its combined offset and masked by the
    precomputed srow*scol product (sm).

    z view block (1,1,M,Lhw) = z[clip(d + dq)] with dq = j - (Qd-1) - dlo,
    upcast to f32 for the dot (v5e fp32 dot == bf16 throughput, and Mosaic
    has no bf16 roll); B2m block (1, Qh*Qw*Cp, M) f32, rows (tap, cp)-major;
    combined in-plane offset (qi - (Qh-1) - hlo)*Wc + (ri - (Qw-1) - wlo).
    """
    from jax.experimental.pallas import tpu as pltpu

    d = pl.program_id(1)
    Dc = pl.num_programs(1)
    j = pl.program_id(2)
    Lhw = y2_ref.shape[-1]

    def roll(buf, off):
        return pltpu.roll(buf, (-off) % Lhw, 1) if off % Lhw else buf

    @pl.when(j == 0)
    def _init():
        r_ref[0, 0] = jnp.zeros_like(r_ref[0, 0])

    dq = j - (Qd - 1) - dlo
    valid = jnp.logical_and(d + dq >= 0, d + dq < Dc)
    zj = z_ref[0, 0].astype(jnp.float32)
    out = jax.lax.dot_general(
        B2m_ref[0], zj, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Qh*Qw*Cp, Lhw)
    part = jnp.zeros(r_ref.shape[-2:], jnp.float32)
    for qi in range(Qh):
        for ri in range(Qw):
            t = qi * Qw + ri
            off = (qi - (Qh - 1) - hlo) * Wc + (ri - (Qw - 1) - wlo)
            part += roll(out[t * Cp : (t + 1) * Cp], off) * sm_ref[t][None, :]
    r_ref[0, 0] += jnp.where(valid, 1.0, 0.0) * part

    @pl.when(j == Qd - 1)
    def _finalize():
        if sub_y:  # residual: mask * Bz - y2; final synthesis is plain Bz
            acc = r_ref[0, 0]
            if use_mask:
                acc = m2_ref[0, 0] * acc
            r_ref[0, 0] = acc - y2_ref[0, 0]


def _kernel_ana(*refs, Qd, Qh, Qw, Cp, Wc, dlo, hlo, wlo):
    """z[d] <- ST(z[d] - (A_k r)[d], tau_k).

    refs: Qd r views (1,1,Cp,Lhw) f32, z_old (1,1,M,Lhw) bf16, A2m
    (M, T*Cp), tau (1, M), acol (Qw, Lhw), arow (Qh, Lhw),
    out z_new (1,1,M,Lhw) bf16; scratch stack (T*Cp, Lhw) bf16.
    Analysis offsets: depth dq = dlo + j; in-plane (hlo + qi, wlo + ri).
    Stack row order (j, qi, ri, cp) matches A2m's tap-major layout.
    """
    from jax.experimental.pallas import tpu as pltpu

    rviews = refs[:Qd]
    z_ref, A2m_ref, tau_ref, acol_ref, arow_ref, zout_ref, stack_ref = refs[Qd:]
    # tau block (1, 1, M)
    d = pl.program_id(1)
    Dc = pl.num_programs(1)
    Lhw = z_ref.shape[-1]

    def roll(buf, off):
        return pltpu.roll(buf, (-off) % Lhw, 1) if off % Lhw else buf

    for j in range(Qd):
        dq = dlo + j
        valid = jnp.where(jnp.logical_and(d + dq >= 0, d + dq < Dc), 1.0, 0.0)
        rj = rviews[j][0, 0] * valid
        for qi in range(Qh):
            rowed = roll(rj, (hlo + qi) * Wc) * arow_ref[qi][None, :]
            for ri in range(Qw):
                t = (j * Qh + qi) * Qw + ri
                stack_ref[t * Cp : (t + 1) * Cp] = (
                    roll(rowed, wlo + ri) * acol_ref[ri][None, :]
                ).astype(stack_ref.dtype)

    u = jax.lax.dot_general(
        A2m_ref[:], stack_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    zn = z_ref[0, 0].astype(jnp.float32) - u
    tau = tau_ref[0, 0][:, None]
    zout_ref[0, 0] = (jnp.sign(zn) * jnp.maximum(jnp.abs(zn) - tau, 0.0)).astype(
        zout_ref.dtype
    )


def _kernel_resident(y2_ref, m2_ref, A2m_ref, B2w_ref, tau_ref, acol_ref,
                     arow_ref, sm_ref, *out_and_scratch,
                     K, Dc, Qd, Qh, Qw, Cp, Wc, dlo, hlo, wlo,
                     use_mask, return_z, preroll=False, hist=False,
                     hist_slots=1, interp=False):
    """Whole-K-loop fused 3D LISTA: the code tensor z and both weight banks
    stay in VMEM across ALL K iterations — HBM sees the clip's inputs,
    weights, and outputs once, independent of K (usable VMEM on this part
    probed >100 MB).

    Both scratch tensors carry zero GUARD SLICES on the depth axis so every
    depth-tap window is an in-bounds CONTIGUOUS slice — no validity
    arithmetic, and the synthesis folds all Qd depth taps AND all Qh*Qw
    in-plane taps into one contraction: per slice ONE
    (Qh*Qw*Cp, Qd*Mp) x (Qd*Mp, Lhw) dot — a full 128-row MXU tile at the
    flagship config. z[d] lives at z_ref[d + Gz];
    r[d] at r_ref[d + Ga]. fp32 throughout (exact vs the XLA scan to
    reassociation tolerance).

    Grid (N,); fori over k (dynamic weight indexing) and over depth slices
    (dynamic contiguous windows) — static unrolling of the depth loop made
    Mosaic compile times explode.

    preroll=True (CDLNET_LISTA3D_PREROLL, profiled variant): the analysis
    stack build is the kernel's VPU wall — per output frame d it re-rolls
    and re-masks r[d+j] by all Qh*Qw in-plane taps for each of the Qd depth
    taps, so every r frame gets rolled Qd times over. Instead, hoist the 16
    rolled+masked copies of EACH r frame into a per-frame scratch once per
    iteration ((Dc+guards, Qh*Qw*Cp, Lhw), guard frames zero), and let the
    analysis dot read a contiguous Qd-frame WINDOW of it — the window's
    (j, qi, ri, cp) row order matches the stack's tap-major order exactly.
    Roll/mask/store work drops ~Qd x for +(Dc+guards-ish)*QhQw*Cp*Lhw*4
    bytes of VMEM.
    """
    from jax.experimental.pallas import tpu as pltpu

    zh_ref = rh_ref = zs_ref = zsem = rsem = None
    if hist:
        # training: stream each iteration's code (via the zs staging cast)
        # and residual (straight from the f32 r window) to the HBM history
        # outputs — the DMAs overlap the next phase's compute, replacing
        # the pair path's XLA stacking copies (return_z is False here)
        (x2_ref, zh_ref, rh_ref, z_ref, r_ref, stack_ref, u_ref, out_ref,
         zs_ref, zsem, rsem) = out_and_scratch
        z_out_ref = None
    elif return_z:
        x2_ref, z_out_ref, z_ref, r_ref, stack_ref, u_ref, out_ref = out_and_scratch
    else:
        x2_ref, z_ref, r_ref, stack_ref, u_ref, out_ref = out_and_scratch
        z_out_ref = None

    n = pl.program_id(0)
    Lhw = y2_ref.shape[-1]
    Mp = z_ref.shape[1]
    QdMp = Qd * Mp
    OFFS = [j - (Qd - 1) - dlo for j in range(Qd)]  # synthesis depth offsets
    OFFA = [dlo + j for j in range(Qd)]             # analysis depth offsets
    Gz = max(0, -OFFS[0])
    Ga = max(0, -OFFA[0])

    def roll(buf, off):
        return pltpu.roll(buf, (-off) % Lhw, 1) if off % Lhw else buf

    def st(u, tau):
        return jnp.sign(u) * jnp.maximum(jnp.abs(u) - tau, 0.0)

    if hist:
        from cdlnet_tpu.kernels.dma import make_dma_helpers

        dcopy, dma_start, dma_wait, _, rem2 = make_dma_helpers(interp)

        def z_slot(k):  # staging ring slot (hist_slots = 1 or 2)
            return rem2(k) if hist_slots == 2 else 0

        def z_dma(k):  # descriptors reconstructed at wait (same sem)
            s_ = z_slot(k)
            return dcopy(zs_ref.at[pl.ds(s_ * Dc, Dc)], zh_ref.at[k, n],
                         zsem.at[s_])

        def r_dma(k):  # rh[k] = r_{k+1}, the residual iteration k+1 used
            return dcopy(r_ref.at[pl.ds(Ga, Dc)], rh_ref.at[k, n], rsem)

    # zero once: guards stay zero (interior is always overwritten first)
    def zero_step(i, _):
        z_ref[i] = jnp.zeros_like(z_ref[i])
        return 0

    jax.lax.fori_loop(0, z_ref.shape[0], zero_step, 0)

    def zero_r(i, _):
        r_ref[i] = jnp.zeros_like(r_ref[i])
        return 0

    jax.lax.fori_loop(0, r_ref.shape[0], zero_r, 0)

    if preroll:
        # only the GUARD frames of the rolled-copies scratch must read as
        # zero (rolled copies of the zero r guards); interior frames are
        # fully overwritten before every use
        for g in range(Ga):
            stack_ref[g] = jnp.zeros_like(stack_ref[0])
        for g in range(stack_ref.shape[0] - Dc - Ga):
            stack_ref[Ga + Dc + g] = jnp.zeros_like(stack_ref[0])

    def synthesis_into_r(k, sub_y):
        """r[d] <- [mask *] (B_k z)[d] [- y2[d]] for all d."""

        def dstep(d, _):
            zwin = z_ref[pl.ds(d + OFFS[0] + Gz, Qd)].reshape(QdMp, Lhw)
            # all Qh*Qw in-plane taps as ONE (Qh*Qw*Cp)-row dot (full MXU
            # tile at the flagship config), rolls applied to the output
            # slices — see _kernel_syn's docstring for the commutation
            out_ref[:] = jax.lax.dot_general(
                B2w_ref[k], zwin, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = jnp.zeros((Cp, Lhw), jnp.float32)
            for qi in range(Qh):
                for ri in range(Qw):
                    t = qi * Qw + ri
                    off = (qi - (Qh - 1) - hlo) * Wc + (ri - (Qw - 1) - wlo)
                    acc += roll(out_ref[t * Cp : (t + 1) * Cp], off) * sm_ref[t][None, :]
            if sub_y:
                if use_mask:
                    acc = m2_ref[0, d] * acc
                acc = acc - y2_ref[0, d]
            r_ref[d + Ga] = acc
            return 0

        jax.lax.fori_loop(0, Dc, dstep, 0)

    def _thresh_store(k, d, zero_prev):
        tau = tau_ref[0, k][:, None]
        prev = (
            jnp.zeros((Mp, Lhw), jnp.float32) if zero_prev else z_ref[d + Gz]
        )
        val = st(prev - u_ref[:], tau)
        z_ref[d + Gz] = val
        if hist:
            zs_ref[z_slot(k) * Dc + d] = val.astype(zs_ref.dtype)

    def analysis_update(k, zero_prev):
        """z[d] <- ST(z[d] - A2m[k] stack(r)[d], tau[k])."""
        if hist and not (isinstance(k, int) and k < hist_slots):
            # slot k % hist_slots is about to be overwritten: iteration
            # (k - hist_slots)'s history DMA must have drained. With the
            # 2-slot ring the DMA gets ~1.5 iterations of compute to
            # drain; single-buffered it gets only one synthesis phase
            # (measured near-zero overlap at the flagship config)
            dma_wait(z_dma(k - hist_slots))
        if preroll:
            # phase 1: roll+mask each r frame by the Qh*Qw in-plane taps
            # ONCE (stack_ref here is the (Dc+guards, Qh*Qw*Cp, Lhw)
            # rolled-copies scratch; guards stay zero)
            def build(dp, _):
                src = r_ref[dp + Ga]
                for qi in range(Qh):
                    rowed = roll(src, (hlo + qi) * Wc) * arow_ref[qi][None, :]
                    for ri in range(Qw):
                        t2 = qi * Qw + ri
                        stack_ref[dp + Ga, t2 * Cp : (t2 + 1) * Cp] = (
                            roll(rowed, wlo + ri) * acol_ref[ri][None, :]
                        )
                return 0

            jax.lax.fori_loop(0, Dc, build, 0)

            # phase 2: per output frame, ONE dot over the contiguous
            # Qd-frame window — row order (j, qi, ri, cp) matches A2m's
            # tap-major columns
            QhQwCp = Qh * Qw * Cp

            def dstep_pre(d, _):
                win = stack_ref[pl.ds(d + OFFA[0] + Ga, Qd)].reshape(
                    Qd * QhQwCp, Lhw
                )
                u_ref[:] = jax.lax.dot_general(
                    A2m_ref[k], win, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                _thresh_store(k, d, zero_prev)
                return 0

            jax.lax.fori_loop(0, Dc, dstep_pre, 0)
            if hist:
                dma_start(z_dma(k))
            return

        def dstep(d, _):
            for j in range(Qd):
                src = r_ref[d + j + OFFA[0] + Ga]
                for qi in range(Qh):
                    rowed = roll(src, (hlo + qi) * Wc) * arow_ref[qi][None, :]
                    for ri in range(Qw):
                        t_ = (j * Qh + qi) * Qw + ri
                        stack_ref[t_ * Cp : (t_ + 1) * Cp] = (
                            roll(rowed, wlo + ri) * acol_ref[ri][None, :]
                        )
            u_ref[:] = jax.lax.dot_general(
                A2m_ref[k], stack_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            _thresh_store(k, d, zero_prev)
            return 0

        jax.lax.fori_loop(0, Dc, dstep, 0)
        if hist:
            dma_start(z_dma(k))

    # k = 0: z = ST(A0 y2, tau0) == ST(0 - A0 (-y2), tau0): r := -y2
    def seed_r(d, _):
        r_ref[d + Ga] = -y2_ref[0, d]
        return 0

    jax.lax.fori_loop(0, Dc, seed_r, 0)
    analysis_update(0, zero_prev=True)

    if hist:
        # k = 1 hoisted statically: no residual DMA is in flight yet, so
        # the fori body (k >= 2) can wait r_dma(k-2) UNCONDITIONALLY
        # before synthesis overwrites the r window
        if K > 1:
            synthesis_into_r(1, sub_y=True)
            dma_start(r_dma(0))
            analysis_update(1, zero_prev=False)

        def body_h(k, _):
            dma_wait(r_dma(k - 2))
            synthesis_into_r(k, sub_y=True)
            dma_start(r_dma(k - 1))
            analysis_update(k, zero_prev=False)
            return 0

        if interp:  # ANY-space DMA inside fori trips interpret lowering
            for kk in range(2, K):
                body_h(kk, 0)
        else:
            jax.lax.fori_loop(2, K, body_h, 0)
        if K > 1:
            dma_wait(r_dma(K - 2))
    else:
        def body(k, _):
            synthesis_into_r(k, sub_y=True)
            analysis_update(k, zero_prev=False)
            return 0

        jax.lax.fori_loop(1, K, body, 0)

    # final dictionary synthesis with B[0]
    synthesis_into_r(0, sub_y=False)
    x2_ref[0] = r_ref[Ga : Ga + Dc]
    if return_z:
        z_out_ref[0] = z_ref[Gz : Gz + Dc]
    if hist:
        # drain the last in-flight history DMA per staging slot
        for s_ in range(min(hist_slots, K)):
            dma_wait(z_dma(K - 1 - s_))


def _depth_view_specs(Qd, offs, block, Dc, pltpu):
    """Qd BlockSpecs over a (N, Dc, ch, Lhw) array: view j maps grid (n, d)
    to slice (n, clip(d + offs[j], 0, Dc-1), :, :). The clamped duplicate at
    the boundary is zeroed in-kernel by the validity factor."""
    specs = []
    for j in range(Qd):
        dq = offs[j]
        specs.append(
            pl.BlockSpec(
                (1, 1) + block,
                lambda n, d, dq=dq: (n, jnp.clip(d + dq, 0, Dc - 1), 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
    return specs


def lista3d_fused(yp, A, B, t, c, stride=1, mask=None, return_z=True,
                  z_dtype=jnp.bfloat16, interpret=False, return_hists=False):
    """Fused per-iteration 3D LISTA + final dictionary synthesis.

    yp: (N, C, D, H, W) pre-processed clip batch; A, B: (K, M, C, Pd, Ph,
    Pw); t: (K, 2, M, 1, 1, 1); c: scalar or (N, 1, 1, 1, 1). Returns
    (xphat (N, C, D, H, W) fp32, z (N, M, Dc, Hc, Wc) fp32 or None) —
    matching ops.lista.lista_3d + conv_transpose3d(B[0]) to z_dtype-carry
    tolerance (~0.5% relative for the default bfloat16 carry; pass
    z_dtype=jnp.float32 for exactness at ~2x the z HBM traffic and VMEM,
    which shrinks the supported shape set).

    return_hists=True (training) additionally returns (z_hist (K, N, Dc,
    Mp, Lhw) in z_dtype, r_hist (K-1, N, Dc, Cp, Lhw) f32) — everything
    the fused backwards (kernels/lista3d_bwd_resident / lista3d_bwd)
    need. On the resident path the histories are DMA-streamed from inside
    the kernel (z via a staging cast, r straight from the f32 residual
    window) overlapped with compute; on the pair path the scan stacks
    them. Only the STORED copies round to z_dtype on the resident path
    (the iteration itself is fp32); the pair path's carry IS z_dtype.
    return_z=True + return_hists=True together always take the pair path.
    """
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

    # --- weight prep (host/XLA): polyphase banks in kernel layouts,
    # subband dim padded to the sublane tile so DMA slices of the z array
    # stay aligned (Mosaic: "slice must be aligned to tiling (8)"); padded
    # rows are exact no-ops — zero analysis rows keep z_pad at ST(0)=0, and
    # zero synthesis columns contribute nothing ---
    Mp = -(-M // 8) * 8
    A2m32 = prep_A2m_3d(A, s, pads)
    A2m = A2m32.astype(z_dtype)
    B2m = prep_B2m_3d(B, s, pads).reshape(K, Qd, Qh * Qw, Cp, Mp)

    # data in (N, Dc, ch, Lhw) layout, z carried bf16
    y5 = pp.space_to_depth(yp, s, 3)  # (N, Cp, Dc, Hc, Wc)
    y2 = y5.transpose(0, 2, 1, 3, 4).reshape(N, Dc, Cp, Lhw)
    use_mask = mask is not None
    m2 = (
        pp.space_to_depth(jnp.broadcast_to(mask, yp.shape), s, 3)
        .transpose(0, 2, 1, 3, 4)
        .reshape(N, Dc, Cp, Lhw)
        if use_mask
        else jnp.zeros((N, 1, 1, 1), yp.dtype)
    )

    c_arr = jnp.asarray(c, yp.dtype).reshape(-1)
    if c_arr.size == 1:
        c_arr = jnp.broadcast_to(c_arr, (N,))
    tau = (
        t[None, :, 0, :, 0, 0, 0] + c_arr[:, None, None] * t[None, :, 1, :, 0, 0, 0]
    )  # (N, K, M)
    if Mp != M:
        tau = jnp.pad(tau, ((0, 0), (0, 0), (0, Mp - M)))

    acol = jnp.asarray(_axis_masks([wlo + ri for ri in range(Qw)], Hc, Wc, 1))
    arow = jnp.asarray(_axis_masks([hlo + qi for qi in range(Qh)], Hc, Wc, 0))
    scol = jnp.asarray(
        _axis_masks([ri - (Qw - 1) - wlo for ri in range(Qw)], Hc, Wc, 1)
    )
    srow = jnp.asarray(
        _axis_masks([qi - (Qh - 1) - hlo for qi in range(Qh)], Hc, Wc, 0)
    )

    geom = dict(Qd=Qd, Qh=Qh, Qw=Qw, Cp=Cp, Wc=Wc, dlo=dlo, hlo=hlo, wlo=wlo)
    grid = (N, Dc)

    # combined per-tap synthesis masks (srow*scol, rows (qi, ri)-major) for
    # the merged single-dot synthesis (both paths); see _kernel_syn docstring
    sm = (srow[:, None, :] * scol[None, :, :]).reshape(Qh * Qw, Lhw)

    # --- whole-K-resident path: z + weights + scratch fit in VMEM ---
    import os

    # The resident kernel keeps z and all K weight banks in VMEM — no
    # per-iteration HBM z traffic — and with honest (RTT-cancelled) timing
    # it is the FASTER path at the flagship size: 2.03 vs 2.80 ms/clip,
    # 131 vs 95 TFLOP/s (tools/profile_fused3d.py, r2; the r1 conclusion
    # that the pair wins by 10% was an artifact of charging the ~32 ms
    # tunnel readback to R=10 reps). It is also fp32-exact (no bf16 code
    # rounding; with return_hists only the STORED history copies round to
    # z_dtype, like 2D). Default to it wherever it fits; the pair path
    # remains for frames too big for the resident working set and for
    # return_z+return_hists combined. CDLNET_LISTA3D_RESIDENT=0 forces
    # the pair. Fit + preroll decisions live in _resident_plan (shared
    # with the training gate).
    res_fits, preroll, hist_slots = _resident_plan(
        M, C, P, s, K, D, H, W, return_z=return_z,
        hist_bytes=jnp.dtype(z_dtype).itemsize if return_hists else 0,
    )
    want_resident = os.environ.get("CDLNET_LISTA3D_RESIDENT") != "0"
    if want_resident and res_fits and not (return_hists and return_z):
        # full-precision analysis bank: the resident path is advertised as
        # exact, so it must NOT inherit the iteration pair's z_dtype rounding
        A2f = A2m32.astype(jnp.float32)
        # depth taps folded into the contraction: (K, QhQw, Cp, Qd*Mp),
        # last dim (j, m)-ordered to match the contiguous z window
        B2f = (
            B2m.astype(jnp.float32)
            .transpose(0, 2, 3, 1, 4)
            .reshape(K, Qh * Qw * Cp, Qd * Mp)
        )
        syn_offs0 = 0 - (Qd - 1) - dlo
        Gz = max(0, -syn_offs0)
        Gzhi = max(0, (Qd - 1) + syn_offs0)
        Ga, Gahi = max(0, -dlo), max(0, dlo + Qd - 1)
        kern = functools.partial(
            _kernel_resident, **geom, K=K, Dc=Dc,
            use_mask=use_mask, return_z=return_z, preroll=preroll,
            hist=return_hists, hist_slots=hist_slots, interp=interpret,
        )
        nblock = lambda ch: pl.BlockSpec(
            (1, Dc, ch, Lhw), lambda n: (n, 0, 0, 0), memory_space=pltpu.VMEM
        )
        full_ = pl.BlockSpec(memory_space=pltpu.VMEM)
        out_specs = [nblock(Cp)]
        out_shape = [jax.ShapeDtypeStruct((N, Dc, Cp, Lhw), jnp.float32)]
        if return_hists:
            # histories as ANY-space outputs, DMA'd from inside the kernel
            # (full-extent (Dc, Mp/Cp, Lhw) slices per (k, n) — always
            # tile-aligned); layouts match the pair path / the reverse
            # kernels' contracts exactly
            anyspace = pl.BlockSpec(memory_space=pl.ANY)
            out_specs += [anyspace, anyspace]
            out_shape += [
                jax.ShapeDtypeStruct((K, N, Dc, Mp, Lhw), z_dtype),
                jax.ShapeDtypeStruct((max(K - 1, 1), N, Dc, Cp, Lhw),
                                     jnp.float32),
            ]
        elif return_z:
            out_specs.append(nblock(Mp))
            out_shape.append(jax.ShapeDtypeStruct((N, Dc, Mp, Lhw), jnp.float32))
        scratch = [
            pltpu.VMEM((Dc + Gz + Gzhi, Mp, Lhw), jnp.float32),  # z + guards
            pltpu.VMEM((Dc + Ga + Gahi, Cp, Lhw), jnp.float32),  # r + guards
            pltpu.VMEM(                                          # tap stack /
                (Dc + Ga + Gahi, Qh * Qw * Cp, Lhw)              # rolled copies
                if preroll else (T * Cp, Lhw),
                jnp.float32,
            ),
            pltpu.VMEM((Mp, Lhw), jnp.float32),                  # u
            pltpu.VMEM((Qh * Qw * Cp, Lhw), jnp.float32),        # merged-dot out
        ]
        if return_hists:
            scratch += [
                # z hist staging ring (2 slots where VMEM allows: each
                # history DMA then drains across ~1.5 iterations of
                # compute instead of one synthesis phase)
                pltpu.VMEM((hist_slots * Dc, Mp, Lhw), z_dtype),
                pltpu.SemaphoreType.DMA((hist_slots,)),          # z hist
                pltpu.SemaphoreType.DMA(()),                     # r hist
            ]
        outs = pl.pallas_call(
            kern,
            grid=(N,),
            in_specs=[nblock(Cp),
                      nblock(Cp) if use_mask else pl.BlockSpec(
                          (1, 1, 1, 1), lambda n: (0, 0, 0, 0),
                          memory_space=pltpu.VMEM),
                      full_, full_,
                      pl.BlockSpec((1, K, Mp), lambda n: (n, 0, 0),
                                   memory_space=pltpu.VMEM),
                      full_, full_, full_],
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024,
            ),
            interpret=interpret,
        )(y2, m2, A2f, B2f, tau, acol, arow, sm)
        x5 = outs[0].reshape(N, Dc, Cp, Hc, Wc).transpose(0, 2, 1, 3, 4)
        xphat = pp.depth_to_space(x5, s, 3, C)
        if return_hists:
            return xphat, None, (outs[1], outs[2][: K - 1])
        z_out = (
            outs[1][:, :, :M].reshape(N, Dc, M, Hc, Wc).transpose(0, 2, 1, 3, 4)
            if return_z
            else None
        )
        return xphat, z_out
    bspec = lambda ch: pl.BlockSpec(
        (1, 1, ch, Lhw), lambda n, d: (n, d, 0, 0), memory_space=pltpu.VMEM
    )
    full = pl.BlockSpec(memory_space=pltpu.VMEM)

    syn_offs = [j - (Qd - 1) - dlo for j in range(Qd)]
    ana_offs = [dlo + j for j in range(Qd)]

    def synthesize(z, B2m_k, sub_y):
        kern = functools.partial(_kernel_syn, **geom, use_mask=use_mask, sub_y=sub_y)
        bs = lambda ch: pl.BlockSpec(
            (1, 1, ch, Lhw), lambda n, d, j: (n, d, 0, 0), memory_space=pltpu.VMEM
        )
        zview = pl.BlockSpec(
            (1, 1, Mp, Lhw),
            lambda n, d, j: (n, jnp.clip(d + j - (Qd - 1) - dlo, 0, Dc - 1), 0, 0),
            memory_space=pltpu.VMEM,
        )
        return pl.pallas_call(
            kern,
            grid=(N, Dc, Qd),
            in_specs=[zview,
                      bs(Cp),
                      bs(Cp) if use_mask else pl.BlockSpec(
                          (1, 1, 1, 1), lambda n, d, j: (0, 0, 0, 0),
                          memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, Qh * Qw * Cp, Mp), lambda n, d, j: (j, 0, 0),
                                   memory_space=pltpu.VMEM),
                      full],
            out_specs=bs(Cp),
            out_shape=jax.ShapeDtypeStruct((N, Dc, Cp, Lhw), jnp.float32),
            # same raised VMEM ceiling as analyze: big frames blow the
            # default 16 MB scoped limit on double-buffered blocks alone
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024,
            ),
            interpret=interpret,
        )(z, y2, m2, B2m_k.reshape(Qd, Qh * Qw * Cp, Mp), sm)

    def analyze(r, z, A2m_k, tau_k):
        kern = functools.partial(_kernel_ana, **geom)
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[*_depth_view_specs(Qd, ana_offs, (Cp, Lhw), Dc, pltpu),
                      bspec(Mp),
                      full,
                      pl.BlockSpec((1, 1, Mp), lambda n, d: (n, 0, 0),
                                   memory_space=pltpu.VMEM),
                      full, full],
            out_specs=bspec(Mp),
            out_shape=jax.ShapeDtypeStruct((N, Dc, Mp, Lhw), z_dtype),
            scratch_shapes=[pltpu.VMEM((T * Cp, Lhw), z_dtype)],
            # donate z-in into z-out: each grid step reads only its OWN z
            # block before writing it (the depth views index r, not z), so
            # aliasing is exact and saves a whole z-sized HBM buffer per
            # iteration.
            input_output_aliases={Qd: 0},
            # big frames need the raised Mosaic VMEM ceiling: the tap stack
            # scratch alone is T*Cp*Lhw*2 bytes (19 MB at 240x432, Qd=4),
            # past the DEFAULT 16 MB scoped limit — without this the
            # compile hard-fails (seen at M=32, 8x240x432; the gate's
            # _VMEM_BUDGET estimate is the real bound).
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024,
            ),
            interpret=interpret,
        )(*([r] * Qd), z, A2m_k,
          tau_k.reshape(-1, 1, tau_k.shape[-1]), acol, arow)

    # --- k = 0: z = ST(A0 y2, tau0) via analyze(r=-y2, z=0) ---
    z0 = jnp.zeros((N, Dc, Mp, Lhw), z_dtype)
    z = analyze(-y2.astype(jnp.float32), z0, A2m[0], tau[:, 0])
    z_first = z

    # --- k = 1..K-1 ---
    def body(z, xs):
        A2m_k, B2m_k, tau_k = xs
        r = synthesize(z, B2m_k, sub_y=True)
        z = analyze(r, z, A2m_k, tau_k)
        return z, ((z, r) if return_hists else None)

    z, hists = lax.scan(body, z, (A2m[1:], B2m[1:], tau.transpose(1, 0, 2)[1:]))

    # --- final dictionary synthesis with B[0] ---
    x2 = synthesize(z, B2m[0], sub_y=False)  # (N, Dc, Cp, Lhw) fp32
    x5 = x2.reshape(N, Dc, Cp, Hc, Wc).transpose(0, 2, 1, 3, 4)
    xphat = pp.depth_to_space(x5, s, 3, C)
    z_out = (
        z[:, :, :M].reshape(N, Dc, M, Hc, Wc).transpose(0, 2, 1, 3, 4)
        .astype(jnp.float32)
        if return_z
        else None
    )
    if return_hists:
        zs, rs = hists
        z_hist = jnp.concatenate([z_first[None], zs], axis=0)  # (K, ...)
        return xphat, z_out, (z_hist, rs)
    return xphat, z_out
