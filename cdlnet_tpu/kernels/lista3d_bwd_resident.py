"""Whole-reverse-RESIDENT backward for the 3D (video) LISTA pair.

The scan-of-kernels backward (kernels/lista3d_bwd) is HBM-bound: its scan
carry dv (N, Dc, Mp, Lhw) — 92 MB at the flagship config — crosses HBM
twice per iteration, and the drj/ds glue adds ~67 MB/iter more
(tools/profile_train3d.py: reverse scan 31 ms of the 37 ms train step,
~80% of the HBM roofline). This kernel eliminates ALL of that: one
program per sample runs the entire reverse loop with

  - dv RESIDENT in VMEM across all K iterations (the 3D analogue of the
    forward's _kernel_resident, lista3d.py:222, and of the 2D reverse
    kernel's VMEM residency, lista2d._kernel_bwd);
  - the (T*Cp, Lhw) stack cotangent w and the per-iteration ds window
    living only in VMEM scratch (ds replaces the scan version's
    drj-emit + XLA depth-shift combine: the scatter accumulates straight
    into a guard-sliced depth window, out-of-range taps land in guard
    slices that are re-zeroed before the synthesis phase reads them);
  - z/r histories and the per-iteration weight banks streamed by manual
    DMA (dynamic-k descriptors reconstructed at wait time, the
    lista2d._kernel_bwd pattern), z through a 2-slot per-depth-slice
    ring so only ~3 MB of the 46 MB per-iteration z slice is ever
    resident;
  - dA_k / dB_k DMA'd out per iteration from small staging buffers
    (summed over N in XLA), dt accumulated in a revisited VMEM block.

HBM traffic per iteration drops from ~364 MB to ~97 MB (the z-history
read is irreducible without precision loss). Only the gradient math of
kernels/lista3d_bwd is re-expressed; results match it (and the XLA scan
gradient) to reassociation tolerance.

Reference: the gradients are of model/net.py:121-227 (CDLNetVideo)
forward semantics; see kernels/lista3d_bwd.py for the adjoint algebra.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from cdlnet_tpu.kernels.dma import make_dma_helpers
from cdlnet_tpu.kernels.lista2d import _axis_masks
from cdlnet_tpu.kernels.lista3d import _VMEM_BUDGET, _geom
from cdlnet_tpu.ops import polyphase as pp


def lista3d_bwd_resident_supported(M, C, P, s, K, D, H, W,
                                   preroll=False) -> bool:
    """True when the whole-reverse-resident kernel fits VMEM.

    The dominant term is the resident dv (Dc, Mp, Lhw); guard-sliced
    ds/r windows, the shared stack/w scratch, the stack2 scratch, the
    2-slot z ring and weight-bank slots, staging and the input blocks
    make up the rest. Cp must be sublane-aligned (8) for the r-history
    DMA slices; shapes that fail here fall back to the scan backward
    (lista3d_bwd), gated by ITS estimate."""
    if D % s or H % s or W % s:
        return False
    P = (P,) * 3 if isinstance(P, int) else tuple(P)
    pads = tuple(p // 2 for p in P)
    (dlo, dhi), (hlo, hhi), (wlo, whi) = _geom(P, pads, s)
    Qd, Qh, Qw = dhi - dlo + 1, hhi - hlo + 1, whi - wlo + 1
    T = Qd * Qh * Qw
    Cp = C * s**3
    if Cp % 8:
        return False
    Dc = D // s
    Lhw = (H // s) * (W // s)
    Mp = -(-M // 8) * 8
    Glo, Ghi = max(0, -dlo), max(0, dhi)
    Dw = Dc + Glo + Ghi
    # the weight banks / dA/dB outputs are HBM-sliced per k with T*Cp on
    # the LANE axis; Mosaic requires 128-aligned lane extents, so the
    # wrapper pads T*Cp up to the lane tile (e.g. P=(9,9,5): 600 -> 640)
    TCpad = -(-T * Cp // 128) * 128
    # preroll=True sizes the variant WITH the rolled-copies scratch; the
    # wrapper gates preroll on this separately so near-budget shapes keep
    # the resident kernel (preroll off) instead of demoting to the scan
    # backward. Routing (autodiff.lista3d_reverse_path) calls the default.
    pre = Dw * Qh * Qw * Cp * Lhw if preroll else 0
    est = (
        Dc * Mp * Lhw              # dv resident
        + pre
        + 2 * Dw * Cp * Lhw        # ds + r guard windows
        + TCpad * Lhw              # stack / w / stack2 (shared, lane-padded)
        + 2 * Mp * Lhw             # 2-slot z ring
        + 2 * Mp * TCpad           # 2-slot A2m ring
        + 2 * Mp * TCpad           # 2-slot B2m ring (Mp, T*Cp layout)
        + 2 * Mp * TCpad           # dA/dB staging
        + K * 2 * Mp               # dt block
        + 3 * 2 * Dc * Cp * Lhw    # dx2/y2(/m2) in blocks, double-buffered
        + (Qh + Qw + Qh * Qw + 1) * Lhw  # masks + crow
    ) * 4
    return est < _VMEM_BUDGET


def _kernel_bwd_resident(*refs, K, Dc, Qd, Qh, Qw, Cp, Wc,
                         dlo, hlo, wlo, use_mask, interp, preroll=False):
    """See module docstring. Grid (N,). refs:

    inputs:  dx2 (1,Dc,Cp,Lhw), y2 (1,Dc,Cp,Lhw), [m2 (1,Dc,Cp,Lhw)],
             crow (1,1,Lhw), acol (Qw,Lhw), arow (Qh,Lhw), sm (QhQw,Lhw),
             zh ANY (K,N,Dc,Mp,Lhw), rh ANY (max(K-1,1),N,Dc,Cp,Lhw),
             a2m ANY (K,Mp,T*Cp), b2m ANY (K,Mp,T*Cp) [transposed bank]
    outputs: dA ANY (N,K,Mp,T*Cp), dB ANY (N,K,Mp,T*Cp) [transposed],
             dt VMEM revisited (K,2,Mp)
    scratch: dv (Dc,Mp,Lhw), ds (Dw,Cp,Lhw), rwin (Dw,Cp,Lhw),
             stack (T*Cp,Lhw) [shared by ana stack/w and syn stack2],
             zring (2,Mp,Lhw), aring/bring (2,Mp,T*Cp),
             dAs/dBs (Mp,T*Cp), + DMA semaphores
    """
    from jax.experimental.pallas import tpu as pltpu

    i = 0
    dx2_ref = refs[i]; i += 1
    y2_ref = refs[i]; i += 1
    m2_ref = None
    if use_mask:
        m2_ref = refs[i]; i += 1
    rest = refs[i:]
    (crow_ref, acol_ref, arow_ref, sm_ref, zh_ref, rh_ref, a2m_ref,
     b2m_ref, dA_ref, dB_ref, dt_ref, dv_ref, ds_ref, rwin_ref,
     stack_ref) = rest[:15]
    rest = rest[15:]
    pre_ref = None
    if preroll:
        pre_ref, rest = rest[0], rest[1:]
    (zring_ref, aring_ref, bring_ref,
     dAs_ref, dBs_ref, zsem, asem, bsem, rsem, osem) = rest
    # the syn phase's stack2 window stack is (T*Cp, Lhw) — identical to
    # the ana phase's stack/w scratch, and the phases never overlap
    stack2_ref = stack_ref

    n = pl.program_id(0)
    Lhw = dv_ref.shape[-1]
    Mp = dv_ref.shape[1]
    Glo, Ghi = max(0, -dlo), max(0, dlo + Qd - 1)

    def roll(buf, off):
        return pltpu.roll(buf, (-off) % Lhw, 1) if off % Lhw else buf

    dcopy, dma_start, dma_wait, floop, rem2 = make_dma_helpers(interp)

    # ---------------- DMA helpers (descriptors reconstructed at wait) ----
    def z_dma(k, e, slot):
        return dcopy(zh_ref.at[k, n, e], zring_ref.at[slot], zsem.at[slot])

    def a_dma(k, slot):
        return dcopy(a2m_ref.at[k], aring_ref.at[slot], asem.at[slot])

    def b_dma(k, slot):
        return dcopy(b2m_ref.at[k], bring_ref.at[slot], bsem.at[slot])

    def r_dma(k):  # whole depth slice of iteration k's residual
        return dcopy(rh_ref.at[k, n], rwin_ref.at[pl.ds(Glo, Dc)], rsem)

    # ---------------- once per program: zero guards + init dt -----------
    @pl.when(n == 0)
    def _init_dt():
        dt_ref[:] = jnp.zeros_like(dt_ref)

    for g in range(Glo):
        rwin_ref[g] = jnp.zeros_like(rwin_ref[0])
    for g in range(Ghi):
        rwin_ref[Glo + Dc + g] = jnp.zeros_like(rwin_ref[0])
    TCp = Qd * Qh * Qw * Cp
    if stack_ref.shape[0] > TCp:
        # lane-padded bank layout (see wrapper): the pad rows of the
        # shared stack must stay zero so the dAs/dBs dots emit zero pad
        # columns. The per-tap writes never touch them, and the w
        # full-store re-zeroes them (the padded bank columns are zero) —
        # only this initial zeroing is needed.
        stack_ref[TCp:] = jnp.zeros_like(stack_ref[TCp:])
    if preroll:
        # pre_ref guard frames stay zero forever (both phases write only
        # interior frames, and every interior row is overwritten before use)
        for g in range(Glo):
            pre_ref[g] = jnp.zeros_like(pre_ref[0])
        for g in range(Ghi):
            pre_ref[Glo + Dc + g] = jnp.zeros_like(pre_ref[0])

    # ---------------- phase bodies --------------------------------------
    def zero_ds():
        def zstep(g, _):
            ds_ref[g] = jnp.zeros_like(ds_ref[0])
            return 0
        floop(Dc + Glo + Ghi, zstep)

    def zero_ds_guards():
        for g in range(Glo):
            ds_ref[g] = jnp.zeros_like(ds_ref[0])
        for g in range(Ghi):
            ds_ref[Glo + Dc + g] = jnp.zeros_like(ds_ref[0])

    def ana_phase(k, emit_ds):
        """dAs = -sum_d dv[d] @ stack(r)[d]^T; ds[d+dq] += unroll(w[d]).

        rwin interior must hold r_k; aring slot k%2 must hold A2m[k]."""
        aslot = rem2(k)
        if emit_ds:
            zero_ds()
        dAs_ref[:] = jnp.zeros_like(dAs_ref)

        if preroll:
            # roll+mask each r frame by the Qh*Qw in-plane analysis taps
            # ONCE (vs once per referencing output frame — ~Qd x less VPU
            # work); the dAs dot reads a contiguous Qd-frame window whose
            # (j, qi, ri, cp) row order matches the stack layout exactly
            def rbuild(dp, _):
                src = rwin_ref[dp + Glo]
                for qi in range(Qh):
                    rowed = roll(src, (hlo + qi) * Wc) * arow_ref[qi][None, :]
                    for ri in range(Qw):
                        t2 = qi * Qw + ri
                        pre_ref[dp + Glo, t2 * Cp : (t2 + 1) * Cp] = (
                            roll(rowed, wlo + ri) * acol_ref[ri][None, :]
                        )
                return 0

            floop(Dc, rbuild)

        def dstep(d, _):
            dv = dv_ref[d]
            if preroll:
                win = pre_ref[pl.ds(d + dlo + Glo, Qd)].reshape(
                    Qd * Qh * Qw * Cp, Lhw
                )
            else:
                for j in range(Qd):
                    rj = rwin_ref[d + j + Glo + dlo]  # guards are zero
                    for qi in range(Qh):
                        rowed = roll(rj, (hlo + qi) * Wc) * arow_ref[qi][None, :]
                        for ri in range(Qw):
                            tp = (j * Qh + qi) * Qw + ri
                            stack_ref[tp * Cp : (tp + 1) * Cp] = (
                                roll(rowed, wlo + ri) * acol_ref[ri][None, :]
                            )
                win = stack_ref[:]
            dAs_ref[:] += -jax.lax.dot_general(
                dv, win, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if emit_ds:
                # w = -A2m[k]^T dv overwrites stack (stack is dead)
                stack_ref[:] = -jax.lax.dot_general(
                    aring_ref[aslot], dv, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                for j in range(Qd):
                    acc = jnp.zeros((Cp, Lhw), jnp.float32)
                    for qi in range(Qh):
                        inner = jnp.zeros((Cp, Lhw), jnp.float32)
                        for ri in range(Qw):
                            tp = (j * Qh + qi) * Qw + ri
                            wt = stack_ref[tp * Cp : (tp + 1) * Cp]
                            inner += roll(acol_ref[ri][None, :] * wt,
                                          -(wlo + ri))
                        acc += roll(arow_ref[qi][None, :] * inner,
                                    -(hlo + qi) * Wc)
                    # scatter at the tap's TARGET slice; out-of-range
                    # lands in guard slices, re-zeroed before syn reads
                    ds_ref[d + (dlo + j) + Glo] += acc
            return 0

        floop(Dc, dstep)

    def syn_phase(k_next, kb, with_base):
        """dz[e] = [dv[e] +] sum_j B^T stack2(ds[e+dlo+j']); dBs[j] +=
        stack2 @ z^T; dt rows k_next; dv[e] <- 1{z!=0} dz.

        zring must be prefetched for e=0; bring slot kb%2 holds the bank
        B2m[kb] in (Mp, Qd*QhQw*Cp) layout — all Qd depth taps merged
        into ONE MXU contraction per slice (384-deep at the flagship
        config vs the scan kernel's Qd separate 96-deep dots), which is
        also what keeps every HBM slice lane-aligned: Mp=176 is only
        ever a SUBLANE extent (Mosaic rejects 176-lane slices).
        z slices come from zh[k_next] (= z_{k_next})."""
        bslot = rem2(kb)
        dBs_ref[:] = jnp.zeros_like(dBs_ref)
        if use_mask and with_base:
            # ds holds dr and the forward masked the residual (init's
            # ds=dx2 is the unmasked final synthesis)
            def mstep(d, _):
                ds_ref[d + Glo] *= m2_ref[0, d]
                return 0
            floop(Dc, mstep)
        zero_ds_guards()
        crow = crow_ref[0, 0][None, :]
        QhQw = Qh * Qw

        if preroll:
            # roll+mask each ds frame by the Qh*Qw synthesis taps ONCE.
            # The per-e window then ascends in FRAME order f = e + dlo + j'
            # (j' = Qd-1-j), so the B2m bank and the staged dBs columns are
            # j-REVERSED — the wrapper reverses the bank's depth axis on
            # the way in and un-reverses dB on the way out.
            def dsbuild(dp, _):
                g = ds_ref[dp + Glo]
                for qi in range(Qh):
                    for ri in range(Qw):
                        tp = qi * Qw + ri
                        off = (qi - (Qh - 1) - hlo) * Wc + (
                            ri - (Qw - 1) - wlo)
                        pre_ref[dp + Glo, tp * Cp : (tp + 1) * Cp] = roll(
                            g * sm_ref[tp][None, :], -off)
                return 0

            floop(Dc, dsbuild)

        def estep(e, dtk):
            zslot = rem2(e)
            dma_wait(z_dma(k_next, e, zslot))
            if interp:
                if e + 1 < Dc:
                    dma_start(z_dma(k_next, e + 1, rem2(e + 1)))
            else:
                @pl.when(e + 1 < Dc)
                def _pf():
                    dma_start(z_dma(k_next, e + 1, rem2(e + 1)))
            z = zring_ref[zslot].astype(jnp.float32)
            if preroll:
                stk2 = pre_ref[pl.ds(e + dlo + Glo, Qd)].reshape(
                    Qd * QhQw * Cp, Lhw
                )
            else:
                for j in range(Qd):
                    # tap j's cotangent window: ds[e - dq_sj] with
                    # dq_sj = j - (Qd-1) - dlo (kernels/lista3d_bwd gviews);
                    # guard slices are zero <=> the scan version's valid mask
                    g = ds_ref[e + (Qd - 1) + dlo - j + Glo]
                    for qi in range(Qh):
                        for ri in range(Qw):
                            tp = qi * Qw + ri
                            off = (qi - (Qh - 1) - hlo) * Wc + (
                                ri - (Qw - 1) - wlo)
                            stack2_ref[(j * QhQw + tp) * Cp :
                                       (j * QhQw + tp + 1) * Cp] = roll(
                                g * sm_ref[tp][None, :], -off)
                stk2 = stack2_ref[:]
            dz = jax.lax.dot_general(
                bring_ref[bslot], stk2, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if with_base:
                dz += dv_ref[e]
            # dB in TRANSPOSED (Mp, Qd*QhQw*Cp) layout: full staging
            # writes, lane-aligned DMA out; wrapper transposes back
            dBs_ref[:] += jax.lax.dot_general(
                z, stk2, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            sgn = jnp.sign(z)
            dtk = dtk + jnp.stack(
                [-jnp.sum(sgn * dz, axis=1),
                 -jnp.sum(sgn * dz * crow, axis=1)])
            dv_ref[e] = jnp.where(z != 0.0, dz, 0.0)
            return dtk

        dtk = jnp.zeros((2, Mp), jnp.float32)
        if interp:
            for e in range(Dc):
                dtk = estep(e, dtk)
        else:
            dtk = jax.lax.fori_loop(0, Dc, estep, dtk)
        # one dynamic-index store per phase; accumulates across the
        # revisited (N,) grid
        dt_ref[k_next] += dtk

    def write_dA(k):
        c = dcopy(dAs_ref, dA_ref.at[n, k], osem)
        dma_start(c)
        dma_wait(c)

    def write_dB(k):
        c = dcopy(dBs_ref, dB_ref.at[n, k], osem)
        dma_start(c)
        dma_wait(c)

    # ---------------- reverse sweep -------------------------------------
    # init: adjoint of the final dictionary synthesis (bank B2m[0]):
    # ds := dx2, z = z_{K-1}, no base; emits dB2m[0] and dt rows K-1
    dma_start(b_dma(0, 0))
    dma_start(z_dma(K - 1, 0, 0))

    def cstep(d, _):
        ds_ref[d + Glo] = dx2_ref[0, d]
        return 0

    zero_ds()
    floop(Dc, cstep)
    dma_wait(b_dma(0, 0))
    syn_phase(K - 1, 0, with_base=False)
    write_dB(0)

    # k = K-1 .. 1: ana(dv_k, r_k, A2m[k]) -> ds; syn(ds, z_{k-1}, B2m[k])
    def rev_body(ii, _):
        k = K - 1 - ii
        dma_start(a_dma(k, rem2(k)))
        dma_start(b_dma(k, rem2(k)))
        dma_start(r_dma(k - 1))          # r_hist[k-1] IS r_k (see wrapper)
        dma_wait(a_dma(k, rem2(k)))
        dma_wait(r_dma(k - 1))
        ana_phase(k, emit_ds=True)
        write_dA(k)
        dma_start(z_dma(k - 1, 0, 0))
        dma_wait(b_dma(k, rem2(k)))
        syn_phase(k - 1, k, with_base=True)
        write_dB(k)
        return 0

    if interp:
        for ii in range(K - 1):
            rev_body(ii, 0)
    else:
        jax.lax.fori_loop(0, K - 1, rev_body, 0)

    # k = 0: r_0 = -y2 (no stored residual); dA only, the dz chain ends
    def y2step(d, _):
        rwin_ref[d + Glo] = -y2_ref[0, d]
        return 0

    floop(Dc, y2step)
    dma_start(a_dma(0, 0))
    dma_wait(a_dma(0, 0))
    ana_phase(0, emit_ds=False)
    write_dA(0)


def lista3d_fused_bwd_resident(dxp, yp, A, B, t, c, mask, z_hist, r_hist,
                               stride=1, interpret=False):
    """Drop-in replacement of lista3d_bwd.lista3d_fused_bwd running the whole
    reverse loop in ONE resident kernel per sample (see module docstring).
    Same inputs/outputs: returns (dA, dB, dt) in torch weight layouts."""
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
    Glo, Ghi = max(0, -dlo), max(0, dhi)
    Dw = Dc + Glo + Ghi

    from cdlnet_tpu.kernels.lista3d import prep_A2m_3d, prep_B2m_3d

    A2m, vjpA = jax.vjp(lambda Aw: prep_A2m_3d(Aw, s, pads), A)
    B2m, vjpB = jax.vjp(lambda Bw: prep_B2m_3d(Bw, s, pads), B)
    A2m = A2m.astype(jnp.float32)

    import os

    # preroll (see _kernel_bwd_resident): hoist the ana/syn tap roll+mask
    # builds to once per frame; the syn window ascends in frame order, so
    # the B2m bank's depth-tap axis is reversed here (and dB un-reversed
    # below). DEFAULT since the resident-hist forward landed: a
    # reproducible -0.5 ms on the 12.9 ms flagship video train step
    # (A/B x2: 12.9/13.0 -> 12.4/12.5; at the older 17.6 ms step it was
    # within tunnel noise). CDLNET_LISTA3D_BWD_PREROLL=0 opts out; shapes
    # that fit resident but not resident+preroll keep the resident kernel
    # with preroll off.
    TCp = T * Cp
    TCpad = -(-TCp // 128) * 128  # Mosaic lane-tile alignment for HBM slices
    preroll = (
        os.environ.get("CDLNET_LISTA3D_BWD_PREROLL", "1") != "0"
        and Qd > 1
        and TCpad == TCp  # preroll windows read the UNPADDED tap layout
        and lista3d_bwd_resident_supported(M, C, P, s, K, D, H, W,
                                           preroll=True)
    )
    B2mk = B2m[:, ::-1] if preroll else B2m
    # B bank in (K, Mp, Qd*QhQw*Cp) layout: Mp=176 on SUBLANES only —
    # Mosaic rejects HBM slices whose LANE extent is not 128-aligned
    B2mt = (
        B2mk.astype(jnp.float32)
        .transpose(0, 3, 1, 2)
        .reshape(K, Mp, T * Cp)
    )
    if TCpad != TCp:
        # per-k bank DMA slices carry T*Cp on the LANE axis ("Slice shape
        # along dimension 2 must be aligned to tiling (128)", e.g. 600 at
        # P=(9,9,5)) — pad here, slice dA/dB back below. Padded columns
        # are zero, so they contribute nothing to any dot in the kernel.
        A2m = jnp.pad(A2m, ((0, 0), (0, 0), (0, TCpad - TCp)))
        B2mt = jnp.pad(B2mt, ((0, 0), (0, 0), (0, TCpad - TCp)))

    y5 = pp.space_to_depth(yp, s, 3)
    y2 = y5.transpose(0, 2, 1, 3, 4).reshape(N, Dc, Cp, Lhw).astype(jnp.float32)
    dx5 = pp.space_to_depth(dxp, s, 3)
    dx2 = dx5.transpose(0, 2, 1, 3, 4).reshape(N, Dc, Cp, Lhw).astype(jnp.float32)
    use_mask = mask is not None
    ops_mask = []
    if use_mask:
        m2 = (
            pp.space_to_depth(jnp.broadcast_to(mask, yp.shape), s, 3)
            .transpose(0, 2, 1, 3, 4)
            .reshape(N, Dc, Cp, Lhw)
            .astype(jnp.float32)
        )
        ops_mask = [m2]

    acol = jnp.asarray(_axis_masks([wlo + ri for ri in range(Qw)], Hc, Wc, 1))
    arow = jnp.asarray(_axis_masks([hlo + qi for qi in range(Qh)], Hc, Wc, 0))
    scol = jnp.asarray(
        _axis_masks([ri - (Qw - 1) - wlo for ri in range(Qw)], Hc, Wc, 1))
    srow = jnp.asarray(
        _axis_masks([qi - (Qh - 1) - hlo for qi in range(Qh)], Hc, Wc, 0))
    sm = (srow[:, None, :] * scol[None, :, :]).reshape(Qh * Qw, Lhw)

    c_arr = jnp.asarray(c, jnp.float32).reshape(-1)
    if c_arr.size == 1:
        c_arr = jnp.broadcast_to(c_arr, (N,))
    crow = jnp.broadcast_to(c_arr[:, None, None], (N, 1, Lhw)).astype(jnp.float32)

    # rh must be non-empty for the BlockSpec machinery even at K=1
    rh = r_hist if K > 1 else jnp.zeros((1, N, Dc, Cp, Lhw), jnp.float32)

    kern = functools.partial(
        _kernel_bwd_resident, K=K, Dc=Dc, Qd=Qd, Qh=Qh, Qw=Qw, Cp=Cp,
        Wc=Wc, dlo=dlo, hlo=hlo, wlo=wlo, use_mask=use_mask,
        interp=interpret, preroll=preroll,
    )
    nblk = lambda ch: pl.BlockSpec((1, Dc, ch, Lhw), lambda n: (n, 0, 0, 0),
                                   memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    anyspace = pl.BlockSpec(memory_space=pl.ANY)

    outs = pl.pallas_call(
        kern,
        grid=(N,),
        in_specs=(
            [nblk(Cp), nblk(Cp)]
            + ([nblk(Cp)] if use_mask else [])
            + [
                pl.BlockSpec((1, 1, Lhw), lambda n: (n, 0, 0),
                             memory_space=pltpu.VMEM),  # crow
                full, full, full,                       # acol, arow, sm
                anyspace, anyspace, anyspace, anyspace,  # zh, rh, a2m, b2m
            ]
        ),
        out_specs=[
            anyspace,                                   # dA (N, K, ...)
            anyspace,                                   # dB (N, K, ...)
            pl.BlockSpec((K, 2, Mp), lambda n: (0, 0, 0),
                         memory_space=pltpu.VMEM),      # dt (revisited)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, K, Mp, TCpad), jnp.float32),
            jax.ShapeDtypeStruct((N, K, Mp, TCpad), jnp.float32),
            jax.ShapeDtypeStruct((K, 2, Mp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((Dc, Mp, Lhw), jnp.float32),          # dv
            pltpu.VMEM((Dw, Cp, Lhw), jnp.float32),          # ds window
            pltpu.VMEM((Dw, Cp, Lhw), jnp.float32),          # r window
            pltpu.VMEM((TCpad, Lhw), jnp.float32),           # stack/w/stack2
        ]
        + ([pltpu.VMEM((Dw, Qh * Qw * Cp, Lhw), jnp.float32)]  # rolled copies
           if preroll else [])
        + [
            pltpu.VMEM((2, Mp, Lhw), z_hist.dtype),          # z ring
            pltpu.VMEM((2, Mp, TCpad), jnp.float32),         # A2m ring
            pltpu.VMEM((2, Mp, TCpad), jnp.float32),         # B2m ring
            pltpu.VMEM((Mp, TCpad), jnp.float32),            # dA staging
            pltpu.VMEM((Mp, TCpad), jnp.float32),            # dB staging
            pltpu.SemaphoreType.DMA((2,)),                   # z
            pltpu.SemaphoreType.DMA((2,)),                   # A
            pltpu.SemaphoreType.DMA((2,)),                   # B
            pltpu.SemaphoreType.DMA(()),                     # r
            pltpu.SemaphoreType.DMA(()),                     # out
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        interpret=interpret,
    )(dx2, y2, *ops_mask, crow, acol, arow, sm,
      z_hist, rh.astype(jnp.float32), A2m, B2mt)

    dA2m = jnp.sum(outs[0], axis=0)[..., :TCp]   # (K, Mp, T*Cp)
    # dB comes back transposed (K, Mp, Qd*QhQw*Cp); restore the
    # (K, Qd, QhQwCp, Mp) layout vjpB transports (un-reversing the
    # preroll bank's depth-tap axis)
    dB2m = jnp.sum(outs[1], axis=0)[..., :TCp].reshape(
        K, Mp, Qd, Qh * Qw * Cp)
    if preroll:
        dB2m = dB2m[:, :, ::-1]
    dB2m = dB2m.transpose(0, 2, 3, 1)
    dt01 = outs[2]                           # (K, 2, Mp), already n-summed

    dA = vjpA(dA2m)[0]
    dB = vjpB(dB2m)[0]
    dt = jnp.stack([dt01[:, 0, :M], dt01[:, 1, :M]], axis=1)[
        ..., None, None, None]
    return dA.astype(A.dtype), dB.astype(B.dtype), dt.astype(t.dtype)
