"""Depth-ring merged REVERSE kernel for big-frame 3D LISTA training.

Training companion to kernels/lista3d_ring: ONE Pallas call per reverse
iteration with the analysis adjoint (ds) and the synthesis adjoint +
weight/threshold grads (dz/dA/dB/dt) merged, ds never leaving VMEM, and
the running code cotangent dv read through a VMEM ring of haloed slabs.

Why: the banded reverse pair (kernels/lista3d_tiled_bwd) reads the FULL
M-channel dv through 3 clamped band views at EVERY depth tap of its
ds-builder grid — ~Qd x (1+2hs/Bh) x Mp x 4 bytes per code pixel per
iteration (~3.9 KB at flagship (7,7,5)), which made big-frame training
HBM-bound on dv reads (the r4 decomposition measured the reverse at
~231 of 333.8 ms/step at 16x480x432, tools/profile_bigframe_train.py).
Here dv crosses HBM ~1.25x per direction per iteration (band + two halo
slivers in, dv_out blocks out) like z in the forward ring — ~2.0 KB/px
total including the z/r history reads — and every tap-chain build uses
the forward ring's r4 restructure: pad columns retire all column masks
(zero pads make each lane-crossing read hit a zero column — exact, see
lista3d_ring._padded_wc), and on 128-multiple widths the per-tap shifts
split into aligned value slices plus one roll per lane class.

Structure — grid (N, nb, Dc + lat1 + lat2), depth e INNERMOST so the
scratch rings persist across the depth sweep (each band sweep re-warms
its rings during its first lat1+lat2 steps; validity SELECTS keep
uninitialized slots out — 0*NaN poisons, so selects, not multiplies):

  load    dv[e]        -> haloed slab into ring slot e % Rz (band + two
                          hs-row neighbor slivers; b-edge halos zeroed).
  ds      ds[e-lat1]   on Bh+2*Hh EXTENDED rows (halo recomputed locally
                          so the next stage needs no band neighbors):
                          ds = -vme * [m2e *] stack-adjoint(A_k^T dv_k),
                          one merged (Qh*Qw*Cp)-row MXU dot per depth tap
                          slab, analysis-position output shifts; into the
                          ds ring.
  dz      at e-lat1-lat2: dz = dv_k + B_ana_k @ stack2(ds) (mirrored-
                          offset gather from the ds ring); then
                          dv_out = 1{z_{k-1}!=0} dz (HBM block out),
                          dt_{k-1} += [-sum sign(z) dz, cv * that],
                          dB_k    += z_{k-1} @ stack2^T,
                          dA_{k-1}+= -dv_out @ stack(r_{k-1})^T, the
                          forward analysis build from the r_hist blocks
                          the ring forward streamed on EXTENDED rows
                          (lista3d_ring(return_hists=True)) — no band
                          neighbors needed there either.

The first reverse step (the adjoint of x2 = D z_{K-1}) is a degenerate
mode: stack2 sources from HBM views of the x-cotangent g0 (extended
bands) instead of the ds ring, no dv base, grid (N, nb, Dc) unskewed.

Index symmetry is the banded reverse's (lista3d_tiled_bwd module
docstring): the analysis adjoint reads dv with the forward SYNTHESIS view
map, the synthesis adjoint reads ds with the forward ANALYSIS view map;
both banks are pre-reversed along the depth-tap axis.

Gradients match the XLA scan's autodiff to reassociation tolerance with
f32 histories (interpret-mode tests, tests/test_kernels3d_ring_bwd.py).
Input/sigma/mask cotangents are zero by construction (parameter-only
training gradients). Reference: gradients of model/net.py:121-227
(CDLNetVideo) under the train3d.py:35-152 protocol.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

from cdlnet_tpu.kernels.lista3d import prep_A2m_3d, prep_B2m_3d
from cdlnet_tpu.kernels.lista3d_ring import (
    _VMEM_BUDGET,
    _store_haloed,
    _lanepad,
    _lats,
    _pad128,
    _padded_wc,
    _ring_bytes3,
    _w_pad_min,
    ext_bands,
    ring_masks,
)
from cdlnet_tpu.kernels.lista3d_tiled import _geometry3, _sliver_rows
from cdlnet_tpu.ops import polyphase as pp


def _ring_bwd_bytes(M, Cp, Qd, Qh, Qw, Bh, Wc, Hh, nb, dlo, hist_bytes=2,
                    use_mask=False):
    """Per-program VMEM estimate for the merged reverse kernel (blocked
    inputs/outputs double-buffered x2)."""
    Mp = -(-M // 8) * 8
    T = Qd * Qh * Qw
    Lb = Bh * Wc
    Lwr = (Bh + 2 * Hh) * Wc
    Lwz = (Bh + 4 * Hh) * Wc
    hs = _sliver_rows(Bh, 2 * Hh, Wc)
    lat1, lat2, dhi = _lats(dlo, Qd)
    Rz = max(lat1 + dhi, lat1 + lat2) + 1
    Rr = lat2 - dlo + 1
    n = (
        2 * Mp * (Lb + 2 * hs * Wc) * 4   # dv band + 2 sliver views (f32)
        + Rz * Mp * _pad128(Lwz) * 4      # dv slab ring
        + Rr * Cp * _pad128(Lwr) * 4      # ds slab ring
        + T * Cp * Lb * 4                 # shared stack scratch (f32)
        + Qh * Qw * Cp * Lwz * 4          # stage-A dot out
        + Qd * 2 * Cp * Lwr * 4           # r_ext views
        + (2 * Cp * Lwr * 4 if use_mask else 0)  # m2e view
        + 2 * Mp * Lb * hist_bytes        # z center block
        + 2 * Mp * Lb * 4                 # dv_out block
        + 2 * 2 * Mp * T * Cp * 4         # dA + dB accumulator blocks
        + Qd * Qh * Qw * Cp * Mp * 4      # A_syn_k bank
        + Mp * T * Cp * 4                 # B_ana_k bank
        + nb * (Lwr + Lb) * 4             # vme (+ slack)
        + 2 * Qw * Cp * Lwr * 4           # lane-class accumulators/copies
        + Mp * Lwz * 4                    # transients
    )
    return n


def pick_band_ring_train(M, C, P, s, Dc, Hc, Wc, hist_bytes=None,
                         use_mask=False):
    """Largest band height fitting BOTH the history-collecting ring
    forward and the merged reverse kernel (the histories arrive banded at
    the forward's band, so training picks the band jointly). None when no
    band fits. Wc is the TRUE code width (padding applied internally,
    mirroring _pick_band_ring)."""
    from cdlnet_tpu.kernels.lista2d import hist_dtype

    if hist_bytes is None:
        hist_bytes = jnp.dtype(hist_dtype()).itemsize
    P_, pads, Qd, Qh, Qw, dlo, hlo, wlo, Hh = _geometry3(P, s)
    Cp = C * s**3
    Wc = _padded_wc(Wc, 2 * Hh, pc_min=_w_pad_min(wlo, Qw), w128=False)
    import os as _os

    band_env = _os.environ.get("CDLNET_RING_BWD_BAND")
    if band_env:
        return int(band_env)
    for Bh in (128, 64, 32, 16, 8):
        if Bh < 2 * Hh:
            continue
        nb = -(-Hc // Bh)
        fwd = (_ring_bytes3(M, Cp, Qd, Qh, Qw, Bh, Wc, Hh, nb, dlo,
                            z_bytes=hist_bytes, use_mask=use_mask)
               + 2 * Cp * (Bh + 2 * Hh) * Wc * 4)  # + r_ext out block
        bwd = _ring_bwd_bytes(M, Cp, Qd, Qh, Qw, Bh, Wc, Hh, nb, dlo,
                              hist_bytes=hist_bytes, use_mask=use_mask)
        if fwd < _VMEM_BUDGET and bwd < _VMEM_BUDGET:
            return Bh
    return None


def lista3d_ring_bwd_supported(M, C, P, s, K, D, H, W, hist_bytes=None,
                               use_mask=False) -> bool:
    """True when the merged ring reverse applies: stride-divisible shape
    and a band exists fitting the history forward AND the reverse."""
    if D % s or H % s or W % s:
        return False
    P_, pads, Qd, Qh, Qw, dlo, hlo, wlo, Hh = _geometry3(P, s)
    if Hh < 1:
        return False
    return pick_band_ring_train(M, C, P, s, D // s, H // s, W // s,
                                hist_bytes=hist_bytes,
                                use_mask=use_mask) is not None


# ---------------------------------------------------------------------------
# in-kernel tap-chain builders (pad columns retire all column masks; on
# 128-multiple widths shifts split into aligned slices + one roll/class)
# ---------------------------------------------------------------------------


def _build_stack2(get_src, stack_ref, *, Qd, Qh, Qw, Cp, Wc, Bh, Hh,
                  hlo, wlo, lane):
    """Mirrored-offset gather (the adjoint of the synthesis scatter):
    stack2[t][i] = src_j[lo + i - off], off = (qi-(Qh-1)-hlo)*Wc +
    (ri-(Qw-1)-wlo). Sources are (Cp, Lwr) extended-row slabs."""
    from jax.experimental.pallas import tpu as pltpu

    Lb = Bh * Wc
    Lwr = (Bh + 2 * Hh) * Wc
    lo = Hh * Wc
    for j in range(Qd):
        dsh = get_src(j)
        if lane:
            cls = sorted({ri - (Qw - 1) - wlo for ri in range(Qw)})
            ds_cls = {
                c: (pltpu.roll(dsh, c % Lwr, 1) if c % Lwr else dsh)
                for c in cls
            }
            for qi in range(Qh):
                start = lo - (qi - (Qh - 1) - hlo) * Wc
                for ri in range(Qw):
                    t = (j * Qh + qi) * Qw + ri
                    c = ri - (Qw - 1) - wlo
                    stack_ref[t * Cp : (t + 1) * Cp] = (
                        ds_cls[c][:, start : start + Lb])
        else:
            for qi in range(Qh):
                for ri in range(Qw):
                    t = (j * Qh + qi) * Qw + ri
                    off = (qi - (Qh - 1) - hlo) * Wc + (ri - (Qw - 1) - wlo)
                    rolled = (
                        pltpu.roll(dsh, off % Lwr, 1) if off % Lwr else dsh)
                    stack_ref[t * Cp : (t + 1) * Cp] = rolled[:, lo : lo + Lb]


def _build_astack(get_src, stack_ref, *, Qd, Qh, Qw, Cp, Wc, Bh, Hh,
                  hlo, wlo, lane):
    """Forward analysis gather: stack[t][i] = src_j[lo + i + off],
    off = (hlo+qi)*Wc + (wlo+ri) — the build the forward's
    _ana_from_ring does, from extended-row (Cp, Lwr) slabs."""
    from jax.experimental.pallas import tpu as pltpu

    Lb = Bh * Wc
    Lwr = (Bh + 2 * Hh) * Wc
    lo = Hh * Wc
    for j in range(Qd):
        rh = get_src(j)
        if lane:
            cls = sorted({wlo + ri for ri in range(Qw)})
            rh_cls = {
                c: (pltpu.roll(rh, (-c) % Lwr, 1) if c % Lwr else rh)
                for c in cls
            }
            for qi in range(Qh):
                start = lo + (hlo + qi) * Wc
                for ri in range(Qw):
                    t = (j * Qh + qi) * Qw + ri
                    stack_ref[t * Cp : (t + 1) * Cp] = (
                        rh_cls[wlo + ri][:, start : start + Lb])
        else:
            for qi in range(Qh):
                for ri in range(Qw):
                    t = (j * Qh + qi) * Qw + ri
                    off = (hlo + qi) * Wc + (wlo + ri)
                    rolled = (
                        pltpu.roll(rh, (-off) % Lwr, 1) if off % Lwr else rh)
                    stack_ref[t * Cp : (t + 1) * Cp] = rolled[:, lo : lo + Lb]


def _ds_from_ring(dvring, e, asyn_ref, *, Qd, Qh, Qw, Cp, Wc, Bh, Hh,
                  dlo, hlo, wlo, lat1, Rz, Dc, lane):
    """ds[e - lat1] on Bh+2*Hh extended rows from the dv slab ring: the
    stack-adjoint of the analysis gather — one merged (Qh*Qw*Cp)-row MXU
    dot per depth tap slab, ANALYSIS-position output shifts (target[i] =
    w[lo2 + i - off], off = (hlo+qi)*Wc + (wlo+ri); the banded
    ds-builder's map, lista3d_tiled_bwd._kernel_ds_band)."""
    from jax.experimental.pallas import tpu as pltpu

    Lwr = (Bh + 2 * Hh) * Wc
    Lwz = (Bh + 4 * Hh) * Wc
    lo2 = Hh * Wc  # slab margin G=2Hh minus the Hh extended-output margin
    dr = e - lat1

    if lane:
        cls = sorted({wlo + ri for ri in range(Qw)})
        pc = {c: jnp.zeros((Cp, Lwr), jnp.float32) for c in cls}
        for jp in range(Qd):
            dq = jp - (Qd - 1) - dlo
            dsl = dr + dq
            slot = lax.rem(e + (8 * Rz - lat1 + dq), Rz)
            dvh = dvring[slot][:, :Lwz]
            w = jax.lax.dot_general(
                asyn_ref[jp], dvh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (Qh*Qw*Cp, Lwz)
            valid = jnp.logical_and(dsl >= 0, dsl < Dc)
            for qi in range(Qh):
                start = lo2 - (hlo + qi) * Wc
                for ri in range(Qw):
                    t = qi * Qw + ri
                    sl = w[t * Cp : (t + 1) * Cp, start : start + Lwr]
                    # SELECT, don't multiply: warmup slots hold
                    # uninitialized VMEM and 0*NaN poisons
                    pc[wlo + ri] = pc[wlo + ri] + jnp.where(valid, sl, 0.0)
        part = jnp.zeros((Cp, Lwr), jnp.float32)
        for c in cls:
            part += pltpu.roll(pc[c], c % Lwr, 1) if c % Lwr else pc[c]
        return part

    part = jnp.zeros((Cp, Lwr), jnp.float32)
    for jp in range(Qd):
        dq = jp - (Qd - 1) - dlo
        dsl = dr + dq
        slot = lax.rem(e + (8 * Rz - lat1 + dq), Rz)
        dvh = dvring[slot][:, :Lwz]
        w = jax.lax.dot_general(
            asyn_ref[jp], dvh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        pj = jnp.zeros((Cp, Lwr), jnp.float32)
        for qi in range(Qh):
            for ri in range(Qw):
                t = qi * Qw + ri
                off = (hlo + qi) * Wc + (wlo + ri)
                piece = w[t * Cp : (t + 1) * Cp]
                rolled = (
                    pltpu.roll(piece, off % Lwz, 1) if off % Lwz else piece)
                pj += rolled[:, lo2 : lo2 + Lwr]
        valid = jnp.logical_and(dsl >= 0, dsl < Dc)
        part += jnp.where(valid, pj, 0.0)
    return part


def _grad_stage(dz, z, cv, dv_valid, stack_ref, rsrc, dvout_ref, dA_ref,
                dB_ref, dt_ref, *, geo, lane):
    """Shared tail of both kernels: the ST subgradient, dt/dB/dA
    accumulation, and the dv_out store. dz must already be
    validity-SELECTED (zeroed on warmup depths); stack_ref holds stack2
    on entry and is overwritten with the r analysis stack."""
    sel = jnp.where(dv_valid, 1.0, 0.0)
    dB_ref[0] += sel * jax.lax.dot_general(
        z, stack_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    row = -jnp.sum(jnp.sign(z) * dz, axis=1)
    dt_ref[0] += sel * jnp.stack([row, row * cv])
    dv = jnp.where(z != 0.0, dz, 0.0)
    dvout_ref[0, 0, 0] = dv

    _build_astack(rsrc, stack_ref, **geo)
    dA_ref[0] += -jax.lax.dot_general(
        dv, stack_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _kernel_rb_init(*refs, Qd, Qh, Qw, Cp, Wc, Bh, Hh, dlo, hlo, wlo,
                    Dc, lane):
    """Adjoint of the final synthesis x2 = D z_{K-1} (grid (N, nb, Dc),
    unskewed): dz_{K-1} = B_ana_0 @ stack2(g0), then the shared grad
    tail emitting dv_{K-1}, dA_{K-1}, dB_0, dt_{K-1}."""
    i = 0
    g0v = refs[i : i + Qd]; i += Qd
    rv = refs[i : i + Qd]; i += Qd
    (z_ref, bana_ref, cv_ref, dvout_ref, dA_ref, dB_ref, dt_ref,
     stack_ref) = refs[i:]

    d = pl.program_id(2)
    b = pl.program_id(1)
    geo = dict(Qd=Qd, Qh=Qh, Qw=Qw, Cp=Cp, Wc=Wc, Bh=Bh, Hh=Hh,
               hlo=hlo, wlo=wlo, lane=lane)

    @pl.when(jnp.logical_and(d == 0, b == 0))
    def _init():
        dA_ref[0] = jnp.zeros_like(dA_ref[0])
        dB_ref[0] = jnp.zeros_like(dB_ref[0])
        dt_ref[0] = jnp.zeros_like(dt_ref[0])

    def src2(j):
        dd = d + dlo + j
        valid = jnp.logical_and(dd >= 0, dd < Dc)
        return jnp.where(valid, g0v[j][0, 0, 0], 0.0)

    _build_stack2(src2, stack_ref, **geo)
    dz = jax.lax.dot_general(
        bana_ref[:], stack_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    z = z_ref[0, 0, 0].astype(jnp.float32)

    def rsrc(j):
        dd = d + dlo + j
        valid = jnp.logical_and(dd >= 0, dd < Dc)
        return jnp.where(valid, rv[j][0, 0, 0], 0.0)

    _grad_stage(dz, z, cv_ref[0, 0, 0], jnp.bool_(True), stack_ref, rsrc,
                dvout_ref, dA_ref, dB_ref, dt_ref, geo=geo, lane=lane)


def _kernel_rb_mid(*refs, Qd, Qh, Qw, Cp, Wc, Bh, Hh, dlo, hlo, wlo,
                   lat1, lat2, Rz, Rr, Dc, use_mask, lane, with_ds=False):
    """One merged reverse iteration (module docstring): dv slab load,
    ds on extended rows into the ds ring, then the dz/grad stage at
    e - lat1 - lat2. with_ds additionally streams ds (the r_k cotangent,
    = the per-iteration dy2 contribution) to HBM with a guarded store
    under its clamped revisit map — the depth-sharded training path needs
    it for the input cotangent."""
    i = 0
    dvu_ref, dvc_ref, dvd_ref, m2e_ref = refs[i : i + 4]; i += 4
    rv = refs[i : i + Qd]; i += Qd
    dsout_ref = None
    if with_ds:
        (z_ref, asyn_ref, bana_ref, cv_ref, vme_ref, dvout_ref, dA_ref,
         dB_ref, dt_ref, dsout_ref, dvring, dsring, stack_ref) = refs[i:]
    else:
        (z_ref, asyn_ref, bana_ref, cv_ref, vme_ref, dvout_ref, dA_ref,
         dB_ref, dt_ref, dvring, dsring, stack_ref) = refs[i:]

    e = pl.program_id(2)
    b = pl.program_id(1)
    nb = pl.num_programs(1)
    G = 2 * Hh
    Lb = Bh * Wc
    Lwr = (Bh + 2 * Hh) * Wc
    geo = dict(Qd=Qd, Qh=Qh, Qw=Qw, Cp=Cp, Wc=Wc, Bh=Bh, Hh=Hh,
               hlo=hlo, wlo=wlo, lane=lane)

    @pl.when(jnp.logical_and(e == 0, b == 0))
    def _init():
        dA_ref[0] = jnp.zeros_like(dA_ref[0])
        dB_ref[0] = jnp.zeros_like(dB_ref[0])
        dt_ref[0] = jnp.zeros_like(dt_ref[0])

    # ---- load dv[e] slab into the ring -------------------------------
    slot = lax.rem(e, Rz)
    _store_haloed(dvring, slot, dvu_ref[0, 0, 0], dvc_ref[0, 0, 0],
                  dvd_ref[0, 0, 0], b, nb, G, Wc, Bh)

    # ---- ds[e - lat1] on extended rows into the ds ring ---------------
    part = _ds_from_ring(dvring, e, asyn_ref, Qd=Qd, Qh=Qh, Qw=Qw, Cp=Cp,
                         Wc=Wc, Bh=Bh, Hh=Hh, dlo=dlo, hlo=hlo, wlo=wlo,
                         lat1=lat1, Rz=Rz, Dc=Dc, lane=lane)
    if use_mask:
        part = m2e_ref[0, 0, 0] * part
    ds = -vme_ref[0, 0] * part
    dsring[lax.rem(e + (8 * Rr - lat1), Rr)] = _lanepad(
        ds, dsring.shape[-1])

    if dsout_ref is not None:
        dr = e - lat1

        @pl.when(jnp.logical_and(dr >= 0, dr < Dc))
        def _store_ds():
            dsout_ref[0, 0, 0] = ds

    # ---- dz / grads at dzd = e - lat1 - lat2 ---------------------------
    dzd = e - lat1 - lat2
    dz_valid = jnp.logical_and(dzd >= 0, dzd < Dc)

    def src2(j):
        dd = dzd + dlo + j
        slot = lax.rem(e + (8 * Rr - lat1 - lat2 + dlo + j), Rr)
        valid = jnp.logical_and(dd >= 0, dd < Dc)
        return jnp.where(valid, dsring[slot][:, :Lwr], 0.0)

    _build_stack2(src2, stack_ref, **geo)
    dvslot = lax.rem(e + (8 * Rz - lat1 - lat2), Rz)
    dz = jax.lax.dot_general(
        bana_ref[:], stack_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + dvring[dvslot][:, G * Wc : G * Wc + Lb]
    # SELECT before every use: the warmup dv-center read is uninitialized
    dz = jnp.where(dz_valid, dz, 0.0)
    z = z_ref[0, 0, 0].astype(jnp.float32)

    def rsrc(j):
        dd = dzd + dlo + j
        valid = jnp.logical_and(dd >= 0, dd < Dc)
        return jnp.where(valid, rv[j][0, 0, 0], 0.0)

    _grad_stage(dz, z, cv_ref[0, 0, 0], dz_valid, stack_ref, rsrc,
                dvout_ref, dA_ref, dB_ref, dt_ref, geo=geo, lane=lane)


def make_ring3_bwd_ops(N, C, Dc, Hc, Wct, M, P, s, *, band,
                       hist_dtype=jnp.float32, use_mask=False,
                       interpret=False, with_ds=False):
    # training pads to the 16-multiple (w128=False; see _padded_wc)
    """Per-iteration merged-reverse closures + geometry.

    Factored out of lista3d_ring_fused_bwd so the depth-sharded training
    path (dist/halo_fused.py) can run the SAME reverse kernels on
    halo-extended local windows with a transpose-exchange between
    iterations. Returns a dict with:
      rb_init(g0e, r_e, z_e, B_ana0, cv) -> (dv, dA, dB, dt)
      rb_mid(dv, m2e, r_e, z_e, A_syn_k, B_ana_k, cv) -> (dv2, dA, dB, dt)
    where g0e / r_e are extended-ROW (Cp, Lwr) banded arrays, z_e banded
    (Mp, Lb) in hist_dtype, dv (N, Dc, nb, Mp, Lb) f32, dA/dB
    (N, Mp, T*Cp) per-sample accumulator blocks, dt (N, 2, Mp) with
    dt[:, 0] = the tau cotangent rows (dt[:, 1] = cv * that).

    CDLNET_PALLAS_INTERPRET=1 forces interpret mode."""
    import os

    from jax.experimental.pallas import tpu as pltpu

    interpret = interpret or os.environ.get("CDLNET_PALLAS_INTERPRET") == "1"
    P, pads, Qd, Qh, Qw, dlo, hlo, wlo, Hh = _geometry3(P, s)
    pc_min = _w_pad_min(wlo, Qw)
    Wc = _padded_wc(Wct, 2 * Hh, pc_min=pc_min, w128=False)
    # CDLNET_RING_LANE=0: trace-time ablation knob (fresh traces only) —
    # forces the per-tap-roll path at 128-multiple widths so hardware
    # parity can isolate the lane-class accumulation order
    lane = ((Wc - Wct) >= pc_min and Wc % 128 == 0
            and os.environ.get("CDLNET_RING_LANE", "1") != "0")
    Cp = C * s**3
    T = Qd * Qh * Qw
    Mp = -(-M // 8) * 8
    G = 2 * Hh
    lat1, lat2, dhi = _lats(dlo, Qd)
    Rz = max(lat1 + dhi, lat1 + lat2) + 1
    Rr = lat2 - dlo + 1
    Bh = band
    assert Bh is not None and Bh >= G, f"band {Bh} must cover {G} halo rows"
    Hcp = -(-Hc // Bh) * Bh
    nb = Hcp // Bh
    Lb = Bh * Wc
    Er = Bh + 2 * Hh
    Lwr = Er * Wc
    Lwz = (Bh + 2 * G) * Wc

    _, vme_np = ring_masks(Bh, nb, Hh, Hc, Wc, Wct)

    geom = dict(Qd=Qd, Qh=Qh, Qw=Qw, Cp=Cp, Wc=Wc, Bh=Bh, Hh=Hh,
                dlo=dlo, hlo=hlo, wlo=wlo, lane=lane)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    cparams = pltpu.CompilerParams(vmem_limit_bytes=128 * 1024 * 1024)
    hs = _sliver_rows(Bh, G, Wc)

    def clip_(x):
        return jnp.clip(x, 0, Dc - 1)

    def extv(ch, dmap):
        return pl.BlockSpec(
            (1, 1, 1, ch, Lwr),
            lambda n, b, e, dmap=dmap: (n, dmap(e), b, 0, 0),
            memory_space=pltpu.VMEM)

    def centerv(ch, L, dmap):
        return pl.BlockSpec(
            (1, 1, 1, ch, L),
            lambda n, b, e, dmap=dmap: (n, dmap(e), b, 0, 0),
            memory_space=pltpu.VMEM)

    cvspec = pl.BlockSpec((1, 1, 1), lambda n, b, e: (n, 0, 0),
                          memory_space=pltpu.VMEM)
    accspec = lambda r0, r1: pl.BlockSpec(
        (1, r0, r1), lambda n, b, e: (n, 0, 0), memory_space=pltpu.VMEM)
    acc_shapes = [
        jax.ShapeDtypeStruct((N, Mp, T * Cp), jnp.float32),
        jax.ShapeDtypeStruct((N, Mp, T * Cp), jnp.float32),
        jax.ShapeDtypeStruct((N, 2, Mp), jnp.float32),
    ]
    dv_shape = jax.ShapeDtypeStruct((N, Dc, nb, Mp, Lb), jnp.float32)

    init_specs = (
        [extv(Cp, lambda e, j=j: clip_(e + dlo + j)) for j in range(Qd)]
        + [extv(Cp, lambda e, j=j: clip_(e + dlo + j)) for j in range(Qd)]
        + [centerv(Mp, Lb, lambda e: e), full, cvspec]
    )
    init_call = pl.pallas_call(
        functools.partial(_kernel_rb_init, **geom, Dc=Dc),
        grid=(N, nb, Dc),
        in_specs=init_specs,
        out_specs=[centerv(Mp, Lb, lambda e: e),
                   accspec(Mp, T * Cp), accspec(Mp, T * Cp),
                   accspec(2, Mp)],
        out_shape=[dv_shape, *acc_shapes],
        scratch_shapes=[pltpu.VMEM((T * Cp, Lb), jnp.float32)],
        compiler_params=cparams,
        interpret=interpret,
    )

    def dvsliver(db):
        idx = Bh // hs - 1 if db < 0 else 0
        return pl.BlockSpec(
            (1, 1, 1, Mp, hs * Wc),
            lambda n, b, e, db=db, idx=idx: (
                n, clip_(e), jnp.clip(b + db, 0, nb - 1), 0, idx),
            memory_space=pltpu.VMEM)

    dvview = pl.BlockSpec(
        (1, 1, 1, Mp, Lb),
        lambda n, b, e: (n, clip_(e), b, 0, 0),
        memory_space=pltpu.VMEM)
    dummyspec = pl.BlockSpec((1, 1, 1, 1, 1),
                             lambda n, b, e: (0, 0, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    vmespec = pl.BlockSpec((1, 1, Lwr), lambda n, b, e: (b, 0, 0),
                           memory_space=pltpu.VMEM)

    mid_specs = (
        [dvsliver(-1), dvview, dvsliver(1),
         extv(Cp, lambda e: clip_(e - lat1)) if use_mask else dummyspec]
        + [extv(Cp, lambda e, j=j: clip_(e - lat1 - lat2 + dlo + j))
           for j in range(Qd)]
        + [centerv(Mp, Lb, lambda e: clip_(e - lat1 - lat2)),
           full, full, cvspec, vmespec]
    )
    mid_outs = [centerv(Mp, Lb, lambda e: clip_(e - lat1 - lat2)),
                accspec(Mp, T * Cp), accspec(Mp, T * Cp),
                accspec(2, Mp)]
    mid_shapes = [dv_shape, *acc_shapes]
    if with_ds:
        mid_outs.append(extv(Cp, lambda e: clip_(e - lat1)))
        mid_shapes.append(
            jax.ShapeDtypeStruct((N, Dc, nb, Cp, Lwr), jnp.float32))
    mid_call = pl.pallas_call(
        functools.partial(_kernel_rb_mid, **geom, lat1=lat1, lat2=lat2,
                          Rz=Rz, Rr=Rr, Dc=Dc, use_mask=use_mask,
                          with_ds=with_ds),
        grid=(N, nb, Dc + lat1 + lat2),
        in_specs=mid_specs,
        out_specs=mid_outs,
        out_shape=mid_shapes,
        scratch_shapes=[pltpu.VMEM((Rz, Mp, _pad128(Lwz)), jnp.float32),
                        pltpu.VMEM((Rr, Cp, _pad128(Lwr)), jnp.float32),
                        pltpu.VMEM((T * Cp, Lb), jnp.float32)],
        compiler_params=cparams,
        interpret=interpret,
    )

    def rb_init(g0e, r_e, z_e, B_ana0, cv):
        return init_call(*([g0e] * Qd), *([r_e] * Qd), z_e, B_ana0, cv)

    def rb_mid(dv, m2e, r_e, z_e, A_syn_k, B_ana_k, cv):
        return mid_call(dv, dv, dv, m2e, *([r_e] * Qd), z_e, A_syn_k,
                        B_ana_k, cv, jnp.asarray(vme_np))

    def prep_banks(A2m, B2m):
        """(K, Mp, T*Cp) / prep_B2m_3d output -> tap-reversed reverse
        layouts: A_syn (K, Qd, Qh*Qw*Cp, Mp), B_ana (K, Mp, T*Cp)."""
        A_syn = (
            A2m.astype(jnp.float32)
            .reshape(-1, Mp, Qd, Qh * Qw * Cp)
            .transpose(0, 2, 3, 1)[:, ::-1]
        )
        B_ana = (
            B2m.astype(jnp.float32)
            .reshape(-1, Qd, Qh * Qw * Cp, Mp)[:, ::-1]
            .reshape(-1, T * Cp, Mp)
            .transpose(0, 2, 1)
        )
        return A_syn, B_ana

    def to_ext_bands(x5):
        return ext_bands(x5, Bh, nb, Hh, Hc, Wc, Wct)

    return dict(
        rb_init=rb_init, rb_mid=rb_mid, prep_banks=prep_banks,
        to_ext_bands=to_ext_bands, pads=pads,
        Qd=Qd, Qh=Qh, Qw=Qw, Hh=Hh, Cp=Cp, T=T, Mp=Mp, Bh=Bh, nb=nb,
        Lb=Lb, Lwr=Lwr, Wc=Wc, Wct=Wct, dlo=dlo, hz=Qd - 1,
    )


def lista3d_ring_fused_bwd(dxp, yp, A, B, t, c, mask, z_hist, r_hist,
                           stride=1, interpret=False):
    """Backward companion to lista3d_ring(..., return_hists=True).

    dxp: cotangent of xphat (N, C, D, H, W); z_hist (K, N, Dc, nb, Mp, Lb)
    and r_hist (K-1, N, Dc, nb, Cp, Lwr) in the ring forward's padded
    banded layout. Returns (dA, dB, dt) in torch weight layouts;
    input/sigma/mask cotangents are zero by construction."""
    N, C, D, H, W = yp.shape
    K, M = A.shape[0], A.shape[1]
    s = stride
    P, pads, Qd, Qh, Qw, dlo, hlo, wlo, Hh = _geometry3(A.shape[-3:], s)
    Dc, Hc, Wct = D // s, H // s, W // s
    Wc = _padded_wc(Wct, 2 * Hh, pc_min=_w_pad_min(wlo, Qw), w128=False)
    use_mask = mask is not None
    # band geometry comes off the histories (the joint training pick)
    nb, Lb = z_hist.shape[3], z_hist.shape[-1]
    Bh = Lb // Wc
    assert Bh * Wc == Lb, "history band / padded-width mismatch"

    ops = make_ring3_bwd_ops(
        N, C, Dc, Hc, Wct, M, P, s, band=Bh, hist_dtype=z_hist.dtype,
        use_mask=use_mask, interpret=interpret)
    Cp, T, Mp, Lwr = ops["Cp"], ops["T"], ops["Mp"], ops["Lwr"]
    assert r_hist.shape[-1] == Lwr, "r_hist not on extended rows"

    A2m, vjpA = jax.vjp(lambda Aw: prep_A2m_3d(Aw, s, pads), A)
    B2m, vjpB = jax.vjp(lambda Bw: prep_B2m_3d(Bw, s, pads), B)
    A_syn, B_ana = ops["prep_banks"](A2m, B2m)

    y2e = ops["to_ext_bands"](pp.space_to_depth(yp, s, 3))
    g0e = ops["to_ext_bands"](pp.space_to_depth(dxp, s, 3))
    m2e = (
        ops["to_ext_bands"](
            pp.space_to_depth(jnp.broadcast_to(mask, yp.shape), s, 3))
        if use_mask
        else jnp.zeros((N, 1, 1, 1, 1), jnp.float32)
    )
    # rfull[k] IS r_k on extended rows (r_0 = -y2: the k=0 analysis
    # consumed r = -y2, whose ext-band pads are already zero)
    rfull = jnp.concatenate([-y2e[None], r_hist.astype(jnp.float32)], axis=0)

    c_arr = jnp.asarray(c, jnp.float32).reshape(-1)
    if c_arr.size == 1:
        c_arr = jnp.broadcast_to(c_arr, (N,))
    cv = c_arr.reshape(N, 1, 1)

    # ---- init: adjoint of x2 = D z_{K-1} ------------------------------
    dv, dA_last, dB_first, dt_last = ops["rb_init"](
        g0e, rfull[K - 1], z_hist[K - 1], B_ana[0], cv)

    def body(dv, xs):
        asyn_k, bana_k, zkm1, rkm1 = xs
        dv2, dAkm1, dBk, dtkm1 = ops["rb_mid"](
            dv, m2e, rkm1, zkm1, asyn_k, bana_k, cv)
        # keep the small grad outputs OUT of the fusion XLA builds around
        # the scan's dynamic-update-slices (scoped-vmem gotcha, CLAUDE.md)
        dAkm1, dBk, dtkm1 = jax.lax.optimization_barrier(
            (dAkm1, dBk, dtkm1))
        return dv2, (dAkm1, dBk, dtkm1)

    if K > 1:
        xs = (A_syn[:0:-1], B_ana[:0:-1],
              z_hist[K - 2::-1], rfull[K - 2::-1])
        _, (dAs, dBs, dts) = lax.scan(body, dv, xs)
        # scan order is k = K-1..1 (emitting k-1 = K-2..0 for dA/dt, and
        # k = K-1..1 for dB); flip back to ascending k
        dA2m = jnp.concatenate([dAs[::-1], dA_last[None]], axis=0)
        dB_ana = jnp.concatenate([dB_first[None], dBs[::-1]], axis=0)
        dt01 = jnp.concatenate([dts[::-1], dt_last[None]], axis=0)
    else:
        dA2m = dA_last[None]
        dB_ana = dB_first[None]
        dt01 = dt_last[None]

    dA2m = jnp.sum(dA2m, axis=1)  # (K, Mp, T*Cp)
    dB2m = (
        jnp.sum(dB_ana, axis=1)
        .reshape(K, Mp, Qd, Qh * Qw * Cp)[:, :, ::-1]   # un-reverse taps
        .transpose(0, 2, 3, 1)          # -> (K, Qd, Qh*Qw*Cp, Mp)
    )
    dt01 = jnp.sum(dt01, axis=1)  # (K, 2, Mp)

    dA = vjpA(dA2m.astype(A2m.dtype))[0]
    dB = vjpB(dB2m.astype(B2m.dtype))[0]
    dt = jnp.stack([dt01[:, 0, :M], dt01[:, 1, :M]],
                   axis=1)[..., None, None, None]
    return dA.astype(A.dtype), dB.astype(B.dtype), dt.astype(t.dtype)
