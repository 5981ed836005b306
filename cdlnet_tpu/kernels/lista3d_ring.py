"""Depth-ring fused 3D LISTA for big frames — one Pallas call per LISTA
iteration with synthesis AND analysis merged, the residual r never
leaving VMEM, and a VMEM ring of haloed code slabs so each z band is
read from HBM ~(1 + 2*hs/Bh)x per iteration (~1.1-1.25x: the band plus
two thin neighbor halo SLIVERS, _sliver_rows) instead of the banded
pair path's 3*Qd full views (+ r round trips) — on a workload that is
HBM-bound (measured: halving z bytes via bf16 nearly halves wall
time). r3 note: the slivers replaced the original 3 full band views —
z read was the dominant HBM term, 3x352 B/code-pixel/iter of the 1.5 KB
total.

Targets the reference's own native-resolution eval loops: analyze3d.py
DAVIS 480x854 clips (analyze3d.py:77-161) and analyzemri.py fastMRI
640x368 volumes (analyzemri.py:185-298), whose frames exceed the fused
pair gate (kernels/lista3d).

Structure — grid (N, nb, Dc + lat), depth e INNERMOST so scratch
persists across the depth sweep (Mosaic runs grid steps sequentially and
scratch carries over; same idiom as the resident kernels' staging
rings). Each step is a 3-stage software pipeline, skewed by the depth
tap ranges:

  load     zh[e]   <- clamped band view of z_old at depth e plus the
                      two hs-row neighbor halo slivers, assembled into
                      a G=2*Hh-row-haloed slab in ring slot e % Rz
                      (b-edge halos zeroed = the conv's zero padding).
  synth    r[e-lat1] on Bh+2*Hh EXTENDED rows (the row halo is
                      recomputed locally, ~Hh/Bh extra MXU work, so the
                      analysis needs no r band neighbors): one merged
                      (Qh*Qw*Cp)-row MXU dot per depth tap slab from the
                      z ring, output-side rolls (see kernels/lista3d
                      _kernel_syn for the commutation argument),
                      depth-validity SELECTS (not multiplies: warmup
                      slots are uninitialized VMEM and 0*NaN poisons),
                      [mask *] ... - y2 on extended rows, into ring slot.
  analyze  z_new[e-lat1-lat2] <- ST(z_old - A_k r, tau_k): tap stack
                      built from the r ring (already haloed — no band
                      views), one T*Cp-deep MXU contraction, z_old
                      center re-read from the z ring (no extra HBM).

lat1 = max(0, -dlo) and lat2 = max(0, dhi) are the forward/backward
depth reaches of synthesis/analysis; output blocks use clamped index
maps so the first lat steps revisit block 0 (Mosaic copies a revisited
block out after its LAST visit, so the warmup garbage never lands).

Per-iteration HBM traffic per code pixel (flagship M=169, bf16 carry,
Bh=64 G=6 hs=8): z band + slivers (1.25*352 B) + z_new write (352 B) +
y2_ext (~40 B) ~= 0.83 KB vs the banded pair path's ~4.2 KB (3*Qd z
views + r round trips) — ~5x less on an HBM-bound path (was 1.5 KB /
~2.8x before the slivers).

First iteration (z = ST(A0 y2, tau0), model/net.py:200-207's k=0) and
the final dictionary synthesis (x = D z, model/net.py:209) run as
degenerate modes of the same kernel (first: r ring <- -y2, no z term;
last: synthesis only, no y subtraction).

Inference-only, like kernels/lista3d_tiled: big-frame TRAINING (beyond
the reference's 128^2-crop protocol, train3d.py:35-152) takes the XLA
path; the model wraps calls nondifferentiable.

Hardware validation (2026-08-19, fp32 carry, s=2 P=(7,7,5) M=16 K=3
8x128x128): bit-identical to the long-validated lista3d_tiled on the
real chip (max |ring - tiled| = 0.0 on x AND z). r4 caveat: widths whose
pad lands on a 128 multiple take the lane-class tap path, whose
accumulation ORDER differs — hardware parity vs the banded pair is then
scattered fp32 reassociation amplified at soft-threshold boundaries
(measured 8x64x854 / Wc 427->512: median column-max 1.2e-7, max ~1e-3 on
~1.3% of pixels at ST flips, NOT localized at buffer edges), within the
family's bf16-carry operating tolerance; interpret tests pin the lane
path exactly against the XLA scan. Do NOT gate hardware
parity of these kernels against the XLA scan with random *unnormalized*
weights: such iterations are expansive (spectral radius of I - AB > 1),
so the TPU-XLA scan itself lands 1e-1..2e-1 max from a CPU-fp32 run and
every kernel "fails" by the same 5.8e-2 the scan does. Compare
kernel-vs-kernel, or use spectrally-normalized (init=True) weights.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

from cdlnet_tpu.kernels.lista2d import _axis_masks
from cdlnet_tpu.kernels.lista3d import prep_A2m_3d, prep_B2m_3d
from cdlnet_tpu.kernels.lista3d_tiled import _geometry3, _sliver_rows
from cdlnet_tpu.ops import polyphase as pp

_VMEM_BUDGET = int(100 * 1024 * 1024)


def _lats(dlo, Qd):
    """Pipeline skews: synthesis of r[d] needs z up to d + (-dlo);
    analysis of z[d] needs r up to d + dhi (dhi = dlo + Qd - 1)."""
    dhi = dlo + Qd - 1
    lat1 = max(0, -dlo)
    lat2 = max(0, dhi)
    return lat1, lat2, dhi


def _ring_bytes3(M, Cp, Qd, Qh, Qw, Bh, Wc, Hh, nb, dlo, z_bytes=2,
                 use_mask=False):
    """Per-program VMEM estimate for the merged mid-iteration kernel
    (the biggest of the three modes). Blocked inputs/outputs are
    double-buffered (x2)."""
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
        2 * Mp * (Lb + 2 * hs * Wc) * z_bytes  # z band + 2 sliver views
        + (2 if use_mask else 1) * 2 * Cp * Lwr * 4  # y2e (+ m2e)
        + 2 * Mp * Lb * z_bytes            # z_new out block
        + Rz * Mp * Lwz * z_bytes          # z slab ring
        + Rr * Cp * Lwr * 4                # r slab ring
        + T * Cp * Lb * z_bytes            # analysis tap stack
        + Qh * Qw * Cp * Lwz * 4           # synthesis dot out
        + Mp * Lwz * 4                     # zh f32 upcast transient
        + Mp * Lb * 4                      # u transient
        + Qd * Qh * Qw * Cp * Mp * 4       # B2m bank
        + Mp * T * Cp * z_bytes            # A2m bank
        + 2 * Qw * (Lwr + Lb) * 4          # scol/acol masks
        + 2 * nb * (Lwr + Lb) * 4          # vm masks (full VMEM)
        + 2 * Qw * Cp * Lwr * 4            # lane-class accumulators/copies
    )
    return n


def _padded_wc(Wc, G, pc_min=0, w128=True):
    """Code width after zero-column padding.

    Two reasons to pad, both exact (the vm/vme masks zero pad columns on
    every r and z — the same mechanism that already reproduces the conv's
    zero padding for ragged band rows — so real columns see zeros beyond
    the true width, identical to the conv's own zero padding; outputs are
    cropped):

    1. halo-sliver alignment: when Wc admits no 128-aligned sliver height
       below the largest band (odd Wc: gcd(Wc, 128) == 1 forces hs == Bh),
       a multiple of 16 columns makes hs = 8 * 2^k align.
    2. pc_min >= the largest in-plane W tap offset makes the per-tap
       COLUMN MASKS redundant (r4): a tap shifted past a row edge then
       reads a zero pad column (its own row's tail, or the previous row's
       tail for negative shifts) instead of wrapping to real data — which
       is exactly what the scol/acol masks were zeroing. The kernels then
       skip ~2 * Qd * Qh * Qw mask multiplies per grid step, a measured
       share of the VPU-issue wall (tools/probe_ring_wall.py).

    3. a 128-MULTIPLE width makes every row-shift roll offset a multiple
       of 128 lanes, which Mosaic lowers as vreg renumbering instead of
       intra-vreg rotates — measured 1.37x at DAVIS-native (432 -> 512,
       despite +18.5% element cost) and 1.04x at 240x432; fastMRI's
       184 -> 256 (+33%) LOSES (0.71x), so the 128-multiple is taken only
       when its overhead over the 16-multiple choice is <= 20%.

    Costs (Wcp - Wc)/Wc extra compute (1.2% at DAVIS-native Wc=427; 4.3%
    at fastMRI Wc=184) for the 16-multiple pad.
    """
    need_align = Wc % 16 and _sliver_rows(128, G, Wc) == 128
    if not (need_align or pc_min > 0):
        return Wc
    base = -(-(Wc + pc_min) // 16) * 16
    c128 = -(-(Wc + pc_min) // 128) * 128
    # w128=False: TRAINING paths keep the 16-multiple pad — the reverse is
    # MXU-heavy (weight-grad dots scale with element count), so the
    # 128-multiple's aligned-roll win does not repay its +14-33% element
    # cost there (measured r5: mri-half ring-bwd at Wcp 96->128 LOST to
    # the banded reverse outright)
    if w128 and c128 > base and (c128 - base) / base <= 0.20:
        return c128
    return base


def _w_pad_min(wlo, Qw):
    """Largest in-plane W tap offset (analysis [wlo, wlo+Qw-1], synthesis
    [-(Qw-1)-wlo, -wlo]) — the pad-column count that retires the column
    masks (see _padded_wc)."""
    return max(abs(wlo), abs(wlo + Qw - 1), abs(-(Qw - 1) - wlo))


def _pick_band_ring(M, C, P, s, Dc, Hc, Wc, z_bytes=2, use_mask=False):
    P_, pads, Qd, Qh, Qw, dlo, hlo, wlo, Hh = _geometry3(P, s)
    Cp = C * s**3
    Wc = _padded_wc(Wc, 2 * Hh, pc_min=_w_pad_min(wlo, Qw))
    for Bh in (128, 64, 32, 16, 8):
        if Bh < 2 * Hh:
            continue  # halo slices need G=2*Hh rows inside a band
        nb = -(-Hc // Bh)
        if _ring_bytes3(M, Cp, Qd, Qh, Qw, Bh, Wc, Hh, nb, dlo,
                        z_bytes=z_bytes, use_mask=use_mask) < _VMEM_BUDGET:
            return Bh
    return None


def lista3d_ring_supported(M, C, P, s, K, D, H, W, residual=None,
                           z_bytes=2, use_mask=False) -> bool:
    """True when the depth-ring path applies: stride-divisible shape, no
    residual blocks, and a fitting band exists."""
    if residual is not None:
        return False
    if D % s or H % s or W % s:
        return False
    return _pick_band_ring(M, C, P, s, D // s, H // s, W // s,
                           z_bytes=z_bytes, use_mask=use_mask) is not None


def _pad128(L):
    return -(-L // 128) * 128


def _lanepad(x, Lpad):
    if Lpad == x.shape[-1]:
        return x
    return jnp.concatenate(
        [x, jnp.zeros((x.shape[0], Lpad - x.shape[-1]), x.dtype)], axis=1)


def ext_bands(x5, Bh, nb, Hh, Hc, Wc, Wct):
    """(N, ch, Dc, Hc, Wct) -> (N, Dc, nb, ch, (Bh+2*Hh)*Wc): overlapping
    Hh-row-haloed bands at the ring's padded code width, out-of-image rows
    and pad columns zero. Shared by the forward (y2e/m2e) and the ring
    reverse (g0e and its y2e/m2e rebuilds) so layouts cannot drift."""
    N, ch, Dc = x5.shape[0], x5.shape[1], x5.shape[2]
    Er = Bh + 2 * Hh
    Hcp = nb * Bh
    x5 = jnp.pad(
        x5, ((0, 0), (0, 0), (0, 0), (Hh, Hh + Hcp - Hc), (0, Wc - Wct)))
    idx = np.arange(nb)[:, None] * Bh + np.arange(Er)[None, :]
    xb = x5[:, :, :, idx, :]              # (N, ch, Dc, nb, Er, Wc)
    return xb.transpose(0, 2, 3, 1, 4, 5).reshape(N, Dc, nb, ch, Er * Wc)


def ring_masks(Bh, nb, Hh, Hc, Wc, Wct):
    """(vm (nb,1,Lb), vme (nb,1,Lwr)) numpy row/column validity masks:
    rows past the true image height and columns past the true code width
    are zeroed — the mechanism that makes the zero-pad-column mask
    retirement exact (see _padded_wc)."""
    Er = Bh + 2 * Hh
    Lb, Lwr = Bh * Wc, Er * Wc
    colv = np.arange(Wc)[None, None, :] < Wct
    grow = np.arange(nb * Bh).reshape(nb, Bh, 1)
    vm = ((np.broadcast_to(grow < Hc, (nb, Bh, Wc)) & colv)
          .reshape(nb, 1, Lb).astype(np.float32))
    gext = (np.arange(nb)[:, None] * Bh
            + np.arange(Er)[None, :] - Hh)[:, :, None]
    vme = ((np.broadcast_to((gext >= 0) & (gext < Hc), (nb, Er, Wc)) & colv)
           .reshape(nb, 1, Lwr).astype(np.float32))
    return vm, vme


def _haloed_value(zu, zc, zd, b, nb, G, Wc, Bh, Lpad):
    """(ch, Lpad) slab value: [G rows of band b-1 | band b | G rows of
    band b+1 | lane padding], out-of-image halos zeroed (= the conv's
    zero padding). zu/zd are the hs-row halo SLIVER blocks of the
    neighbor bands (_sliver_rows; hs == Bh degenerates to full views) —
    only their G boundary rows are used. Built as ONE lane-axis
    concatenate and stored as a FULL ring slot: ring slots must be
    whole-slab assignments because a lane-partial ref slice of a
    dynamically indexed slot is a `tpu.memref_slice` that Mosaic
    requires 128-aligned (hardware compile error: "Slice shape along
    dimension 2 must be aligned to tiling (128)")."""
    Lb = Bh * Wc
    hu = zu.shape[1] // Wc  # sliver height (rows)
    g = jnp.where(b > 0, 1, 0).astype(zu.dtype)
    h = jnp.where(b < nb - 1, 1, 0).astype(zd.dtype)
    parts = [g * zu[:, (hu - G) * Wc:], zc, h * zd[:, : G * Wc]]
    Lwz = Lb + 2 * G * Wc
    if Lpad != Lwz:
        parts.append(jnp.zeros((zc.shape[0], Lpad - Lwz), zc.dtype))
    return jnp.concatenate(parts, axis=1)


def _store_haloed(zring, slot, zu, zc, zd, b, nb, G, Wc, Bh):
    """Store the haloed slab into the dynamically indexed ring slot.

    On the 128-aligned lane path (Wc % 128 == 0, so every part's lane
    extent — G*Wc halo, Bh*Wc band — is a 128 multiple and Lpad == Lwz)
    the three parts are stored DIRECTLY as partial slices of the slot:
    Mosaic accepts 128-aligned `tpu.memref_slice`s, and skipping the
    full-slab concatenate removes a ~ch*Lwz VMEM temp per grid step.
    Measured r5 at DAVIS-native: BIT-IDENTICAL and FLAT on wall time
    (140.0 -> 139.3 ms/clip, within tunnel noise) — Mosaic was already
    eliding/overlapping the concat temp; kept for the smaller VMEM
    footprint and simpler store structure, recorded so the lever stays
    dead. Unaligned widths keep the whole-slab concat+store (a
    lane-partial slice of a dynamic slot is a hardware compile error
    there)."""
    Lb = Bh * Wc
    Lwz = Lb + 2 * G * Wc
    hu = zu.shape[1] // Wc
    if Wc % 128 == 0 and zring.shape[-1] == Lwz:
        g = jnp.where(b > 0, 1, 0).astype(zu.dtype)
        h = jnp.where(b < nb - 1, 1, 0).astype(zd.dtype)
        zring[slot, :, 0 : G * Wc] = g * zu[:, (hu - G) * Wc :]
        zring[slot, :, G * Wc : G * Wc + Lb] = zc
        zring[slot, :, G * Wc + Lb : Lwz] = h * zd[:, : G * Wc]
        return
    zring[slot] = _haloed_value(zu, zc, zd, b, nb, G, Wc, Bh,
                                zring.shape[-1])


def _syn_from_ring(zring, e, B2m_ref, scol_ref, *, Qd, Qh, Qw, Cp, Wc,
                   Bh, Hh, dlo, wlo, hlo, lat1, Rz, Dc, colmask=True):
    """r[e - lat1] on Bh+2*Hh extended rows from the z slab ring:
    (B_k z)[d] summed over depth taps, one merged MXU dot per tap."""
    from jax.experimental.pallas import tpu as pltpu

    G = 2 * Hh
    Lwr = (Bh + 2 * Hh) * Wc
    Lwz = (Bh + 2 * G) * Wc
    lo2 = Hh * Wc  # (G - Hh) rows: ext-row halo margin inside the slab
    dr = e - lat1

    import os

    if (not colmask and Wc % 128 == 0
            and os.environ.get("CDLNET_RING_LANE", "1") != "0"):
        # Lane-class restructure (r4): with pad columns retiring the masks
        # AND a 128-multiple width, the per-tap output shift splits into a
        # row part (a multiple of Wc -> an ALIGNED value slice, ~free) and
        # a tiny lane part shared by the ri class — so instead of Qd*Qh*Qw
        # rolls per grid step, accumulate one (Cp, Lwr) buffer per lane
        # class across all taps and apply ONE roll per class at the end
        # (2 rolls/step at Qw=3). End-of-buffer wraps land on pad-column
        # output positions, zeroed by the vme mask at the r store — exact.
        classes = sorted({ri - (Qw - 1) - wlo for ri in range(Qw)})
        pc = {c: jnp.zeros((Cp, Lwr), jnp.float32) for c in classes}
        for j in range(Qd):
            sd = j - (Qd - 1) - dlo
            dsl = dr + sd
            slot = lax.rem(e + (8 * Rz - lat1 + sd), Rz)
            zh = zring[slot][:, :Lwz].astype(jnp.float32)
            out = jax.lax.dot_general(
                B2m_ref[j], zh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (Qh*Qw*Cp, Lwz)
            valid = jnp.logical_and(dsl >= 0, dsl < Dc)
            for qi in range(Qh):
                rowoff = (qi - (Qh - 1) - hlo) * Wc
                for ri in range(Qw):
                    t = qi * Qw + ri
                    c = ri - (Qw - 1) - wlo
                    sl = out[t * Cp : (t + 1) * Cp,
                             lo2 + rowoff : lo2 + rowoff + Lwr]
                    # SELECT, don't multiply: warmup slots hold
                    # uninitialized VMEM and 0*NaN poisons
                    pc[c] = pc[c] + jnp.where(valid, sl, 0.0)
        part = jnp.zeros((Cp, Lwr), jnp.float32)
        for c in classes:
            part += (
                pltpu.roll(pc[c], (-c) % Lwr, 1) if c % Lwr else pc[c]
            )
        return part

    part = jnp.zeros((Cp, Lwr), jnp.float32)
    for j in range(Qd):
        sd = j - (Qd - 1) - dlo
        dsl = dr + sd
        slot = lax.rem(e + (8 * Rz - lat1 + sd), Rz)
        zh = zring[slot][:, :Lwz].astype(jnp.float32)
        out = jax.lax.dot_general(
            B2m_ref[j], zh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Qh*Qw*Cp, Lwz)
        pj = jnp.zeros((Cp, Lwr), jnp.float32)
        for qi in range(Qh):
            for ri in range(Qw):
                t = qi * Qw + ri
                off = (qi - (Qh - 1) - hlo) * Wc + (ri - (Qw - 1) - wlo)
                rolled = (
                    pltpu.roll(out[t * Cp : (t + 1) * Cp], (-off) % Lwz, 1)
                    if off % Lwz else out[t * Cp : (t + 1) * Cp]
                )
                sl = rolled[:, lo2 : lo2 + Lwr]
                # colmask=False: zero pad columns make the wraparound
                # reads the masks were zeroing read zeros instead
                pj += sl * scol_ref[ri][None, :] if colmask else sl
        valid = jnp.logical_and(dsl >= 0, dsl < Dc)
        # SELECT, don't multiply: warmup slots hold uninitialized VMEM
        part += jnp.where(valid, pj, 0.0)
    return part


def _ana_from_ring(rring, zring, e, A2m_ref, tau_ref, acol_ref, vm,
                   stack_ref, *, Qd, Qh, Qw, Cp, Wc, Bh, Hh, dlo, wlo,
                   hlo, lat1, lat2, Rz, Rr, Dc, first, z_dtype,
                   colmask=True):
    """z_new[e - lat1 - lat2] = ST(z_old - A_k r, tau_k) from the r slab
    ring (slabs already row-haloed — no band views)."""
    from jax.experimental.pallas import tpu as pltpu

    G = 2 * Hh
    Lb = Bh * Wc
    Lwr = (Bh + 2 * Hh) * Wc
    lo = Hh * Wc
    dz = e - lat1 - lat2

    def roll(buf, off):
        return pltpu.roll(buf, (-off) % Lwr, 1) if off % Lwr else buf

    import os

    lane_path = (not colmask and Wc % 128 == 0
                 and os.environ.get("CDLNET_RING_LANE", "1") != "0")
    for j in range(Qd):
        dd = dz + dlo + j
        slot = lax.rem(e + (8 * Rr - lat1 - lat2 + dlo + j), Rr)
        valid = jnp.logical_and(dd >= 0, dd < Dc)
        rh = jnp.where(valid, rring[slot][:, :Lwr], 0.0)
        if lane_path:
            # lane-class restructure (see _syn_from_ring): pre-shift rh
            # once per lane class (2 rolls/depth tap), then every
            # (qi, ri) tap is an ALIGNED value slice of the right class
            rh_cls = {
                c: roll(rh, c) for c in sorted({wlo + ri for ri in range(Qw)})
            }
            for qi in range(Qh):
                start = lo + (hlo + qi) * Wc
                for ri in range(Qw):
                    t = (j * Qh + qi) * Qw + ri
                    v = rh_cls[wlo + ri][:, start : start + Lb]
                    stack_ref[t * Cp : (t + 1) * Cp] = v.astype(
                        stack_ref.dtype)
            continue
        for qi in range(Qh):
            rowed = roll(rh, (hlo + qi) * Wc)
            for ri in range(Qw):
                t = (j * Qh + qi) * Qw + ri
                v = roll(rowed, wlo + ri)[:, lo : lo + Lb]
                if colmask:
                    v = v * acol_ref[ri][None, :]
                stack_ref[t * Cp : (t + 1) * Cp] = v.astype(stack_ref.dtype)

    u = jax.lax.dot_general(
        A2m_ref[:], stack_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if first:
        zn = -u
    else:
        zslot = lax.rem(e + (8 * Rz - lat1 - lat2), Rz)
        zc = zring[zslot][:, G * Wc : G * Wc + Lb].astype(jnp.float32)
        zn = zc - u  # full-slot read, value-sliced (alignment rule above)
    tau = tau_ref[0, 0][:, None]
    return (vm * jnp.sign(zn) * jnp.maximum(jnp.abs(zn) - tau, 0.0)
            ).astype(z_dtype)


def _kernel_mid(zu_ref, zc_ref, zd_ref, y2e_ref, m2e_ref, B2m_ref,
                A2m_ref, tau_ref, scol_ref, acol_ref, vme_ref, vm_ref,
                zout_ref, zring, rring, stack_ref, *, Qd, Qh, Qw, Cp,
                Wc, Bh, Hh, dlo, hlo, wlo, lat1, lat2, Rz, Rr, Dc,
                use_mask, z_dtype, colmask=True, rhist_ref=None):
    e = pl.program_id(2)
    b = pl.program_id(1)
    nb = pl.num_programs(1)
    G = 2 * Hh
    geo = dict(Qd=Qd, Qh=Qh, Qw=Qw, Cp=Cp, Wc=Wc, Bh=Bh, Hh=Hh,
               dlo=dlo, wlo=wlo, hlo=hlo, colmask=colmask)

    slot = lax.rem(e, Rz)
    _store_haloed(zring, slot, zu_ref[0, 0, 0], zc_ref[0, 0, 0],
                  zd_ref[0, 0, 0], b, nb, G, Wc, Bh)

    part = _syn_from_ring(zring, e, B2m_ref, scol_ref, **geo,
                          lat1=lat1, Rz=Rz, Dc=Dc)
    if use_mask:
        part = m2e_ref[0, 0, 0] * part
    r = vme_ref[0, 0] * (part - y2e_ref[0, 0, 0])
    rslot = lax.rem(e + (8 * Rr - lat1), Rr)
    rring[rslot] = _lanepad(r, rring.shape[-1])

    if rhist_ref is not None:
        # training history: stream r (EXTENDED rows, so the reverse's
        # analysis-style stack builds need no band neighbors) to HBM.
        # The output block's clamped map revisits block 0 through the
        # warmup steps and block Dc-1 through the tail; the guarded store
        # leaves the block buffer holding the last REAL r, which is what
        # Mosaic copies out after the final visit.
        dr = e - lat1

        @pl.when(jnp.logical_and(dr >= 0, dr < Dc))
        def _store_rhist():
            rhist_ref[0, 0, 0] = r

    zout_ref[0, 0, 0] = _ana_from_ring(
        rring, zring, e, A2m_ref, tau_ref, acol_ref, vm_ref[0, 0],
        stack_ref, **geo, lat1=lat1, lat2=lat2, Rz=Rz, Rr=Rr, Dc=Dc,
        first=False, z_dtype=z_dtype)


def _kernel_first(y2e_ref, A2m_ref, tau_ref, acol_ref, vme_ref, vm_ref,
                  zout_ref, rring, stack_ref, *, Qd, Qh, Qw, Cp, Wc, Bh,
                  Hh, dlo, hlo, wlo, lat2, Rr, Dc, z_dtype, colmask=True):
    """k = 0: z = ST(A0 y2, tau0) — r ring is fed -y2 directly."""
    e = pl.program_id(2)
    geo = dict(Qd=Qd, Qh=Qh, Qw=Qw, Cp=Cp, Wc=Wc, Bh=Bh, Hh=Hh,
               dlo=dlo, wlo=wlo, hlo=hlo, colmask=colmask)
    rring[lax.rem(e, Rr)] = _lanepad(
        -(vme_ref[0, 0] * y2e_ref[0, 0, 0]), rring.shape[-1])
    zout_ref[0, 0, 0] = _ana_from_ring(
        rring, None, e, A2m_ref, tau_ref, acol_ref, vm_ref[0, 0],
        stack_ref, **geo, lat1=0, lat2=lat2, Rz=1, Rr=Rr, Dc=Dc,
        first=True, z_dtype=z_dtype)


def _kernel_mid_hist(zu_ref, zc_ref, zd_ref, y2e_ref, m2e_ref, B2m_ref,
                     A2m_ref, tau_ref, scol_ref, acol_ref, vme_ref,
                     vm_ref, zout_ref, rhist_ref, zring, rring, stack_ref,
                     **kw):
    """Output-ref reordering shim: pallas passes outputs positionally
    (zout, rhist) before scratch."""
    _kernel_mid(zu_ref, zc_ref, zd_ref, y2e_ref, m2e_ref, B2m_ref,
                A2m_ref, tau_ref, scol_ref, acol_ref, vme_ref, vm_ref,
                zout_ref, zring, rring, stack_ref, rhist_ref=rhist_ref,
                **kw)


def _kernel_last(zu_ref, zc_ref, zd_ref, B2m_ref, scol_ref, vm_ref,
                 xout_ref, zring, *, Qd, Qh, Qw, Cp, Wc, Bh, Hh, dlo,
                 hlo, wlo, lat1, Rz, Dc, colmask=True):
    """x = D z (no y subtraction, no mask — model/net.py:209)."""
    e = pl.program_id(2)
    b = pl.program_id(1)
    nb = pl.num_programs(1)
    G = 2 * Hh
    Lb = Bh * Wc
    lo = Hh * Wc
    slot = lax.rem(e, Rz)
    _store_haloed(zring, slot, zu_ref[0, 0, 0], zc_ref[0, 0, 0],
                  zd_ref[0, 0, 0], b, nb, G, Wc, Bh)
    part = _syn_from_ring(
        zring, e, B2m_ref, scol_ref, Qd=Qd, Qh=Qh, Qw=Qw, Cp=Cp, Wc=Wc,
        Bh=Bh, Hh=Hh, dlo=dlo, wlo=wlo, hlo=hlo, lat1=lat1, Rz=Rz, Dc=Dc,
        colmask=colmask)
    xout_ref[0, 0, 0] = vm_ref[0, 0] * part[:, lo : lo + Lb]


def make_ring3_ops(N, C, Dc, Hc, Wct, M, P, s, *, z_dtype=jnp.bfloat16,
                   interpret=False, band=None, use_mask=False,
                   return_hists=False, w128=True):
    """Per-iteration depth-ring kernel closures + geometry.

    Factored out of lista3d_ring so the depth-sharded path
    (dist/halo_fused.py) can run the SAME hardware-validated ring kernels
    on halo-extended local blocks — the kernels are unmodified; only Dc
    (the depth grid extent) differs per caller. Returns a dict with:
      first(y2e, A2m0, tau0) -> z                  (N, Dc, nb, Mp, Lb)
      mid(z, y2e, m2e, B2m_k, A2m_k, tau_k) -> z   (or (z, r_ext) with
                                                    return_hists)
      last(z, B2m0) -> x2                          (N, Dc, nb, Cp, Lb) f32
      to_ext_bands / from_bands, and the static geometry (padded Wc etc.).
    tau* is (N, Mp); A2m_k (Mp, T*Cp) in z_dtype; B2m_k (Qd, Qh*Qw*Cp, Mp).

    CDLNET_PALLAS_INTERPRET=1 forces interpret mode (CPU-mesh tests and
    the driver's virtual-device dryrun run the sharded path through here).
    Masks are kept as NUMPY and converted inside each call: the builder
    may be constructed in one trace and its closures invoked in another
    (the depth-sharded custom-VJP backward) — jnp constants would leak
    tracers (same rationale as make_banded3_ops).
    """
    import os

    from jax.experimental.pallas import tpu as pltpu

    interpret = interpret or os.environ.get("CDLNET_PALLAS_INTERPRET") == "1"
    P, pads, Qd, Qh, Qw, dlo, hlo, wlo, Hh = _geometry3(P, s)
    pc_min = _w_pad_min(wlo, Qw)
    Wc = _padded_wc(Wct, 2 * Hh, pc_min=pc_min, w128=w128)
    colmask = (Wc - Wct) < pc_min  # pads retire the column masks (r4)
    Cp = C * s**3
    T = Qd * Qh * Qw
    Mp = -(-M // 8) * 8
    G = 2 * Hh
    lat1, lat2, dhi = _lats(dlo, Qd)
    Rz = max(lat1 + dhi, lat1 + lat2) + 1
    Rr = lat2 - dlo + 1
    zb = jnp.dtype(z_dtype).itemsize
    Bh = band if band is not None else _pick_band_ring(
        M, C, P, s, Dc, Hc, Wct, z_bytes=zb, use_mask=use_mask)
    assert Bh is not None, "caller must gate on lista3d_ring_supported"
    assert Bh >= G, f"band {Bh} must cover the {G}-row halo"
    Hcp = -(-Hc // Bh) * Bh
    nb = Hcp // Bh
    Lb = Bh * Wc
    Er = Bh + 2 * Hh
    Lwr = Er * Wc
    Lwz = (Bh + 2 * G) * Wc

    acol = np.asarray(_axis_masks([wlo + ri for ri in range(Qw)], Bh, Wc, 1))
    scol = np.asarray(
        _axis_masks([ri - (Qw - 1) - wlo for ri in range(Qw)], Er, Wc, 1))
    vm_np, vme_np = ring_masks(Bh, nb, Hh, Hc, Wc, Wct)

    geom = dict(Qd=Qd, Qh=Qh, Qw=Qw, Cp=Cp, Wc=Wc, Bh=Bh, Hh=Hh,
                dlo=dlo, hlo=hlo, wlo=wlo, colmask=colmask)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    cparams = pltpu.CompilerParams(vmem_limit_bytes=128 * 1024 * 1024)

    def zview(db, dshift=0):
        return pl.BlockSpec(
            (1, 1, 1, Mp, Lb),
            lambda n, b, e: (n, jnp.clip(e - dshift, 0, Dc - 1),
                             jnp.clip(b + db, 0, nb - 1), 0, 0),
            memory_space=pltpu.VMEM)

    hs = _sliver_rows(Bh, G, Wc)

    def zsliver(db, dshift=0):
        # hs-row halo sliver of the neighbor band (bottom rows for b-1,
        # top rows for b+1): block index along the flattened row*lane
        # axis addresses in hs*Wc units (Bh % hs == 0 by construction)
        idx = Bh // hs - 1 if db < 0 else 0
        return pl.BlockSpec(
            (1, 1, 1, Mp, hs * Wc),
            lambda n, b, e: (n, jnp.clip(e - dshift, 0, Dc - 1),
                             jnp.clip(b + db, 0, nb - 1), 0, idx),
            memory_space=pltpu.VMEM)

    def extview(ch, dshift):
        return pl.BlockSpec(
            (1, 1, 1, ch, Lwr),
            lambda n, b, e: (n, jnp.clip(e - dshift, 0, Dc - 1), b, 0, 0),
            memory_space=pltpu.VMEM)

    def outspec(ch, L, lat):
        return pl.BlockSpec(
            (1, 1, 1, ch, L),
            lambda n, b, e: (n, jnp.clip(e - lat, 0, Dc - 1), b, 0, 0),
            memory_space=pltpu.VMEM)

    def vmspec(L):
        return pl.BlockSpec((1, 1, L), lambda n, b, e: (b, 0, 0),
                            memory_space=pltpu.VMEM)

    tauspec = pl.BlockSpec((1, 1, Mp), lambda n, b, e: (n, 0, 0),
                           memory_space=pltpu.VMEM)
    dummyspec = pl.BlockSpec((1, 1, 1, 1, 1),
                             lambda n, b, e: (0, 0, 0, 0, 0),
                             memory_space=pltpu.VMEM)

    zshape = jax.ShapeDtypeStruct((N, Dc, nb, Mp, Lb), z_dtype)

    first_call = pl.pallas_call(
        functools.partial(_kernel_first, **geom, lat2=lat2, Rr=Rr, Dc=Dc,
                          z_dtype=z_dtype),
        grid=(N, nb, Dc + lat2),
        in_specs=[extview(Cp, 0), full, tauspec, full,
                  vmspec(Lwr), vmspec(Lb)],
        out_specs=outspec(Mp, Lb, lat2),
        out_shape=zshape,
        scratch_shapes=[pltpu.VMEM((Rr, Cp, _pad128(Lwr)), jnp.float32),
                        pltpu.VMEM((T * Cp, Lb), z_dtype)],
        compiler_params=cparams,
        interpret=interpret,
    )

    mid_kern = (
        functools.partial(_kernel_mid_hist, **geom, lat1=lat1, lat2=lat2,
                          Rz=Rz, Rr=Rr, Dc=Dc, use_mask=use_mask,
                          z_dtype=z_dtype)
        if return_hists
        else functools.partial(_kernel_mid, **geom, lat1=lat1, lat2=lat2,
                               Rz=Rz, Rr=Rr, Dc=Dc, use_mask=use_mask,
                               z_dtype=z_dtype)
    )
    mid_call = pl.pallas_call(
        mid_kern,
        grid=(N, nb, Dc + lat1 + lat2),
        in_specs=[zsliver(-1), zview(0), zsliver(1),
                  extview(Cp, lat1),
                  extview(Cp, lat1) if use_mask else dummyspec,
                  full, full, tauspec, full, full,
                  vmspec(Lwr), vmspec(Lb)],
        out_specs=(
            [outspec(Mp, Lb, lat1 + lat2), outspec(Cp, Lwr, lat1)]
            if return_hists
            else outspec(Mp, Lb, lat1 + lat2)
        ),
        out_shape=(
            [zshape,
             jax.ShapeDtypeStruct((N, Dc, nb, Cp, Lwr), jnp.float32)]
            if return_hists
            else zshape
        ),
        scratch_shapes=[pltpu.VMEM((Rz, Mp, _pad128(Lwz)), z_dtype),
                        pltpu.VMEM((Rr, Cp, _pad128(Lwr)), jnp.float32),
                        pltpu.VMEM((T * Cp, Lb), z_dtype)],
        compiler_params=cparams,
        interpret=interpret,
    )

    last_call = pl.pallas_call(
        functools.partial(_kernel_last, **geom, lat1=lat1, Rz=Rz, Dc=Dc),
        grid=(N, nb, Dc + lat1),
        in_specs=[zsliver(-1), zview(0), zsliver(1),
                  full, full, vmspec(Lb)],
        out_specs=outspec(Cp, Lb, lat1),
        out_shape=jax.ShapeDtypeStruct((N, Dc, nb, Cp, Lb), jnp.float32),
        scratch_shapes=[pltpu.VMEM((Rz, Mp, _pad128(Lwz)), z_dtype)],
        compiler_params=cparams,
        interpret=interpret,
    )

    def first(y2e, A2m0, tau0):
        return first_call(y2e, A2m0, tau0.reshape(N, 1, Mp),
                          jnp.asarray(acol), jnp.asarray(vme_np),
                          jnp.asarray(vm_np))

    def mid(z, y2e, m2e, B2m_k, A2m_k, tau_k):
        return mid_call(z, z, z, y2e, m2e, B2m_k, A2m_k,
                        tau_k.reshape(N, 1, Mp), jnp.asarray(scol),
                        jnp.asarray(acol), jnp.asarray(vme_np),
                        jnp.asarray(vm_np))

    def last(z, B2m0):
        return last_call(z, z, z, B2m0, jnp.asarray(scol),
                         jnp.asarray(vm_np))

    def to_ext_bands(x5):
        return ext_bands(x5, Bh, nb, Hh, Hc, Wc, Wct)

    def from_bands(xb, ch):
        # (N, Dc', nb, ch, Lb) -> (N, ch, Dc', Hc, Wct)
        n, dc = xb.shape[0], xb.shape[1]
        return (
            xb.reshape(n, dc, nb, ch, Bh, Wc)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(n, dc, ch, Hcp, Wc)[:, :, :, :Hc, :Wct]
            .transpose(0, 2, 1, 3, 4)
        )

    return dict(
        first=first, mid=mid, last=last,
        to_ext_bands=to_ext_bands, from_bands=from_bands,
        pads=pads, Qd=Qd, Qh=Qh, Qw=Qw, Hh=Hh, Cp=Cp, T=T, Mp=Mp,
        Bh=Bh, nb=nb, Lb=Lb, Lwr=Lwr, Hcp=Hcp, Wc=Wc, Wct=Wct,
        dlo=dlo, hlo=hlo, wlo=wlo, hz=Qd - 1,
    )


def lista3d_ring(yp, A, B, t, c, stride=1, mask=None, return_z=False,
                 z_dtype=jnp.bfloat16, interpret=False, band=None,
                 return_hists=False):
    """Depth-ring fused 3D LISTA. Same contract as lista3d_tiled /
    lista3d_fused: (xphat (N,C,D,H,W) fp32, z (N,M,Dc,Hc,Wc) or None),
    matching the XLA scan to the z_dtype carry tolerance.
    CDLNET_PALLAS_INTERPRET=1 forces interpret mode (CPU-mesh tests and
    the driver's virtual-device dryrun).

    return_hists=True (training residuals for the ring reverse,
    kernels/lista3d_ring_bwd) additionally returns (z_hist (K, N, Dc, nb,
    Mp, Lb) in z_dtype, r_hist (K-1, N, Dc, nb, Cp, Lwr) fp32) — z as the
    scan-stacked per-iteration outputs, r on EXTENDED (Bh+2*Hh) rows
    streamed from the mid kernel (so the reverse's analysis-style stack
    builds need no band-neighbor views). Lb/Lwr carry the ring's padded
    code width (_padded_wc)."""
    N, C, D, H, W = yp.shape
    K, M = A.shape[0], A.shape[1]
    s = stride
    Dc, Hc, Wct = D // s, H // s, W // s
    use_mask = mask is not None

    ops = make_ring3_ops(
        N, C, Dc, Hc, Wct, M, A.shape[-3:], s, z_dtype=z_dtype,
        interpret=interpret, band=band, use_mask=use_mask,
        return_hists=return_hists, w128=not return_hists,
    )
    pads = ops["pads"]
    Qd, Mp, Cp, Lwr = ops["Qd"], ops["Mp"], ops["Cp"], ops["Lwr"]
    Qh, Qw = ops["Qh"], ops["Qw"]
    N_, Dc_, nb = N, Dc, ops["nb"]

    A2m = prep_A2m_3d(A, s, pads).astype(z_dtype)          # (K, Mp, T*Cp)
    B2m = prep_B2m_3d(B, s, pads).reshape(K, Qd, Qh * Qw * Cp, Mp)

    y2e = ops["to_ext_bands"](pp.space_to_depth(yp, s, 3))
    m2e = (
        ops["to_ext_bands"](
            pp.space_to_depth(jnp.broadcast_to(mask, yp.shape), s, 3))
        if use_mask
        else jnp.zeros((N, 1, 1, 1, 1), yp.dtype)
    )

    c_arr = jnp.asarray(c, jnp.float32).reshape(-1)
    if c_arr.size == 1:
        c_arr = jnp.broadcast_to(c_arr, (N,))
    tau = (
        t[None, :, 0, :, 0, 0, 0].astype(jnp.float32)
        + c_arr[:, None, None] * t[None, :, 1, :, 0, 0, 0]
    )  # (N, K, M)
    if Mp != M:
        tau = jnp.pad(tau, ((0, 0), (0, 0), (0, Mp - M)))

    # k = 0
    z = ops["first"](y2e, A2m[0], tau[:, 0])

    def body(z, xs):
        A2m_k, B2m_k, tau_k = xs
        out = ops["mid"](z, y2e, m2e, B2m_k, A2m_k, tau_k)
        if return_hists:
            z, r_ext = out
            return z, (z, r_ext)
        return out, None

    z_first = z
    hists = None
    if K > 1:
        z, hists = lax.scan(
            body, z, (A2m[1:], B2m[1:], tau.transpose(1, 0, 2)[1:]))

    x2 = ops["last"](z, B2m[0])
    x5 = ops["from_bands"](x2, Cp)
    xphat = pp.depth_to_space(x5, s, 3, C)
    z_out = (
        ops["from_bands"](z.astype(jnp.float32), Mp)[:, :M]
        if return_z
        else None
    )
    if return_hists:
        if hists is None:  # K == 1: no mid iterations
            z_hist = z_first[None]
            r_hist = jnp.zeros((0, N, Dc, nb, Cp, Lwr), jnp.float32)
        else:
            zs, rs = hists
            z_hist = jnp.concatenate([z_first[None], zs], axis=0)
            r_hist = rs
        return xphat, z_out, (z_hist, r_hist)
    return xphat, z_out
