"""Banded reverse kernels for big-frame 3D LISTA training.

Training companion to kernels/lista3d_tiled (the banded big-frame 3D
forward): clips bigger than the resident reverse's VMEM gate (beyond
~128^2 crops) used to silently route training to the pure XLA path. Unlike
the 2D banded reverse (kernels/lista2d_tiled_bwd), the running code
cotangent dv here is M x Dc x Hc x Wc — far past VMEM at native frames —
so the reverse is a lax.scan of TWO banded kernels per iteration that
mirror the forward pair, with dv streamed through HBM like the forward
streams z:

  ds-builder   grid (N, Dc, nb, Qd) — the adjoint of the analysis stack.
      Structurally the forward SYNTHESIS kernel: the ds[d, band] output
      block is revisited across the Qd innermost steps; each step reads
      one depth tap's dv through a row-haloed 3-view window, applies the
      transposed analysis bank, and roll-backs the in-plane taps
      (masked at the forward-stack position). Emits
      ds = -vm * [m2 *] stack-adjoint(A_k^T dv_k).
  dz-builder   grid (N, Dc, nb) — the adjoint of the synthesis + the
      weight/threshold grads. Structurally the forward ANALYSIS kernel:
      Qd x 3 clamped ds band views build the mirrored tap stack
      (stack2, masks at the ds position), one T*Cp-deep MXU contraction
      gives dz_{k-1} = dv_k + B_ana_k @ stack2; the SAME program then
      applies the ST subgradient (dv_{k-1} = 1{z_{k-1}!=0} dz), reduces
      dt_{k-1}, accumulates dB_k = z_{k-1} @ stack2^T, rebuilds the
      forward analysis stack from r_{k-1} views and accumulates
      dA_{k-1} = -dv_{k-1} @ stack(r_{k-1})^T — so dv crosses HBM only
      once per direction per iteration.

Index symmetry (why the reverse kernels can reuse the forward's view
maps): the adjoint of the analysis gather at tap j reads dv at depth
d + j' - (Qd-1) - dlo with j' = Qd-1-j — the forward synthesis view map —
and the adjoint of the synthesis gather reads ds at depth d + dlo + j' —
the forward analysis view map. Both banks are therefore pre-REVERSED
along the depth-tap axis. In-plane, roll-backs land within the halo rows
plus at most one lane-crossing row; windows carry ONE extra ZERO row
beyond the Hh-row halo on each side so every roll stays in-buffer, and
the column masks (evaluated at the forward-target position, where the
mask factor lives in the primal) zero exactly the lane-crossing reads.

Gradients match the XLA scan's autodiff to reassociation tolerance
(interpret-mode tests, tests/test_kernels.py). Input/sigma/mask
cotangents are zero by construction (parameter-only training gradients).
Reference: gradients of model/net.py:121-227 (CDLNetVideo) semantics.
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
from cdlnet_tpu.kernels.lista3d_tiled import (
    _VMEM_BUDGET,
    _geometry3,
    _pick_band3,
    _sliver_rows,
)
from cdlnet_tpu.ops import polyphase as pp


def _bwd_bytes3(M, Cp, Qd, Qh, Qw, Bh, Wc, Hh, hist_bytes=2):
    """Max of the two reverse kernels' per-program VMEM estimates
    (blocked inputs/outputs double-buffered x2)."""
    Mp = -(-M // 8) * 8
    T = Qd * Qh * Qw
    Lb = Bh * Wc
    Lw2 = (Bh + 2 * (Hh + 1)) * Wc
    hs = _sliver_rows(Bh, Hh, Wc)
    ds_builder = (
        2 * Mp * (Lb + 2 * hs * Wc) * 4  # dv band + 2 sliver views (f32)
        + Mp * Lw2 * 4                 # haloed dv window
        + 2 * (Qh * Qw * Cp) * Mp * 4  # A_syn bank block
        + (Qh * Qw * Cp) * Lw2 * 4     # transposed-bank dot out
        + 2 * 2 * Cp * Lb * 4          # m2 in + ds out blocks
        + Qw * Lw2 * 4                 # acolw mask
    )
    dz_builder = (
        Qd * 2 * Cp * (Lb + 2 * hs * Wc) * 4 * 2  # ds + r band/sliver views
        + Cp * Lw2 * 4                 # haloed window transient
        + 2 * Mp * Lb * hist_bytes     # z_{k-1} block
        + 2 * 2 * Mp * Lb * 4          # dv in + dv out blocks
        + T * Cp * Lb * 4              # stack / stack2 (shared)
        + Mp * T * Cp * 4 * 3          # B_ana bank + dA + dB blocks
        + Qw * (Lw2 + Lb) * 4          # scolw + acol masks
        + Mp * Lb * 4                  # dz transient
    )
    return max(ds_builder, dz_builder)


def pick_band3_train(M, C, P, s, Dc, Hc, Wc, hist_bytes=None):
    """Largest band height fitting BOTH the history-collecting forward and
    the reverse kernels (the histories arrive banded at the forward's
    band, so training picks the band jointly; inference keeps the
    forward-only pick). None when no band fits."""
    from cdlnet_tpu.kernels.lista2d import hist_dtype
    from cdlnet_tpu.kernels.lista3d_tiled import _band_bytes3

    if hist_bytes is None:
        hist_bytes = jnp.dtype(hist_dtype()).itemsize
    P_, pads, Qd, Qh, Qw, dlo, hlo, wlo, Hh = _geometry3(P, s)
    Cp = C * s**3
    for Bh in (128, 64, 32, 16, 8):
        if Bh <= Hh:
            continue
        if (_band_bytes3(M, Cp, Qd, Qh, Qw, Bh, Wc, Hh,
                         z_bytes=hist_bytes) < _VMEM_BUDGET
                and _bwd_bytes3(M, Cp, Qd, Qh, Qw, Bh, Wc, Hh,
                                hist_bytes=hist_bytes) < _VMEM_BUDGET):
            return Bh
    return None


def lista3d_tiled_bwd_supported(M, C, P, s, K, D, H, W,
                                hist_bytes=None) -> bool:
    """True when the banded 3D reverse applies: stride-divisible shape and
    a band exists at the history dtype that fits the history-collecting
    forward AND both reverse kernels (pick_band3_train)."""
    if D % s or H % s or W % s:
        return False
    P_, pads, Qd, Qh, Qw, dlo, hlo, wlo, Hh = _geometry3(P, s)
    if Hh < 1:
        return False
    return pick_band3_train(M, C, P, s, D // s, H // s, W // s,
                            hist_bytes=hist_bytes) is not None


def _halo2(above, cur, below, b, nb, Hh, Wc):
    """(ch, Lw2) window: [ZERO row | Hh halo | band | Hh halo | ZERO row],
    out-of-image halos zeroed (= the conv's zero padding). The extra zero
    rows keep every in-kernel roll-back in-buffer: roll reach is at most
    Hh rows plus one lane-crossing row, so reads land either on real
    halo data or on a zero row — never wrap around to the far end."""
    hu = above.shape[1] // Wc  # neighbor sliver (or full-band) height
    zrow = jnp.zeros((cur.shape[0], Wc), cur.dtype)
    top = jnp.where(b > 0, 1.0, 0.0) * above[:, (hu - Hh) * Wc:]
    bot = jnp.where(b < nb - 1, 1.0, 0.0) * below[:, : Hh * Wc]
    return jnp.concatenate([zrow, top, cur, bot, zrow], axis=1)


def _kernel_ds_band(dvu_ref, dvc_ref, dvd_ref, m2_ref, asyn_ref, acolw_ref,
                    vm_ref, ds_ref, *, Qd, Qh, Qw, Cp, Wc, Bh, Hh, dlo,
                    hlo, wlo, use_mask):
    """ds[d, band] <- -vm * [m2 *] stack-adjoint(A_k^T dv_k)[d, band],
    accumulated over the Qd innermost grid steps (the forward synthesis
    kernel's structure with the transposed analysis bank)."""
    from jax.experimental.pallas import tpu as pltpu

    d = pl.program_id(1)
    Dc = pl.num_programs(1)
    b = pl.program_id(2)
    nb = pl.num_programs(2)
    jp = pl.program_id(3)
    Lb = Bh * Wc
    Lw2 = (Bh + 2 * (Hh + 1)) * Wc
    lo2 = (Hh + 1) * Wc

    @pl.when(jp == 0)
    def _init():
        ds_ref[0, 0, 0] = jnp.zeros_like(ds_ref[0, 0, 0])

    # adjoint source: dv at depth d + jp - (Qd-1) - dlo (= the forward
    # synthesis view map; the bank is pre-reversed so block jp holds
    # analysis tap j = Qd-1-jp)
    dq = jp - (Qd - 1) - dlo
    valid = jnp.where(jnp.logical_and(d + dq >= 0, d + dq < Dc), 1.0, 0.0)
    dvh = _halo2(dvu_ref[0, 0, 0], dvc_ref[0, 0, 0], dvd_ref[0, 0, 0],
                 b, nb, Hh, Wc)
    w = jax.lax.dot_general(
        asyn_ref[0], dvh, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Qh*Qw*Cp, Lw2)
    part = jnp.zeros((Cp, Lb), jnp.float32)
    for qi in range(Qh):
        for ri in range(Qw):
            t = qi * Qw + ri
            off = (hlo + qi) * Wc + (wlo + ri)
            piece = w[t * Cp : (t + 1) * Cp] * acolw_ref[ri][None, :]
            rolled = (
                pltpu.roll(piece, off % Lw2, 1) if off % Lw2 else piece
            )
            part += rolled[:, lo2 : lo2 + Lb]
    ds_ref[0, 0, 0] += valid * part

    @pl.when(jp == Qd - 1)
    def _finalize():
        acc = ds_ref[0, 0, 0]
        if use_mask:
            acc = m2_ref[0, 0, 0] * acc
        ds_ref[0, 0, 0] = -vm_ref[0, 0] * acc


def _kernel_dz_band(*refs, Qd, Qh, Qw, Cp, Wc, Bh, Hh, dlo, hlo, wlo,
                    with_base):
    """One program per (n, d, band):
      dz      = [dv_k +] B_ana_k @ stack2(ds)
      dv_out  = 1{z_{k-1} != 0} dz
      dt_-    += [-sum sign(z) dz, cv * that]         (revisited (n,0,0))
      dB_k    += z_{k-1} @ stack2(ds)^T               (revisited)
      dA_{k-1}+= -dv_out @ stack(r_{k-1})^T           (revisited)
    stack2 mirrors the forward synthesis offsets (masks at the ds
    position); stack is the forward analysis build from r views."""
    from jax.experimental.pallas import tpu as pltpu

    i = 0
    dsv = refs[i : i + 3 * Qd]; i += 3 * Qd
    rv = refs[i : i + 3 * Qd]; i += 3 * Qd
    z_ref = refs[i]; i += 1
    dv_ref = None
    if with_base:
        dv_ref = refs[i]; i += 1
    (bana_ref, cv_ref, scolw_ref, acol_ref,
     dvout_ref, dA_ref, dB_ref, dt_ref, stack_ref) = refs[i:]

    d = pl.program_id(1)
    Dc = pl.num_programs(1)
    b = pl.program_id(2)
    nb = pl.num_programs(2)
    Lb = Bh * Wc
    Lw2 = (Bh + 2 * (Hh + 1)) * Wc
    lo2 = (Hh + 1) * Wc
    T = Qd * Qh * Qw
    Mp = z_ref.shape[-2]

    def roll(buf, off):
        return pltpu.roll(buf, (-off) % Lw2, 1) if off % Lw2 else buf

    @pl.when(jnp.logical_and(d == 0, b == 0))
    def _init():
        dA_ref[0] = jnp.zeros_like(dA_ref[0])
        dB_ref[0] = jnp.zeros_like(dB_ref[0])
        dt_ref[0] = jnp.zeros_like(dt_ref[0])

    # ---- stack2: mirrored-offset gather of ds (adjoint of synthesis) ----
    for jp in range(Qd):
        valid = jnp.where(
            jnp.logical_and(d + dlo + jp >= 0, d + dlo + jp < Dc), 1.0, 0.0)
        dsh = valid * _halo2(dsv[3 * jp][0, 0, 0], dsv[3 * jp + 1][0, 0, 0],
                             dsv[3 * jp + 2][0, 0, 0], b, nb, Hh, Wc)
        for qi in range(Qh):
            for ri in range(Qw):
                t = (jp * Qh + qi) * Qw + ri
                off = (qi - (Qh - 1) - hlo) * Wc + (ri - (Qw - 1) - wlo)
                stack_ref[t * Cp : (t + 1) * Cp] = roll(
                    dsh * scolw_ref[ri][None, :], -off
                )[:, lo2 : lo2 + Lb]

    dz = jax.lax.dot_general(
        bana_ref[:], stack_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if with_base:
        dz = dz + dv_ref[0, 0, 0]
    z = z_ref[0, 0, 0].astype(jnp.float32)
    dB_ref[0] += jax.lax.dot_general(
        z, stack_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    row = -jnp.sum(jnp.sign(z) * dz, axis=1)
    dt_ref[0] += jnp.stack([row, row * cv_ref[0, 0, 0]])
    dv = jnp.where(z != 0.0, dz, 0.0)
    dvout_ref[0, 0, 0] = dv

    # ---- stack: forward analysis build from r_{k-1} views, for dA ------
    for j in range(Qd):
        valid = jnp.where(
            jnp.logical_and(d + dlo + j >= 0, d + dlo + j < Dc), 1.0, 0.0)
        rh = valid * _halo2(rv[3 * j][0, 0, 0], rv[3 * j + 1][0, 0, 0],
                            rv[3 * j + 2][0, 0, 0], b, nb, Hh, Wc)
        for qi in range(Qh):
            rowed = roll(rh, (hlo + qi) * Wc)
            for ri in range(Qw):
                t = (j * Qh + qi) * Qw + ri
                stack_ref[t * Cp : (t + 1) * Cp] = (
                    roll(rowed, wlo + ri)[:, lo2 : lo2 + Lb]
                    * acol_ref[ri][None, :]
                )
    dA_ref[0] += -jax.lax.dot_general(
        dv, stack_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def lista3d_tiled_fused_bwd(dxp, yp, A, B, t, c, mask, z_hist, r_hist,
                            stride=1, interpret=False):
    """Backward companion to lista3d_tiled(..., return_hists=True).

    dxp: cotangent of xphat (N, C, D, H, W); z_hist (K, N, Dc, nb, Mp, Lb)
    and r_hist (K-1, N, Dc, nb, Cp, Lb) in the forward's banded layout.
    Returns (dA, dB, dt) in torch weight layouts; input/sigma/mask
    cotangents are zero by construction (parameter-only gradients)."""
    from jax.experimental.pallas import tpu as pltpu

    N, C, D, H, W = yp.shape
    K, M = A.shape[0], A.shape[1]
    s = stride
    P, pads, Qd, Qh, Qw, dlo, hlo, wlo, Hh = _geometry3(A.shape[-3:], s)
    Dc, Hc, Wc = D // s, H // s, W // s
    Cp = C * s**3
    T = Qd * Qh * Qw
    Mp = -(-M // 8) * 8
    # band geometry comes off the histories (the forward's pick)
    nb, Lb = z_hist.shape[3], z_hist.shape[-1]
    Bh = Lb // Wc
    assert nb * Bh * Wc == nb * Lb and Bh * Wc == Lb, "band/shape mismatch"
    assert Bh > Hh, f"history band {Bh} must exceed the {Hh}-row halo"
    Hcp = nb * Bh
    Lw2 = (Bh + 2 * (Hh + 1)) * Wc

    A2m, vjpA = jax.vjp(lambda Aw: prep_A2m_3d(Aw, s, pads), A)
    B2m, vjpB = jax.vjp(lambda Bw: prep_B2m_3d(Bw, s, pads), B)
    # banks pre-reversed along the depth-tap axis (j' = Qd-1-j; see module
    # docstring); A in synthesis layout (K, Qd, Qh*Qw*Cp, Mp), B in
    # analysis layout (K, Mp, T*Cp)
    A_syn = (
        A2m.astype(jnp.float32)                 # (K, Mp, T*Cp) tap-major
        .reshape(K, Mp, Qd, Qh * Qw * Cp)
        .transpose(0, 2, 3, 1)[:, ::-1]
    )
    B_ana = (
        B2m.astype(jnp.float32)[:, ::-1]        # (K, Qd, Qh*Qw*Cp, Mp)
        .reshape(K, T * Cp, Mp)
        .transpose(0, 2, 1)
    )

    def to_bands(x5):
        ch = x5.shape[1]
        if Hcp != Hc:
            x5 = jnp.pad(x5, ((0, 0), (0, 0), (0, 0), (0, Hcp - Hc), (0, 0)))
        return (
            x5.transpose(0, 2, 1, 3, 4)
            .reshape(N, Dc, ch, nb, Bh, Wc)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(N, Dc, nb, ch, Lb)
            .astype(jnp.float32)
        )

    y2 = to_bands(pp.space_to_depth(yp, s, 3))
    g0 = to_bands(pp.space_to_depth(dxp, s, 3))  # pad rows zero == vm
    use_mask = mask is not None
    m2 = (
        to_bands(pp.space_to_depth(jnp.broadcast_to(mask, yp.shape), s, 3))
        if use_mask
        else jnp.zeros((N, 1, 1, 1, 1), jnp.float32)
    )
    # rfull[k] IS r_k (r_0 = -y2: the k=0 analysis consumed r = -y2)
    rfull = jnp.concatenate([-y2[None], r_hist.astype(jnp.float32)], axis=0)

    c_arr = jnp.asarray(c, jnp.float32).reshape(-1)
    if c_arr.size == 1:
        c_arr = jnp.broadcast_to(c_arr, (N,))
    cv = c_arr.reshape(N, 1, 1)

    # masks: acol at the analysis-stack target position (forward's);
    # acolw/scolw on the Lw2 window at the forward-target position, where
    # the mask factor lives in the primal (see module docstring)
    acol = jnp.asarray(_axis_masks([wlo + ri for ri in range(Qw)],
                                   Bh, Wc, 1))
    acolw = jnp.asarray(_axis_masks([wlo + ri for ri in range(Qw)],
                                    Bh + 2 * (Hh + 1), Wc, 1))
    scolw = jnp.asarray(
        _axis_masks([ri - (Qw - 1) - wlo for ri in range(Qw)],
                    Bh + 2 * (Hh + 1), Wc, 1))
    rows = np.arange(Hcp).reshape(nb, Bh, 1)
    vmask = jnp.asarray(
        np.broadcast_to(rows < Hc, (nb, Bh, Wc)).reshape(nb, 1, Lb)
        .astype(np.float32))

    geom = dict(Qd=Qd, Qh=Qh, Qw=Qw, Cp=Cp, Wc=Wc, Bh=Bh, Hh=Hh,
                dlo=dlo, hlo=hlo, wlo=wlo)
    hs = _sliver_rows(Bh, Hh, Wc)  # neighbor halo sliver height
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    cparams = pltpu.CompilerParams(vmem_limit_bytes=128 * 1024 * 1024)

    def bspec(ch, ngrid):
        return pl.BlockSpec(
            (1, 1, 1, ch, Lb),
            (lambda n, d, b: (n, d, b, 0, 0)) if ngrid == 3
            else (lambda n, d, b, j: (n, d, b, 0, 0)),
            memory_space=pltpu.VMEM,
        )

    def build_ds(dv, asyn_k):
        """grid (N, Dc, nb, Qd): ds = -vm [m2] stack-adjoint(A_k^T dv)."""
        kern = functools.partial(_kernel_ds_band, **geom, use_mask=use_mask)
        dvviews = []
        for db in (-1, 0, 1):
            rows = Lb if db == 0 else hs * Wc
            idx = 0 if db >= 0 else Bh // hs - 1
            dvviews.append(pl.BlockSpec(
                (1, 1, 1, Mp, rows),
                lambda n, d, b, j, db=db, idx=idx: (
                    n, jnp.clip(d + j - (Qd - 1) - dlo, 0, Dc - 1),
                    jnp.clip(b + db, 0, nb - 1), 0, idx),
                memory_space=pltpu.VMEM,
            ))
        return pl.pallas_call(
            kern,
            grid=(N, Dc, nb, Qd),
            in_specs=[*dvviews,
                      bspec(Cp, 4) if use_mask else pl.BlockSpec(
                          (1, 1, 1, 1, 1), lambda n, d, b, j: (0, 0, 0, 0, 0),
                          memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, Qh * Qw * Cp, Mp),
                                   lambda n, d, b, j: (j, 0, 0),
                                   memory_space=pltpu.VMEM),
                      full,  # acolw
                      pl.BlockSpec((1, 1, Lb), lambda n, d, b, j: (b, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=bspec(Cp, 4),
            out_shape=jax.ShapeDtypeStruct((N, Dc, nb, Cp, Lb), jnp.float32),
            compiler_params=cparams,
            interpret=interpret,
        )(dv, dv, dv, m2, asyn_k, acolw, vmask)

    def build_dz(ds, rkm1, zkm1, dv, bana_k, with_base):
        """grid (N, Dc, nb): dv_{k-1}, dA_{k-1}, dB_k, dt_{k-1}."""
        kern = functools.partial(_kernel_dz_band, **geom,
                                 with_base=with_base)
        views = []
        for src in range(2):  # 0: ds views, 1: r views
            for j in range(Qd):
                for db in (-1, 0, 1):
                    rows = Lb if db == 0 else hs * Wc
                    idx = 0 if db >= 0 else Bh // hs - 1
                    views.append(pl.BlockSpec(
                        (1, 1, 1, Cp, rows),
                        lambda n, d, b, j=j, db=db, idx=idx: (
                            n, jnp.clip(d + dlo + j, 0, Dc - 1),
                            jnp.clip(b + db, 0, nb - 1), 0, idx),
                        memory_space=pltpu.VMEM,
                    ))
        base = [ds] * (3 * Qd) + [rkm1] * (3 * Qd) + [zkm1]
        specs = [*views, bspec(Mp, 3)]
        if with_base:
            base.append(dv)
            specs.append(bspec(Mp, 3))
        accspec = lambda r0, r1: pl.BlockSpec(
            (1, r0, r1), lambda n, d, b: (n, 0, 0),
            memory_space=pltpu.VMEM)
        outs = pl.pallas_call(
            kern,
            grid=(N, Dc, nb),
            in_specs=[*specs,
                      full,  # B_ana_k (Mp, T*Cp)
                      pl.BlockSpec((1, 1, 1), lambda n, d, b: (n, 0, 0),
                                   memory_space=pltpu.VMEM),
                      full,  # scolw
                      full], # acol
            out_specs=[bspec(Mp, 3), accspec(Mp, T * Cp),
                       accspec(Mp, T * Cp), accspec(2, Mp)],
            out_shape=[
                jax.ShapeDtypeStruct((N, Dc, nb, Mp, Lb), jnp.float32),
                jax.ShapeDtypeStruct((N, Mp, T * Cp), jnp.float32),
                jax.ShapeDtypeStruct((N, Mp, T * Cp), jnp.float32),
                jax.ShapeDtypeStruct((N, 2, Mp), jnp.float32),
            ],
            scratch_shapes=[pltpu.VMEM((T * Cp, Lb), jnp.float32)],
            compiler_params=cparams,
            interpret=interpret,
        )(*base, bana_k, cv, scolw, acol)
        return outs

    # init: dz_{K-1} = Syn_B0-adjoint(dx2); also dA_{K-1}, dB_0, dt_{K-1}
    dv, dA_last, dB_first, dt_last = build_dz(
        g0, rfull[K - 1], z_hist[K - 1], None, B_ana[0], with_base=False)

    def body(dv, xs):
        asyn_k, bana_k, zkm1, rkm1 = xs
        ds = build_ds(dv, asyn_k)
        dv2, dAkm1, dBk, dtkm1 = build_dz(
            ds, rkm1, zkm1, dv, bana_k, with_base=True)
        # keep the small dA/dB/dt outputs OUT of the fusion XLA builds
        # around the scan's dynamic-update-slices: that fusion's scoped
        # vmem stack exceeds a non-overridable 16 MB limit (CLAUDE.md
        # gotcha; same defense as kernels/lista3d_bwd.py:435)
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
