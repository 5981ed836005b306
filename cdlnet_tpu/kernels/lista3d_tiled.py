"""Banded per-iteration 3D LISTA kernels for frames too big for the fused
pair path (kernels/lista3d) — DAVIS-native 480x854 eval clips and
fastMRI-native 640x368 slice volumes, the reference's own analyze3d.py /
analyzemri.py workloads at full resolution.

Structure = kernels/lista2d_tiled's row BANDS x kernels/lista3d's depth
machinery. Each iteration is two Pallas calls under a lax.scan:

  synthesis+residual  grid (N, Dc, nb, Qd) — the r[d, band] output block
      is revisited across the Qd innermost steps, accumulating one depth
      tap's in-plane contribution per step, so only one (Mp, Lb) z band
      view is resident at a time. The z view's index map clamps BOTH the
      depth tap (d+dq) and the band neighbors (b+-1).
  analysis+threshold  grid (N, Dc, nb) — Qd x 3 clamped r band views
      build the tap stack; one T*Cp-deep MXU contraction; soft-threshold.

Within each program the operand is rebuilt row-HALOED from three clamped
band views (band-1, band, band+1), exactly as lista2d_tiled._halo: out-of-
image halos are zeroed, which IS the reference Conv3d's zero-padding
semantics (model/net.py:137-144), so banding is exact. Depth-clamped
duplicate views are zeroed by the validity factor (as in the pair path).
All dots keep the pair kernels' MXU shapes: T*Cp-deep analysis
contraction, merged (Qh*Qw*Cp)-row synthesis dot with output-side rolls.
The code z streams through HBM once per iteration in z_dtype (bf16
default, ~0.5% code deviation, <0.05 dB on trained models).

Inference-only: calls are wrapped nondifferentiable by the model; big-
frame 3D TRAINING (beyond the reference's 128^2-crop protocol) takes the
XLA path.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

from cdlnet_tpu.kernels.lista2d import _axis_masks
from cdlnet_tpu.kernels.lista2d_tiled import _sliver_rows
from cdlnet_tpu.kernels.lista3d import _geom, prep_A2m_3d, prep_B2m_3d
from cdlnet_tpu.ops import polyphase as pp

_VMEM_BUDGET = int(100 * 1024 * 1024)


def _geometry3(P, s):
    P = (P,) * 3 if isinstance(P, int) else tuple(P)
    pads = tuple(p // 2 for p in P)
    (dlo, dhi), (hlo, hhi), (wlo, whi) = _geom(P, pads, s)
    Qd, Qh, Qw = dhi - dlo + 1, hhi - hlo + 1, whi - wlo + 1
    Hh = Qh - 1  # halo rows: bounds every analysis/synthesis row offset
    return P, pads, Qd, Qh, Qw, dlo, hlo, wlo, Hh


def _band_bytes3(M, Cp, Qd, Qh, Qw, Bh, Wc, Hh, z_bytes=2):
    """Per-program VMEM estimate: max of the two kernels' working sets
    (blocked inputs double-buffered x2)."""
    Mp = -(-M // 8) * 8
    T = Qd * Qh * Qw
    Lb = Bh * Wc
    Lw = (Bh + 2 * Hh) * Wc
    hs = _sliver_rows(Bh, Hh, Wc)
    syn = (
        2 * Mp * (Lb + 2 * hs * Wc) * z_bytes  # z band + 2 sliver views
        + Mp * Lw * 4                  # haloed z (f32 upcast)
        + (Qh * Qw * Cp) * Lw * 4      # merged-dot out
        + 2 * (Qh * Qw * Cp) * Mp * 4  # B2m block
        + 3 * 2 * Cp * Lb * 4          # y2/m2/r blocks
    )
    ana = (
        Qd * 2 * Cp * (Lb + 2 * hs * Wc) * 4  # r band + sliver views
        + Cp * Lw * 4                  # haloed r
        + 2 * 2 * Mp * Lb * z_bytes    # z in + z out blocks
        + T * Cp * Lb * z_bytes        # tap stack
        + Mp * T * Cp * z_bytes        # A2m (resident)
        + Mp * Lb * 4                  # u transient
    )
    masks = 2 * Qw * Lb * 4
    return max(syn, ana) + masks


def _pick_band3(M, C, P, s, Dc, Hc, Wc, z_bytes=2):
    P_, pads, Qd, Qh, Qw, dlo, hlo, wlo, Hh = _geometry3(P, s)
    Cp = C * s**3
    for Bh in (128, 64, 32, 16, 8):
        if Bh > Hh and _band_bytes3(M, Cp, Qd, Qh, Qw, Bh, Wc, Hh,
                                    z_bytes=z_bytes) < _VMEM_BUDGET:
            return Bh
    return None


def lista3d_tiled_supported(M, C, P, s, K, D, H, W, residual=None,
                            z_bytes=2) -> bool:
    """True when the banded 3D pair path applies (stride-divisible shape,
    no residual blocks, and a fitting band exists). Complements
    lista3d_fused_supported for big frames."""
    if residual is not None:
        return False
    if D % s or H % s or W % s:
        return False
    return _pick_band3(M, C, P, s, D // s, H // s, W // s,
                       z_bytes=z_bytes) is not None


def _halo_vals(above, cur, below, b, nb, Hh, Wc, Bh):
    """Haloed flat (ch, (Bh+2Hh)*Wc) buffer from a clamped band value and
    its two neighbor halo SLIVERS (hs-row blocks, _sliver_rows — full
    bands degenerate correctly), out-of-image halos zeroed (= the conv's
    zero padding)."""
    hu = above.shape[1] // Wc  # sliver (or full-band) height
    top = jnp.where(b > 0, 1.0, 0.0) * above[:, (hu - Hh) * Wc:]
    bot = jnp.where(b < nb - 1, 1.0, 0.0) * below[:, : Hh * Wc]
    return jnp.concatenate([top, cur, bot], axis=1)


def _kernel_syn3_band(zu_ref, zc_ref, zd_ref, y2_ref, m2_ref, B2m_ref,
                      scol_ref, vm_ref, r_ref, *, Qd, Qh, Qw, Cp, Wc, Bh,
                      Hh, dlo, hlo, wlo, use_mask, sub_y):
    """r[d, band] <- [mask *] (B_k z)[d, band] [- y2], summed over depth
    taps. Grid (N, Dc, nb, Qd), j innermost (revisited accumulation)."""
    from jax.experimental.pallas import tpu as pltpu

    d = pl.program_id(1)
    Dc = pl.num_programs(1)
    b = pl.program_id(2)
    nb = pl.num_programs(2)
    j = pl.program_id(3)
    Lb = Bh * Wc
    Lw = (Bh + 2 * Hh) * Wc
    lo = Hh * Wc

    @pl.when(j == 0)
    def _init():
        r_ref[0, 0, 0] = jnp.zeros_like(r_ref[0, 0, 0])

    dq = j - (Qd - 1) - dlo
    valid = jnp.where(jnp.logical_and(d + dq >= 0, d + dq < Dc), 1.0, 0.0)
    zh = _halo_vals(
        zu_ref[0, 0, 0].astype(jnp.float32),
        zc_ref[0, 0, 0].astype(jnp.float32),
        zd_ref[0, 0, 0].astype(jnp.float32),
        b, nb, Hh, Wc, Bh,
    )
    out = jax.lax.dot_general(
        B2m_ref[0], zh, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Qh*Qw*Cp, Lw)
    part = jnp.zeros((Cp, Lb), jnp.float32)
    for qi in range(Qh):
        for ri in range(Qw):
            t = qi * Qw + ri
            off = (qi - (Qh - 1) - hlo) * Wc + (ri - (Qw - 1) - wlo)
            rolled = (
                pltpu.roll(out[t * Cp : (t + 1) * Cp], (-off) % Lw, 1)
                if off % Lw else out[t * Cp : (t + 1) * Cp]
            )
            part += rolled[:, lo : lo + Lb] * scol_ref[ri][None, :]
    r_ref[0, 0, 0] += valid * part

    @pl.when(j == Qd - 1)
    def _finalize():
        acc = r_ref[0, 0, 0]
        if sub_y:
            if use_mask:
                acc = m2_ref[0, 0, 0] * acc
            acc = acc - y2_ref[0, 0, 0]
        # vm zeroes rows past the true image height (ragged-Hc padding):
        # pad-row r must be 0 so the next analysis sees zero-padding there
        r_ref[0, 0, 0] = vm_ref[0, 0] * acc


def _kernel_ana3_band(*refs, Qd, Qh, Qw, Cp, Wc, Bh, Hh, dlo, hlo, wlo):
    """z[d, band] <- ST(z[d, band] - (A_k r)[d, band], tau_k).
    Grid (N, Dc, nb). refs: Qd*3 r band views (1,1,1,Cp,Lb) f32, z_old
    (1,1,1,Mp,Lb), tau (1,1,Mp), A2m (Mp,T*Cp), acol (Qw,Lb), vm (1,1,Lb),
    out z_new (1,1,1,Mp,Lb), scratch stack (T*Cp,Lb)."""
    from jax.experimental.pallas import tpu as pltpu

    rviews = refs[: 3 * Qd]
    (z_ref, tau_ref, A2m_ref, acol_ref, vm_ref, zout_ref,
     stack_ref) = refs[3 * Qd:]
    d = pl.program_id(1)
    Dc = pl.num_programs(1)
    b = pl.program_id(2)
    nb = pl.num_programs(2)
    Lb = Bh * Wc
    Lw = (Bh + 2 * Hh) * Wc
    lo = Hh * Wc

    def roll(buf, off):
        return pltpu.roll(buf, (-off) % Lw, 1) if off % Lw else buf

    for j in range(Qd):
        dq = dlo + j
        valid = jnp.where(jnp.logical_and(d + dq >= 0, d + dq < Dc), 1.0, 0.0)
        rh = valid * _halo_vals(
            rviews[3 * j][0, 0, 0], rviews[3 * j + 1][0, 0, 0],
            rviews[3 * j + 2][0, 0, 0], b, nb, Hh, Wc, Bh,
        )
        for qi in range(Qh):
            rowed = roll(rh, (hlo + qi) * Wc)
            for ri in range(Qw):
                t = (j * Qh + qi) * Qw + ri
                stack_ref[t * Cp : (t + 1) * Cp] = (
                    roll(rowed, wlo + ri)[:, lo : lo + Lb]
                    * acol_ref[ri][None, :]
                ).astype(stack_ref.dtype)

    u = jax.lax.dot_general(
        A2m_ref[:], stack_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    zn = z_ref[0, 0, 0].astype(jnp.float32) - u
    tau = tau_ref[0, 0][:, None]
    zout_ref[0, 0, 0] = (
        vm_ref[0, 0] * jnp.sign(zn) * jnp.maximum(jnp.abs(zn) - tau, 0.0)
    ).astype(zout_ref.dtype)


def make_banded3_ops(N, C, Dc, Hc, Wc, M, P, s, *, z_dtype=jnp.bfloat16,
                     interpret=False, band=None, use_mask=False):
    """Per-iteration banded 3D kernel closures + geometry.

    Factored out of lista3d_tiled so the depth-sharded path
    (dist/halo_fused.py) can run the SAME hardware-validated kernels on
    halo-extended local blocks — the kernels are unmodified; only Dc (the
    depth grid extent) differs per caller. Returns a dict with:
      synthesize(z, B2m_k, sub_y, y2, m2) -> r   (N, Dc, nb, Cp, Lb) f32
      analyze(r, z, A2m_k, tau_k) -> z_new       (N, Dc, nb, Mp, Lb) z_dtype
      to_bands / from_bands, and the static geometry.
    tau_k is (N, Mp); A2m_k (Mp, T*Cp) in z_dtype; B2m_k (Qd, Qh*Qw*Cp, Mp).

    CDLNET_PALLAS_INTERPRET=1 forces interpret mode (CPU-mesh tests and the
    driver's virtual-device dryrun run the depth-sharded path through here).
    """
    import os

    from jax.experimental.pallas import tpu as pltpu

    interpret = interpret or os.environ.get("CDLNET_PALLAS_INTERPRET") == "1"

    P, pads, Qd, Qh, Qw, dlo, hlo, wlo, Hh = _geometry3(P, s)
    Cp = C * s**3
    T = Qd * Qh * Qw
    Mp = -(-M // 8) * 8
    Bh = band if band is not None else _pick_band3(
        M, C, P, s, Dc, Hc, Wc, z_bytes=jnp.dtype(z_dtype).itemsize)
    assert Bh is not None, "caller must gate on lista3d_tiled_supported"
    # caller-supplied bands must still cover the halo (see lista2d_tiled)
    assert Bh > Hh, f"band {Bh} must exceed the {Hh}-row halo"
    Hcp = -(-Hc // Bh) * Bh
    nb = Hcp // Bh
    Lb = Bh * Wc
    hs = _sliver_rows(Bh, Hh, Wc)  # neighbor halo sliver height

    def to_bands(x5):
        # (N, Cp, Dc, Hc, Wc) -> (N, Dc, nb, Cp, Lb), rows zero-padded
        if Hcp != Hc:
            x5 = jnp.pad(x5, ((0, 0), (0, 0), (0, 0), (0, Hcp - Hc), (0, 0)))
        return (
            x5.transpose(0, 2, 1, 3, 4)
            .reshape(x5.shape[0], x5.shape[2], Cp, nb, Bh, Wc)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(x5.shape[0], x5.shape[2], nb, Cp, Lb)
        )

    def from_bands(xb, ch):
        # (N, Dc', nb, ch, Lb) -> (N, ch, Dc', Hc, Wc)
        n, dc = xb.shape[0], xb.shape[1]
        return (
            xb.reshape(n, dc, nb, ch, Bh, Wc)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(n, dc, ch, Hcp, Wc)[:, :, :, :Hc]
            .transpose(0, 2, 1, 3, 4)
        )

    # per-band column masks (Wc-periodic — identical for every band); row
    # borders need no masks: the zeroed halos ARE the zero padding.
    # Kept as NUMPY here and converted inside each call: the builder may be
    # constructed in one trace and its closures invoked in another (the
    # depth-sharded custom-VJP backward) — jnp constants would leak tracers
    acol = np.asarray(_axis_masks([wlo + ri for ri in range(Qw)], Bh, Wc, 1))
    scol = np.asarray(
        _axis_masks([ri - (Qw - 1) - wlo for ri in range(Qw)], Bh, Wc, 1)
    )
    rows = np.arange(Hcp).reshape(nb, Bh, 1)
    vmask = (
        np.broadcast_to(rows < Hc, (nb, Bh, Wc)).reshape(nb, 1, Lb)
        .astype(np.float32)
    )

    geom = dict(Qd=Qd, Qh=Qh, Qw=Qw, Cp=Cp, Wc=Wc, Bh=Bh, Hh=Hh,
                dlo=dlo, hlo=hlo, wlo=wlo)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    cparams = pltpu.CompilerParams(vmem_limit_bytes=128 * 1024 * 1024)

    def bspec(ch, ngrid):
        return pl.BlockSpec(
            (1, 1, 1, ch, Lb),
            (lambda n, d, b: (n, d, b, 0, 0)) if ngrid == 3
            else (lambda n, d, b, j: (n, d, b, 0, 0)),
            memory_space=pltpu.VMEM,
        )

    def vmspec(ngrid):
        return pl.BlockSpec(
            (1, 1, Lb),
            (lambda n, d, b: (b, 0, 0)) if ngrid == 3
            else (lambda n, d, b, j: (b, 0, 0)),
            memory_space=pltpu.VMEM,
        )

    def synthesize(z, B2m_k, sub_y, y2, m2):
        kern = functools.partial(_kernel_syn3_band, **geom,
                                 use_mask=use_mask, sub_y=sub_y)
        # band view of z at the j-th depth tap plus the two hs-row
        # neighbor halo slivers (the kernel uses only Hh boundary rows of
        # the neighbors; reading full bands tripled the dominant z read)
        zviews = []
        for db in (-1, 0, 1):
            rows = Lb if db == 0 else hs * Wc
            idx = 0 if db >= 0 else Bh // hs - 1
            zviews.append(pl.BlockSpec(
                (1, 1, 1, Mp, rows),
                lambda n, d, b, j, db=db, idx=idx: (
                    n, jnp.clip(d + j - (Qd - 1) - dlo, 0, Dc - 1),
                    jnp.clip(b + db, 0, nb - 1), 0, idx),
                memory_space=pltpu.VMEM,
            ))
        return pl.pallas_call(
            kern,
            grid=(N, Dc, nb, Qd),
            in_specs=[*zviews,
                      bspec(Cp, 4),
                      bspec(Cp, 4) if use_mask else pl.BlockSpec(
                          (1, 1, 1, 1, 1), lambda n, d, b, j: (0, 0, 0, 0, 0),
                          memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, Qh * Qw * Cp, Mp),
                                   lambda n, d, b, j: (j, 0, 0),
                                   memory_space=pltpu.VMEM),
                      full,
                      vmspec(4)],
            out_specs=bspec(Cp, 4),
            out_shape=jax.ShapeDtypeStruct((N, Dc, nb, Cp, Lb), jnp.float32),
            compiler_params=cparams,
            interpret=interpret,
        )(z, z, z, y2, m2, B2m_k, jnp.asarray(scol), jnp.asarray(vmask))

    def analyze(r, z, A2m_k, tau_k):
        kern = functools.partial(_kernel_ana3_band, **geom)
        rviews = []
        for j in range(Qd):
            for db in (-1, 0, 1):
                rows = Lb if db == 0 else hs * Wc
                idx = 0 if db >= 0 else Bh // hs - 1
                rviews.append(pl.BlockSpec(
                    (1, 1, 1, Cp, rows),
                    lambda n, d, b, j=j, db=db, idx=idx: (
                        n, jnp.clip(d + dlo + j, 0, Dc - 1),
                        jnp.clip(b + db, 0, nb - 1), 0, idx),
                    memory_space=pltpu.VMEM,
                ))
        return pl.pallas_call(
            kern,
            grid=(N, Dc, nb),
            in_specs=[*rviews,
                      bspec(Mp, 3),
                      pl.BlockSpec((1, 1, Mp), lambda n, d, b: (n, 0, 0),
                                   memory_space=pltpu.VMEM),
                      full,    # A2m_k
                      full,    # acol
                      vmspec(3)],
            out_specs=bspec(Mp, 3),
            out_shape=jax.ShapeDtypeStruct((N, Dc, nb, Mp, Lb), z_dtype),
            scratch_shapes=[pltpu.VMEM((T * Cp, Lb), z_dtype)],
            compiler_params=cparams,
            interpret=interpret,
        )(*([r] * (3 * Qd)), z, tau_k.reshape(-1, 1, Mp), A2m_k,
          jnp.asarray(acol), jnp.asarray(vmask))

    return dict(
        synthesize=synthesize, analyze=analyze,
        to_bands=to_bands, from_bands=from_bands,
        pads=pads, Qd=Qd, Qh=Qh, Qw=Qw, Hh=Hh, Cp=Cp, T=T, Mp=Mp,
        Bh=Bh, nb=nb, Lb=Lb, Hcp=Hcp, dlo=dlo, hlo=hlo, wlo=wlo,
    )


def lista3d_tiled(yp, A, B, t, c, stride=1, mask=None, return_z=False,
                  z_dtype=jnp.bfloat16, interpret=False, band=None,
                  return_hists=False):
    """Banded per-iteration fused 3D LISTA for big frames. Same contract
    as lista3d_fused: (xphat (N,C,D,H,W) fp32, z (N,M,Dc,Hc,Wc) or None),
    matching the XLA scan to the z_dtype carry tolerance.

    return_hists=True (training residuals for the banded 3D reverse,
    kernels/lista3d_tiled_bwd) additionally returns (z_hist (K, N, Dc, nb,
    Mp, Lb) in z_dtype, r_hist (K-1, N, Dc, nb, Cp, Lb) fp32) — the scan
    stacks the per-iteration streams the banded forward carries through
    HBM anyway, so collecting them costs only the HBM writes."""
    N, C, D, H, W = yp.shape
    K, M = A.shape[0], A.shape[1]
    s = stride
    Dc, Hc, Wc = D // s, H // s, W // s
    use_mask = mask is not None

    ops = make_banded3_ops(
        N, C, Dc, Hc, Wc, M, A.shape[-3:], s, z_dtype=z_dtype,
        interpret=interpret, band=band, use_mask=use_mask,
    )
    pads = ops["pads"]
    Qd, Qh, Qw = ops["Qd"], ops["Qh"], ops["Qw"]
    Cp, Mp, nb, Lb = ops["Cp"], ops["Mp"], ops["nb"], ops["Lb"]
    to_bands = ops["to_bands"]

    A2m = prep_A2m_3d(A, s, pads).astype(z_dtype)          # (K, Mp, T*Cp)
    B2m = prep_B2m_3d(B, s, pads).reshape(K, Qd, Qh * Qw * Cp, Mp)

    y2 = to_bands(pp.space_to_depth(yp, s, 3))
    m2 = (
        to_bands(pp.space_to_depth(jnp.broadcast_to(mask, yp.shape), s, 3))
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

    def synthesize(z, B2m_k, sub_y):
        return ops["synthesize"](z, B2m_k, sub_y, y2, m2)

    def analyze(r, z, A2m_k, tau_k):
        return ops["analyze"](r, z, A2m_k, tau_k)

    # k = 0: z = ST(A0 y2, tau0) via analyze(r=-y2, z=0)
    z0 = jnp.zeros((N, Dc, nb, Mp, Lb), z_dtype)
    z = analyze(-y2.astype(jnp.float32), z0, A2m[0], tau[:, 0])
    z_first = z

    def body(z, xs):
        A2m_k, B2m_k, tau_k = xs
        r = synthesize(z, B2m_k, sub_y=True)
        z = analyze(r, z, A2m_k, tau_k)
        return z, ((z, r) if return_hists else None)

    z, hists = lax.scan(body, z, (A2m[1:], B2m[1:],
                                  tau.transpose(1, 0, 2)[1:]))

    x2 = synthesize(z, B2m[0], sub_y=False)  # (N, Dc, nb, Cp, Lb)
    x5 = ops["from_bands"](x2, Cp)  # (N, Cp, Dc, Hc, Wc)
    xphat = pp.depth_to_space(x5, s, 3, C)
    z_out = (
        ops["from_bands"](z.astype(jnp.float32), Mp)[:, :M]
        if return_z
        else None
    )
    if return_hists:
        zs, rs = hists
        z_hist = jnp.concatenate([z_first[None], zs], axis=0)
        return xphat, z_out, (z_hist, rs)
    return xphat, z_out
