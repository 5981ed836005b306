"""Banded per-iteration 2D LISTA kernels for images too big for the
whole-K VMEM-resident kernel (kernels/lista2d) — Set12-class 512x512 and
BSD68-class 481x321 eval images.

Structure mirrors the 3D iteration pair (kernels/lista3d): each iteration
is two Pallas calls under a lax.scan — synthesis+residual then
analysis+threshold — with the code z streamed through HBM once per
iteration in bfloat16. The image's code grid is split into nb horizontal
BANDS of Bh rows; the grid is (N, nb) and each program rebuilds a
row-HALOED copy of its operand from three clamped band views (band-1,
band, band+1). Out-of-image halos are zeroed, which IS the reference
conv's zero-padding semantics (model/net.py:33), so banding is exact.

Within the haloed flat (ch, (Bh+2*Hh)*Wc) buffer every tap is the usual
lane-roll; interior columns are sliced out after the roll, so no row
border masks are needed at all — only the Wc-periodic column masks.
All dots keep the whole-image kernels' MXU shapes (T*Cp-deep analysis
contraction, merged (T*Cp)-row synthesis dot with output-side rolls).

Training: big crops use this forward too. With return_hists=True the scan
stacks the code/residual streams it already carries through HBM, and the
banded whole-reverse-resident kernel (kernels/lista2d_tiled_bwd) consumes
them — lista2d_tiled_diff's custom VJP wires the pair up, and
routing.route_lista2d sends big lane-aligned training crops here. The
reference's 128^2 training crops still take the whole-K-resident
differentiable kernel (kernels/lista2d).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

from cdlnet_tpu.kernels.lista2d import (
    _axis_masks,
    _prep_A2m,
    _prep_B2m,
    _tap_geometry,
)
from cdlnet_tpu.ops import polyphase as pp

_VMEM_BUDGET = int(100 * 1024 * 1024)


def _geometry(P, s):
    P = (P, P) if isinstance(P, int) else tuple(P)
    pads = ((P[0] - 1) // 2, (P[1] - 1) // 2)
    (Qh, Qw), _, _ = _tap_geometry(P, pads, s)
    q_lo_h, _ = pp._tap_ranges(P[0], pads[0], s)
    q_lo_w, _ = pp._tap_ranges(P[1], pads[1], s)
    # halo rows: one tap span bounds every analysis offset
    # ([q_lo_h, q_lo_h+Qh), with q_lo_h in [1-Qh, 0]) and every synthesis
    # offset ([-(Qh-1)-q_lo_h, -q_lo_h])
    Hh = Qh - 1
    return P, pads, Qh, Qw, q_lo_h, q_lo_w, Hh


def _band_bytes(M, Cp, T, Bh, Wc, Hh, z_bytes=2, n_codes=0):
    Lb, Lh = Bh * Wc, (Bh + 2 * Hh) * Wc
    hs = _sliver_rows(Bh, Hh, Wc)
    views = 2 * M * (Lb + 2 * hs * Wc) * z_bytes  # z band + 2 slivers
    zh = M * Lh * 4
    stack = T * Cp * max(Lb, Lh) * 4
    synout = T * Cp * Lh * 4
    io = 2 * (2 * Cp + M) * Lb * 4
    codes = n_codes * 2 * M * Lb * 4          # z_prev/z_after band blocks
    return views + zh + stack + synout + io + codes


def lista2d_tiled_supported(M, C, P, s, K, H, W, z_bytes=2,
                            n_codes=0) -> bool:
    """True when the banded pair path applies (stride-divisible shape and
    a valid band size exists). Complements lista2d_fused_supported.
    z_bytes must match the z_dtype the call will use (2 for the default
    bf16 carry; pass 4 when calling lista2d_tiled(z_dtype=jnp.float32) —
    the band pick is dtype-dependent, so gating at the wrong width can
    admit a shape whose fp32 call has no fitting band). n_codes counts
    the VMEM-resident neighbor-code bands of the CSR prox modes."""
    if H % s or W % s:
        return False
    return _pick_band(M, C, P, s, H // s, W // s, z_bytes=z_bytes,
                      n_codes=n_codes) is not None


def _pick_band(M, C, P, s, Hc, Wc, z_bytes=2, n_codes=0):
    """Largest fitting band height. Hc need NOT be divisible: the wrapper
    zero-pads the code grid to a band multiple and masks pad rows every
    iteration (exactly the conv's zero-padding semantics). z_bytes is the
    code-carry width — 2 for bf16 inference, the hist dtype's width for
    the training forward (lista2d_tiled picks with its actual z_dtype)."""
    P_, pads, Qh, Qw, qlh, qlw, Hh = _geometry(P, s)
    T, Cp = Qh * Qw, C * s * s
    for Bh in (128, 64, 32, 16, 8):
        if Bh > Hh and _band_bytes(M, Cp, T, Bh, Wc, Hh, z_bytes=z_bytes,
                                   n_codes=n_codes) < _VMEM_BUDGET:
            return Bh
    return None


def _sliver_rows(Bh, G, Wc):
    """Height of the neighbor-band halo sliver blocks: the smallest
    power-of-2 divisor of Bh covering the G-row halo (band heights are
    powers of 2). Reading thin slivers of the b-1/b+1 bands instead of
    full band views cuts the dominant z HBM read from 3x the band bytes
    to (1 + 2*hs/Bh)x — e.g. 3x -> 1.25x at Bh=64, G=6.

    Mosaic constraint (hardware-only; interpret mode does not check it):
    a block's LAST dim must be a multiple of 128 lanes or the full array
    dim, so the sliver height must also satisfy (hs * Wc) % 128 == 0.
    When no such height < Bh exists (e.g. odd Wc), returns Bh — the
    full-band view, degenerating to the original 3-view read."""
    hs = 1
    while hs < G:
        hs *= 2
    while hs < Bh and (hs * Wc) % 128:
        hs *= 2
    return min(hs, Bh)


def _halo(refs, Hh, Wc, Bh, dtype=jnp.float32):
    """Build the haloed flat buffer (ch, (Bh+2Hh)*Wc) from three clamped
    band views (above, cur, below) with out-of-image halos zeroed. Pure
    lane-dim slices/concat of the FLAT buffers — Mosaic cannot shape-cast
    across unaligned lane boundaries (Wc need not divide 128)."""
    above_ref, cur_ref, below_ref, b, nb = refs
    above = above_ref[0, 0].astype(dtype)
    cur = cur_ref[0, 0].astype(dtype)
    below = below_ref[0, 0].astype(dtype)
    hu = above.shape[1] // Wc  # neighbor sliver (or full-band) height
    top = jnp.where(b > 0, 1.0, 0.0) * above[:, (hu - Hh) * Wc :]
    bot = jnp.where(b < nb - 1, 1.0, 0.0) * below[:, : Hh * Wc]
    return jnp.concatenate([top, cur, bot], axis=1)


def _kernel_syn_band(zu_ref, zc_ref, zd_ref, y2_ref, m2_ref, B2m_ref,
                     scol_ref, vm_ref, r_ref, *, Qh, Qw, Cp, Wc, Bh, Hh,
                     q_lo, r_lo, use_mask, sub_y):
    """r[band] <- [mask *] (B_k z)[band] [- y2[band]]. Grid (N, nb)."""
    from jax.experimental.pallas import tpu as pltpu

    b = pl.program_id(1)
    nb = pl.num_programs(1)
    Lh = (Bh + 2 * Hh) * Wc
    Lb = Bh * Wc

    zh = _halo((zu_ref, zc_ref, zd_ref, b, nb), Hh, Wc, Bh)

    out = jax.lax.dot_general(
        B2m_ref[0], zh, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (T*Cp, Lh)
    acc = jnp.zeros((Cp, Lb), jnp.float32)
    lo = Hh * Wc
    for qi in range(Qh):
        for ri in range(Qw):
            t = qi * Qw + ri
            off = (qi - (Qh - 1) - q_lo) * Wc + (ri - (Qw - 1) - r_lo)
            rolled = (
                pltpu.roll(out[t * Cp : (t + 1) * Cp], (-off) % Lh, 1)
                if off % Lh else out[t * Cp : (t + 1) * Cp]
            )
            acc += rolled[:, lo : lo + Lb] * scol_ref[ri][None, :]
    if sub_y:
        if use_mask:
            acc = m2_ref[0, 0] * acc
        acc = acc - y2_ref[0, 0]
    r_ref[0, 0] = vm_ref[0, 0] * acc


def _kernel_ana_band(ru_ref, rc_ref, rd_ref, z_ref, tb_ref, cv_ref, A2m_ref,
                     acol_ref, vm_ref, *rest, Qh, Qw, Cp, Wc, Bh, Hh,
                     q_lo, r_lo, zero_prev, prox="st"):
    """z[band] <- prox(z[band] - A_k stack(r)[band]). Grid (N, nb).
    tb (1, 2, M) is the k-th threshold row pair; cv (1, 1, 1) the
    per-sample noise scale.

    prox="st" is plain soft-thresholding; "csr"/"csrf2" are the CSR
    temporal proxes (core/ops.py::prox_csr / prox_csr_f2, reference
    model/net.py:229-262) over banded neighbor-frame codes — `rest`
    then leads with the gamma row pair(s) and z_prev[/z_after] band
    blocks, all pure VPU work on top of the same analysis dot."""
    from jax.experimental.pallas import tpu as pltpu

    if prox == "st":
        zout_ref, stack_ref = rest
    elif prox == "csr":
        gb1_ref, zp_ref, zout_ref, stack_ref = rest
    else:
        gb1_ref, gb2_ref, zp_ref, za_ref, zout_ref, stack_ref = rest

    b = pl.program_id(1)
    nb = pl.num_programs(1)
    Lh = (Bh + 2 * Hh) * Wc
    Lb = Bh * Wc
    lo = Hh * Wc

    rh = _halo((ru_ref, rc_ref, rd_ref, b, nb), Hh, Wc, Bh)

    for qi in range(Qh):
        roff = (q_lo + qi) * Wc
        rowed = (
            pltpu.roll(rh, (-roff) % Lh, 1) if roff % Lh else rh
        )
        for ri in range(Qw):
            t = qi * Qw + ri
            coff = r_lo + ri
            shifted = (
                pltpu.roll(rowed, (-coff) % Lh, 1) if coff % Lh else rowed
            )
            stack_ref[t * Cp : (t + 1) * Cp] = (
                shifted[:, lo : lo + Lb] * acol_ref[ri][None, :]
            )

    u = jax.lax.dot_general(
        A2m_ref[:], stack_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    cval = cv_ref[0, 0, 0]
    tau = tb_ref[0, 0][:, None] + cval * tb_ref[0, 1][:, None]
    prev = 0.0 if zero_prev else z_ref[0, 0].astype(jnp.float32)
    zn = prev - u

    def _soft(x, thr):
        return jnp.sign(x) * jnp.maximum(jnp.abs(x) - thr, 0.0)

    if prox == "st":
        out = _soft(zn, tau)
    elif prox == "csr":
        gam = gb1_ref[0, 0][:, None] + cval * gb1_ref[0, 1][:, None]
        zp = zp_ref[0, 0]
        shift = zp + tau * jnp.sign(zp)
        out = _soft(_soft(zn - shift, tau * gam) + shift, tau)
    else:
        g1 = gb1_ref[0, 0][:, None] + cval * gb1_ref[0, 1][:, None]
        g2 = gb2_ref[0, 0][:, None] + cval * gb2_ref[0, 1][:, None]
        zp, za = zp_ref[0, 0], za_ref[0, 0]
        Ca = zp + tau * jnp.sign(zp) + tau * g2 * jnp.sign(zp - za)
        Cb = za + tau * jnp.sign(za) + tau * g1 * jnp.sign(za - zp)
        inner = _soft(zn - Ca, g1 * tau)
        corr = tau * g1 * jnp.sign(zn - Ca)
        midder = _soft(inner - Cb + corr, g2 * tau)
        out = _soft(midder + Cb - corr, tau)
    # vm zeroes rows past the true image height (ragged-Hc zero padding)
    zout_ref[0, 0] = (vm_ref[0, 0] * out).astype(zout_ref.dtype)


def lista2d_tiled(yp, A, B, t, c, stride=1, mask=None, return_z=False,
                  z_dtype=jnp.bfloat16, interpret=False, band=None,
                  return_hists=False, g=None, z_prev=None, g2=None,
                  z_after=None):
    """Banded per-iteration fused 2D LISTA for big images. Same contract
    as lista2d_fused: returns (xphat, z or None), matching the XLA scan
    to the z_dtype carry tolerance (~0.5% codes, <0.02 dB on trained
    models; pass z_dtype=jnp.float32 for fp32-exactness — and gate such
    calls with lista2d_tiled_supported(..., z_bytes=4), since the band
    pick is made at the requested code width).

    CSR prox modes (frame-recurrent models at native eval frames,
    reference model/net.py:426-463 and :544-564): pass z_prev (N, M, Hc,
    Wc) + gamma bank g (K, 2, M, 1, 1) for the one-sided prox_csr,
    z_after + g2 for the other side, or all four for the two-sided
    prox_csr_f2 — neighbor codes ride banded next to the code being
    solved (gate with lista2d_tiled_supported(..., n_codes=...)).

    return_hists=True (training residuals for the banded reverse kernel,
    kernels/lista2d_tiled_bwd) additionally returns (z_hist (K, N, nb, M,
    Lb) in z_dtype, r_hist (K-1, N, nb, Cp, Lb) fp32) — the scan stacks
    the code/residual streams it carries through HBM anyway."""
    from jax.experimental.pallas import tpu as pltpu

    N, C, H, W = yp.shape
    K, M = A.shape[0], A.shape[1]
    s = stride

    if z_prev is not None and z_after is not None:
        prox_mode = "csrf2"
    elif z_prev is not None or z_after is not None:
        prox_mode = "csr"
        if z_prev is None:  # one-sided on the following frame: gamma = g2
            z_prev, g = z_after, g2
            z_after = g2 = None
    else:
        prox_mode = "st"
    n_codes = {"st": 0, "csr": 1, "csrf2": 2}[prox_mode]
    assert not (return_hists and prox_mode != "st"), (
        "banded CSR prox is inference-only (no banded prox reverse kernel); "
        "big-frame CSR training takes the XLA path"
    )

    P, pads, Qh, Qw, q_lo_h, q_lo_w, Hh = _geometry(A.shape[-2:], s)
    Hc, Wc = H // s, W // s
    Cp = C * s * s
    T = Qh * Qw
    Bh = band if band is not None else _pick_band(
        M, C, P, s, Hc, Wc, z_bytes=jnp.dtype(z_dtype).itemsize,
        n_codes=n_codes)
    assert Bh is not None, "caller must gate on lista2d_tiled_supported"
    # a caller-supplied band smaller than the halo would make _halo slice
    # neighbor views at negative offsets -> silently wrong halos (the auto
    # pick only returns Bh > Hh); mirror the ring kernel's assertion
    assert Bh > Hh, f"band {Bh} must exceed the {Hh}-row halo"
    Hcp = -(-Hc // Bh) * Bh   # ragged Hc: zero-pad rows, mask each iteration
    nb = Hcp // Bh
    Lb = Bh * Wc

    A2m = _prep_A2m(A, s, pads, T, Cp).astype(z_dtype)   # (K, M, T*Cp)
    B2m = _prep_B2m(B, s, pads, T, Cp)                    # (K, T*Cp, M)

    def to_bands(x4):  # (N, ch, Hc, Wc) -> (N, nb, ch, Bh*Wc), row-padded
        ch = x4.shape[1]
        if Hcp != Hc:
            x4 = jnp.pad(x4, ((0, 0), (0, 0), (0, Hcp - Hc), (0, 0)))
        return (x4.reshape(N, ch, nb, Bh, Wc)
                .transpose(0, 2, 1, 3, 4).reshape(N, nb, ch, Lb))

    y2 = to_bands(pp.space_to_depth(yp, s, 2))
    use_mask = mask is not None
    m2 = (
        to_bands(pp.space_to_depth(jnp.broadcast_to(mask, yp.shape), s, 2))
        if use_mask
        else jnp.zeros((N, 1, 1, 1), yp.dtype)
    )

    tbank = t[:, :, :, 0, 0].astype(jnp.float32)         # (K, 2, M)
    gbank1 = (g[:, :, :, 0, 0].astype(jnp.float32)
              if prox_mode != "st" else None)
    gbank2 = (g2[:, :, :, 0, 0].astype(jnp.float32)
              if prox_mode == "csrf2" else None)
    zpb = (to_bands(z_prev.astype(jnp.float32))
           if prox_mode != "st" else None)                # (N, nb, M, Lb)
    zab = (to_bands(z_after.astype(jnp.float32))
           if prox_mode == "csrf2" else None)
    c_arr = jnp.asarray(c, jnp.float32).reshape(-1)
    if c_arr.size == 1:
        c_arr = jnp.broadcast_to(c_arr, (N,))
    cvec = c_arr.reshape(N, 1, 1)

    # per-band column masks (Wc-periodic — identical for every band)
    acol = jnp.asarray(_axis_masks([q_lo_w + ri for ri in range(Qw)],
                                   Bh, Wc, 1))
    scol = jnp.asarray(_axis_masks([ri - (Qw - 1) - q_lo_w for ri in range(Qw)],
                                   Bh, Wc, 1))
    # per-band row-validity masks (rows past the true Hc are forced to 0)
    rows = np.arange(Hcp).reshape(nb, Bh, 1)
    vmask = jnp.asarray(
        np.broadcast_to(rows < Hc, (nb, Bh, Wc)).reshape(nb, 1, Lb)
        .astype(np.float32)
    )

    geom = dict(Qh=Qh, Qw=Qw, Cp=Cp, Wc=Wc, Bh=Bh, Hh=Hh,
                q_lo=q_lo_h, r_lo=q_lo_w)
    grid = (N, nb)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)

    hs = _sliver_rows(Bh, Hh, Wc)

    def bviews(ch):
        """Clamped band view of a (N, nb, ch, Lb) array plus the two
        hs-row neighbor halo slivers (only Hh boundary rows are used —
        full views tripled the dominant HBM read)."""
        out = []
        for db in (-1, 0, 1):
            rows = Lb if db == 0 else hs * Wc
            idx = 0 if db >= 0 else Bh // hs - 1
            out.append(pl.BlockSpec(
                (1, 1, ch, rows),
                lambda n, b, db=db, idx=idx: (
                    n, jnp.clip(b + db, 0, nb - 1), 0, idx),
                memory_space=pltpu.VMEM,
            ))
        return out

    bspec = lambda ch: pl.BlockSpec(
        (1, 1, ch, Lb), lambda n, b: (n, b, 0, 0), memory_space=pltpu.VMEM
    )

    def synthesize(z, B2m_k, sub_y):
        kern = functools.partial(_kernel_syn_band, **geom,
                                 use_mask=use_mask, sub_y=sub_y)
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[*bviews(M),
                      bspec(Cp),
                      bspec(Cp) if use_mask else pl.BlockSpec(
                          (1, 1, 1, 1), lambda n, b: (0, 0, 0, 0),
                          memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, T * Cp, M), lambda n, b: (0, 0, 0),
                                   memory_space=pltpu.VMEM),
                      full,
                      pl.BlockSpec((1, 1, Lb), lambda n, b: (b, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=bspec(Cp),
            out_shape=jax.ShapeDtypeStruct((N, nb, Cp, Lb), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024,
            ),
            interpret=interpret,
        )(z, z, z, y2, m2, B2m_k[None], scol, vmask)

    row_spec = pl.BlockSpec((1, 2, M), lambda n, b: (0, 0, 0),
                            memory_space=pltpu.VMEM)

    def analyze(r, z, A2m_k, tb_k, zero_prev, gb1_k=None, gb2_k=None):
        kern = functools.partial(_kernel_ana_band, **geom,
                                 zero_prev=zero_prev, prox=prox_mode)
        extra_specs, extra_args = [], []
        if prox_mode != "st":
            extra_specs.append(row_spec)
            extra_args.append(gb1_k[None])
            if prox_mode == "csrf2":
                extra_specs.append(row_spec)
                extra_args.append(gb2_k[None])
            extra_specs.append(bspec(M))
            extra_args.append(zpb)
            if prox_mode == "csrf2":
                extra_specs.append(bspec(M))
                extra_args.append(zab)
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[*bviews(Cp),
                      bspec(M),
                      row_spec,
                      pl.BlockSpec((1, 1, 1), lambda n, b: (n, 0, 0),
                                   memory_space=pltpu.VMEM),
                      full,  # A2m_k (M, T*Cp)
                      full,
                      pl.BlockSpec((1, 1, Lb), lambda n, b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
                      *extra_specs],
            out_specs=bspec(M),
            out_shape=jax.ShapeDtypeStruct((N, nb, M, Lb), z_dtype),
            scratch_shapes=[pltpu.VMEM((T * Cp, Lb), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024,
            ),
            interpret=interpret,
        )(r, r, r, z, tb_k[None], cvec, A2m_k, acol, vmask, *extra_args)

    # k = 0: z = prox(A0 y2) via analyze(r=-y2, z=0)
    z0 = jnp.zeros((N, nb, M, Lb), z_dtype)
    z = analyze(-y2.astype(jnp.float32), z0, A2m[0], tbank[0], True,
                gbank1[0] if gbank1 is not None else None,
                gbank2[0] if gbank2 is not None else None)
    z_first = z

    def body(z, xs):
        A2m_k, B2m_k, tb_k = xs[:3]
        gb1_k = xs[3] if prox_mode != "st" else None
        gb2_k = xs[4] if prox_mode == "csrf2" else None
        r = synthesize(z, B2m_k, sub_y=True)
        z = analyze(r, z, A2m_k, tb_k, False, gb1_k, gb2_k)
        return z, ((z, r) if return_hists else None)

    xs = (A2m[1:], B2m[1:], tbank[1:])
    if prox_mode != "st":
        xs = xs + (gbank1[1:],)
    if prox_mode == "csrf2":
        xs = xs + (gbank2[1:],)
    z, hists = lax.scan(body, z, xs)

    x2 = synthesize(z, B2m[0], sub_y=False)  # (N, nb, Cp, Lb)
    xphat = pp.depth_to_space(
        x2.reshape(N, nb, Cp, Bh, Wc).transpose(0, 2, 1, 3, 4)
        .reshape(N, Cp, Hcp, Wc)[:, :, :Hc], s, 2, C)
    z_out = (
        z.astype(jnp.float32)
        .reshape(N, nb, M, Bh, Wc).transpose(0, 2, 1, 3, 4)
        .reshape(N, M, Hcp, Wc)[:, :, :Hc]
        if return_z
        else None
    )
    if return_hists:
        zs, rs = hists
        z_hist = jnp.concatenate([z_first[None], zs], axis=0)
        return xphat, z_out, (z_hist, rs)
    return xphat, z_out
