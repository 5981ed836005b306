"""Banded whole-reverse-resident backward for big-image 2D LISTA.

Training companion to kernels/lista2d_tiled (the banded big-image forward):
big crops used to silently route training to the pure XLA path (the
whole-image reverse kernel's working set scales with L and stops fitting
VMEM past ~128^2). This kernel runs each sample's ENTIRE reverse loop in
one program — the 2D analogue of kernels/lista3d_bwd_resident, with row
BANDS playing the depth-slice role:

  - the running code cotangent dv (Mp8, L+2G) stays RESIDENT in VMEM
    across all K iterations (it is the only L-sized tensor that must);
  - the residual r_k, the analysis cotangent ds, and dx2/y2/m2 are only
    Cp rows tall, so they live as whole-image guarded-flat scratches;
  - per-iteration codes stream from HBM per BAND through a 2-slot ring
    (only ~2 x (Mp8, Bh*Wc) of the z history is ever resident);
  - all algebra is the whole-image reverse kernel's (lista2d._kernel_bwd)
    expressed on guarded flat windows: in-plane taps are lane rolls whose
    masks (acolm/smm, zero-extended into the guards) already encode the
    image borders, so band edges need no special cases — roll-backs
    simply scatter-accumulate into the guard columns and the guards of
    masks kill out-of-image contributions. (No separate row mask is
    needed: the guard zeros already kill cross-row roll wraparound.)

Weight banks ride in (K, Mp8, T*Cp) layout and dB comes back transposed,
keeping every HBM slice's lane extent 128-aligned (Mosaic rejects
M=169-lane slices; same trick as lista3d_bwd_resident). Gradients match
the XLA scan's autodiff to reassociation tolerance (interpret-mode test).

Reference: gradients of model/net.py:16-104 (CDLNet) forward semantics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from cdlnet_tpu.kernels.dma import make_dma_helpers
from cdlnet_tpu.kernels.lista2d import _axis_masks, _prep_A2m, _prep_B2m
from cdlnet_tpu.kernels.lista2d_tiled import _VMEM_BUDGET, _geometry
from cdlnet_tpu.ops import polyphase as pp


def _bwd_geometry(P, s, Hc, Wc):
    P_, pads, Qh, Qw, q_lo_h, q_lo_w, Hh = _geometry(P, s)
    T = Qh * Qw
    # guard width: one full roll span (row part +-Hh*Wc, col part < Wc)
    G = (Hh + 1) * Wc
    return pads, Qh, Qw, q_lo_h, q_lo_w, T, G


def _bwd_fits(M, C, P, s, Hc, Wc, Bh, use_mask=True, hist_bytes=None):
    """Reverse working-set estimate for the band height the FORWARD picked
    (the histories arrive banded at that Bh, so there is no separate
    choice here). Counts every VMEM resident: the explicit scratches, the
    double-buffered blocked inputs (dx2/y2[/m2] — Mosaic allocates 2 slots
    per grid-varying block), the whole-array VMEM masks, and the z ring at
    the history dtype (bf16 by default, 4 B under CDLNET_HIST_DTYPE=f32).
    use_mask defaults True so gates that don't know mask-ness stay
    conservative."""
    from cdlnet_tpu.kernels.lista2d import hist_dtype

    if hist_bytes is None:
        hist_bytes = jnp.dtype(hist_dtype()).itemsize
    pads, Qh, Qw, qlh, qlw, T, G = _bwd_geometry(P, s, Hc, Wc)
    Cp = C * s * s
    Cp8 = -(-Cp // 8) * 8
    Mp8 = -(-M // 8) * 8
    Lg = Hc * Wc + 2 * G
    Lb = Bh * Wc
    n_in = 2 + (1 if use_mask else 0)  # dx2, y2 [, m2] blocked inputs
    est = (
        Mp8 * Lg * 4                   # dv resident (guarded)
        + 2 * Cp8 * Lg * 4             # ds, r scratches (guarded)
        + n_in * 2 * Cp * Lg * 4       # double-buffered input blocks
        + (Qw + T) * Lg * 4            # guarded masks (acolm, smm)
        + T * Cp * Lb * 4              # stack / stack2 (shared)
        + Cp8 * (Lb + 2 * G) * 4       # emb scratch (guarded band window)
        + 2 * Mp8 * Lb * hist_bytes    # 2-slot z ring (hist dtype)
        + 2 * Mp8 * Lb * 4             # dz/dv band temporaries
        + 6 * Mp8 * (-(-T * Cp // 128) * 128) * 4  # bank slots + staging
    )
    return est < _VMEM_BUDGET


def lista2d_tiled_bwd_supported(M, C, P, s, K, H, W) -> bool:
    """True when the banded reverse kernel applies: stride-divisible,
    lane-aligned code rows (Wc % 128 == 0 keeps every band window, mask
    slice, and z-band DMA 128-aligned), band-divisible height (no ragged
    rows — the implicit-vm argument needs every hist row real), and the
    reverse working set fits at the band the TRAINING forward will pick
    (it runs at hist_dtype, so the pick is made at that z width too)."""
    from cdlnet_tpu.kernels.lista2d import hist_dtype
    from cdlnet_tpu.kernels.lista2d_tiled import _pick_band

    if H % s or W % s:
        return False
    Hc, Wc = H // s, W // s
    if Wc % 128:
        return False
    hb = jnp.dtype(hist_dtype()).itemsize
    Bh = _pick_band(M, C, P, s, Hc, Wc, z_bytes=hb)
    if Bh is None or Hc % Bh or (Bh * Wc) % 128:
        return False
    return _bwd_fits(M, C, P, s, Hc, Wc, Bh, hist_bytes=hb)


def _kernel_tiled_bwd(*refs, K, nb, Bh, Qh, Qw, Cp, Wc, G,
                      q_lo, r_lo, use_mask, interp):
    """Whole reverse loop for one sample. Grid (N,).

    inputs:  dx2f (1,Cp,Lg), y2f (1,Cp,Lg), [m2f (1,Cp,Lg)],
             cv (1,1,1), acolm (Qw,Lg), smm (T,Lg),
             zh ANY (K,N,Mp8,L) [hist-dtype], rh ANY (max(K-1,1),N,Cp8,Lg),
             a2m ANY (K,Mp8,Tc128), b2m ANY (K,Mp8,Tc128) [transposed]
    outputs: dA ANY (N,K,Mp8,Tc128), dB ANY (N,K,Mp8,Tc128) [transposed],
             dt VMEM revisited (K,2,Mp8)
    scratch: dv (Mp8,Lg), dsf (Cp8,Lg), rf (Cp8,Lg), stack (T*Cp,Lb),
             emb (Cp8,Lw), zring (2,Mp8,Lb), aring/bring (2,Mp8,Tc128),
             dAs/dBs (Mp8,Tc128), DMA sems
    (Tc128 = T*Cp rounded up to a 128 multiple for aligned per-k DMA)
    with L = nb*Bh*Wc, Lb = Bh*Wc, Lw = Lb+2G, Lg = L+2G. The guarded
    flat coordinate of image lane x is x+G."""
    from jax.experimental.pallas import tpu as pltpu

    i = 0
    dx2_ref = refs[i]; i += 1
    y2_ref = refs[i]; i += 1
    m2_ref = None
    if use_mask:
        m2_ref = refs[i]; i += 1
    (cv_ref, acolm_ref, smm_ref, zh_ref, rh_ref, a2m_ref,
     b2m_ref, dA_ref, dB_ref, dt_ref, dv_ref, dsf_ref, rf_ref,
     stack_ref, emb_ref, zring_ref, aring_ref, bring_ref,
     dAs_ref, dBs_ref, zsem, asem, bsem, rsem, osem) = refs[i:]

    n = pl.program_id(0)
    Lb = Bh * Wc
    Lw = Lb + 2 * G
    L = nb * Lb
    Lg = L + 2 * G
    Mp8 = dv_ref.shape[0]
    T = Qh * Qw
    cv = cv_ref[0, 0, 0]

    def roll(buf, off, width):
        return pltpu.roll(buf, (-off) % width, 1) if off % width else buf

    dcopy, dma_start, dma_wait, floop, rem2 = make_dma_helpers(interp)

    # ---------------- DMA helpers (descriptors rebuilt at wait) ----------
    def z_dma(k, b, slot):
        # interior band slice of the flat (unguarded) z history
        return dcopy(zh_ref.at[k, n, :, pl.ds(b * Lb, Lb)],
                     zring_ref.at[slot], zsem.at[slot])

    def a_dma(k, slot):
        return dcopy(a2m_ref.at[k], aring_ref.at[slot], asem.at[slot])

    def b_dma(k, slot):
        return dcopy(b2m_ref.at[k], bring_ref.at[slot], bsem.at[slot])

    def r_dma(k):
        return dcopy(rh_ref.at[k, n], rf_ref, rsem)

    # ---------------- shared tap machinery -------------------------------
    def band_win(ref, b):
        """(ch, Lw) guarded window of a guarded-flat (ch, Lg) scratch."""
        return ref[:, pl.ds(b * Lb, Lw)]

    def ana_stack_band(b, src_ref):
        """stack_t (interior extent, at window coords [G:G+Lb]) of the
        analysis window stacking, from a guarded-flat (Cp8, Lg) source.
        Mirrors lista2d._kernel_bwd.ana_stack on a band window; masks are
        applied at the stack position (guarded masks kill borders)."""
        win = band_win(src_ref, b).astype(jnp.float32)[:Cp]
        for qi in range(Qh):
            rowed = roll(win, (q_lo + qi) * Wc, Lw)
            for ri in range(Qw):
                tp = qi * Qw + ri
                shifted = roll(rowed, r_lo + ri, Lw)[:, G : G + Lb]
                stack_ref[tp * Cp : (tp + 1) * Cp] = (
                    shifted * acolm_ref[ri, pl.ds(G + b * Lb, Lb)][None, :]
                )

    def ana_adjoint_scatter(b):
        """dsf[window(b)] += stack-adjoint of stack_ref's interior —
        mirrors lista2d._kernel_bwd.ana_adjoint with the roll-backs
        spreading into the window's guard columns. The (Cp, Lb) interior
        is embedded into the guarded (Cp, Lw) extent by STORING into the
        zero-guarded emb scratch rather than jnp.pad: pad lowers to
        tpu.concatenate, whose Mosaic rule rejects the sublane-offset-4
        layout odd-tap stack slices carry (Cp=4 rows in an 8-row tile) —
        "result/input offset mismatch on non-concat dimension". Stores
        relayout the value instead."""
        acc = jnp.zeros((Cp, Lw), jnp.float32)
        for qi in range(Qh):
            inner = jnp.zeros((Cp, Lw), jnp.float32)
            for ri in range(Qw):
                tp = qi * Qw + ri
                st = stack_ref[tp * Cp : (tp + 1) * Cp]
                emb_ref[:Cp, pl.ds(G, Lb)] = (
                    st * acolm_ref[ri, pl.ds(G + b * Lb, Lb)][None, :]
                )
                inner += roll(emb_ref[:Cp], -(r_lo + ri), Lw)
            acc += roll(inner, -(q_lo + qi) * Wc, Lw)
        dsf_ref[:Cp, pl.ds(b * Lb, Lw)] += acc

    def syn_stack2_band(b):
        """stack2_t (interior extent) = roll(g*smm_t, -off_t) from the
        guarded-flat ds — mirrors lista2d._kernel_bwd.syn_stack2."""
        g = band_win(dsf_ref, b).astype(jnp.float32)[:Cp]
        for qi in range(Qh):
            for ri in range(Qw):
                tp = qi * Qw + ri
                off = (qi - (Qh - 1) - q_lo) * Wc + (ri - (Qw - 1) - r_lo)
                sm = smm_ref[tp, pl.ds(b * Lb, Lw)][None, :]
                stack_ref[tp * Cp : (tp + 1) * Cp] = (
                    roll(g * sm, -off, Lw)[:, G : G + Lb]
                )

    # ---------------- phases ---------------------------------------------
    def zero_dsf():
        dsf_ref[:] = jnp.zeros_like(dsf_ref)

    def ana_phase(k, emit_ds):
        """Per band: dAs += -dv[b] @ stack(r_k)[b]^T; ds += unroll(w[b]).
        rf must hold r_k (guarded-flat); aring slot k%2 holds A2m[k]."""
        aslot = rem2(k)
        if emit_ds:
            zero_dsf()
        dAs_ref[:] = jnp.zeros_like(dAs_ref)

        def bstep(b, _):
            dvb = dv_ref[:, pl.ds(G + b * Lb, Lb)]
            ana_stack_band(b, rf_ref)
            st_int = stack_ref[:]
            dAs_ref[:, : T * Cp] += -jax.lax.dot_general(
                dvb, st_int, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if emit_ds:
                # w = -A2m[k]^T dv[b] overwrites stack (it is dead)
                stack_ref[:] = -jax.lax.dot_general(
                    aring_ref[aslot][:, : T * Cp], dvb,
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                ana_adjoint_scatter(b)
            return 0

        floop(nb, bstep)

    def syn_phase(k_next, kb, with_base):
        """Per band: dz[b] = [dv[b] +] bank_k @ stack2(ds)[b];
        dBs += z[b] @ stack2^T; dt rows k_next; dv[b] <- 1{z!=0} dz.
        dsf holds the synthesis cotangent; bring slot kb%2 holds the
        (Mp8, T*Cp) bank; z bands stream from zh[k_next]."""
        bslot = rem2(kb)
        dBs_ref[:] = jnp.zeros_like(dBs_ref)
        if use_mask and with_base:
            dsf_ref[:Cp] *= m2_ref[0]
        # NB vm (ragged-row) masking is implicit: pad rows have z == 0 in
        # every iteration, so dv there is zeroed by the ST mask below, and
        # the guarded masks kill their stack contributions.

        def bstep(b, dtk):
            zslot = rem2(b)
            dma_wait(z_dma(k_next, b, zslot))
            if interp:
                if b + 1 < nb:
                    dma_start(z_dma(k_next, b + 1, rem2(b + 1)))
            else:
                @pl.when(b + 1 < nb)
                def _pf():
                    dma_start(z_dma(k_next, b + 1, rem2(b + 1)))
            z = zring_ref[zslot].astype(jnp.float32)
            syn_stack2_band(b)
            st_int = stack_ref[:]
            dz = jax.lax.dot_general(
                bring_ref[bslot][:, : T * Cp], st_int,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if with_base:
                dz += dv_ref[:, pl.ds(G + b * Lb, Lb)]
            dBs_ref[:, : T * Cp] += jax.lax.dot_general(
                z, st_int, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            sgn = jnp.sign(z)
            row = -jnp.sum(sgn * dz, axis=1)
            dtk = dtk + jnp.stack([row, row * cv])
            dv_ref[:, pl.ds(G + b * Lb, Lb)] = jnp.where(z != 0.0, dz, 0.0)
            return dtk

        dtk = floop(nb, bstep, jnp.zeros((2, Mp8), jnp.float32))
        dt_ref[k_next] += dtk

    def write_out(ref, staging, k, sem):
        c = dcopy(staging, ref.at[n, k], sem)
        dma_start(c)
        dma_wait(c)

    # ---------------- reverse sweep --------------------------------------
    @pl.when(n == 0)
    def _init_dt():
        dt_ref[:] = jnp.zeros_like(dt_ref)

    # dv guards stay zero (only interior band slices are ever written);
    # same for emb (ana_adjoint_scatter only ever stores its interior)
    dv_ref[:] = jnp.zeros_like(dv_ref)
    emb_ref[:] = jnp.zeros_like(emb_ref)

    # init: adjoint of the final dictionary synthesis (bank b2m[0]):
    # ds := dx2 (the final synthesize has no mask/sub_y), z = z_{K-1}
    dma_start(b_dma(0, 0))
    dma_start(z_dma(K - 1, 0, 0))
    zero_dsf()
    dsf_ref[:Cp] = dx2_ref[0].astype(jnp.float32)
    dma_wait(b_dma(0, 0))
    syn_phase(K - 1, 0, with_base=False)
    write_out(dB_ref, dBs_ref, 0, osem)

    # k = K-1 .. 1
    def rev_body(ii, _):
        k = K - 1 - ii
        dma_start(a_dma(k, rem2(k)))
        dma_start(b_dma(k, rem2(k)))
        dma_start(r_dma(k - 1))          # rh[k-1] IS r_k
        dma_wait(a_dma(k, rem2(k)))
        dma_wait(r_dma(k - 1))
        ana_phase(k, emit_ds=True)
        write_out(dA_ref, dAs_ref, k, osem)
        dma_start(z_dma(k - 1, 0, 0))
        dma_wait(b_dma(k, rem2(k)))
        syn_phase(k - 1, k, with_base=True)
        write_out(dB_ref, dBs_ref, k, osem)
        return 0

    if interp:
        for ii in range(K - 1):
            rev_body(ii, 0)
    else:
        jax.lax.fori_loop(0, K - 1, rev_body, 0)

    # k = 0: r_0 = -y2; dA only (the dz chain ends). du = +dv here: the
    # k=0 analysis consumed stack(+y2) with a NEGATED weight application
    # in the fwd formulation (r := -y2), so emit dA with r = -y2 directly.
    rf_ref[:] = jnp.zeros_like(rf_ref)
    rf_ref[:Cp] = -y2_ref[0].astype(jnp.float32)
    # no A-bank DMA here: with emit_ds=False the phase computes only
    # dA_0 = -dv @ stack(r_0)^T, which reads no weights
    ana_phase(0, emit_ds=False)
    write_out(dA_ref, dAs_ref, 0, osem)


def lista2d_tiled_fused_bwd(dxp, yp, A, B, t, c, mask, z_hist, r_hist,
                            stride=1, interpret=False, band=None):
    """Backward companion to lista2d_tiled(..., return_hists=True).

    dxp: cotangent of xphat (N, C, H, W); z_hist (K, N, nb, M, Lb) and
    r_hist (K-1, N, nb, Cp, Lb) in the forward's banded layout. Returns
    (dA, dB, dt) in torch weight layouts. Input/sigma/mask cotangents are
    zero by construction (parameter-only training gradients)."""
    from jax.experimental.pallas import tpu as pltpu

    N, C, H, W = yp.shape
    K, M = A.shape[0], A.shape[1]
    P = A.shape[-2:]
    s = stride
    Hc, Wc = H // s, W // s
    Cp = C * s * s
    Cp8 = -(-Cp // 8) * 8
    Mp8 = -(-M // 8) * 8
    pads, Qh, Qw, q_lo, r_lo, T, G = _bwd_geometry(P, s, Hc, Wc)
    # the band height is the FORWARD's pick — read it off the history
    nb = z_hist.shape[2]
    Lb = z_hist.shape[-1]
    Bh = Lb // Wc
    assert nb * Bh == Hc and Lb == Bh * Wc, (
        "band geometry must match the forward's (gate on "
        "lista2d_tiled_bwd_supported)")
    del band
    L = nb * Lb
    Lg = L + 2 * G

    A2m, vjpA = jax.vjp(lambda Aw: _prep_A2m(Aw, s, pads, T, Cp), A)
    B2m, vjpB = jax.vjp(lambda Bw: _prep_B2m(Bw, s, pads, T, Cp), B)
    # banks in (K, Mp8, Tc128) layout: M stays on sublanes everywhere and
    # the tap axis is zero-padded up to a 128 multiple — per-k HBM DMA
    # slices need 128-aligned lane extents (T*Cp = 64 at P=7/s=2 is not;
    # Mosaic: "Slice shape along dimension 2 must be aligned to tiling
    # (128)"). In-kernel dots slice the rings back to [:, :T*Cp].
    Tc = T * Cp
    Tc128 = -(-Tc // 128) * 128
    A2mt = jnp.pad(
        A2m.astype(jnp.float32), ((0, 0), (0, Mp8 - M), (0, Tc128 - Tc))
    )
    B2mt = jnp.pad(
        B2m.astype(jnp.float32).transpose(0, 2, 1),
        ((0, 0), (0, Mp8 - M), (0, Tc128 - Tc)),
    )

    def to_flat_guarded(x4, ch, chp):
        """(N, Cp, Hc, Wc) -> (N, chp, L + 2G) zero-guarded flat."""
        flat = x4.reshape(N, ch, L)
        flat = jnp.pad(flat, ((0, 0), (0, chp - ch), (G, G)))
        return flat.astype(jnp.float32)

    y2f = to_flat_guarded(pp.space_to_depth(yp, s, 2), Cp, Cp)
    dx2f = to_flat_guarded(pp.space_to_depth(dxp, s, 2), Cp, Cp)
    use_mask = mask is not None
    ops_mask = []
    if use_mask:
        m2f = to_flat_guarded(
            pp.space_to_depth(jnp.broadcast_to(mask, yp.shape), s, 2), Cp, Cp)
        ops_mask = [m2f]

    # flat z history (rows padded to Mp8 for aligned band DMA slices);
    # r history guarded-flat (whole-image DMA per iteration)
    zh = (
        z_hist.transpose(1, 0, 3, 2, 4)  # (N, K, M, nb, Lb)
        .reshape(N, K, M, L)
        .transpose(1, 0, 2, 3)
    )
    zh = jnp.pad(zh, ((0, 0), (0, 0), (0, Mp8 - M), (0, 0)))
    if K > 1:
        rh = (
            r_hist.transpose(1, 0, 3, 2, 4)
            .reshape(N, K - 1, Cp, L)
            .transpose(1, 0, 2, 3)
        )
        rh = jnp.pad(rh, ((0, 0), (0, 0), (0, Cp8 - Cp), (G, G)))
        rh = rh.astype(jnp.float32)
    else:
        rh = jnp.zeros((1, N, Cp8, Lg), jnp.float32)

    # whole-image masks on the guarded flat (guards zero -> borders and
    # band edges need no special-casing in the kernel)
    acolm = jnp.pad(
        jnp.asarray(_axis_masks([r_lo + ri for ri in range(Qw)], Hc, Wc, 1)),
        ((0, 0), (G, G)))
    acol_s = jnp.asarray(
        _axis_masks([ri - (Qw - 1) - r_lo for ri in range(Qw)], Hc, Wc, 1))
    arow_s = jnp.asarray(
        _axis_masks([qi - (Qh - 1) - q_lo for qi in range(Qh)], Hc, Wc, 0))
    smm = jnp.pad(
        (arow_s[:, None, :] * acol_s[None, :, :]).reshape(T, Hc * Wc),
        ((0, 0), (G, G)))

    c_arr = jnp.asarray(c, jnp.float32).reshape(-1)
    if c_arr.size == 1:
        c_arr = jnp.broadcast_to(c_arr, (N,))
    cv = c_arr.reshape(N, 1, 1)

    kern = functools.partial(
        _kernel_tiled_bwd, K=K, nb=nb, Bh=Bh, Qh=Qh, Qw=Qw, Cp=Cp, Wc=Wc,
        G=G, q_lo=q_lo, r_lo=r_lo, use_mask=use_mask, interp=interpret,
    )
    nblk = lambda ch: pl.BlockSpec((1, ch, Lg), lambda n: (n, 0, 0),
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
                pl.BlockSpec((1, 1, 1), lambda n: (n, 0, 0),
                             memory_space=pltpu.VMEM),   # cv
                full, full,                              # acolm, smm
                anyspace, anyspace, anyspace, anyspace,  # zh, rh, a2m, b2m
            ]
        ),
        out_specs=[
            anyspace,
            anyspace,
            pl.BlockSpec((K, 2, Mp8), lambda n: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, K, Mp8, Tc128), jnp.float32),
            jax.ShapeDtypeStruct((N, K, Mp8, Tc128), jnp.float32),
            jax.ShapeDtypeStruct((K, 2, Mp8), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((Mp8, Lg), jnp.float32),          # dv (guarded)
            pltpu.VMEM((Cp8, Lg), jnp.float32),          # ds (guarded)
            pltpu.VMEM((Cp8, Lg), jnp.float32),          # r  (guarded)
            pltpu.VMEM((T * Cp, Lb), jnp.float32),       # stack/w/stack2
            pltpu.VMEM((Cp8, Lb + 2 * G), jnp.float32),  # emb (guarded)
            pltpu.VMEM((2, Mp8, Lb), z_hist.dtype),      # z band ring
            pltpu.VMEM((2, Mp8, Tc128), jnp.float32),    # A bank ring
            pltpu.VMEM((2, Mp8, Tc128), jnp.float32),    # B bank ring
            pltpu.VMEM((Mp8, Tc128), jnp.float32),       # dA staging
            pltpu.VMEM((Mp8, Tc128), jnp.float32),       # dB staging
            pltpu.SemaphoreType.DMA((2,)),               # z
            pltpu.SemaphoreType.DMA((2,)),               # A
            pltpu.SemaphoreType.DMA((2,)),               # B
            pltpu.SemaphoreType.DMA(()),                 # r
            pltpu.SemaphoreType.DMA(()),                 # out
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        interpret=interpret,
    )(dx2f, y2f, *ops_mask, cv, acolm, smm, zh, rh, A2mt, B2mt)

    dA2m = jnp.sum(outs[0], axis=0)[:, :M, :Tc]          # (K, M, T*Cp)
    dB2m = (
        jnp.sum(outs[1], axis=0)[:, :M, :Tc].transpose(0, 2, 1)
    )  # (K, T*Cp, M)
    dt01 = outs[2]

    dA = vjpA(dA2m)[0]
    dB = vjpB(dB2m)[0]
    dt = jnp.stack([dt01[:, 0, :M], dt01[:, 1, :M]], axis=1)[..., None, None]
    return dA.astype(A.dtype), dB.astype(B.dtype), dt.astype(t.dtype)
