"""Fused Pallas TPU kernel for the K-iteration 2D LISTA loop.

The reference's hot loop (model/net.py:85-87) round-trips the sparse code
z (M subbands, the largest tensor in the model) through HBM several times
per iteration. This kernel keeps z resident in VMEM for ALL K iterations:
per image, HBM traffic is one read of the inputs/weights and one write of
the outputs, regardless of K.

Formulation (matches ops/polyphase.py exactly):
  - work in the stride-phase domain: y2 = space_to_depth(yp) with
    Cp = C*s^2 channels, code grid (Hc, Wc) = (H/s, W/s), L = Hc*Wc;
  - both convs become T = Qh*Qw per-tap matmuls over the flattened spatial
    axis: tap windows are lane-rolls of the flat (channels, L) buffers with
    precomputed border masks (zero padding semantics);
  - analysis: the T rolled residual windows (Cp, L) are stacked to
    (T*Cp, L) and hit with one (M, T*Cp) matmul — contraction T*Cp (64 for
    P=7, s=2, C=1) instead of the starved C=1 of the direct conv;
  - synthesis: ONE (T*Cp, M) x (M, L) matmul (64+ output rows vs T
    separate Cp-row dots that starve the MXU's output dimension), per-tap
    output slices lane-rolled and border-masked into the accumulator;
  - soft-threshold on the VPU — or, for the frame-recurrent CSR models,
    the prox_CSR / prox_CSR_f2 temporal proxes (pure elementwise work on
    VMEM-resident neighbor-frame codes; see lista2d_fused's prox modes).

Grid = batch; one program owns one image. VMEM budget ~ (2M + T*Cp + 3Cp)
* L * 4B + 2*K*M*T*Cp*4B; lista2d_fused_supported() checks it. fp32
throughout.

Training is fully fused too: lista2d_fused(return_hist=True) streams each
iteration's code z_k and residual r_k to HBM via async DMA (staged through
a sublane-aligned buffer), and _kernel_bwd runs the hand-written reverse
loop VMEM-resident — see kernels/autodiff.lista2d_fused_diff for the
custom-VJP wiring and the measured 6.6x gradient speedup over the XLA
scan's autodiff.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from cdlnet_tpu.ops import polyphase as pp

# Hard VMEM capacity on this part is 128 MB (compiler-verified). The
# Mosaic peak exceeds the analytic estimate by a shape-dependent factor
# (measured 1.78x for a single BSD68-size image — compiled fine at 72 MB
# estimated — and 2.12x for a folded batch): single images gate at 1.75x,
# the batch-folding path at 2.2x, and serve.Denoiser catches a compile
# OOM on odd shapes and rebuilds on the XLA path.
_VMEM_CAPACITY = 128 * 1024 * 1024
_PEAK_FACTOR = 1.75


def _tap_geometry(P, pads, s):
    """Static tap offsets/masks for both convs on the flat (Hc*Wc) axis."""
    q_lo_h, q_hi_h = pp._tap_ranges(P[0], pads[0], s)
    q_lo_w, q_hi_w = pp._tap_ranges(P[1], pads[1], s)
    Qh, Qw = q_hi_h - q_lo_h + 1, q_hi_w - q_lo_w + 1
    ana, syn = [], []
    for qi in range(Qh):
        for ri in range(Qw):
            ana.append((q_lo_h + qi, q_lo_w + ri))
            syn.append((qi - q_hi_h, ri - q_hi_w))
    return (Qh, Qw), ana, syn


def _axis_masks(offs, Hc, Wc, axis, dtype=np.float32, period=None):
    """Per-offset flat (Hc*Wc,) validity masks along one axis (axis=0 rows:
    i+off in range; axis=1 cols: j+off in range), broadcast over the other.

    period (rows only): treat the H axis as `Hc/period` stacked images of
    `period` rows each — a window is valid only within its own image, so a
    batch folded into one tall image cannot bleed across image boundaries.
    """
    i = np.arange(Hc)[:, None]
    j = np.arange(Wc)[None, :]
    out = []
    for off in offs:
        if axis == 0:
            ip = i if period is None else i % period
            lim = Hc if period is None else period
            m = np.broadcast_to((ip + off >= 0) & (ip + off < lim), (Hc, Wc))
        else:
            m = np.broadcast_to((j + off >= 0) & (j + off < Wc), (Hc, Wc))
        out.append(m.reshape(-1))
    return np.asarray(out, dtype)


def _prep_A2m(A, s, pads, T, Cp):
    """Polyphase analysis bank in kernel layout (K, M, T*Cp), tap-major
    (q, r, cp) rows — SHARED by forward and backward so their gradients
    can never desynchronize from a one-sided layout change."""
    K, M = A.shape[0], A.shape[1]
    A2, _, _, _ = pp.polyphase_weights(A, s, pads, 2)   # (K, M, Cp, Qh, Qw)
    return A2.transpose(0, 1, 3, 4, 2).reshape(K, M, T * Cp)


def _prep_B2m(B, s, pads, T, Cp):
    """Polyphase synthesis bank, rows (tap, cp)-major: (K, T*Cp, M)."""
    K, M = B.shape[0], B.shape[1]
    _, B2t, _, _ = pp.polyphase_weights(B, s, pads, 2)
    return B2t.transpose(0, 3, 4, 2, 1).reshape(K, T * Cp, M)


def _masks_and_crow(P, pads, s, Hc, Wc, c_full, N, period):
    """All static border masks + the per-lane noise-scale rows (crow) for
    one kernel invocation — shared by forward and backward."""
    L = Hc * Wc
    (Qh, Qw), _, _ = _tap_geometry(P, pads, s)
    q_lo_h, _ = pp._tap_ranges(P[0], pads[0], s)
    q_lo_w, _ = pp._tap_ranges(P[1], pads[1], s)
    acolm = jnp.asarray(_axis_masks([q_lo_w + ri for ri in range(Qw)], Hc, Wc, 1))
    arowm = jnp.asarray(
        _axis_masks([q_lo_h + qi for qi in range(Qh)], Hc, Wc, 0, period=period)
    )
    scolm = jnp.asarray(
        _axis_masks([ri - (Qw - 1) - q_lo_w for ri in range(Qw)], Hc, Wc, 1)
    )
    srowm = jnp.asarray(
        _axis_masks([qi - (Qh - 1) - q_lo_h for qi in range(Qh)], Hc, Wc, 0,
                    period=period)
    )
    # combined per-tap synthesis masks, rows (qi, ri)-major
    smm = (srowm[:, None, :] * scolm[None, :, :]).reshape(Qh * Qw, L)
    if period is None:
        if c_full.size == 1:
            c_full = jnp.broadcast_to(c_full, (N,))
        crow = jnp.broadcast_to(c_full[:, None, None], (N, 1, L))
    else:
        n_img = Hc // period
        if c_full.size == 1:
            c_full = jnp.broadcast_to(c_full, (n_img,))
        assert c_full.size == n_img, (c_full.size, n_img)
        crow = jnp.repeat(c_full, period * Wc).reshape(1, 1, L)
    return acolm, arowm, smm, crow.astype(jnp.float32)


def _estimate_bytes(M, C, P, s, K, H, W, return_z=False, n_codes=0,
                    hist=False) -> int:
    """Approximate VMEM bytes for a padded H x W input (fp32): scratch z/u
    (2M*L) + window stack (T*Cp*L) + residual (Cp*L); resident weights;
    masks; double-buffered blocked in/out; n_codes extra VMEM-resident
    neighbor-code inputs (CSR prox modes); hist the training forward's
    2-slot history staging ring. The Mosaic compiler's actual peak runs
    up to ~2x this (measured) — callers apply their own margin.
    """
    P = (P, P) if isinstance(P, int) else tuple(P)
    pads = ((P[0] - 1) // 2, (P[1] - 1) // 2)
    (Qh, Qw), _, _ = _tap_geometry(P, pads, s)
    T, Cp, L = Qh * Qw, C * s * s, (H // s) * (W // s)
    scratch = (2 * M + T * Cp + Cp) * L * 4
    weights = 2 * K * M * T * Cp * 4
    masks = 2 * (Qh + Qw) * L * 4
    blocked_in = 2 * (2 * Cp * L + K * M) * 4  # y2 + mask placeholder + tau
    blocked_in += n_codes * 2 * M * L * 4      # z_prev / z_after blocks
    blocked_out = 2 * Cp * L * 4 + (2 * M * L * 4 if return_z else 0)
    staging = 0
    if hist:
        Mp8, Rp8 = -(-M // 8) * 8, -(-Cp // 8) * 8
        rows = (2 * Mp8 if n_codes else Mp8) + Rp8
        staging = 2 * rows * L * jnp.dtype(hist_dtype()).itemsize
    return scratch + weights + masks + blocked_in + blocked_out + staging


def lista2d_fused_supported(M, C, P, s, K, H, W, return_z=False,
                            n_codes=0, hist=False) -> bool:
    """True when the fused kernel fits VMEM for a padded H x W input.

    Lane-unaligned code widths (Wc % 128 != 0) gate with a much larger
    margin: at BSD68-like 322x482 (Wc=241) the compiler's register
    allocator spilled 84 MB on top of a 63 MB estimate (measured OOM at
    156 MB), so those shapes route to the banded kernel instead."""
    if H % s or W % s:
        return False
    est = _estimate_bytes(M, C, P, s, K, H, W, return_z, n_codes=n_codes,
                          hist=hist)
    factor = _PEAK_FACTOR if (W // s) % 128 == 0 or est < 32 * 1024 * 1024 \
        else 2.75
    return est * factor < _VMEM_CAPACITY


def _kernel(y2_ref, m2_ref, tbank_ref, crow_ref, A2m_ref, B2m_ref, acolm_ref,
            arowm_ref, smm_ref, *out_and_scratch, K, Cp, Wc, Qh, Qw,
            q_lo, r_lo, use_mask, return_z, prox="st", hist=False,
            interp=False):
    gam1_ref = gam2_ref = zp_ref = za_ref = None
    refs = list(out_and_scratch)
    if prox == "csr":
        gam1_ref, zp_ref = refs[:2]
        refs = refs[2:]
    elif prox == "csrf2":
        gam1_ref, gam2_ref, zp_ref, za_ref = refs[:4]
        refs = refs[4:]
    x2_ref = refs.pop(0)
    z_out_ref = refs.pop(0) if return_z else None
    hist_ref = refs.pop(0) if hist else None
    z_ref, u_ref, r_ref, stack_ref = refs[:4]
    zs_ref = refs[4] if hist else None   # sublane-aligned DMA staging copy
    hsem = refs[5] if hist else None
    """One image. Shapes (leading grid dim already sliced to 1):
      y2 (1, Cp, L)   m2 (1, Cp, L)    tbank (K, 2, M)   crow (1, 1, L)
      A2m (K, M, T*Cp)   B2m (K, T*Cp, M)  [T = Qh*Qw, rows tap-major (q, r)]

    Thresholds are formed in-kernel as tau_k = t0[k] + t1[k] * crow, where
    crow carries the per-LANE noise scale c (reference model/net.py:83
    tau_k = t[k,0] + sigma/255 * t[k,1]): constant per program for one
    image, or varying by folded-image row block — which is what makes
    batch folding exact for per-sample sigma (training, blind eval).
      analysis col masks (Qw, L) / row masks (Qh, L); smm (T, L) combined
      synthesis masks (srow*scol per tap)
      outputs x2 (1, Cp, L), z_out (1, M, L)
      scratch: z (M, L), u (M, L), r (Cp, L), stack (T*Cp, L)

    Analysis tap windows are factored into column then row shifts
    (roll_flat(q*Wc + r) == roll(q*Wc) after roll(r), column mask killing
    row-wrap artifacts, row mask killing top/bottom wrap). The synthesis
    runs all T taps as ONE (T*Cp, M) x (M, L) dot into the stack scratch
    and rolls/masks the per-tap OUTPUT slices instead of the (M, L) z
    buffer — the roll and the Wc-periodic masks commute with the
    lane-pointwise contraction (see kernels/lista3d._kernel_syn).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # DEFAULT precision: TPU fp32 dots run as bf16 passes with fp32
    # accumulation. Measured end-to-end deviation vs the XLA path is ~1e-4
    # RMS on O(1) codes after K=30 iterations (<0.01 dB on denoising PSNR);
    # HIGHEST would triple the MXU passes and OOM VMEM on operand splits.
    HIGH = jax.lax.Precision.DEFAULT
    y2 = y2_ref[0]
    L = y2_ref.shape[-1]

    def roll(buf, off):
        return pltpu.roll(buf, (-off) % L, 1) if off % L else buf

    def synthesis(k, out_ref):
        """out_ref <- sum_t B2m[k, t] @ window_t(z), taps (q, r) with
        offsets (q - q_hi, r - r_hi), as one full-width dot + output
        rolls. stack_ref doubles as the dot buffer (not live here)."""
        stack_ref[:] = jax.lax.dot_general(
            B2m_ref[k], z_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=HIGH,
        )
        acc = jnp.zeros_like(out_ref[:])
        for qi in range(Qh):
            for ri in range(Qw):
                tp = qi * Qw + ri
                off = (qi - (Qh - 1) - q_lo) * Wc + (ri - (Qw - 1) - r_lo)
                acc += roll(stack_ref[tp * Cp : (tp + 1) * Cp], off) * smm_ref[tp][None, :]
        out_ref[:] = acc

    def analysis_stack(buf):
        """Stack the T windows of buf (Cp, L), offsets (q_lo + q, r_lo + r)."""
        for qi in range(Qh):
            rowed = roll(buf, (q_lo + qi) * Wc) * arowm_ref[qi][None, :]
            for ri in range(Qw):
                t = qi * Qw + ri
                stack_ref[t * Cp : (t + 1) * Cp] = (
                    roll(rowed, r_lo + ri) * acolm_ref[ri][None, :]
                )

    def _soft(u, thr):
        return jnp.sign(u) * jnp.maximum(jnp.abs(u) - thr, 0.0)

    crow = crow_ref[0, 0][None, :]

    def _thr(bank_ref, k):
        return bank_ref[k, 0][:, None] + bank_ref[k, 1][:, None] * crow

    def st(u, k):
        """Per-iteration proximal step. "st" is plain soft-thresholding;
        "csr"/"csrf2" are the temporal-consistency proxes pulling the code
        toward VMEM-resident neighbor-frame codes (core/ops.py::prox_csr
        / prox_csr_f2; reference model/net.py:229-262) — all elementwise,
        so the CSR variants cost only VPU work on top of the same dots."""
        tau = _thr(tbank_ref, k)
        if prox == "st":
            return _soft(u, tau)
        if prox == "csr":
            gam = _thr(gam1_ref, k)
            zp = zp_ref[0]
            shift = zp + tau * jnp.sign(zp)
            return _soft(_soft(u - shift, tau * gam) + shift, tau)
        g1 = _thr(gam1_ref, k)
        g2 = _thr(gam2_ref, k)
        zp, za = zp_ref[0], za_ref[0]
        Ca = zp + tau * jnp.sign(zp) + tau * g2 * jnp.sign(zp - za)
        Cb = za + tau * jnp.sign(za) + tau * g1 * jnp.sign(za - zp)
        inner = _soft(u - Ca, g1 * tau)
        corr = tau * g1 * jnp.sign(u - Ca)
        midder = _soft(inner - Cb + corr, g2 * tau)
        return _soft(midder + Cb - corr, tau)

    # Per-iteration history to HBM (backward residuals): rows [0:M) carry
    # the code z_k, rows [Mp8:Mp8+Cp) the residual r_k (so the backward
    # never recomputes the forward iteration — see _kernel_bwd). The CSR
    # prox modes additionally store the prox ARGUMENT u_k in rows
    # [Mp8:Mp8+M) (residual moves up to [2*Mp8:...)): the two-sided prox's
    # sign(u - Ca) is NOT reconstructable from the output code where the
    # inner threshold clipped, and the backward re-derives every prox
    # internal from u exactly. The copy is staged through zs (rows padded
    # to the sublane tile — Mosaic requires aligned HBM slices), a 2-SLOT
    # ring: iteration k writes slot k%2 and waits iteration k-2's DMA, so
    # each history copy gets a full iteration of compute to drain instead
    # of one synthesis phase (single-buffered staging measured +0.6 ms of
    # stall on the 10x128^2 flagship-2D training forward). Interpret mode
    # (CPU tests) has no DMA engine — plain stores instead.
    hist_u = hist and prox != "st"
    Mp8 = -(-z_ref.shape[0] // 8) * 8 if hist else 0
    r_row0 = 2 * Mp8 if hist_u else Mp8
    zs_rows = zs_ref.shape[0] // 2 if hist else 0

    def _slot_off(k):
        kk = k % 2 if isinstance(k, int) else jax.lax.rem(k, 2)
        return kk * zs_rows

    def hist_stage(k):
        off = _slot_off(k)
        zs_ref[pl.ds(off, z_ref.shape[0])] = z_ref[:].astype(zs_ref.dtype)

    def hist_dma(k):
        n = pl.program_id(0)
        off = _slot_off(k)
        if interp:
            class _Store:  # "start" = synchronous store, "wait" = no-op
                def start(self_):
                    hist_ref[n, k] = zs_ref[off : off + zs_rows]

                def wait(self_):
                    pass

            return _Store()
        sk = k % 2 if isinstance(k, int) else jax.lax.rem(k, 2)
        return pltpu.make_async_copy(
            zs_ref.at[pl.ds(off, zs_rows)], hist_ref.at[n, k], hsem.at[sk]
        )

    # --- k = 0: z = ST(A0 y, tau0) ---
    analysis_stack(y2)
    u_ref[:] = jax.lax.dot_general(
        A2m_ref[0], stack_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=HIGH,
    )
    if hist_u:
        zs_ref[Mp8 : Mp8 + z_ref.shape[0]] = u_ref[:].astype(zs_ref.dtype)
    z_ref[:] = st(u_ref[:], 0)
    if hist:
        hist_stage(0)
        hist_dma(0).start()

    # --- k = 1..K-1 (k=1 hoisted statically: ring slot 1's first use
    # needs no wait; the fori body then waits k-2 unconditionally) ---
    def body(k, _, first=False):
        synthesis(k, r_ref)
        r_ref[:] = (m2_ref[0] * r_ref[:] - y2) if use_mask else (r_ref[:] - y2)
        if hist:
            if not first:
                hist_dma(k - 2).wait()
            zs_ref[pl.ds(_slot_off(k) + r_row0, Cp)] = r_ref[:].astype(
                zs_ref.dtype)
        analysis_stack(r_ref[:])
        u_ref[:] = jax.lax.dot_general(
            A2m_ref[k], stack_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=HIGH,
        )
        u_ref[:] = z_ref[:] - u_ref[:]      # the prox argument
        if hist_u:
            zs_ref[pl.ds(_slot_off(k) + Mp8, z_ref.shape[0])] = u_ref[
                :].astype(zs_ref.dtype)
        z_ref[:] = st(u_ref[:], k)
        if hist:
            hist_stage(k)
            hist_dma(k).start()
        return 0

    if K > 1:
        body(1, 0, first=True)
    if hist and interp:
        # interpret mode: fori_loop + ref mutation trips a jax lowering
        # bug (KeyError on closed_call); K is static, so unroll
        for k in range(2, K):
            body(k, 0)
    else:
        jax.lax.fori_loop(2, K, body, 0)

    # --- final dictionary synthesis with B[0] ---
    synthesis(0, r_ref)
    x2_ref[0] = r_ref[:]
    if return_z:
        z_out_ref[0] = z_ref[:]
    if hist:
        for s_ in range(min(2, K)):  # drain the last DMA per ring slot
            hist_dma(K - 1 - s_).wait()


def _kernel_bwd(*refs, K, Cp, Wc, Qh, Qw, q_lo, r_lo, use_mask, interp,
                prox="st", has_dzq=False):
    """Fused backward of the K-iteration 2D LISTA loop (prox="st").

    One program per image; the reverse loop is statically unrolled (K is
    static) and VMEM-resident like the forward. Residuals come from the
    forward\'s history rows — per-iteration codes z_k AND residuals r_k —
    streamed back from HBM through a 3-slot buffer (each history row is
    live for two consecutive reverse steps: first as z_k, then as
    z_{k-1}), so no part of the forward is ever recomputed. The ST
    subgradient needs no thresholds either: z_k = sign(v_k)(|v_k|-tau)+
    means sign(z_k) IS sign(v_k)*1{active}, so

      dv       = dz_k * 1{z_k != 0}
      dt[k,0] -= sum_L sign(z_k) dz_k;  dt[k,1] -= ... * crow
      dA2m[k] -= dv @ stack(r_k)^T                  (du = -dv)
      dstack   = -A2m[k]^T @ dv
      dr       = stack-adjoint(dstack);  ds = m2 * dr (masked)
      dz_{k-1} = dv + syn-adjoint_z(ds, B2m[k])
      dB2m[k] += stack2(ds) @ z_{k-1}^T

    where stack2(g)_t = roll(g * smm_t, -off_t) is the adjoint of the
    synthesis roll-out and syn-adjoint_z(g) = B2m[k]^T-contraction of
    stack2(g) (the transpose of the forward\'s single merged dot). Four
    dots per step, all MXU-shaped: the two weight-gradient dots contract
    over L (thousands), the two data dots over M or T*Cp. Weight /
    threshold gradients accumulate across the (sequential) grid into
    revisited output blocks, zero-initialized at program 0.

    prox="csr"/"csrf2" (frame-recurrent CSR training, reference
    traincsr.py + model/net.py:229-262): the ST subgradient is replaced
    by the full prox_CSR / prox_CSR_f2 adjoint — every prox internal is
    recomputed exactly from the stored prox ARGUMENT u_k (history rows
    [Mp8:Mp8+M)) and the VMEM-resident neighbor codes — and the kernel
    additionally emits dgamma threshold banks and the dz_prev / dz_after
    cotangents (summed over iterations) that the frame recurrence
    backpropagates. has_dzq seeds the reverse with the cotangent of the
    RETURNED code z_{K-1} (the next frame's carried-code chain).

    refs layout: dx2, y2, m2, crow, [tbank, g1bank, (g2bank)], [dzq],
    [zp, (za)], A2m, B2m, acolm, arowm, smm, hist  ||  dA, dB, dt,
    [dg1, (dg2), dzp, (dza)]  ||  dz, dv, r, stack, zb, sems.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    refs = list(refs)
    dx2_ref, y2_ref, m2_ref, crow_ref = refs[:4]
    refs = refs[4:]
    tb_ref = g1b_ref = g2b_ref = dzq_ref = zp_ref = za_ref = None
    if prox != "st":
        tb_ref, g1b_ref = refs[:2]
        refs = refs[2:]
        if prox == "csrf2":
            g2b_ref, refs = refs[0], refs[1:]
    if has_dzq:
        dzq_ref, refs = refs[0], refs[1:]
    if prox != "st":
        zp_ref, refs = refs[0], refs[1:]
        if prox == "csrf2":
            za_ref, refs = refs[0], refs[1:]
    (A2m_ref, B2m_ref, acolm_ref, arowm_ref, smm_ref, hist_ref,
     dA_ref, dB_ref, dt_ref) = refs[:9]
    refs = refs[9:]
    dg1_ref = dg2_ref = dzp_ref = dza_ref = None
    if prox != "st":
        dg1_ref, refs = refs[0], refs[1:]
        if prox == "csrf2":
            dg2_ref, refs = refs[0], refs[1:]
        dzp_ref, refs = refs[0], refs[1:]
        if prox == "csrf2":
            dza_ref, refs = refs[0], refs[1:]
    dz_ref, dv_ref, r_ref, stack_ref, zb_ref, sems = refs

    HIGH = jax.lax.Precision.DEFAULT
    n = pl.program_id(0)
    L = y2_ref.shape[-1]
    y2 = y2_ref[0]
    dx2 = dx2_ref[0].astype(jnp.float32)
    crow = crow_ref[0, 0][None, :]
    M = A2m_ref.shape[1]
    Mp8 = -(-M // 8) * 8
    hist_u = prox != "st"
    r_row0 = 2 * Mp8 if hist_u else Mp8

    def roll(buf, off):
        return pltpu.roll(buf, (-off) % L, 1) if off % L else buf

    def dot(a, b, dims):
        return jax.lax.dot_general(
            a, b, (dims, ((), ())),
            preferred_element_type=jnp.float32, precision=HIGH,
        )

    @pl.when(n == 0)
    def _init():
        dA_ref[:] = jnp.zeros_like(dA_ref)
        dB_ref[:] = jnp.zeros_like(dB_ref)
        dt_ref[:] = jnp.zeros_like(dt_ref)
        if dg1_ref is not None:
            dg1_ref[:] = jnp.zeros_like(dg1_ref)
        if dg2_ref is not None:
            dg2_ref[:] = jnp.zeros_like(dg2_ref)

    # the neighbor-code cotangents are per-image blocks — zero each program
    if dzp_ref is not None:
        dzp_ref[0] = jnp.zeros_like(dzp_ref[0])
    if dza_ref is not None:
        dza_ref[0] = jnp.zeros_like(dza_ref[0])

    def _soft(u, thr):
        return jnp.sign(u) * jnp.maximum(jnp.abs(u) - thr, 0.0)

    def prox_adjoint(k, slot):
        """Adjoint of z_k = prox(u_k) at iteration k: writes the prox
        argument's cotangent into dv_ref and accumulates the
        threshold-bank rows (dt, dgamma) and the neighbor-code
        cotangents. Every prox internal is recomputed exactly from the
        stored u_k; sign() is treated as locally constant (zero gradient
        a.e.), matching jax.grad of core/ops.py::prox_csr(_f2).

        The CSR branches run in 64-row subband blocks: the two-sided
        adjoint holds ~25 (rows, L) fp32 temporaries live, and full-M
        blocks at M=169 measured a 6x VMEM-pressure slowdown (12.2 vs
        2.0 ms per apply at 128^2) that row-chunking removes."""
        if prox == "st":
            zk = z_of(slot)
            gct = dz_ref[:]
            sgn = jnp.sign(zk)
            dv_ref[:] = jnp.where(zk != 0.0, gct, 0.0)
            dt_ref[k, 0] += -jnp.sum(sgn * gct, axis=1)
            dt_ref[k, 1] += -jnp.sum(sgn * gct * crow, axis=1)
            return
        for r0 in range(0, M, 64):
            r1 = min(M, r0 + 64)
            zk = zb_ref[slot][r0:r1].astype(jnp.float32)
            uk = zb_ref[slot][Mp8 + r0 : Mp8 + r1].astype(jnp.float32)
            gct = dz_ref[r0:r1]
            tau = (tb_ref[k, 0][r0:r1][:, None]
                   + tb_ref[k, 1][r0:r1][:, None] * crow)
            g1v = (g1b_ref[k, 0][r0:r1][:, None]
                   + g1b_ref[k, 1][r0:r1][:, None] * crow)
            m_o = (zk != 0.0).astype(jnp.float32)
            s_o = jnp.sign(zk)
            gw = gct * m_o
            if prox == "csr":
                zp = zp_ref[0, r0:r1].astype(jnp.float32)
                s_zp = jnp.sign(zp)
                shift = zp + tau * s_zp
                inner = _soft(uk - shift, tau * g1v)
                m_i = (inner != 0.0).astype(jnp.float32)
                s_i = jnp.sign(inner)
                du = gw * m_i
                dsh = gw * (1.0 - m_i)
                dtau = -s_o * gw + s_zp * dsh - g1v * s_i * du
                dg1 = -tau * s_i * du
                dzp_ref[0, r0:r1] += dsh
                dv_ref[r0:r1] = du
            else:
                # csrf2 (core/ops.py::prox_csr_f2; model/net.py:244-262)
                g2v = (g2b_ref[k, 0][r0:r1][:, None]
                       + g2b_ref[k, 1][r0:r1][:, None] * crow)
                zp = zp_ref[0, r0:r1].astype(jnp.float32)
                za = za_ref[0, r0:r1].astype(jnp.float32)
                s_zp, s_za = jnp.sign(zp), jnp.sign(za)
                s_pa = jnp.sign(zp - za)
                s_ap = -s_pa
                Ca = zp + tau * s_zp + tau * g2v * s_pa
                Cb = za + tau * s_za + tau * g1v * s_ap
                uCa = uk - Ca
                s_uca = jnp.sign(uCa)
                inner = _soft(uCa, g1v * tau)
                m_i = (inner != 0.0).astype(jnp.float32)
                s_i = jnp.sign(inner)
                corr = tau * g1v * s_uca
                midder = _soft(inner - Cb + corr, g2v * tau)
                m_m = (midder != 0.0).astype(jnp.float32)
                s_m = jnp.sign(midder)
                # out = ST(midder + Cb - corr, tau)
                dtau = -s_o * gw
                gx = gw * m_m             # ct on (inner - Cb + corr)
                dtau += -g2v * s_m * gx
                dg2 = -tau * s_m * gx
                g_i = gx * m_i            # ct on (u - Ca)
                dtau += -g1v * s_i * g_i
                dg1 = -tau * s_i * g_i
                du = g_i
                dCa = -g_i
                dcorr = gx - gw           # +gx midder arg, -gw out arg
                dtau += g1v * s_uca * dcorr
                dg1 += tau * s_uca * dcorr
                dCb = gw - gx             # +gw out arg, -gx midder arg
                dzp_ref[0, r0:r1] += dCa
                dtau += (s_zp + g2v * s_pa) * dCa
                dg2 += tau * s_pa * dCa
                dza_ref[0, r0:r1] += dCb
                dtau += (s_za + g1v * s_ap) * dCb
                dg1 += tau * s_ap * dCb
                dg2_ref[k, 0, r0:r1] += jnp.sum(dg2, axis=1)
                dg2_ref[k, 1, r0:r1] += jnp.sum(dg2 * crow[0], axis=1)
                dv_ref[r0:r1] = du
            dt_ref[k, 0, r0:r1] += jnp.sum(dtau, axis=1)
            dt_ref[k, 1, r0:r1] += jnp.sum(dtau * crow[0], axis=1)
            dg1_ref[k, 0, r0:r1] += jnp.sum(dg1, axis=1)
            dg1_ref[k, 1, r0:r1] += jnp.sum(dg1 * crow[0], axis=1)

    def ana_stack(buf):
        for qi in range(Qh):
            rowed = roll(buf, (q_lo + qi) * Wc) * arowm_ref[qi][None, :]
            for ri in range(Qw):
                tp = qi * Qw + ri
                stack_ref[tp * Cp : (tp + 1) * Cp] = (
                    roll(rowed, r_lo + ri) * acolm_ref[ri][None, :]
                )

    def ana_adjoint():
        """(Cp, L) adjoint of ana_stack, consuming stack_ref -> r_ref."""
        acc = jnp.zeros(r_ref.shape, jnp.float32)
        for qi in range(Qh):
            inner = jnp.zeros(r_ref.shape, jnp.float32)
            for ri in range(Qw):
                tp = qi * Qw + ri
                inner += roll(
                    acolm_ref[ri][None, :] * stack_ref[tp * Cp : (tp + 1) * Cp],
                    -(r_lo + ri),
                )
            acc += roll(arowm_ref[qi][None, :] * inner, -(q_lo + qi) * Wc)
        r_ref[:] = acc

    def syn_off(qi, ri):
        return (qi - (Qh - 1) - q_lo) * Wc + (ri - (Qw - 1) - r_lo)

    def syn_stack2(gbuf):
        """Adjoint of the synthesis roll-out: stack2_t = roll(g*smm_t, -off_t)."""
        for qi in range(Qh):
            for ri in range(Qw):
                tp = qi * Qw + ri
                stack_ref[tp * Cp : (tp + 1) * Cp] = roll(
                    gbuf * smm_ref[tp][None, :], -syn_off(qi, ri)
                )

    # --- history prefetch: load j = hist[n, K-1-j] -> slot j%3; each row
    # is live for TWO consecutive steps (as z_k, then z_{k-1}), so three
    # slots give one full step of DMA overlap. Descriptors are
    # reconstructed at wait time (same src/dst/sem), which keeps the
    # reverse loop a fori_loop on hardware — a static unroll at K=30
    # measured a ~17 min Mosaic compile ---
    def _dma(j):
        slot = jax.lax.rem(j, 3) if not isinstance(j, int) else j % 3
        return pltpu.make_async_copy(
            hist_ref.at[n, K - 1 - j], zb_ref.at[slot], sems.at[slot]
        )

    def start_load(j):
        if interp:
            zb_ref[j % 3] = hist_ref[n, K - 1 - j]
        else:
            _dma(j).start()

    def wait_load(j):
        if not interp:
            _dma(j).wait()

    def z_of(slot):
        # upcast once per use: bf16 histories feed rolls (no bf16
        # pltpu.roll) and fp32 accumulating dots
        return zb_ref[slot][0:M].astype(jnp.float32)

    def r_of(slot):
        return zb_ref[slot][r_row0 : r_row0 + Cp].astype(jnp.float32)

    start_load(0)
    if K > 1:
        start_load(1)

    # --- init: adjoint of the final dictionary synthesis (B2m[0], z_{K-1}),
    # seeded with the returned code's own cotangent when the caller uses z
    # (the CSR frame recurrence carries it into the next frame) ---
    wait_load(0)
    syn_stack2(dx2)
    dz_ref[:] = dot(B2m_ref[0], stack_ref[:], ((0,), (0,)))
    if has_dzq:
        dz_ref[:] += dzq_ref[0].astype(jnp.float32)
    dB_ref[0] += dot(stack_ref[:], z_of(0), ((1,), (1,)))
    if K > 2:
        start_load(2)  # slot 2 was never occupied

    # --- reverse steps k = K-1 .. 1 (step j uses loads j-1 and j) ---
    def step(j):
        k = K - j
        wait_load(j)
        if isinstance(j, int):
            slot_prev, slot_cur = (j - 1) % 3, j % 3
        else:
            slot_prev, slot_cur = jax.lax.rem(j - 1, 3), jax.lax.rem(j, 3)
        rk, zkm1 = r_of(slot_prev), z_of(slot_cur)
        prox_adjoint(k, slot_prev)   # -> dv_ref
        ana_stack(rk)
        dA_ref[k] += -dot(dv_ref[:], stack_ref[:], ((1,), (1,)))
        stack_ref[:] = -dot(A2m_ref[k], dv_ref[:], ((0,), (0,)))   # dstack
        ana_adjoint()                                              # dr -> r_ref
        if use_mask:
            r_ref[:] = m2_ref[0] * r_ref[:]                        # ds
        syn_stack2(r_ref[:])                                       # stack2
        dz_ref[:] = dv_ref[:] + dot(B2m_ref[k], stack_ref[:], ((0,), (0,)))
        dB_ref[k] += dot(stack_ref[:], zkm1, ((1,), (1,)))
        if isinstance(j, int):
            if j + 2 < K:
                start_load(j + 2)
        else:
            @pl.when(j + 2 < K)
            def _():
                start_load(j + 2)

    if interp:
        for j in range(1, K):
            step(j)
    else:
        jax.lax.fori_loop(1, K, lambda j, _: (step(j), 0)[1], 0)

    # --- k = 0: z_0 = prox(A2m[0] @ stack(y2)) ---
    prox_adjoint(0, (K - 1) % 3)     # -> dv_ref
    ana_stack(y2)
    dA_ref[0] += dot(dv_ref[:], stack_ref[:], ((1,), (1,)))       # du = +dv


def _estimate_bytes_bwd(M, C, P, s, K, H, W, n_codes=0) -> int:
    """Approximate VMEM bytes for the backward kernel on a padded H x W
    input: dz/u + 2-slot z history buffer + stack + r scratch, big (M, L)
    temporaries (v / sign / dot results), resident weights AND same-size
    gradient accumulators, blocked ins/outs. n_codes: CSR prox modes —
    neighbor-code in blocks + cotangent out blocks + dz_out seed, the
    extra u rows in the history slots, and the prox adjoint's bigger
    elementwise temporary set."""
    P = (P, P) if isinstance(P, int) else tuple(P)
    pads = ((P[0] - 1) // 2, (P[1] - 1) // 2)
    (Qh, Qw), _, _ = _tap_geometry(P, pads, s)
    T, Cp, L = Qh * Qw, C * s * s, (H // s) * (W // s)
    Mp8, Rp8 = -(-M // 8) * 8, -(-Cp // 8) * 8
    hist_rows = (2 * Mp8 if n_codes else Mp8) + Rp8
    scratch = (2 * M + T * Cp + Cp + 3 * hist_rows) * L * 4
    temps = 2 * M * L * 4                     # sign / where temporaries
    if n_codes:
        # the prox adjoint runs in 64-row subband chunks (~26 live
        # (64, L) fp32 temporaries per chunk — see _kernel_bwd)
        temps += 26 * min(M, 64) * L * 4
    weights = 4 * K * M * T * Cp * 4          # A2m+B2m + dA+dB accumulators
    masks = (2 * (Qh + Qw) + T) * L * 4
    blocked = 2 * (3 * Cp * L + 2 * K * M) * 4
    # n_codes each of: code in + cotangent out, + the dz_out seed block
    blocked += n_codes * 2 * 2 * M * L * 4 + (2 * M * L * 4 if n_codes else 0)
    return scratch + temps + weights + masks + blocked


def hist_dtype():
    """Code/residual-history dtype for the fused TRAINING paths (2D+3D).

    The per-iteration history is the train step's dominant HBM term
    (written by the forward, read back by the reverse kernel: ~2.8 GB
    fp32 per step at the 3D flagship config, ~1.8 GB at the 2D one).
    bfloat16 (the default) halves it — 3D flagship train step
    26.8 -> 17.6 ms — at a few-percent relative gradient deviation; the
    flagship-scale training gates (tools/parity_train3d.py,
    tools/flagship_gate.py protocols) show no end-metric degradation.
    Scope differs by dimension: the 2D kernel computes fp32 and only the
    STORED history copies round, while the 3D pair path's history IS the
    iteration carry, so bf16 there also rounds the training primal
    (matching the bf16 inference default). Set CDLNET_HIST_DTYPE=f32
    (alias CDLNET_LISTA3D_HIST_DTYPE) for reassociation-exact gradients
    (match the XLA scan to ~3e-4 on TPU, ~1e-7 interpret)."""
    import os

    env = (os.environ.get("CDLNET_HIST_DTYPE")
           or os.environ.get("CDLNET_LISTA3D_HIST_DTYPE", "bf16"))
    return jnp.float32 if env in ("f32", "fp32", "float32") else jnp.bfloat16


def lista2d_bwd_supported(M, C, P, s, K, H, W, n_codes=0) -> bool:
    """True when the fused backward kernel fits VMEM for a padded input.

    The CSR prox modes use a tighter measured peak factor: the argscsr
    flagship geometry (K=30 M=169 P=9 s=2, 128^2, n_codes=2 — estimate
    ~94 MB) compiles and runs on hardware, bounding the true Mosaic
    peak/estimate ratio below ~1.37 there; 1.3 admits it while the st
    kernel keeps its 1.75 calibration."""
    if H % s or W % s:
        return False
    est = _estimate_bytes_bwd(M, C, P, s, K, H, W, n_codes=n_codes)
    factor = 1.3 if n_codes else _PEAK_FACTOR
    return est * factor < _VMEM_CAPACITY


def lista2d_fused_bwd(dxp, yp, A, B, t, c, mask, hist, stride=1,
                      interpret=False, _row_period=None,
                      g=None, z_prev=None, g2=None, z_after=None,
                      dz_out=None):
    """Backward pass companion to lista2d_fused(..., return_hist=True).

    dxp: cotangent of xphat (N, C, H, W); hist: (N, K, Mp8+Rp8, L)
    per-iteration codes + residuals from the forward. Returns (dA, dB, dt) in the original torch
    weight layout (the polyphase weight prep is linear, so its vjp
    transports the in-kernel polyphase-domain gradients back exactly).
    Input/sigma/mask cotangents are zero by construction (training
    differentiates w.r.t. parameters only).

    CSR prox modes (pass the same g / z_prev / g2 / z_after the forward
    ran with; hist then carries the prox arguments too): returns
    (dA, dB, dt, dg, dg2, dz_prev, dz_after) — dgamma banks in the
    (K, 2, M, 1, 1) threshold layout and the neighbor-code cotangents the
    frame recurrence backpropagates (None in the slots the caller left
    None). dz_out (N, M, Hc, Wc) seeds the reverse with the returned
    code's cotangent (required whenever the caller consumes z)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, C, H, W = yp.shape
    K, M = A.shape[0], A.shape[1]
    P = A.shape[-2:]
    s = stride
    pads = ((P[0] - 1) // 2, (P[1] - 1) // 2)
    Hc, Wc = H // s, W // s
    L = Hc * Wc
    Cp = C * s * s
    (Qh, Qw), _, _ = _tap_geometry(P, pads, s)
    T = Qh * Qw

    # the same one-sided mapping the forward applied (lista2d_fused):
    # z_after-only runs the "csr" kernel with (z_after, g2) in the
    # (zp, g) slots; un-map the cotangents before returning
    za_only = z_prev is None and z_after is not None
    if za_only:
        z_prev, g = z_after, g2
        z_after = g2 = None
    if z_prev is not None and z_after is not None:
        prox_mode = "csrf2"
    elif z_prev is not None:
        prox_mode = "csr"
    else:
        prox_mode = "st"
    has_dzq = dz_out is not None

    A2m, vjpA = jax.vjp(lambda Aw: _prep_A2m(Aw, s, pads, T, Cp), A)
    B2m, vjpB = jax.vjp(lambda Bw: _prep_B2m(Bw, s, pads, T, Cp), B)

    y2 = pp.space_to_depth(yp, s, 2).reshape(N, Cp, L)
    dx2 = pp.space_to_depth(dxp, s, 2).reshape(N, Cp, L)
    use_mask = mask is not None
    m2 = (
        pp.space_to_depth(jnp.broadcast_to(mask, yp.shape), s, 2).reshape(N, Cp, L)
        if use_mask
        else jnp.zeros((N, 1, 1), yp.dtype)
    )

    c_full = jnp.asarray(c, yp.dtype).reshape(-1)
    acolm, arowm, smm, crow = _masks_and_crow(
        P, pads, s, Hc, Wc, c_full, N, _row_period
    )
    q_lo_h, _ = pp._tap_ranges(P[0], pads[0], s)
    q_lo_w, _ = pp._tap_ranges(P[1], pads[1], s)

    kern = functools.partial(
        _kernel_bwd, K=K, Cp=Cp, Wc=Wc, Qh=Qh, Qw=Qw, q_lo=q_lo_h,
        r_lo=q_lo_w, use_mask=use_mask, interp=interpret,
        prox=prox_mode, has_dzq=has_dzq,
    )
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    nmap_code = pl.BlockSpec((1, M, L), lambda n: (n, 0, 0),
                             memory_space=pltpu.VMEM)
    cmap = lambda n: (0, 0, 0)
    gbank_spec = pl.BlockSpec((K, 2, M), cmap, memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((1, Cp, L), lambda n: (n, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Cp, L), lambda n: (n, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (1, Cp, L) if use_mask else (1, 1, 1),
            (lambda n: (n, 0, 0)) if use_mask else (lambda n: (0, 0, 0)),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec((1, 1, L), lambda n: (n, 0, 0), memory_space=pltpu.VMEM),
    ]
    extra_ops = []
    if prox_mode != "st":
        in_specs += [full, full]  # tbank, g1 bank
        extra_ops += [t[:, :, :, 0, 0].astype(jnp.float32),
                      g[:, :, :, 0, 0].astype(jnp.float32)]
        if prox_mode == "csrf2":
            in_specs.append(full)
            extra_ops.append(g2[:, :, :, 0, 0].astype(jnp.float32))
    if has_dzq:
        in_specs.append(nmap_code)
        extra_ops.append(dz_out.reshape(N, M, L))
    if prox_mode != "st":
        in_specs.append(nmap_code)
        extra_ops.append(z_prev.reshape(N, M, L))
        if prox_mode == "csrf2":
            in_specs.append(nmap_code)
            extra_ops.append(z_after.reshape(N, M, L))

    in_specs += [
        full,  # A2m
        full,  # B2m
        full,  # acolm
        full,  # arowm
        full,  # smm
        pl.BlockSpec(memory_space=pl.ANY),  # hist
    ]
    out_specs = [
        pl.BlockSpec((K, M, T * Cp), cmap, memory_space=pltpu.VMEM),
        pl.BlockSpec((K, T * Cp, M), cmap, memory_space=pltpu.VMEM),
        pl.BlockSpec((K, 2, M), cmap, memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((K, M, T * Cp), jnp.float32),
        jax.ShapeDtypeStruct((K, T * Cp, M), jnp.float32),
        jax.ShapeDtypeStruct((K, 2, M), jnp.float32),
    ]
    if prox_mode != "st":
        out_specs.append(gbank_spec)
        out_shape.append(jax.ShapeDtypeStruct((K, 2, M), jnp.float32))
        if prox_mode == "csrf2":
            out_specs.append(gbank_spec)
            out_shape.append(jax.ShapeDtypeStruct((K, 2, M), jnp.float32))
        out_specs.append(nmap_code)
        out_shape.append(jax.ShapeDtypeStruct((N, M, L), jnp.float32))
        if prox_mode == "csrf2":
            out_specs.append(nmap_code)
            out_shape.append(jax.ShapeDtypeStruct((N, M, L), jnp.float32))

    hist_rows = (2 * -(-M // 8) * 8 if prox_mode != "st" else -(-M // 8) * 8) \
        + -(-Cp // 8) * 8
    outs = pl.pallas_call(
        kern,
        grid=(N,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((M, L), jnp.float32),        # dz
            pltpu.VMEM((M, L), jnp.float32),        # dv
            pltpu.VMEM((Cp, L), jnp.float32),       # r / dr / ds
            pltpu.VMEM((T * Cp, L), jnp.float32),   # stack / dstack / stack2
            pltpu.VMEM((3, hist_rows, L), hist.dtype),  # 3-slot history
            pltpu.SemaphoreType.DMA((3,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        interpret=interpret,
    )(dx2, y2, m2, crow, *extra_ops, A2m, B2m, acolm, arowm, smm, hist)

    dA = vjpA(outs[0])[0]
    dB = vjpB(outs[1])[0]
    dt = outs[2][:, :, :, None, None].astype(t.dtype)
    if prox_mode == "st":
        return dA.astype(A.dtype), dB.astype(B.dtype), dt
    i = 3
    dg1 = outs[i][:, :, :, None, None]; i += 1
    dg2o = None
    if prox_mode == "csrf2":
        dg2o = outs[i][:, :, :, None, None]; i += 1
    dzp = outs[i].reshape(N, M, Hc, Wc); i += 1
    dza = None
    if prox_mode == "csrf2":
        dza = outs[i].reshape(N, M, Hc, Wc); i += 1
    if za_only:  # un-map: cotangents back to the caller's original slots
        return (dA.astype(A.dtype), dB.astype(B.dtype), dt,
                None, dg1, None, dzp)
    return (dA.astype(A.dtype), dB.astype(B.dtype), dt,
            dg1, dg2o, dzp, dza)


def lista2d_fused(yp, A, B, t, c, stride=1, mask=None, return_z=False,
                  interpret=False, _row_period=None,
                  g=None, z_prev=None, g2=None, z_after=None,
                  return_hist=False):
    """Fused K-iteration 2D LISTA, polyphase domain, z resident in VMEM.

    yp:   (N, C, H, W) pre-processed input (mean-sub, stride-padded)
    A, B: (K, M, C, P, P) stacked banks; t: (K, 2, M, 1, 1); c: scalar or
    (N, 1, 1, 1) threshold scale. Returns (xphat (N, C, H, W), z (N, M,
    Hc, Wc)) — identical (fp32 tolerance) to ops.lista.lista_2d + final
    conv_transpose2d with B[0].

    CSR prox modes (frame-recurrent models, reference model/net.py:426-463
    and :544-564): pass z_prev (N, M, Hc, Wc) + gamma bank g (K, 2, M, 1,
    1) for the one-sided prox_csr, z_after + g2 for the other side, or all
    four for the two-sided prox_csr_f2 — neighbor codes stay VMEM-resident
    and the prox is pure VPU work on top of the same dots.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, C, H, W = yp.shape
    K, M = A.shape[0], A.shape[1]

    if z_prev is not None and z_after is not None:
        prox_mode = "csrf2"
    elif z_prev is not None or z_after is not None:
        prox_mode = "csr"
        if z_prev is None:  # one-sided on the following frame: gamma = g2
            z_prev, g = z_after, g2
            z_after = g2 = None
    else:
        prox_mode = "st"

    # Batches fold into ONE tall image: the N grid steps become one kernel
    # invocation whose per-tap dots are N x wider on the MXU (period-aware
    # row masks stop windows bleeding across image borders). Per-sample
    # sigma folds too: the kernel forms thresholds from a per-LANE noise
    # scale row (crow), which simply varies by folded-image row block.
    c_full = jnp.asarray(c, yp.dtype).reshape(-1)
    if c_full.size == 1:
        c_full = jnp.broadcast_to(c_full, (N,))
    if N > 1 and mask is None and _row_period is None and prox_mode == "st" \
            and not return_hist:
        # largest group whose folded working set fits with margin (the
        # measured Mosaic peak runs ~2x the estimate; hard cap is 128 MB)
        grp_sz = N
        while grp_sz > 1 and _estimate_bytes(
            M, C, A.shape[-1], stride, K, grp_sz * H, W, return_z
        ) * 2.2 > _VMEM_CAPACITY:
            grp_sz -= 1
        if grp_sz > 1:
            outs_x, outs_z = [], []
            for i in range(0, N, grp_sz):
                grp = yp[i : i + grp_sz]
                cg = c_full[i : i + grp_sz]
                n = grp.shape[0]
                if n == 1:
                    xg, zg = lista2d_fused(
                        grp, A, B, t, cg, stride=stride, return_z=return_z,
                        interpret=interpret,
                    )
                else:
                    # stack images along H: (n, C, H, W) -> (1, C, n*H, W);
                    # the row axis must be (n, h)-ordered per channel
                    yf = grp.transpose(1, 0, 2, 3).reshape(1, C, n * H, W)
                    xf, zf = lista2d_fused(
                        yf, A, B, t, cg, stride=stride, return_z=return_z,
                        interpret=interpret, _row_period=H // stride,
                    )
                    xg = xf.reshape(C, n, H, W).transpose(1, 0, 2, 3)
                    zg = (
                        zf.reshape(M, n, H // stride, W // stride)
                        .transpose(1, 0, 2, 3)
                        if return_z
                        else None
                    )
                outs_x.append(xg)
                outs_z.append(zg)
            x = jnp.concatenate(outs_x, axis=0)
            z = jnp.concatenate(outs_z, axis=0) if return_z else None
            return x, z
    P = A.shape[-2:]
    s = stride
    pads = ((P[0] - 1) // 2, (P[1] - 1) // 2)
    Hc, Wc = H // s, W // s
    L = Hc * Wc
    Cp = C * s * s

    (Qh, Qw), ana_off, syn_off = _tap_geometry(P, pads, s)
    T = Qh * Qw

    # host-side weight prep (cheap gathers, fused by XLA)
    A2m = _prep_A2m(A, s, pads, T, Cp)
    B2m = _prep_B2m(B, s, pads, T, Cp)

    y2 = pp.space_to_depth(yp, s, 2).reshape(N, Cp, L)
    use_mask = mask is not None
    m2 = (
        pp.space_to_depth(jnp.broadcast_to(mask, yp.shape), s, 2).reshape(N, Cp, L)
        if use_mask
        else jnp.zeros((N, 1, 1), yp.dtype)  # placeholder, unused
    )

    # threshold bank (K, 2, M) + masks + per-lane noise-scale rows (crow:
    # constant per image, or folded — stepping every _row_period code rows)
    tbank = t[:, :, :, 0, 0].astype(yp.dtype)
    acolm, arowm, smm, crow = _masks_and_crow(
        P, pads, s, Hc, Wc, c_full, N, _row_period
    )
    q_lo_h, _ = pp._tap_ranges(P[0], pads[0], s)
    q_lo_w, _ = pp._tap_ranges(P[1], pads[1], s)

    kern = functools.partial(
        _kernel, K=K, Cp=Cp, Wc=Wc, Qh=Qh, Qw=Qw, q_lo=q_lo_h, r_lo=q_lo_w,
        use_mask=use_mask, return_z=return_z, prox=prox_mode,
        hist=return_hist, interp=interpret,
    )

    in_specs = [
            pl.BlockSpec((1, Cp, L), lambda n: (n, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, Cp, L) if use_mask else (1, 1, 1),
                lambda n: (n, 0, 0) if use_mask else (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # tbank (K, 2, M)
            pl.BlockSpec((1, 1, L), lambda n: (n, 0, 0),
                         memory_space=pltpu.VMEM),  # crow
            pl.BlockSpec(memory_space=pltpu.VMEM),  # A2m
            pl.BlockSpec(memory_space=pltpu.VMEM),  # B2m
            pl.BlockSpec(memory_space=pltpu.VMEM),  # acolm
            pl.BlockSpec(memory_space=pltpu.VMEM),  # arowm
            pl.BlockSpec(memory_space=pltpu.VMEM),  # smm
        ]
    extra_ops = []
    if prox_mode != "st":
        gam_spec = pl.BlockSpec(memory_space=pltpu.VMEM)  # (K, 2, M) bank
        code_spec = pl.BlockSpec((1, M, L), lambda n: (n, 0, 0),
                                 memory_space=pltpu.VMEM)

        def _gbank(bank):
            return bank[:, :, :, 0, 0].astype(yp.dtype)

        if prox_mode == "csr":
            in_specs += [gam_spec, code_spec]
            extra_ops = [_gbank(g), z_prev.reshape(N, M, L)]
        else:
            in_specs += [gam_spec, gam_spec, code_spec, code_spec]
            extra_ops = [_gbank(g), _gbank(g2),
                         z_prev.reshape(N, M, L), z_after.reshape(N, M, L)]
    out_specs = [
        pl.BlockSpec((1, Cp, L), lambda n: (n, 0, 0), memory_space=pltpu.VMEM),
    ]
    out_shape = [jax.ShapeDtypeStruct((N, Cp, L), yp.dtype)]
    if return_z:
        out_specs.append(
            pl.BlockSpec((1, M, L), lambda n: (n, 0, 0), memory_space=pltpu.VMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((N, M, L), yp.dtype))
    scratch = [
        pltpu.VMEM((M, L), jnp.float32),        # z
        pltpu.VMEM((M, L), jnp.float32),        # u
        pltpu.VMEM((Cp, L), jnp.float32),       # r
        pltpu.VMEM((T * Cp, L), jnp.float32),   # stack
    ]
    if return_hist:
        # per-iteration codes z_k AND residuals r_k stream straight to HBM
        # (backward residuals); row groups padded to the sublane tile so
        # the HBM slices are aligned: rows [0:M) = z_k, [Mp8:Mp8+Cp) = r_k.
        # CSR prox modes also store the prox argument u_k in [Mp8:Mp8+M)
        # (residual moves to [2*Mp8:...)) — see _kernel.
        # Dtype: hist_dtype() — bf16 by default (the history is the train
        # step's dominant HBM term), f32 via CDLNET_HIST_DTYPE=f32
        hd = hist_dtype()
        Mp8 = -(-M // 8) * 8
        Rp8 = -(-Cp // 8) * 8
        rows = (2 * Mp8 if prox_mode != "st" else Mp8) + Rp8
        out_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        out_shape.append(
            jax.ShapeDtypeStruct((N, K, rows, L), hd)
        )
        scratch.append(pltpu.VMEM((2 * rows, L), hd))  # 2-slot staging ring
        scratch.append(pltpu.SemaphoreType.DMA((2,)))

    outs = pl.pallas_call(
        kern,
        grid=(N,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        interpret=interpret,
    )(y2, m2, tbank, crow, A2m, B2m, acolm, arowm, smm, *extra_ops)

    x2 = outs[0]
    xphat = pp.depth_to_space(x2.reshape(N, Cp, Hc, Wc), s, 2, C)
    z = outs[1].reshape(N, M, Hc, Wc) if return_z else None
    if return_hist:
        return xphat, z, outs[-1]
    return xphat, z
