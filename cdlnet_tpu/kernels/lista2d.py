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
throughout; inference path only (no custom VJP yet — training uses the XLA
path).
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


def _estimate_bytes(M, C, P, s, K, H, W, return_z=False, n_codes=0) -> int:
    """Approximate VMEM bytes for a padded H x W input (fp32): scratch z/u
    (2M*L) + window stack (T*Cp*L) + residual (Cp*L); resident weights;
    masks; double-buffered blocked in/out; n_codes extra VMEM-resident
    neighbor-code inputs (CSR prox modes). The Mosaic compiler's actual
    peak runs up to ~2x this (measured) — callers apply their own margin.
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
    return scratch + weights + masks + blocked_in + blocked_out


def lista2d_fused_supported(M, C, P, s, K, H, W, return_z=False,
                            n_codes=0) -> bool:
    """True when the fused kernel fits VMEM for a padded H x W input."""
    if H % s or W % s:
        return False
    est = _estimate_bytes(M, C, P, s, K, H, W, return_z, n_codes=n_codes)
    return est * _PEAK_FACTOR < _VMEM_CAPACITY


def _kernel(y2_ref, m2_ref, tau_ref, A2m_ref, B2m_ref, acolm_ref, arowm_ref,
            smm_ref, *out_and_scratch, K, Cp, Wc, Qh, Qw,
            q_lo, r_lo, use_mask, return_z, prox="st"):
    gam1_ref = gam2_ref = zp_ref = za_ref = None
    if prox == "csr":
        gam1_ref, zp_ref = out_and_scratch[:2]
        out_and_scratch = out_and_scratch[2:]
    elif prox == "csrf2":
        gam1_ref, gam2_ref, zp_ref, za_ref = out_and_scratch[:4]
        out_and_scratch = out_and_scratch[4:]
    if return_z:
        x2_ref, z_out_ref, z_ref, u_ref, r_ref, stack_ref = out_and_scratch
    else:
        x2_ref, z_ref, u_ref, r_ref, stack_ref = out_and_scratch
        z_out_ref = None
    """One image. Shapes (leading grid dim already sliced to 1):
      y2 (1, Cp, L)   m2 (1, Cp, L)    tau (1, K, M)
      A2m (K, M, T*Cp)   B2m (K, T*Cp, M)  [T = Qh*Qw, rows tap-major (q, r)]
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

    def st(u, k):
        """Per-iteration proximal step. "st" is plain soft-thresholding;
        "csr"/"csrf2" are the temporal-consistency proxes pulling the code
        toward VMEM-resident neighbor-frame codes (core/ops.py::prox_csr
        / prox_csr_f2; reference model/net.py:229-262) — all elementwise,
        so the CSR variants cost only VPU work on top of the same dots."""
        tau = tau_ref[0, k][:, None]
        if prox == "st":
            return _soft(u, tau)
        if prox == "csr":
            gam = gam1_ref[0, k][:, None]
            zp = zp_ref[0]
            shift = zp + tau * jnp.sign(zp)
            return _soft(_soft(u - shift, tau * gam) + shift, tau)
        g1 = gam1_ref[0, k][:, None]
        g2 = gam2_ref[0, k][:, None]
        zp, za = zp_ref[0], za_ref[0]
        Ca = zp + tau * jnp.sign(zp) + tau * g2 * jnp.sign(zp - za)
        Cb = za + tau * jnp.sign(za) + tau * g1 * jnp.sign(za - zp)
        inner = _soft(u - Ca, g1 * tau)
        corr = tau * g1 * jnp.sign(u - Ca)
        midder = _soft(inner - Cb + corr, g2 * tau)
        return _soft(midder + Cb - corr, tau)

    # --- k = 0: z = ST(A0 y, tau0) ---
    analysis_stack(y2)
    z_ref[:] = st(
        jax.lax.dot_general(
            A2m_ref[0], stack_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=HIGH,
        ),
        0,
    )

    # --- k = 1..K-1 ---
    def body(k, _):
        synthesis(k, r_ref)
        r_ref[:] = (m2_ref[0] * r_ref[:] - y2) if use_mask else (r_ref[:] - y2)
        analysis_stack(r_ref[:])
        u_ref[:] = jax.lax.dot_general(
            A2m_ref[k], stack_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=HIGH,
        )
        z_ref[:] = st(z_ref[:] - u_ref[:], k)
        return 0

    jax.lax.fori_loop(1, K, body, 0)

    # --- final dictionary synthesis with B[0] ---
    synthesis(0, r_ref)
    x2_ref[0] = r_ref[:]
    if return_z:
        z_out_ref[0] = z_ref[:]


def lista2d_fused(yp, A, B, t, c, stride=1, mask=None, return_z=False,
                  interpret=False, _row_period=None,
                  g=None, z_prev=None, g2=None, z_after=None):
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

    # Shared-sigma batches fold into ONE tall image: the N grid steps become
    # one kernel invocation whose per-tap dots are N x wider on the MXU
    # (period-aware row masks stop windows bleeding across image borders).
    # Per-sample sigma keeps the per-image grid (thresholds differ per image).
    c_is_scalar = jnp.ndim(c) == 0 or (hasattr(c, "size") and c.size == 1)
    if N > 1 and c_is_scalar and mask is None and _row_period is None \
            and prox_mode == "st":
        # largest group whose folded working set fits with margin (the
        # measured Mosaic peak runs ~2x the estimate; hard cap is 128 MB)
        g = N
        while g > 1 and _estimate_bytes(
            M, C, A.shape[-1], stride, K, g * H, W, return_z
        ) * 2.2 > _VMEM_CAPACITY:
            g -= 1
        if g > 1:
            outs_x, outs_z = [], []
            for i in range(0, N, g):
                grp = yp[i : i + g]
                n = grp.shape[0]
                if n == 1:
                    xg, zg = lista2d_fused(
                        grp, A, B, t, c, stride=stride, return_z=return_z,
                        interpret=interpret,
                    )
                else:
                    # stack images along H: (n, C, H, W) -> (1, C, n*H, W);
                    # the row axis must be (n, h)-ordered per channel
                    yf = grp.transpose(1, 0, 2, 3).reshape(1, C, n * H, W)
                    xf, zf = lista2d_fused(
                        yf, A, B, t, c, stride=stride, return_z=return_z,
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
    A2, _, _, _ = pp.polyphase_weights(A, s, pads, 2)   # (K, M, Cp, Qh, Qw)
    _, B2t, _, _ = pp.polyphase_weights(B, s, pads, 2)
    # analysis matrix, tap-major to match the window stack: (K, M, T*Cp)
    A2m = A2.transpose(0, 1, 3, 4, 2).reshape(K, M, T * Cp)
    # synthesis matrix, rows (tap, cp)-major for the single-dot form
    B2m = B2t.transpose(0, 3, 4, 2, 1).reshape(K, T * Cp, M)

    y2 = pp.space_to_depth(yp, s, 2).reshape(N, Cp, L)
    use_mask = mask is not None
    m2 = (
        pp.space_to_depth(jnp.broadcast_to(mask, yp.shape), s, 2).reshape(N, Cp, L)
        if use_mask
        else jnp.zeros((N, 1, 1), yp.dtype)  # placeholder, unused
    )

    # per-sample thresholds tau (N, K, M)
    c_arr = jnp.asarray(c, yp.dtype).reshape(-1)
    if c_arr.size == 1:
        c_arr = jnp.broadcast_to(c_arr, (N,))
    tau = t[None, :, 0, :, 0, 0] + c_arr[:, None, None] * t[None, :, 1, :, 0, 0]

    q_lo_h, _ = pp._tap_ranges(P[0], pads[0], s)
    q_lo_w, _ = pp._tap_ranges(P[1], pads[1], s)
    acolm = jnp.asarray(_axis_masks([q_lo_w + ri for ri in range(Qw)], Hc, Wc, 1))
    arowm = jnp.asarray(
        _axis_masks([q_lo_h + qi for qi in range(Qh)], Hc, Wc, 0,
                    period=_row_period)
    )
    scolm = jnp.asarray(
        _axis_masks([ri - (Qw - 1) - q_lo_w for ri in range(Qw)], Hc, Wc, 1)
    )
    srowm = jnp.asarray(
        _axis_masks([qi - (Qh - 1) - q_lo_h for qi in range(Qh)], Hc, Wc, 0,
                    period=_row_period)
    )
    # combined per-tap synthesis masks, rows (qi, ri)-major
    smm = (srowm[:, None, :] * scolm[None, :, :]).reshape(T, L)

    kern = functools.partial(
        _kernel, K=K, Cp=Cp, Wc=Wc, Qh=Qh, Qw=Qw, q_lo=q_lo_h, r_lo=q_lo_w,
        use_mask=use_mask, return_z=return_z, prox=prox_mode,
    )

    in_specs = [
            pl.BlockSpec((1, Cp, L), lambda n: (n, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, Cp, L) if use_mask else (1, 1, 1),
                lambda n: (n, 0, 0) if use_mask else (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, K, M), lambda n: (n, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # A2m
            pl.BlockSpec(memory_space=pltpu.VMEM),  # B2m
            pl.BlockSpec(memory_space=pltpu.VMEM),  # acolm
            pl.BlockSpec(memory_space=pltpu.VMEM),  # arowm
            pl.BlockSpec(memory_space=pltpu.VMEM),  # smm
        ]
    extra_ops = []
    if prox_mode != "st":
        gam_spec = pl.BlockSpec((1, K, M), lambda n: (n, 0, 0),
                                memory_space=pltpu.VMEM)
        code_spec = pl.BlockSpec((1, M, L), lambda n: (n, 0, 0),
                                 memory_space=pltpu.VMEM)

        def _gam(bank):
            gv = bank[None, :, 0, :, 0, 0] + c_arr[:, None, None] * bank[None, :, 1, :, 0, 0]
            return gv.astype(yp.dtype)

        if prox_mode == "csr":
            in_specs += [gam_spec, code_spec]
            extra_ops = [_gam(g), z_prev.reshape(N, M, L)]
        else:
            in_specs += [gam_spec, gam_spec, code_spec, code_spec]
            extra_ops = [_gam(g), _gam(g2),
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

    outs = pl.pallas_call(
        kern,
        grid=(N,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((M, L), jnp.float32),        # z
            pltpu.VMEM((M, L), jnp.float32),        # u
            pltpu.VMEM((Cp, L), jnp.float32),       # r
            pltpu.VMEM((T * Cp, L), jnp.float32),   # stack
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        interpret=interpret,
    )(y2, m2, tau, A2m, B2m, acolm, arowm, smm, *extra_ops)

    x2 = outs[0]
    xphat = pp.depth_to_space(x2.reshape(N, Cp, Hc, Wc), s, 2, C)
    z = outs[1].reshape(N, M, Hc, Wc) if return_z else None
    return xphat, z
