"""Depth-sharded 3D LISTA on the fused banded Pallas kernels.

The XLA halo path (dist/halo.py) proves the sharding math; this module makes
depth sharding a PRODUCT feature on the fast path: each shard runs the
UNMODIFIED hardware-validated banded kernels (kernels/lista3d_tiled) on a
halo-extended local block, with the halo exchange at the XLA level — a
ppermute ring over ICI between kernel calls (GSPMD cannot partition Mosaic
kernels, so the kernels run per-device inside shard_map; the collectives
never enter a pallas_call).

Exactness argument (why unmodified kernels + per-iteration exchange is
EXACT, not approximate): work in polyphase code-frame space, where both
kernels read depth taps from clamped views zeroed outside the block — the
kernel's own zero padding. One LISTA iteration's total reach is
  z_new[d]  <-  z[d - (Qd-1) .. d + (Qd-1)]
(analysis reads r[d+dlo .. d+dhi]; r[d'] reads z[d'-(Qd-1)-dlo .. d'-dlo];
the dlo terms cancel). So with hz = Qd-1 frames of true neighbor data on
each side of a shard's kept frames, every kept output's entire dependency
cone holds real data, and the kernel's zero padding falls either (a) in the
extended region whose outputs are DISCARDED, or (b) at the true clip
boundary — where zero padding is the reference Conv3d semantics
(model/net.py:137-144). Edge shards therefore use ASYMMETRIC windows: the
first shard's window starts exactly at frame 0 (kernel zero-pad == clip
boundary) and takes 2*hz halo frames from the right; interior shards take
hz per side; the last shard mirrors the first. Kept frames are refreshed
(crop + exchange + re-window) every iteration, so discarded-region
corruption never propagates. Per-frame numerics are IDENTICAL to the
single-device banded kernel — same kernels, same band geometry, same dot
shapes.

Training (the route BASELINE.md names for native-resolution 3D training,
which single-chip OOMs in both backends at 16x480x854): a custom VJP whose
forward saves KEPT-frame histories only — per-chip history is 1/n_depth of
the single-chip total (the halo frames are reconstructed in the backward by
re-exchanging neighbors' kept histories). The backward runs the transposed
iteration with the SAME pallas kernels, banks swapped:
  adjoint of the analysis conv  = synthesize with prep_B2m_3d(A)  (A^T)
  adjoint of the synthesis conv = analyze   with prep_A2m_3d(B)   (B^T)
(conv / conv-transpose with shared (M, C, kd, kh, kw) weights are exact
transposes of each other — the pairing the LISTA math itself relies on).
Weight gradients are per-iteration XLA conv weight-grad contractions via
jax.linear_transpose (no forward re-evaluation), with cotangents embedded
in zero canvases so only kept output positions contribute — each shard
accumulates exactly its own frames' weight gradient and shard_map's
transpose psums them across the mesh.

Reference: train3d.py:35-152 (the training protocol), analyze3d.py:77-161
(the native-res eval shapes), SURVEY.md §2.5/§5 sequence-parallel rows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from cdlnet_tpu.dist.halo import halo_exchange
from cdlnet_tpu.kernels.lista3d import prep_A2m_3d, prep_B2m_3d
from cdlnet_tpu.kernels.lista3d_tiled import (
    _geometry3,
    _pick_band3,
    make_banded3_ops,
)
from cdlnet_tpu.ops import polyphase as pp
from cdlnet_tpu.ops.conv import conv3d, conv_transpose3d


def _depth_shard_geometry_ok(model, D, H, W, n_depth, mask):
    if getattr(model, "backend", None) != "pallas":
        return False
    if getattr(model, "residual", False) or mask is not None:
        return False
    s = model.s
    if n_depth < 2 or D % (n_depth * s) or H % s or W % s:
        return False
    P_, pads, Qd, Qh, Qw, dlo, hlo, wlo, Hh = _geometry3(model.P, s)
    hz = Qd - 1
    Dzl = D // s // n_depth
    if hz > (n_depth - 1) * Dzl:
        # a kept frame's read cone would cross into beyond-global fake
        # frames of the extended window (only possible for tiny clips)
        return False
    return True


def fused_depth_shard_supported(model, D, H, W, n_depth, *, train=False,
                                mask=None) -> bool:
    """Gate for the fused depth-sharded path (banded OR ring kernels).
    Falls back to the XLA halo path (dist/halo.py) when False."""
    if not _depth_shard_geometry_ok(model, D, H, W, n_depth, mask):
        return False
    s = model.s
    Qd = _geometry3(model.P, s)[2]
    hz = Qd - 1
    Dzl = D // s // n_depth
    # training runs the fp32 adjoint kernels on the same band — gate at 4B
    z_bytes = 4 if train else 2
    if not train and ring_depth_shard_supported(model, D, H, W, n_depth,
                                                mask=mask):
        return True
    return _pick_band3(model.M, model.C, model.P, s, Dzl + 2 * hz,
                       H // s, W // s, z_bytes=z_bytes) is not None


def ring_depth_shard_supported(model, D, H, W, n_depth, *, mask=None,
                               z_bytes=2) -> bool:
    """True when the depth-sharded forward can run the ring kernels
    (kernels/lista3d_ring — 1.5-1.8x the banded pair at native res) on
    the halo-extended local windows. CDLNET_LISTA3D_RING=0 opts out
    (the same switch as single-device routing)."""
    import os

    from cdlnet_tpu.kernels.lista3d_ring import _pick_band_ring

    if os.environ.get("CDLNET_LISTA3D_RING", "1") == "0":
        return False
    if not _depth_shard_geometry_ok(model, D, H, W, n_depth, mask):
        return False
    s = model.s
    Qd = _geometry3(model.P, s)[2]
    hz = Qd - 1
    Dzl = D // s // n_depth
    return _pick_band_ring(model.M, model.C, model.P, s, Dzl + 2 * hz,
                           H // s, W // s, z_bytes=z_bytes) is not None


def ring_depth_shard_train_supported(model, D, H, W, n_depth, *, mask=None,
                                     hist_bytes=None) -> bool:
    """True when depth-sharded TRAINING can run the merged ring reverse
    (kernels/lista3d_ring_bwd) per shard: the backward's merged kernel has
    a 2*(Qd-1)-frame cotangent reach per iteration (ds + dz stages fused,
    no exchange point between them), so it needs +-2*hz windows — gated
    separately from the forward's +-hz. CDLNET_LISTA3D_RING=0 /
    CDLNET_LISTA3D_RING_BWD=0 opt out (same switches as single-device)."""
    import os

    from cdlnet_tpu.kernels.autodiff import hist3d_dtype
    from cdlnet_tpu.kernels.lista3d_ring_bwd import pick_band_ring_train

    if (os.environ.get("CDLNET_LISTA3D_RING", "1") == "0"
            or os.environ.get("CDLNET_LISTA3D_RING_BWD", "1") == "0"):
        return False
    if not _depth_shard_geometry_ok(model, D, H, W, n_depth, mask):
        return False
    s = model.s
    P_, pads, Qd, Qh, Qw, dlo, hlo, wlo, Hh = _geometry3(model.P, s)
    if Qd * Qh * Qw * model.C * s**3 > 512:
        # same measured heuristic as the single-device routing
        # (autodiff.lista3d_bigframe_train_path): the reverse is
        # issue-bound on its tap-stack builds; large stacks favor banded
        return False
    hz2 = 2 * (Qd - 1)
    Dzl = D // s // n_depth
    if hz2 > (n_depth - 1) * Dzl:
        return False
    if hist_bytes is None:
        hist_bytes = jnp.dtype(hist3d_dtype()).itemsize
    return pick_band_ring_train(
        model.M, model.C, model.P, s, Dzl + 2 * hz2, H // s, W // s,
        hist_bytes=hist_bytes) is not None


def _lo_index(axis_name: str, n: int, hz: int):
    """Frames of halo BELOW a shard's kept block in its extended window:
    0 for the first shard (kernel zero-pad == clip boundary), 2*hz for the
    last, hz for interior shards."""
    idx = lax.axis_index(axis_name)
    return jnp.where(idx == 0, 0, jnp.where(idx == n - 1, 2 * hz, hz))


def _extend(x, lo, hz, axis_name):
    """Kept block (axis 1 = code frames) -> extended window (+2*hz frames),
    positioned asymmetrically per _lo_index."""
    xp = halo_exchange(x, 2 * hz, 2 * hz, axis_name, axis=1)
    return lax.dynamic_slice_in_dim(xp, 2 * hz - lo, x.shape[1] + 2 * hz, axis=1)


def _crop(x, lo, Dzl):
    return lax.dynamic_slice_in_dim(x, lo, Dzl, axis=1)


def _local_geometry(model, Nl, C, Dl, H, W, z_dtype, interpret, z_bytes=None):
    s = model.s
    P_, pads, Qd, Qh, Qw, dlo, hlo, wlo, Hh = _geometry3(model.P, s)
    hz = Qd - 1
    Dzl = Dl // s
    Dce = Dzl + 2 * hz
    band = _pick_band3(
        model.M, C, model.P, s, Dce, H // s, W // s,
        z_bytes=z_bytes if z_bytes is not None
        else jnp.dtype(z_dtype).itemsize,
    )
    ops = make_banded3_ops(
        Nl, C, Dce, H // s, W // s, model.M, model.P, s,
        z_dtype=z_dtype, interpret=interpret, band=band,
    )
    return ops, pads, hz, Dzl, Dce


def _tau_table(model, params, sigma, N):
    """(N, K, Mp) noise-adaptive thresholds (lista3d_tiled's layout)."""
    from cdlnet_tpu.models.base import sigma_scale

    t = params["t"]
    M = t.shape[2]
    Mp = -(-M // 8) * 8
    c = sigma_scale(sigma, model.adaptive, 5)
    c_arr = jnp.asarray(c, jnp.float32).reshape(-1)
    if c_arr.size == 1:
        c_arr = jnp.broadcast_to(c_arr, (N,))
    tau = (
        t[None, :, 0, :, 0, 0, 0].astype(jnp.float32)
        + c_arr[:, None, None] * t[None, :, 1, :, 0, 0, 0]
    )
    if Mp != M:
        tau = jnp.pad(tau, ((0, 0), (0, 0), (0, Mp - M)))
    return tau


def sharded_lista_3d_fused_forward(model, params, y, sigma=None, *,
                                   mesh: Mesh, depth_axis: str = "depth",
                                   batch_axis: str | None = None,
                                   interpret: bool = False,
                                   z_dtype=jnp.bfloat16,
                                   return_z: bool = False):
    """Depth-sharded CDLNetVideo forward on the fused banded kernels.

    y: (N, C, D, H, W), D % (n_depth * s) == 0, H/W stride-divisible
    (callers run core.pre_process_3d upstream — fit/serve do). Returns
    (xhat, z or None) with y's shardings. Numerics match the single-device
    banded kernel per-frame (see module docstring).
    """
    from jax import shard_map

    s = model.s
    nD = mesh.shape[depth_axis]
    N, C, D, H, W = y.shape
    if D % (nD * s):
        raise ValueError(f"depth {D} must divide depth axis {nD} x stride {s}")
    if H % s or W % s:
        raise ValueError("H, W must be divisible by the stride (pre-pad upstream)")

    # mean handled by the caller (pre_process_3d outside shard_map: XLA
    # partitions the mean reduce across the mesh automatically)
    tau = _tau_table(model, params, sigma, N)
    pads = model.pad
    A2m_all = prep_A2m_3d(params["A"], s, pads).astype(z_dtype)
    K = params["A"].shape[0]
    Qd = _geometry3(model.P, s)[2]
    Mp = A2m_all.shape[1]
    Cp = C * s**3
    B2m_all = prep_B2m_3d(params["B"], s, pads).reshape(
        K, Qd, -1, Mp)

    bspec = batch_axis
    in_spec = P(bspec, None, depth_axis, None, None)
    tau_spec = P(bspec, None, None)
    use_ring = ring_depth_shard_supported(
        model, D, H, W, nD, z_bytes=jnp.dtype(z_dtype).itemsize)

    def local_fn(A2m, B2m, tau_l, ypl):
        Nl, _, Dl = ypl.shape[0], ypl.shape[1], ypl.shape[2]
        ops, pads_, hz, Dzl, Dce = _local_geometry(
            model, Nl, C, Dl, H, W, z_dtype, interpret)
        lo = _lo_index(depth_axis, nD, hz)
        ext = functools.partial(_extend, lo=lo, hz=hz, axis_name=depth_axis)
        crop = functools.partial(_crop, lo=lo, Dzl=Dzl)

        y2 = ops["to_bands"](pp.space_to_depth(ypl, s, 3))
        y2e = ext(y2)
        m2 = jnp.zeros((Nl, 1, 1, 1, 1), jnp.float32)

        z0 = jnp.zeros((Nl, Dce, ops["nb"], Mp, ops["Lb"]), z_dtype)
        z = ops["analyze"](-y2e.astype(jnp.float32), z0, A2m[0], tau_l[:, 0])

        def body(z, xs):
            A2m_k, B2m_k, tau_k = xs
            z = ext(crop(z))  # refresh halos with neighbors' kept frames
            r = ops["synthesize"](z, B2m_k, True, y2e, m2)
            z = ops["analyze"](r, z, A2m_k, tau_k)
            return z, None

        z, _ = lax.scan(
            body, z, (A2m[1:], B2m[1:], tau_l.transpose(1, 0, 2)[1:]))

        z = ext(crop(z))
        x2 = ops["synthesize"](z, B2m[0], False, y2e, m2)
        x5 = ops["from_bands"](crop(x2), Cp)
        xp = pp.depth_to_space(x5, s, 3, C)
        if return_z:
            zk = ops["from_bands"](crop(z).astype(jnp.float32), Mp)[:, :model.M]
            return xp, zk
        return xp, xp[:1, :1, :1, :1, :1] * 0.0  # placeholder, cropped away

    def local_fn_ring(A2m, B2m, tau_l, ypl):
        # ring kernels on the same halo-extended local windows: the
        # exactness argument is UNCHANGED (one ring iteration's reach is
        # the same z[d +- (Qd-1)] cone — it fuses the SAME iteration's
        # synthesis+analysis), so hz = Qd-1 halo frames still cover every
        # kept output's dependency cone
        from cdlnet_tpu.kernels.lista3d_ring import make_ring3_ops

        Nl, _, Dl = ypl.shape[0], ypl.shape[1], ypl.shape[2]
        P_, pads_, Qd, Qh, Qw, dlo, hlo, wlo, Hh = _geometry3(model.P, s)
        hz = Qd - 1
        Dzl = Dl // s
        Dce = Dzl + 2 * hz
        rops = make_ring3_ops(
            Nl, C, Dce, H // s, W // s, model.M, model.P, s,
            z_dtype=z_dtype, interpret=interpret, use_mask=False)
        lo = _lo_index(depth_axis, nD, hz)
        ext = functools.partial(_extend, lo=lo, hz=hz, axis_name=depth_axis)
        crop = functools.partial(_crop, lo=lo, Dzl=Dzl)

        B2m_r = B2m.reshape(K, Qd, -1, Mp)
        y2 = rops["to_ext_bands"](pp.space_to_depth(ypl, s, 3))
        y2e = ext(y2)
        m2e = jnp.zeros((Nl, 1, 1, 1, 1), jnp.float32)

        z = rops["first"](y2e, A2m[0], tau_l[:, 0])

        def body(z, xs):
            A2m_k, B2m_k, tau_k = xs
            z = ext(crop(z))  # refresh halos with neighbors' kept frames
            z = rops["mid"](z, y2e, m2e, B2m_k, A2m_k, tau_k)
            return z, None

        z, _ = lax.scan(
            body, z, (A2m[1:], B2m_r[1:], tau_l.transpose(1, 0, 2)[1:]))

        z = ext(crop(z))
        x2 = rops["last"](z, B2m_r[0])
        x5 = rops["from_bands"](crop(x2), Cp)
        xp = pp.depth_to_space(x5, s, 3, C)
        if return_z:
            zk = rops["from_bands"](
                crop(z).astype(jnp.float32), Mp)[:, :model.M]
            return xp, zk
        return xp, xp[:1, :1, :1, :1, :1] * 0.0  # placeholder, cropped away

    param_spec = P()
    fn = shard_map(
        local_fn_ring if use_ring else local_fn,
        mesh=mesh,
        in_specs=(param_spec, param_spec, tau_spec, in_spec),
        out_specs=(in_spec, in_spec),
        check_vma=False,
    )
    xp, z = fn(A2m_all, B2m_all, tau, y)
    return xp, (z if return_z else None)


def _spatialize(ops, xb, ch, s):
    """Banded (N, Dc', nb, ch, Lb) -> spatial (N, c, D', H, W)."""
    return pp.depth_to_space(ops["from_bands"](xb, ch), s, 3,
                             ch // s**3)


def make_sharded_fused_3d_train(model, mesh: Mesh, depth_axis: str,
                                interpret: bool = False,
                                z_dtype=jnp.bfloat16):
    """Differentiable depth-sharded fused forward:
    f(params, ypc, tau) -> xphat_local-assembled (N, C, D, H, W).

    ypc must be pre-processed (mean-subtracted, stride-divisible). The
    custom VJP stores kept-frame histories only (z in z_dtype, r fp32) —
    per-chip history = 1/n_depth of the single-chip banded training
    footprint — and reconstructs halos in the backward by re-exchanging
    them. Cotangents: dA/dB/dt exact vs the composed forward; dy exact
    (supports MC-SURE / perceptual losses).
    """
    from jax import shard_map

    s = model.s
    nD = mesh.shape[depth_axis]
    pads = model.pad
    Mdl = model

    def local_train(Aw, Bw, tau_l, ypl):
        Nl, C, Dl, H, W = ypl.shape
        K = Aw.shape[0]
        M = Aw.shape[1]
        Mp = -(-M // 8) * 8
        Cp = C * s**3
        # band picked at 4 bytes: the fp32 adjoint kernels share the band
        ops, _, hz, Dzl, Dce = _local_geometry(
            Mdl, Nl, C, Dl, H, W, z_dtype, interpret, z_bytes=4)
        ops32 = make_banded3_ops(
            Nl, C, Dce, H // s, W // s, M, Mdl.P, s,
            z_dtype=jnp.float32, interpret=interpret, band=ops["Bh"],
        )
        nb, Lb = ops["nb"], ops["Lb"]
        m2 = jnp.zeros((Nl, 1, 1, 1, 1), jnp.float32)
        zero_tau = jnp.zeros((Nl, Mp), jnp.float32)

        def lo_():
            return _lo_index(depth_axis, nD, hz)

        def ext(x, lo):
            return _extend(x, lo, hz, depth_axis)

        def crop(x, lo):
            return _crop(x, lo, Dzl)

        def fwd_impl(Aw, Bw, tau_l, y2):
            A2m = prep_A2m_3d(Aw, s, pads).astype(z_dtype)
            Qd = _geometry3(Mdl.P, s)[2]
            B2m = prep_B2m_3d(Bw, s, pads).reshape(K, Qd, -1, Mp)
            lo = lo_()
            y2e = ext(y2, lo)
            z0 = jnp.zeros((Nl, Dce, nb, Mp, Lb), z_dtype)
            z = ops["analyze"](-y2e.astype(jnp.float32), z0, A2m[0],
                               tau_l[:, 0])
            z_first = crop(z, lo)

            def body(z, xs):
                A2m_k, B2m_k, tau_k = xs
                z = ext(crop(z, lo), lo)
                r = ops["synthesize"](z, B2m_k, True, y2e, m2)
                zn = ops["analyze"](r, z, A2m_k, tau_k)
                return zn, (crop(zn, lo), crop(r, lo))

            z, (z_hist, r_hist) = lax.scan(
                body, z, (A2m[1:], B2m[1:], tau_l.transpose(1, 0, 2)[1:]))
            z_hist = jnp.concatenate([z_first[None], z_hist], axis=0)

            ze = ext(crop(z, lo), lo)
            x2 = ops["synthesize"](ze, B2m[0], False, y2e, m2)
            return crop(x2, lo), z_hist, r_hist

        @jax.custom_vjp
        def run(Aw, Bw, tau_l, y2):
            x2k, _, _ = fwd_impl(Aw, Bw, tau_l, y2)
            return x2k

        def run_fwd(Aw, Bw, tau_l, y2):
            x2k, z_hist, r_hist = fwd_impl(Aw, Bw, tau_l, y2)
            return x2k, (Aw, Bw, y2, z_hist, r_hist)

        def run_bwd(res, dx2k):
            # NB: every traced value used here must come from `res` or be
            # created locally — closing over arrays made in the forward
            # trace (m2, zero_tau above) leaks tracers across the vjp
            Aw, Bw, y2, z_hist, r_hist = res
            lo = lo_()
            Qd = _geometry3(Mdl.P, s)[2]
            m2_ = jnp.zeros((Nl, 1, 1, 1, 1), jnp.float32)
            zero_tau_ = jnp.zeros((Nl, Mp), jnp.float32)
            y2e_dummy = jnp.zeros((Nl, Dce, nb, Cp, Lb), jnp.float32)
            # transposed banks: A^T rides the synthesize kernel, B^T the
            # analyze kernel (conv <-> conv-transpose are exact adjoints)
            SA = prep_B2m_3d(Aw, s, pads).reshape(K, Qd, -1, Mp)
            AB = prep_A2m_3d(Bw, s, pads).astype(jnp.float32)

            def syn_T(g_kept, k_bank):
                """convT(g, A_k) on kept frames (g extended for the halo)."""
                ge = ext(g_kept, lo)
                return crop(
                    ops32["synthesize"](ge, k_bank, False, y2e_dummy, m2_), lo)

            def conv_B(x_kept, k_bank):
                """conv(x, B_k) on kept frames = -analyze(x_e, 0, bank, 0)."""
                xe = ext(x_kept, lo)
                zeros = jnp.zeros((Nl, Dce, nb, Mp, Lb), jnp.float32)
                return -crop(ops32["analyze"](xe, zeros, k_bank, zero_tau_), lo)

            def wgrad_conv(x_ext_banded, cot_kept_banded, w_like):
                """d/dw of conv3d(x, w, stride s): x (Cp-banded, EXT),
                cotangent (Mp-banded, KEPT) embedded at offset lo."""
                x_sp = _spatialize(ops32, x_ext_banded, Cp, s)
                cot = ops32["from_bands"](cot_kept_banded, Mp)[:, :M]
                canvas = jnp.zeros(
                    (Nl, M, Dce, H // s, W // s), jnp.float32)
                canvas = lax.dynamic_update_slice_in_dim(canvas, cot, lo, 2)
                f = lambda w: conv3d(x_sp, w, stride=s, padding=pads)
                (dw,) = jax.linear_transpose(f, w_like)(canvas)
                return dw

            def wgrad_convT(z_ext_banded, cot_kept_banded, w_like):
                """d/dw of conv_transpose3d(z, w): z (Mp-banded, EXT),
                cotangent (Cp-banded, KEPT) embedded at offset lo*s."""
                z_sp = ops32["from_bands"](z_ext_banded, Mp)[:, :M]
                cot_sp = _spatialize(ops32, cot_kept_banded, Cp, s)
                canvas = jnp.zeros((Nl, C, Dce * s, H, W), jnp.float32)
                canvas = lax.dynamic_update_slice_in_dim(
                    canvas, cot_sp, lo * s, 2)
                f = lambda w: conv_transpose3d(
                    z_sp, w, stride=s, padding=pads, output_padding=s - 1)
                (dw,) = jax.linear_transpose(f, w_like)(canvas)
                return dw

            wA = jnp.zeros_like(Aw[0])
            wB = jnp.zeros_like(Bw[0])
            f32 = functools.partial(jnp.asarray, dtype=jnp.float32)

            # final synthesis x2 = convT(z_{K-1}, B_0)
            dx = f32(dx2k)
            dz = conv_B(dx, AB[0])
            zlast_e = ext(z_hist[K - 1].astype(jnp.float32), lo)
            dB0 = wgrad_convT(zlast_e, dx, wB)

            dA = jnp.zeros_like(Aw)
            dB = jnp.zeros_like(Bw).at[0].add(dB0)
            dtau = jnp.zeros((K, Nl, Mp), jnp.float32)
            dy2 = jnp.zeros_like(y2)

            def step(carry, xs):
                dz, dA, dB, dtau, dy2 = carry
                k = xs  # K-1 .. 1
                zk = z_hist[k].astype(jnp.float32)
                g = dz * (zk != 0.0)
                dtk = -jnp.sum(
                    jnp.sign(zk) * g, axis=(1, 2, 4))  # (Nl, Mp)
                dtau = dtau.at[k].add(dtk)
                # u_k = conv(r_k, A_k); du = -g
                dr = -syn_T(g, SA[k])
                r_e = ext(r_hist[k - 1], lo)
                dA = dA.at[k].add(wgrad_conv(r_e, -g, wA))
                # r_k = convT(z_{k-1}, B_k) - y2
                dzp = conv_B(dr, AB[k])
                zprev_e = ext(z_hist[k - 1].astype(jnp.float32), lo)
                dB = dB.at[k].add(wgrad_convT(zprev_e, dr, wB))
                dy2 = dy2 - dr
                dz = g + dzp
                return (dz, dA, dB, dtau, dy2), None

            (dz, dA, dB, dtau, dy2), _ = lax.scan(
                step, (dz, dA, dB, dtau, dy2),
                jnp.arange(K - 1, 0, -1))

            # k = 0: z_0 = ST(conv(y2, A_0), tau_0)
            z0 = z_hist[0].astype(jnp.float32)
            g0 = dz * (z0 != 0.0)
            dtau = dtau.at[0].add(-jnp.sum(jnp.sign(z0) * g0, axis=(1, 2, 4)))
            dy2 = dy2 + syn_T(g0, SA[0])
            y2_e = ext(y2, lo)
            dA = dA.at[0].add(wgrad_conv(y2_e.astype(jnp.float32), g0, wA))

            return dA, dB, dtau.transpose(1, 0, 2), dy2

        run.defvjp(run_fwd, run_bwd)

        lo = lo_()
        y2 = ops["to_bands"](pp.space_to_depth(ypl, s, 3))
        x2k = run(Aw, Bw, tau_l, y2)
        x5 = ops["from_bands"](x2k, Cp)
        return pp.depth_to_space(x5, s, 3, C)

    return local_train


def make_sharded_ring_3d_train(model, mesh: Mesh, depth_axis: str,
                               interpret: bool = False,
                               z_dtype=jnp.bfloat16):
    """Depth-sharded ring TRAINING: the history-collecting ring forward on
    +-hz windows, the merged ring reverse (kernels/lista3d_ring_bwd) on
    +-2*hz windows, with a TRANSPOSE-exchange consolidating the running
    cotangent dv between reverse iterations.

    Why +-2*hz and a transpose-exchange: one merged reverse iteration
    spreads cotangent 2*(Qd-1) frames (ds reach Qd-1 composed with the dz
    stage's Qd-1 — there is no exchange point between the fused stages),
    so each shard computes its PARTIAL cotangents on a +-2hz window from
    its kept dv, and the linear_transpose of the forward's extend routes
    every window position's partial back to its owner and sums. Each
    (output, input) gradient term is counted exactly once — the owner of
    the nonzero dv entry computes it — so dA/dB/dtau partial sums psum to
    the exact single-device gradients (shard_map's transpose handles the
    psum of the replicated weight cotangents).

    The input cotangent dy2r comes from the reverse kernel's streamed ds
    outputs: r = vme*(part - y2e) and cot(r) = -stack-adj(A^T dv), so
    dy2e = -vme*cot(r) = -ds per iteration; the k=0 analysis term (the
    first kernel consumed r_0 = -y2, same sign) is produced by one extra
    ds-stage call on dv_0.

    Reference: gradients of model/net.py:121-227 under train3d.py:35-152;
    the banded counterpart is make_sharded_fused_3d_train above.
    """
    from cdlnet_tpu.kernels.lista3d_ring import make_ring3_ops
    from cdlnet_tpu.kernels.lista3d_ring_bwd import (
        make_ring3_bwd_ops,
        pick_band_ring_train,
    )

    s = model.s
    nD = mesh.shape[depth_axis]
    pads = model.pad
    Mdl = model

    def local_train(Aw, Bw, tau_l, ypl):
        Nl, C, Dl, H, W = ypl.shape
        K, M = Aw.shape[0], Aw.shape[1]
        Mp = -(-M // 8) * 8
        Cp = C * s**3
        P_, pads_, Qd, Qh, Qw, dlo, hlo, wlo, Hh = _geometry3(Mdl.P, s)
        hz = Qd - 1
        hz2 = 2 * hz
        Dzl = Dl // s
        Dce = Dzl + 2 * hz
        Dce2 = Dzl + 2 * hz2
        Hc, Wct = H // s, W // s
        hb = jnp.dtype(z_dtype).itemsize
        Bh = pick_band_ring_train(M, C, Mdl.P, s, Dce2, Hc, Wct,
                                  hist_bytes=hb)
        fops = make_ring3_ops(
            Nl, C, Dce, Hc, Wct, M, Mdl.P, s, z_dtype=z_dtype,
            interpret=interpret, band=Bh, use_mask=False,
            return_hists=True, w128=False)  # training pad (16-multiple)
        bops = make_ring3_bwd_ops(
            Nl, C, Dce2, Hc, Wct, M, Mdl.P, s, band=Bh,
            hist_dtype=z_dtype, use_mask=False, interpret=interpret,
            with_ds=True)
        nb, Lb, Lwr = fops["nb"], fops["Lb"], fops["Lwr"]

        def lo_(h):
            return _lo_index(depth_axis, nD, h)

        def ext(x, lo, h):
            return _extend(x, lo, h, axis_name=depth_axis)

        def crop(x, lo):
            return _crop(x, lo, Dzl)

        def fwd_impl(Aw, Bw, tau_l, y2r):
            A2m = prep_A2m_3d(Aw, s, pads).astype(z_dtype)
            B2m = prep_B2m_3d(Bw, s, pads).reshape(K, Qd, -1, Mp)
            lo = lo_(hz)
            y2e = ext(y2r, lo, hz)
            m2e = jnp.zeros((Nl, 1, 1, 1, 1), jnp.float32)
            z = fops["first"](y2e, A2m[0], tau_l[:, 0])
            z_first = crop(z, lo)

            def body(z, xs):
                A2m_k, B2m_k, tau_k = xs
                z = ext(crop(z, lo), lo, hz)
                z, r_ext = fops["mid"](z, y2e, m2e, B2m_k, A2m_k, tau_k)
                return z, (crop(z, lo), crop(r_ext, lo))

            z, (z_hist, r_hist) = lax.scan(
                body, z, (A2m[1:], B2m[1:], tau_l.transpose(1, 0, 2)[1:]))
            z_hist = jnp.concatenate([z_first[None], z_hist], axis=0)

            ze = ext(crop(z, lo), lo, hz)
            x2 = fops["last"](ze, B2m[0])
            return crop(x2, lo), z_hist, r_hist

        @jax.custom_vjp
        def run(Aw, Bw, tau_l, y2r):
            x2k, _, _ = fwd_impl(Aw, Bw, tau_l, y2r)
            return x2k

        def run_fwd(Aw, Bw, tau_l, y2r):
            x2k, z_hist, r_hist = fwd_impl(Aw, Bw, tau_l, y2r)
            return x2k, (Aw, Bw, y2r, z_hist, r_hist)

        def run_bwd(res, dx2k):
            # every traced value used here must come from res or be made
            # locally (custom_vjp bwd must not close over fwd-trace arrays)
            Aw, Bw, y2r, z_hist, r_hist = res
            lo2 = lo_(hz2)
            A2m, vjpA = jax.vjp(lambda w: prep_A2m_3d(w, s, pads), Aw)
            B2m, vjpB = jax.vjp(lambda w: prep_B2m_3d(w, s, pads), Bw)
            A_syn, B_ana = bops["prep_banks"](A2m, B2m)
            m2e_ = jnp.zeros((Nl, 1, 1, 1, 1), jnp.float32)
            cv0 = jnp.zeros((Nl, 1, 1), jnp.float32)
            rfull = jnp.concatenate(
                [-y2r.astype(jnp.float32)[None], r_hist], axis=0)

            def embed2(x_kept):
                canvas = jnp.zeros(
                    (Nl, Dce2) + x_kept.shape[2:], x_kept.dtype)
                return lax.dynamic_update_slice_in_dim(
                    canvas, x_kept, lo2, 1)

            def ext2(x_kept):
                return ext(x_kept, lo2, hz2)

            def ext2T(x_e, ch, L, dtype=jnp.float32):
                like = jax.ShapeDtypeStruct(
                    (Nl, Dzl, nb, ch, L), dtype)
                (out,) = jax.linear_transpose(ext2, like)(x_e)
                return out

            # g0: kept x2 cotangent -> extended-row bands, embedded at lo2
            g0_sp = fops["from_bands"](dx2k.astype(jnp.float32), Cp)
            g0e = embed2(bops["to_ext_bands"](g0_sp))

            dv, dA_last, dB_first, dt_last = bops["rb_init"](
                g0e, ext2(rfull[K - 1]), ext2(z_hist[K - 1]),
                B_ana[0], cv0)

            dy2r = jnp.zeros(
                (Nl, Dzl, nb, Cp, Lwr), jnp.float32)

            def body(carry, xs):
                dv, dy2r = carry
                asyn_k, bana_k, zkm1, rkm1 = xs
                # consolidate: route every window position's partial back
                # to its owner, sum, re-seed zero-at-halo
                dv_kept = ext2T(dv, Mp, Lb)
                dv2, dAkm1, dBk, dtkm1, ds_e = bops["rb_mid"](
                    embed2(dv_kept), m2e_, ext2(rkm1), ext2(zkm1),
                    asyn_k, bana_k, cv0)
                # dy2e = -ds: cot(r) = -stack-adj(A^T dv), and
                # dy2e = -vme*cot(r) = +stack-adj(...) = -ds
                dy2r = dy2r - ext2T(ds_e, Cp, Lwr)
                dAkm1, dBk, dtkm1 = jax.lax.optimization_barrier(
                    (dAkm1, dBk, dtkm1))
                return (dv2, dy2r), (dAkm1, dBk, dtkm1)

            if K > 1:
                xs = (A_syn[:0:-1], B_ana[:0:-1],
                      z_hist[K - 2::-1], rfull[K - 2::-1])
                (dv, dy2r), (dAs, dBs, dts) = lax.scan(
                    body, (dv, dy2r), xs)
                dA2m = jnp.concatenate([dAs[::-1], dA_last[None]], axis=0)
                dB_ana = jnp.concatenate([dB_first[None], dBs[::-1]],
                                         axis=0)
                dt01 = jnp.concatenate([dts[::-1], dt_last[None]], axis=0)
            else:
                dA2m = dA_last[None]
                dB_ana = dB_first[None]
                dt01 = dt_last[None]

            # k = 0 input term: the first kernel consumed r_0 = -y2, so
            # dy2e -= ds0 (opposite sign; one extra ds-stage call on dv_0)
            dv0 = embed2(ext2T(dv, Mp, Lb))
            _, _, _, _, ds0_e = bops["rb_mid"](
                dv0, m2e_, ext2(rfull[0]), ext2(z_hist[0]),
                A_syn[0], B_ana[0], cv0)
            dy2r = dy2r - ext2T(ds0_e, Cp, Lwr)

            dA2m = jnp.sum(dA2m, axis=1)  # (K, Mp, T*Cp)
            dB2m = (
                jnp.sum(dB_ana, axis=1)
                .reshape(K, Mp, Qd, -1)[:, :, ::-1]  # un-reverse taps
                .transpose(0, 2, 3, 1)
            )
            dA = vjpA(dA2m.astype(A2m.dtype))[0]
            dB = vjpB(dB2m.astype(B2m.dtype))[0]
            dtau = dt01[:, :, 0, :]  # (K, Nl, Mp): row = the tau cotangent
            return dA, dB, dtau.transpose(1, 0, 2), dy2r.astype(y2r.dtype)

        run.defvjp(run_fwd, run_bwd)

        y2r = fops["to_ext_bands"](pp.space_to_depth(ypl, s, 3))
        x2k = run(Aw, Bw, tau_l, y2r)
        x5 = fops["from_bands"](x2k, Cp)
        return pp.depth_to_space(x5, s, 3, C)

    return local_train


def sharded_fused_3d_train_forward(model, params, ypc, sigma, *, mesh: Mesh,
                                   depth_axis: str = "depth",
                                   batch_axis: str | None = None,
                                   interpret: bool = False,
                                   z_dtype=jnp.bfloat16):
    """Differentiable depth-sharded forward on pre-processed input ypc
    (mean-subtracted, stride-divisible — run core.pre_process_3d upstream
    and post_process_3d on the result). Returns xphat. Routes to the ring
    kernels (forward + merged reverse) where they fit, else the banded
    kernels + XLA weight-grad contractions."""
    from jax import shard_map

    N = ypc.shape[0]
    D, H, W = ypc.shape[-3], ypc.shape[-2], ypc.shape[-1]
    tau = _tau_table(model, params, sigma, N)
    nD = mesh.shape[depth_axis]
    if ring_depth_shard_train_supported(
            model, D, H, W, nD, hist_bytes=jnp.dtype(z_dtype).itemsize):
        local = make_sharded_ring_3d_train(
            model, mesh, depth_axis, interpret=interpret, z_dtype=z_dtype)
    else:
        local = make_sharded_fused_3d_train(
            model, mesh, depth_axis, interpret=interpret, z_dtype=z_dtype)

    in_spec = P(batch_axis, None, depth_axis, None, None)
    tau_spec = P(batch_axis, None, None)
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), tau_spec, in_spec),
        out_specs=in_spec,
        check_vma=False,
    )
    return fn(params["A"], params["B"], tau, ypc)
