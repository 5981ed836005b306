"""Merged ring reverse for big-frame 3D training (kernels/lista3d_ring_bwd):
gradient parity vs the XLA scan's autodiff in interpret mode (f32
histories), across the geometry classes the kernel dispatches on —
multi-band halo crossings, the 128-multiple lane-class path, masked JDD,
per-sample sigma, (9,9,5) taps, stride 1, K=1 — plus routing: big-frame
training prefers 'ring_train' and falls back to 'tiled_train'/XLA.

Reference semantics: gradients of model/net.py:121-227 (CDLNetVideo)
under the train3d.py:35-152 protocol.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cdlnet_tpu.core.ops import ST
from cdlnet_tpu.kernels.lista3d_ring import lista3d_ring
from cdlnet_tpu.kernels.lista3d_ring_bwd import (
    lista3d_ring_bwd_supported,
    lista3d_ring_fused_bwd,
    pick_band_ring_train,
)
from cdlnet_tpu.models import CDLNetVideo
from cdlnet_tpu.models.base import build_model
from cdlnet_tpu.ops.conv import conv3d, conv_transpose3d


def _setup(N, C, D, H, W, K, M, P, s, use_mask, seed=0):
    rng = np.random.default_rng(seed)
    model = CDLNetVideo(K=K, M=M, P=P, s=s, adaptive=True, C=C)
    params = model.init(jax.random.PRNGKey(seed), init=True)
    yp = jnp.asarray(rng.standard_normal((N, C, D, H, W)).astype(np.float32)) * 0.3
    c = jnp.asarray(
        rng.uniform(0.05, 0.15, (N,)).astype(np.float32)
    ).reshape(N, 1, 1, 1, 1)
    mask = (
        jnp.asarray((rng.random((1, C, 1, H, W)) > 0.3).astype(np.float32))
        if use_mask else None
    )
    gx = jnp.asarray(rng.standard_normal((N, C, D, H, W)).astype(np.float32))
    return params["A"], params["B"], params["t"], yp, c, mask, gx


def _xla_grads(A, B, t, yp, c, mask, gx, P, s, K):
    pads = tuple(p // 2 for p in (P if not isinstance(P, int) else (P,) * 3))

    def fwd(args):
        A_, B_, t_ = args

        def thr(k):
            return t_[k, 0] + c * t_[k, 1]

        zk = ST(conv3d(yp, A_[0], stride=s, padding=pads), thr(0))
        for k in range(1, K):
            syn = conv_transpose3d(zk, B_[k], stride=s, padding=pads,
                                   output_padding=s - 1)
            r = (mask * syn if mask is not None else syn) - yp
            zk = ST(zk - conv3d(r, A_[k], stride=s, padding=pads), thr(k))
        return conv_transpose3d(zk, B_[0], stride=s, padding=pads,
                                output_padding=s - 1)

    x, vjp = jax.vjp(fwd, (A, B, t))
    return x, vjp(gx)[0]


@pytest.mark.parametrize(
    "name,N,C,D,H,W,K,M,P,s,band,use_mask",
    [
        ("multiband", 1, 1, 8, 64, 40, 3, 8, (5, 5, 3), 2, 8, False),
        ("lane128", 1, 1, 8, 32, 248, 3, 8, (5, 5, 3), 2, None, False),
        ("masked_batch", 2, 1, 8, 32, 40, 3, 8, (5, 5, 3), 2, None, True),
        ("taps995", 1, 1, 12, 40, 40, 2, 8, (9, 9, 5), 2, None, False),
        ("stride1", 1, 1, 6, 24, 24, 3, 6, (3, 3, 3), 1, None, False),
        ("K1", 1, 1, 8, 32, 40, 1, 8, (5, 5, 3), 2, None, False),
    ],
)
def test_ring_bwd_grads_match_xla(name, N, C, D, H, W, K, M, P, s, band,
                                  use_mask):
    A, B, t, yp, c, mask, gx = _setup(N, C, D, H, W, K, M, P, s, use_mask)
    x_ref, (dA_r, dB_r, dt_r) = _xla_grads(A, B, t, yp, c, mask, gx, P, s, K)

    x, _, (zh, rh) = lista3d_ring(
        yp, A, B, t, c, stride=s, mask=mask, return_z=False,
        z_dtype=jnp.float32, interpret=True, return_hists=True, band=band,
    )
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref), atol=1e-4)
    dA, dB, dt = lista3d_ring_fused_bwd(
        gx, yp, A, B, t, c, mask, zh, rh, stride=s, interpret=True)
    for nm, a, b in [("dA", dA, dA_r), ("dB", dB, dB_r), ("dt", dt, dt_r)]:
        rel = float(jnp.abs(a - b).max()) / (float(jnp.abs(b).max()) + 1e-12)
        assert rel < 1e-5, (name, nm, rel)


def test_ring_train_gate_covers_native_frames():
    """The reference's native eval frames (DAVIS 480x854, fastMRI
    640x368) train through the merged ring reverse; half-native too."""
    assert lista3d_ring_bwd_supported(169, 1, (7, 7, 5), 2, 30, 16, 480, 854)
    assert lista3d_ring_bwd_supported(169, 1, (7, 7, 5), 2, 30, 16, 480, 432)
    assert lista3d_ring_bwd_supported(169, 1, (9, 9, 5), 2, 30, 30, 640, 368)
    # stride-indivisible frames stay on XLA
    assert not lista3d_ring_bwd_supported(169, 1, (7, 7, 5), 2, 30,
                                          16, 481, 854)


def test_ring_train_routing(monkeypatch):
    """Big-frame training prefers 'ring_train'; CDLNET_LISTA3D_RING_BWD=0
    falls back to 'tiled_train'; both closed -> XLA (None)."""
    import cdlnet_tpu.kernels.autodiff as ad

    cfg = {"K": 2, "M": 8, "P": (5, 5, 3), "s": 2, "C": 1,
           "adaptive": True, "depth": 8, "backend": "pallas"}
    m = build_model("CDLNetVideo", dict(cfg))
    params = m.init(jax.random.PRNGKey(0), init=False)
    yp = jnp.zeros((1, 1, 8, 32, 32), jnp.float32)
    # whole-frame fused fits at toy size and outranks the big-frame paths
    assert m._pallas_path(params, yp, return_z=False, train=True) == "fused"
    monkeypatch.setattr(ad, "lista3d_train_supported", lambda *a, **kw: False)
    assert (m._pallas_path(params, yp, return_z=False, train=True)
            == "ring_train")
    monkeypatch.setenv("CDLNET_LISTA3D_RING_BWD", "0")
    assert (m._pallas_path(params, yp, return_z=False, train=True)
            == "tiled_train")
    monkeypatch.setattr(ad, "lista3d_tiled_train_supported",
                        lambda *a, **kw: False)
    assert m._pallas_path(params, yp, return_z=False, train=True) is None


def test_ring_diff_end_to_end_grads(monkeypatch):
    """lista3d_ring_diff's custom VJP (ring hist-collecting forward +
    merged ring reverse) matches XLA value-and-grad end-to-end at fp32
    histories."""
    monkeypatch.setenv("CDLNET_HIST_DTYPE", "f32")
    from cdlnet_tpu.kernels.autodiff import lista3d_ring_diff

    N, C, D, H, W, K, M, P, s = 2, 1, 8, 64, 16, 2, 8, (5, 5, 3), 2
    A, B, t, yp, c, mask, gx = _setup(N, C, D, H, W, K, M, P, s, False)
    x_ref, (dA_r, dB_r, dt_r) = _xla_grads(A, B, t, yp, c, mask, gx, P, s, K)

    def loss(args):
        A_, B_, t_ = args
        return jnp.sum(
            lista3d_ring_diff(yp, A_, B_, t_, c, stride=s, interpret=True)
            * gx)

    val, (dA, dB, dt) = jax.value_and_grad(loss)((A, B, t))
    np.testing.assert_allclose(float(val), float(jnp.sum(x_ref * gx)),
                               rtol=1e-5)
    for nm, a, b in [("dA", dA, dA_r), ("dB", dB, dB_r), ("dt", dt, dt_r)]:
        rel = float(jnp.abs(a - b).max()) / (float(jnp.abs(b).max()) + 1e-12)
        assert rel < 1e-5, (nm, rel)


def test_ring_fwd_hists_consistent():
    """return_hists does not perturb the forward, and the joint training
    band pick admits a band for the flagship geometries."""
    N, C, D, H, W, K, M, P, s = 1, 1, 8, 32, 40, 3, 8, (5, 5, 3), 2
    A, B, t, yp, c, mask, gx = _setup(N, C, D, H, W, K, M, P, s, False)
    x0, _ = lista3d_ring(yp, A, B, t, c, stride=s, return_z=False,
                         z_dtype=jnp.float32, interpret=True)
    x1, _, (zh, rh) = lista3d_ring(yp, A, B, t, c, stride=s, return_z=False,
                                   z_dtype=jnp.float32, interpret=True,
                                   return_hists=True)
    np.testing.assert_array_equal(np.asarray(x0), np.asarray(x1))
    assert zh.shape[0] == K and rh.shape[0] == K - 1
    assert pick_band_ring_train(169, 1, (7, 7, 5), 2, 8, 240, 427) is not None
