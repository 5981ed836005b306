"""Fused Pallas LISTA kernel (kernels/lista2d.py): interpret-mode parity vs
the XLA scan path, VMEM-fit predicate, and the CDLNet pallas backend."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cdlnet_tpu.kernels.lista2d import lista2d_fused, lista2d_fused_supported
from cdlnet_tpu.models import build_model
from cdlnet_tpu.ops.conv import conv_transpose2d
from cdlnet_tpu.ops.lista import lista_2d


def _mk(s, P, C, M, K, H=16, W=16, seed=0):
    key = jax.random.PRNGKey(seed)
    yp = jax.random.normal(key, (2, C, H, W), jnp.float32) * 0.3
    A = 0.1 * jax.random.normal(jax.random.fold_in(key, 1), (K, M, C, P, P), jnp.float32)
    B = 0.1 * jax.random.normal(jax.random.fold_in(key, 2), (K, M, C, P, P), jnp.float32)
    t = 0.02 * jnp.abs(jax.random.normal(jax.random.fold_in(key, 3), (K, 2, M, 1, 1)))
    return yp, A, B, t


@pytest.mark.parametrize(
    "s,P,C,M,K,use_mask",
    [(2, 7, 1, 13, 4, False), (1, 5, 1, 6, 3, False),
     (2, 7, 3, 8, 3, True), (2, 5, 2, 6, 2, False)],
)
def test_fused_matches_scan_interpret(s, P, C, M, K, use_mask):
    yp, A, B, t = _mk(s, P, C, M, K)
    c = jnp.asarray([0.1, 0.2]).reshape(2, 1, 1, 1)  # per-sample sigma scale
    mask = (
        (jax.random.uniform(jax.random.PRNGKey(9), yp.shape) > 0.5).astype(jnp.float32)
        if use_mask
        else None
    )
    z_ref = lista_2d(yp, A, B, t, c, mask=mask, stride=s)
    x_ref = conv_transpose2d(
        z_ref, B[0], stride=s, padding=(P - 1) // 2, output_padding=s - 1
    )
    x_got, z_got = lista2d_fused(
        yp, A, B, t, c, stride=s, mask=mask, return_z=True, interpret=True
    )
    np.testing.assert_allclose(np.asarray(z_got), np.asarray(z_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(x_got), np.asarray(x_ref), atol=1e-5)


def test_fused_return_z_false():
    yp, A, B, t = _mk(2, 7, 1, 8, 2)
    x1, z = lista2d_fused(yp, A, B, t, 0.1, stride=2, return_z=True, interpret=True)
    x2, none = lista2d_fused(yp, A, B, t, 0.1, stride=2, return_z=False, interpret=True)
    assert none is None and z is not None
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), atol=1e-6)


def test_supported_predicate():
    # flagship 2D config on a 128x128 training patch: fits, with and without z
    assert lista2d_fused_supported(169, 1, 7, 2, 30, 128, 128, return_z=False)
    assert lista2d_fused_supported(169, 1, 7, 2, 30, 128, 128, return_z=True)
    # 512x512 eval image: does not fit -> XLA fallback
    assert not lista2d_fused_supported(169, 1, 7, 2, 30, 512, 512)
    # odd size: polyphase premise broken
    assert not lista2d_fused_supported(169, 1, 7, 2, 30, 127, 128)


def test_cdlnet_pallas_backend_interpret(monkeypatch):
    """backend='pallas' routes apply() through the fused kernel and falls
    back to XLA on unsupported shapes; outputs match the XLA backend."""
    import cdlnet_tpu.kernels.lista2d as k2d

    # force interpret mode so the test runs on CPU
    orig = k2d.lista2d_fused
    monkeypatch.setattr(
        k2d, "lista2d_fused", lambda *a, **kw: orig(*a, **{**kw, "interpret": True})
    )
    cfg = {"K": 3, "M": 8, "P": 7, "s": 2, "C": 1, "adaptive": True}
    mx = build_model("CDLNet", dict(cfg))
    mp = build_model("CDLNet", dict(cfg, backend="pallas"))
    params = mx.init(jax.random.PRNGKey(0), init=True)
    y = jax.random.uniform(jax.random.PRNGKey(1), (1, 1, 32, 32), jnp.float32)
    x_ref, z_ref = mx.apply(params, y, 25.0)
    x_got, z_got = mp.apply(params, y, 25.0, return_z=True)
    np.testing.assert_allclose(np.asarray(x_got), np.asarray(x_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(z_got), np.asarray(z_ref), atol=1e-5)
    # odd input size exercises pre_process padding then the kernel
    y_odd = y[:, :, :31, :29]
    x_odd, _ = mp.apply(params, y_odd, 25.0, return_z=False)
    assert x_odd.shape == y_odd.shape


# ---------------------------------------------------------------------------
# 3D fused per-iteration kernels (kernels/lista3d.py)
# ---------------------------------------------------------------------------

from cdlnet_tpu.kernels.lista3d import lista3d_fused, lista3d_fused_supported
from cdlnet_tpu.ops.conv import conv_transpose3d
from cdlnet_tpu.ops.lista import lista_3d


def _mk3d(s, P, C, M, K, shape, seed=0):
    key = jax.random.PRNGKey(seed)
    yp = jax.random.normal(key, shape, jnp.float32) * 0.3
    A = 0.1 * jax.random.normal(jax.random.fold_in(key, 1), (K, M, C, *P), jnp.float32)
    B = 0.1 * jax.random.normal(jax.random.fold_in(key, 2), (K, M, C, *P), jnp.float32)
    t = 0.02 * jnp.abs(jax.random.normal(jax.random.fold_in(key, 3), (K, 2, M, 1, 1, 1)))
    return yp, A, B, t


@pytest.mark.parametrize("use_mask,P", [(False, (7, 7, 5)), (True, (7, 7, 5)),
                                        (False, (9, 9, 5))])  # MRI config taps
def test_fused3d_fp32_matches_scan_interpret(use_mask, P):
    s, C, M, K = 2, 1, 13, 3
    shape = (2, 1, 8, 16, 16)
    yp, A, B, t = _mk3d(s, P, C, M, K, shape)
    c = jnp.asarray([0.1, 0.2]).reshape(2, 1, 1, 1, 1)
    mask = (
        (jax.random.uniform(jax.random.PRNGKey(9), shape) > 0.5).astype(jnp.float32)
        if use_mask
        else None
    )
    z_ref = lista_3d(yp, A, B, t, c, mask=mask, stride=s)
    pads = tuple(p // 2 for p in P)
    x_ref = conv_transpose3d(
        z_ref, B[0], stride=s, padding=pads, output_padding=s - 1
    )
    x_got, z_got = lista3d_fused(
        yp, A, B, t, c, stride=s, mask=mask, z_dtype=jnp.float32, interpret=True
    )
    np.testing.assert_allclose(np.asarray(z_got), np.asarray(z_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(x_got), np.asarray(x_ref), atol=1e-4)


@pytest.mark.parametrize("use_mask,P,s", [(False, (7, 7, 5), 2),
                                          (True, (5, 5, 3), 2),
                                          (False, (5, 5, 3), 1)])
def test_fused3d_preroll_matches_scan_interpret(use_mask, P, s, monkeypatch):
    """CDLNET_LISTA3D_PREROLL=1: the resident kernel's hoisted
    rolled-copies analysis (one roll+mask pass per r frame, window dot)
    is bit-identical in interpret mode to the per-(frame, depth-tap)
    stack build, and stays within the scan tolerance."""
    import cdlnet_tpu.kernels.lista3d as k3

    C, M, K = 1, 13, 3
    shape = (2, 1, 8, 16, 16)
    yp, A, B, t = _mk3d(s, P, C, M, K, shape)
    c = jnp.asarray([0.1, 0.2]).reshape(2, 1, 1, 1, 1)
    mask = (
        (jax.random.uniform(jax.random.PRNGKey(9), shape) > 0.5).astype(jnp.float32)
        if use_mask
        else None
    )
    monkeypatch.setenv("CDLNET_LISTA3D_PREROLL", "0")
    x_base, z_base = lista3d_fused(
        yp, A, B, t, c, stride=s, mask=mask, z_dtype=jnp.float32, interpret=True
    )

    # pin the route: preroll lives in the RESIDENT kernel only — fail loudly
    # if these shapes ever fall to the iteration-pair path, where the env
    # flag is a no-op and this test would pass vacuously
    def _no_pair(*a, **kw):
        raise AssertionError("iteration-pair path taken; resident expected")

    monkeypatch.setattr(k3, "_kernel_ana", _no_pair)
    monkeypatch.setattr(k3, "_kernel_syn", _no_pair)
    monkeypatch.setenv("CDLNET_LISTA3D_PREROLL", "1")
    x_got, z_got = lista3d_fused(
        yp, A, B, t, c, stride=s, mask=mask, z_dtype=jnp.float32, interpret=True
    )
    # bit-exact vs the non-preroll resident kernel (same dot shapes and
    # reduction order; only the roll/mask schedule differs)
    np.testing.assert_array_equal(np.asarray(x_got), np.asarray(x_base))
    np.testing.assert_array_equal(np.asarray(z_got), np.asarray(z_base))

    z_ref = lista_3d(yp, A, B, t, c, mask=mask, stride=s)
    pads = tuple(p // 2 for p in P)
    x_ref = conv_transpose3d(
        z_ref, B[0], stride=s, padding=pads, output_padding=s - 1
    )
    np.testing.assert_allclose(np.asarray(z_got), np.asarray(z_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(x_got), np.asarray(x_ref), atol=1e-4)


def test_fused3d_bf16_carry_tolerance():
    """bf16 code carry stays within ~1% relative of the fp32 scan."""
    s, P, C, M, K = 2, (5, 5, 5), 1, 9, 3
    shape = (1, 1, 8, 16, 16)
    yp, A, B, t = _mk3d(s, P, C, M, K, shape)
    z_ref = lista_3d(yp, A, B, t, 0.1, stride=s)
    x_ref = conv_transpose3d(
        z_ref, B[0], stride=s, padding=(2, 2, 2), output_padding=s - 1
    )
    x_got, _ = lista3d_fused(yp, A, B, t, 0.1, stride=s, interpret=True)
    rel = float(jnp.abs(x_got - x_ref).max() / (jnp.abs(x_ref).max() + 1e-9))
    assert rel < 0.01, rel


def test_fused3d_supported_predicate():
    assert lista3d_fused_supported(169, 1, (7, 7, 5), 2, 30, 16, 128, 128)
    # residual-block variant takes the XLA path
    assert not lista3d_fused_supported(
        169, 1, (7, 7, 5), 2, 30, 16, 128, 128, residual={"conv1": None}
    )
    # stride-indivisible depth
    assert not lista3d_fused_supported(169, 1, (7, 7, 5), 2, 30, 15, 128, 128)


def test_fused3d_gate_bounds():
    """The forward pair gate also bounds the per-block z size: inside the
    iteration lax.scan XLA stack-allocates the blocked z double-buffered
    against a NON-overridable 16 MB scoped-vmem limit, and 240x432 (z
    block 176x25920 bf16 = 9.1 MB) measured a hard compile error on
    hardware ("scoped allocation 19.03M > 16M"). Such shapes must band
    (kernels/lista3d_tiled), not crash. The training path additionally
    gates on the reverse kernels (lista3d_train_supported; ADVICE r1) —
    the gate logic is pinned by test_video_train_gate_requires_bwd_fit."""
    from cdlnet_tpu.kernels.lista3d_bwd import lista3d_bwd_supported
    from cdlnet_tpu.kernels.lista3d_tiled import lista3d_tiled_supported

    cfg = dict(M=169, C=1, P=(7, 7, 5), s=2, K=30)
    # flagship train shapes fit both forward and reverse
    assert lista3d_fused_supported(
        cfg["M"], cfg["C"], cfg["P"], cfg["s"], cfg["K"], 16, 128, 128, z_bytes=4
    )
    assert lista3d_bwd_supported(
        cfg["M"], cfg["C"], cfg["P"], cfg["s"], cfg["K"], 16, 128, 128
    )
    # the measured scoped-vmem compile failure: excluded, bands instead
    assert not lista3d_fused_supported(
        cfg["M"], cfg["C"], cfg["P"], cfg["s"], cfg["K"], 16, 240, 432
    )
    assert lista3d_tiled_supported(
        cfg["M"], cfg["C"], cfg["P"], cfg["s"], cfg["K"], 16, 240, 432
    )
    # stride-indivisible
    assert not lista3d_bwd_supported(
        cfg["M"], cfg["C"], cfg["P"], cfg["s"], cfg["K"], 15, 128, 128
    )


def test_cdlnet_video_pallas_backend_interpret(monkeypatch):
    import cdlnet_tpu.kernels.lista3d as k3d

    orig = k3d.lista3d_fused
    monkeypatch.setattr(
        k3d, "lista3d_fused", lambda *a, **kw: orig(*a, **{**kw, "interpret": True})
    )
    cfg = {"K": 2, "M": 6, "P": (5, 5, 3), "s": 2, "C": 1, "adaptive": True, "depth": 8}
    mx = build_model("CDLNetVideo", dict(cfg))
    mp = build_model("CDLNetVideo", dict(cfg, backend="pallas"))
    params = mx.init(jax.random.PRNGKey(0), init=False)
    params["A"] = params["A"] * 0.05
    params["B"] = params["B"] * 0.05
    params["t"] = jnp.abs(params["t"]) * 0.05 + 1e-3
    y = jax.random.uniform(jax.random.PRNGKey(1), (1, 1, 8, 16, 16), jnp.float32)
    x_ref, z_ref = mx.apply(params, y, 25.0)
    x_got, z_got = mp.apply(params, y, 25.0)
    assert z_got.shape == z_ref.shape
    np.testing.assert_allclose(np.asarray(x_got), np.asarray(x_ref), atol=5e-3)
    # residual variant falls back to XLA identically
    cfgr = dict(cfg, residual=True, backend="pallas")
    mr = build_model("CDLNetVideo", cfgr)
    pr = mr.init(jax.random.PRNGKey(0), init=False)
    xr, _ = mr.apply(pr, y, 25.0)
    assert xr.shape == y.shape


def test_gdlnet_pallas_backend_interpret(monkeypatch):
    """GDLNet's gabor-synthesized banks run through the same fused kernel."""
    import cdlnet_tpu.kernels.lista2d as k2d

    orig = k2d.lista2d_fused
    monkeypatch.setattr(
        k2d, "lista2d_fused", lambda *a, **kw: orig(*a, **{**kw, "interpret": True})
    )
    cfg = {"K": 2, "M": 8, "P": 7, "s": 2, "C": 1, "adaptive": True, "order": 1}
    mx = build_model("GDLNet", dict(cfg))
    mp = build_model("GDLNet", dict(cfg, backend="pallas"))
    params = mx.init(jax.random.PRNGKey(0), init=True)
    y = jax.random.uniform(jax.random.PRNGKey(1), (1, 1, 32, 32), jnp.float32)
    x_ref, _ = mx.apply(params, y, 25.0)
    x_got, _ = mp.apply(params, y, 25.0)
    np.testing.assert_allclose(np.asarray(x_got), np.asarray(x_ref), atol=1e-5)


def test_pallas_backend_trainable(monkeypatch):
    """backend='pallas' with return_z=False is differentiable: custom VJP
    runs the fused forward (with code history) and the fused reverse
    kernel; grads match the pure XLA backend (fp32-history mode)."""
    monkeypatch.setenv("CDLNET_HIST_DTYPE", "f32")
    import cdlnet_tpu.kernels.lista2d as k2d

    orig = k2d.lista2d_fused
    monkeypatch.setattr(
        k2d, "lista2d_fused", lambda *a, **kw: orig(*a, **{**kw, "interpret": True})
    )
    origb = k2d.lista2d_fused_bwd
    monkeypatch.setattr(
        k2d, "lista2d_fused_bwd",
        lambda *a, **kw: origb(*a, **{**kw, "interpret": True}),
    )
    cfg = {"K": 3, "M": 8, "P": 5, "s": 2, "C": 1, "adaptive": True}
    mx = build_model("CDLNet", dict(cfg))
    mp = build_model("CDLNet", dict(cfg, backend="pallas"))
    params = mx.init(jax.random.PRNGKey(0), init=True)
    y = jax.random.uniform(jax.random.PRNGKey(1), (1, 1, 32, 32), jnp.float32)
    tgt = jax.random.uniform(jax.random.PRNGKey(2), (1, 1, 32, 32), jnp.float32)

    def loss(m):
        def f(p):
            xhat, _ = m.apply(p, y, 25.0, return_z=False)
            return jnp.mean((xhat - tgt) ** 2)
        return f

    g_ref = jax.grad(loss(mx))(params)
    g_pal = jax.grad(loss(mp))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_pal)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5, rtol=1e-4)


def test_return_z_true_grad_raises_clear_error():
    """Differentiating backend='pallas' apply() with return_z=True (the
    inference-grade raw kernels, no VJP) raises a NotImplementedError that
    names the fix, instead of pallas' internal JVP AssertionError
    (kernels/autodiff.nondifferentiable)."""
    cfg2 = {"K": 3, "M": 8, "P": 5, "s": 2, "C": 1, "backend": "pallas"}
    m2 = build_model("CDLNet", cfg2)
    p2 = m2.init(jax.random.PRNGKey(0))
    y2 = jnp.zeros((1, 1, 32, 32), jnp.float32)

    def loss2(p):
        xhat, _ = m2.apply(p, y2, 25.0)  # return_z defaults True
        return jnp.mean(xhat**2)

    with pytest.raises(NotImplementedError, match="return_z=False"):
        jax.grad(loss2)(p2)

    cfg3 = {"K": 2, "M": 8, "P": (5, 5, 3), "s": 2, "C": 1, "depth": 4,
            "backend": "pallas"}
    m3 = build_model("CDLNetVideo", cfg3)
    p3 = m3.init(jax.random.PRNGKey(0))
    y3 = jnp.zeros((1, 1, 4, 32, 32), jnp.float32)

    def loss3(p):
        xhat, _ = m3.apply(p, y3, 25.0)
        return jnp.mean(xhat**2)

    with pytest.raises(NotImplementedError, match="return_z=False"):
        jax.grad(loss3)(p3)


def test_fused2d_batch_folding_matches_scan():
    """Shared-sigma batches fold into one tall image inside the kernel;
    results must match the per-image XLA scan (no cross-image bleed)."""
    s, P, C, M, K = 2, 7, 1, 8, 3
    yp = jax.random.normal(jax.random.PRNGKey(0), (3, C, 16, 16), jnp.float32) * 0.3
    A = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (K, M, C, P, P), jnp.float32)
    B = 0.1 * jax.random.normal(jax.random.PRNGKey(2), (K, M, C, P, P), jnp.float32)
    t = 0.02 * jnp.abs(jax.random.normal(jax.random.PRNGKey(3), (K, 2, M, 1, 1)))
    z_ref = lista_2d(yp, A, B, t, 0.1, stride=s)
    x_ref = conv_transpose2d(z_ref, B[0], stride=s, padding=3, output_padding=1)
    x_got, z_got = lista2d_fused(
        yp, A, B, t, 0.1, stride=s, return_z=True, interpret=True
    )
    np.testing.assert_allclose(np.asarray(z_got), np.asarray(z_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(x_got), np.asarray(x_ref), atol=1e-5)


@pytest.mark.parametrize("name", ["CDLNet_CSR", "CDLNet_CSRf2"])
def test_csr_pallas_backend_interpret(name, monkeypatch):
    """The CSR models' pallas backend fuses the frame-recurrent prox into
    the kernel; every neighbor-code dispatch case matches the XLA scan."""
    import cdlnet_tpu.kernels.lista2d as k2d

    orig = k2d.lista2d_fused
    monkeypatch.setattr(
        k2d, "lista2d_fused", lambda *a, **kw: orig(*a, **{**kw, "interpret": True})
    )
    cfg = {"K": 3, "M": 8, "P": 7, "s": 2, "C": 1, "adaptive": True}
    mx = build_model(name, dict(cfg))
    mp = build_model(name, dict(cfg, backend="pallas"))
    params = mx.init(jax.random.PRNGKey(0), init=True)
    for k in params:
        params[k] = (
            params[k] * 0.3 if k[0] in "AB"
            else jnp.abs(params[k]) * 0.05 + 1e-3
        )
    y = jax.random.uniform(jax.random.PRNGKey(1), (2, 1, 32, 32), jnp.float32)
    zp = 0.1 * jax.random.normal(jax.random.PRNGKey(2), (2, 8, 16, 16))
    za = 0.1 * jax.random.normal(jax.random.PRNGKey(3), (2, 8, 16, 16))
    sig = jnp.asarray([20.0, 30.0]).reshape(2, 1, 1, 1)
    if name == "CDLNet_CSR":
        cases = [dict(z_prev=None), dict(z_prev=zp)]
    else:
        cases = [dict(z_prev=None, z_after=None), dict(z_prev=zp, z_after=None),
                 dict(z_prev=None, z_after=za), dict(z_prev=zp, z_after=za)]
    for case in cases:
        x_ref, z_ref = mx.apply(params, y, sigma=sig, **case)
        x_got, z_got = mp.apply(params, y, sigma=sig, **case)
        np.testing.assert_allclose(np.asarray(z_got), np.asarray(z_ref), atol=1e-5)
        np.testing.assert_allclose(np.asarray(x_got), np.asarray(x_ref), atol=1e-5)


@pytest.mark.parametrize(
    "s,P,C,M,K,use_mask,Nimg",
    [(2, 7, 1, 8, 4, False, 3),   # folded per-sample-sigma batch
     (2, 5, 2, 6, 3, True, 2),    # masked (JDD) path, unfolded
     (2, 5, 1, 6, 1, False, 2),   # K=1: staging-ring drain edge (slot 0 only)
     (2, 5, 1, 6, 2, False, 2)],  # K=2: both ring slots, no in-loop waits
)
def test_fused_bwd_kernel_grads_match_xla(s, P, C, M, K, use_mask, Nimg,
                                          monkeypatch):
    """The hand-written reverse kernel (lista2d._kernel_bwd) matches the
    XLA scan's autodiff on weight and threshold gradients (fp32-history
    mode; the bf16 default is covered by
    test_fused2d_bwd_bf16_hist_tolerance)."""
    monkeypatch.setenv("CDLNET_HIST_DTYPE", "f32")
    from cdlnet_tpu.kernels.autodiff import lista2d_fused_diff

    yp = jax.random.normal(jax.random.PRNGKey(0), (Nimg, C, 16, 16), jnp.float32) * 0.3
    A = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (K, M, C, P, P), jnp.float32)
    B = 0.1 * jax.random.normal(jax.random.PRNGKey(2), (K, M, C, P, P), jnp.float32)
    t = 0.02 * jnp.abs(jax.random.normal(jax.random.PRNGKey(3), (K, 2, M, 1, 1)))
    c = jnp.linspace(0.1, 0.3, Nimg).reshape(Nimg, 1, 1, 1)
    mask = (
        (jax.random.uniform(jax.random.PRNGKey(9), yp.shape) > 0.5).astype(jnp.float32)
        if use_mask else None
    )
    tgt = jax.random.uniform(jax.random.PRNGKey(4), yp.shape)

    def loss_ref(params):
        A_, B_, t_ = params
        z = lista_2d(yp, A_, B_, t_, c, mask=mask, stride=s)
        x = conv_transpose2d(z, B_[0], stride=s, padding=(P - 1) // 2,
                             output_padding=s - 1)
        return jnp.mean((x - tgt) ** 2)

    def loss_pal(params):
        A_, B_, t_ = params
        x = lista2d_fused_diff(yp, A_, B_, t_, c, stride=s, mask=mask,
                               interpret=True)
        return jnp.mean((x - tgt) ** 2)

    v_ref, g_ref = jax.value_and_grad(loss_ref)((A, B, t))
    v_pal, g_pal = jax.value_and_grad(loss_pal)((A, B, t))
    np.testing.assert_allclose(float(v_pal), float(v_ref), rtol=1e-5)
    for name, a, b in zip("ABt", g_ref, g_pal):
        rel = float(jnp.abs(a - b).max()) / (float(jnp.abs(a).max()) + 1e-12)
        assert rel < 1e-4, (name, rel)


@pytest.mark.parametrize(
    "s,P,M,K,use_mask",
    [(2, (5, 5, 3), 6, 3, False), (2, (5, 5, 3), 6, 2, True)],
)
def test_fused3d_bwd_kernels_grads_match_xla(s, P, M, K, use_mask,
                                             monkeypatch):
    """The 3D reverse-scan backward (kernels/lista3d_bwd) matches the XLA
    scan's autodiff on weight and threshold gradients (fp32 history mode;
    the bf16 default is covered by test_fused3d_bwd_bf16_hist_tolerance)."""
    monkeypatch.setenv("CDLNET_LISTA3D_HIST_DTYPE", "f32")
    from cdlnet_tpu.kernels.autodiff import lista3d_fused_diff

    C = 1
    shape = (2, C, 8, 16, 16)
    yp = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32) * 0.3
    A = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (K, M, C, *P), jnp.float32)
    B = 0.1 * jax.random.normal(jax.random.PRNGKey(2), (K, M, C, *P), jnp.float32)
    t = 0.02 * jnp.abs(jax.random.normal(jax.random.PRNGKey(3), (K, 2, M, 1, 1, 1)))
    c = jnp.asarray([0.1, 0.2]).reshape(2, 1, 1, 1, 1)
    mask = (
        (jax.random.uniform(jax.random.PRNGKey(9), shape) > 0.5).astype(jnp.float32)
        if use_mask else None
    )
    tgt = jax.random.uniform(jax.random.PRNGKey(4), shape)
    pads = tuple(p // 2 for p in P)

    def loss_ref(params):
        A_, B_, t_ = params
        z = lista_3d(yp, A_, B_, t_, c, mask=mask, stride=s)
        x = conv_transpose3d(z, B_[0], stride=s, padding=pads, output_padding=s - 1)
        return jnp.mean((x - tgt) ** 2)

    def loss_pal(params):
        A_, B_, t_ = params
        x = lista3d_fused_diff(yp, A_, B_, t_, c, stride=s, mask=mask,
                               interpret=True)
        return jnp.mean((x - tgt) ** 2)

    v_ref, g_ref = jax.value_and_grad(loss_ref)((A, B, t))
    v_pal, g_pal = jax.value_and_grad(loss_pal)((A, B, t))
    np.testing.assert_allclose(float(v_pal), float(v_ref), rtol=1e-5)
    for name, a, b in zip("ABt", g_ref, g_pal):
        rel = float(jnp.abs(a - b).max()) / (float(jnp.abs(a).max()) + 1e-12)
        assert rel < 1e-4, (name, rel)


@pytest.mark.parametrize(
    "s,P,M,K,use_mask,band",
    [(2, 7, 8, 3, False, 8), (2, 5, 8, 2, True, 8)],
)
def test_tiled_bwd_kernel_grads_match_xla(s, P, M, K, use_mask, band,
                                          monkeypatch):
    """The banded whole-reverse-resident 2D backward
    (kernels/lista2d_tiled_bwd) matches the XLA scan's autodiff on
    weight/threshold gradients (fp32-history mode; multi-band, with
    per-sample sigma and the masked JDD path)."""
    monkeypatch.setenv("CDLNET_HIST_DTYPE", "f32")
    from cdlnet_tpu.kernels.lista2d_tiled import lista2d_tiled
    from cdlnet_tpu.kernels.lista2d_tiled_bwd import lista2d_tiled_fused_bwd

    C = 1
    N, H, W = 2, 32, 512  # Wc = 256 (lane-aligned), Hc = 16 -> 2 bands
    yp = jax.random.normal(jax.random.PRNGKey(0), (N, C, H, W),
                           jnp.float32) * 0.3
    A = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (K, M, C, P, P),
                                jnp.float32)
    B = 0.1 * jax.random.normal(jax.random.PRNGKey(2), (K, M, C, P, P),
                                jnp.float32)
    t = 0.02 * jnp.abs(jax.random.normal(jax.random.PRNGKey(3),
                                         (K, 2, M, 1, 1)))
    c = jnp.asarray([0.1, 0.2]).reshape(2, 1, 1, 1)
    mask = (
        (jax.random.uniform(jax.random.PRNGKey(9), yp.shape) > 0.5)
        .astype(jnp.float32) if use_mask else None
    )
    tgt = jax.random.uniform(jax.random.PRNGKey(4), yp.shape)
    pads = (P - 1) // 2

    def loss_ref(params):
        A_, B_, t_ = params
        z = lista_2d(yp, A_, B_, t_, c, mask=mask, stride=s)
        x = conv_transpose2d(z, B_[0], stride=s, padding=pads,
                             output_padding=s - 1)
        return jnp.mean((x - tgt) ** 2)

    _, g_ref = jax.value_and_grad(loss_ref)((A, B, t))

    x, _, (zh, rh) = lista2d_tiled(
        yp, A, B, t, c, stride=s, mask=mask, return_z=False,
        z_dtype=jnp.float32, interpret=True, return_hists=True, band=band,
    )
    dxp = 2.0 * (x - tgt) / x.size
    g_tl = lista2d_tiled_fused_bwd(
        dxp, yp, A, B, t, c, mask, zh, rh, stride=s, interpret=True
    )
    for name, a, b in zip("ABt", g_ref, g_tl):
        rel = float(jnp.abs(a - b).max()) / (float(jnp.abs(a).max()) + 1e-12)
        assert rel < 1e-4, (name, rel)


def test_lista3d_reverse_path_routing(monkeypatch):
    """lista3d_reverse_path: resident when it fits, scan when forced or
    resident doesn't fit, None (XLA fallback) when NEITHER gate passes —
    including under CDLNET_LISTA3D_BWD_RESIDENT=0 (previously the env
    force skipped the scan path's own VMEM gate)."""
    import cdlnet_tpu.kernels.lista3d_bwd as k3b
    import cdlnet_tpu.kernels.lista3d_bwd_resident as k3r
    from cdlnet_tpu.kernels.autodiff import lista3d_reverse_path

    args = (8, 1, (5, 5, 3), 2, 2, 8, 32, 32)
    assert lista3d_reverse_path(*args) == "resident"
    monkeypatch.setenv("CDLNET_LISTA3D_BWD_RESIDENT", "0")
    assert lista3d_reverse_path(*args) == "scan"
    monkeypatch.setattr(k3b, "lista3d_bwd_supported", lambda *a, **kw: False)
    assert lista3d_reverse_path(*args) is None  # env force respects gates
    monkeypatch.delenv("CDLNET_LISTA3D_BWD_RESIDENT")
    assert lista3d_reverse_path(*args) == "resident"
    monkeypatch.setattr(
        k3r, "lista3d_bwd_resident_supported", lambda *a, **kw: False)
    assert lista3d_reverse_path(*args) is None


def test_fused2d_bwd_bf16_hist_tolerance():
    """The DEFAULT bf16 history mode keeps 2D gradients within a few
    percent of the XLA scan's (end-metric gated at flagship scale)."""
    from cdlnet_tpu.kernels.autodiff import lista2d_fused_diff
    from cdlnet_tpu.kernels.lista2d import hist_dtype

    assert hist_dtype() == jnp.bfloat16  # the documented default
    s, P, C, M, K = 2, 7, 1, 8, 4
    yp = jax.random.normal(jax.random.PRNGKey(0), (2, C, 16, 16),
                           jnp.float32) * 0.3
    A = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (K, M, C, P, P),
                                jnp.float32)
    B = 0.1 * jax.random.normal(jax.random.PRNGKey(2), (K, M, C, P, P),
                                jnp.float32)
    t = 0.02 * jnp.abs(jax.random.normal(jax.random.PRNGKey(3),
                                         (K, 2, M, 1, 1)))
    tgt = jax.random.uniform(jax.random.PRNGKey(4), yp.shape)

    def loss_ref(params):
        A_, B_, t_ = params
        z = lista_2d(yp, A_, B_, t_, 0.1, stride=s)
        x = conv_transpose2d(z, B_[0], stride=s, padding=(P - 1) // 2,
                             output_padding=s - 1)
        return jnp.mean((x - tgt) ** 2)

    def loss_pal(params):
        A_, B_, t_ = params
        x = lista2d_fused_diff(yp, A_, B_, t_, 0.1, stride=s,
                               interpret=True)
        return jnp.mean((x - tgt) ** 2)

    _, g_ref = jax.value_and_grad(loss_ref)((A, B, t))
    _, g_pal = jax.value_and_grad(loss_pal)((A, B, t))
    for name, a, b in zip("ABt", g_ref, g_pal):
        rel = float(jnp.abs(a - b).max()) / (float(jnp.abs(a).max()) + 1e-12)
        assert rel < 1e-1, (name, rel)


@pytest.mark.parametrize(
    "s,P,M,K,use_mask",
    [(2, (5, 5, 3), 8, 3, False), (2, (5, 5, 3), 8, 2, True),
     (1, (5, 5, 3), 6, 2, False),       # s=1 geometry
     (2, (5, 5, 3), 8, 1, False),       # K=1: z hist only, empty r hist
     (2, (9, 9, 5), 6, 2, False)],      # MRI taps, preroll rejected (Qh=5)
)
def test_fused3d_resident_hist_matches_pair(s, P, M, K, use_mask,
                                            monkeypatch):
    """The resident-hist training forward (histories DMA-streamed from
    inside _kernel_resident) returns the same primal and the same z/r
    histories as the pair path (histories stacked as scan outputs) in
    f32-history mode, to reassociation tolerance."""
    from cdlnet_tpu.kernels.lista3d import (
        lista3d_fused,
        lista3d_hist_forward_path,
    )

    C = 1
    shape = (2, C, 8, 16, 16)
    yp = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32) * 0.3
    A = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (K, M, C, *P),
                                jnp.float32)
    B = 0.1 * jax.random.normal(jax.random.PRNGKey(2), (K, M, C, *P),
                                jnp.float32)
    t = 0.02 * jnp.abs(jax.random.normal(jax.random.PRNGKey(3),
                                         (K, 2, M, 1, 1, 1)))
    c = jnp.asarray([0.1, 0.2]).reshape(2, 1, 1, 1, 1)
    mask = (
        (jax.random.uniform(jax.random.PRNGKey(9), shape) > 0.5)
        .astype(jnp.float32) if use_mask else None
    )
    assert lista3d_hist_forward_path(M, C, P, s, K, *shape[-3:],
                                     hist_bytes=4) == "resident"

    monkeypatch.setenv("CDLNET_LISTA3D_RESIDENT", "0")
    xp_, _, (zhp, rhp) = lista3d_fused(
        yp, A, B, t, c, stride=s, mask=mask, return_z=False,
        z_dtype=jnp.float32, interpret=True, return_hists=True)
    monkeypatch.delenv("CDLNET_LISTA3D_RESIDENT")
    xr, zr, (zhr, rhr) = lista3d_fused(
        yp, A, B, t, c, stride=s, mask=mask, return_z=False,
        z_dtype=jnp.float32, interpret=True, return_hists=True)

    assert zr is None and zhr.shape == zhp.shape and rhr.shape == rhp.shape
    assert rhr.shape[0] == K - 1
    for name, a, b in (("x", xp_, xr), ("zh", zhp, zhr), ("rh", rhp, rhr)):
        if a.size == 0:
            continue
        rel = float(jnp.abs(a - b).max()) / (float(jnp.abs(a).max()) + 1e-12)
        assert rel < 1e-5, (name, rel)


def test_hist_forward_routing_flagship_shapes():
    """Regression tripwire on the 3D training-forward routing: the
    flagship video config must keep the RESIDENT-hist forward (histories
    DMA-streamed in-kernel — losing it silently re-serializes ~GB/step of
    XLA stacking copies), the args3dmri config stays on the pair path
    (its working set exceeds the resident budget at Dc=15), and the
    resident plan there must still double-buffer the staging ring."""
    from cdlnet_tpu.kernels.lista3d import (
        _resident_plan,
        lista3d_hist_forward_path,
    )

    # args3d.json flagship: K=30 M=169 P=(7,7,5) s=2, 16x128x128
    assert lista3d_hist_forward_path(
        169, 1, (7, 7, 5), 2, 30, 16, 128, 128, hist_bytes=2) == "resident"
    fits, _, slots = _resident_plan(
        169, 1, (7, 7, 5), 2, 30, 16, 128, 128, hist_bytes=2)
    assert fits and slots == 2
    # args3dmri.json: K=30 M=169 P=(9,9,5) s=2, 30x128x128
    assert lista3d_hist_forward_path(
        169, 1, (9, 9, 5), 2, 30, 30, 128, 128, hist_bytes=2) == "pair"


def test_fused3d_bwd_bf16_hist_tolerance():
    """The DEFAULT bf16 code-history training path (autodiff.hist3d_dtype)
    stays within ~1e-2 relative of the XLA scan's gradients — the
    end-metric impact is gated at flagship scale by
    tools/parity_train3d.py (+0.02 dB over XLA)."""
    from cdlnet_tpu.kernels.autodiff import hist3d_dtype, lista3d_fused_diff

    assert hist3d_dtype() == jnp.bfloat16  # the documented default
    s, P, M, K = 2, (5, 5, 3), 6, 2
    shape = (1, 1, 8, 16, 16)
    yp = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32) * 0.3
    A = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (K, M, 1, *P), jnp.float32)
    B = 0.1 * jax.random.normal(jax.random.PRNGKey(2), (K, M, 1, *P), jnp.float32)
    t = 0.02 * jnp.abs(jax.random.normal(jax.random.PRNGKey(3), (K, 2, M, 1, 1, 1)))
    tgt = jax.random.uniform(jax.random.PRNGKey(4), shape)
    pads = tuple(p // 2 for p in P)

    def loss_ref(params):
        A_, B_, t_ = params
        z = lista_3d(yp, A_, B_, t_, 0.1, stride=s)
        x = conv_transpose3d(z, B_[0], stride=s, padding=pads,
                             output_padding=s - 1)
        return jnp.mean((x - tgt) ** 2)

    def loss_pal(params):
        A_, B_, t_ = params
        x = lista3d_fused_diff(yp, A_, B_, t_, 0.1, stride=s,
                               interpret=True)
        return jnp.mean((x - tgt) ** 2)

    _, g_ref = jax.value_and_grad(loss_ref)((A, B, t))
    _, g_pal = jax.value_and_grad(loss_pal)((A, B, t))
    for name, a, b in zip("ABt", g_ref, g_pal):
        rel = float(jnp.abs(a - b).max()) / (float(jnp.abs(a).max()) + 1e-12)
        # bf16 rounding compounds through the reverse chain: a few
        # percent relative is expected (measured ~4e-2 here); the bound
        # is a sanity check, the real gate is end-metric
        assert rel < 1e-1, (name, rel)


@pytest.mark.parametrize(
    "s,P,M,K,use_mask,preroll",
    [(2, (5, 5, 3), 6, 3, False, False), (2, (5, 5, 3), 6, 2, True, False),
     (2, (5, 5, 3), 6, 1, False, False),
     # MRI-config taps: T*Cp = 3*5*5*8 = 600 is NOT 128-lane aligned —
     # exercises the padded-bank layout (TCpad=640) the per-k HBM DMA
     # slices require on hardware
     (2, (9, 9, 5), 6, 2, False, False), (2, (9, 9, 5), 6, 2, True, False),
     # CDLNET_LISTA3D_BWD_PREROLL=1: hoisted per-frame tap roll+mask builds
     # + j-reversed synthesis bank/window (see lista3d_bwd_resident)
     (2, (5, 5, 3), 6, 3, False, True), (2, (7, 7, 5), 6, 2, True, True)],
)
def test_fused3d_bwd_resident_grads_match_xla(s, P, M, K, use_mask, preroll,
                                              monkeypatch):
    """The whole-reverse-RESIDENT 3D backward (kernels/lista3d_bwd_resident)
    matches the XLA scan's autodiff on weight and threshold gradients."""
    from cdlnet_tpu.kernels.lista3d import lista3d_fused
    from cdlnet_tpu.kernels.lista3d_bwd_resident import (
        lista3d_bwd_resident_supported,
        lista3d_fused_bwd_resident,
    )

    monkeypatch.setenv("CDLNET_LISTA3D_BWD_PREROLL", "1" if preroll else "0")
    C = 1
    shape = (2, C, 8, 16, 16)
    assert lista3d_bwd_resident_supported(M, C, P, s, K, *shape[2:])
    yp = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32) * 0.3
    A = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (K, M, C, *P), jnp.float32)
    B = 0.1 * jax.random.normal(jax.random.PRNGKey(2), (K, M, C, *P), jnp.float32)
    t = 0.02 * jnp.abs(jax.random.normal(jax.random.PRNGKey(3), (K, 2, M, 1, 1, 1)))
    c = jnp.asarray([0.1, 0.2]).reshape(2, 1, 1, 1, 1)
    mask = (
        (jax.random.uniform(jax.random.PRNGKey(9), shape) > 0.5).astype(jnp.float32)
        if use_mask else None
    )
    tgt = jax.random.uniform(jax.random.PRNGKey(4), shape)
    pads = tuple(p // 2 for p in P)

    def loss_ref(params):
        A_, B_, t_ = params
        z = lista_3d(yp, A_, B_, t_, c, mask=mask, stride=s)
        x = conv_transpose3d(z, B_[0], stride=s, padding=pads, output_padding=s - 1)
        return jnp.mean((x - tgt) ** 2)

    v_ref, g_ref = jax.value_and_grad(loss_ref)((A, B, t))

    x, _, (zh, rh) = lista3d_fused(
        yp, A, B, t, c, stride=s, mask=mask, return_z=False,
        z_dtype=jnp.float32, interpret=True, return_hists=True,
    )
    dxp = 2.0 * (x - tgt) / x.size
    g_res = lista3d_fused_bwd_resident(
        dxp, yp, A, B, t, c, mask, zh, rh, stride=s, interpret=True
    )
    for name, a, b in zip("ABt", g_ref, g_res):
        rel = float(jnp.abs(a - b).max()) / (float(jnp.abs(a).max()) + 1e-12)
        assert rel < 1e-4, (name, rel)


def test_csr_pallas_backend_trainable(monkeypatch):
    """backend='pallas' CSR models are differentiable (fused forward + XLA
    gradient, autodiff.csr_fused_2d): grads — including through the
    carried neighbor code — match the XLA backend."""
    import cdlnet_tpu.kernels.lista2d as k2d

    orig = k2d.lista2d_fused
    monkeypatch.setattr(
        k2d, "lista2d_fused", lambda *a, **kw: orig(*a, **{**kw, "interpret": True})
    )
    cfg = {"K": 3, "M": 8, "P": 7, "s": 2, "C": 1, "adaptive": True}
    mx = build_model("CDLNet_CSR", dict(cfg))
    mp = build_model("CDLNet_CSR", dict(cfg, backend="pallas"))
    params = mx.init(jax.random.PRNGKey(0), init=True)
    for k in params:
        params[k] = (
            params[k] * 0.3 if k[0] in "AB"
            else jnp.abs(params[k]) * 0.05 + 1e-3
        )
    y = jax.random.uniform(jax.random.PRNGKey(1), (1, 1, 32, 32), jnp.float32)
    zp = 0.1 * jax.random.normal(jax.random.PRNGKey(2), (1, 8, 16, 16))
    tgt = jax.random.uniform(jax.random.PRNGKey(3), y.shape)

    def loss(m):
        def f(args):
            p, zin = args
            xh, z = m.apply(p, y, zin, sigma=25.0)
            return jnp.mean((xh - tgt) ** 2) + 0.1 * jnp.mean(z ** 2)
        return f

    gx = jax.grad(loss(mx))((params, zp))
    gp = jax.grad(loss(mp))((params, zp))
    for a, b in zip(jax.tree_util.tree_leaves(gx), jax.tree_util.tree_leaves(gp)):
        rel = float(jnp.abs(a - b).max()) / (float(jnp.abs(a).max()) + 1e-12)
        assert rel < 1e-4, rel


@pytest.mark.parametrize("mtype", ["CDLNet_CSR", "CDLNet_CSRf2"])
def test_csr_fused_training_grads_match_xla(mtype, monkeypatch):
    """train=True on backend='pallas' CSR models runs the FULLY fused
    path (autodiff.csr_fused_2d_train: fused forward with prox-argument
    histories + the hand-written prox-mode reverse kernel). Gradients of
    the full frame-recurrent training loss — parameters AND the BPTT
    chains through carried codes — match the XLA backend."""
    monkeypatch.setenv("CDLNET_HIST_DTYPE", "f32")
    import cdlnet_tpu.kernels.lista2d as k2d

    orig = k2d.lista2d_fused
    monkeypatch.setattr(
        k2d, "lista2d_fused", lambda *a, **kw: orig(*a, **{**kw, "interpret": True})
    )
    origb = k2d.lista2d_fused_bwd
    monkeypatch.setattr(
        k2d, "lista2d_fused_bwd",
        lambda *a, **kw: origb(*a, **{**kw, "interpret": True}),
    )
    cfg = {"K": 3, "M": 8, "P": 5, "s": 2, "C": 1, "adaptive": True}
    mx = build_model(mtype, dict(cfg))
    mp = build_model(mtype, dict(cfg, backend="pallas"))
    params = mx.init(jax.random.PRNGKey(0), init=True)
    for k in params:
        params[k] = (
            params[k] * 0.3 if k[0] in "AB"
            else jnp.abs(params[k]) * 0.05 + 1e-3
        )
    prev = jax.random.uniform(jax.random.PRNGKey(1), (1, 1, 32, 32))
    curr = jax.random.uniform(jax.random.PRNGKey(2), (1, 1, 32, 32))
    after = jax.random.uniform(jax.random.PRNGKey(3), (1, 1, 32, 32))

    def loss(m):
        # the fit_csr recurrences (reference traincsr.py:192-217/:247-273)
        def f(p):
            if mtype == "CDLNet_CSR":
                pd, zp_ = m.apply(p, prev, None, 25.0, train=True)
                cd, zc = m.apply(p, curr, zp_, 25.0, train=True)
                pd, zp_ = m.apply(p, prev, zc, 25.0, train=True)
                cd, zc = m.apply(p, curr, zp_, 25.0, train=True)
                return jnp.mean((pd - prev) ** 2) + jnp.mean((cd - curr) ** 2)
            pd, zp_ = m.apply(p, prev, None, None, 25.0, train=True)
            cd, zc = m.apply(p, curr, zp_, None, 25.0, train=True)
            ad, za_ = m.apply(p, after, zp_, None, 25.0, train=True)
            cd, zc = m.apply(p, curr, zp_, za_, 25.0, train=True)
            pd, zp_ = m.apply(p, prev, None, za_, 25.0, train=True)
            return (jnp.mean((pd - prev) ** 2) + jnp.mean((cd - curr) ** 2)
                    + jnp.mean((ad - after) ** 2))
        return f

    gx = jax.grad(loss(mx))(params)
    gp = jax.grad(loss(mp))(params)
    for k in gx:
        rel = float(jnp.abs(gx[k] - gp[k]).max()) / (
            float(jnp.abs(gx[k]).max()) + 1e-12)
        assert rel < 1e-4, (k, rel)


def test_gdlnet_pallas_backend_trainable(monkeypatch):
    """GDLNet's pallas backend is differentiable end-to-end: the fused
    reverse kernel's dA/dB cotangents chain through the Gabor filter
    synthesis into the raw (alpha, a, w0, psi) parameters."""
    monkeypatch.setenv("CDLNET_HIST_DTYPE", "f32")
    import cdlnet_tpu.kernels.lista2d as k2d

    orig = k2d.lista2d_fused
    monkeypatch.setattr(
        k2d, "lista2d_fused", lambda *a, **kw: orig(*a, **{**kw, "interpret": True})
    )
    origb = k2d.lista2d_fused_bwd
    monkeypatch.setattr(
        k2d, "lista2d_fused_bwd",
        lambda *a, **kw: origb(*a, **{**kw, "interpret": True}),
    )
    cfg = {"K": 2, "M": 8, "P": 7, "s": 2, "C": 1, "adaptive": True, "order": 1}
    mx = build_model("GDLNet", dict(cfg))
    mp = build_model("GDLNet", dict(cfg, backend="pallas"))
    params = mx.init(jax.random.PRNGKey(0), init=True)
    y = jax.random.uniform(jax.random.PRNGKey(1), (1, 1, 32, 32), jnp.float32)
    tgt = jax.random.uniform(jax.random.PRNGKey(2), y.shape)

    def loss(m):
        def f(p):
            xh, _ = m.apply(p, y, 25.0, return_z=False)
            return jnp.mean((xh - tgt) ** 2)
        return f

    gx = jax.grad(loss(mx))(params)
    gp = jax.grad(loss(mp))(params)
    for k in gx:
        rel = float(jnp.abs(gx[k] - gp[k]).max()) / (float(jnp.abs(gx[k]).max()) + 1e-12)
        assert rel < 1e-4, (k, rel)


def test_fused_hist_matches_per_iteration_codes(monkeypatch):
    """return_hist=True streams exactly the per-iteration codes (rows
    [0:M)) and residuals (rows [Mp8:Mp8+Cp)) the reverse kernel consumes —
    pinned against the XLA scan's return_codes (fp32-history mode; the
    bf16 default rounds the stored values by design)."""
    monkeypatch.setenv("CDLNET_HIST_DTYPE", "f32")
    s, P, C, M, K = 2, 7, 1, 8, 3
    yp, A, B, t = _mk(s, P, C, M, K)
    c = jnp.asarray([0.1, 0.2]).reshape(2, 1, 1, 1)
    z_ref, codes = lista_2d(yp, A, B, t, c, stride=s, return_codes=True)
    x, z, hist = lista2d_fused(yp, A, B, t, c, stride=s, return_z=True,
                               interpret=True, return_hist=True)
    Mp8 = -(-M // 8) * 8
    h = np.asarray(hist)[:, :, :M].reshape(2, K, M, 8, 8)
    np.testing.assert_allclose(h[:, -1], np.asarray(z_ref), atol=1e-5)
    cc = np.asarray(codes)  # (K, N, M, Hc, Wc)
    for k in range(K):
        np.testing.assert_allclose(h[:, k], cc[k], atol=1e-5)


# ---------------------------------------------------------------------------
# Banded big-image kernels (kernels/lista2d_tiled.py)
# ---------------------------------------------------------------------------

from cdlnet_tpu.kernels.lista2d_tiled import (  # noqa: E402
    lista2d_tiled,
    lista2d_tiled_supported,
)


@pytest.mark.parametrize(
    "s,P,C,M,K,H,W,Bh,use_mask",
    [(2, 7, 1, 8, 3, 128, 32, 16, False),   # nb=4, halo crossing
     (2, 7, 1, 8, 3, 120, 32, 16, False),   # ragged Hc=60 (zero-pad band)
     (1, 5, 1, 6, 2, 61, 32, 16, False),    # ragged + stride 1
     (2, 5, 3, 6, 2, 64, 16, 8, True)],     # color + mask
)
def test_tiled_matches_scan_interpret(s, P, C, M, K, H, W, Bh, use_mask):
    yp = jax.random.normal(jax.random.PRNGKey(0), (2, C, H, W), jnp.float32) * 0.3
    A = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (K, M, C, P, P), jnp.float32)
    B = 0.1 * jax.random.normal(jax.random.PRNGKey(2), (K, M, C, P, P), jnp.float32)
    t = 0.02 * jnp.abs(jax.random.normal(jax.random.PRNGKey(3), (K, 2, M, 1, 1)))
    c = jnp.asarray([0.1, 0.2]).reshape(2, 1, 1, 1)
    mask = (
        (jax.random.uniform(jax.random.PRNGKey(9), yp.shape) > 0.5).astype(jnp.float32)
        if use_mask else None
    )
    z_ref = lista_2d(yp, A, B, t, c, stride=s, mask=mask)
    x_ref = conv_transpose2d(z_ref, B[0], stride=s, padding=(P - 1) // 2,
                             output_padding=s - 1)
    x, z = lista2d_tiled(yp, A, B, t, c, stride=s, mask=mask, return_z=True,
                         z_dtype=jnp.float32, interpret=True, band=Bh)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(z), np.asarray(z_ref), atol=1e-5)


def test_tiled_supported_and_routing(monkeypatch):
    """Shapes the whole-image kernel rejects route to the banded path
    (and its outputs match XLA); lane-unaligned widths also gate there."""
    # flagship at 512x512: whole-image rejected, banded accepted
    assert not lista2d_fused_supported(169, 1, 7, 2, 30, 512, 512)
    assert lista2d_tiled_supported(169, 1, 7, 2, 30, 512, 512)
    # BSD68-like 322x482 (Wc=241 lane-unaligned): register-spill-prone,
    # gated off the whole-image kernel
    assert not lista2d_fused_supported(169, 1, 7, 2, 30, 322, 482)
    assert lista2d_tiled_supported(169, 1, 7, 2, 30, 322, 482)

    import cdlnet_tpu.kernels.lista2d_tiled as ktl

    orig = ktl.lista2d_tiled
    monkeypatch.setattr(
        ktl, "lista2d_tiled", lambda *a, **kw: orig(*a, **{**kw, "interpret": True})
    )
    # force the whole-image gate to reject (so routing exercises the
    # banded path) by shrinking its advertised VMEM capacity
    import cdlnet_tpu.kernels.lista2d as k2d

    monkeypatch.setattr(k2d, "_VMEM_CAPACITY", 64 * 1024)
    cfg = {"K": 2, "M": 6, "P": 5, "s": 2, "C": 1, "adaptive": True}
    mx = build_model("CDLNet", dict(cfg))
    mp = build_model("CDLNet", dict(cfg, backend="pallas"))
    params = mx.init(jax.random.PRNGKey(0), init=True)
    y = jax.random.uniform(jax.random.PRNGKey(1), (1, 1, 64, 32), jnp.float32)
    x_ref, _ = mx.apply(params, y, 25.0)
    x_got, z_got = mp.apply(params, y, 25.0, return_z=True)
    np.testing.assert_allclose(np.asarray(x_got), np.asarray(x_ref), atol=5e-3)


def test_train_routing_avoids_xla_vjp_fallback(monkeypatch):
    """train=True (a call that will be differentiated) must not pick a
    pallas path whose reverse kernel does not fit VMEM: the custom-VJP's
    XLA-gradient fallback re-runs the whole XLA forward inside the
    backward, so fused-fwd + XLA-vjp costs MORE than plain XLA end-to-end
    (measured 113 vs 68 ms/step at batch 4 x 256^2 flagship-2D). Big
    LANE-ALIGNED crops route to the banded fused path
    (kernels/lista2d_tiled_bwd); unalignable ones to None (pure XLA)."""
    import cdlnet_tpu.kernels.autodiff as ad
    from cdlnet_tpu.kernels.lista2d import lista2d_bwd_supported
    from cdlnet_tpu.kernels.lista2d_tiled_bwd import (
        lista2d_tiled_bwd_supported,
    )
    from cdlnet_tpu.kernels.routing import route_lista2d

    M, C, P, s, K = 169, 1, 7, 2, 30
    # flagship training crop: whole-image reverse kernel fits
    assert lista2d_bwd_supported(M, C, P, s, K, 128, 128)

    marker = object()
    monkeypatch.setattr(ad, "lista2d_tiled_diff",
                        lambda *a, **kw: marker)

    A = jnp.zeros((K, M, C, P, P), jnp.float32)
    B = jnp.zeros((K, M, C, P, P), jnp.float32)
    t = jnp.zeros((K, 2, M, 1, 1), jnp.float32)

    # big aligned crops: whole-image reverse does not fit, banded does
    for H in (256, 512):
        assert not lista2d_bwd_supported(M, C, P, s, K, H, H)
        assert lista2d_tiled_bwd_supported(M, C, P, s, K, H, H)
        out = route_lista2d(
            jnp.zeros((1, C, H, H), jnp.float32), A, B, t, 25.0 / 255.0,
            M=M, C=C, P=P, s=s, K=K, mask=None, return_z=False, train=True,
        )
        assert out is not None and out[0] is marker

    # lane-unalignable width (Wc=130): no fused reverse -> pure XLA
    assert not lista2d_tiled_bwd_supported(M, C, P, s, K, 260, 260)
    out = route_lista2d(
        jnp.zeros((1, C, 260, 260), jnp.float32), A, B, t, 25.0 / 255.0,
        M=M, C=C, P=P, s=s, K=K, mask=None, return_z=False, train=True,
    )
    assert out is None


def test_video_train_gate_requires_bwd_fit(monkeypatch):
    """CDLNetVideo._pallas_path(train=True) requires the fp32-history
    forward AND a reverse path (resident or scan kernels) to fit;
    inference gating is unchanged."""
    import cdlnet_tpu.kernels.autodiff as ad
    import cdlnet_tpu.kernels.lista3d_bwd as k3b
    import cdlnet_tpu.kernels.lista3d_bwd_resident as k3r

    cfg = {"K": 2, "M": 8, "P": (5, 5, 3), "s": 2, "C": 1,
           "adaptive": True, "depth": 8, "backend": "pallas"}
    m = build_model("CDLNetVideo", dict(cfg))
    params = m.init(jax.random.PRNGKey(0), init=False)
    yp = jnp.zeros((1, 1, 8, 32, 32), jnp.float32)
    assert m._pallas_path(params, yp, return_z=False, train=True) == "fused"
    monkeypatch.setattr(k3b, "lista3d_bwd_supported", lambda *a, **kw: False)
    # the resident reverse alone still admits the shape...
    assert m._pallas_path(params, yp, return_z=False, train=True) == "fused"
    monkeypatch.setattr(
        k3r, "lista3d_bwd_resident_supported", lambda *a, **kw: False)
    # ...with both whole-frame reverse gates closed, training falls to
    # the big-frame fused paths (ring first, then banded)...
    monkeypatch.setenv("CDLNET_LISTA3D_RING_BWD", "0")
    assert (m._pallas_path(params, yp, return_z=False, train=True)
            == "tiled_train")
    # ...and with that gate closed too, training routes to XLA
    monkeypatch.setattr(
        ad, "lista3d_tiled_train_supported", lambda *a, **kw: False)
    assert m._pallas_path(params, yp, return_z=False, train=True) is None
    # inference routing ignores the reverse-kernel gates
    assert m._pallas_path(params, yp, return_z=False, train=False) == "fused"


# ---------------------------------------------------------------------------
# Banded big-frame 3D kernels (kernels/lista3d_tiled.py)
# ---------------------------------------------------------------------------

from cdlnet_tpu.kernels.lista3d_tiled import (  # noqa: E402
    lista3d_tiled,
    lista3d_tiled_supported,
)


@pytest.mark.parametrize(
    "s,P,C,M,K,D,H,W,Bh,use_mask",
    [(2, (5, 5, 3), 1, 8, 3, 8, 64, 16, 8, False),  # nb=4: halo crossings
     (2, (5, 5, 3), 1, 8, 3, 8, 56, 16, 8, False),  # ragged Hc=28
     (1, (5, 5, 3), 1, 6, 2, 4, 33, 16, 8, False),  # stride 1, ragged
     (2, (5, 5, 3), 3, 6, 2, 4, 32, 16, 8, True)],  # color + mask
)
def test_tiled3d_matches_scan_interpret(s, P, C, M, K, D, H, W, Bh, use_mask):
    from cdlnet_tpu.kernels.lista3d_tiled import lista3d_tiled

    shape = (2, C, D, H, W)
    yp, A, B, t = _mk3d(s, P, C, M, K, shape)
    c = jnp.asarray([0.1, 0.2]).reshape(2, 1, 1, 1, 1)
    mask = (
        (jax.random.uniform(jax.random.PRNGKey(9), shape) > 0.5).astype(jnp.float32)
        if use_mask
        else None
    )
    z_ref = lista_3d(yp, A, B, t, c, mask=mask, stride=s)
    pads = tuple(p // 2 for p in P)
    x_ref = conv_transpose3d(
        z_ref, B[0], stride=s, padding=pads, output_padding=s - 1
    )
    x, z = lista3d_tiled(yp, A, B, t, c, stride=s, mask=mask, return_z=True,
                         z_dtype=jnp.float32, interpret=True, band=Bh)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(z), np.asarray(z_ref), atol=1e-4)


def test_tiled3d_supported_covers_native_eval_frames():
    """The reference's own eval workloads at NATIVE resolution (DAVIS
    480x854 clips, analyze3d.py:77-161; fastMRI 640x368 volumes,
    analyzemri.py:185-298) exceed the fused pair gate but band cleanly."""
    from cdlnet_tpu.kernels.lista3d import lista3d_fused_supported

    assert not lista3d_fused_supported(169, 1, (7, 7, 5), 2, 30, 16, 480, 854)
    assert lista3d_tiled_supported(169, 1, (7, 7, 5), 2, 30, 16, 480, 854)
    assert not lista3d_fused_supported(169, 1, (9, 9, 5), 2, 30, 30, 640, 368)
    assert lista3d_tiled_supported(169, 1, (9, 9, 5), 2, 30, 30, 640, 368)
    # residual-block variants stay on the XLA path
    assert not lista3d_tiled_supported(169, 1, (7, 7, 5), 2, 30, 16, 480, 854,
                                       residual=object())


def test_tiled3d_model_routing(monkeypatch):
    """CDLNetVideo backend='pallas' routes frames the fused gate rejects
    to the banded path, matching the XLA backend."""
    import cdlnet_tpu.kernels.lista3d as k3d
    import cdlnet_tpu.kernels.lista3d_tiled as ktl3

    # the depth-ring path outranks banded when enabled; force banded here
    monkeypatch.setenv("CDLNET_LISTA3D_RING", "0")
    orig = ktl3.lista3d_tiled
    called = {}

    def spy(*a, **kw):
        called["tiled"] = True
        return orig(*a, **{**kw, "interpret": True})

    monkeypatch.setattr(ktl3, "lista3d_tiled", spy)
    # shrink the fused budget so routing exercises the banded path at toy size
    monkeypatch.setattr(k3d, "_VMEM_BUDGET", 64 * 1024)
    cfg = {"K": 2, "M": 6, "P": (5, 5, 3), "s": 2, "C": 1, "adaptive": True,
           "depth": 4}
    mx = build_model("CDLNetVideo", dict(cfg))
    mp = build_model("CDLNetVideo", dict(cfg, backend="pallas"))
    params = mx.init(jax.random.PRNGKey(0), init=True)
    y = jax.random.uniform(jax.random.PRNGKey(1), (1, 1, 4, 32, 16), jnp.float32)
    x_ref, _ = mx.apply(params, y, 25.0)
    x_got, z_got = mp.apply(params, y, 25.0, return_z=True)
    assert called.get("tiled")
    np.testing.assert_allclose(np.asarray(x_got), np.asarray(x_ref), atol=5e-3)


@pytest.mark.parametrize(
    "s,P,C,M,K,D,H,W,Bh,use_mask",
    [(2, (5, 5, 3), 1, 8, 3, 8, 64, 16, 8, False),  # nb=4: halo crossings
     (2, (5, 5, 3), 3, 6, 2, 4, 32, 16, 8, True)],  # color + mask
)
def test_tiled3d_bwd_kernels_grads_match_xla(s, P, C, M, K, D, H, W, Bh,
                                             use_mask, monkeypatch):
    """The banded 3D reverse pair (kernels/lista3d_tiled_bwd) matches the
    XLA scan's autodiff on weight/threshold gradients (fp32-history mode,
    per-sample sigma, masked JDD path) — gradients of model/net.py:121-227
    semantics at frames beyond the resident reverse's VMEM gate."""
    monkeypatch.setenv("CDLNET_HIST_DTYPE", "f32")
    from cdlnet_tpu.kernels.lista3d_tiled import lista3d_tiled
    from cdlnet_tpu.kernels.lista3d_tiled_bwd import lista3d_tiled_fused_bwd

    shape = (2, C, D, H, W)
    yp, A, B, t = _mk3d(s, P, C, M, K, shape)
    c = jnp.asarray([0.1, 0.2]).reshape(2, 1, 1, 1, 1)
    mask = (
        (jax.random.uniform(jax.random.PRNGKey(9), shape) > 0.5)
        .astype(jnp.float32) if use_mask else None
    )
    gx = jax.random.normal(jax.random.PRNGKey(4), shape)
    pads = tuple(p // 2 for p in P)

    def loss_ref(params):
        A_, B_, t_ = params
        z = lista_3d(yp, A_, B_, t_, c, mask=mask, stride=s)
        x = conv_transpose3d(z, B_[0], stride=s, padding=pads,
                             output_padding=s - 1)
        return jnp.sum(x * gx)

    _, g_ref = jax.value_and_grad(loss_ref)((A, B, t))

    _, _, (zh, rh) = lista3d_tiled(
        yp, A, B, t, c, stride=s, mask=mask, return_z=False,
        z_dtype=jnp.float32, interpret=True, return_hists=True, band=Bh,
    )
    g_tl = lista3d_tiled_fused_bwd(
        gx, yp, A, B, t, c, mask, zh, rh, stride=s, interpret=True
    )
    for name, a, b in zip("ABt", g_ref, g_tl):
        rel = float(jnp.abs(a - b).max()) / (float(jnp.abs(a).max()) + 1e-12)
        assert rel < 1e-4, (name, rel)


def test_tiled3d_train_gate_and_routing(monkeypatch):
    """Big-frame 3D training routes to the banded fused gradient
    (lista3d_tiled_train_supported / path 'tiled_train'): the reference's
    native eval frames (DAVIS 480x854, fastMRI 640x368) train fully fused
    where the whole-frame reverse's gate rejects them; flagship 128^2
    crops keep the resident 'fused' path."""
    from cdlnet_tpu.kernels.autodiff import (
        lista3d_tiled_train_supported,
        lista3d_train_supported,
    )

    assert not lista3d_train_supported(169, 1, (7, 7, 5), 2, 30, 16, 480, 854)
    assert lista3d_tiled_train_supported(169, 1, (7, 7, 5), 2, 30, 16, 480, 854)
    assert not lista3d_train_supported(169, 1, (9, 9, 5), 2, 30, 30, 640, 368)
    assert lista3d_tiled_train_supported(169, 1, (9, 9, 5), 2, 30, 30, 640, 368)
    # stride-indivisible frames stay on XLA
    assert not lista3d_tiled_train_supported(169, 1, (7, 7, 5), 2, 30,
                                             16, 481, 854)

    import cdlnet_tpu.kernels.autodiff as ad

    marker = object()
    monkeypatch.setattr(ad, "lista3d_tiled_diff", lambda *a, **kw: marker)
    cfg = {"K": 2, "M": 8, "P": (5, 5, 3), "s": 2, "C": 1,
           "adaptive": True, "depth": 8, "backend": "pallas"}
    m = build_model("CDLNetVideo", dict(cfg))
    params = m.init(jax.random.PRNGKey(0), init=False)
    # toy shape: resident fused fits -> 'fused' outranks 'tiled_train'
    yp = jnp.zeros((1, 1, 8, 32, 32), jnp.float32)
    assert m._pallas_path(params, yp, return_z=False, train=True) == "fused"
    # close the resident/scan reverse gates (and the ring reverse, which
    # outranks banded): training falls to tiled_train
    monkeypatch.setattr(ad, "lista3d_train_supported",
                        lambda *a, **kw: False)
    monkeypatch.setenv("CDLNET_LISTA3D_RING_BWD", "0")
    assert (m._pallas_path(params, yp, return_z=False, train=True)
            == "tiled_train")


def test_tiled3d_diff_end_to_end_grads(monkeypatch):
    """lista3d_tiled_diff's custom VJP (banded hist-collecting forward +
    banded reverse) matches XLA value-and-grad end-to-end through the
    fused path at fp32 histories."""
    monkeypatch.setenv("CDLNET_HIST_DTYPE", "f32")
    from cdlnet_tpu.kernels.autodiff import _xla_forward_3d, lista3d_tiled_diff

    s, P, C, M, K = 2, (5, 5, 3), 1, 8, 2
    shape = (2, C, 8, 64, 16)
    yp, A, B, t = _mk3d(s, P, C, M, K, shape)
    c = jnp.asarray([0.1, 0.2]).reshape(2, 1, 1, 1, 1)
    tgt = jax.random.uniform(jax.random.PRNGKey(4), shape)

    def loss_ref(params):
        A_, B_, t_ = params
        return jnp.mean((_xla_forward_3d(yp, A_, B_, t_, c, None, s)
                         - tgt) ** 2)

    def loss_pal(params):
        A_, B_, t_ = params
        return jnp.mean((lista3d_tiled_diff(yp, A_, B_, t_, c, stride=s,
                                            interpret=True) - tgt) ** 2)

    v_ref, g_ref = jax.value_and_grad(loss_ref)((A, B, t))
    v_pal, g_pal = jax.value_and_grad(loss_pal)((A, B, t))
    np.testing.assert_allclose(float(v_pal), float(v_ref), rtol=1e-5)
    for name, a, b in zip("ABt", g_ref, g_pal):
        rel = float(jnp.abs(a - b).max()) / (float(jnp.abs(a).max()) + 1e-12)
        assert rel < 1e-4, (name, rel)


# ---------------------------------------------------------------------------
# Depth-ring big-frame 3D kernel (kernels/lista3d_ring.py)
# ---------------------------------------------------------------------------

from cdlnet_tpu.kernels.lista3d_ring import (  # noqa: E402
    lista3d_ring,
    lista3d_ring_supported,
)


@pytest.mark.parametrize(
    "s,P,C,M,K,D,H,W,Bh,use_mask",
    [(2, (5, 5, 3), 1, 8, 3, 8, 64, 16, 8, False),   # nb=4: halo crossings
     (2, (5, 5, 3), 1, 8, 3, 8, 56, 16, 8, False),   # ragged Hc=28
     (1, (5, 5, 3), 1, 6, 2, 4, 33, 16, 8, False),   # stride 1, ragged
     (2, (5, 5, 3), 3, 6, 2, 4, 32, 16, 8, True),    # color + mask
     (2, (7, 7, 5), 1, 8, 2, 8, 64, 16, 16, False),  # asymmetric taps
     (2, (9, 9, 5), 1, 8, 2, 8, 64, 16, 16, False),  # odd-tap Qh=5
     (2, (5, 5, 3), 1, 8, 1, 8, 64, 16, 8, False),   # K=1: no mid kernel
     (2, (5, 5, 3), 1, 8, 3, 4, 64, 16, 8, False)],  # Dc=2 < ring size
)
def test_ring3d_matches_scan_interpret(s, P, C, M, K, D, H, W, Bh, use_mask):
    shape = (2, C, D, H, W)
    yp, A, B, t = _mk3d(s, P, C, M, K, shape)
    c = jnp.asarray([0.1, 0.2]).reshape(2, 1, 1, 1, 1)
    mask = (
        (jax.random.uniform(jax.random.PRNGKey(9), shape) > 0.5).astype(jnp.float32)
        if use_mask
        else None
    )
    z_ref = lista_3d(yp, A, B, t, c, mask=mask, stride=s)
    pads = tuple(p // 2 for p in P)
    x_ref = conv_transpose3d(
        z_ref, B[0], stride=s, padding=pads, output_padding=s - 1
    )
    x, z = lista3d_ring(yp, A, B, t, c, stride=s, mask=mask, return_z=True,
                        z_dtype=jnp.float32, interpret=True, band=Bh)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(z), np.asarray(z_ref), atol=1e-4)


def test_ring3d_gate_covers_native_eval_frames():
    """The depth-ring path covers the same native-resolution eval frames
    the banded pair path does (DAVIS 480x854, fastMRI 640x368), rejects
    residual variants and stride-indivisible shapes."""
    assert lista3d_ring_supported(169, 1, (7, 7, 5), 2, 30, 16, 480, 854)
    assert lista3d_ring_supported(169, 1, (9, 9, 5), 2, 30, 30, 640, 368)
    assert not lista3d_ring_supported(169, 1, (7, 7, 5), 2, 30, 16, 480, 854,
                                      residual=object())
    assert not lista3d_ring_supported(169, 1, (7, 7, 5), 2, 30, 15, 480, 854)


def test_ring3d_model_routing(monkeypatch):
    """CDLNetVideo backend='pallas' prefers the depth-ring path over the
    banded pair path for frames the fused gate rejects; CDLNET_LISTA3D_RING=0
    opts back out to banded."""
    import cdlnet_tpu.kernels.lista3d as k3d
    import cdlnet_tpu.kernels.lista3d_ring as krg3

    orig = krg3.lista3d_ring
    called = {}

    def spy(*a, **kw):
        called["ring"] = True
        return orig(*a, **{**kw, "interpret": True})

    monkeypatch.setattr(krg3, "lista3d_ring", spy)
    monkeypatch.setattr(k3d, "_VMEM_BUDGET", 64 * 1024)
    cfg = {"K": 2, "M": 6, "P": (5, 5, 3), "s": 2, "C": 1, "adaptive": True,
           "depth": 4}
    mx = build_model("CDLNetVideo", dict(cfg))
    mp = build_model("CDLNetVideo", dict(cfg, backend="pallas"))
    params = mx.init(jax.random.PRNGKey(0), init=True)
    y = jax.random.uniform(jax.random.PRNGKey(1), (1, 1, 4, 32, 16), jnp.float32)
    x_ref, _ = mx.apply(params, y, 25.0)
    x_got, _ = mp.apply(params, y, 25.0, return_z=True)
    assert called.get("ring")
    np.testing.assert_allclose(np.asarray(x_got), np.asarray(x_ref), atol=5e-3)
    # opt-out routes to the banded pair path instead
    monkeypatch.setenv("CDLNET_LISTA3D_RING", "0")
    assert mp._pallas_path(params, jnp.zeros((1, 1, 4, 32, 16)), True) == "tiled"


# ---------------------------------------------------------------------------
# Banded CSR prox modes (big-frame frame-recurrent inference)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("name", ["CDLNet_CSR", "CDLNet_CSRf2"])
def test_tiled_csr_prox_matches_scan_interpret(name, monkeypatch):
    """Frames the resident CSR kernel rejects route to the banded pair
    kernels with the CSR prox applied in-kernel (neighbor codes banded
    alongside); every neighbor-code dispatch case matches the XLA scan.
    This is analyzemri's native-resolution eval workload
    (reference analyzemri.py:87-156)."""
    import cdlnet_tpu.kernels.lista2d as k2d
    import cdlnet_tpu.kernels.lista2d_tiled as ktl

    # force the resident gate to reject so routing takes the banded path
    monkeypatch.setattr(k2d, "_VMEM_CAPACITY", 64 * 1024)
    orig = ktl.lista2d_tiled
    called = {}

    def spy(*a, **kw):
        called["tiled"] = True
        return orig(*a, **{**kw, "interpret": True, "z_dtype": jnp.float32})

    monkeypatch.setattr(ktl, "lista2d_tiled", spy)

    cfg = {"K": 3, "M": 8, "P": 7, "s": 2, "C": 1, "adaptive": True}
    mx = build_model(name, dict(cfg))
    mp = build_model(name, dict(cfg, backend="pallas"))
    params = mx.init(jax.random.PRNGKey(0), init=True)
    for k in params:
        params[k] = (
            params[k] * 0.3 if k[0] in "AB"
            else jnp.abs(params[k]) * 0.05 + 1e-3
        )
    # 64x32 with band 16: several bands, halo crossings
    y = jax.random.uniform(jax.random.PRNGKey(1), (2, 1, 64, 32), jnp.float32)
    zp = 0.1 * jax.random.normal(jax.random.PRNGKey(2), (2, 8, 32, 16))
    za = 0.1 * jax.random.normal(jax.random.PRNGKey(3), (2, 8, 32, 16))
    sig = jnp.asarray([20.0, 30.0]).reshape(2, 1, 1, 1)
    if name == "CDLNet_CSR":
        cases = [dict(z_prev=None), dict(z_prev=zp)]
    else:
        cases = [dict(z_prev=None, z_after=None), dict(z_prev=zp, z_after=None),
                 dict(z_prev=None, z_after=za), dict(z_prev=zp, z_after=za)]
    for case in cases:
        x_ref, z_ref = mx.apply(params, y, sigma=sig, **case)
        x_got, z_got = mp.apply(params, y, sigma=sig, **case)
        np.testing.assert_allclose(np.asarray(z_got), np.asarray(z_ref),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(x_got), np.asarray(x_ref),
                                   atol=1e-5)
    assert called.get("tiled")


def test_tiled_csr_gate_covers_native_mri_frames():
    """fastMRI-native 640x368 frames (argscsr config) pass the banded gate
    with neighbor codes counted; the resident gate rejects them."""
    from cdlnet_tpu.kernels.lista2d import lista2d_fused_supported

    for n_codes in (0, 1, 2):
        assert not lista2d_fused_supported(169, 1, 9, 2, 30, 640, 368,
                                           return_z=True, n_codes=n_codes)
        assert lista2d_tiled_supported(169, 1, 9, 2, 30, 640, 368,
                                       n_codes=n_codes)


def test_sliver_rows_alignment_invariants():
    """Halo-sliver heights must satisfy Mosaic's last-dim block rule
    ((hs*Wc) % 128 == 0) or degenerate to the full band — the rule is
    hardware-only (interpret mode never checks it), so pin it here."""
    from cdlnet_tpu.kernels.lista2d_tiled import _sliver_rows

    for Bh in (8, 16, 32, 64, 128):
        for G in (1, 2, 3, 4, 6, 8, 12):
            for Wc in (16, 27, 64, 184, 216, 427, 432):
                hs = _sliver_rows(Bh, G, Wc)
                assert Bh % hs == 0, (Bh, G, Wc, hs)
                assert hs >= min(G, Bh), (Bh, G, Wc, hs)
                assert hs == Bh or (hs * Wc) % 128 == 0, (Bh, G, Wc, hs)


def test_ring_padded_wc():
    """Column padding policy: multiple-of-16 for sliver alignment and
    mask retirement, upgraded to a 128-multiple when its overhead over the
    16-multiple choice is <=20% (aligned roll offsets — measured 1.37x at
    DAVIS-native despite the extra columns, 0.71x at fastMRI's +33%)."""
    from cdlnet_tpu.kernels.lista3d_ring import _padded_wc

    assert _padded_wc(427, 6) == 512   # DAVIS-native: 432 -> 512 (+18.5%)
    assert _padded_wc(216, 6) == 216   # no pad requested, stays
    assert _padded_wc(216, 6, pc_min=1) == 256   # 224 -> 256 (+14%)
    assert _padded_wc(184, 8, pc_min=2) == 192   # 256 would be +33%: stays
    assert _padded_wc(64, 6, pc_min=1) == 80     # 128 would be +60%: stays
    assert _padded_wc(27, 4, pc_min=1) == 32


def test_ring3d_odd_width_stride2_matches_scan_interpret():
    """s=2 ring with an odd code width (Wc=27 -> column-padded to 32):
    the pad columns are zeroed by the vm masks every iteration and the
    outputs cropped — must match the XLA scan exactly (fp32 carry)."""
    s, P, C, M, K = 2, (5, 5, 3), 1, 8, 3
    shape = (1, C, 8, 48, 54)  # W=54 -> Wc=27 (odd)
    yp, A, B, t = _mk3d(s, P, C, M, K, shape)
    c = jnp.asarray([0.15]).reshape(1, 1, 1, 1, 1)
    z_ref = lista_3d(yp, A, B, t, c, stride=s)
    pads = tuple(p // 2 for p in P)
    x_ref = conv_transpose3d(
        z_ref, B[0], stride=s, padding=pads, output_padding=s - 1
    )
    from cdlnet_tpu.kernels.lista3d_ring import lista3d_ring

    x, z = lista3d_ring(yp, A, B, t, c, stride=s, return_z=True,
                        z_dtype=jnp.float32, interpret=True, band=8)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(z), np.asarray(z_ref), atol=1e-4)


def test_ring3d_lane_class_path_matches_scan_interpret():
    """A width whose pad lands on a 128 MULTIPLE (Wc=127 -> 128) takes the
    r4 lane-class restructure (aligned tap slices + one roll per lane
    class) — must match the XLA scan exactly (fp32 carry)."""
    from cdlnet_tpu.kernels.lista3d_ring import _padded_wc, lista3d_ring

    s, P, C, M, K = 2, (5, 5, 3), 1, 8, 3
    assert _padded_wc(127, 4, pc_min=1) == 128  # lane path triggers
    shape = (1, C, 8, 48, 254)  # W=254 -> Wc=127
    yp, A, B, t = _mk3d(s, P, C, M, K, shape)
    c = jnp.asarray([0.15]).reshape(1, 1, 1, 1, 1)
    z_ref = lista_3d(yp, A, B, t, c, stride=s)
    pads = tuple(p // 2 for p in P)
    x_ref = conv_transpose3d(
        z_ref, B[0], stride=s, padding=pads, output_padding=s - 1
    )
    x, z = lista3d_ring(yp, A, B, t, c, stride=s, return_z=True,
                        z_dtype=jnp.float32, interpret=True, band=8)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(z), np.asarray(z_ref), atol=1e-4)
