"""Depth-sharded (sequence-parallel) 3D LISTA on the fused banded kernels
(dist/halo_fused.py) — VERDICT r3 #1: the productized composition of depth
sharding with the Pallas kernels, end to end through fit/serve.

Runs on the 8-virtual-device CPU mesh with the kernels in interpret mode
(CDLNET_PALLAS_INTERPRET=1, honored by make_banded3_ops).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from cdlnet_tpu.dist.mesh import make_mesh
from cdlnet_tpu.models.base import build_model
from cdlnet_tpu.train.optim import make_optimizer

CFG = {"K": 4, "M": 8, "P": (5, 5, 3), "s": 2, "C": 1, "adaptive": True,
       "depth": 16}


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setenv("CDLNET_PALLAS_INTERPRET", "1")


def _params(model, key=0):
    p = model.init(jax.random.PRNGKey(key), init=False)
    p["A"] = p["A"] * 0.05
    p["B"] = p["B"] * 0.05
    p["t"] = jnp.abs(p["t"]) * 0.1 + 1e-3
    return p


def test_gate():
    from cdlnet_tpu.dist.halo_fused import fused_depth_shard_supported

    m = build_model("CDLNetVideo", {**CFG, "backend": "pallas"})
    assert fused_depth_shard_supported(m, 16, 32, 48, 4)
    assert fused_depth_shard_supported(m, 16, 32, 48, 4, train=True)
    # XLA backend, single shard, indivisible depth, residual: all rejected
    assert not fused_depth_shard_supported(build_model("CDLNetVideo", CFG),
                                           16, 32, 48, 4)
    assert not fused_depth_shard_supported(m, 16, 32, 48, 1)
    assert not fused_depth_shard_supported(m, 12, 32, 48, 8)
    mres = build_model(
        "CDLNetVideo", {**CFG, "residual": True, "backend": "pallas"})
    assert not fused_depth_shard_supported(mres, 16, 32, 48, 4)


def test_eval_bitexact_vs_single_device_banded():
    """The depth-sharded forward runs the SAME banded kernels on halo-
    extended windows — kept-frame outputs are BIT-IDENTICAL to the
    single-device banded kernel (see halo_fused.py's exactness argument)."""
    from cdlnet_tpu.dist.halo_fused import sharded_lista_3d_fused_forward
    from cdlnet_tpu.kernels.lista3d_tiled import lista3d_tiled

    model = build_model("CDLNetVideo", {**CFG, "backend": "pallas"})
    params = _params(model)
    N, C, D, H, W = 2, 1, 16, 32, 48
    y = jax.random.uniform(jax.random.PRNGKey(1), (N, C, D, H, W))
    ypc = y - jnp.mean(y, axis=(1, 2, 3, 4), keepdims=True)

    mesh = make_mesh({"data": 2, "depth": 4})
    xs, zs = sharded_lista_3d_fused_forward(
        model, params, ypc, 25.0, mesh=mesh, batch_axis="data",
        return_z=True, interpret=True)
    xr, zr = lista3d_tiled(
        ypc, params["A"], params["B"], params["t"],
        jnp.full((N,), 25.0 / 255.0), stride=2, return_z=True,
        interpret=True)
    assert float(jnp.abs(xs - xr).max()) == 0.0
    assert float(jnp.abs(zs - zr).max()) == 0.0


def test_eval_depth_only_mesh_8way():
    """8-way depth sharding (1 code frame per shard, multi-hop halos)."""
    from cdlnet_tpu.dist.halo_fused import sharded_lista_3d_fused_forward
    from cdlnet_tpu.kernels.lista3d_tiled import lista3d_tiled

    model = build_model("CDLNetVideo", {**CFG, "backend": "pallas"})
    params = _params(model)
    y = jax.random.uniform(jax.random.PRNGKey(2), (1, 1, 16, 16, 32))
    ypc = y - jnp.mean(y)
    mesh = make_mesh({"depth": 8})
    xs, _ = sharded_lista_3d_fused_forward(
        model, params, ypc, 25.0, mesh=mesh, interpret=True)
    xr, _ = lista3d_tiled(
        ypc, params["A"], params["B"], params["t"],
        jnp.full((1,), 25.0 / 255.0), stride=2, interpret=True)
    assert float(jnp.abs(xs - xr).max()) == 0.0


def test_train_grads_match_xla():
    """Params AND input cotangents of the depth-sharded fused train
    forward match XLA autodiff of the equivalent scan (f32 histories)."""
    from cdlnet_tpu.dist.halo_fused import sharded_fused_3d_train_forward
    from cdlnet_tpu.models.base import sigma_scale
    from cdlnet_tpu.ops.conv import conv_transpose3d
    from cdlnet_tpu.ops.lista import lista_3d

    model = build_model("CDLNetVideo", {**CFG, "backend": "pallas"})
    params = _params(model)
    y = jax.random.uniform(jax.random.PRNGKey(1), (2, 1, 16, 32, 48))
    x = jax.random.uniform(jax.random.PRNGKey(2), (2, 1, 16, 32, 48))
    ypc = y - jnp.mean(y, axis=(1, 2, 3, 4), keepdims=True)
    mesh = make_mesh({"data": 2, "depth": 4})

    def loss_sharded(p, yin):
        xh = sharded_fused_3d_train_forward(
            model, p, yin, 25.0, mesh=mesh, batch_axis="data",
            interpret=True, z_dtype=jnp.float32)
        return jnp.mean((xh - x) ** 2)

    def loss_xla(p, yin):
        c = sigma_scale(25.0, True, 5)
        z = lista_3d(yin, p["A"], p["B"], p["t"], c, stride=2)
        xh = conv_transpose3d(z, p["B"][0], stride=2, padding=model.pad,
                              output_padding=1)
        return jnp.mean((xh - x) ** 2)

    l1, g1 = jax.value_and_grad(loss_sharded, argnums=(0, 1))(params, ypc)
    l2, g2 = jax.value_and_grad(loss_xla, argnums=(0, 1))(params, ypc)
    assert abs(float(l1) - float(l2)) < 1e-5
    for k in ("A", "B", "t"):
        a, b = np.asarray(g1[0][k]), np.asarray(g2[0][k])
        rel = np.abs(a - b).max() / (np.abs(b).max() + 1e-30)
        assert rel < 1e-5, (k, rel)
    a, b = np.asarray(g1[1]), np.asarray(g2[1])
    assert np.abs(a - b).max() / np.abs(b).max() < 1e-5


def test_make_train_step_depth_mesh(monkeypatch):
    """fit's make_train_step with mesh={"data","depth"} on a pallas 3D
    model: one full step matches the single-device XLA step (losses to
    1e-6; filter banks to 1e-5; thresholds are excluded — near-zero grads
    make first-step Adam updates sign-sensitive at the 1e-6 grad-parity
    level)."""
    monkeypatch.setenv("CDLNET_HIST_DTYPE", "f32")
    from cdlnet_tpu.train.fit import make_train_step

    model = build_model("CDLNetVideo", {**CFG, "backend": "pallas"})
    xmodel = build_model("CDLNetVideo", CFG)
    params = _params(model)
    opt = make_optimizer(1e-3, clip_grad=1.0)
    mesh = make_mesh({"data": 2, "depth": 4})

    step, eval_step = make_train_step(
        model, opt, workload="3d", noise_std=(20, 30), mesh=mesh)
    step1, _ = make_train_step(xmodel, opt, workload="3d", noise_std=(20, 30))

    batch = jax.random.uniform(jax.random.PRNGKey(1), (2, 1, 16, 32, 48))
    b = jax.device_put(
        batch, NamedSharding(mesh, P("data", None, "depth", None, None)))
    p = jax.device_put(params, NamedSharding(mesh, P()))
    key = jax.random.PRNGKey(2)

    p2, _, loss2 = step(p, opt.init(p), b, key)
    p1, _, loss1 = step1(params, opt.init(params), batch, key)
    np.testing.assert_allclose(float(loss2), float(loss1), rtol=1e-6)
    for k in ("A", "B"):
        np.testing.assert_allclose(
            np.asarray(p2[k]), np.asarray(p1[k]), rtol=1e-4, atol=1e-7)
    assert np.isfinite(float(eval_step(p2, b, key)))

    # ragged clip depth (12 % (4*2) != 0) falls back to the unsharded
    # forward — must trace and run under the mesh
    b3 = jax.random.uniform(jax.random.PRNGKey(3), (2, 1, 12, 32, 48))
    _, _, loss3 = step(p, opt.init(p), b3, key)
    assert np.isfinite(float(loss3))


def test_make_train_step_depth_mesh_residual_xla_halo():
    """Residual-block models route to the XLA halo-exchange forward under
    a depth mesh; the step matches the single-device XLA step."""
    from cdlnet_tpu.train.fit import make_train_step

    cfg = {**CFG, "residual": True}
    model = build_model("CDLNetVideo", {**cfg, "backend": "pallas"})
    xmodel = build_model("CDLNetVideo", cfg)
    params = _params(model)
    opt = make_optimizer(1e-3, clip_grad=1.0)
    mesh = make_mesh({"data": 2, "depth": 4})

    step, _ = make_train_step(
        model, opt, workload="3d", noise_std=(20, 30), mesh=mesh)
    step1, _ = make_train_step(xmodel, opt, workload="3d", noise_std=(20, 30))
    batch = jax.random.uniform(jax.random.PRNGKey(1), (2, 1, 16, 32, 48))
    b = jax.device_put(
        batch, NamedSharding(mesh, P("data", None, "depth", None, None)))
    p = jax.device_put(params, NamedSharding(mesh, P()))
    key = jax.random.PRNGKey(2)
    p2, _, loss2 = step(p, opt.init(p), b, key)
    p1, _, loss1 = step1(params, opt.init(params), batch, key)
    np.testing.assert_allclose(float(loss2), float(loss1), rtol=1e-5)


def test_fit_accepts_depth_mesh(tmp_path):
    """fit(mesh={"data": N, "depth": M}) — the config-level product
    surface ({"dist": {"mesh": ...}} via the train CLI) — runs a short
    3D training and writes the usual artifacts."""
    from cdlnet_tpu.train.fit import fit, init_model

    args = {
        "type": "CDLNetVideo",
        "model": {**CFG, "backend": "pallas", "init": False},
        "paths": {"ckpt": None},
        "train": {"opt": {"lr": 1e-3}},
    }
    model, params, opt, opt_state, _, _ = init_model(args)
    params["A"] = params["A"] * 0.05
    params["B"] = params["B"] * 0.05
    params["t"] = jnp.abs(params["t"]) * 0.1 + 1e-3

    rng = np.random.default_rng(0)
    clips = [rng.uniform(0, 1, (2, 1, 16, 32, 32)).astype(np.float32)
             for _ in range(2)]
    loaders = {"train": clips, "val": clips[:1], "test": clips[:1]}
    params2, _, hist = fit(
        model, params, opt, opt_state, loaders,
        save_dir=str(tmp_path), epochs=1, workload="3d",
        noise_std=(20, 30), mesh={"data": 2, "depth": 4},
        backtrack_thresh=None, verbose=False,
    )
    assert (tmp_path / "train.txt").exists()
    assert all(np.isfinite(np.asarray(jax.tree_util.tree_leaves(params2)[0])).all()
               for _ in [0])


def test_serve_depth_mesh_matches_xla():
    """Denoiser(mesh={"depth": ...}) serves clips depth-sharded; output
    matches the single-device XLA Denoiser to the bf16 carry tolerance,
    and residual models take the XLA halo path exactly."""
    from cdlnet_tpu.serve import Denoiser

    xmodel = build_model("CDLNetVideo", CFG)
    model = build_model("CDLNetVideo", {**CFG, "backend": "pallas"})
    params = _params(xmodel)
    rng = np.random.default_rng(3)
    clip = rng.uniform(0, 1, (1, 1, 16, 32, 48)).astype(np.float32)

    ref = Denoiser(xmodel, params, bucket=16)._run(clip, 25.0)
    got = Denoiser(model, params, bucket=16,
                   mesh={"data": 1, "depth": 8})._run(clip, 25.0)
    assert np.abs(got - ref).max() < 5e-3  # bf16 code-carry tolerance

    cfg = {**CFG, "residual": True}
    mres = build_model("CDLNetVideo", {**cfg, "backend": "pallas"})
    xres = build_model("CDLNetVideo", cfg)
    pres = _params(xres, key=1)
    r1 = Denoiser(xres, pres, bucket=16)._run(clip, 25.0)
    r2 = Denoiser(mres, pres, bucket=16, mesh={"depth": 8})._run(clip, 25.0)
    np.testing.assert_allclose(r2, r1, atol=1e-5)


def test_eval_ring_route_taken_and_matches(monkeypatch):
    """r5: the depth-sharded forward auto-routes to the RING kernels
    (make_ring3_ops on halo-extended windows) where supported; outputs
    match the single-device ring AND the banded kernel; the env switch
    falls back to banded."""
    import cdlnet_tpu.kernels.lista3d_ring as kr
    from cdlnet_tpu.dist import halo_fused as hf
    from cdlnet_tpu.kernels.lista3d_ring import lista3d_ring
    from cdlnet_tpu.kernels.lista3d_tiled import lista3d_tiled

    model = build_model("CDLNetVideo", {**CFG, "backend": "pallas"})
    params = _params(model)
    N, C, D, H, W = 2, 1, 16, 32, 48
    y = jax.random.uniform(jax.random.PRNGKey(3), (N, C, D, H, W))
    ypc = y - jnp.mean(y)
    assert hf.ring_depth_shard_supported(model, D, H, W, 4)

    called = {}
    orig = kr.make_ring3_ops

    def spy(*a, **kw):
        called["ring"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(kr, "make_ring3_ops", spy)
    mesh = make_mesh({"data": 2, "depth": 4})
    xs, zs = hf.sharded_lista_3d_fused_forward(
        model, params, ypc, 25.0, mesh=mesh, batch_axis="data",
        return_z=True, interpret=True)
    assert called.get("ring"), "sharded forward did not take the ring route"

    xr, zr = lista3d_ring(
        ypc, params["A"], params["B"], params["t"],
        jnp.full((N,), 25.0 / 255.0), stride=2, return_z=True,
        interpret=True)
    np.testing.assert_allclose(np.asarray(xs), np.asarray(xr), atol=1e-6)
    np.testing.assert_allclose(np.asarray(zs), np.asarray(zr), atol=1e-6)

    # env opt-out: banded local path, still exact vs the banded kernel
    monkeypatch.setenv("CDLNET_LISTA3D_RING", "0")
    called.clear()
    xb, _ = hf.sharded_lista_3d_fused_forward(
        model, params, ypc, 25.0, mesh=mesh, batch_axis="data",
        interpret=True)
    assert not called.get("ring")
    xtb, _ = lista3d_tiled(
        ypc, params["A"], params["B"], params["t"],
        jnp.full((N,), 25.0 / 255.0), stride=2, interpret=True)
    assert float(jnp.abs(xb - xtb).max()) == 0.0


def test_train_ring_route_taken(monkeypatch):
    """r5: depth-sharded training routes to the merged ring reverse where
    it fits; CDLNET_LISTA3D_RING_BWD=0 falls back to the banded+XLA-wgrad
    local path (both already gradient-validated above)."""
    import cdlnet_tpu.dist.halo_fused as hf

    model = build_model("CDLNetVideo", {**CFG, "backend": "pallas"})
    assert hf.ring_depth_shard_train_supported(model, 16, 32, 48, 4)
    monkeypatch.setenv("CDLNET_LISTA3D_RING_BWD", "0")
    assert not hf.ring_depth_shard_train_supported(model, 16, 32, 48, 4)

    called = {}
    orig = hf.make_sharded_ring_3d_train

    def spy(*a, **kw):
        called["ring"] = True
        return orig(*a, **kw)

    monkeypatch.delenv("CDLNET_LISTA3D_RING_BWD")
    monkeypatch.setattr(hf, "make_sharded_ring_3d_train", spy)
    params = _params(model)
    y = jax.random.uniform(jax.random.PRNGKey(1), (2, 1, 16, 32, 48))
    ypc = y - jnp.mean(y, axis=(1, 2, 3, 4), keepdims=True)
    mesh = make_mesh({"data": 2, "depth": 4})
    xh = hf.sharded_fused_3d_train_forward(
        model, params, ypc, 25.0, mesh=mesh, batch_axis="data",
        interpret=True, z_dtype=jnp.float32)
    assert called.get("ring")
    assert np.isfinite(np.asarray(xh)).all()
