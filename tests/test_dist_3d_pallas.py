"""3D pallas kernel families under a data-parallel mesh (VERDICT r3 #6):
the fused pair forward, the fused train step (resident/pair reverse), and
the banded big-frame forward all run per-device inside shard_map and match
their single-device counterparts. Interpret mode on the 8-CPU mesh.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from cdlnet_tpu.dist.mesh import make_mesh
from cdlnet_tpu.models.base import build_model
from cdlnet_tpu.train.optim import make_optimizer

CFG = {"K": 3, "M": 8, "P": (5, 5, 3), "s": 2, "C": 1, "adaptive": True,
       "depth": 8}


def _force_interpret_3d(monkeypatch):
    import cdlnet_tpu.kernels.autodiff as ad
    import cdlnet_tpu.kernels.lista3d as k3d
    import cdlnet_tpu.kernels.lista3d_ring as kring

    for mod, name in (
        (k3d, "lista3d_fused"),
        (ad, "lista3d_fused_diff"),
        (ad, "lista3d_tiled_diff"),
        (kring, "lista3d_ring"),
    ):
        orig = getattr(mod, name)
        monkeypatch.setattr(
            mod, name,
            lambda *a, _o=orig, **kw: _o(*a, **{**kw, "interpret": True}),
        )
    monkeypatch.setenv("CDLNET_PALLAS_INTERPRET", "1")  # banded builder


def _params(model, key=0):
    p = model.init(jax.random.PRNGKey(key), init=False)
    p["A"] = p["A"] * 0.05
    p["B"] = p["B"] * 0.05
    p["t"] = jnp.abs(p["t"]) * 0.1 + 1e-3
    return p


def test_dp_shard_map_3d_fused_forward_matches_single(monkeypatch):
    """CDLNetVideo fused (pair) forward under shard_map over the batch ==
    unsharded fused forward (per-sample kernels; split is exact)."""
    _force_interpret_3d(monkeypatch)
    from cdlnet_tpu.dist.sharding import shard_map_forward

    model = build_model("CDLNetVideo", {**CFG, "backend": "pallas"})
    params = _params(model)
    y = jax.random.uniform(jax.random.PRNGKey(1), (4, 1, 8, 32, 32))
    assert model._pallas_path(params, y, False) == "fused"

    ref = model.apply(params, y, 25.0, return_z=False)[0]
    mesh = make_mesh({"data": 4}, devices=jax.devices()[:4])
    fwd = shard_map_forward(
        mesh,
        lambda p, yl, s, m: model.apply(p, yl, s, mask=m, return_z=False)[0],
    )
    got = jax.jit(lambda p, yv: fwd(p, yv, 25.0))(params, y)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


def test_dp_train_step_3d_pallas_matches_single(monkeypatch):
    """make_train_step(mesh=...) on a pallas CDLNetVideo: the fused
    forward+reverse run inside shard_map; the full step matches the
    single-device pallas step."""
    monkeypatch.setenv("CDLNET_HIST_DTYPE", "f32")
    _force_interpret_3d(monkeypatch)
    from cdlnet_tpu.train.fit import make_train_step

    model = build_model("CDLNetVideo", {**CFG, "backend": "pallas"})
    params = _params(model)
    opt = make_optimizer(1e-3, clip_grad=0.05)
    batch = jax.random.uniform(jax.random.PRNGKey(1), (4, 1, 8, 32, 32))
    key = jax.random.PRNGKey(5)

    step_ref, _ = make_train_step(model, opt, workload="3d",
                                  noise_std=(20, 30))
    p_ref, _, loss_ref = step_ref(params, opt.init(params), batch, key)

    mesh = make_mesh({"data": 4}, devices=jax.devices()[:4])
    step_dp, _ = make_train_step(model, opt, workload="3d",
                                 noise_std=(20, 30), mesh=mesh)
    p_d = jax.device_put(params, NamedSharding(mesh, P()))
    b_d = jax.device_put(batch, NamedSharding(mesh, P("data")))
    p_dp, _, loss_dp = step_dp(p_d, opt.init(p_d), b_d, key)

    np.testing.assert_allclose(float(loss_dp), float(loss_ref), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p_ref),
                    jax.tree_util.tree_leaves(p_dp)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-6)


def test_dp_shard_map_3d_banded_forward_matches_single(monkeypatch):
    """The banded big-frame 3D forward (lista3d_tiled, routed for shapes
    the pair gate rejects) under shard_map over the batch == unsharded."""
    _force_interpret_3d(monkeypatch)
    monkeypatch.setenv("CDLNET_LISTA3D_RING", "0")
    from cdlnet_tpu.dist.sharding import shard_map_forward
    from cdlnet_tpu.kernels.lista3d_tiled import lista3d_tiled

    model = build_model("CDLNetVideo", {**CFG, "backend": "pallas"})
    params = _params(model)
    y = jax.random.uniform(jax.random.PRNGKey(2), (2, 1, 8, 24, 40))
    ypc = y - jnp.mean(y, axis=(1, 2, 3, 4), keepdims=True)

    ref, _ = lista3d_tiled(ypc, params["A"], params["B"], params["t"],
                           jnp.full((2,), 25.0 / 255.0), stride=2,
                           interpret=True)
    mesh = make_mesh({"data": 2}, devices=jax.devices()[:2])
    fwd = shard_map_forward(
        mesh,
        lambda p, yl, sg, m: lista3d_tiled(
            yl, p["A"], p["B"], p["t"],
            jnp.broadcast_to(jnp.asarray(sg, jnp.float32) / 255.0,
                             (yl.shape[0],)),
            stride=2, interpret=True)[0],
    )
    got = jax.jit(lambda p, yv: fwd(p, yv, 25.0))(params, ypc)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


def test_dp_shard_map_mri_geometry_banded_matches_single(monkeypatch):
    """The (9,9,5) fastMRI tap geometry (the alignment class that once
    failed only on hardware) under shard_map over the batch."""
    _force_interpret_3d(monkeypatch)
    monkeypatch.setenv("CDLNET_LISTA3D_RING", "0")
    from cdlnet_tpu.dist.sharding import shard_map_forward
    from cdlnet_tpu.kernels.lista3d_tiled import lista3d_tiled

    model = build_model(
        "CDLNetVideo",
        {"K": 2, "M": 8, "P": (9, 9, 5), "s": 2, "C": 1, "adaptive": True,
         "depth": 8, "backend": "pallas"})
    params = _params(model)
    y = jax.random.uniform(jax.random.PRNGKey(3), (2, 1, 8, 32, 48))
    ypc = y - jnp.mean(y, axis=(1, 2, 3, 4), keepdims=True)

    ref, _ = lista3d_tiled(ypc, params["A"], params["B"], params["t"],
                           jnp.full((2,), 25.0 / 255.0), stride=2,
                           interpret=True)
    mesh = make_mesh({"data": 2}, devices=jax.devices()[:2])
    fwd = shard_map_forward(
        mesh,
        lambda p, yl, sg, m: lista3d_tiled(
            yl, p["A"], p["B"], p["t"],
            jnp.broadcast_to(jnp.asarray(sg, jnp.float32) / 255.0,
                             (yl.shape[0],)),
            stride=2, interpret=True)[0],
    )
    got = jax.jit(lambda p, yv: fwd(p, yv, 25.0))(params, ypc)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)
