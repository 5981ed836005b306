"""Distributed paths on the 8-device CPU mesh: DP train step, depth-sharded
3D LISTA parity vs the unsharded forward."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cdlnet_tpu.dist.mesh import make_mesh
from cdlnet_tpu.dist.sharding import batch_sharding, make_dp_train_step
from cdlnet_tpu.dist.halo import sharded_lista_3d_forward
from cdlnet_tpu.models import CDLNet, CDLNetVideo
from cdlnet_tpu.train.optim import make_optimizer


def test_make_mesh_specs():
    mesh = make_mesh()
    assert mesh.shape == {"data": 8}
    mesh = make_mesh({"data": 2, "depth": 4})
    assert mesh.shape == {"data": 2, "depth": 4}
    mesh = make_mesh({"data": -1, "depth": 2})
    assert mesh.shape == {"data": 4, "depth": 2}
    with pytest.raises(ValueError):
        make_mesh({"data": 3})


def test_dp_train_step_matches_single_device():
    """Gradients psum'd over the mesh must equal the single-device step."""
    model = CDLNet(K=2, M=4, P=3, s=1)
    params = model.init(jax.random.PRNGKey(0), init=False)
    opt = make_optimizer(1e-3, clip_grad=1.0)
    opt_state = opt.init(params)

    rng = np.random.default_rng(0)
    batch = jnp.asarray(rng.random((8, 1, 16, 16)).astype(np.float32))
    key = jax.random.PRNGKey(1)

    def loss_fn(p, b, k):
        noisy = b + 0.1 * jax.random.normal(k, b.shape)
        xhat, _ = model.apply(p, noisy, 25.0)
        return jnp.mean((xhat - b) ** 2)

    # single-device reference
    loss_ref, grads_ref = jax.value_and_grad(loss_fn)(params, batch, key)

    mesh = make_mesh({"data": 8})
    step, prepare = make_dp_train_step(model, opt, loss_fn, mesh)
    p_d, o_d, b_d = prepare(params, opt_state, batch)
    p2, o2, loss = step(p_d, o_d, b_d, key)
    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=1e-5)

    # apply the same update locally and compare params
    up_ref, _ = opt.update(grads_ref, opt_state, params)
    p_ref = jax.tree_util.tree_map(lambda p, u: p + u, params, up_ref)
    p_ref = model.project(p_ref)
    for a, b in zip(jax.tree_util.tree_leaves(p_ref), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("s,P,residual", [(1, (3, 3, 3), False), (2, (7, 7, 5), False), (1, (3, 3, 3), True)])
def test_depth_sharded_forward_parity(s, P, residual):
    """Depth-sharded forward == unsharded forward (halo math exactness)."""
    model = CDLNetVideo(K=3, M=6, P=P, s=s, adaptive=True, residual=residual)
    params = model.init(jax.random.PRNGKey(0), init=False)
    # scale weights down so the unnormalized LISTA doesn't blow up
    params = jax.tree_util.tree_map(lambda x: x * 0.2 if x.ndim > 4 else x, params)
    params["t"] = jnp.abs(0.01 * jax.random.normal(jax.random.PRNGKey(2), params["t"].shape))

    rng = np.random.default_rng(3)
    D = 16
    y = jnp.asarray(rng.random((1, 1, D, 16, 16)).astype(np.float32))

    # unsharded reference (mean-subtract then LISTA, H/W already divisible)
    xhat_ref, z_ref = model.apply(params, y, 25.0)

    mesh = make_mesh({"depth": 4}, devices=jax.devices()[:4])
    xhat, z = sharded_lista_3d_forward(model, params, y, 25.0, mesh=mesh)
    # The halo math is exact (1e-11 in float64); fp32 accumulation-order
    # differences get amplified by near-threshold soft-threshold crossings,
    # so allow a few 1e-3-level outliers.
    np.testing.assert_allclose(np.asarray(xhat), np.asarray(xhat_ref), rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(z), np.asarray(z_ref), rtol=5e-3, atol=5e-3)


def test_depth_sharded_rejects_bad_depth():
    model = CDLNetVideo(K=2, M=4, P=(3, 3, 3), s=2)
    params = model.init(jax.random.PRNGKey(0), init=False)
    mesh = make_mesh({"depth": 4}, devices=jax.devices()[:4])
    y = jnp.zeros((1, 1, 12, 16, 16))  # 12 % (4*2) != 0
    with pytest.raises(ValueError):
        sharded_lista_3d_forward(model, params, y, 25.0, mesh=mesh)


def test_fit_with_mesh_runs_and_improves(tmp_path):
    """fit(mesh={"data": -1}) trains data-parallel over the 8 virtual CPU
    devices: runs, improves PSNR, and keeps checkpoints restorable."""
    from tests.test_train import make_loaders
    from cdlnet_tpu.models import CDLNet
    from cdlnet_tpu.train.fit import fit
    from cdlnet_tpu.train.optim import make_optimizer

    model = CDLNet(K=2, M=6, P=5, s=1, adaptive=True)
    params = model.init(jax.random.PRNGKey(0), init=True)
    opt = make_optimizer(1e-3, clip_grad=0.05)
    opt_state = opt.init(params)
    loaders = make_loaders(n=8, bs=8)  # divisible by the 8-device data axis
    params, opt_state, history = fit(
        model, params, opt, opt_state, loaders, save_dir=str(tmp_path),
        epochs=4, noise_std=25, val_freq=4, save_freq=1, verbose=False,
        mesh={"data": -1},
    )
    train_psnrs = [p for e, ph, p in history if ph == "train"]
    assert train_psnrs[-1] > train_psnrs[0], train_psnrs


def test_fit_with_mesh_rejects_indivisible_batch(tmp_path):
    from tests.test_train import make_loaders
    from cdlnet_tpu.models import CDLNet
    from cdlnet_tpu.train.fit import fit
    from cdlnet_tpu.train.optim import make_optimizer

    model = CDLNet(K=2, M=4, P=5, s=1)
    params = model.init(jax.random.PRNGKey(0), init=False)
    opt = make_optimizer(1e-3)
    with pytest.raises(ValueError, match="not divisible"):
        fit(model, params, opt, opt.init(params), make_loaders(n=6, bs=3),
            save_dir=str(tmp_path), epochs=1, verbose=False, mesh={"data": -1})


def test_subband_tp_forward_parity():
    """M-sharded (tensor-parallel) CDLNet forward matches the replicated
    forward — GSPMD inserts the synthesis psum from the shardings alone."""
    from cdlnet_tpu.dist.sharding import replicate_sharding, subband_shardings

    mesh = make_mesh({"model": 8})
    model = CDLNet(K=3, M=16, P=5, s=2, adaptive=True)
    params = model.init(jax.random.PRNGKey(0), init=True)
    y = jax.random.uniform(jax.random.PRNGKey(1), (2, 1, 32, 32), jnp.float32)

    fwd = jax.jit(lambda p, y: model.apply(p, y, 25.0)[0])
    x_ref = fwd(params, y)

    shardings = subband_shardings(params, mesh, axis="model")
    params_tp = jax.device_put(params, shardings)
    y_tp = jax.device_put(y, replicate_sharding(mesh))
    x_tp = fwd(params_tp, y_tp)
    np.testing.assert_allclose(np.asarray(x_tp), np.asarray(x_ref), atol=2e-5)


def _tp_step_fixture():
    model = CDLNet(K=3, M=16, P=5, s=2, adaptive=True)
    params = model.init(jax.random.PRNGKey(0), init=True)
    opt = make_optimizer(1e-3, clip_grad=1.0)
    rng = np.random.default_rng(3)
    batch = jnp.asarray(rng.random((8, 1, 32, 32)).astype(np.float32))
    key = jax.random.PRNGKey(7)

    def loss_fn(p, b, k):
        noisy = b + 0.1 * jax.random.normal(k, b.shape)
        xhat, _ = model.apply(p, noisy, 25.0)
        return jnp.mean((xhat - b) ** 2)

    @jax.jit
    def step(p, o, b, k):
        loss, g = jax.value_and_grad(loss_fn)(p, b, k)
        up, o = opt.update(g, o, p)
        p = jax.tree_util.tree_map(lambda a, u: a + u, p, up)
        return model.project(p), o, loss

    return model, params, opt, batch, key, step


def test_subband_tp_train_step_matches_replicated():
    """A FULL train step (grad + Adam + clip + projection) with M-sharded
    params equals the replicated step: the analysis output channels and
    thresholds are M-sharded (no comm), GSPMD inserts the synthesis psum,
    and the elementwise optimizer + per-subband projection stay sharded."""
    from cdlnet_tpu.dist.sharding import replicate_sharding, subband_shardings

    model, params, opt, batch, key, step = _tp_step_fixture()
    p_ref, _, loss_ref = step(params, opt.init(params), batch, key)

    mesh = make_mesh({"model": 8})
    params_tp = jax.device_put(params, subband_shardings(params, mesh,
                                                         axis="model"))
    b_tp = jax.device_put(batch, replicate_sharding(mesh))
    p_tp, _, loss_tp = step(params_tp, opt.init(params_tp), b_tp, key)
    np.testing.assert_allclose(float(loss_tp), float(loss_ref), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p_ref),
                    jax.tree_util.tree_leaves(p_tp)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-6)


def test_dp_tp_train_step_matches_replicated():
    """2-axis DP x TP mesh (data 2 x model 4): batch sharded over data,
    params over M — one train step equals the single-device step (grad
    psum over data, synthesis psum over model, both GSPMD-inserted)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cdlnet_tpu.dist.sharding import subband_shardings

    model, params, opt, batch, key, step = _tp_step_fixture()
    p_ref, _, loss_ref = step(params, opt.init(params), batch, key)

    mesh = make_mesh({"data": 2, "model": 4})
    params_s = jax.device_put(params, subband_shardings(params, mesh,
                                                        axis="model"))
    b_s = jax.device_put(batch, NamedSharding(mesh, P("data")))
    p_s, _, loss_s = step(params_s, opt.init(params_s), b_s, key)
    np.testing.assert_allclose(float(loss_s), float(loss_ref), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p_ref),
                    jax.tree_util.tree_leaves(p_s)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-6)


def test_make_hybrid_mesh_single_slice():
    from cdlnet_tpu.dist.init import initialize_distributed, make_hybrid_mesh

    assert initialize_distributed() is False  # single-process no-op
    mesh = make_hybrid_mesh({"data": 2, "depth": -1})
    assert dict(mesh.shape) == {"replica": 1, "data": 2, "depth": 4}


def test_two_process_distributed_dp_matches_single(tmp_path):
    """REAL multi-process runtime: two OS processes, each with 2 virtual
    CPU devices, joined by jax.distributed.initialize over a localhost
    coordinator (Gloo collectives) through dist.init.initialize_distributed.
    Both ranks run 3 DP train steps over the 4-device global mesh via
    make_dp_train_step (incl. prepare()'s cross-process device_put) and
    must agree with each other AND with the unsharded single-process step
    — the multi-host leg of SURVEY.md §2.5's comm-backend requirement."""
    import os
    import re
    import socket
    import subprocess
    import sys

    from cdlnet_tpu.models import build_model

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from dist_two_process_case import CASE, loss_for

    # reference: unsharded steps in this process
    model = build_model(CASE["mtype"], CASE["model"])
    params = model.init(jax.random.PRNGKey(0), init=False)
    opt = make_optimizer(1e-3, clip_grad=1.0)
    ostate = opt.init(params)
    rng = np.random.default_rng(0)
    x = rng.uniform(size=CASE["batch"]).astype(np.float32)
    y = (x + 0.1 * rng.standard_normal(x.shape)).astype(np.float32)
    loss_fn = loss_for(model)

    @jax.jit
    def step(p, o, b, key):
        loss, grads = jax.value_and_grad(loss_fn)(p, b, key)
        updates, o = opt.update(grads, o, p)
        p = jax.tree_util.tree_map(lambda a, u: a + u, p, updates)
        return model.project(p), o, loss

    for i in range(CASE["steps"]):
        params, ostate, _ = step(params, ostate, (y, x), jax.random.PRNGKey(i))
    ck_ref = sum(float(jnp.sum(jnp.abs(v)))
                 for v in jax.tree_util.tree_leaves(params))

    with socket.socket() as s:  # free localhost port for the coordinator
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    worker = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "dist_two_process_worker.py")
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    # The worker imports cdlnet_tpu; don't rely on the package being
    # pip-installed — put the repo root on the subprocess's path.
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen([sys.executable, worker, str(rank), str(port)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env)
        for rank in (0, 1)
    ]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    assert all(p.returncode == 0 for p in procs), outs
    cks, hcks = {}, {}
    for out in outs:
        m = re.search(r"CHECKSUM (\d) ([\d.]+)", out)
        assert m, out
        cks[int(m.group(1))] = float(m.group(2))
        m = re.search(r"HALOSUM (\d) ([\d.]+)", out)
        assert m, out
        hcks[int(m.group(1))] = float(m.group(2))
    assert set(cks) == {0, 1}
    assert cks[0] == cks[1]  # ranks bit-agree
    np.testing.assert_allclose(cks[0], ck_ref, rtol=1e-5)

    # depth-halo leg: unsharded reference forward in this process
    vmodel = build_model(CASE["vmtype"], CASE["vmodel"])
    vparams = vmodel.init(jax.random.PRNGKey(0), init=False)
    vparams = {k: v * 0.1 if k in ("A", "B") else jnp.abs(v) + 0.01
               for k, v in vparams.items()}
    clip = rng.uniform(size=CASE["clip"]).astype(np.float32)
    xhat, _ = vmodel.apply(vparams, jnp.asarray(clip), 25.0)
    href = float(jnp.sum(jnp.abs(xhat)))
    assert hcks[0] == hcks[1]
    np.testing.assert_allclose(hcks[0], href, rtol=1e-4)
