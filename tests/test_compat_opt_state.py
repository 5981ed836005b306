"""Torch optimizer/scheduler state interop (reference train.py:221-247).

The reference's resume restores Adam moments and the StepLR counter;
compat.import_opt_state maps them onto the optax state so a torch-trained
run resumed here takes the SAME next update. Ordering vs the live reference
modules is validated by tools/opt_state_gate.py (needs the reference
checkout); these tests validate the moment mapping and update equivalence
against torch.optim directly, and the export/import round-trip.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cdlnet_tpu.models import CDLNet, CDLNetVideo, GDLNet, DnCNN
from cdlnet_tpu.compat import (
    export_opt_state,
    export_sched_state,
    import_opt_state,
    import_sched_state,
    param_order,
    save_torch_checkpoint,
)
from cdlnet_tpu.compat.torch_ckpt import _leaf_get
from cdlnet_tpu.train.optim import get_lr, make_optimizer

torch = pytest.importorskip("torch")


def _tree_to_grads(model, params, seed=0):
    """Deterministic synthetic gradient pytree."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    rng = np.random.RandomState(seed)
    gl = [jnp.asarray(rng.randn(*np.shape(l)).astype(np.float32)) for l in leaves]
    return jax.tree_util.tree_unflatten(treedef, gl)


@pytest.mark.parametrize(
    "model",
    [
        CDLNet(K=3, M=4, P=5, s=2, adaptive=True),
        CDLNetVideo(K=2, M=4, P=(3, 3, 3), s=1, residual=True),
        GDLNet(K=3, M=4, P=5, order=2, shared="alpha_psi"),
        DnCNN(K=4, M=8),
    ],
)
def test_param_order_covers_params(model):
    params = model.init(jax.random.PRNGKey(0), init=False)
    if isinstance(params, tuple):
        params = params[0]
    order = param_order(model)
    # every address resolves, and total element count == sum over leaves
    total = sum(int(np.asarray(_leaf_get(params, a)).size) for a in order)
    n_leaves = sum(int(np.size(l)) for l in jax.tree_util.tree_leaves(params))
    assert total == n_leaves


def test_adam_update_matches_torch():
    """A torch Adam run imported mid-flight takes the same next step."""
    model = CDLNet(K=2, M=4, P=3, s=1, adaptive=True)
    params = model.init(jax.random.PRNGKey(0), init=False)
    order = param_order(model)
    lr = 3e-3

    tparams = [
        torch.nn.Parameter(torch.from_numpy(np.array(_leaf_get(params, a))))
        for a in order
    ]
    topt = torch.optim.Adam(tparams, lr=lr)

    # N torch steps with deterministic grads
    for step in range(3):
        grads = _tree_to_grads(model, params, seed=step)
        for tp, a in zip(tparams, order):
            tp.grad = torch.from_numpy(np.array(_leaf_get(grads, a)))
        topt.step()
    opt_sd = topt.state_dict()
    # state dict -> numpy COPIES (as load_torch_checkpoint would produce);
    # tensor.numpy() is a live view that the later opt.step() would mutate
    opt_sd = {
        "state": {
            k: {
                kk: np.array(vv.numpy()) if torch.is_tensor(vv) else vv
                for kk, vv in v.items()
            }
            for k, v in opt_sd["state"].items()
        },
        "param_groups": opt_sd["param_groups"],
    }

    opt = make_optimizer(lr, clip_grad=None)
    opt_state = opt.init(params)
    opt_state = import_opt_state(model, opt_sd, opt_state, params)

    # our params haven't seen the 3 torch steps — sync them from torch
    synced = jax.tree_util.tree_map(lambda x: np.array(x, np.float32), params)
    from cdlnet_tpu.compat.torch_ckpt import _leaf_set

    for tp, a in zip(tparams, order):
        # COPY: tensor.numpy() is a live view, and jnp.asarray on CPU may
        # alias numpy buffers zero-copy — the later topt.step() would then
        # mutate our synced tree in place (observed as a flaky ~lr-sized
        # divergence on an alignment-dependent subset of leaves)
        _leaf_set(synced, a, np.array(tp.detach().numpy()))
    synced = jax.tree_util.tree_map(jnp.asarray, synced)

    # step N+1 on both sides with the same gradient
    grads = _tree_to_grads(model, params, seed=99)
    for tp, a in zip(tparams, order):
        tp.grad = torch.from_numpy(np.array(_leaf_get(grads, a)))
    topt.step()

    updates, _ = opt.update(grads, opt_state, synced)
    ours = jax.tree_util.tree_map(lambda p, u: p + u, synced, updates)

    for tp, a in zip(tparams, order):
        np.testing.assert_allclose(
            np.asarray(_leaf_get(ours, a)),
            tp.detach().numpy(),
            rtol=1e-6,
            atol=1e-7,
        )


def test_opt_state_export_import_roundtrip():
    model = CDLNetVideo(K=2, M=4, P=(3, 3, 3), s=1, residual=True)
    params = model.init(jax.random.PRNGKey(1), init=False)
    opt = make_optimizer(2e-4, clip_grad=1.0)
    opt_state = opt.init(params)
    for step in range(2):
        grads = _tree_to_grads(model, params, seed=step)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)

    opt_sd = export_opt_state(model, opt_state, params)
    fresh = opt.init(params)
    back = import_opt_state(model, opt_sd, fresh, params)

    from cdlnet_tpu.compat.torch_ckpt import _find_adam

    _, _, _, a0 = _find_adam(opt_state)
    _, _, _, a1 = _find_adam(back)
    assert int(a0.count) == int(a1.count)
    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-7),
        a0.mu,
        a1.mu,
    )
    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-7),
        a0.nu,
        a1.nu,
    )
    assert get_lr(back) == pytest.approx(2e-4)


def test_sched_state_roundtrip():
    sd = export_sched_state({"step_size": 50, "gamma": 0.95}, lr=0.95**3 * 1e-3, epoch=173)
    st = import_sched_state(sd)
    assert st["step_size"] == 50 and st["gamma"] == pytest.approx(0.95)
    assert st["base_lr"] == pytest.approx(1e-3)
    assert st["last_epoch"] == 173
    assert import_sched_state(None) is None


def test_init_model_restores_opt_state(tmp_path):
    """End-to-end: a .ckpt with opt_state_dict resumes with moments + lr."""
    from cdlnet_tpu.train.fit import init_model

    model = CDLNet(K=2, M=4, P=3, s=1, adaptive=True)
    params = model.init(jax.random.PRNGKey(0), init=False)
    opt = make_optimizer(5e-4, clip_grad=1.0)
    opt_state = opt.init(params)
    for step in range(2):
        grads = _tree_to_grads(model, params, seed=step)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)

    path = str(tmp_path / "net.ckpt")
    save_torch_checkpoint(
        path, model, params, epoch=4, opt_state=opt_state,
        sched={"step_size": 50, "gamma": 0.95},
    )

    args = {
        "type": "CDLNet",
        "model": {"K": 2, "M": 4, "P": 3, "s": 1, "adaptive": True, "init": False},
        "paths": {"ckpt": path},
        "train": {"opt": {"lr": 5e-4}},
    }
    model2, params2, opt2, opt_state2, epoch0, lr = init_model(args)
    assert epoch0 == 4
    assert get_lr(opt_state2) == pytest.approx(5e-4)

    from cdlnet_tpu.compat.torch_ckpt import _find_adam

    _, _, _, a0 = _find_adam(opt_state)
    _, _, _, a1 = _find_adam(opt_state2)
    assert int(a0.count) == int(a1.count) == 2
    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=1e-6, atol=1e-8
        ),
        a0.mu,
        a1.mu,
    )
