"""Checkpoint export round-trip: params -> torch-format .ckpt -> params."""

import numpy as np
import jax
import jax.numpy as jnp

from cdlnet_tpu.models import CDLNet, CDLNetVideo, GDLNet
from cdlnet_tpu.compat import (
    export_net_state,
    import_net_state,
    save_torch_checkpoint,
    load_torch_checkpoint,
)


def assert_trees_equal(a, b):
    ka, kb = sorted(a), sorted(b)
    assert ka == kb
    for k in ka:
        if isinstance(a[k], dict):
            assert_trees_equal(a[k], b[k])
        else:
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))


def test_cdlnet_roundtrip(tmp_path):
    model = CDLNet(K=3, M=4, P=5, s=2, adaptive=True)
    params = model.init(jax.random.PRNGKey(0), init=False)
    path = str(tmp_path / "net.ckpt")
    save_torch_checkpoint(path, model, params, epoch=7)
    ckpt = load_torch_checkpoint(path)
    assert ckpt["epoch"] == 7
    back = import_net_state(model, ckpt["net_state_dict"])
    assert_trees_equal(params, back)


def test_video_roundtrip(tmp_path):
    model = CDLNetVideo(K=2, M=4, P=(3, 3, 3), s=1, residual=True)
    params = model.init(jax.random.PRNGKey(1), init=False)
    path = str(tmp_path / "net.ckpt")
    save_torch_checkpoint(path, model, params, epoch=1)
    back = import_net_state(model, load_torch_checkpoint(path)["net_state_dict"])
    assert_trees_equal(params, back)


def test_gdlnet_shared_roundtrip(tmp_path):
    model = GDLNet(K=3, M=4, P=5, order=2, shared="alpha_a_w0_psi")
    params = model.init(jax.random.PRNGKey(2), init=False)
    path = str(tmp_path / "net.ckpt")
    save_torch_checkpoint(path, model, params)
    back = import_net_state(model, load_torch_checkpoint(path)["net_state_dict"])
    assert_trees_equal(params, back)
