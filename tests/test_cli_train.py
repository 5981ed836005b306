"""Train CLI end-to-end smoke: loader dispatch per model type, reference
args.json schema acceptance, artifacts on disk. Tiny configs, CPU."""

import json
import os

import numpy as np
import pytest

from cdlnet_tpu.cli.train import main as train_main, make_loaders
from cdlnet_tpu.data.synthetic import gen_synthetic_image_dirs, gen_synthetic_video_dirs


def _base_args(tmp_path, mtype, model, loaders, fit=None):
    return {
        "type": mtype,
        "model": model,
        "paths": {"save": str(tmp_path / "save"), "ckpt": None},
        "train": {
            "loaders": loaders,
            "opt": {"lr": 1e-3},
            "sched": {"step_size": 1, "gamma": 0.95},
            "fit": {"epochs": 2, "noise_std": 25, "val_freq": 2, "save_freq": 1,
                    **(fit or {})},
        },
    }


def test_train_cli_2d(tmp_path):
    root = gen_synthetic_image_dirs(str(tmp_path / "imgs"), n_images=4, size=96)
    args = _base_args(
        tmp_path, "CDLNet",
        {"K": 2, "M": 6, "P": 5, "s": 2, "C": 1, "adaptive": True},
        {"trn_path_list": [root + "/train"], "val_path_list": [root + "/val"],
         "tst_path_list": [root + "/test"], "crop_size": 64, "batch_size": [2, 1, 1]},
    )
    params, opt_state, history = train_main(json.loads(json.dumps(args)))
    save = args["paths"]["save"]
    assert os.path.exists(os.path.join(save, "train.txt"))
    assert os.path.exists(os.path.join(save, "net.ckpt.npz"))
    assert os.path.exists(os.path.join(save, "args.json"))
    # saved args round-trip with the ckpt path patched in (train.py:249-258)
    saved = json.load(open(os.path.join(save, "args.json")))
    assert saved["paths"]["ckpt"].endswith("net.ckpt.npz")


def test_train_cli_video(tmp_path):
    root = gen_synthetic_video_dirs(str(tmp_path / "vids"), n_videos=2, depth=8, size=48)
    args = _base_args(
        tmp_path, "CDLNetVideo",
        {"K": 2, "M": 4, "P": (3, 3, 3), "s": 2, "C": 1, "adaptive": True,
         "depth": 8, "init": False},
        {"trn_path_list": [root + "/train"], "val_path_list": [root + "/val"],
         "tst_path_list": [root + "/test"], "crop_size": 32, "depth": 8,
         "batch_size": [2, 1, 1]},
    )
    train_main(json.loads(json.dumps(args)))
    assert os.path.exists(os.path.join(args["paths"]["save"], "train.txt"))


def test_loader_dispatch():
    # 2D model types strip video/mri-only loader kwargs
    args = {"type": "DnCNN", "train": {"loaders": {
        "trn_path_list": ["x"], "val_path_list": ["x"], "tst_path_list": ["x"],
        "depth": 16, "PDFS": False}}}
    with pytest.raises(FileNotFoundError):
        # dirs don't exist, but dispatch resolved: PDFS (fastMRI schema) + 2D
        # type routes to the volume-to-batch fastMRI loaders (traincsr.py:163-165)
        make_loaders(args)
    # PDFS key routes to fastMRI
    args = {"type": "CDLNetVideo", "train": {"loaders": {
        "trn_path_list": ["x"], "val_path_list": ["x"], "tst_path_list": ["x"],
        "PDFS": False}}}
    with pytest.raises(FileNotFoundError):
        make_loaders(args)


def test_train_cli_dncnn_updates_bn_stats(tmp_path):
    """DnCNN trains end-to-end through the CLI (reference train.py:187-196 +
    model/net.py:689-713): BN running stats move away from their init values,
    and the (params, state) bundle round-trips through the checkpoint."""
    import numpy as np

    root = gen_synthetic_image_dirs(str(tmp_path / "imgs"), n_images=4, size=96)
    args = _base_args(
        tmp_path, "DnCNN",
        {"Ci": 1, "Co": 1, "K": 4, "M": 8, "P": 3},
        {"trn_path_list": [root + "/train"], "val_path_list": [root + "/val"],
         "tst_path_list": [root + "/test"], "crop_size": 32, "batch_size": [2, 1, 1]},
    )
    bundle, opt_state, history = train_main(json.loads(json.dumps(args)))
    params, state = bundle
    assert float(np.abs(np.asarray(state["bn_mean"])).max()) > 0  # init was zeros
    assert not np.allclose(np.asarray(state["bn_var"]), 1.0)  # init was ones

    # checkpoint restores both params and BN state exactly
    from cdlnet_tpu.train.checkpoint import load_ckpt
    from cdlnet_tpu.models import build_model
    import jax

    model = build_model("DnCNN", args["model"])
    p0, s0 = model.init(jax.random.PRNGKey(0))
    (p1, s1), _, epoch, _ = load_ckpt(
        str(tmp_path / "save" / "net.ckpt.npz"), (p0, s0)
    )
    assert epoch == 2
    np.testing.assert_array_equal(np.asarray(s1["bn_mean"]), np.asarray(state["bn_mean"]))
    np.testing.assert_array_equal(np.asarray(p1["w_in"]), np.asarray(params["w_in"]))

    # resume through init_model picks the bundle back up
    args2 = json.loads(json.dumps(args))
    args2["paths"]["ckpt"] = str(tmp_path / "save" / "net.ckpt.npz")
    from cdlnet_tpu.train.fit import init_model

    model2, bundle2, *_rest = init_model(args2)
    p2, s2 = bundle2
    np.testing.assert_array_equal(np.asarray(s2["bn_mean"]), np.asarray(state["bn_mean"]))


def test_train_cli_ffdnet(tmp_path):
    """FFDNet trains end-to-end (reference model/net.py:715-730)."""
    root = gen_synthetic_image_dirs(str(tmp_path / "imgs"), n_images=4, size=96)
    args = _base_args(
        tmp_path, "FFDNet",
        {"C": 1, "K": 4, "M": 8, "P": 3},
        {"trn_path_list": [root + "/train"], "val_path_list": [root + "/val"],
         "tst_path_list": [root + "/test"], "crop_size": 32, "batch_size": [2, 1, 1]},
        fit={"epochs": 1, "val_freq": 1},
    )
    train_main(json.loads(json.dumps(args)))
    assert os.path.exists(os.path.join(args["paths"]["save"], "train.txt"))


def test_train_cli_2d_on_fastmri_volumes(tmp_path):
    """A plain 2D CDLNet trains on fastMRI slice volumes — traincsr.py:163-165
    path: volumes (B,C,D,H,W) feed the 2D net as (B*D,C,H,W) batches."""
    from cdlnet_tpu.data.synthetic import gen_synthetic_mri_dirs

    root = gen_synthetic_mri_dirs(str(tmp_path / "mri"), n_volumes=2, slices=6, size=48)
    args = _base_args(
        tmp_path, "CDLNet",
        {"K": 2, "M": 6, "P": 5, "s": 2, "C": 1, "adaptive": True, "init": False},
        {"trn_path_list": [root + "/train"], "val_path_list": [root + "/val"],
         "tst_path_list": [root + "/test"], "crop_size": 32, "depth": 4,
         "batch_size": [1, 1, 1], "PDFS": False},
        fit={"epochs": 1, "val_freq": 1},
    )
    params, opt_state, history = train_main(json.loads(json.dumps(args)))
    assert os.path.exists(os.path.join(args["paths"]["save"], "train.txt"))
    # history carries finite PSNRs (the volume->batch path actually stepped)
    assert history and all(np.isfinite(h[2]) for h in history)


def test_loader_workers_match_sequential_shapes(tmp_path):
    """num_workers>0 yields the same number/shape of batches as sequential,
    with thread-safe per-item augmentation RNG."""
    from cdlnet_tpu.data.images import get_data_loader
    from cdlnet_tpu.data.synthetic import gen_synthetic_image_dirs

    root = gen_synthetic_image_dirs(str(tmp_path / "imgs"), n_images=9, size=64,
                                    splits=("train",))
    l0 = get_data_loader([root + "/train"], batch_size=2, crop_size=32,
                         test=False, seed=0)
    l4 = get_data_loader([root + "/train"], batch_size=2, crop_size=32,
                         test=False, seed=0, num_workers=4)
    b0 = list(l0)
    b4 = list(l4)
    assert len(b0) == len(b4) == 4  # drop_last on 9 items / bs 2
    for a, b in zip(b0, b4):
        assert a.shape == b.shape == (2, 1, 32, 32)
        assert np.isfinite(b).all()
    # early-stop consumer doesn't deadlock or leak
    it = iter(get_data_loader([root + "/train"], batch_size=2, crop_size=32,
                              test=False, seed=0, num_workers=2))
    next(it)
    del it
