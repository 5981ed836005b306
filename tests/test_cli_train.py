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
        make_loaders(args)  # dirs don't exist, but dispatch chose the 2D loader
    # PDFS key routes to fastMRI
    args = {"type": "CDLNetVideo", "train": {"loaders": {
        "trn_path_list": ["x"], "val_path_list": ["x"], "tst_path_list": ["x"],
        "PDFS": False}}}
    with pytest.raises(FileNotFoundError):
        make_loaders(args)


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
