#!/usr/bin/env python3
"""End-to-end fit-loop throughput (VERDICT r3 #3).

The benched flagship 2D train step is ~4.4 ms (scanned dispatch,
tools/bench_train_step.py) but the real fit loop measured ~35 ms/step —
per-step dispatch over the tunnel + host-side batch assembly. This tool
measures fit() itself, wall-clock per epoch, with the device_scan epoch
runner ON vs OFF, on a synthetic CBSD432-shaped corpus (432 grayscale
481x321/321x481 images, the reference training corpus geometry,
trained_nets/CDLNet-s2030/args.json).

Run: python tools/bench_fit_loop.py [epochs]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def make_corpus(n=432, seed=0):
    """Synthetic natural-ish images in the two BSD orientations."""
    rng = np.random.default_rng(seed)
    xs, ys = np.meshgrid(np.linspace(0, 8, 481), np.linspace(0, 8, 321))
    images = []
    for i in range(n):
        a, b, c, d = rng.uniform(0.5, 3.0, 4)
        img = 0.5 + 0.25 * np.sin(a * xs + b) * np.cos(c * ys + d)
        img += 0.05 * rng.standard_normal(img.shape)
        img = np.clip(img, 0, 1).astype(np.float32)[None]
        if i % 2:
            img = img.transpose(0, 2, 1)
        images.append(np.ascontiguousarray(img))
    return images


def make_loaders(images, batch=10, crop=128):
    from cdlnet_tpu.data.images import ImageDataset
    from cdlnet_tpu.data.loader import DataLoader

    ds = ImageDataset.__new__(ImageDataset)
    ds.image_paths = [f"synthetic_{i}" for i in range(len(images))]
    ds.images = images
    ds.root_dirs = []
    ds.crop_size = crop
    ds.augment = True
    from cdlnet_tpu.data.loader import ThreadSafeRng

    ds.rng = ThreadSafeRng(0)
    train = DataLoader(ds, batch_size=batch, shuffle=True, drop_last=True)
    # tiny val set (full images would retrace per size; keep one crop size)
    val_ds = ImageDataset.__new__(ImageDataset)
    val_ds.image_paths = ds.image_paths[:2]
    val_ds.images = [im[:, :320, :320] for im in images[:2]]
    val_ds.root_dirs = []
    val_ds.crop_size = None
    val_ds.augment = False
    val_ds.rng = ThreadSafeRng(1)
    val = DataLoader(val_ds, batch_size=1)
    return {"train": train, "val": val, "test": val}


def run(device_scan, epochs, images):
    import jax

    from cdlnet_tpu.models import build_model
    from cdlnet_tpu.train.fit import fit
    from cdlnet_tpu.train.optim import make_optimizer

    import tempfile

    model = build_model(
        "CDLNet",
        {"K": 30, "M": 169, "P": 7, "s": 2, "adaptive": True,
         "backend": "pallas"},
    )
    params = model.init(jax.random.PRNGKey(0), init=True)
    opt = make_optimizer(1e-3, clip_grad=1.0)
    opt_state = opt.init(params)
    loaders = make_loaders(images)
    steps = len(loaders["train"])

    with tempfile.TemporaryDirectory() as td:
        # two-length difference: each fit() call pays one retrace +
        # compilation-cache load; (wall(1+N) - wall(1)) / N cancels it and
        # yields the steady-state epoch cost
        def one(n):
            nonlocal params, opt_state
            t0 = time.time()
            params, opt_state, _ = fit(
                model, params, opt, opt_state, loaders, save_dir=td,
                epochs=n, noise_std=(20, 30), val_freq=10**9,
                backtrack_thresh=None, verbose=False,
                device_scan=device_scan, save_freq=10**9,
            )
            return time.time() - t0

        warm = one(1)  # compile (cold or persistent-cache load)
        w_short = one(1)
        w_long = one(1 + epochs)
    per_epoch = (w_long - w_short) / epochs
    return warm, per_epoch, per_epoch / steps * 1e3, steps


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from cdlnet_tpu.utils import setup_compilation_cache

    setup_compilation_cache()
    images = make_corpus()
    import os

    for label, ds in (("host-loop", False), ("device_scan", "auto")):
        if ds is False:
            os.environ["CDLNET_DEVICE_SCAN"] = "0"
        else:
            os.environ.pop("CDLNET_DEVICE_SCAN", None)
        warm, per_epoch, ms_step, steps = run(ds, epochs, images)
        print(
            f"{label:12s}: warm-up {warm:6.1f}s; {per_epoch:6.2f} s/epoch "
            f"({steps} steps) = {ms_step:6.2f} ms/step"
        )


if __name__ == "__main__":
    main()
