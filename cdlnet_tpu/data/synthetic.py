"""Synthetic video fixtures: random 3D scalar fields from mixed sin/cos terms
on a (-pi, pi)^3 grid, emitted as PNG frame directories.

Mirrors syn_data/gen.py:12-31 in spirit (fixture factory so the video
pipeline runs without DAVIS/fastMRI downloads); fully seeded for test
determinism.
"""

from __future__ import annotations

import os

import numpy as np


def random_field_video(rng, depth=16, size=128, n_terms=6) -> np.ndarray:
    """Returns (depth, size, size) float32 in [0, 1]."""
    t = np.linspace(-np.pi, np.pi, depth, dtype=np.float32)
    y = np.linspace(-np.pi, np.pi, size, dtype=np.float32)
    x = np.linspace(-np.pi, np.pi, size, dtype=np.float32)
    T, Y, X = np.meshgrid(t, y, x, indexing="ij")
    field = np.zeros_like(T)
    for _ in range(n_terms):
        a, b, c = rng.uniform(0.5, 3.0, 3)
        ph = rng.uniform(0, 2 * np.pi, 3)
        amp = rng.uniform(0.3, 1.0)
        fn1 = np.sin if rng.random() < 0.5 else np.cos
        fn2 = np.sin if rng.random() < 0.5 else np.cos
        field += amp * fn1(a * X + ph[0]) * fn2(b * Y + ph[1]) * np.cos(c * T + ph[2])
    lo, hi = field.min(), field.max()
    return ((field - lo) / max(hi - lo, 1e-8)).astype(np.float32)


def gen_synthetic_video_dirs(
    out_dir: str, n_videos=4, depth=16, size=128, seed=0, splits=("train", "val", "test")
):
    """Write PNG frame dirs: out_dir/{split}/video{i:03d}/frame{j:03d}.png."""
    from PIL import Image

    rng = np.random.default_rng(seed)
    for split in splits:
        for i in range(n_videos):
            vdir = os.path.join(out_dir, split, f"video{i:03d}")
            os.makedirs(vdir, exist_ok=True)
            vid = random_field_video(rng, depth=depth, size=size)
            for j in range(depth):
                frame = (vid[j] * 255).astype(np.uint8)
                Image.fromarray(frame, mode="L").save(
                    os.path.join(vdir, f"frame{j:03d}.png")
                )
    return out_dir


def gen_synthetic_mri_dirs(
    out_dir: str, n_volumes=2, slices=16, size=128, seed=0, splits=("train", "val", "test")
):
    """Write fastMRI-style .h5 k-space volume dirs: out_dir/{split}/vol{i}.h5.

    Each volume is a random_field_video slice stack pushed through the
    centered orthonormal forward FFT, so data/fastmri.py's ifft2c recovers it
    exactly. Volumes carry acquisition='CORPD_FBK' so they survive the
    PDFS=False filter (datafastmri.py:34-46 semantics).
    """
    import h5py

    rng = np.random.default_rng(seed)
    for split in splits:
        sdir = os.path.join(out_dir, split)
        os.makedirs(sdir, exist_ok=True)
        for i in range(n_volumes):
            vol = random_field_video(rng, depth=slices, size=size)
            k = np.fft.fftshift(
                np.fft.fft2(
                    np.fft.ifftshift(vol, axes=(-2, -1)), axes=(-2, -1), norm="ortho"
                ),
                axes=(-2, -1),
            )
            with h5py.File(os.path.join(sdir, f"vol{i:03d}.h5"), "w") as hf:
                hf.create_dataset("kspace", data=k.astype(np.complex64))
                hf.attrs["acquisition"] = "CORPD_FBK"
    return out_dir


def gen_synthetic_image_dirs(out_dir: str, n_images=8, size=180, seed=0, splits=("train", "val", "test")):
    """Write PNG image dirs for the 2D pipeline: out_dir/{split}/img{i}.png."""
    from PIL import Image

    rng = np.random.default_rng(seed)
    for split in splits:
        sdir = os.path.join(out_dir, split)
        os.makedirs(sdir, exist_ok=True)
        for i in range(n_images):
            img = random_field_video(rng, depth=1, size=size)[0]
            Image.fromarray((img * 255).astype(np.uint8), mode="L").save(
                os.path.join(sdir, f"img{i:03d}.png")
            )
    return out_dir
