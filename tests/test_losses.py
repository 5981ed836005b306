"""SSIM correctness (train/losses.py).

Regression for the TPU default-precision blowup: the window convs in ssim()
must not compute E[x^2] - mu^2 in bf16 — on smooth, near-flat images the
cancellation error flips the cs denominator negative and the SSIM "mean"
leaves [-1, 1] (observed: 6.7 at sigma=35 on synthetic MRI volumes).
"""

import numpy as np
import jax.numpy as jnp


def _ssim_ref(x, y, data_range=1.0, win_size=11, win_sigma=1.5):
    """float64 numpy reference of the same gaussian-window SSIM."""
    from scipy.signal import convolve2d

    ax = np.arange(win_size) - (win_size - 1) / 2.0
    g = np.exp(-(ax**2) / (2 * win_sigma**2))
    g /= g.sum()
    w = np.outer(g, g)

    def filt(v):
        return convolve2d(v.astype(np.float64), w, mode="valid")

    C1, C2 = (0.01 * data_range) ** 2, (0.03 * data_range) ** 2
    vals = []
    for n in range(x.shape[0]):
        for c in range(x.shape[1]):
            xb, yb = x[n, c], y[n, c]
            mu_x, mu_y = filt(xb), filt(yb)
            sig_x = filt(xb * xb) - mu_x**2
            sig_y = filt(yb * yb) - mu_y**2
            sig_xy = filt(xb * yb) - mu_x * mu_y
            cs = (2 * sig_xy + C2) / (sig_x + sig_y + C2)
            vals.append(((2 * mu_x * mu_y + C1) / (mu_x**2 + mu_y**2 + C1)) * cs)
    return float(np.mean(vals))


def _smooth_pair(noise=0.1):
    """Smooth sinusoidal field + noisy copy — the blowup's trigger shape."""
    from cdlnet_tpu.data.synthetic import random_field_video

    x = random_field_video(np.random.default_rng(0), depth=4, size=64)
    rng = np.random.default_rng(1)
    y = np.clip(x + noise * rng.standard_normal(x.shape, np.float32), -0.2, 1.2)
    return x[:, None].astype(np.float32), y[:, None].astype(np.float32)


def test_ssim_identity_is_one():
    from cdlnet_tpu.train.losses import ssim

    x, _ = _smooth_pair()
    assert float(ssim(jnp.asarray(x), jnp.asarray(x))) == __import__("pytest").approx(1.0, abs=1e-5)


def test_ssim_bounded_and_matches_f64_reference_on_smooth_fields():
    from cdlnet_tpu.train.losses import ssim

    x, y = _smooth_pair(noise=0.15)
    v = float(ssim(jnp.asarray(y), jnp.asarray(x)))
    assert -1.0 <= v <= 1.0
    ref = _ssim_ref(y, x)
    assert abs(v - ref) < 2e-3


def test_ssim_decreases_with_noise():
    from cdlnet_tpu.train.losses import ssim

    x, y1 = _smooth_pair(noise=0.05)
    _, y2 = _smooth_pair(noise=0.3)
    s1 = float(ssim(jnp.asarray(y1), jnp.asarray(x)))
    s2 = float(ssim(jnp.asarray(y2), jnp.asarray(x)))
    assert s1 > s2
