"""MAD (median absolute deviation) blind noise-level estimator.

sigma_hat = median(|HH y|) / 0.6745 per image, where HH is the bior4.4
highest-frequency 2D subband filter applied with stride 2.
Reference: model/nle.py:17-27. Fully jittable (jnp.median sorts on device).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from cdlnet_tpu.core.wavelet import filter_bank_2d


def nle_mad(y: jnp.ndarray) -> jnp.ndarray:
    """y: (N, C, H, W) in [0,1]. Returns sigma_hat (N, 1, 1, 1) on [0,1] scale."""
    Wa, _ = filter_bank_2d("bior4.4")
    hh = Wa[3:4].astype(y.dtype)  # (1, 1, 10, 10)
    C = y.shape[1]
    # grouped conv: apply HH to each channel independently (nle.py:24-25)
    hh = jnp.concatenate([hh] * C, axis=0)  # (C, 1, 10, 10)
    HHy = lax.conv_general_dilated(
        y,
        hh,
        window_strides=(2, 2),
        padding=[(0, 0), (0, 0)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=C,
    )
    sigma = jnp.median(jnp.abs(HHy).reshape(y.shape[0], -1), axis=1) / 0.6745
    return sigma.reshape(-1, 1, 1, 1)
