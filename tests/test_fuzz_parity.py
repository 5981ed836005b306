"""Config-space fuzz: kernel-vs-XLA parity at geometry corners the
curated parametrizations don't cover (s=3, P=9, tall P=(9,9,5),
color+P9+mask). The kernels' tap machinery is generic over (P, s) by
construction (ops/polyphase tap ranges); these tests keep that true.

All interpret-mode (CPU); forward parity to fp32 reassociation tolerance
and reverse-kernel gradients vs XLA autodiff in fp32-history mode."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cdlnet_tpu.ops.conv import conv_transpose2d, conv_transpose3d
from cdlnet_tpu.ops.lista import lista_2d, lista_3d


def _mk2d(seed, s, P, C, M, K, H, W, N=2):
    key = jax.random.PRNGKey(seed)
    yp = jax.random.uniform(key, (N, C, H, W), jnp.float32)
    A = 0.1 * jax.random.normal(jax.random.fold_in(key, 1), (K, M, C, P, P))
    B = 0.1 * jax.random.normal(jax.random.fold_in(key, 2), (K, M, C, P, P))
    t = 0.01 * jnp.abs(
        jax.random.normal(jax.random.fold_in(key, 3), (K, 2, M, 1, 1))
    )
    return yp, A, B, t


CORNERS_2D = [
    # (s, P, C, M, K, H, W, use_mask)
    (3, 7, 1, 8, 3, 18, 24, False),   # stride 3
    (3, 9, 1, 6, 2, 27, 27, False),   # stride 3, P 9, square-divisible
    (1, 9, 1, 8, 3, 16, 16, False),   # unstrided, big filter
    (2, 9, 3, 6, 2, 16, 20, True),    # color + P9 + Bayer-style mask
]


@pytest.mark.parametrize("s,P,C,M,K,H,W,use_mask", CORNERS_2D)
def test_fuzz_fused2d_forward(s, P, C, M, K, H, W, use_mask):
    from cdlnet_tpu.kernels.lista2d import lista2d_fused, lista2d_fused_supported

    yp, A, B, t = _mk2d(0, s, P, C, M, K, H, W)
    c = jnp.asarray([0.1, 0.2]).reshape(2, 1, 1, 1)
    mask = (
        (jax.random.uniform(jax.random.PRNGKey(9), yp.shape) > 0.5).astype(
            jnp.float32
        )
        if use_mask
        else None
    )
    assert lista2d_fused_supported(M, C, P, s, K, H, W), "corner must stay in-gate"
    z = lista_2d(yp, A, B, t, c, mask=mask, stride=s)
    x_ref = conv_transpose2d(
        z, B[0], stride=s, padding=(P - 1) // 2, output_padding=s - 1
    )
    x, _ = lista2d_fused(
        yp, A, B, t, c, stride=s, mask=mask, return_z=False, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(x), np.asarray(x_ref), rtol=0, atol=2e-5
    )


@pytest.mark.parametrize(
    "s,P,C,M,K,H,W",
    [(3, 7, 1, 8, 3, 18, 24), (2, 9, 3, 6, 2, 16, 20), (1, 9, 1, 6, 2, 16, 16)],
)
def test_fuzz_fused2d_grads(s, P, C, M, K, H, W, monkeypatch):
    monkeypatch.setenv("CDLNET_HIST_DTYPE", "f32")
    from cdlnet_tpu.kernels.autodiff import _xla_forward_2d, lista2d_fused_diff
    from cdlnet_tpu.kernels.lista2d import lista2d_bwd_supported

    yp, A, B, t = _mk2d(0, s, P, C, M, K, H, W)
    c = jnp.asarray([0.1, 0.2])
    assert lista2d_bwd_supported(M, C, P, s, K, H, W)
    tgt = jax.random.uniform(jax.random.PRNGKey(4), yp.shape)

    def loss_k(A, B, t):
        out = lista2d_fused_diff(yp, A, B, t, c, stride=s, interpret=True)
        return jnp.mean((out - tgt) ** 2)

    def loss_x(A, B, t):
        out = _xla_forward_2d(yp, A, B, t, c.reshape(2, 1, 1, 1), None, s)
        return jnp.mean((out - tgt) ** 2)

    gk = jax.grad(loss_k, (0, 1, 2))(A, B, t)
    gx = jax.grad(loss_x, (0, 1, 2))(A, B, t)
    for a, b in zip(gk, gx):
        ref = float(jnp.max(jnp.abs(b))) + 1e-12
        assert float(jnp.max(jnp.abs(a - b))) / ref < 1e-5


@pytest.mark.parametrize(
    "s,P,M,K,D,H,W",
    [(2, (9, 9, 5), 6, 2, 8, 16, 16),   # MRI-geometry tall filters
     (1, (5, 5, 3), 6, 2, 6, 12, 12),   # unstrided 3D
     (3, (7, 7, 3), 4, 2, 9, 18, 18)],  # stride 3 in 3D
)
def test_fuzz_fused3d_forward(s, P, M, K, D, H, W):
    from cdlnet_tpu.kernels.lista3d import lista3d_fused, lista3d_fused_supported

    key = jax.random.PRNGKey(0)
    C = 1
    yp = jax.random.uniform(key, (1, C, D, H, W), jnp.float32)
    A = 0.1 * jax.random.normal(jax.random.fold_in(key, 1), (K, M, C) + tuple(P))
    B = 0.1 * jax.random.normal(jax.random.fold_in(key, 2), (K, M, C) + tuple(P))
    t = 0.01 * jnp.abs(
        jax.random.normal(jax.random.fold_in(key, 3), (K, 2, M, 1, 1, 1))
    )
    c = 0.1
    assert lista3d_fused_supported(M, C, P, s, K, D, H, W)
    pads = tuple(p // 2 for p in P)
    z = lista_3d(yp, A, B, t, c, stride=s)
    x_ref = conv_transpose3d(
        z, B[0], stride=s, padding=pads, output_padding=s - 1
    )
    x, _ = lista3d_fused(yp, A, B, t, c, stride=s, return_z=False, interpret=True)
    np.testing.assert_allclose(
        np.asarray(x), np.asarray(x_ref), rtol=0, atol=2e-5
    )
