"""LISTA unroll parity vs a torch re-implementation of the reference loop
(model/net.py:85-87 2D, :200-207 3D)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from cdlnet_tpu.ops.lista import lista_2d, lista_3d


def torch_ST(x, t):
    return x.sign() * F.relu(x.abs() - t)


def torch_lista_2d(yp, A, B, t, c, s, mask=None):
    K, M = A.shape[0], A.shape[1]
    P = A.shape[-1]
    pad = (P - 1) // 2
    conv = lambda x, w: F.conv2d(x, w, stride=s, padding=pad)
    convT = lambda z, w: F.conv_transpose2d(z, w, stride=s, padding=pad, output_padding=s - 1)
    z = torch_ST(conv(yp, A[0]), t[0, 0:1] + c * t[0, 1:2])
    for k in range(1, K):
        Bz = convT(z, B[k])
        r = (mask * Bz if mask is not None else Bz) - yp
        z = torch_ST(z - conv(r, A[k]), t[k, 0:1] + c * t[k, 1:2])
    return z


@pytest.mark.parametrize("s", [1, 2])
@pytest.mark.parametrize("use_mask", [False, True])
def test_lista_2d_parity(s, use_mask):
    rng = np.random.default_rng(42)
    K, M, C, P = 5, 8, 1, 7
    N, H, W = 2, 16, 16
    yp = rng.standard_normal((N, C, H, W)).astype(np.float32)
    A = (0.1 * rng.standard_normal((K, M, C, P, P))).astype(np.float32)
    B = (0.1 * rng.standard_normal((K, M, C, P, P))).astype(np.float32)
    t = (0.01 * np.abs(rng.standard_normal((K, 2, M, 1, 1)))).astype(np.float32)
    c = np.float32(25 / 255)
    mask = (rng.random((N, C, H, W)) > 0.5).astype(np.float32) if use_mask else None

    theirs = torch_lista_2d(
        torch.from_numpy(yp),
        torch.from_numpy(A),
        torch.from_numpy(B),
        torch.from_numpy(t),
        float(c),
        s,
        torch.from_numpy(mask) if use_mask else None,
    ).numpy()
    ours = np.asarray(
        lista_2d(
            jnp.asarray(yp),
            jnp.asarray(A),
            jnp.asarray(B),
            jnp.asarray(t),
            c,
            mask=jnp.asarray(mask) if use_mask else None,
            stride=s,
        )
    )
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_lista_2d_per_sample_sigma():
    """Per-sample c of shape (N,1,1,1) must broadcast like the reference."""
    rng = np.random.default_rng(3)
    K, M, C, P, s = 3, 4, 1, 3, 1
    yp = rng.standard_normal((2, C, 8, 8)).astype(np.float32)
    A = (0.1 * rng.standard_normal((K, M, C, P, P))).astype(np.float32)
    B = (0.1 * rng.standard_normal((K, M, C, P, P))).astype(np.float32)
    t = (0.01 * np.abs(rng.standard_normal((K, 2, M, 1, 1)))).astype(np.float32)
    c = np.array([20, 30], np.float32).reshape(2, 1, 1, 1) / 255

    # torch path: batch of 1 at a time with scalar c
    outs = []
    for i in range(2):
        outs.append(
            torch_lista_2d(
                torch.from_numpy(yp[i : i + 1]),
                torch.from_numpy(A),
                torch.from_numpy(B),
                torch.from_numpy(t),
                float(c[i, 0, 0, 0]),
                s,
            ).numpy()
        )
    theirs = np.concatenate(outs)
    ours = np.asarray(
        lista_2d(jnp.asarray(yp), jnp.asarray(A), jnp.asarray(B), jnp.asarray(t), jnp.asarray(c), stride=s)
    )
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_lista_2d_return_codes():
    rng = np.random.default_rng(5)
    K, M, C, P, s = 4, 4, 1, 3, 1
    yp = jnp.asarray(rng.standard_normal((1, C, 8, 8)).astype(np.float32))
    A = jnp.asarray((0.1 * rng.standard_normal((K, M, C, P, P))).astype(np.float32))
    B = jnp.asarray((0.1 * rng.standard_normal((K, M, C, P, P))).astype(np.float32))
    t = jnp.asarray((0.01 * np.abs(rng.standard_normal((K, 2, M, 1, 1)))).astype(np.float32))
    z, codes = lista_2d(yp, A, B, t, 0.1, stride=s, return_codes=True)
    assert codes.shape == (K, 1, M, 8, 8)
    np.testing.assert_allclose(np.asarray(codes[-1]), np.asarray(z), rtol=1e-6)


@pytest.mark.parametrize("s", [1, 2])
@pytest.mark.parametrize("residual", [False, True])
def test_lista_3d_parity(s, residual):
    rng = np.random.default_rng(11)
    K, M, C = 3, 4, 1
    P = (3, 3, 3)
    N, D, H, W = 1, 4, 8, 8
    yp = rng.standard_normal((N, C, D, H, W)).astype(np.float32)
    A = (0.1 * rng.standard_normal((K, M, C, *P))).astype(np.float32)
    B = (0.1 * rng.standard_normal((K, M, C, *P))).astype(np.float32)
    t = (0.01 * np.abs(rng.standard_normal((K, 2, M, 1, 1, 1)))).astype(np.float32)
    c = np.float32(0.1)
    pad = (P[0] // 2, P[1] // 2, P[2] // 2)

    res = None
    if residual:
        res = {
            "conv1": (0.1 * rng.standard_normal((K, M, M, 3, 3, 3))).astype(np.float32),
            "conv2": (0.1 * rng.standard_normal((K, M, M, 3, 3, 3))).astype(np.float32),
        }

    # torch reference loop
    tyu = torch.from_numpy(yp)
    tA, tB, tt = map(torch.from_numpy, (A, B, t))

    def res_block(z, k):
        w1 = torch.from_numpy(res["conv1"][k])
        w2 = torch.from_numpy(res["conv2"][k])
        out = F.relu(F.conv3d(z, w1, padding=1))
        out = F.conv3d(out, w2, padding=1)
        return F.relu(out + z)

    z = torch_ST(F.conv3d(tyu, tA[0], stride=s, padding=pad), tt[0, 0:1] + c * tt[0, 1:2])
    if residual:
        z = res_block(z, 0)
    for k in range(1, K):
        Bz = F.conv_transpose3d(z, tB[k], stride=s, padding=pad, output_padding=s - 1)
        z = torch_ST(
            z - F.conv3d(Bz - tyu, tA[k], stride=s, padding=pad), tt[k, 0:1] + c * tt[k, 1:2]
        )
        if residual:
            z = res_block(z, k)
    theirs = z.numpy()

    ours = np.asarray(
        lista_3d(
            jnp.asarray(yp),
            jnp.asarray(A),
            jnp.asarray(B),
            jnp.asarray(t),
            c,
            stride=s,
            residual={k: jnp.asarray(v) for k, v in res.items()} if residual else None,
        )
    )
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)
