"""Conv / conv-transpose parity vs torch functional ops — the make-or-break
layer for checkpoint bit-compatibility (SURVEY.md 'hard parts': torch
output_padding=s-1 + padding=(P-1)//2 must reproduce exactly)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from cdlnet_tpu.ops.conv import conv2d, conv3d, conv_transpose2d, conv_transpose3d


@pytest.mark.parametrize("s", [1, 2, 3])
@pytest.mark.parametrize("P", [3, 7])
@pytest.mark.parametrize("C,M", [(1, 8), (3, 5)])
def test_conv2d_parity(s, P, C, M):
    rng = np.random.default_rng(s * 100 + P)
    x = rng.standard_normal((2, C, 16, 20)).astype(np.float32)
    w = rng.standard_normal((M, C, P, P)).astype(np.float32)
    pad = (P - 1) // 2
    theirs = F.conv2d(torch.from_numpy(x), torch.from_numpy(w), stride=s, padding=pad).numpy()
    ours = np.asarray(conv2d(jnp.asarray(x), jnp.asarray(w), stride=s, padding=pad))
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("s", [1, 2, 3])
@pytest.mark.parametrize("P", [3, 7])
@pytest.mark.parametrize("C,M", [(1, 8), (3, 5)])
def test_conv_transpose2d_parity(s, P, C, M):
    rng = np.random.default_rng(s * 10 + P)
    x = rng.standard_normal((2, M, 8, 10)).astype(np.float32)
    w = rng.standard_normal((M, C, P, P)).astype(np.float32)
    pad = (P - 1) // 2
    theirs = F.conv_transpose2d(
        torch.from_numpy(x), torch.from_numpy(w), stride=s, padding=pad, output_padding=s - 1
    ).numpy()
    ours = np.asarray(
        conv_transpose2d(jnp.asarray(x), jnp.asarray(w), stride=s, padding=pad, output_padding=s - 1)
    )
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("s", [1, 2])
@pytest.mark.parametrize("P", [(3, 3, 3), (7, 7, 5), (9, 9, 5)])
def test_conv3d_parity(s, P):
    rng = np.random.default_rng(7)
    C, M = 1, 6
    x = rng.standard_normal((1, C, 8, 12, 12)).astype(np.float32)
    w = rng.standard_normal((M, C, *P)).astype(np.float32)
    pad = (P[0] // 2, P[1] // 2, P[2] // 2)
    theirs = F.conv3d(torch.from_numpy(x), torch.from_numpy(w), stride=s, padding=pad).numpy()
    ours = np.asarray(conv3d(jnp.asarray(x), jnp.asarray(w), stride=s, padding=pad))
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("s", [1, 2])
@pytest.mark.parametrize("P", [(3, 3, 3), (7, 7, 5), (9, 9, 5)])
def test_conv_transpose3d_parity(s, P):
    rng = np.random.default_rng(8)
    C, M = 1, 6
    x = rng.standard_normal((1, M, 4, 6, 6)).astype(np.float32)
    w = rng.standard_normal((M, C, *P)).astype(np.float32)
    pad = (P[0] // 2, P[1] // 2, P[2] // 2)
    theirs = F.conv_transpose3d(
        torch.from_numpy(x), torch.from_numpy(w), stride=s, padding=pad, output_padding=s - 1
    ).numpy()
    ours = np.asarray(
        conv_transpose3d(jnp.asarray(x), jnp.asarray(w), stride=s, padding=pad, output_padding=s - 1)
    )
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_conv_transpose_is_adjoint_of_conv():
    """<A x, z> == <x, A^T z> with A = conv(stride s), A^T = conv_transpose."""
    rng = np.random.default_rng(9)
    C, M, P, s = 1, 8, 7, 2
    pad = (P - 1) // 2
    x = jnp.asarray(rng.standard_normal((1, C, 16, 16)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((M, C, P, P)).astype(np.float32))
    z = jnp.asarray(rng.standard_normal((1, M, 8, 8)).astype(np.float32))
    Ax = conv2d(x, w, stride=s, padding=pad)
    Atz = conv_transpose2d(z, w, stride=s, padding=pad, output_padding=s - 1)
    lhs = float(jnp.sum(Ax * z))
    rhs = float(jnp.sum(x * Atz))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-4)
