"""Polyphase rewrite (ops/polyphase.py): exactness vs the direct strided
conv/conv-transpose path, 2D and 3D, gradients included."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cdlnet_tpu.ops import polyphase as pp
from cdlnet_tpu.ops.conv import (
    conv2d,
    conv3d,
    conv_transpose2d,
    conv_transpose3d,
    _use_polyphase,
)


def _direct(fn, *args, **kw):
    os.environ["CDLNET_NO_POLYPHASE"] = "1"
    try:
        return fn(*args, **kw)
    finally:
        del os.environ["CDLNET_NO_POLYPHASE"]


def test_s2d_d2s_roundtrip():
    x = jnp.arange(2 * 3 * 8 * 8, dtype=jnp.float32).reshape(2, 3, 8, 8)
    x2 = pp.space_to_depth(x, 2, 2)
    assert x2.shape == (2, 12, 4, 4)
    np.testing.assert_array_equal(np.asarray(pp.depth_to_space(x2, 2, 2, 3)), np.asarray(x))
    # phase layout: (c, a, b) with a the H-phase
    np.testing.assert_array_equal(np.asarray(x2[:, 0]), np.asarray(x[:, 0, 0::2, 0::2]))
    np.testing.assert_array_equal(np.asarray(x2[:, 1]), np.asarray(x[:, 0, 0::2, 1::2]))
    np.testing.assert_array_equal(np.asarray(x2[:, 2]), np.asarray(x[:, 0, 1::2, 0::2]))
    np.testing.assert_array_equal(np.asarray(x2[:, 7]), np.asarray(x[:, 1, 1::2, 1::2]))


@pytest.mark.parametrize("P,C,M", [(7, 1, 13), (7, 3, 8), (5, 1, 6), (3, 2, 4)])
def test_conv2d_polyphase_matches_direct(P, C, M):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, C, 16, 16), jnp.float32)
    w = jax.random.normal(jax.random.fold_in(key, 1), (M, C, P, P), jnp.float32)
    pad = (P - 1) // 2
    assert _use_polyphase(x, w, (2, 2), (pad, pad), 2)
    got = conv2d(x, w, stride=2, padding=pad)
    ref = _direct(conv2d, x, w, stride=2, padding=pad)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-5)


@pytest.mark.parametrize("P,C,M", [(7, 1, 13), (5, 2, 6)])
def test_conv_transpose2d_polyphase_matches_direct(P, C, M):
    key = jax.random.PRNGKey(2)
    z = jax.random.normal(key, (2, M, 8, 8), jnp.float32)
    w = jax.random.normal(jax.random.fold_in(key, 1), (M, C, P, P), jnp.float32)
    pad = (P - 1) // 2
    got = conv_transpose2d(z, w, stride=2, padding=pad, output_padding=1)
    ref = _direct(conv_transpose2d, z, w, stride=2, padding=pad, output_padding=1)
    assert got.shape == ref.shape == (2, C, 16, 16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-5)


def test_conv3d_polyphase_matches_direct():
    key = jax.random.PRNGKey(3)
    P = (7, 7, 5)
    pad = (3, 3, 2)
    x = jax.random.normal(key, (1, 1, 8, 16, 16), jnp.float32)
    w = jax.random.normal(jax.random.fold_in(key, 1), (9, 1, *P), jnp.float32)
    got = conv3d(x, w, stride=2, padding=pad)
    ref = _direct(conv3d, x, w, stride=2, padding=pad)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-5)

    z = jax.random.normal(jax.random.fold_in(key, 2), (1, 9, 4, 8, 8), jnp.float32)
    gotT = conv_transpose3d(z, w, stride=2, padding=pad, output_padding=1)
    refT = _direct(conv_transpose3d, z, w, stride=2, padding=pad, output_padding=1)
    assert gotT.shape == refT.shape == (1, 1, 8, 16, 16)
    np.testing.assert_allclose(np.asarray(gotT), np.asarray(refT), atol=1e-4, rtol=1e-5)


def test_polyphase_skipped_when_not_applicable():
    x = jnp.ones((1, 1, 15, 15))  # odd size: not divisible by s
    w = jnp.ones((4, 1, 7, 7))
    assert not _use_polyphase(x, w, (2, 2), (3, 3), 2)
    assert not _use_polyphase(x, w, (1, 1), (3, 3), 2)  # s=1
    out = conv2d(x, w, stride=2, padding=3)  # falls back, still correct shape
    assert out.shape == (1, 4, 8, 8)


def test_polyphase_gradients_match_direct():
    key = jax.random.PRNGKey(4)
    x = jax.random.normal(key, (1, 1, 16, 16), jnp.float32)
    w = jax.random.normal(jax.random.fold_in(key, 1), (5, 1, 7, 7), jnp.float32)

    def loss(fn_direct):
        def f(w):
            if fn_direct:
                y = _direct(conv2d, x, w, stride=2, padding=3)
            else:
                y = conv2d(x, w, stride=2, padding=3)
            return jnp.sum(y**2)

        return jax.grad(f)(w)

    np.testing.assert_allclose(
        np.asarray(loss(False)), np.asarray(loss(True)), atol=1e-4, rtol=1e-4
    )
