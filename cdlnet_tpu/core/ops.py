"""Elementwise proximal operators and constraint projections.

Reference semantics: model/net.py:11-14 (ST), :229-262 (prox_CSR/_f2),
model/solvers.py:24-28 (uball_project). All functions here are pure,
jittable, and fuse into surrounding convolutions under XLA.
"""

from __future__ import annotations

import jax.numpy as jnp


def ST(x: jnp.ndarray, t) -> jnp.ndarray:
    """Soft (shrinkage) thresholding: sign(x) * relu(|x| - t).

    The prox of the l1 norm. Threshold t broadcasts against x.
    """
    return jnp.sign(x) * jnp.maximum(jnp.abs(x) - t, 0.0)


def prox_csr(u, z_prev, lambd, gamma):
    """Proximal operator of the one-sided CSR temporal-consistency penalty.

    Nested soft-thresholds pulling the code u toward the previous frame's
    code z_prev (reference model/net.py:229-242).
    """
    shift = z_prev + lambd * jnp.sign(z_prev)
    return ST(ST(u - shift, lambd * gamma) + shift, lambd)


def prox_csr_f2(u, z_prev, z_after, lambd, gamma1, gamma2):
    """Two-sided CSR prox using previous and following frames' codes.

    Reference model/net.py:244-262.
    """
    Ca = z_prev + lambd * jnp.sign(z_prev) + lambd * gamma2 * jnp.sign(z_prev - z_after)
    Cb = z_after + lambd * jnp.sign(z_after) + lambd * gamma1 * jnp.sign(z_after - z_prev)
    inner = ST(u - Ca, gamma1 * lambd)
    corr = lambd * gamma1 * jnp.sign(u - Ca)
    midder = ST(inner - Cb + corr, gamma2 * lambd)
    return ST(midder + Cb - corr, lambd)


def uball_project(W: jnp.ndarray, axes=(2, 3)) -> jnp.ndarray:
    """Project each filter of W onto the l2 unit ball over the given axes.

    W * min(1, 1/||W||) per filter (reference model/solvers.py:24-28).
    """
    normW = jnp.sqrt(jnp.sum(W * W, axis=axes, keepdims=True))
    return W * jnp.minimum(1.0 / jnp.maximum(normW, 1e-30), 1.0)
