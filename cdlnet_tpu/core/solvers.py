"""Power method for estimating the largest eigenvalue of a linear operator.

Used only at model init for spectral normalization of the initial dictionary
(reference model/solvers.py:3-22, called from model/net.py:43-57). Runs as a
lax.while_loop so it can execute on device; tolerance semantics match the
reference (stop when |e_new - e_old| < tol or num_iter reached).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def power_method(A, b: jnp.ndarray, num_iter: int = 1000, tol: float = 1e-6):
    """Estimate the max eigenvalue of linear operator A from initial vector b.

    A: callable array -> array (same shape).
    Returns (eig_max, b_final, tol_reached).
    """

    def norm(v):
        return jnp.sqrt(jnp.sum(v * v))

    def cond(state):
        it, _, eig, eig_old = state
        return jnp.logical_and(it < num_iter, jnp.abs(eig - eig_old) >= tol)

    def body(state):
        it, b, eig, _ = state
        b_new = A(b)
        b_new = b_new / norm(b_new)
        eig_new = jnp.sum(b_new * A(b_new))
        return it + 1, b_new, eig_new, eig

    # Seed eig with +inf delta so the loop runs at least once.
    init = (jnp.array(0), b, jnp.array(jnp.inf, b.dtype), jnp.array(0.0, b.dtype))
    it, b, eig, eig_old = jax.lax.while_loop(cond, body, init)
    return eig, b, jnp.abs(eig - eig_old) < tol
