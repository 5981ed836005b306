"""Data-parallel training: batch-dim sharding over a named mesh axis.

Params are replicated, batches sharded along axis 0; jit + NamedSharding
makes XLA insert the gradient all-reduce over ICI. This is the primary
scale-out axis for training throughput (SURVEY.md §2.5 DP row).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard dim 0 (batch) across the given mesh axis, replicate the rest."""
    return NamedSharding(mesh, P(axis))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def make_dp_train_step(model, opt, loss_fn, mesh: Mesh, axis: str = "data"):
    """Build a jitted data-parallel train step.

    loss_fn(params, batch, key) -> scalar. Returns step(params, opt_state,
    batch, key) with batch sharded over `axis`, params/opt_state replicated.
    XLA inserts the psum for gradients automatically from the shardings.
    """
    repl = replicate_sharding(mesh)
    bsh = batch_sharding(mesh, axis)

    @jax.jit
    def step(params, opt_state, batch, key):
        batch = jax.lax.with_sharding_constraint(batch, bsh)
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, key)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        params = model.project(params)
        return params, opt_state, loss

    def prepare(params, opt_state, batch):
        """Place inputs: replicate params/opt_state, shard the batch."""
        params = jax.device_put(params, repl)
        opt_state = jax.device_put(opt_state, repl)
        batch = jax.device_put(batch, bsh)
        return params, opt_state, batch

    return step, prepare
