"""Data-parallel training: batch-dim sharding over a named mesh axis.

Params are replicated, batches sharded along axis 0; jit + NamedSharding
makes XLA insert the gradient all-reduce over ICI. This is the primary
scale-out axis for training throughput (SURVEY.md §2.5 DP row).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard dim 0 (batch) across the given mesh axis, replicate the rest."""
    return NamedSharding(mesh, P(axis))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def subband_shardings(params: dict, mesh: Mesh, axis: str = "model") -> dict:
    """Tensor parallelism over the M (subband) dimension: each device holds
    a slice of every filter bank and threshold bank. SURVEY.md §2.5 marks
    this optional at M<=169; it becomes useful for wider dictionaries.

    The per-iteration math is TP-clean: the analysis conv's OUTPUT channels
    are M (sharded, no comm), ST/thresholds are per-subband (no comm), and
    the synthesis conv contracts over M — GSPMD inserts the one psum per
    iteration there. Returns a NamedSharding pytree matching `params`:
    banks stacked (K, M, ...) shard dim 1; threshold banks (K, 2, M, ...)
    shard dim 2.
    """
    out = {}
    for k, v in params.items():
        if isinstance(v, dict):  # residual blocks: convs (K, M, M, 3, 3, 3)
            out[k] = {
                kk: NamedSharding(mesh, P(None, axis)) for kk in v
            }
            continue
        if v is None or not hasattr(v, "ndim"):
            out[k] = v
            continue
        if k in ("A", "B", "A2", "B2"):
            spec = P(None, axis)
        elif k in ("t", "t2", "g", "g1", "g2"):
            spec = P(None, None, axis)
        else:
            spec = P()
        out[k] = NamedSharding(mesh, spec)
    return out


def shard_map_forward(mesh: Mesh, fn, axis: str = "data", sigma_spec=None):
    """Wrap a forward `fn(params, y, sigma, mask) -> xhat` in shard_map over
    the batch dim — REQUIRED for backend="pallas" models under a mesh.

    GSPMD cannot partition Mosaic kernels: compiling any pallas_call inside
    a multi-device jit raises NotImplementedError("Mosaic kernels cannot be
    automatically partitioned. Please wrap the call in a shard_map.")
    (jax/_src/tpu_custom_call.py — both the ShardingContext num_devices!=1
    and the partial-manual SPMDAxisContext branches). It does not silently
    replicate; it refuses to compile. So under a mesh the fused-kernel
    forward runs inside jax.shard_map: the batch splits over `axis`, params
    replicate, and each device runs the unmodified single-device kernel on
    its local shard — per-shard numerics are bit-identical to the unsharded
    call, and autodiff through shard_map psums the replicated-param
    cotangents (the DP grad all-reduce) automatically.

    Mosaic additionally requires manual_axes == ALL mesh axes, which
    shard_map satisfies (every axis is manual; non-batch axes see replicated
    inputs/outputs). Consequence: tensor-parallel subband sharding CANNOT
    compose with the fused kernels — the kernels contract over the full M
    internally. TP runs on backend="xla" (docs/parallelism.md).

    sigma handling: None is dropped; scalars replicate; per-sample arrays
    shard with the batch but must be UNAMBIGUOUSLY per-sample — shaped
    (N, 1, ...) broadcastable against y (the models' convention, see
    data/noise.awgn) or exactly y-shaped. A bare (N,)-shaped array is
    rejected: its leading dim coinciding with the batch size cannot be told
    apart from a broadcast-intended vector, and silently sharding it would
    hand each device a wrong sigma slice. Pass sigma_spec (a PartitionSpec)
    to override the inference outright. mask (when given) is batch-shaped
    and shards with y. Callers guarantee y.shape[0] % mesh.shape[axis] == 0
    (fit enforces it for train batches; ragged eval/serve batches fall back
    to an XLA-backend forward).
    """
    from jax import shard_map

    def _infer_sigma_spec(sig, y):
        if sigma_spec is not None:
            return sigma_spec
        if sig.ndim == 0:
            return P()
        per_sample = (
            sig.ndim == y.ndim
            and sig.shape[0] == y.shape[0]
            and all(d == 1 or d == yd for d, yd in zip(sig.shape[1:], y.shape[1:]))
        )
        if per_sample:
            return P(axis)
        if sig.shape[0] == y.shape[0]:
            raise ValueError(
                f"ambiguous sigma shape {sig.shape} for batch {y.shape}: "
                "reshape per-sample sigmas to (N, 1, ...) matching y's rank, "
                "or pass an explicit sigma_spec"
            )
        return P()

    def forward(params, y, sigma=None, mask=None):
        args = [params, y]
        specs = [jax.tree_util.tree_map(lambda _: P(), params), P(axis)]
        has_sig = sigma is not None
        if has_sig:
            sig = jnp.asarray(sigma)
            args.append(sig)
            specs.append(_infer_sigma_spec(sig, y))
        has_mask = mask is not None
        if has_mask:
            args.append(mask)
            specs.append(P(axis))

        def body(p, yl, *rest):
            sl = rest[0] if has_sig else None
            ml = rest[-1] if has_mask else None
            return fn(p, yl, sl, ml)

        return shard_map(
            body, mesh=mesh, in_specs=tuple(specs), out_specs=P(axis),
            check_vma=False,
        )(*args)

    return forward


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
