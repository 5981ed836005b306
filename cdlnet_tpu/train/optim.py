"""Optimizer assembly: Adam + gradient clipping + StepLR-equivalent schedule
with host-mutable learning rate (needed for the backtracking policy's lr *=
0.8, reference train.py:136-140).

The learning rate lives in opt_state.hyperparams (optax.inject_hyperparams),
mirroring the reference's torch param_group mutation (train.py:171-178).
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def make_optimizer(lr: float, clip_grad=None, betas=(0.9, 0.999), eps=1e-8):
    """Adam preceded by global-norm clipping (train.py:99-101, 200)."""
    parts = []
    if clip_grad is not None:
        parts.append(optax.clip_by_global_norm(clip_grad))
    parts.append(optax.inject_hyperparams(optax.adam)(learning_rate=lr, b1=betas[0], b2=betas[1], eps=eps))
    return optax.chain(*parts)


def _adam_state(opt_state):
    """Locate the injected-hyperparams Adam state within the chain."""
    for s in opt_state:
        if hasattr(s, "hyperparams"):
            return s
    raise ValueError("no inject_hyperparams state found")


def get_lr(opt_state) -> float:
    return float(_adam_state(opt_state).hyperparams["learning_rate"])


def set_lr(opt_state, lr: float):
    """Returns a new opt_state with the learning rate replaced."""
    adam = _adam_state(opt_state)
    adam.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state


def steplr_value(base_lr: float, epoch: int, step_size: int, gamma: float) -> float:
    """torch StepLR: lr = base * gamma^(epoch // step_size)."""
    return base_lr * (gamma ** (epoch // step_size))
