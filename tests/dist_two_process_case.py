"""Shared scenario for the two-process distributed test: the worker
processes and the in-test single-process reference must run the exact
same model/data/loss so their parameter checksums are comparable."""

import jax.numpy as jnp

CASE = dict(
    mtype="CDLNet",
    model={"K": 2, "M": 4, "P": 3, "s": 1, "adaptive": True},
    batch=(4, 1, 16, 16),
    steps=3,
)


def loss_for(model):
    def loss_fn(p, b, key):
        yb, xb = b
        out, _ = model.apply(p, yb, 25.0, return_z=False)
        return jnp.mean((out - xb) ** 2)

    return loss_fn
