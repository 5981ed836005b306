"""Shared DMA + interpret-mode scaffolding for the resident reverse
kernels (kernels/lista2d_tiled_bwd, kernels/lista3d_bwd_resident).

The resident kernels stream histories and weight banks from HBM with
manual async copies whose descriptors are RECONSTRUCTED at wait time
(descriptors are cheap to rebuild; a wait only needs the same semaphore —
statically unrolling K=30 loops to keep descriptors live measured a
~17 min remote Mosaic compile). In interpret mode DMA engines do not
exist and `fori_loop` + ANY-space ref access trips a jax
interpret-lowering KeyError, so copies become synchronous assignments and
loops statically unroll. Both emulations lived copy-pasted in each kernel
file; this module is the single home."""

from __future__ import annotations

import jax


class _InterpCopy:
    """Synchronous emulation of an async copy (no DMA engines on CPU)."""

    def __init__(self, src, dst):
        self.src, self.dst = src, dst

    def run(self):
        self.dst[...] = self.src[...]


def make_dma_helpers(interp: bool):
    """Build (copy, start, wait, floop, rem2) for one kernel body.

    copy(src_ref, dst_ref, sem) -> descriptor (pltpu.make_async_copy, or a
    synchronous shim in interpret mode). start()/wait() hide the mode:
    start runs the shim copy eagerly under interp; wait is a no-op there.
    floop(n, body, init) is lax.fori_loop, statically unrolled under
    interp; rem2 is a 2-slot ring index that stays Python-int for static
    trip counts."""
    from jax.experimental.pallas import tpu as pltpu

    if interp:
        def copy(src, dst, sem=None):
            return _InterpCopy(src, dst)

        def start(d):
            d.run()

        def wait(d):
            pass

        def floop(nn, body, init=0):
            c = init
            for x in range(nn):
                c = body(x, c)
            return c
    else:
        def copy(src, dst, sem):
            return pltpu.make_async_copy(src, dst, sem)

        def start(d):
            d.start()

        def wait(d):
            d.wait()

        def floop(nn, body, init=0):
            return jax.lax.fori_loop(0, nn, body, init)

    def rem2(x):
        return x % 2 if isinstance(x, int) else jax.lax.rem(x, 2)

    return copy, start, wait, floop, rem2
