#!/usr/bin/env python3
"""Ring-kernel VPU/issue-wall attribution (VERDICT r3 #2).

The r3 roofline closure proved the DAVIS-native ring kernel is NOT
HBM-bound (sliver views cut z traffic ~1.8x, wall unmoved) and not
MXU-bound (~42 ms of MXU in a ~236 ms clip). The named suspects are the
per-grid-step roll/mask/select chains (48 synthesis output rolls + 48
analysis stack rolls per step). This probe times STRUCTURALLY IDENTICAL
but numerically wrong variants on the real chip to attribute the wall:

  baseline   the production ring kernel
  no-roll    pltpu.roll patched to identity — all data movement, dots,
             masks, selects, stores intact; only the lane rotates gone
  no-mask    the scol/acol column masks patched to no-ops (mask loads and
             multiplies gone, rolls intact)

If no-roll recovers most of the gap, the fix is a layout that makes tap
offsets aligned slices; if it is flat, the wall is issue/copy structure
(slab builds, stores) and the kernel is at its practical floor.

Run: python tools/probe_ring_wall.py [R]
"""

from __future__ import annotations

import sys
import time


def timeit(fn, args, R=4, rounds=5):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(*a):
        def body(c, _):
            # thread the carry into the input so XLA cannot hoist the
            # loop-invariant clip evaluation out of the scan (CLAUDE.md:
            # R "iterations" otherwise time ONE evaluation)
            yp = a[0] + c * 1e-20
            out = fn(yp, *a[1:])[0]
            return c + 0 * jnp.mean(out), jnp.mean(out)

        _, outs = jax.lax.scan(body, jnp.zeros(()), None, length=R)
        return jnp.sum(outs)

    zero = jnp.zeros(())
    float(zero + 0)
    rtts = []
    for _ in range(5):
        t0 = time.time()
        float(zero + 1)
        rtts.append(time.time() - t0)
    rtt = sorted(rtts)[len(rtts) // 2]

    for _ in range(2):
        float(run(*args))
    times = []
    for _ in range(rounds):
        t0 = time.time()
        float(run(*args))
        times.append((time.time() - t0 - rtt) / R)
    return sorted(times)[len(times) // 2]


def main():
    R = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    from cdlnet_tpu.utils import setup_compilation_cache

    setup_compilation_cache()
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    import cdlnet_tpu.kernels.lista3d_ring as ring

    D, H, W = 16, 480, 854
    M, K, s, P = 169, 30, 2, (7, 7, 5)
    model_args = dict(K=K, M=M, P=P, s=s)
    key = jax.random.PRNGKey(0)
    A = 0.02 * jax.random.normal(key, (K, M, 1, *P), jnp.float32)
    B = 0.02 * jax.random.normal(jax.random.fold_in(key, 1), (K, M, 1, *P))
    t = 0.01 * jnp.abs(jax.random.normal(jax.random.fold_in(key, 2),
                                         (K, 2, M, 1, 1, 1)))
    yp = jax.random.uniform(jax.random.fold_in(key, 3), (1, 1, D, H, W))
    c = jnp.full((1,), 25.0 / 255.0)
    args = (yp, A, B, t, c)

    def run_ring(*a):
        return ring.lista3d_ring(*a, stride=s)

    base = timeit(run_ring, args, R=R)
    print(f"baseline ring: {base * 1e3:8.1f} ms/clip  "
          f"({D / base:6.1f} frames/s)")

    # --- no-roll variant: patch pltpu.roll to identity ---
    real_roll = pltpu.roll
    try:
        pltpu.roll = lambda x, shift, axis=0: x
        noroll = timeit(run_ring, args, R=R)
    finally:
        pltpu.roll = real_roll
    print(f"no-roll:       {noroll * 1e3:8.1f} ms/clip  "
          f"(rolls account for {(base - noroll) * 1e3:6.1f} ms, "
          f"{100 * (base - noroll) / base:4.1f}% of wall)")

    # --- no-ana-stack: skip the analysis tap-stack build entirely (the
    # T=48 rolled/masked/cast stores); the T*Cp-deep dot runs on whatever
    # the scratch holds. Isolates the stack build's share.
    from jax import lax

    real_ana = ring._ana_from_ring

    def _ana_nostack(rring, zring, e, A2m_ref, tau_ref, acol_ref, vm,
                     stack_ref, *, Qd, Qh, Qw, Cp, Wc, Bh, Hh, dlo, wlo,
                     hlo, lat1, lat2, Rz, Rr, Dc, first, z_dtype,
                     colmask=True):
        G = 2 * Hh
        Lb = Bh * Wc
        u = jax.lax.dot_general(
            A2m_ref[:], stack_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        if first:
            zn = -u
        else:
            zslot = lax.rem(e + (8 * Rz - lat1 - lat2), Rz)
            zc = zring[zslot][:, G * Wc : G * Wc + Lb].astype(jnp.float32)
            zn = zc - u
        tau = tau_ref[0, 0][:, None]
        return (vm * jnp.sign(zn) * jnp.maximum(jnp.abs(zn) - tau, 0.0)
                ).astype(z_dtype)

    try:
        ring._ana_from_ring = _ana_nostack
        nostack = timeit(run_ring, args, R=R)
    finally:
        ring._ana_from_ring = real_ana
    print(f"no-ana-stack:  {nostack * 1e3:8.1f} ms/clip  "
          f"(stack build accounts for {(base - nostack) * 1e3:6.1f} ms, "
          f"{100 * (base - nostack) / base:4.1f}% of wall)")

    # --- no-syn-tail: per-tap dots intact, but the 12-per-depth-tap
    # roll+mask+accumulate output chains replaced by one slice+add.
    real_syn = ring._syn_from_ring

    def _syn_notail(zring, e, B2m_ref, scol_ref, *, Qd, Qh, Qw, Cp, Wc,
                    Bh, Hh, dlo, wlo, hlo, lat1, Rz, Dc, colmask=True):
        G = 2 * Hh
        Lwr = (Bh + 2 * Hh) * Wc
        Lwz = (Bh + 2 * G) * Wc
        lo2 = Hh * Wc
        dr = e - lat1
        part = jnp.zeros((Cp, Lwr), jnp.float32)
        for j in range(Qd):
            sd = j - (Qd - 1) - dlo
            dsl = dr + sd
            slot = lax.rem(e + (8 * Rz - lat1 + sd), Rz)
            zh = zring[slot][:, :Lwz].astype(jnp.float32)
            out = jax.lax.dot_general(
                B2m_ref[j], zh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            valid = jnp.logical_and(dsl >= 0, dsl < Dc)
            part += jnp.where(valid, out[:Cp, lo2 : lo2 + Lwr], 0.0)
        return part

    try:
        ring._syn_from_ring = _syn_notail
        nosyn = timeit(run_ring, args, R=R)
    finally:
        ring._syn_from_ring = real_syn
    print(f"no-syn-tail:   {nosyn * 1e3:8.1f} ms/clip  "
          f"(syn roll/mask chains account for {(base - nosyn) * 1e3:6.1f} ms, "
          f"{100 * (base - nosyn) / base:4.1f}% of wall)")

    # --- all-chains-removed composite: rolls gone AND the analysis stack
    # build gone AND the synthesis tap tails gone, every dot and every
    # slab/ring store intact. This is a LOWER BOUND on any tap-chain
    # rewrite (sublane-major or otherwise): no layout change can do
    # better than not doing the chains at all. If this floor sits above
    # a throughput bar, that bar is unreachable by chain restructuring.
    try:
        pltpu.roll = lambda x, shift, axis=0: x
        ring._ana_from_ring = _ana_nostack
        ring._syn_from_ring = _syn_notail
        nochain = timeit(run_ring, args, R=R)
    finally:
        pltpu.roll = real_roll
        ring._ana_from_ring = real_ana
        ring._syn_from_ring = real_syn
    print(f"no-chains:     {nochain * 1e3:8.1f} ms/clip  "
          f"({D / nochain:6.1f} frames/s FLOOR for any tap-chain rewrite)")

    # --- no-dot: every dot_general replaced by a same-shape sublane
    # slice + cast of the RHS (the output still materializes; only the
    # MXU contraction is gone). Pins the MXU share of the wall. Patched
    # at the jax.lax module attribute — the ring kernels are the only
    # dot_general callsites inside the timed program.
    real_dot = jax.lax.dot_general

    def _fake_dot(lhs, rhs, dimension_numbers, precision=None,
                  preferred_element_type=None, **kw):
        a = lhs.shape[0]
        assert dimension_numbers == (((1,), (0,)), ((), ()))
        assert rhs.shape[0] >= a, (lhs.shape, rhs.shape)
        return rhs[:a].astype(preferred_element_type or jnp.float32)

    try:
        jax.lax.dot_general = _fake_dot
        nodot = timeit(run_ring, args, R=R)
    finally:
        jax.lax.dot_general = real_dot
    print(f"no-dot:        {nodot * 1e3:8.1f} ms/clip  "
          f"(MXU contractions account for {(base - nodot) * 1e3:6.1f} ms, "
          f"{100 * (base - nodot) / base:4.1f}% of wall)")


if __name__ == "__main__":
    main()
