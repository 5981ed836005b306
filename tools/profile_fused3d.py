#!/usr/bin/env python3
"""Find the fused 3D kernel's wall (VERDICT r1 next-round #6).

Times, all amortized inside one jitted lax.scan with a single readback
(the tunnel protocol makes per-call timing meaningless, CLAUDE.md):

  pair        full iteration-pair path (bench.py configuration)
  syn-only    K synthesis halves alone (scan over B2m)
  ana-only    K analysis halves alone (scan over A2m)
  K=15        half-depth pair path -> per-iteration slope vs fixed cost
  N=2         batch-2 pair path -> does batching amortize bubbles?
  resident    whole-K VMEM-resident kernel (no per-iteration HBM z traffic)

Roofline accounting printed per row: achieved TFLOP/s on the MXU-issued
contraction FLOPs, and the implied HBM bytes of the pair path's z/r
streaming. Usage: python tools/profile_fused3d.py [R]
"""

from __future__ import annotations

import os
import sys
import time

from cdlnet_tpu.utils import setup_compilation_cache


def main():
    setup_compilation_cache()
    import jax
    import jax.numpy as jnp
    from jax import lax

    import cdlnet_tpu.kernels.lista3d as k3d
    from cdlnet_tpu.kernels.lista3d import (
        _geom,
        lista3d_fused,
        prep_A2m_3d,
        prep_B2m_3d,
    )

    R = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    K, M, C, P, s = 30, 169, 1, (7, 7, 5), 2
    N, D, H, W = 1, 16, 128, 128
    pads = tuple(p // 2 for p in P)
    Dc, Hc, Wc = D // s, H // s, W // s
    Lhw = Hc * Wc
    Cp = C * s**3
    (dlo, dhi), (hlo, hhi), (wlo, whi) = _geom(P, pads, s)
    Qd, Qh, Qw = dhi - dlo + 1, hhi - hlo + 1, whi - wlo + 1
    T = Qd * Qh * Qw
    Mp = -(-M // 8) * 8

    key = jax.random.PRNGKey(0)
    y = jax.random.uniform(key, (N, C, D, H, W), jnp.float32)
    A = 0.02 * jax.random.normal(jax.random.fold_in(key, 1), (K, M, C, *P))
    B = 0.02 * jax.random.normal(jax.random.fold_in(key, 2), (K, M, C, *P))
    t = 0.01 * jnp.abs(jax.random.normal(jax.random.fold_in(key, 3), (K, 2, M, 1, 1, 1)))

    # MXU-issued FLOPs per clip (padded Mp rows included — that's what the
    # hardware actually multiplies)
    syn_flops = 2 * (Qh * Qw * Cp) * Mp * Lhw * Dc * Qd      # per iteration
    ana_flops = 2 * Mp * (T * Cp) * Lhw * Dc                 # per iteration
    pair_flops = K * (syn_flops + ana_flops)                 # ~K pairs (k=0 has no syn)

    # one readback per timed run costs a full tunnel RTT (~32 ms) —
    # measure it and subtract, or a R-rep run overstates by RTT/R
    zero = jnp.zeros(())
    float(zero + 0)
    rtts = []
    for _ in range(5):
        t0 = time.time()
        float(zero + 1)
        rtts.append(time.time() - t0)
    rtt = sorted(rtts)[len(rtts) // 2]
    print(f"tunnel RTT: {rtt*1e3:.1f} ms (subtracted per run)")

    def timed(label, build_fn, flops, reps=R):
        fn = build_fn()
        jfn = jax.jit(fn)
        out = jfn()            # compile + warm
        _ = float(jnp.sum(out))
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            out = jfn()
            _ = float(jnp.sum(out))
            best = min(best, (time.time() - t0 - rtt) / reps)
        dt = best
        tf = flops / dt / 1e12
        print(f"{label:28s} {dt*1e3:8.3f} ms/clip   {tf:6.1f} TFLOP/s "
              f"({16/dt:.0f} frames/s)")
        return dt

    def pair_path(n=1, k=K):
        yk = jnp.broadcast_to(y, (n, C, D, H, W))
        Ak, Bk, tk = A[:k], B[:k], t[:k]

        def body():
            def step(acc, _):
                x, _z = lista3d_fused(yk, Ak, Bk, tk, 25.0 / 255.0, stride=s,
                                      return_z=False)
                return acc + jnp.mean(x), None

            return lambda: lax.scan(step, 0.0, None, length=R)[0]

        return body()

    # halves: scan over the per-iteration weights, reusing the module's own
    # pallas_call builders through lista3d_fused's internals is private —
    # rebuild minimal closures here via the public entry with K=1 repeated
    def half(kind):
        A2m = prep_A2m_3d(A, s, pads).astype(jnp.bfloat16)
        B2m = prep_B2m_3d(B, s, pads).reshape(K, Qd, Qh * Qw, Cp, Mp)
        import cdlnet_tpu.ops.polyphase as pp

        y5 = pp.space_to_depth(y, s, 3)
        y2 = y5.transpose(0, 2, 1, 3, 4).reshape(N, Dc, Cp, Lhw)
        z = jnp.zeros((N, Dc, Mp, Lhw), jnp.bfloat16)
        tau = jnp.zeros((N, K, Mp), jnp.float32) + 0.001

        # reuse the real builders by monkey-calling lista3d_fused pieces is
        # messy; instead time via the module-level helpers
        from cdlnet_tpu.kernels.lista3d import _axis_masks  # noqa: F401

        # build once through the real path at K iterations but skipping the
        # other half by zero-weighting is wrong; instead time syn/ana kernels
        # directly with the same specs the pair path uses:
        import functools

        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        acol = jnp.asarray(k3d._axis_masks([wlo + ri for ri in range(Qw)], Hc, Wc, 1))
        arow = jnp.asarray(k3d._axis_masks([hlo + qi for qi in range(Qh)], Hc, Wc, 0))
        scol = jnp.asarray(k3d._axis_masks(
            [ri - (Qw - 1) - wlo for ri in range(Qw)], Hc, Wc, 1))
        srow = jnp.asarray(k3d._axis_masks(
            [qi - (Qh - 1) - hlo for qi in range(Qh)], Hc, Wc, 0))
        sm = (srow[:, None, :] * scol[None, :, :]).reshape(Qh * Qw, Lhw)
        geom = dict(Qd=Qd, Qh=Qh, Qw=Qw, Cp=Cp, Wc=Wc, dlo=dlo, hlo=hlo, wlo=wlo)
        m2 = jnp.zeros((N, 1, 1, 1), jnp.float32)
        full = pl.BlockSpec(memory_space=pltpu.VMEM)
        bs3 = lambda ch: pl.BlockSpec((1, 1, ch, Lhw), lambda n, d, j: (n, d, 0, 0),
                                      memory_space=pltpu.VMEM)
        bspec = lambda ch: pl.BlockSpec((1, 1, ch, Lhw), lambda n, d: (n, d, 0, 0),
                                        memory_space=pltpu.VMEM)

        def synthesize(zz, B2m_k):
            kern = functools.partial(k3d._kernel_syn, **geom, use_mask=False, sub_y=True)
            zview = pl.BlockSpec(
                (1, 1, Mp, Lhw),
                lambda n, d, j: (n, jnp.clip(d + j - (Qd - 1) - dlo, 0, Dc - 1), 0, 0),
                memory_space=pltpu.VMEM)
            return pl.pallas_call(
                kern, grid=(N, Dc, Qd),
                in_specs=[zview, bs3(Cp),
                          pl.BlockSpec((1, 1, 1, 1), lambda n, d, j: (0, 0, 0, 0),
                                       memory_space=pltpu.VMEM),
                          pl.BlockSpec((1, Qh * Qw * Cp, Mp), lambda n, d, j: (j, 0, 0),
                                       memory_space=pltpu.VMEM),
                          full],
                out_specs=bs3(Cp),
                out_shape=jax.ShapeDtypeStruct((N, Dc, Cp, Lhw), jnp.float32),
            )(zz, y2, m2, B2m_k.reshape(Qd, Qh * Qw * Cp, Mp), sm)

        def analyze(r, zz, A2m_k, tau_k):
            kern = functools.partial(k3d._kernel_ana, **geom)
            return pl.pallas_call(
                kern, grid=(N, Dc),
                in_specs=[*k3d._depth_view_specs(Qd, [dlo + j for j in range(Qd)],
                                                 (Cp, Lhw), Dc, pltpu),
                          bspec(Mp), full,
                          pl.BlockSpec((1, 1, Mp), lambda n, d: (n, 0, 0),
                                       memory_space=pltpu.VMEM),
                          full, full],
                out_specs=bspec(Mp),
                out_shape=jax.ShapeDtypeStruct((N, Dc, Mp, Lhw), jnp.bfloat16),
                scratch_shapes=[pltpu.VMEM((T * Cp, Lhw), jnp.bfloat16)],
            )(*([r] * Qd), zz, A2m_k, tau_k.reshape(-1, 1, Mp), acol, arow)

        r0 = jnp.zeros((N, Dc, Cp, Lhw), jnp.float32)

        if kind == "syn":
            def step(acc, B2m_k):
                r = synthesize(z + acc.astype(jnp.bfloat16) * 0, B2m_k)
                return acc + jnp.mean(r), None

            def run():
                def rep(a, _):
                    a2, _ = lax.scan(step, a, B2m)
                    return a2, None
                return lax.scan(rep, 0.0, None, length=R)[0]
            return run
        else:
            def step(acc, xs):
                A2m_k, tau_k = xs
                zz = analyze(r0 + acc * 0, z, A2m_k, tau_k)
                return acc + jnp.mean(zz.astype(jnp.float32)), None

            def run():
                def rep(a, _):
                    a2, _ = lax.scan(step, a, (A2m, tau.transpose(1, 0, 2)))
                    return a2, None
                return lax.scan(rep, 0.0, None, length=R)[0]
            return run

    print(f"geometry: Qd,Qh,Qw=({Qd},{Qh},{Qw}) T={T} Cp={Cp} Mp={Mp} Lhw={Lhw}")
    print(f"MXU-issued: syn {syn_flops/1e9:.2f} + ana {ana_flops/1e9:.2f} "
          f"GFLOP/iter -> {pair_flops/1e9:.0f} GFLOP/clip")
    # pair-path z HBM traffic estimate (bf16): syn reads Qd*Dc z blocks +
    # ana reads Dc + writes Dc, per iteration
    zb = Mp * Lhw * 2
    hbm = K * ((Qd + 2) * Dc * zb + 2 * Dc * Cp * Lhw * 4)
    print(f"pair-path z/r HBM estimate: {hbm/2**20:.0f} MB/clip")
    print()

    dt_pair = timed("pair (bench config)", lambda: pair_path(), pair_flops)
    timed("syn-only xK", lambda: half("syn"), K * syn_flops)
    timed("ana-only xK", lambda: half("ana"), K * ana_flops)
    dt15 = timed("pair K=15", lambda: pair_path(k=15), pair_flops / 2)
    print(f"  -> per-iteration slope {1e3*(dt_pair-dt15)/15:.3f} ms, "
          f"fixed {1e3*(2*dt15-dt_pair):.2f} ms")
    dt2 = timed("pair N=2", lambda: pair_path(n=2), 2 * pair_flops)
    print(f"  -> batch-2 per-clip {dt2/2*1e3:.3f} ms")
    os.environ["CDLNET_LISTA3D_RESIDENT"] = "1"
    timed("resident (fp32, K-resident)", lambda: pair_path(), pair_flops)
    del os.environ["CDLNET_LISTA3D_RESIDENT"]


if __name__ == "__main__":
    main()
