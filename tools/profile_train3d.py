#!/usr/bin/env python3
"""Decompose the fused 3D TRAINING step (flagship video config; 12.4 ms
as of the resident-hist forward + staging ring + backward preroll):
history-forward alone, full gradient, optimizer overhead — all timed with
the two-length scan-difference protocol (RTT cancels exactly, CLAUDE.md).

NB the "hist fwd" probe uses f32 histories (the exactness mode); the
default bf16 training path writes half that volume.

Usage: python tools/profile_train3d.py
"""

from __future__ import annotations

import time

from cdlnet_tpu.utils import setup_compilation_cache


def _scan_time(fn, carry0, r_lo=10, r_hi=50):
    """Wall/iter via two scan lengths differenced (tunnel RTT cancels)."""
    import jax
    import jax.numpy as jnp

    def run(R):
        @jax.jit
        def prog(c):
            def body(c, _):
                return fn(c), None
            c, _ = jax.lax.scan(body, c, None, length=R)
            return jax.tree_util.tree_reduce(
                lambda a, x: a + jnp.sum(jnp.abs(x).astype(jnp.float32)),
                c, 0.0)
        float(prog(carry0))  # compile+warm
        t0 = time.perf_counter()
        float(prog(carry0))
        return time.perf_counter() - t0

    w_lo, w_hi = run(r_lo), run(r_hi)
    return (w_hi - w_lo) / (r_hi - r_lo)


def main():
    setup_compilation_cache()
    import jax
    import jax.numpy as jnp

    from cdlnet_tpu.kernels.autodiff import lista3d_fused_diff
    from cdlnet_tpu.kernels.lista3d import lista3d_fused
    from cdlnet_tpu.models import build_model
    from cdlnet_tpu.train.fit import make_train_step
    from cdlnet_tpu.train.optim import make_optimizer

    N, C, D, H, W = 2, 1, 16, 128, 128
    K, M, s = 30, 169, 2
    model = build_model("CDLNetVideo", dict(
        K=K, M=M, P=(7, 7, 5), s=s, C=1, adaptive=True, depth=D,
        backend="pallas"))
    params = model.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    y = jax.random.uniform(key, (N, C, D, H, W), jnp.float32)
    yp = y  # already stride-divisible; skip pre_process for the raw calls
    A, B, t = params["A"], params["B"], params["t"]

    # 1. inference pair path fp32 (no hist)
    def f_pair(c):
        x, _ = lista3d_fused(c, A, B, t, 0.1, stride=s, return_z=False,
                             z_dtype=jnp.float32)
        return x.reshape(c.shape)

    # 2. history forward (what the vjp fwd runs)
    def f_hist(c):
        x, _, (zh, rh) = lista3d_fused(
            c, A, B, t, 0.1, stride=s, return_z=False,
            z_dtype=jnp.float32, return_hists=True)
        return x.reshape(c.shape)

    # 3. full gradient (fwd + reverse scan), params carried
    def f_grad(carry):
        p, = carry

        def loss(p):
            x = lista3d_fused_diff(yp, p["A"], p["B"], p["t"], 0.1, stride=s)
            return jnp.mean(x * x)

        g = jax.grad(loss)(p)
        return (jax.tree_util.tree_map(
            lambda a, b: a + 1e-12 * b, p,
            {k: g[k] for k in ("A", "B", "t")} | {
                k: jnp.zeros_like(v) for k, v in p.items()
                if k not in ("A", "B", "t")}),)

    # 4. full train step (noise, loss, adam, clip, project)
    opt = make_optimizer(1e-3, clip_grad=0.1)
    opt_state = opt.init(params)
    step, _ = make_train_step(model, opt, workload="3d")
    key0 = jax.random.PRNGKey(2)

    def f_step(carry):
        p, o, k = carry
        k, ks = jax.random.split(k)
        p, o, loss = step(p, o, y, ks)
        return (p, o, k)

    t_pair = _scan_time(f_pair, yp)
    t_hist = _scan_time(f_hist, yp)
    t_grad = _scan_time(f_grad, (params,), r_lo=5, r_hi=25)
    t_step = _scan_time(f_step, (params, opt_state, key0), r_lo=5, r_hi=25)

    # FLOP accounting: forward contraction FLOPs per batch
    # (from bench.py: 1.66e11 FLOP per 16x128x128 clip at flagship config)
    fwd_flop = 1.66e11 * N
    print(f"pair fwd (no hist)   : {t_pair*1e3:8.2f} ms  "
          f"{fwd_flop/t_pair/1e12:6.1f} TFLOP/s")
    print(f"hist fwd (vjp primal): {t_hist*1e3:8.2f} ms  "
          f"{fwd_flop/t_hist/1e12:6.1f} TFLOP/s")
    print(f"grad (fwd+bwd)       : {t_grad*1e3:8.2f} ms  "
          f"{3*fwd_flop/t_grad/1e12:6.1f} TFLOP/s (3x fwd FLOPs)")
    print(f"full train step      : {t_step*1e3:8.2f} ms")
    print(f"  -> reverse scan alone ~ {(t_grad-t_hist)*1e3:.2f} ms "
          f"({2*fwd_flop/max(t_grad-t_hist,1e-9)/1e12:.1f} TFLOP/s on 2x fwd FLOPs)")
    print(f"  -> optimizer+loss glue ~ {(t_step-t_grad)*1e3:.2f} ms")


if __name__ == "__main__":
    main()
