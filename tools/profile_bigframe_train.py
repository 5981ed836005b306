#!/usr/bin/env python3
"""Decompose the banded big-frame 3D TRAINING step (VERDICT r3 #4).

half-native 16x480x432 trains at ~338 ms/step (banded fused fwd+reverse);
native eval on the ring runs the same frames in ~100 ms. This attributes
the step: history-collecting forward alone, full value_and_grad, optimizer
tail — via the two-length scan-difference protocol (RTT cancels).

Usage: python tools/profile_bigframe_train.py [D H W]
"""

from __future__ import annotations

import sys
import time


def _scan_time(fn, carry0, r_lo=3, r_hi=9):
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

        float(prog(carry0))
        t0 = time.perf_counter()
        float(prog(carry0))
        return time.perf_counter() - t0

    w_lo, w_hi = run(r_lo), run(r_hi)
    return (w_hi - w_lo) / (r_hi - r_lo)


def main():
    from cdlnet_tpu.utils import setup_compilation_cache

    setup_compilation_cache()
    import jax
    import jax.numpy as jnp

    from cdlnet_tpu.kernels.lista3d_tiled import lista3d_tiled
    from cdlnet_tpu.kernels.autodiff import lista3d_tiled_diff
    from cdlnet_tpu.models import build_model
    from cdlnet_tpu.train.fit import make_train_step
    from cdlnet_tpu.train.optim import make_optimizer

    D, H, W = (int(a) for a in sys.argv[1:4]) if len(sys.argv) > 3 else (16, 480, 432)
    model = build_model(
        "CDLNetVideo",
        {"K": 30, "M": 169, "P": (7, 7, 5), "s": 2, "adaptive": True,
         "depth": D, "backend": "pallas"},
    )
    params = model.init(jax.random.PRNGKey(0), init=False)
    params["A"] = params["A"] * 0.02
    params["B"] = params["B"] * 0.02
    params["t"] = jnp.abs(params["t"]) * 0.02 + 1e-3
    y = jax.random.uniform(jax.random.PRNGKey(1), (1, 1, D, H, W))
    x = jax.random.uniform(jax.random.PRNGKey(2), (1, 1, D, H, W))
    c = jnp.full((1,), 25.0 / 255.0)

    # 1. inference forward (banded, no hists)
    def fwd_only(y_):
        out, _ = lista3d_tiled(y_, params["A"], params["B"], params["t"],
                               c, stride=2)
        return y_ + 1e-20 * out

    t1 = _scan_time(fwd_only, y)
    print(f"banded forward (no hists):   {t1 * 1e3:8.1f} ms")

    # 2. history-collecting forward
    def fwd_hist(y_):
        out, _, (zh, rh) = lista3d_tiled(
            y_, params["A"], params["B"], params["t"], c, stride=2,
            return_hists=True)
        return y_ + 1e-20 * (out + jnp.sum(rh[-1][:1, :1, :1, :1, :1])
                             + zh[-1][:1, :1, :1, :1, :1].astype(out.dtype).sum())

    t2 = _scan_time(fwd_hist, y)
    print(f"history-collecting forward:  {t2 * 1e3:8.1f} ms")

    # 3. full gradient through the banded custom VJP
    def grad_step(p):
        def loss(p):
            xh = lista3d_tiled_diff(y, p["A"], p["B"], p["t"], c, stride=2)
            return jnp.mean((xh - x) ** 2)

        g = jax.grad(loss)(p)
        return jax.tree_util.tree_map(lambda a, b: a + 1e-20 * b, p, g)

    t3 = _scan_time(grad_step, params)
    print(f"full value_and_grad:         {t3 * 1e3:8.1f} ms "
          f"(reverse ~= {max(t3 - t2, 0.0) * 1e3:.1f} ms)")

    # 4. the full train step through make_train_step
    opt = make_optimizer(2e-4, clip_grad=1.0)
    step, _ = make_train_step(model, opt, workload="3d", noise_std=(20, 30))
    o0 = opt.init(params)

    def full(carry):
        p, o = carry
        p, o, loss = step.__wrapped__(p, o, y, jax.random.PRNGKey(3))
        return (jax.tree_util.tree_map(lambda a: a + 0.0 * loss, p), o)

    t4 = _scan_time(full, (params, o0))
    print(f"full train step:             {t4 * 1e3:8.1f} ms")


if __name__ == "__main__":
    main()
