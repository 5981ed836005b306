#!/usr/bin/env python3
"""Native-resolution CSR frame-recurrent inference timing.

analyzemri's eval (reference analyzemri.py:185-298) runs csr_inference_loop
over fastMRI-native 640x368 frame volumes. The resident CSR kernel's VMEM
gate rejects these frames, so before the banded CSR prox path (r2) they ran
on the XLA scan. This pins the XLA cost and the banded speedup.

Protocol: bench.py's honest timing (R clips inside one jitted scan, single
readback, RTT measured and subtracted, median of rounds).

Usage: python tools/bench_csr_bigframe.py [csr csrf2] [D]
"""

from __future__ import annotations

import sys
import time

MARGS = {"K": 30, "M": 169, "P": 9, "s": 2, "C": 1, "adaptive": True}


def bench_case(name, D, backends=("xla", "pallas"), R=5):
    import jax
    import jax.numpy as jnp

    from cdlnet_tpu.models import build_model
    from cdlnet_tpu.models.csr import csr_video_denoise, csrf2_video_denoise

    mtype = "CDLNet_CSR" if name == "csr" else "CDLNet_CSRf2"
    loop = csr_video_denoise if name == "csr" else csrf2_video_denoise
    clip = (1, 1, D, 640, 368)
    noisy = jax.random.uniform(jax.random.PRNGKey(1), clip, jnp.float32)

    zero = jnp.zeros(())
    float(zero + 0)
    rtts = []
    for _ in range(5):
        t0 = time.time()
        float(zero + 1)
        rtts.append(time.time() - t0)
    rtt = sorted(rtts)[len(rtts) // 2]

    for backend in backends:
        model = build_model(mtype, dict(MARGS, backend=backend))
        params = model.init(jax.random.PRNGKey(0), init=False)
        for k in params:
            params[k] = (
                params[k] * 0.02 if k[0] in "AB"
                else jnp.abs(params[k]) * 0.02 + 1e-3
            )

        @jax.jit
        def run(p, y):
            def body(c, _):
                out = loop(model, p, c, sigma=25.0)[0]  # (denoised, z)
                return y + 0.0 * jnp.mean(out), jnp.mean(out)
            _, outs = jax.lax.scan(body, y, None, length=R)
            return jnp.sum(outs)

        for _ in range(2):
            float(run(params, noisy))
        times = []
        for _ in range(5):
            t0 = time.time()
            float(run(params, noisy))
            times.append((time.time() - t0 - rtt) / R)
        dt = sorted(times)[len(times) // 2]
        print(
            f"{name:6s} backend={backend:6s} {dt * 1e3:8.1f} ms/clip "
            f"= {D / dt:6.1f} frames/s  ({D}x640x368)"
        )


def bench_train(name, backends=("xla", "pallas"), R=5, H=640, W=368):
    """Native-resolution CSR TRAINING step (VERDICT r3 #7): the argscsr
    recurrence loss (2-frame alternating / 3-frame bidirectional,
    traincsr.py:192-217/:247-273) on analyzemri's own 640x368 frames.
    The fused reverse kernels are gated to 128^2 (and the banded CSR prox
    path is inference-only), so backend="pallas" training at this size
    routes to the XLA path — this records that boundary honestly."""
    import jax
    import jax.numpy as jnp

    from cdlnet_tpu.models import build_model
    from cdlnet_tpu.train.fit_csr import make_csr_train_step
    from cdlnet_tpu.train.optim import make_optimizer

    mtype = "CDLNet_CSR" if name == "csr" else "CDLNet_CSRf2"
    nframes = 2 if name == "csr" else 3
    batch = jax.random.uniform(
        jax.random.PRNGKey(1), (1, 1, nframes, H, W), jnp.float32)

    zero = jnp.zeros(())
    float(zero + 0)
    rtts = []
    for _ in range(5):
        t0 = time.time()
        float(zero + 1)
        rtts.append(time.time() - t0)
    rtt = sorted(rtts)[len(rtts) // 2]

    for backend in backends:
        model = build_model(mtype, dict(MARGS, backend=backend))
        params = model.init(jax.random.PRNGKey(0), init=False)
        for k in params:
            params[k] = (
                params[k] * 0.02 if k[0] in "AB"
                else jnp.abs(params[k]) * 0.02 + 1e-3
            )
        opt = make_optimizer(1e-4, clip_grad=1.0)
        step, _ = make_csr_train_step(model, opt, noise_std=(20, 30))

        @jax.jit
        def run(p, o, b, key):
            def body(carry, k):
                p, o = carry
                p, o, loss = step.__wrapped__(p, o, b, k)
                return (p, o), loss
            (p, o), losses = jax.lax.scan(
                body, (p, o), jax.random.split(key, R))
            return jnp.sum(losses)

        o0 = opt.init(params)
        try:
            for _ in range(2):
                float(run(params, o0, batch, jax.random.PRNGKey(2)))
        except Exception as e:  # noqa: BLE001 — record the OOM boundary
            print(f"{name:6s} TRAIN backend={backend:6s} FAILED: "
                  f"{type(e).__name__}: {str(e)[:120]}")
            continue
        times = []
        for _ in range(5):
            t0 = time.time()
            float(run(params, o0, batch, jax.random.PRNGKey(3)))
            times.append((time.time() - t0 - rtt) / R)
        dt = sorted(times)[len(times) // 2]
        print(
            f"{name:6s} TRAIN backend={backend:6s} {dt * 1e3:8.1f} ms/step "
            f"({nframes}x{H}x{W} frames, full recurrence loss)"
        )


def main():
    from cdlnet_tpu.utils import setup_compilation_cache

    setup_compilation_cache()
    args = [a for a in sys.argv[1:] if not a.isdigit() and a != "train"]
    D = next((int(a) for a in sys.argv[1:] if a.isdigit()), 8)
    train = "train" in sys.argv[1:]
    dims = [int(a) for a in sys.argv[1:] if a.isdigit()]
    for n in args or ["csr", "csrf2"]:
        if train:
            bench_train(n, H=dims[0] if dims else 640,
                        W=dims[1] if len(dims) > 1 else 368)
        else:
            bench_case(n, D)


if __name__ == "__main__":
    main()
