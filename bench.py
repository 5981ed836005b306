#!/usr/bin/env python3
"""Benchmark harness: denoised frames/sec/chip for the flagship 3D video
denoiser (the SURVEY.md §3.4 north-star loop — CDLNetVideo K=30 M=169
P=(7,7,5) s=2 on 16x128x128 grayscale clips @ sigma=25).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/s", "vs_baseline": N}

vs_baseline compares against the PyTorch-CPU reference throughput measured
by running /root/reference's CDLNetVideo eval loop on this machine (see
BASELINE.md "measured" table; tools/measure_torch_baseline.py regenerates).
"""

from __future__ import annotations

import json
import os
import time

# PyTorch-CPU reference: 16-frame clip / measured s-per-clip (BASELINE.md)
TORCH_CPU_BASELINE_FPS = float(os.environ.get("CDLNET_BASELINE_FPS", "0.410"))

FLAGSHIP = {"K": 30, "M": 169, "P": (7, 7, 5), "s": 2, "C": 1,
            "adaptive": True, "depth": 16,
            # fused per-iteration Pallas kernels (kernels/lista3d);
            # CDLNET_BENCH_BACKEND=xla benches the XLA scan path instead
            "backend": os.environ.get("CDLNET_BENCH_BACKEND", "pallas")}
CLIP = (1, 1, 16, 128, 128)
SIGMA = 25.0


def _arm_watchdog():
    """Exit non-zero if the bench wedges (e.g. the TPU tunnel is down:
    backend init then blocks in C and no Python-level timeout can
    interrupt it). A daemon thread + os._exit is the only reliable
    escape; the driver records rc and stderr tail."""
    import sys
    import threading

    budget = float(os.environ.get("CDLNET_BENCH_TIMEOUT_S", "1500"))

    def _fire():
        print(
            f"bench watchdog: no result after {budget:.0f}s "
            "(TPU tunnel down or compile wedged); aborting",
            file=sys.stderr, flush=True,
        )
        os._exit(3)

    t = threading.Timer(budget, _fire)
    t.daemon = True
    t.start()
    return t


def main():
    from cdlnet_tpu.utils import setup_compilation_cache

    watchdog = _arm_watchdog()

    setup_compilation_cache()
    import jax
    import jax.numpy as jnp

    from cdlnet_tpu.models import build_model

    model = build_model("CDLNetVideo", dict(FLAGSHIP))
    params = model.init(jax.random.PRNGKey(0), init=False)
    # spectral scale stand-in so activations stay finite without running the
    # full power method (throughput is weight-value independent)
    params["A"] = params["A"] * 0.02
    params["B"] = params["B"] * 0.02
    params["t"] = jnp.abs(params["t"]) + 1e-3

    key = jax.random.PRNGKey(1)
    clean = jax.random.uniform(key, CLIP, jnp.float32)
    noisy = clean + (SIGMA / 255.0) * jax.random.normal(jax.random.fold_in(key, 1), CLIP)

    # Sustained throughput: denoise R clips sequentially inside one jitted
    # program (the analyze3d eval loop, minus host I/O) with ONE device->host
    # readback at the end. Per-call readbacks would charge the ~32 ms tunnel
    # round-trip latency of this environment to every clip, which measures
    # the tunnel, not the chip. R must be large: at R=10 the single
    # readback still adds RTT/10 = 3.2 ms to every clip (discovered r2 —
    # the r1 number 2776 f/s was really ~6000 f/s of device throughput);
    # R=100 bounds the residual at ~0.3 ms and the measured RTT is
    # subtracted as well.
    R = 100

    @jax.jit
    def run(p, y):
        def body(c, _):
            out = model.apply(p, c, SIGMA, return_z=False)[0]
            # feed output stats back into the carry so iterations can't be
            # collapsed or reordered by the compiler
            return y + 0.0 * jnp.mean(out), jnp.mean(out)
        _, outs = jax.lax.scan(body, y, None, length=R)
        return jnp.sum(outs)

    # median of several measurement rounds: throughput over the tunneled
    # backend varies ~15% run to run with ambient load
    n_warm, n_rounds, n_iter = 2, 5, 2
    for _ in range(n_warm):
        _ = float(run(params, noisy))  # readback forces execution
        # (block_until_ready is unreliable over tunneled backends)

    # measure the device->host readback round-trip so the single readback
    # per round can be subtracted (it is ~32 ms over the axon tunnel)
    zero = jnp.zeros(())
    float(zero + 0)
    rtts = []
    for _ in range(5):
        t0 = time.time()
        float(zero + 1)
        rtts.append(time.time() - t0)
    rtt = sorted(rtts)[len(rtts) // 2]

    times = []
    for _ in range(n_rounds):
        t0 = time.time()
        for _ in range(n_iter):
            _ = float(run(params, noisy))
        times.append((time.time() - t0 - n_iter * rtt) / n_iter / R)
    dt = sorted(times)[len(times) // 2]

    frames = CLIP[0] * CLIP[2]
    fps = frames / dt
    result = {
        "metric": "denoised_frames_per_sec_per_chip (3D CDLNet K30 M169 s2, 16x128x128 gray, sigma=25)",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / TORCH_CPU_BASELINE_FPS, 2),
    }
    watchdog.cancel()
    print(json.dumps(result))
    # diagnostics to stderr-adjacent line (driver parses the last JSON line;
    # keep diagnostics in the JSON-free preamble instead)
    return result


if __name__ == "__main__":
    main()
