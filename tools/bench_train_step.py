#!/usr/bin/env python3
"""Time the jitted training step for the reference's flagship configs, per
backend (XLA polyphase scan vs fused Pallas kernels via the custom-VJP path).

Timing protocol per CLAUDE.md: the tunneled TPU backend's block_until_ready
does not block, and per-call readbacks charge ~28 ms of tunnel latency to
every step — so run R async step dispatches back-to-back and force execution
with ONE scalar readback, reporting wall/R.

Usage: python tools/bench_train_step.py [config ...]
  configs: 2d, video (default: both)
"""

from __future__ import annotations

import sys
import time

CONFIGS = {
    # trained_nets/CDLNet-s2030/args.json scale: batch 10 x 128^2
    "2d": dict(
        mtype="CDLNet",
        model={"K": 30, "M": 169, "P": 7, "s": 2, "C": 1, "adaptive": True},
        batch=(10, 1, 128, 128),
        workload="2d",
    ),
    # big-crop 2D training (out-of-protocol for the reference, which always
    # crops 128^2 — measured for the VERDICT r1 #7 banded-gradient question)
    "2d-256": dict(
        mtype="CDLNet",
        model={"K": 30, "M": 169, "P": 7, "s": 2, "C": 1, "adaptive": True},
        batch=(4, 1, 256, 256),
        workload="2d",
    ),
    "2d-512": dict(
        mtype="CDLNet",
        model={"K": 30, "M": 169, "P": 7, "s": 2, "C": 1, "adaptive": True},
        batch=(1, 1, 512, 512),
        workload="2d",
    ),
    # trained_nets/JDD_CDLNet-s0120/args.json scale: color, s=1, K=42,
    # Bayer-masked batch 10 x 3 x 128^2 (demosaic mask applied in-step)
    "jdd": dict(
        mtype="CDLNet",
        model={"K": 42, "M": 64, "P": 7, "s": 1, "C": 3, "adaptive": True},
        batch=(10, 3, 128, 128),
        workload="2d",
        demosaic=True,
    ),
    # args3dmri.json scale: batch 1 x 30 x 128^2, P=(9,9,5)
    "mri": dict(
        mtype="CDLNetVideo",
        model={"K": 30, "M": 169, "P": (9, 9, 5), "s": 2, "C": 1,
               "adaptive": True, "depth": 30},
        batch=(1, 1, 30, 128, 128),
        workload="3d",
    ),
    # args3d.json scale: batch 2 x 16 x 128^2
    "video": dict(
        mtype="CDLNetVideo",
        model={"K": 30, "M": 169, "P": (7, 7, 5), "s": 2, "C": 1,
               "adaptive": True, "depth": 16},
        batch=(2, 1, 16, 128, 128),
        workload="3d",
    ),
    # big-frame 3D training (out-of-protocol for the reference, which
    # crops 128^2 — measured for the banded 3D gradient path,
    # kernels/lista3d_tiled_bwd): quarter-DAVIS frames and a half-res
    # fastMRI-like volume
    "video-256": dict(
        mtype="CDLNetVideo",
        model={"K": 30, "M": 169, "P": (7, 7, 5), "s": 2, "C": 1,
               "adaptive": True, "depth": 16},
        batch=(1, 1, 16, 256, 256),
        workload="3d",
    ),
    "video-512": dict(
        mtype="CDLNetVideo",
        model={"K": 30, "M": 169, "P": (7, 7, 5), "s": 2, "C": 1,
               "adaptive": True, "depth": 8},
        batch=(1, 1, 8, 512, 512),
        workload="3d",
    ),
    # NATIVE-resolution 3D training (VERDICT r2 #4): the reference's own
    # eval shapes — DAVIS 16x480x854 (analyze3d.py) and fastMRI
    # 30x640x368 (analyzemri.py). The banded train gate admits both
    # (pick_band3_train: band 32 / 64); the open question is HBM — the
    # bf16 z history alone is 8.3 / 9.0 GB on a 16 GB chip. R is forced
    # to 3 for these (see main) so the scan doesn't multiply residency.
    "video-davis": dict(
        mtype="CDLNetVideo",
        model={"K": 30, "M": 169, "P": (7, 7, 5), "s": 2, "C": 1,
               "adaptive": True, "depth": 16},
        batch=(1, 1, 16, 480, 854),
        workload="3d",
        r=3,
    ),
    # largest-fitting half-native points (the full native shapes OOM on a
    # 16 GB chip in BOTH backends: XLA autodiff wants 50 GB of fp32
    # residuals at DAVIS-native; the banded fused path's bf16-z + fp32-r
    # histories total ~16.5 GB — see BASELINE.md)
    "video-davis-half": dict(
        mtype="CDLNetVideo",
        model={"K": 30, "M": 169, "P": (7, 7, 5), "s": 2, "C": 1,
               "adaptive": True, "depth": 16},
        batch=(1, 1, 16, 480, 432),
        workload="3d",
        r=5,
    ),
    "video-mri-half": dict(
        mtype="CDLNetVideo",
        model={"K": 30, "M": 169, "P": (9, 9, 5), "s": 2, "C": 1,
               "adaptive": True, "depth": 30},
        batch=(1, 1, 30, 320, 368),
        workload="3d",
        r=5,
    ),
    "video-mri-quarter": dict(
        mtype="CDLNetVideo",
        model={"K": 30, "M": 169, "P": (9, 9, 5), "s": 2, "C": 1,
               "adaptive": True, "depth": 30},
        batch=(1, 1, 30, 320, 192),
        workload="3d",
        r=5,
    ),
    "video-mrinative": dict(
        mtype="CDLNetVideo",
        model={"K": 30, "M": 169, "P": (9, 9, 5), "s": 2, "C": 1,
               "adaptive": True, "depth": 30},
        batch=(1, 1, 30, 640, 368),
        workload="3d",
        r=3,
    ),
    # "Gabor is Enough" protocol: GDLNet at the CDLNet-s2030 scale (the
    # paper trains the same K/M/P/s grid with Gabor-parameterized banks);
    # order=1, nothing shared — the heaviest GDLNet train config
    "gdlnet": dict(
        mtype="GDLNet",
        model={"K": 30, "M": 169, "P": 7, "s": 2, "C": 1, "adaptive": True,
               "order": 1},
        batch=(10, 1, 128, 128),
        workload="2d",
    ),
    # reference model/net.py:689-713 defaults (K=17 layers, M=64, P=3);
    # BatchNorm running stats threaded through the stateful step
    "dncnn": dict(
        mtype="DnCNN",
        model={"K": 17, "M": 64, "P": 3},
        batch=(10, 1, 128, 128),
        workload="2d",
        stateful=True,
    ),
    # reference model/net.py:715-730 (pixel-unshuffle + noise map, s=2 grid)
    "ffdnet": dict(
        mtype="FFDNet",
        model={"K": 17, "M": 64, "P": 3},
        batch=(10, 1, 128, 128),
        workload="2d",
        stateful=True,
    ),
}


def bench_one(name, cfg, backend, repeats=50):
    import jax
    import jax.numpy as jnp

    from cdlnet_tpu.models import build_model
    from cdlnet_tpu.train.fit import make_train_step
    from cdlnet_tpu.train.optim import make_optimizer

    stateful = cfg.get("stateful", False)
    margs = dict(cfg["model"])
    if not stateful:  # DnCNN/FFDNet have no backend knob (XLA convs only)
        margs["backend"] = backend
    model = build_model(cfg["mtype"], margs)
    # real spectral (power-method) init: without it the LISTA iterates of
    # an unnormalized random A/B amplify ~10x per iteration and the K=30
    # forward overflows fp32 at the bigger configs (loss prints inf/nan);
    # timing is unaffected either way, but the loss column should be sane
    params = model.init(jax.random.PRNGKey(0), init=True)
    state = None
    if isinstance(params, tuple):  # BN families: (params, state)
        params, state = params
    if "t" in params:
        params["t"] = jnp.abs(params["t"]) + 1e-3
    opt = make_optimizer(1e-4, clip_grad=0.1)
    opt_state = opt.init(params)
    step, _ = make_train_step(model, opt, workload=cfg["workload"],
                              noise_std=(20, 30),
                              demosaic=cfg.get("demosaic", False),
                              stateful=stateful)
    batch = jax.random.uniform(jax.random.PRNGKey(1), cfg["batch"], jnp.float32)
    key = jax.random.PRNGKey(2)

    # compile + settle
    if stateful:
        params, state, opt_state, loss = step(params, state, opt_state, batch, key)
    else:
        params, opt_state, loss = step(params, opt_state, batch, key)
    float(loss)

    # primary protocol: R steps inside ONE jitted lax.scan, single
    # readback — sustained per-step device time with no tunnel overhead
    # (the axon tunnel charges ~2 ms per chained dispatch otherwise)
    @jax.jit
    def run(params, state, opt_state, batch, key):
        def body(carry, i):
            p, st, os_ = carry
            k = jax.random.fold_in(key, i)
            if stateful:
                p, st, os_, loss = step(p, st, os_, batch, k)
            else:
                p, os_, loss = step(p, os_, batch, k)
            return (p, st, os_), loss
        (params, state, opt_state), losses = jax.lax.scan(
            body, (params, state, opt_state), jnp.arange(repeats))
        return losses[-1]

    # measure the device->host readback round-trip on this backend (it is
    # ~28 ms over the tunnel, ~0 locally) and subtract ONE trip
    sm = jnp.zeros(())
    float(sm + 0)
    t0 = time.perf_counter()
    for _ in range(3):
        float(sm + 1)
    rtt = (time.perf_counter() - t0) / 3

    lv = float(run(params, state, opt_state, batch, key))  # compile
    t0 = time.perf_counter()
    lv = float(run(params, state, opt_state, batch, key))
    dt = max(time.perf_counter() - t0 - rtt, 1e-9) / repeats
    print(f"{name:6s} backend={backend:6s} {dt*1e3:8.1f} ms/step  "
          f"(in-jit scan of {repeats}; loss {lv:.5f})")
    return dt


def main():
    from cdlnet_tpu.utils import setup_compilation_cache

    setup_compilation_cache()
    names = sys.argv[1:] or ["2d", "video"]
    for name in names:
        cfg = CONFIGS[name]
        # BN families have no fused-kernel path — one XLA measurement only
        backends = ("xla",) if cfg.get("stateful") else ("xla", "pallas")
        for backend in backends:
            try:
                bench_one(name, cfg, backend, repeats=cfg.get("r", 50))
            except Exception as e:  # noqa: BLE001 — e.g. native-resolution
                # XLA autodiff OOM (50 GB of fp32 residuals at DAVIS-native);
                # record and keep going so the other backend still reports
                msg = str(e).replace("\n", " ")[:200]
                print(f"{name:6s} backend={backend:6s}   FAILED: {msg}")


if __name__ == "__main__":
    main()
