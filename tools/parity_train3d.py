#!/usr/bin/env python3
"""Flagship-scale 3D training parity: pallas (fused resident forward+
backward kernels) vs XLA backend, identical init/data/noise streams.

The 2D flagship gate (tools/flagship_gate.py) pinned torch parity; this
pins the 3D fused-kernel TRAINING path at the reference's args3d scale,
where interpret-mode unit tests can't reach. Both backends train
CDLNetVideo K=30 M=169 P=(7,7,5) s=2 on the same synthetic clip corpus
with per-sample sigma in [20,30], then eval PSNR @ sigma=25 on held-out
clips.

Pass criterion (ONE-SIDED): PSNR_pallas >= PSNR_xla - 0.1 dB. Two-sided
equality at BASELINE.json's 0.05 dB is not meaningful here: per-step
gradient reassociation differences between the backends compound
chaotically over hundreds of steps (measured scatter is ±0.25 dB in
EITHER direction in an overfit regime), so the gate asks only that the
fused path trains no worse. Exits nonzero on FAIL.

Usage: python tools/parity_train3d.py [steps=300]
"""

from __future__ import annotations

import sys
import time

from cdlnet_tpu.utils import setup_compilation_cache


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    setup_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cdlnet_tpu.models import build_model
    from cdlnet_tpu.train.fit import make_train_step
    from cdlnet_tpu.train.optim import make_optimizer

    N, C, D, H, W = 2, 1, 16, 128, 128
    cfg = dict(K=30, M=169, P=(7, 7, 5), s=2, C=1, adaptive=True, depth=D)

    # deterministic synthetic video corpus: drifting sin/cos textures
    def make_clip(seed):
        k = jax.random.PRNGKey(seed)
        f0, f1, ph = jax.random.uniform(k, (3,), minval=0.5, maxval=3.0)
        tt = jnp.linspace(0, 2 * np.pi, H)
        frames = [
            jnp.sin(f0 * tt[None, :] + 0.21 * d + ph)
            * jnp.cos(f1 * tt[:, None] - 0.13 * d)
            for d in range(D)
        ]
        return jnp.stack(frames).reshape(1, D, H, W) * 0.5 + 0.5

    # enough clips that 300 steps can't overfit: in the overfit regime
    # (>42 dB, loss ~5e-5) the two arms' trajectories diverge chaotically
    # from ~3e-4 per-step gradient differences and the comparison stops
    # measuring the kernels
    train_clips = jnp.stack([make_clip(i) for i in range(64)])
    test_clips = jnp.stack([make_clip(100 + i) for i in range(4)])

    def run(backend):
        model = build_model("CDLNetVideo", dict(cfg, backend=backend))
        params = model.init(jax.random.PRNGKey(0), init=True)
        # flagship-from-scratch without the trainer's backtracking safety
        # net: keep lr conservative (1e-3 diverges on BOTH backends)
        opt = make_optimizer(2e-4, clip_grad=0.05)
        opt_state = opt.init(params)
        step, _ = make_train_step(model, opt, workload="3d",
                                  noise_std=(20, 30))
        key = jax.random.PRNGKey(7)
        t0 = time.time()
        for i in range(steps):
            key, kb, kn = jax.random.split(key, 3)
            idx = jax.random.randint(kb, (N,), 0, train_clips.shape[0])
            batch = train_clips[idx]
            params, opt_state, loss = step(params, opt_state, batch, kn)
            if i % 100 == 0:
                print(f"  [{backend}] step {i} loss {float(loss):.6f}",
                      flush=True)
        wall = time.time() - t0

        # eval @ sigma=25, XLA inference for BOTH arms (isolates TRAINING)
        emodel = build_model("CDLNetVideo", dict(cfg, backend="xla"))
        kev = jax.random.PRNGKey(1234)
        noisy = test_clips + 25 / 255 * jax.random.normal(
            kev, test_clips.shape)
        xhat, _ = jax.jit(
            lambda p, y: emodel.apply(p, y, 25.0, return_z=False)
        )(params, noisy)
        mse = jnp.mean((xhat - test_clips) ** 2)
        psnr = float(-10 * jnp.log10(mse))
        print(f"{backend:7s}: {steps} steps in {wall:6.1f}s "
              f"-> eval PSNR {psnr:.3f} dB (loss {float(loss):.6f})")
        return psnr

    p_xla = run("xla")
    p_pal = run("pallas")
    delta = p_pal - p_xla
    # one-sided no-degradation gate: identical-arithmetic equality is
    # unattainable (the backends reassociate differently, trajectories
    # diverge), so require the fused path to train AT LEAST as well as
    # XLA minus 0.1 dB
    ok = delta >= -0.1
    print(f"pallas - xla = {delta:+.4f} dB -> {'PASS' if ok else 'FAIL'}"
          " (one-sided gate -0.1 dB)")
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
