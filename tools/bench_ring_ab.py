#!/usr/bin/env python3
"""Ring-kernel A/B harness: dump a bit-exact DAVIS-native output + a
two-length-differenced wall time under a tag, so kernel-internal changes
can be validated BIT-IDENTICAL and timed against the pre-change run in
the same session (the protocol behind the r5 partial-slot-store result:
140.0 -> 139.3 ms/clip, max |diff| 0.0).

Usage:
  python tools/bench_ring_ab.py base        # before the change
  <edit kernels/lista3d_ring.py>
  python tools/bench_ring_ab.py opt         # after
  python - <<'PY'
  import numpy as np
  a = np.load('/tmp/ring_ab_base.npy'); b = np.load('/tmp/ring_ab_opt.npy')
  print('max |diff|:', np.abs(a - b).max())
  PY

Workload: the reference's own native-res eval clip (analyze3d.py:77-161),
flagship config, lane-class path active (Wc 427 -> 512). Timing uses the
two-length scan-difference protocol (CLAUDE.md): R=2 and R=6 jitted scans
with one readback each, differenced so the tunnel RTT cancels exactly.
"""
import sys
import time
from functools import partial

import numpy as np

from cdlnet_tpu.utils import setup_compilation_cache

setup_compilation_cache()
import jax
import jax.numpy as jnp

from cdlnet_tpu.kernels.lista3d_ring import lista3d_ring


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "base"
    D, H, W = 16, 480, 854
    M, K, s, P = 169, 30, 2, (7, 7, 5)
    key = jax.random.PRNGKey(0)
    A = 0.02 * jax.random.normal(key, (K, M, 1, *P), jnp.float32)
    B = 0.02 * jax.random.normal(jax.random.fold_in(key, 1),
                                 (K, M, 1, *P))
    t = 0.01 * jnp.abs(jax.random.normal(jax.random.fold_in(key, 2),
                                         (K, 2, M, 1, 1, 1)))
    yp = jax.random.uniform(jax.random.fold_in(key, 3), (1, 1, D, H, W))
    c = jnp.full((1,), 25.0 / 255.0)

    x, _ = jax.jit(lambda y: lista3d_ring(y, A, B, t, c, stride=s))(yp)
    xn = np.asarray(x)
    np.save(f"/tmp/ring_ab_{tag}.npy", xn)
    print("sum", float(np.sum(xn)))

    @partial(jax.jit, static_argnums=1)
    def run(y, R):
        def body(cr, _):
            # thread the carry into the input so XLA cannot hoist the
            # loop-invariant evaluation out of the scan (CLAUDE.md)
            out = lista3d_ring(y + cr * 1e-20, A, B, t, c, stride=s)[0]
            return cr + 0 * jnp.mean(out), jnp.mean(out)

        _, outs = jax.lax.scan(body, jnp.zeros(()), None, length=R)
        return jnp.sum(outs)

    walls = {}
    for R in (2, 6):
        float(run(yp, R))
        ts = []
        for _ in range(3):
            t0 = time.time()
            float(run(yp, R))
            ts.append(time.time() - t0)
        walls[R] = sorted(ts)[1]
    per = (walls[6] - walls[2]) / 4
    print(f"{tag}: {per * 1e3:.1f} ms/clip ({D / per:.1f} frames/s)  "
          f"[two-length diff]")


if __name__ == "__main__":
    main()
