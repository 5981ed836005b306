#!/usr/bin/env python3
"""Training-dynamics parity: train the reference PyTorch CDLNet and the
cdlnet_tpu CDLNet with the same architecture/optimizer/noise protocol on
the same synthetic dataset, and compare converged test PSNR.

Not bit-identical (different RNGs/frameworks); the gate is that both land
within a fraction of a dB on an easy synthetic task — evidence that the
unrolled-LISTA forward, the constraint projection, and the Adam loop match
the reference's training behavior, beyond the per-op golden tests.

Usage: python tools/parity_train.py [steps]  (default 300; CPU)
"""

from __future__ import annotations

import sys

import numpy as np

K, M, P, S = 4, 16, 5, 2
LR = 1e-3
NOISE = (20, 30)
TEST_SIGMA = 25.0
CROP = 64


def make_data(n=32, size=96, seed=0):
    rng = np.random.default_rng(seed)
    g = np.linspace(-np.pi, np.pi, size, dtype=np.float32)
    X, Y = np.meshgrid(g, g)
    imgs = []
    for _ in range(n):
        img = np.zeros_like(X)
        for _ in range(5):
            a, b = rng.uniform(0.5, 4, 2)
            ph = rng.uniform(0, 2 * np.pi, 2)
            img += rng.uniform(0.3, 1.0) * np.sin(a * X + ph[0]) * np.cos(b * Y + ph[1])
        lo, hi = img.min(), img.max()
        imgs.append(((img - lo) / (hi - lo))[None])
    return np.stack(imgs)  # (n, 1, size, size)


def batches(data, steps, bs, seed):
    rng = np.random.default_rng(seed)
    n, _, H, W = data.shape
    for _ in range(steps):
        idx = rng.integers(0, n, bs)
        ys = rng.integers(0, H - CROP + 1, bs)
        xs = rng.integers(0, W - CROP + 1, bs)
        yield np.stack([data[i, :, y : y + CROP, x : x + CROP]
                        for i, y, x in zip(idx, ys, xs)])


def psnr(a, b):
    return -10 * np.log10(float(np.mean((a - b) ** 2)))


def train_torch(train, test, steps):
    import types

    sys.path.insert(0, "/root/reference")
    import torch

    # torchvision is not installed; the reference's utils.py imports it
    # (same stub as tools/make_goldens.py)
    tv = types.ModuleType("torchvision")
    tv_tf = types.ModuleType("torchvision.transforms")
    tv_tff = types.ModuleType("torchvision.transforms.functional")
    tv_tff.to_tensor = lambda x: x
    tv.transforms = tv_tf
    tv_tf.functional = tv_tff
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.transforms", tv_tf)
    sys.modules.setdefault("torchvision.transforms.functional", tv_tff)

    from model.net import CDLNet as TorchCDLNet

    torch.manual_seed(0)
    net = TorchCDLNet(K=K, M=M, P=P, s=S, adaptive=True, init=True)
    opt = torch.optim.Adam(net.parameters(), lr=LR)
    rng = np.random.default_rng(1)
    for i, batch in enumerate(batches(train, steps, 8, seed=2)):
        x = torch.tensor(batch)
        sigma = rng.uniform(*NOISE, (len(batch), 1, 1, 1)).astype(np.float32)
        y = x + torch.tensor(sigma) / 255.0 * torch.randn_like(x)
        xhat, _ = net(y, torch.tensor(sigma))
        loss = torch.mean((xhat - x) ** 2)
        opt.zero_grad()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(net.parameters(), 1.0)
        opt.step()
        net.project()
    with torch.no_grad():
        xt = torch.tensor(test)
        noise = torch.randn_like(xt)
        yt = xt + TEST_SIGMA / 255.0 * noise
        out, _ = net(yt, torch.full((len(test), 1, 1, 1), TEST_SIGMA))
    return psnr(out.numpy(), test), psnr(yt.numpy(), test)


def train_jax(train, test, steps):
    import jax
    import jax.numpy as jnp
    import optax

    from cdlnet_tpu.models import build_model

    model = build_model("CDLNet", {"K": K, "M": M, "P": P, "s": S, "adaptive": True})
    params = model.init(jax.random.PRNGKey(0), init=True)
    opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(LR))
    st = opt.init(params)

    @jax.jit
    def step(p, st, x, key):
        k1, k2 = jax.random.split(key)
        sigma = jax.random.uniform(k1, (x.shape[0], 1, 1, 1), minval=NOISE[0], maxval=NOISE[1])
        y = x + sigma / 255.0 * jax.random.normal(k2, x.shape)

        def loss_fn(p):
            xhat, _ = model.apply(p, y, sigma)
            return jnp.mean((xhat - x) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(p)
        up, st = opt.update(g, st, p)
        p = jax.tree_util.tree_map(lambda a, b: a + b, p, up)
        return model.project(p), st, loss

    key = jax.random.PRNGKey(3)
    for batch in batches(train, steps, 8, seed=2):
        key, sub = jax.random.split(key)
        params, st, loss = step(params, st, jnp.asarray(batch), sub)

    kt = jax.random.PRNGKey(4)
    xt = jnp.asarray(test)
    yt = xt + TEST_SIGMA / 255.0 * jax.random.normal(kt, xt.shape)
    out, _ = jax.jit(lambda p, y: model.apply(p, y, TEST_SIGMA))(params, yt)
    return psnr(np.asarray(out), test), psnr(np.asarray(yt), test)


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    data = make_data()
    train, test = data[:28], data[28:]
    jp, jn = train_jax(train, test, steps)
    tp, tn = train_torch(train, test, steps)
    print(f"noisy input PSNR:  torch {tn:.2f} dB | jax {jn:.2f} dB")
    print(f"trained test PSNR: torch {tp:.2f} dB | jax {jp:.2f} dB | delta {jp - tp:+.2f} dB")
    return jp, tp


if __name__ == "__main__":
    main()
