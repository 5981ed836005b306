#!/usr/bin/env python3
"""Regenerate golden parity fixtures by RUNNING the PyTorch reference
(/root/reference) on small randomized models and saving (state_dict, input,
output) triples to tests/golden/*.npz.

Run:  python tools/make_goldens.py [--reference /root/reference]

The goldens are committed so the test suite has no runtime dependency on the
reference checkout or on torch model code. Regenerate only when the fixture
set changes.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np
import torch


def randomize(net, seed):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for name, p in net.named_parameters():
            vals = 0.05 * torch.randn(p.shape, generator=g)
            if name in ("t", "t2", "g", "g1", "g2"):
                vals = vals.abs()
            p.data = vals
    return net


def sd_np(net):
    return {k: v.detach().numpy() for k, v in net.state_dict().items()}


def save_case(outdir, name, state, arrays):
    path = os.path.join(outdir, f"{name}.npz")
    merged = {f"sd::{k}": v for k, v in state.items()}
    merged.update(arrays)
    np.savez(path, **merged)
    print(f"wrote {path} ({len(state)} sd keys)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", default="/root/reference")
    ap.add_argument("--out", default=os.path.join(os.path.dirname(__file__), "..", "tests", "golden"))
    args = ap.parse_args()

    sys.path.insert(0, args.reference)
    os.makedirs(args.out, exist_ok=True)
    torch.manual_seed(0)

    # torchvision is not installed here; the reference's utils.py imports it
    # (transitively via model/gabor.py's unused `import utils`). Stub just
    # enough for the import chain.
    import types

    tv = types.ModuleType("torchvision")
    tv_tf = types.ModuleType("torchvision.transforms")
    tv_tff = types.ModuleType("torchvision.transforms.functional")
    tv_tff.to_tensor = lambda x: torch.as_tensor(np.asarray(x))
    tv.transforms = tv_tf
    tv_tf.functional = tv_tff
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.transforms", tv_tf)
    sys.modules.setdefault("torchvision.transforms.functional", tv_tff)

    from model.net import (  # noqa: E402  (reference import)
        CDLNet,
        CDLNetVideo,
        GDLNet,
        CDLNet_CSR,
        CDLNet_CSRf2,
        DnCNN,
        FFDNet,
    )

    rng = np.random.default_rng(0)

    # ---- CDLNet 2D (strided, adaptive) on an odd-size image --------------
    net = randomize(CDLNet(K=4, M=8, P=5, s=2, C=1, t0=0.01, adaptive=True, init=False), 1)
    x = rng.random((2, 1, 21, 27)).astype(np.float32)
    sigma = 25.0
    with torch.no_grad():
        xhat, z = net(torch.from_numpy(x), sigma)
    save_case(args.out, "cdlnet2d", sd_np(net), dict(x=x, sigma=np.float32(sigma), xhat=xhat.numpy(), z=z.numpy()))

    # ---- CDLNet JDD (color, bayer mask, per-sample sigma) ----------------
    net = randomize(CDLNet(K=3, M=6, P=7, s=1, C=3, t0=0.01, adaptive=True, init=False), 2)
    x = rng.random((2, 3, 16, 16)).astype(np.float32)
    mask = np.zeros_like(x)
    mask[:, 0, 0::2, 0::2] = 1
    mask[:, 1, 0::2, 1::2] = 1
    mask[:, 1, 1::2, 0::2] = 1
    mask[:, 2, 1::2, 1::2] = 1
    sig = np.array([10.0, 20.0], np.float32).reshape(2, 1, 1, 1)
    with torch.no_grad():
        xhat, z = net(torch.from_numpy(mask * x), torch.from_numpy(sig), mask=torch.from_numpy(mask))
    save_case(
        args.out, "cdlnet_jdd", sd_np(net),
        dict(x=mask * x, mask=mask, sigma=sig, xhat=xhat.numpy(), z=z.numpy()),
    )

    # ---- CDLNetVideo (3D, anisotropic P, strided) ------------------------
    net = randomize(
        CDLNetVideo(K=3, M=6, P=(5, 5, 3), s=2, C=1, t0=0.01, adaptive=True, depth=4, init=False), 3
    )
    x = rng.random((1, 1, 6, 18, 22)).astype(np.float32)
    with torch.no_grad():
        xhat, z = net(torch.from_numpy(x), 25.0)
    save_case(args.out, "cdlnet3d", sd_np(net), dict(x=x, sigma=np.float32(25.0), xhat=xhat.numpy(), z=z.numpy()))

    # ---- CDLNetVideo with residual blocks --------------------------------
    net = randomize(
        CDLNetVideo(K=2, M=4, P=(3, 3, 3), s=1, C=1, t0=0.01, adaptive=True, depth=4, init=False, residual=True),
        4,
    )
    x = rng.random((1, 1, 4, 12, 12)).astype(np.float32)
    with torch.no_grad():
        xhat, z = net(torch.from_numpy(x), 15.0)
    save_case(args.out, "cdlnet3d_res", sd_np(net), dict(x=x, sigma=np.float32(15.0), xhat=xhat.numpy(), z=z.numpy()))

    # ---- GDLNet (unshared and fully shared) ------------------------------
    # The reference calls torch's private _output_padding helper with the
    # pre-1.12 signature (model/gabor.py:59); adapt it for modern torch.
    def _patch_output_padding(net):
        from model.gabor import ConvAdjoint2dGabor

        for m in net.modules():
            if isinstance(m, ConvAdjoint2dGabor):
                orig = m._output_padding
                m._output_padding = (
                    lambda inp, osz, st, pd, ks, _o=orig: _o(inp, osz, st, pd, ks, 2)
                )
        return net

    for tag, shared in [("gdlnet", ""), ("gdlnet_shared", "alpha_a_w0_psi")]:
        net = randomize(
            GDLNet(K=3, M=6, P=5, s=2, C=1, t0=0.01, order=2, adaptive=True, shared=shared, init=False),
            5,
        )
        net = _patch_output_padding(net)
        x = rng.random((1, 1, 20, 20)).astype(np.float32)
        with torch.no_grad():
            xhat, z = net(torch.from_numpy(x), 25.0)
        save_case(args.out, tag, sd_np(net), dict(x=x, sigma=np.float32(25.0), xhat=xhat.numpy(), z=z.numpy()))

    # ---- CDLNet_CSR: first frame (z_prev None) and recurrent step --------
    net = randomize(CDLNet_CSR(K=3, M=6, P=5, s=2, C=1, t0=0.01, adaptive=True, init=False), 6)
    x = rng.random((1, 1, 16, 16)).astype(np.float32)
    with torch.no_grad():
        xhat0, z0 = net(torch.from_numpy(x), None, 25.0)
        xhat1, z1 = net(torch.from_numpy(x), z0, 25.0)
    save_case(
        args.out, "csr", sd_np(net),
        dict(x=x, sigma=np.float32(25.0), xhat0=xhat0.numpy(), z0=z0.numpy(), xhat1=xhat1.numpy(), z1=z1.numpy()),
    )

    # ---- CDLNet_CSRf2: all four neighbor configurations ------------------
    net = randomize(CDLNet_CSRf2(K=3, M=6, P=5, s=2, C=1, t0=0.01, adaptive=True, init=False), 7)
    x = rng.random((1, 1, 16, 16)).astype(np.float32)
    with torch.no_grad():
        xh_none, z_none = net(torch.from_numpy(x), None, None, 25.0)
        xh_prev, z_prev_o = net(torch.from_numpy(x), z_none, None, 25.0)
        xh_after, _ = net(torch.from_numpy(x), None, z_none, 25.0)
        xh_both, _ = net(torch.from_numpy(x), z_none, z_prev_o, 25.0)
    save_case(
        args.out, "csrf2", sd_np(net),
        dict(
            x=x, sigma=np.float32(25.0),
            xh_none=xh_none.numpy(), z_none=z_none.numpy(),
            xh_prev=xh_prev.numpy(), z_prev_other=z_prev_o.numpy(),
            xh_after=xh_after.numpy(), xh_both=xh_both.numpy(),
        ),
    )

    # ---- DnCNN / FFDNet (eval mode) --------------------------------------
    net = randomize(DnCNN(Co=1, Ci=1, K=5, M=8, P=3), 8)
    # give BN non-trivial running stats
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.1, 0.1)
                m.running_var.uniform_(0.5, 1.5)
    net.eval()
    x = rng.random((2, 1, 17, 19)).astype(np.float32)
    with torch.no_grad():
        xhat, n = net(torch.from_numpy(x))
    save_case(args.out, "dncnn", sd_np(net), dict(x=x, xhat=xhat.numpy(), n=n.numpy()))

    net = randomize(FFDNet(C=1, K=5, M=8, P=3), 9)
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.1, 0.1)
                m.running_var.uniform_(0.5, 1.5)
    net.eval()
    x = rng.random((1, 1, 17, 19)).astype(np.float32)
    with torch.no_grad():
        xhat, nm = net(torch.from_numpy(x), 25.0)
    save_case(args.out, "ffdnet", sd_np(net), dict(x=x, sigma=np.float32(25.0), xhat=xhat.numpy()))

    # ---- NLE (MAD + PCA) on a noisy synthetic image ----------------------
    # pywt is not installed; stub Wavelet('bior4.4') with the same constants
    # our wavelet module inlines (independently validated by the perfect-
    # reconstruction identity test in tests/test_core_misc.py). The golden
    # then checks the conv/median/eigen pipeline math against the reference.
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
    from cdlnet_tpu.core.wavelet import _BANKS

    pywt_stub = types.ModuleType("pywt")

    class _W:
        def __init__(self, name):
            self.filter_bank = tuple(np.asarray(b) for b in _BANKS[name])

    pywt_stub.Wavelet = _W
    sys.modules.setdefault("pywt", pywt_stub)

    import model.nle as ref_nle

    clean = 0.5 + 0.2 * np.sin(np.linspace(0, 8, 128))[None, None, None, :]
    clean = np.broadcast_to(clean, (1, 1, 128, 128)).astype(np.float32)
    y = clean + (25.0 / 255.0) * rng.standard_normal((1, 1, 128, 128)).astype(np.float32)
    with torch.no_grad():
        mad = ref_nle.nle_mad(torch.from_numpy(y)).numpy()
        pca = ref_nle.nle_pca(torch.from_numpy(y))[0]
    np.savez(os.path.join(args.out, "nle.npz"), y=y, mad=mad, pca=np.float32(pca))
    print("wrote nle.npz")

    print("all goldens written.")


if __name__ == "__main__":
    main()
