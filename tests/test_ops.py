"""Elementwise op parity: ST, prox_CSR(_f2), uball_project vs torch formulas
(model/net.py:11-14,229-262; model/solvers.py:24-28)."""

import numpy as np
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from cdlnet_tpu.core.ops import ST, prox_csr, prox_csr_f2, uball_project


def torch_ST(x, t):
    return x.sign() * F.relu(x.abs() - t)


def test_st_parity():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, 8, 5, 5)).astype(np.float32)
    t = np.abs(rng.standard_normal((1, 8, 1, 1)).astype(np.float32))
    ours = np.asarray(ST(jnp.asarray(x), jnp.asarray(t)))
    theirs = torch_ST(torch.from_numpy(x), torch.from_numpy(t)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-6, atol=1e-6)


def test_prox_csr_parity():
    rng = np.random.default_rng(1)
    u = rng.standard_normal((2, 8, 5, 5)).astype(np.float32)
    zp = rng.standard_normal((2, 8, 5, 5)).astype(np.float32)
    lambd = np.abs(rng.standard_normal((1, 8, 1, 1)).astype(np.float32))
    gamma = np.abs(rng.standard_normal((1, 8, 1, 1)).astype(np.float32))

    tu, tz = torch.from_numpy(u), torch.from_numpy(zp)
    tl, tg = torch.from_numpy(lambd), torch.from_numpy(gamma)
    theirs = torch_ST(
        torch_ST(tu - tz - tl * torch.sign(tz), tl * tg) + tz + tl * torch.sign(tz), tl
    ).numpy()
    ours = np.asarray(prox_csr(jnp.asarray(u), jnp.asarray(zp), jnp.asarray(lambd), jnp.asarray(gamma)))
    np.testing.assert_allclose(ours, theirs, rtol=1e-6, atol=1e-6)


def test_prox_csr_f2_parity():
    rng = np.random.default_rng(2)
    shp = (2, 8, 5, 5)
    u, zp, za = (rng.standard_normal(shp).astype(np.float32) for _ in range(3))
    lambd, g1, g2 = (
        np.abs(rng.standard_normal((1, 8, 1, 1)).astype(np.float32)) for _ in range(3)
    )

    tu, tzp, tza = map(torch.from_numpy, (u, zp, za))
    tl, tg1, tg2 = map(torch.from_numpy, (lambd, g1, g2))
    Ca = tzp + tl * torch.sign(tzp) + tl * tg2 * torch.sign(tzp - tza)
    Cb = tza + tl * torch.sign(tza) + tl * tg1 * torch.sign(tza - tzp)
    inner = torch_ST(tu - Ca, tg1 * tl)
    midder = torch_ST(inner - Cb + tl * tg1 * torch.sign(tu - Ca), tg2 * tl)
    theirs = torch_ST(midder + Cb - tl * tg1 * torch.sign(tu - Ca), tl).numpy()

    ours = np.asarray(
        prox_csr_f2(*(jnp.asarray(a) for a in (u, zp, za, lambd, g1, g2)))
    )
    np.testing.assert_allclose(ours, theirs, rtol=1e-6, atol=1e-6)


def test_uball_project_parity():
    rng = np.random.default_rng(3)
    W = (5 * rng.standard_normal((16, 1, 7, 7))).astype(np.float32)
    tW = torch.from_numpy(W)
    normW = torch.norm(tW, dim=(2, 3), keepdim=True)
    theirs = (tW * torch.clamp(1 / normW, max=1)).numpy()
    ours = np.asarray(uball_project(jnp.asarray(W), axes=(2, 3)))
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)
    # norms are all <= 1 after projection
    n = np.linalg.norm(ours.reshape(16, -1), axis=1)
    assert (n <= 1 + 1e-5).all()


def test_uball_project_3d_axes():
    rng = np.random.default_rng(4)
    W = (3 * rng.standard_normal((8, 1, 5, 5, 3))).astype(np.float32)
    ours = np.asarray(uball_project(jnp.asarray(W), axes=(2, 3, 4)))
    n = np.linalg.norm(ours.reshape(8, -1), axis=1)
    assert (n <= 1 + 1e-5).all()
