"""Gabor kernel parity, wavelet bank structure, power-method correctness."""

import numpy as np
import torch
import jax.numpy as jnp

from cdlnet_tpu.core.gabor import gabor_kernel
from cdlnet_tpu.core.solvers import power_method
from cdlnet_tpu.core.wavelet import filter_bank_1d, filter_bank_2d


def torch_gabor_kernel(a, w0, psi, ks):
    """Reference formula from model/gabor.py:7-28, re-expressed in torch."""
    a = a[:, :, :, None, None, :]
    w0 = w0[:, :, :, None, None, :]
    psi = psi[:, :, :, None, None]
    i = torch.arange(ks).float()
    x = torch.stack(torch.meshgrid(i, i, indexing="ij"), dim=2)[None, None]
    x0 = torch.tensor([(ks - 1) / 2, (ks - 1) / 2])[None, None, None, None, None, :]
    return torch.exp(-torch.sum((a * (x - x0)) ** 2, dim=-1)) * torch.cos(
        torch.sum(w0 * (x - x0), dim=-1) + psi
    )


def test_gabor_kernel_parity():
    rng = np.random.default_rng(0)
    order, M, C, ks = 2, 6, 1, 7
    a = rng.standard_normal((order, M, C, 2)).astype(np.float32)
    w0 = rng.standard_normal((order, M, C, 2)).astype(np.float32)
    psi = rng.standard_normal((order, M, C)).astype(np.float32)
    theirs = torch_gabor_kernel(*map(torch.from_numpy, (a, w0, psi)), ks).numpy()
    ours = np.asarray(gabor_kernel(jnp.asarray(a), jnp.asarray(w0), jnp.asarray(psi), ks))
    assert ours.shape == (order, M, C, ks, ks)
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


def test_gabor_adjoint_negation_is_identity():
    """Reference quirk: ConvAdjoint2dGabor.get_filter(transpose=True) negates
    (w0, psi) (model/gabor.py:46-51), but cos is even so
    cos(-<w0,d> - psi) == cos(<w0,d> + psi) — the negation is a NO-OP and the
    'adjoint' filter equals the forward filter. GDLNet therefore uses the same
    filter for analysis (conv) and synthesis (conv-transpose); our GDLNet
    exploits this and synthesizes each bank once."""
    rng = np.random.default_rng(1)
    a = rng.standard_normal((1, 2, 1, 2)).astype(np.float32)
    w0 = rng.standard_normal((1, 2, 1, 2)).astype(np.float32)
    psi = rng.standard_normal((1, 2, 1)).astype(np.float32)
    h = np.asarray(gabor_kernel(jnp.asarray(a), jnp.asarray(w0), jnp.asarray(psi), 7))
    hT = np.asarray(gabor_kernel(jnp.asarray(a), -jnp.asarray(w0), -jnp.asarray(psi), 7))
    np.testing.assert_allclose(hT, h, rtol=1e-5, atol=1e-6)


def test_wavelet_bank_shapes_and_perfect_reconstruction():
    wa, ws = filter_bank_1d("bior4.4")
    assert wa.shape == (2, 10) and ws.shape == (2, 10)
    Wa, Ws = filter_bank_2d("bior4.4")
    assert Wa.shape == (4, 1, 10, 10) and Ws.shape == (4, 1, 10, 10)
    # biorthogonality: sum_k dec_lo[k] rec_lo[k+2m] + dec_hi rec_hi -> delta
    dec_lo, dec_hi = wa
    rec_lo, rec_hi = ws
    conv = np.convolve(dec_lo, rec_lo) + np.convolve(dec_hi, rec_hi)
    center = len(conv) // 2
    np.testing.assert_allclose(conv[center], 2.0, atol=1e-6)
    np.testing.assert_allclose(conv[center - 2], 0.0, atol=1e-6)
    np.testing.assert_allclose(conv[center + 2], 0.0, atol=1e-6)


def test_hh_filter_near_unit_norm():
    """MAD's sigma scaling assumes a ~unit-norm HH filter; bior4.4's dec_hi has
    norm 0.9914, so the 2D HH norm is ~0.983."""
    Wa, _ = filter_bank_2d("bior4.4")
    hh = np.asarray(Wa[3, 0])
    np.testing.assert_allclose(np.linalg.norm(hh), 0.983, atol=0.01)


def test_power_method_known_operator():
    """Power method on a diagonal linear operator finds the max eigenvalue."""
    d = jnp.asarray(np.array([1.0, 3.0, 2.0, 0.5], np.float32))
    A = lambda v: d * v
    b0 = jnp.asarray(np.random.default_rng(0).random(4).astype(np.float32))
    eig, b, ok = power_method(A, b0, num_iter=500, tol=1e-9)
    assert float(eig) == __import__("pytest").approx(3.0, rel=1e-4)
    assert bool(ok)


def test_save_gif(tmp_path):
    from cdlnet_tpu.utils import save_gif

    frames = np.random.default_rng(0).uniform(0, 1, (4, 16, 16)).astype(np.float32)
    p = str(tmp_path / "clip.gif")
    save_gif(p, frames)
    from PIL import Image

    with Image.open(p) as im:
        assert im.n_frames == 4
    # (C, D, H, W) grayscale form
    save_gif(str(tmp_path / "c.gif"), frames[None])


def test_gen_synthetic_mri_dirs_roundtrip(tmp_path):
    """The synthetic k-space fixtures round-trip through the fastMRI loader:
    ifft2c recovers the structured field (up to uint8 quantization)."""
    from cdlnet_tpu.data.fastmri import FastMRIDataset
    from cdlnet_tpu.data.synthetic import gen_synthetic_mri_dirs, random_field_video

    root = gen_synthetic_mri_dirs(
        str(tmp_path / "mri"), n_volumes=1, slices=4, size=32, seed=3,
        splits=("test",),
    )
    ds = FastMRIDataset([f"{root}/test"], depth=4, test=True, PDFS=False)
    vol = ds[0]  # (1, 4, 32, 32)
    assert vol.shape == (1, 4, 32, 32)
    ref = random_field_video(np.random.default_rng(3), depth=4, size=32)
    # the loader min-max normalizes each slice of |ifft2c| to uint8/255
    # (datafastmri.py:86-96 semantics) — apply the same per-slice transform
    for d in range(4):
        s = ref[d]
        s = (s - s.min()) / max(s.max() - s.min(), 1e-12)
        s = (s * 255).astype(np.uint8).astype(np.float32) / 255.0
        assert np.max(np.abs(vol[0, d] - s)) < 1e-6
