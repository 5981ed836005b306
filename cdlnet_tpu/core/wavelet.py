"""Wavelet filterbanks (2D non-separable, 4-subband).

Reference: model/wvlt.py:5-40 builds the banks from pywt 1D filters via outer
products. pywt is not a dependency here; the only wavelet the reference ever
uses is 'bior4.4' (model/nle.py:22, MAD noise estimation), so its filter bank
(the CDF 9/7 pair, pywt normalization with the leading/trailing zero padding
pywt applies to align the 9- and 7-tap filters to 10 taps) is inlined as
constants.

Subband order of the 2D bank: [LL, LH, HL, HH].
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# pywt.Wavelet('bior4.4').filter_bank == (dec_lo, dec_hi, rec_lo, rec_hi),
# 10 taps each (zero-padded CDF 9/7).
_BIOR44_DEC_LO = np.array(
    [
        0.0,
        0.03782845550726404,
        -0.023849465019556843,
        -0.11062440441843718,
        0.37740285561283066,
        0.8526986790088938,
        0.37740285561283066,
        -0.11062440441843718,
        -0.023849465019556843,
        0.03782845550726404,
    ]
)
_BIOR44_DEC_HI = np.array(
    [
        0.0,
        -0.06453888262869706,
        0.04068941760916406,
        0.41809227322161724,
        -0.7884856164055829,
        0.41809227322161724,
        0.04068941760916406,
        -0.06453888262869706,
        0.0,
        0.0,
    ]
)
_BIOR44_REC_LO = np.array(
    [
        0.0,
        -0.06453888262869706,
        -0.04068941760916406,
        0.41809227322161724,
        0.7884856164055829,
        0.41809227322161724,
        -0.04068941760916406,
        -0.06453888262869706,
        0.0,
        0.0,
    ]
)
_BIOR44_REC_HI = np.array(
    [
        0.0,
        -0.03782845550726404,
        -0.023849465019556843,
        0.11062440441843718,
        0.37740285561283066,
        -0.8526986790088938,
        0.37740285561283066,
        0.11062440441843718,
        -0.023849465019556843,
        -0.03782845550726404,
    ]
)

_BANKS = {
    "bior4.4": (_BIOR44_DEC_LO, _BIOR44_DEC_HI, _BIOR44_REC_LO, _BIOR44_REC_HI),
}


def filter_bank_1d(wname: str):
    """1D wavelet filterbank: (analysis (2, L), synthesis (2, L)) arrays."""
    if wname not in _BANKS:
        try:  # optional pywt passthrough for other wavelets
            import pywt  # type: ignore

            fb = np.asarray(pywt.Wavelet(wname).filter_bank, dtype=np.float64)
        except ImportError as e:
            raise NotImplementedError(
                f"wavelet {wname!r} not built in and pywt unavailable"
            ) from e
    else:
        fb = np.stack(_BANKS[wname])
    wa, ws = fb[:2], fb[2:]
    return wa, ws


def outerprod(u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Batched outer product: (..., i), (..., j) -> (..., i, j)."""
    return np.einsum("...i,...j->...ij", u, v)


def nonsep(w: np.ndarray) -> np.ndarray:
    """1D bank (2, L) -> 2D non-separable 4-subband bank (1, 4, L, L).

    Row order [LL, LH, HL, HH]; spatially flipped so that a correlation
    (conv2d) with the result computes a true convolution, matching
    model/wvlt.py:31-40.
    """
    w1 = np.concatenate([w[:1], w[:1], w[1:], w[1:]])
    w2 = np.concatenate([w, w])
    W = outerprod(w1, w2)[None]
    return W[:, :, ::-1, ::-1]


def filter_bank_2d(wname: str):
    """2D non-separable filter banks.

    Returns (Wa, Ws): analysis (4, 1, L, L) — 1-to-4-channel conv bank —
    and synthesis (4, 1, L, L) with the flip undone, matching
    model/wvlt.py:14-23.
    """
    wa, ws = filter_bank_1d(wname)
    Wa = np.swapaxes(nonsep(wa), 0, 1)
    Ws = np.swapaxes(nonsep(ws), 0, 1)[:, :, ::-1, ::-1]
    return jnp.asarray(Wa, dtype=jnp.float32), jnp.asarray(Ws, dtype=jnp.float32)
