from cdlnet_tpu.nle.mad import nle_mad
from cdlnet_tpu.nle.pca import nle_pca


def noise_level(y, method="MAD", **kwargs):
    """Blind noise-level (sigma-hat on [0,1] scale) estimation dispatch.

    Reference: model/nle.py:9-15 — MAD (wavelet median) or PCA (weak-texture
    eigenvalue) methods; `method=True` selects MAD for CLI compatibility.
    """
    if method in (True, "MAD", "wvlt"):
        return nle_mad(y)
    if method == "PCA":
        return nle_pca(y)[0]
    raise NotImplementedError(method)
