"""Shared pallas-backend routing for the 2D LISTA models.

CDLNet and GDLNet differ only in where their filter banks come from; the
backend dance — whole-K-resident fused kernel, else banded big-image
kernels, else the XLA scan — is identical. One helper keeps the four
routing branches from drifting apart."""

from __future__ import annotations


def route_lista2d(yp, A, B, t, c, *, M, C, P, s, K, mask, return_z,
                  train=False):
    """Run the fused 2D LISTA via the best-fitting kernel.

    Returns (xphat, z_or_None) or None when no fused path fits (caller
    falls back to the XLA scan). With return_z=False the chosen path is
    differentiable (custom VJPs in kernels/autodiff); return_z=True is
    the inference-grade direct kernel. NB the banded path carries codes
    in bfloat16 — returned z is ~0.5% perturbed vs the fp32-exact
    whole-image path (document at the model layer).

    train=True declares the call will be differentiated (a training
    step). Shapes whose whole-image reverse kernel does not fit VMEM
    route to the BANDED kernels when the banded reverse
    (kernels/lista2d_tiled_bwd) fits, else to None (pure XLA): the
    custom-VJP's internal XLA-gradient fallback re-runs the whole XLA
    forward inside the backward, so "fused forward + XLA vjp" costs MORE
    than plain XLA end-to-end (measured 113 vs 68 ms/step at batch
    4 x 256^2 flagship-2D) — a fused primal only pays off when its
    reverse kernel runs too."""
    from cdlnet_tpu.kernels.lista2d import (
        lista2d_bwd_supported,
        lista2d_fused,
        lista2d_fused_supported,
    )

    H, W = yp.shape[-2], yp.shape[-1]
    if train and not return_z and not lista2d_bwd_supported(M, C, P, s, K, H, W):
        from cdlnet_tpu.kernels.lista2d_tiled import lista2d_tiled_supported
        from cdlnet_tpu.kernels.lista2d_tiled_bwd import (
            lista2d_tiled_bwd_supported,
        )

        if lista2d_tiled_supported(M, C, P, s, K, H, W) and \
                lista2d_tiled_bwd_supported(M, C, P, s, K, H, W):
            from cdlnet_tpu.kernels.autodiff import lista2d_tiled_diff

            return lista2d_tiled_diff(yp, A, B, t, c, stride=s,
                                      mask=mask), None
        return None
    if lista2d_fused_supported(M, C, P, s, K, H, W, return_z=return_z,
                               hist=train):
        if not return_z:
            from cdlnet_tpu.kernels.autodiff import lista2d_fused_diff

            return lista2d_fused_diff(yp, A, B, t, c, stride=s, mask=mask), None
        from cdlnet_tpu.kernels.autodiff import _RETURN_Z_HINT, nondifferentiable

        return nondifferentiable(
            lambda yp, A, B, t, c: lista2d_fused(
                yp, A, B, t, c, stride=s, mask=mask, return_z=True),
            _RETURN_Z_HINT,
        )(yp, A, B, t, c)
    from cdlnet_tpu.kernels.lista2d_tiled import (
        lista2d_tiled,
        lista2d_tiled_supported,
    )

    if lista2d_tiled_supported(M, C, P, s, K, H, W):
        if not return_z:
            from cdlnet_tpu.kernels.autodiff import lista2d_tiled_diff

            return lista2d_tiled_diff(yp, A, B, t, c, stride=s, mask=mask), None
        from cdlnet_tpu.kernels.autodiff import _RETURN_Z_HINT, nondifferentiable

        return nondifferentiable(
            lambda yp, A, B, t, c: lista2d_tiled(
                yp, A, B, t, c, stride=s, mask=mask, return_z=True),
            _RETURN_Z_HINT,
        )(yp, A, B, t, c)
    return None
