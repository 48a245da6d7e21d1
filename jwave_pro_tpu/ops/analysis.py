"""Wavelet-domain analysis: MODWT wavelet variance / covariance / energy.

The reference's ``docs/FINANCIAL_ROADMAP.md`` proposes (but never implements)
MODWT-based market analysis; the core statistical tool behind all of it is
the Percival–Walden MODWT wavelet variance: the signal's variance decomposed
by scale, ``Var[x] = Σ_j ν²_j``.  Implemented here on the shift-invariant
MODWT (biased estimator over all N coefficients — the circular-boundary
convention matching this library's transform).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..wavelets.base import DiscreteWavelet
from .modwt import modwt

__all__ = ["modwt_variance", "modwt_covariance", "scale_energies"]


def modwt_variance(x: jax.Array, wavelet: DiscreteWavelet, level: int,
                   method: str = "auto") -> jax.Array:
    """Per-scale wavelet variance ν²_j = mean(W_j²), shape ``(level, ...)``.

    The detail rows of the MODWT partition the sample variance:
    ``Σ_j ν²_j + mean(V_J²) − mean(x)² = Var[x]`` (energy preservation of
    the √2-normalized filter bank).

    On TPU, f32/bf16 (B, N)/(N,) inputs auto-dispatch to the single-pass
    fused kernel (kernels/variance_pallas.py) — the coefficients never
    touch HBM, so the whole statistic costs ~one read of the signal.
    ``method='fused'`` forces it (raising if the shape is unsupported);
    any other explicit method uses the corresponding transform path.
    """
    out = _try_var_fused(x, wavelet, level, method)
    if out is not None:
        return out
    c = modwt(x, wavelet, level, method)
    return jnp.mean(c[:level] ** 2, axis=-1)


def _try_var_fused(x, wavelet, level, method):
    if method not in ("auto", "fused"):
        return None
    x = jnp.asarray(x)
    if method == "auto":
        if jax.default_backend() != "tpu" or x.ndim not in (1, 2) \
                or x.dtype not in (jnp.float32, jnp.bfloat16):
            return None
    from ..kernels.variance_pallas import modwt_var_fused, var_fused_supported

    b, n = (1, x.shape[0]) if x.ndim == 1 else x.shape
    if var_fused_supported(b, n, level, wavelet.length) is None:
        if method == "fused":
            raise ValueError(
                f"fused variance unavailable for shape {x.shape}")
        return None
    return modwt_var_fused(x, wavelet, level)[:level]


def modwt_covariance(x: jax.Array, y: jax.Array, wavelet: DiscreteWavelet,
                     level: int, method: str = "auto") -> jax.Array:
    """Per-scale wavelet covariance mean(W^x_j · W^y_j), shape ``(level, ...)``.

    Decomposes Cov[x, y] by scale (plus the V_J cross term) — the tool
    behind lead/lag and co-movement analysis across horizons.

    When the fused variance kernel applies (see :func:`modwt_variance`),
    the covariance is computed by polarization —
    ``cov = (var(x+y) − var(x−y))/4`` — exact by linearity of the MODWT,
    two single-pass kernels instead of 2·(L+2) coefficient passes.
    """
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    if x.shape == y.shape:
        out = _try_var_fused(x + y, wavelet, level, method)
        if out is not None:
            return (out - _try_var_fused(x - y, wavelet, level, method)) / 4.0
    cx = modwt(x, wavelet, level, method)
    cy = modwt(y, wavelet, level, method)
    return jnp.mean(cx[:level] * cy[:level], axis=-1)


def scale_energies(coeffs: jax.Array) -> jax.Array:
    """Total energy per row of a ``(rows, ..., N)`` coefficient array
    (the per-level energy table the reference's MODWT example prints)."""
    coeffs = jnp.asarray(coeffs)
    return jnp.sum(coeffs ** 2, axis=-1)
