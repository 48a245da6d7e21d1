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
    """
    c = modwt(x, wavelet, level, method)
    return jnp.mean(c[:level] ** 2, axis=-1)


def modwt_covariance(x: jax.Array, y: jax.Array, wavelet: DiscreteWavelet,
                     level: int, method: str = "auto") -> jax.Array:
    """Per-scale wavelet covariance mean(W^x_j · W^y_j), shape ``(level, ...)``.

    Decomposes Cov[x, y] by scale (plus the V_J cross term) — the tool
    behind lead/lag and co-movement analysis across horizons.
    """
    cx = modwt(x, wavelet, level, method)
    cy = modwt(y, wavelet, level, method)
    return jnp.mean(cx[:level] * cy[:level], axis=-1)


def scale_energies(coeffs: jax.Array) -> jax.Array:
    """Total energy per row of a ``(rows, ..., N)`` coefficient array
    (the per-level energy table the reference's MODWT example prints)."""
    coeffs = jnp.asarray(coeffs)
    return jnp.sum(coeffs ** 2, axis=-1)
