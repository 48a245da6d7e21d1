"""PyWavelets-style coefficient-list API.

The flat ``[approx | detail]`` prefix layout (the reference's convention)
is exact but unfamiliar to pywt users; these helpers re-express it as the
``wavedec``-style list ``[cA_L, cD_L, ..., cD_1]`` with periodic boundary
semantics (our circular convolution ≡ pywt ``mode='periodization'`` up to
the filter-phase convention).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..wavelets.base import DiscreteWavelet
from .fwt import analysis_step, fwt, ifwt, synthesis_step

__all__ = ["dwt", "idwt", "wavedec", "waverec", "coeffs_to_flat",
           "flat_to_coeffs"]


def dwt(x: jax.Array, wavelet: DiscreteWavelet):
    """Single-level DWT: ``x (..., N) → (cA, cD)``, each ``(..., N/2)``.

    The pywt-style pair view of one :func:`analysis_step` (the reference's
    per-level ``Wavelet.forward``, ``Wavelet.java:236-260``); periodic
    boundaries (pywt ``mode='periodization'`` up to filter phase).  N must
    be even (the stride-2 split; pywt pads odd input, we do not).
    """
    x = jnp.asarray(x)
    if x.shape[-1] % 2:
        raise ValueError(
            f"dwt requires an even last-axis length, got {x.shape[-1]}")
    y = analysis_step(x, wavelet)
    half = y.shape[-1] // 2
    return y[..., :half], y[..., half:]


def idwt(ca: jax.Array, cd: jax.Array, wavelet: DiscreteWavelet) -> jax.Array:
    """Inverse of :func:`dwt`: ``(cA, cD) → (..., 2·len(cA))``."""
    ca, cd = jnp.asarray(ca), jnp.asarray(cd)
    if ca.shape[-1] != cd.shape[-1]:
        raise ValueError(
            f"cA and cD must have equal last-axis lengths, got "
            f"{ca.shape[-1]} and {cd.shape[-1]}")
    return synthesis_step(jnp.concatenate([ca, cd], axis=-1), wavelet)


def flat_to_coeffs(y: jax.Array, level: int) -> list[jax.Array]:
    """Split a flat FWT array into ``[cA_L, cD_L, ..., cD_1]`` views."""
    y = jnp.asarray(y)
    n = y.shape[-1]
    out = [y[..., : n >> level]]
    for j in range(level, 0, -1):
        out.append(y[..., n >> j: n >> (j - 1)])
    return out


def coeffs_to_flat(coeffs: list[jax.Array]) -> jax.Array:
    """Inverse of :func:`flat_to_coeffs`."""
    return jnp.concatenate(list(coeffs), axis=-1)


def wavedec(x: jax.Array, wavelet: DiscreteWavelet, level=None
            ) -> list[jax.Array]:
    """Multi-level decomposition as a pywt-style coefficient list."""
    x = jnp.asarray(x)
    from ..utils.validation import exponent

    lvl = exponent(x.shape[-1]) if level is None else int(level)
    return flat_to_coeffs(fwt(x, wavelet, lvl), lvl)


def waverec(coeffs: list[jax.Array], wavelet: DiscreteWavelet) -> jax.Array:
    """Reconstruct from a pywt-style coefficient list."""
    level = len(coeffs) - 1
    return ifwt(coeffs_to_flat(coeffs), wavelet, level)
