"""2D separable MODWT (undecimated wavelet transform for images).

Beyond the reference's scope (its MODWT is 1D-only, SURVEY §2.1) but the
natural TPU extension: per level j the à-trous filter pair runs along rows
then columns, producing full-resolution LH/HL/HH detail bands and an LL
approximation that feeds the next level — all batched convolutions.

Layout: ``modwt2`` returns ``(3·level+1, ..., R, C)``:
rows ``3(j−1) .. 3(j−1)+2`` are (LH_j, HL_j, HH_j) — (row-low·col-high,
row-high·col-low, row-high·col-high) — and the last row is LL_J.
Perfect reconstruction follows per axis from the 1D identity
``Conv_gᵀConv_g + Conv_hᵀConv_h = I`` (the √2-normalized MODWT filter bank).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..wavelets.base import DiscreteWavelet
from .modwt import MAX_DECOMPOSITION_LEVEL, _conv_channels, modwt_base_filters

__all__ = ["modwt2", "imodwt2", "modwt2_mra"]


def _conv_last(x, f, d, adjoint):
    """Dilated circular conv with one filter along the last axis."""
    return _conv_channels(x, (f,), d, adjoint)[..., 0, :]


def _conv_cols(x, f, d, adjoint):
    """Same along the second-to-last axis."""
    xt = jnp.swapaxes(x, -1, -2)
    return jnp.swapaxes(_conv_last(xt, f, d, adjoint), -1, -2)


def _check_2d(r, c, level):
    if level < 1 or level > MAX_DECOMPOSITION_LEVEL:
        raise ValueError(f"level must be in [1, {MAX_DECOMPOSITION_LEVEL}]")
    theo = min(r.bit_length(), c.bit_length()) - 1
    if level > theo:
        raise ValueError(f"level {level} exceeds theoretical limit {theo} "
                         f"for shape ({r}, {c})")


def modwt2(x: jax.Array, wavelet: DiscreteWavelet, level: int) -> jax.Array:
    """Forward 2D MODWT over the last two axes (any sizes)."""
    x = jnp.asarray(x)
    if jnp.issubdtype(x.dtype, jnp.integer):
        x = x.astype(jnp.float32)
    _check_2d(x.shape[-2], x.shape[-1], level)
    g64, h64 = modwt_base_filters(wavelet)
    g = jnp.asarray(g64, dtype=x.dtype)
    h = jnp.asarray(h64, dtype=x.dtype)
    rows = []
    ll = x
    for j in range(1, level + 1):
        d = 1 << (j - 1)
        rl = _conv_last(ll, g, d, False)   # row pass (last axis)
        rh = _conv_last(ll, h, d, False)
        lh = _conv_cols(rl, h, d, False)   # row-low · col-high
        hl = _conv_cols(rh, g, d, False)
        hh = _conv_cols(rh, h, d, False)
        ll = _conv_cols(rl, g, d, False)
        rows.extend([lh, hl, hh])
    rows.append(ll)
    return jnp.stack(rows, axis=0)


def imodwt2(coeffs: jax.Array, wavelet: DiscreteWavelet) -> jax.Array:
    """Inverse 2D MODWT: ``(3·level+1, ..., R, C)`` → ``(..., R, C)``."""
    coeffs = jnp.asarray(coeffs)
    level = (coeffs.shape[0] - 1) // 3
    g64, h64 = modwt_base_filters(wavelet)
    g = jnp.asarray(g64, dtype=coeffs.dtype)
    h = jnp.asarray(h64, dtype=coeffs.dtype)
    ll = coeffs[3 * level]
    for j in range(level, 0, -1):
        d = 1 << (j - 1)
        lh = coeffs[3 * (j - 1)]
        hl = coeffs[3 * (j - 1) + 1]
        hh = coeffs[3 * (j - 1) + 2]

        rl = _conv_cols(ll, g, d, True) + _conv_cols(lh, h, d, True)
        rh = _conv_cols(hl, g, d, True) + _conv_cols(hh, h, d, True)
        ll = _conv_last(rl, g, d, True) + _conv_last(rh, h, d, True)
    return ll


def modwt2_mra(x: jax.Array, wavelet: DiscreteWavelet, level: int) -> jax.Array:
    """Additive 2D MRA: per-band components summing to the image."""
    c = modwt2(x, wavelet, level)
    comps = []
    zeros = jnp.zeros_like(c)
    for i in range(c.shape[0]):
        comps.append(imodwt2(zeros.at[i].set(c[i]), wavelet))
    return jnp.stack(comps, axis=0)
