"""2D/3D separable MODWT (undecimated wavelet transform for images/volumes).

Beyond the reference's scope (its MODWT is 1D-only, SURVEY §2.1) but the
natural TPU extension: per level j the à-trous filter pair runs along rows
then columns (then depth for 3D), producing full-resolution detail bands and
an approximation that feeds the next level — all batched convolutions.

Band-letter convention (consistent across 2D and 3D): letters read in the
same order as the printed shape — (row, col) for 2D, (depth, row, col) for
3D — with L applying the scaling filter g and H the wavelet filter h along
that axis.  ``modwt2`` returns ``(3·level+1, ..., R, C)``: rows
``3(j−1) .. 3(j−1)+2`` are (LH_j, HL_j, HH_j) — (g@rows·h@cols,
h@rows·g@cols, h@rows·h@cols) — and the last row is LL_J.
``modwt3`` returns ``(7·level+1, ..., D, R, C)``: rows ``7(j−1)..7(j−1)+6``
are the detail octants in increasing binary order of the letter string
(LLH, LHL, LHH, HLL, HLH, HHL, HHH), and the final row is LLL_J.
Perfect reconstruction follows per axis from the 1D identity
``Conv_gᵀConv_g + Conv_hᵀConv_h = I`` (the √2-normalized MODWT filter bank).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..wavelets.base import DiscreteWavelet
from .modwt import MAX_DECOMPOSITION_LEVEL, _conv_channels, modwt_base_filters

__all__ = ["modwt2", "imodwt2", "modwt2_mra", "modwt3", "imodwt3",
           "modwt3_mra"]


def _conv_last(x, f, d, adjoint):
    """Dilated circular conv with one filter along the last axis."""
    return _conv_channels(x, (f,), d, adjoint)[..., 0, :]


def _conv_cols(x, f, d, adjoint):
    """Same along the second-to-last axis."""
    xt = jnp.swapaxes(x, -1, -2)
    return jnp.swapaxes(_conv_last(xt, f, d, adjoint), -1, -2)


def _check_nd(dims, level):
    if level < 1 or level > MAX_DECOMPOSITION_LEVEL:
        raise ValueError(f"level must be in [1, {MAX_DECOMPOSITION_LEVEL}]")
    theo = min(d.bit_length() for d in dims) - 1
    if level > theo:
        raise ValueError(f"level {level} exceeds theoretical limit {theo} "
                         f"for shape {tuple(dims)}")


def modwt2(x: jax.Array, wavelet: DiscreteWavelet, level: int) -> jax.Array:
    """Forward 2D MODWT over the last two axes (any sizes)."""
    x = jnp.asarray(x)
    if jnp.issubdtype(x.dtype, jnp.integer):
        x = x.astype(jnp.float32)
    _check_nd(x.shape[-2:], level)
    g64, h64 = modwt_base_filters(wavelet)
    g = jnp.asarray(g64, dtype=x.dtype)
    h = jnp.asarray(h64, dtype=x.dtype)
    rows = []
    ll = x
    for j in range(1, level + 1):
        d = 1 << (j - 1)
        cl = _conv_last(ll, g, d, False)   # col pass (last axis)
        ch = _conv_last(ll, h, d, False)
        lh = _conv_cols(ch, g, d, False)   # row-low · col-high
        hl = _conv_cols(cl, h, d, False)   # row-high · col-low
        hh = _conv_cols(ch, h, d, False)
        ll = _conv_cols(cl, g, d, False)
        rows.extend([lh, hl, hh])
    rows.append(ll)
    return jnp.stack(rows, axis=0)


def imodwt2(coeffs: jax.Array, wavelet: DiscreteWavelet) -> jax.Array:
    """Inverse 2D MODWT: ``(3·level+1, ..., R, C)`` → ``(..., R, C)``."""
    coeffs = jnp.asarray(coeffs)
    if coeffs.shape[0] % 3 != 1:
        raise ValueError(
            f"2D MODWT coefficient stack must have 3·level+1 rows, got "
            f"{coeffs.shape[0]}")
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

        cl = _conv_cols(ll, g, d, True) + _conv_cols(hl, h, d, True)
        ch = _conv_cols(lh, g, d, True) + _conv_cols(hh, h, d, True)
        ll = _conv_last(cl, g, d, True) + _conv_last(ch, h, d, True)
    return ll


def modwt2_mra(x: jax.Array, wavelet: DiscreteWavelet, level: int) -> jax.Array:
    """Additive 2D MRA: per-band components summing to the image."""
    c = modwt2(x, wavelet, level)
    comps = []
    zeros = jnp.zeros_like(c)
    for i in range(c.shape[0]):
        comps.append(imodwt2(zeros.at[i].set(c[i]), wavelet))
    return jnp.stack(comps, axis=0)


def _conv_depth(x, f, d, adjoint):
    """Dilated circular conv along the third-to-last axis."""
    xt = jnp.swapaxes(x, -1, -3)
    return jnp.swapaxes(_conv_last(xt, f, d, adjoint), -1, -3)


def modwt3(x: jax.Array, wavelet: DiscreteWavelet, level: int) -> jax.Array:
    """Forward 3D MODWT over the last three axes (any sizes).

    Separable octant cascade — the undecimated analog of the reference's
    3D dispatch pattern (``BasicTransform.java:509-566``), with the à-trous
    level-j filters applied along cols, rows, then depth.
    """
    x = jnp.asarray(x)
    if jnp.issubdtype(x.dtype, jnp.integer):
        x = x.astype(jnp.float32)
    _check_nd(x.shape[-3:], level)
    g64, h64 = modwt_base_filters(wavelet)
    g = jnp.asarray(g64, dtype=x.dtype)
    h = jnp.asarray(h64, dtype=x.dtype)
    rows = []
    lll = x
    for j in range(1, level + 1):
        d = 1 << (j - 1)
        cl = _conv_last(lll, g, d, False)      # col pass (last axis)
        ch = _conv_last(lll, h, d, False)
        rll = _conv_cols(cl, g, d, False)      # row pass
        rlh = _conv_cols(ch, g, d, False)
        rhl = _conv_cols(cl, h, d, False)
        rhh = _conv_cols(ch, h, d, False)
        # depth pass: order (depth, row, col) = (b2, b1, b0) binary octants
        llh = _conv_depth(rlh, g, d, False)
        lhl = _conv_depth(rhl, g, d, False)
        lhh = _conv_depth(rhh, g, d, False)
        hll = _conv_depth(rll, h, d, False)
        hlh = _conv_depth(rlh, h, d, False)
        hhl = _conv_depth(rhl, h, d, False)
        hhh = _conv_depth(rhh, h, d, False)
        rows.extend([llh, lhl, lhh, hll, hlh, hhl, hhh])
        lll = _conv_depth(rll, g, d, False)
    rows.append(lll)
    return jnp.stack(rows, axis=0)


def imodwt3(coeffs: jax.Array, wavelet: DiscreteWavelet) -> jax.Array:
    """Inverse 3D MODWT: ``(7·level+1, ..., D, R, C)`` → ``(..., D, R, C)``."""
    coeffs = jnp.asarray(coeffs)
    if coeffs.shape[0] % 7 != 1:
        raise ValueError(
            f"3D MODWT coefficient stack must have 7·level+1 rows, got "
            f"{coeffs.shape[0]}")
    level = (coeffs.shape[0] - 1) // 7
    g64, h64 = modwt_base_filters(wavelet)
    g = jnp.asarray(g64, dtype=coeffs.dtype)
    h = jnp.asarray(h64, dtype=coeffs.dtype)
    lll = coeffs[7 * level]
    for j in range(level, 0, -1):
        d = 1 << (j - 1)
        llh, lhl, lhh, hll, hlh, hhl, hhh = (
            coeffs[7 * (j - 1) + k] for k in range(7))
        # undo depth pass per (row, col) quadrant
        rll = _conv_depth(lll, g, d, True) + _conv_depth(hll, h, d, True)
        rlh = _conv_depth(llh, g, d, True) + _conv_depth(hlh, h, d, True)
        rhl = _conv_depth(lhl, g, d, True) + _conv_depth(hhl, h, d, True)
        rhh = _conv_depth(lhh, g, d, True) + _conv_depth(hhh, h, d, True)
        # undo row pass per col band
        cl = _conv_cols(rll, g, d, True) + _conv_cols(rhl, h, d, True)
        ch = _conv_cols(rlh, g, d, True) + _conv_cols(rhh, h, d, True)
        # undo col pass
        lll = _conv_last(cl, g, d, True) + _conv_last(ch, h, d, True)
    return lll


def modwt3_mra(x: jax.Array, wavelet: DiscreteWavelet, level: int) -> jax.Array:
    """Additive 3D MRA: per-band components summing to the volume."""
    c = modwt3(x, wavelet, level)
    comps = []
    zeros = jnp.zeros_like(c)
    for i in range(c.shape[0]):
        comps.append(imodwt3(zeros.at[i].set(c[i]), wavelet))
    return jnp.stack(comps, axis=0)
