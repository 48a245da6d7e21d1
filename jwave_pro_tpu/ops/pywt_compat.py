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

__all__ = ["dwt", "idwt", "dwt2", "idwt2", "dwt3", "idwt3",
           "wavedec", "waverec", "wavedec2", "waverec2",
           "wavedec3", "waverec3", "coeffs_to_flat", "flat_to_coeffs"]


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


def dwt2(x: jax.Array, wavelet: DiscreteWavelet):
    """Single-level 2D DWT: ``(..., R, C) → (cA, (cH, cV, cD))``.

    pywt semantics on the library's periodic boundary: cH = horizontal
    detail (wavelet along rows, scaling along cols — responds to horizontal
    edges), cV the transpose, cD diagonal.  Both R and C must be even.
    """
    from .wpt import _step2

    x = jnp.asarray(x)
    r, c = x.shape[-2], x.shape[-1]
    if r % 2 or c % 2:
        raise ValueError(f"dwt2 requires even image sides, got ({r}, {c})")
    y = _step2(x, wavelet, r, c)
    hr, hc = r // 2, c // 2
    ca = y[..., :hr, :hc]
    cv = y[..., :hr, hc:]   # scaling@rows · wavelet@cols → vertical edges
    ch = y[..., hr:, :hc]   # wavelet@rows · scaling@cols → horizontal edges
    cd = y[..., hr:, hc:]
    return ca, (ch, cv, cd)


def idwt2(ca: jax.Array, details, wavelet: DiscreteWavelet) -> jax.Array:
    """Inverse of :func:`dwt2`."""
    from .wpt import _synth2

    ch, cv, cd = details
    ca, ch, cv, cd = (jnp.asarray(a) for a in (ca, ch, cv, cd))
    for name, a in (("cH", ch), ("cV", cv), ("cD", cd)):
        if a.shape != ca.shape:
            raise ValueError(f"{name} shape {a.shape} != cA shape {ca.shape}")
    top = jnp.concatenate([ca, cv], axis=-1)
    bot = jnp.concatenate([ch, cd], axis=-1)
    y = jnp.concatenate([top, bot], axis=-2)
    return _synth2(y, wavelet, y.shape[-2], y.shape[-1])


def wavedec2(x: jax.Array, wavelet: DiscreteWavelet, level=None):
    """Multi-level 2D decomposition, Mallat convention (only cA recursed):
    ``[cA_L, (cH_L, cV_L, cD_L), ..., (cH_1, cV_1, cD_1)]``.

    This is pywt's octave-band image DWT — distinct from :func:`..fwt.fwt2`,
    which is the reference's rectangular rows-then-cols convention
    (``BasicTransform.java:361-399``).
    """
    x = jnp.asarray(x)
    r, c = x.shape[-2], x.shape[-1]
    if level is None:
        # default depth: halve while both sides stay even and at least as
        # wide as the wavelet's minimum transform length
        floor = max(2, wavelet.transform_wavelength)
        level = 0
        rr, cc = r, c
        while rr % 2 == 0 and cc % 2 == 0 and min(rr, cc) >= floor:
            level += 1
            rr //= 2
            cc //= 2
    level = int(level)
    if level < 1:
        raise ValueError("level must be >= 1")
    out = []
    ca = x
    for _ in range(level):
        ca, det = dwt2(ca, wavelet)
        out.append(det)
    out.append(ca)
    return list(reversed(out))


def waverec2(coeffs, wavelet: DiscreteWavelet) -> jax.Array:
    """Reconstruct from a :func:`wavedec2` coefficient list."""
    ca = jnp.asarray(coeffs[0])
    for det in coeffs[1:]:
        ca = idwt2(ca, det, wavelet)
    return ca


# ---------------------------------------------------------------------------
# 3D (pywt dwtn/wavedec3 convention; octant keys read (depth, row, col))
# ---------------------------------------------------------------------------

_DET3_KEYS = ("aad", "ada", "add", "daa", "dad", "dda", "ddd")


def _astep_axis(x: jax.Array, wavelet: DiscreteWavelet, axis: int,
                step=analysis_step) -> jax.Array:
    if axis == -1:
        return step(x, wavelet)
    return jnp.swapaxes(step(jnp.swapaxes(x, -1, axis), wavelet), -1, axis)


def dwt3(x: jax.Array, wavelet: DiscreteWavelet):
    """Single-level 3D DWT: ``(..., D, R, C) → (cAAA, {det octants})``.

    Separable tensor product of three :func:`analysis_step` passes (the 3D
    analog of the reference's generic dispatch, ``BasicTransform.java:
    509-566``, restricted to one level).  Detail octants are keyed by the
    pywt ``dwtn`` convention — three letters reading (depth, row, col),
    ``a`` = scaling half, ``d`` = wavelet half — matching the band-letter
    convention of :func:`..modwt2d.modwt3`.  All three trailing axes must
    be even.
    """
    x = jnp.asarray(x)
    d, r, c = x.shape[-3:]
    if d % 2 or r % 2 or c % 2:
        raise ValueError(
            f"dwt3 requires even volume sides, got ({d}, {r}, {c})")
    y = x
    for ax in (-1, -2, -3):
        y = _astep_axis(y, wavelet, ax)

    def octant(key: str) -> jax.Array:
        sl = []
        for letter, size in zip(key, (d, r, c)):
            half = size // 2
            sl.append(slice(0, half) if letter == "a" else slice(half, size))
        return y[..., sl[0], sl[1], sl[2]]

    details = {k: octant(k) for k in _DET3_KEYS}
    return octant("aaa"), details


def idwt3(caaa: jax.Array, details, wavelet: DiscreteWavelet) -> jax.Array:
    """Inverse of :func:`dwt3`: ``(cAAA, {7 octants}) → (..., D, R, C)``."""
    caaa = jnp.asarray(caaa)
    missing = [k for k in _DET3_KEYS if k not in details]
    if missing:
        raise ValueError(f"idwt3 missing detail octants: {missing}")
    octs = {"aaa": caaa}
    for k in _DET3_KEYS:
        a = jnp.asarray(details[k])
        if a.shape != caaa.shape:
            raise ValueError(
                f"octant {k!r} shape {a.shape} != cAAA shape {caaa.shape}")
        octs[k] = a
    # stitch octants back into the flat cube: concat col, then row, then depth
    def cat(prefix: str, axis: int) -> jax.Array:
        if len(prefix) == 3:
            return octs[prefix]
        return jnp.concatenate(
            [cat(prefix + "a", axis + 1), cat(prefix + "d", axis + 1)],
            axis=axis - 3)
    y = cat("", 0)
    for ax in (-3, -2, -1):
        y = _astep_axis(y, wavelet, ax, step=synthesis_step)
    return y


def wavedec3(x: jax.Array, wavelet: DiscreteWavelet, level=None):
    """Multi-level 3D decomposition, Mallat convention (only cAAA recursed):
    ``[cAAA_L, {dets_L}, ..., {dets_1}]`` (pywt ``wavedec3`` layout)."""
    x = jnp.asarray(x)
    if level is None:
        floor = max(2, wavelet.transform_wavelength)
        level = 0
        dims = list(x.shape[-3:])
        while all(s % 2 == 0 for s in dims) and min(dims) >= floor:
            level += 1
            dims = [s // 2 for s in dims]
    level = int(level)
    if level < 1:
        raise ValueError("level must be >= 1")
    out = []
    ca = x
    for _ in range(level):
        ca, det = dwt3(ca, wavelet)
        out.append(det)
    out.append(ca)
    return list(reversed(out))


def waverec3(coeffs, wavelet: DiscreteWavelet) -> jax.Array:
    """Reconstruct from a :func:`wavedec3` coefficient list."""
    ca = jnp.asarray(coeffs[0])
    for det in coeffs[1:]:
        ca = idwt3(ca, det, wavelet)
    return ca
