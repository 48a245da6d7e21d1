"""Wavelet denoising: soft/hard thresholding + MODWT denoise pipeline.

The reference demonstrates MODWT soft-threshold denoising in
``jwave/examples/MODWTExample.java:125-172`` (universal threshold
σ·√(2·ln N) with σ estimated from level-1 detail coefficients via
MAD/0.6745, soft-shrink details, keep approximation, inverse).  Implemented
here as library functions that jit and batch.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from ..wavelets.base import DiscreteWavelet
from .modwt import imodwt, modwt

__all__ = [
    "soft_threshold", "hard_threshold", "universal_threshold",
    "mad_sigma", "modwt_denoise", "modwt_denoise_inplace",
]


def soft_threshold(c: jax.Array, t) -> jax.Array:
    """sign(c)·max(|c|−t, 0)."""
    c = jnp.asarray(c)
    return jnp.sign(c) * jnp.maximum(jnp.abs(c) - t, 0.0)


def hard_threshold(c: jax.Array, t) -> jax.Array:
    """c·1[|c|>t]."""
    c = jnp.asarray(c)
    return jnp.where(jnp.abs(c) > t, c, 0.0).astype(c.dtype)


def mad_sigma(d: jax.Array, axis=-1) -> jax.Array:
    """Robust noise estimate σ = median(|d|)/0.6745."""
    return jnp.median(jnp.abs(d), axis=axis) / 0.6745


def universal_threshold(d: jax.Array, n: int | None = None, axis=-1) -> jax.Array:
    """Donoho–Johnstone universal threshold σ·√(2·ln N)."""
    if n is None:
        n = d.shape[axis]
    return mad_sigma(d, axis=axis) * math.sqrt(2.0 * math.log(n))


def modwt_denoise(x: jax.Array, wavelet: DiscreteWavelet, level: int,
                  mode: str = "soft", method: str = "auto",
                  threshold=None) -> jax.Array:
    """Denoise via MODWT: shrink detail rows, keep approximation, invert.

    Matches the pipeline of ``MODWTExample.java:125-172``.  ``threshold``
    defaults to the universal threshold estimated from the level-1 details.

    ``method='fused'`` runs the whole forward→shrink→inverse chain as ONE
    Pallas kernel (kernels/denoise_pallas.py): the coefficients never touch
    HBM, cutting traffic from 2(L+2) to ~2 passes.  The default threshold
    then costs one extra single-level pass (the universal threshold's
    median is a global statistic and cannot live inside a tiled kernel).
    """
    if method == "fused":
        from ..kernels.denoise_pallas import modwt_denoise_fused

        xf = jnp.asarray(x)
        squeeze = xf.ndim == 1
        if squeeze:
            xf = xf[None, :]
        if xf.ndim != 2:
            raise ValueError("method='fused' supports (N,) or (B, N) input")
        if threshold is None:
            w1 = modwt(xf, wavelet, 1, "direct")[0]
            threshold = universal_threshold(w1, xf.shape[-1])
        thr = jnp.broadcast_to(jnp.asarray(threshold, jnp.float32),
                               (xf.shape[0],))
        out = modwt_denoise_fused(xf, thr, wavelet, level, mode)
        return out[0] if squeeze else out
    c = modwt(x, wavelet, level, method)
    n = x.shape[-1]
    if threshold is None:
        threshold = universal_threshold(c[0], n)[..., None]
    shrink = soft_threshold if mode == "soft" else hard_threshold
    details = shrink(c[:level], threshold)
    c = jnp.concatenate([details, c[level:]], axis=0)
    return imodwt(c, wavelet, method)


@functools.partial(jax.jit, donate_argnums=0,
                   static_argnames=("wavelet", "level", "mode", "method"))
def modwt_denoise_inplace(x: jax.Array, wavelet: DiscreteWavelet, level: int,
                          mode: str = "soft", method: str = "auto"
                          ) -> jax.Array:
    """:func:`modwt_denoise` with the input buffer donated.

    This is the TPU-native replacement for the reference's in-place/pooled
    tier (``InPlaceFastWaveletTransform.java:70-100``,
    ``utils/ArrayBufferPool.java:24-256``): ``donate_argnums=0`` lets XLA
    alias the reconstruction onto the input signal's HBM buffer, so the
    whole denoise roundtrip allocates no second signal-sized output — the
    same zero-copy guarantee the reference's buffer pool chases, provided by
    the compiler.  The caller's ``x`` is consumed (deleted) by the call;
    tests/test_donation.py asserts the input→output aliasing on the compiled
    executable.
    """
    return modwt_denoise(x, wavelet, level, mode=mode, method=method)
