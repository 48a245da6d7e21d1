"""Threshold compression of coefficient arrays.

Parity with ``jwave/compressions/``: keep coefficients with
``|c| ≥ magnitude·threshold``, zero the rest (``Compressor.java:95-180``).
One ``jnp.where`` each — shape-agnostic (1D/2D/3D and batched at once, where
the reference has three hand-written overloads per compressor).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "compress_magnitude", "compress_peaks_average", "compress_fixed",
    "compression_rate",
]


def compress_fixed(c: jax.Array, magnitude, threshold: float = 1.0) -> jax.Array:
    """Zero all |c| < magnitude·threshold (``Compressor.compress``)."""
    c = jnp.asarray(c)
    return jnp.where(jnp.abs(c) >= magnitude * threshold, c, 0.0).astype(c.dtype)


def compress_magnitude(c: jax.Array, threshold: float = 1.0) -> jax.Array:
    """Magnitude = mean(|c|) over the whole array
    (``CompressorMagnitude.java:73-134``)."""
    c = jnp.asarray(c)
    return compress_fixed(c, jnp.mean(jnp.abs(c)), threshold)


def compress_peaks_average(c: jax.Array, threshold: float = 1.0) -> jax.Array:
    """Magnitude = ½·(peakMax − peakMin) over |c|.

    Note the reference initializes its running minimum to 0 and only lowers
    it (``CompressorPeaksAverage.java:70-96``), so peakMin is always 0 and
    the magnitude is effectively ``max(|c|)/2`` — reproduced faithfully.
    """
    c = jnp.asarray(c)
    return compress_fixed(c, 0.5 * jnp.max(jnp.abs(c)), threshold)


def compression_rate(c: jax.Array) -> jax.Array:
    """Percentage of zeros (``Compressor.calcCompressionRate``, ``:182-204``)."""
    c = jnp.asarray(c)
    return 100.0 * jnp.mean((c == 0.0).astype(jnp.float64
                                              if c.dtype == jnp.float64
                                              else jnp.float32))
