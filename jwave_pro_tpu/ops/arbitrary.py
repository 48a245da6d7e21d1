"""Arbitrary-length wrappers: Ancient Egyptian Decomposition + Shifting WT.

AED (``jwave/transforms/AncientEgyptianDecomposition.java:97-183``): split N
into decreasing powers of two (42 = 32 + 8 + 2, ``tools/MathToolKit.java:
57-101``), transform each contiguous block independently with any wrapped
transform, concatenate.  Block boundaries are static Python ints, so under
``jit`` the blocks are independent static-shape sub-programs (XLA runs them
in parallel — the loop is over *shapes*, not data).

SWT (``jwave/transforms/ShiftingWaveletTransform.java:43-139``): slide a
single filter-bank step of width div = 2, 4, 8, … across all complete blocks;
trailing odd sample passed through.  Faithful to the reference, including its
quirk that reverse is only an exact inverse for power-of-two lengths (the
reverse pass starts from an even width the forward never visited otherwise).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.validation import ancient_egyptian_decomposition
from ..wavelets.base import DiscreteWavelet
from .fwt import analysis_step, fwt, ifwt, synthesis_step

__all__ = ["aed_forward", "aed_inverse", "swt_forward", "swt_inverse"]


def aed_forward(x: jax.Array, wavelet: DiscreteWavelet, transform=None,
                level=None) -> jax.Array:
    """Forward transform of arbitrary-length signals via power-of-2 blocks.

    ``transform(block, wavelet, level)`` defaults to :func:`fwt`.
    """
    transform = transform or fwt
    x = jnp.asarray(x)
    out = []
    off = 0
    for block in ancient_egyptian_decomposition(x.shape[-1]):
        out.append(transform(x[..., off:off + block], wavelet, level))
        off += block
    return jnp.concatenate(out, axis=-1)


def aed_inverse(y: jax.Array, wavelet: DiscreteWavelet, transform=None,
                level=None) -> jax.Array:
    transform = transform or ifwt
    y = jnp.asarray(y)
    out = []
    off = 0
    for block in ancient_egyptian_decomposition(y.shape[-1]):
        out.append(transform(y[..., off:off + block], wavelet, level))
        off += block
    return jnp.concatenate(out, axis=-1)


def _swt_apply(x, wavelet, div, step):
    """Apply one width-``div`` step to all complete blocks of the last axis."""
    n = x.shape[-1]
    splits = n // div
    head_len = splits * div
    head = x[..., :head_len]
    blocks = head.reshape(x.shape[:-1] + (splits, div))
    blocks = step(blocks, wavelet)
    head = blocks.reshape(x.shape[:-1] + (head_len,))
    return jnp.concatenate([head, x[..., head_len:]], axis=-1) \
        if head_len < n else head


def swt_forward(x: jax.Array, wavelet: DiscreteWavelet) -> jax.Array:
    """ShiftingWaveletTransform.forward (``:43-84``)."""
    x = jnp.asarray(x)
    n = x.shape[-1]
    orig_last = x[..., n - 1]
    div = 2
    while div <= n:
        x = _swt_apply(x, wavelet, div, analysis_step)
        div *= 2
    if n % 2 == 1:
        x = x.at[..., n - 1].set(orig_last)
    return x


def swt_inverse(y: jax.Array, wavelet: DiscreteWavelet) -> jax.Array:
    """ShiftingWaveletTransform.reverse (``:93-139``)."""
    y = jnp.asarray(y)
    n = y.shape[-1]
    orig_last = y[..., n - 1]
    div = n if n % 2 == 0 else (n // 2) * 2
    while div >= 2:
        y = _swt_apply(y, wavelet, div, synthesis_step)
        div //= 2
    if n % 2 == 1:
        y = y.at[..., n - 1].set(orig_last)
    return y
