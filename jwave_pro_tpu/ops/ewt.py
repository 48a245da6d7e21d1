"""Empirical Wavelet Transform — data-adaptive tight-frame band splitting.

The EWT (Gilles 2013, "Empirical Wavelet Transform", IEEE TSP 61(16))
builds a Meyer-type filter bank whose band edges ADAPT to the signal:
detect the K strongest spectral peaks, place boundaries between them, and
construct one empirical scaling function + K−1 empirical wavelets with
smooth Meyer transitions — a principled, invertible alternative to EMD
for multicomponent signals (machine-health, biomedical, geophysics).
Beyond the reference's scope (its spectral tier stops at the fixed-grid
CWT, ``ContinuousWaveletTransform.java``); extends the same
one-FFT-many-multipliers machinery (``:183-229``).

TPU-first formulation — everything is static-shaped and jit-compatible:

* peak detection is a fixed-K ``jax.lax.top_k`` over the local-max-masked
  half spectrum (no data-dependent shapes; K is static);
* the filter bank is built IN-GRAPH from the (traced) boundaries with the
  same ν(x) = x⁴(35−84x+70x²−20x³) transition polynomial as the Meyer
  wavelet (``wavelets/continuous.py``) — sin²+cos² complementarity at
  every boundary makes the bank a TIGHT frame (Σ_k f_k(ω)² = 1), so the
  inverse is the plain adjoint: one rfft per component, conj-multiply,
  one irfft — exact reconstruction, no deconvolution;
* the transform itself is the CWT pattern: one rfft + a (K, F) batched
  multiply + one batched irfft.  Per-batch-element boundaries broadcast —
  each signal in a batch gets its own adaptive bank.
"""
from __future__ import annotations

import math
import typing

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["EWTResult", "ewt1d", "iewt1d", "ewt_filter_bank"]


class EWTResult(typing.NamedTuple):
    """Empirical wavelet decomposition; leading dims follow the input.

    ``components``: (..., K, N) real — band-limited modes; the tight-frame
    adjoint (:func:`iewt1d` / :meth:`reconstruct`) recovers x exactly.
    ``filters``: (..., K, N//2+1) real — the adaptive tight-frame bank
    (row 0 is the empirical scaling function, rows 1..K−1 the wavelets).
    ``boundaries``: (..., K−1) — band edges in rad/sample ∈ (0, π).
    ``peaks``: (..., K) — detected spectral peak positions in rad/sample.
    """

    components: jax.Array
    filters: jax.Array
    boundaries: jax.Array
    peaks: jax.Array

    def reconstruct(self) -> jax.Array:
        """Invert (tight frame ⇒ exact): see :func:`iewt1d`."""
        return iewt1d(self.components, self.filters)


def _nu(x):
    """Meyer transition polynomial on [0, 1] (wavelets/continuous.py)."""
    x = jnp.clip(x, 0.0, 1.0)
    return x ** 4 * (35.0 + x * (-84.0 + x * (70.0 - 20.0 * x)))


def _rise(omega, b, gamma):
    """sin(π/2·ν(·)) roll-ON across [b(1−γ), b(1+γ)] — 0 below, 1 above."""
    return jnp.sin(0.5 * math.pi
                   * _nu((omega - (1.0 - gamma) * b)
                         / jnp.maximum(2.0 * gamma * b, 1e-12)))


def ewt_filter_bank(boundaries: jax.Array, n: int,
                    gamma: jax.Array | float | None = None) -> jax.Array:
    """Meyer-type tight-frame bank from band edges: (..., K−1) → (..., K, F).

    ``boundaries`` are rad/sample edges in (0, π), ascending along the last
    axis.  ``gamma`` is the half-width ratio of each transition; ``None``
    picks the largest tight-frame-valid value 0.9·min_k((b_{k+1}−b_k)/
    (b_{k+1}+b_k)) per batch element (Gilles' Prop. 1 bound).  Rows satisfy
    Σ_k f_k(ω)² = 1 for every ω (sin²+cos² complementarity at each edge),
    hence analysis followed by the adjoint reconstructs exactly.
    """
    b = jnp.asarray(boundaries, dtype=jnp.result_type(boundaries, 1.0))
    if b.shape[-1] < 1:
        raise ValueError("need at least one boundary (two bands)")
    ext = jnp.concatenate(
        [b, jnp.full(b.shape[:-1] + (1,), math.pi, b.dtype)], axis=-1)
    if gamma is None:
        lo = jnp.concatenate(
            [jnp.zeros(b.shape[:-1] + (1,), b.dtype), b], axis=-1)
        gamma = 0.9 * jnp.min((ext - lo) / (ext + lo), axis=-1)
    gamma = jnp.asarray(gamma)[..., None, None]          # (..., 1, 1)
    omega = jnp.asarray(
        2.0 * math.pi * np.arange(n // 2 + 1) / n, b.dtype)
    bb = ext[..., :, None]                               # (..., K, F) edges
    rise = _rise(omega, bb, gamma)
    # band k = roll-on at edge k−1 × roll-off (complement) at edge k;
    # the scaling function has no lower edge, the last wavelet's upper
    # edge is π where the bank ends flat (rise(π·(1±γ)) handled by clip)
    on = jnp.concatenate(
        [jnp.ones_like(rise[..., :1, :]), rise], axis=-2)[..., :-1, :]
    off = jnp.sqrt(jnp.clip(1.0 - rise * rise, 0.0, 1.0))
    off = jnp.concatenate(
        [off[..., :-1, :], jnp.ones_like(rise[..., :1, :])], axis=-2)
    return on * off


def _detect_boundaries(x: jax.Array, k: int):
    """Top-K local spectral maxima → midpoints between consecutive peaks.

    The 'localmax' rule of Gilles' toolbox with static shapes: the half
    spectrum's interior local maxima are masked, ``lax.top_k`` picks the K
    strongest, their (sorted) positions ω̂ give boundaries at the midpoints
    (ω̂_i + ω̂_{i+1})/2.  Returns (peaks (..., K), boundaries (..., K−1))
    in rad/sample.
    """
    n = x.shape[-1]
    mag = jnp.abs(jnp.fft.rfft(x))
    interior = mag[..., 1:-1]
    is_max = (interior > mag[..., :-2]) & (interior >= mag[..., 2:])
    cand = jnp.where(is_max, interior, -jnp.inf)
    _, idx = jax.lax.top_k(cand, k)                      # (..., K)
    idx = jnp.sort(idx, axis=-1) + 1                     # spectrum bins
    peaks = idx.astype(mag.dtype) * (2.0 * math.pi / n)
    mids = 0.5 * (peaks[..., :-1] + peaks[..., 1:])
    return peaks, mids


def ewt1d(x: jax.Array, n_modes: int,
          boundaries: jax.Array | None = None) -> EWTResult:
    """Empirical Wavelet Transform of real ``x`` (..., N) into ``n_modes``
    adaptive bands.

    ``boundaries``: optional explicit band edges (rad/sample, ascending,
    shape (..., n_modes−1)) — skips detection (e.g. to reuse a bank across
    signals or to hand-tune bands).  Jits (``n_modes`` static), batches
    over leading dims — each batch element gets its own adaptive bank —
    and differentiates.  Reconstruction is the tight-frame adjoint
    (Σ_k f_k² = 1): ``iewt1d(components, filters)`` recovers x exactly.
    """
    x = jnp.asarray(x)
    if jnp.issubdtype(x.dtype, jnp.integer):
        x = x.astype(jnp.float32)
    if jnp.issubdtype(x.dtype, jnp.complexfloating):
        raise ValueError("ewt1d expects a real signal")
    n = x.shape[-1]
    if n_modes < 2:
        raise ValueError("need at least 2 modes")
    if n_modes * 4 > n:
        raise ValueError(f"n_modes={n_modes} too large for N={n}")
    if boundaries is None:
        peaks, bounds = _detect_boundaries(x, n_modes)
    else:
        bounds = jnp.asarray(boundaries, jnp.result_type(x.dtype, 1.0))
        if bounds.shape[-1] != n_modes - 1:
            raise ValueError(
                f"expected {n_modes - 1} boundaries, got {bounds.shape[-1]}")
        peaks = jnp.zeros(bounds.shape[:-1] + (n_modes,), bounds.dtype)
    filters = ewt_filter_bank(bounds, n).astype(x.dtype)
    xf = jnp.fft.rfft(x)[..., None, :]
    comps = jnp.fft.irfft(xf * filters, n=n)
    return EWTResult(components=comps, filters=filters,
                     boundaries=bounds, peaks=peaks)


def iewt1d(components: jax.Array, filters: jax.Array) -> jax.Array:
    """Inverse EWT: ``(..., K, N), (..., K, F) → (..., N)``.

    The tight-frame adjoint — rfft each component, multiply by the SAME
    (real) filters, sum bands, irfft: exact because Σ_k f_k(ω)² = 1.
    """
    components = jnp.asarray(components)
    n = components.shape[-1]
    cf = jnp.fft.rfft(components)
    return jnp.fft.irfft(jnp.sum(cf * filters, axis=-2), n=n)
