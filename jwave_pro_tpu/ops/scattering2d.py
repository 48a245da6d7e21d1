"""2D wavelet scattering transform — TPU-native batched-FFT formulation.

The image analog of ``ops/scattering.py`` (Bruna & Mallat 2013): cascade
oriented complex Morlet convolutions and modulus nonlinearities, then
low-pass average every path:

    S0          =  x ⋆ φ_J                                  ↓ 2^J
    S1[j₁,θ₁]   = |x ⋆ ψ_{j₁,θ₁}| ⋆ φ_J                     ↓ 2^J
    S2[j₁,θ₁,j₂,θ₂] = ||x ⋆ ψ_{j₁,θ₁}| ⋆ ψ_{j₂,θ₂}| ⋆ φ_J   ↓ 2^J   (j₂ > j₁)

a translation-invariant (up to 2^J), deformation-stable image descriptor —
the standard wavelet feature extractor for texture/medical/satellite
classification.  The reference framework has no scattering tier (its CWT,
``ContinuousWaveletTransform.java``, is 1D-only); this composes the same
one-FFT-many-multiplier machinery as ``ops/cwt2d.py`` two layers deep.

TPU-first design, mirroring the 1D tier:

* the (scale × angle) path axis is a pure FFT *batch* axis — one batched
  complex multiply + one batched ifft2 per order, no per-filter loops;
* second-order paths are gathered with a static index table
  (frequency-decreasing j₂ > j₁ only, the energy-carrying paths), so all
  shapes are fixed under jit;
* low-pass + ↓2^J runs spectrally: fold the spectrum along each axis
  (reshape-mean — the 2D analog of the 1D fold; no lane-strided slicing)
  then a small inverse FFT on the (h/T, w/T) grid;
* filters are host-precomputed float64 constants (cached per shape), like
  the 1D Gabor bank and the discrete tap tables.

Filters: oriented 2D Morlets ψ̂(k) = g_Σ(k − ξ e_θ) − β·g_Σ(k) (exactly
zero mean) with per-octave dilation a = 2^j, radial center ξ_j = 3π/4·2^
{-j}, elliptic envelope (``slant`` × narrower across the oscillation) for
angular selectivity, L angles over [0, π); Gaussian low-pass φ̂_J at width
2^J.  All atoms are periodized on the DFT grid (3×3 period wrap) and the
ψ bank is Littlewood–Paley-renormalized against |φ̂|² so every layer — and
hence the whole cascade — is nonexpansive: ‖S(x) − S(y)‖ ≤ ‖x − y‖.
"""
from __future__ import annotations

import functools
import math
import typing

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["Scattering2DResult", "scattering2d", "scattering2d_filters"]


class Scattering2DResult(typing.NamedTuple):
    """2D scattering coefficients; arrays share the leading batch dims.

    ``s0``: (..., H/T, W/T) — low-passed image (order 0).
    ``s1``: (..., J·L, H/T, W/T) — first-order paths, index = j₁·L + θ₁.
    ``s2``: (..., P, H/T, W/T) — second-order paths, or None if order < 2.
    ``meta1``: (J·L, 2) numpy — (j₁, θ₁ index) per first-order path.
    ``pairs``: (P, 3) numpy — (first-order path index, j₂, θ₂ index).
    """

    s0: jax.Array
    s1: jax.Array
    s2: jax.Array | None
    meta1: np.ndarray
    pairs: np.ndarray

    def stack(self) -> jax.Array:
        """All coefficients on one path axis: (..., 1+J·L+P, H/T, W/T)."""
        parts = [self.s0[..., None, :, :], self.s1]
        if self.s2 is not None:
            parts.append(self.s2)
        return jnp.concatenate(parts, axis=-3)


XI0 = 3.0 * math.pi / 4.0   # radial center frequency at scale j = 0 (rad)
SIGMA0 = 0.8                # spatial envelope width at scale j = 0


def _periodized_gaussian2(ky, kx, cy, cx, sy, sx):
    """Σ over a 3×3 period wrap of exp(−(σ_y²(k_y−c_y)² + σ_x²(k_x−c_x)²)/2)
    on the (ky, kx) grid — (len(ky), len(kx)) float64."""
    out = np.zeros((ky.size, kx.size))
    for p in (-1.0, 0.0, 1.0):
        dy = ky[:, None] + 2.0 * math.pi * p - cy
        ey = np.exp(-0.5 * (sy * dy) ** 2)
        for q in (-1.0, 0.0, 1.0):
            dx = kx[None, :] + 2.0 * math.pi * q - cx
            out += ey * np.exp(-0.5 * (sx * dx) ** 2)
    return out


def _morlet2d_hat(h, w, j, theta, slant):
    """ψ̂_{j,θ} on the (h, w) DFT grid: rotated elliptic Gaussian at radial
    frequency ξ_j minus the DC-cancelling β·(centered copy)."""
    ky = 2.0 * math.pi * np.fft.fftfreq(h)
    kx = 2.0 * math.pi * np.fft.fftfreq(w)
    xi = XI0 / (1 << j)
    sigma = SIGMA0 * (1 << j)
    # rotate the GRID by −θ instead of the center/covariance by θ
    c, s = math.cos(theta), math.sin(theta)
    kpar = c * ky[:, None] + s * kx[None, :]
    kperp = -s * ky[:, None] + c * kx[None, :]
    # periodize in the rotated frame via the unrotated-wrap approximation:
    # evaluate on the rotated grid, wrapping each axis of the ORIGINAL grid
    out = np.zeros((h, w))
    ctr = np.zeros((h, w))
    for p in (-1.0, 0.0, 1.0):
        for q in (-1.0, 0.0, 1.0):
            ppar = kpar + 2.0 * math.pi * (p * c + q * s)
            pperp = kperp + 2.0 * math.pi * (-p * s + q * c)
            env = np.exp(-0.5 * ((sigma * (ppar - xi)) ** 2
                                 + (sigma / slant * pperp) ** 2))
            cen = np.exp(-0.5 * ((sigma * ppar) ** 2
                                 + (sigma / slant * pperp) ** 2))
            out += env
            ctr += cen
    # β from the PERIODIZED sums (k = 0 is grid index [0, 0]): the wrap
    # shifts both values for frequency-wide (j = 0) atoms, and only the
    # periodized ratio makes ψ̂(0) exactly zero
    beta = out[0, 0] / ctr[0, 0]
    return out - beta * ctr


@functools.lru_cache(maxsize=8)
def scattering2d_filters(h: int, w: int, j: int, l: int,
                         slant: float = 0.5):
    """Build the frequency-domain 2D bank for an (h, w) image.

    Returns ``(psi (J·L, h, w), phi (h, w), meta1 (J·L, 2))`` float64
    numpy; ψ row order is j-major (path index = j₁·L + θ₁), angles
    θ = π·t/L for t = 0..L−1.  The ψ bank is scaled by the largest c with
    ``|φ̂|² + c/2·Σ(|ψ̂(k)|² + |ψ̂(−k)|²) ≤ 1`` (the real-input
    Littlewood–Paley bound — a real image's energy at k and −k both land
    in the same |x ⋆ ψ| path).
    """
    if j < 1:
        raise ValueError("need at least one octave (j >= 1)")
    if l < 1:
        raise ValueError("need at least one angle (l >= 1)")
    psi = np.stack([_morlet2d_hat(h, w, jj, math.pi * t / l, slant)
                    for jj in range(j) for t in range(l)])
    ky = 2.0 * math.pi * np.fft.fftfreq(h)
    kx = 2.0 * math.pi * np.fft.fftfreq(w)
    sig_phi = SIGMA0 * (1 << j)
    phi = _periodized_gaussian2(ky, kx, 0.0, 0.0, sig_phi, sig_phi)
    phi /= phi.max()
    # ψ̂(−k) on the DFT grid = reversed-and-rolled rows (real ψ̂ here)
    neg = np.roll(psi[:, ::-1, ::-1], (1, 1), axis=(-2, -1))
    lp = 0.5 * (psi ** 2 + neg ** 2).sum(axis=0)
    mask = lp > 1e-10
    c = float(np.min(np.maximum(1.0 - phi[mask] ** 2, 0.0) / lp[mask]))
    psi *= math.sqrt(min(c, 1.0))
    meta1 = np.stack(np.divmod(np.arange(j * l), l), axis=-1)
    return psi, phi, meta1


@functools.lru_cache(maxsize=8)
def _pair_table2d(j: int, l: int):
    """Static path table for 2nd order: (i1, j2, t2) with j₂ > j₁(i1)."""
    rows = []
    for i1 in range(j * l):
        j1 = i1 // l
        for j2 in range(j1 + 1, j):
            for t2 in range(l):
                rows.append((i1, j2, t2))
    if not rows:
        return (np.zeros(0, np.int64),) * 3
    a = np.asarray(rows, dtype=np.int64)
    return a[:, 0], a[:, 1], a[:, 2]


def _lowpass_subsample2(yhat: jax.Array, phi: jax.Array, t: int) -> jax.Array:
    """ifft2(fold²(Ŷ·φ̂, T)) — low-pass then exact ↓T along both axes."""
    yhat = yhat * phi
    if t > 1:
        h, w = yhat.shape[-2], yhat.shape[-1]
        yhat = yhat.reshape(*yhat.shape[:-2], t, h // t, w).mean(axis=-3)
        yhat = yhat.reshape(*yhat.shape[:-1], t, w // t).mean(axis=-2)
    return jnp.fft.ifft2(yhat, axes=(-2, -1)).real


def scattering2d(x: jax.Array, j: int, l: int = 8, order: int = 2,
                 subsample: int | None = None,
                 slant: float = 0.5) -> Scattering2DResult:
    """Wavelet scattering of an image ``x`` (..., H, W): ``j`` octaves,
    ``l`` orientations over [0, π).

    ``subsample``: output stride T (defaults to 2^j, the averaging scale;
    pass 1 to keep full resolution).  H and W must be multiples of T.
    ``slant``: angular-selectivity eccentricity of the Morlet envelope
    (smaller = more orientation-selective).  Jits, batches over leading
    dims, and differentiates (modulus subgradient per JAX `abs`).
    """
    x = jnp.asarray(x)
    if jnp.issubdtype(x.dtype, jnp.complexfloating):
        raise ValueError("scattering2d expects a real image")
    if jnp.issubdtype(x.dtype, jnp.integer):
        x = x.astype(jnp.float32)
    if x.ndim < 2:
        raise ValueError("scattering2d needs at least a (H, W) image")
    h, w = x.shape[-2], x.shape[-1]
    t = (1 << j) if subsample is None else subsample
    if t < 1 or h % t or w % t:
        raise ValueError(f"subsample stride {t} must divide H={h} and W={w}")
    if order not in (1, 2):
        raise ValueError("order must be 1 or 2")
    psi_np, phi_np, meta1 = scattering2d_filters(h, w, j, l, slant)
    rdt = jnp.result_type(x.dtype, jnp.float32)
    psi = jnp.asarray(psi_np, dtype=rdt)
    phi = jnp.asarray(phi_np, dtype=rdt)

    xhat = jnp.fft.fft2(x, axes=(-2, -1))
    s0 = _lowpass_subsample2(xhat, phi, t)
    u1 = jnp.abs(jnp.fft.ifft2(xhat[..., None, :, :] * psi,
                               axes=(-2, -1)))        # (..., J·L, H, W)
    u1hat = jnp.fft.fft2(u1, axes=(-2, -1))
    s1 = _lowpass_subsample2(u1hat, phi, t)

    s2 = None
    i1, j2, t2 = _pair_table2d(j, l)
    if order == 2 and i1.size:
        psi2_sel = jnp.asarray(psi_np[j2 * l + t2], dtype=rdt)
        u2hat = jnp.take(u1hat, jnp.asarray(i1), axis=-3) * psi2_sel
        u2 = jnp.abs(jnp.fft.ifft2(u2hat, axes=(-2, -1)))
        s2 = _lowpass_subsample2(jnp.fft.fft2(u2, axes=(-2, -1)), phi, t)
    elif order == 2:
        s2 = jnp.zeros((*x.shape[:-2], 0, h // t, w // t), dtype=s1.dtype)

    pairs = (np.stack([i1, j2, t2], axis=-1) if i1.size
             else np.zeros((0, 3), dtype=np.int64))
    return Scattering2DResult(s0=s0, s1=s1, s2=s2, meta1=meta1, pairs=pairs)
