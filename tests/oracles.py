"""Brute-force numpy oracles — independent re-statements of the transform math.

These deliberately use the slow, obviously-correct O(N·M) index formulas from
the reference's scalar loops (cited per function) so the fast TPU paths can be
validated against them without any JVM.
"""
from __future__ import annotations

import numpy as np


def fwt_step(x, dec_lo, dec_hi):
    """One analysis step: Wavelet.java:236-260."""
    h = len(x)
    m = len(dec_lo)
    out = np.zeros(h)
    for i in range(h // 2):
        for j in range(m):
            k = (2 * i + j) % h
            out[i] += x[k] * dec_lo[j]
            out[i + h // 2] += x[k] * dec_hi[j]
    return out


def ifwt_step(y, rec_lo, rec_hi, energy_correction=1.0):
    """One synthesis step: Wavelet.java:277-303 (+Haar1Orthogonal.java:196)."""
    h = len(y)
    m = len(rec_lo)
    out = np.zeros(h)
    for i in range(h // 2):
        for j in range(m):
            k = (2 * i + j) % h
            out[k] += energy_correction * (
                y[i] * rec_lo[j] + y[i + h // 2] * rec_hi[j]
            )
    return out


def fwt(x, w, level=None):
    """FastWaveletTransform.java:71-101."""
    x = np.asarray(x, dtype=np.float64).copy()
    n = len(x)
    if level is None:
        level = n.bit_length() - 1
    h = n
    lvl = 0
    while h >= max(w.transform_wavelength, 2) and lvl < level:
        x[:h] = fwt_step(x[:h], w.dec_lo, w.dec_hi)
        h //= 2
        lvl += 1
    return x


def ifwt(y, w, level=None):
    """FastWaveletTransform.java:119-153."""
    y = np.asarray(y, dtype=np.float64).copy()
    n = len(y)
    if level is None:
        level = n.bit_length() - 1
    widths = []
    h = n
    lvl = 0
    while h >= max(w.transform_wavelength, 2) and lvl < level:
        widths.append(h)
        h //= 2
        lvl += 1
    for h in reversed(widths):
        y[:h] = ifwt_step(y[:h], w.rec_lo, w.rec_hi, w.energy_correction)
    return y


def wpt(x, w, level=None):
    """WaveletPacketTransform.java:73-124."""
    x = np.asarray(x, dtype=np.float64).copy()
    n = len(x)
    if level is None:
        level = n.bit_length() - 1
    h = n
    lvl = 0
    while h >= max(w.transform_wavelength, 2) and lvl < level:
        for p in range(n // h):
            x[p * h:(p + 1) * h] = fwt_step(x[p * h:(p + 1) * h],
                                            w.dec_lo, w.dec_hi)
        h //= 2
        lvl += 1
    return x


def iwpt(y, w, level=None):
    """WaveletPacketTransform.java:141-189."""
    y = np.asarray(y, dtype=np.float64).copy()
    n = len(y)
    if level is None:
        level = n.bit_length() - 1
    widths = []
    h = n
    lvl = 0
    while h >= max(w.transform_wavelength, 2) and lvl < level:
        widths.append(h)
        h //= 2
        lvl += 1
    for h in reversed(widths):
        for p in range(n // h):
            y[p * h:(p + 1) * h] = ifwt_step(y[p * h:(p + 1) * h],
                                             w.rec_lo, w.rec_hi,
                                             w.energy_correction)
    return y


def modwt_filters(w):
    """MODWTTransform.initializeFilterCache (:452-484)."""
    def norm(f):
        f = np.asarray(f, dtype=np.float64)
        e = np.sqrt(np.sum(f * f))
        if e > 1e-12:
            f = f / e
        return f / np.sqrt(2.0)
    return norm(w.dec_lo), norm(w.dec_hi)


def upsample(f, level):
    """MODWTTransform.upsample (:618-630)."""
    if level <= 1:
        return np.asarray(f, dtype=np.float64)
    gap = (1 << (level - 1)) - 1
    out = np.zeros(len(f) + (len(f) - 1) * gap)
    out[::gap + 1] = f
    return out


def circular_convolve(x, f):
    """MODWTTransform.circularConvolve (:677-690)."""
    n, m = len(x), len(f)
    out = np.zeros(n)
    for i in range(n):
        for j in range(m):
            out[i] += x[(i - j) % n] * f[j]
    return out


def circular_convolve_adjoint(x, f):
    """MODWTTransform.circularConvolveAdjoint (:703-716)."""
    n, m = len(x), len(f)
    out = np.zeros(n)
    for i in range(n):
        for j in range(m):
            out[i] += x[(i + j) % n] * f[j]
    return out


def modwt(x, w, level):
    """MODWTTransform.forwardMODWT (:256-306)."""
    g, h = modwt_filters(w)
    v = np.asarray(x, dtype=np.float64).copy()
    rows = []
    for j in range(1, level + 1):
        gj, hj = upsample(g, j), upsample(h, j)
        rows.append(circular_convolve(v, hj))
        v = circular_convolve(v, gj)
    rows.append(v)
    return np.stack(rows)


def imodwt(coeffs, w):
    """MODWTTransform.inverseMODWT (:337-375)."""
    g, h = modwt_filters(w)
    level = coeffs.shape[0] - 1
    v = coeffs[level].copy()
    for j in range(level, 0, -1):
        gj, hj = upsample(g, j), upsample(h, j)
        v = (circular_convolve_adjoint(v, gj)
             + circular_convolve_adjoint(coeffs[j - 1], hj))
    return v
