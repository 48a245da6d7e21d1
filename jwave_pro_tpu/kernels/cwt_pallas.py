"""Fused CWT Pallas kernel: ψ̂-multiply + inverse FFT in one pass (opt-in).

Why it exists: XLA's FFT op is a fusion boundary — the per-scale product
W = X·M must materialize to HBM and the inverse FFT runs as multiple
passes; the honest (DCE-proof) XLA CWT measures ~0.08 G input samples/s on
v5e (the scale axis is an FFT batch dim, so a benchmark consuming only 2
of 64 scales lets XLA eliminate the rest — that's where the r1 "0.51 G"
figure came from).  This kernel keeps the whole per-(batch, scale-block)
pipeline in VMEM: read the signal spectrum once per scale block, multiply
by the host-precomputed wavelet multipliers, run a two-stage Cooley–Tukey
inverse DFT as MXU matmuls, write only the final coefficients.

Measured verdict (v5e, B=16 S=64 P=4096): parity 2e-5 vs the XLA path, but
0.080 G inputs/s — a TIE with XLA for Morlet and a loss for real-ψ̂
wavelets (XLA single-irfft path: 0.153).  Mosaic's matmul precision menu is
the wall: DEFAULT (1-pass bf16) is hopeless for a length-P DFT, HIGHEST
(6-pass f32) caps the MXU at 33 TF, and the hand-rolled 3-pass bf16 split
below lands glue-bound (~8% MXU; splits/twiddles/transposes on (·,·,32)
vregs).  Kept as an opt-in (``cwt(..., method='fused')``) and as the
measured record of why the XLA formulation stands.

Math (P = padded length = P1·P2, k = ω1·P2 + ω2, t = t1 + P1·t2):

    c[t1 + P1·t2] = Σ_{ω2} E2[ω2,t2] · T[ω2,t1] · (Σ_{ω1} W[ω1,ω2]·E1[ω1,t1])

with E1[ω1,t1] = e^{2πi·ω1·t1/P1}, T[ω2,t1] = e^{2πi·ω2·t1/P},
E2[ω2,t2] = e^{2πi·ω2·t2/P2} (the 1/P normalization folded into E2).
Stage-1/stage-2 contractions are (P1×P1)/(P2×P2) matmuls over the scale
block — 4 real dots each (complex arithmetic on split planes; Mosaic has
no complex dtype).  Cost: (P1+P2)·4·2 real FLOPs per coefficient (= 1024
at P=4096) on the MXU at ``Precision.HIGHEST`` (Mosaic exposes only DEFAULT —
1-pass bf16, too lossy for a length-P DFT — and HIGHEST; tests pin 5e-4
absolute vs the f64 oracle).

The complex plane layout (re/im as separate f32 arrays) also gives bf16-
free HBM: inputs X (B,P)·2 planes, multipliers M (S,P)·2 planes (host
constants), outputs (B,S,P)·2 planes assembled to complex64 by the caller
(or returned real for real-ψ̂ wavelets, skipping half the writes).

Reference semantics: identical to ``transformFFT``
(``ContinuousWaveletTransform.java:183-229``); the multipliers come from
:func:`ops.cwt._omega_axis` conventions, so parity tests against the numpy
oracle hold at the f32 level.
"""
from __future__ import annotations

import functools
import math

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["cwt_fused_supported", "cwt_ifft_fused"]


def _factor_p(p: int):
    """Split pow-2 P into (P1, P2) matmul stages.

    P2 is the minor (lane) dim of every in-kernel array — prefer 128 so the
    vregs and the stage-2 matmul fill full 128-lane tiles; small P falls
    back to a square-ish split.  P ≤ 16384 keeps the (Sb, P1, P2) blocks
    within VMEM.
    """
    if p & (p - 1) or p < 64 or p > 16384:
        return None
    if p >= 1024:
        p2 = 128
        p1 = p // p2
    else:
        lg = p.bit_length() - 1
        p1 = 1 << ((lg + 1) // 2)
        p2 = p // p1
    if p2 < 8 or p1 < 8:
        return None
    return p1, p2


def cwt_fused_supported(batch: int, n_scales: int, p: int):
    """Return (scale_block, P1, P2) or None."""
    fac = _factor_p(p)
    if fac is None:
        return None
    for sb in (8, 4, 2, 1):
        if n_scales % sb == 0:
            return (sb, *fac)
    return None


@functools.lru_cache(maxsize=64)
def _dft_constants(p1: int, p2: int):
    """Host-side (E1r, E1i, Tr, Ti, E2r, E2i) float32 stage constants."""
    p = p1 * p2
    w1, t1 = np.meshgrid(np.arange(p1), np.arange(p1), indexing="ij")
    e1 = np.exp(2j * np.pi * w1 * t1 / p1)
    w2, t1b = np.meshgrid(np.arange(p2), np.arange(p1), indexing="ij")
    tw = np.exp(2j * np.pi * w2 * t1b / p)
    w2b, t2 = np.meshgrid(np.arange(p2), np.arange(p2), indexing="ij")
    e2 = np.exp(2j * np.pi * w2b * t2 / p2) / p  # fold in 1/P
    return tuple(np.asarray(a, np.float32) for a in
                 (e1.real, e1.imag, tw.real, tw.imag, e2.real, e2.imag))


def _kernel(xr, xi, mr, mi, e1r_ref, e1i_ref, twr_ref, twi_ref, e2r_ref,
            e2i_ref, out_r, out_i, *, p1, p2, sb):
    """One grid step: (batch row b, scale block s) → (Sb, P) coefficients."""
    from jax import lax

    e1r, e1i = e1r_ref[...], e1i_ref[...]
    twr, twi = twr_ref[...], twi_ref[...]
    e2r, e2i = e2r_ref[...], e2i_ref[...]

    # Mosaic exposes only DEFAULT (1-pass bf16 — hopeless for a length-P
    # DFT sum) and HIGHEST (6-pass f32 — measured 70%-of-ceiling but the
    # ceiling is 6× down).  Hand-roll the classic 3-pass split instead:
    # a = a_hi + a_lo with each half exactly representable in bf16, and
    # a·e ≈ a_hi·e_hi + a_hi·e_lo + a_lo·e_hi (the dropped lo·lo term is
    # ~2⁻¹⁶ relative; the f32 accumulator keeps the sum exact).  Error for
    # a K≤512 DFT ≈ √K·2⁻¹⁶ ≲ 3e-4 — the tests' 5e-4 bound.
    def _split(a):
        hi = a.astype(jnp.bfloat16)
        lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return hi, lo

    def dot3(a, e, dims):
        ahi, alo = _split(a)
        ehi, elo = _split(e)
        dg = functools.partial(lax.dot_general, dimension_numbers=dims,
                               preferred_element_type=jnp.float32)
        return dg(ahi, ehi) + dg(ahi, elo) + dg(alo, ehi)

    # W = X · M on the (ω1, ω2) grid — X block (1, P1, P2), M block (Sb, P1, P2)
    xr_b = xr[0]  # (P1, P2)
    xi_b = xi[0]
    wr = xr_b * mr[...] - xi_b * mi[...]   # (Sb, P1, P2)
    wi = xr_b * mi[...] + xi_b * mr[...]

    d1 = (((1,), (0,)), ((), ()))  # contract ω1: (Sb,ω1,ω2)×(ω1,t1)→(Sb,ω2,t1)
    zr = dot3(wr, e1r, d1) - dot3(wi, e1i, d1)
    zi = dot3(wr, e1i, d1) + dot3(wi, e1r, d1)

    # twiddle (ω2, t1) broadcast over the scale block
    zr, zi = zr * twr - zi * twi, zr * twi + zi * twr

    d2 = (((1,), (0,)), ((), ()))  # contract ω2: (Sb,ω2,t1)×(ω2,t2)→(Sb,t1,t2)
    cr = dot3(zr, e2r, d2) - dot3(zi, e2i, d2)
    ci = dot3(zr, e2i, d2) + dot3(zi, e2r, d2)

    # t = t1 + P1·t2 → store as (t2, t1); the caller's (B,S,P2,P1)→(B,S,P)
    # reshape is then a contiguous flatten (Mosaic cannot fuse the
    # transpose+reshape into one shape cast, so the flatten lives in XLA).
    out_r[0] = jnp.swapaxes(cr, -1, -2)
    out_i[0] = jnp.swapaxes(ci, -1, -2)


@functools.partial(jax.jit, static_argnames=("p1", "p2", "sb", "interpret"))
def cwt_ifft_fused(xr, xi, mr, mi, *, p1, p2, sb, interpret=None):
    """Fused multiply + inverse DFT.

    ``xr, xi``: full-spectrum signal planes (B, P); ``mr, mi``: multiplier
    planes (S, P) with M[s,k] = conj(√a_s·ψ̂(a_s·ω_k)).  Returns
    ``(re, im)`` planes of shape (B, S, P).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu  # noqa: F401

    b, p = xr.shape
    s = mr.shape[0]
    assert p == p1 * p2
    consts = _dft_constants(p1, p2)
    x3 = xr.reshape(b, p1, p2)
    y3 = xi.reshape(b, p1, p2)
    m3 = mr.reshape(s, p1, p2)
    n3 = mi.reshape(s, p1, p2)

    kernel = functools.partial(_kernel, p1=p1, p2=p2, sb=sb)
    interp = (jax.default_backend() != "tpu") if interpret is None \
        else interpret
    e1r, e1i, twr, twi, e2r, e2i = (jnp.asarray(c) for c in consts)
    out_r, out_i = pl.pallas_call(
        kernel,
        grid=(b, s // sb),
        in_specs=[
            pl.BlockSpec((1, p1, p2), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, p1, p2), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((sb, p1, p2), lambda i, j: (j, 0, 0)),
            pl.BlockSpec((sb, p1, p2), lambda i, j: (j, 0, 0)),
            pl.BlockSpec((p1, p1), lambda i, j: (0, 0)),
            pl.BlockSpec((p1, p1), lambda i, j: (0, 0)),
            pl.BlockSpec((p2, p1), lambda i, j: (0, 0)),
            pl.BlockSpec((p2, p1), lambda i, j: (0, 0)),
            pl.BlockSpec((p2, p2), lambda i, j: (0, 0)),
            pl.BlockSpec((p2, p2), lambda i, j: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, sb, p2, p1), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, sb, p2, p1), lambda i, j: (i, j, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, s, p2, p1), jnp.float32),
            jax.ShapeDtypeStruct((b, s, p2, p1), jnp.float32),
        ],
        interpret=interp,
    )(x3, y3, m3, n3, e1r, e1i, twr, twi, e2r, e2i)
    return out_r.reshape(b, s, p), out_i.reshape(b, s, p)
