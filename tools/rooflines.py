#!/usr/bin/env python3
"""Empirical rooflines for scattering2d and matching pursuit (VERDICT r3 #6).

Approach (the SSQ-note methodology, docs/PERFORMANCE.md): decompose each
pipeline into its structural stages, measure each stage with the same
chained-median timing bench.py uses, and compare against an *executable*
ceiling — a pure XLA batched FFT (or fused-MODWPT pass) of the identical
sample volume — rather than a theoretical FLOP count that XLA's FFT
implementation never reaches anyway.  Prints a table; paste the numbers
into docs/PERFORMANCE.md.

Run on the TPU:  python tools/rooflines.py
"""
from __future__ import annotations

import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

import jax.numpy as jnp  # noqa: E402

import jwave_pro_tpu as jw  # noqa: E402
from jwave_pro_tpu.utils.profiling import time_chain  # noqa: E402


def _t(step, x):
    """Seconds per step (chained median)."""
    return time_chain(step, x)


def scattering2d_roofline(batch=4, n=256, j=4, l=8):
    """Stage decomposition + same-volume FFT ceiling for the 2D cascade."""
    from jwave_pro_tpu.ops.scattering2d import (
        _octave_decimations, scattering2d, scattering2d_filters,
    )

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, n, n)), jnp.float32)
    px = batch * n * n

    def full(v):
        r = scattering2d(v, j=j, l=l)
        mix = jnp.sum(r.s1, axis=-3) + jnp.sum(r.s2, axis=-3) + r.s0
        return v + 1e-30 * jnp.repeat(jnp.repeat(mix, 1 << j, -2), 1 << j, -1)

    def order1(v):
        r = scattering2d(v, j=j, l=l, order=1)
        mix = jnp.sum(r.s1, axis=-3) + r.s0
        return v + 1e-30 * jnp.repeat(jnp.repeat(mix, 1 << j, -2), 1 << j, -1)

    t_full = _t(full, x)
    t_o1 = _t(order1, x)

    # --- same-sample-volume pure-FFT ceiling --------------------------
    # Count the complex 2D-FFT sample volume the cascade actually runs
    # (each path: 1 ifft2 at its decimated grid + 1 fft2 of the modulus +
    # the final short ifft2 of the low-pass; first order from the full-res
    # fft2 of x).
    d_oct = _octave_decimations(j, 1 << j, 0)
    vol = batch * n * n  # the one full-res fft2 of x
    p1 = 0
    for j1 in range(j):
        d = int(d_oct[j1])
        loc = batch * (n // d) * (n // d)
        vol += l * (2 * loc + batch * ((1 << j) // d) ** 2)
        p1 += l
    p2 = 0
    for j1 in range(j):
        d = int(d_oct[j1])
        for j2 in range(j1 + 1, j):
            dd = int(d_oct[j2])
            loc = batch * (n // dd) * (n // dd)
            p2 += l * l
            vol += l * l * (2 * loc + batch * ((1 << j) // dd) ** 2)

    vols = jnp.asarray(rng.standard_normal((max(vol // (n * n), 1), n, n)),
                       jnp.float32)

    # time ONE batched complex ifft2 with ≈ the cascade's total volume
    # (real carry — complex scalars can't be fetched through the tunnel —
    # so the step casts to c64 first; that extra pass makes the ceiling
    # slightly conservative)
    t_fft = _t(lambda v: jnp.fft.ifft2(v.astype(jnp.complex64),
                                       axes=(-2, -1)).real
               + 1e-30 * jnp.fft.ifft2(v.astype(jnp.complex64),
                                       axes=(-2, -1)).imag,
               vols)

    print(f"scattering2d (B={batch}, {n}², j={j}, l={l}): "
          f"{p1} L1 + {p2} L2 paths")
    print(f"  full order-2 step      {t_full*1e3:8.2f} ms  "
          f"({px/t_full/1e9:.4f} G px/s)")
    print(f"  order-1 only           {t_o1*1e3:8.2f} ms")
    print(f"  order-2 increment      {(t_full-t_o1)*1e3:8.2f} ms")
    print(f"  FFT sample volume      {vol/1e6:8.1f} M complex samples")
    print(f"  same-volume pure ifft2 {t_fft*1e3:8.2f} ms "
          f"→ cascade at {100*t_fft/t_full:.0f}% of the pure-FFT ceiling")
    return t_full, t_fft


def mp_roofline(batch=8, n=65536, level=3, k=16):
    """Per-pick decomposition: correlation pass vs argmax vs subtraction."""
    rng = np.random.default_rng(0)
    w = jw.wavelet("Daubechies 4")
    x = jnp.asarray(rng.standard_normal((batch, n)), jnp.float32)

    def full(v):
        r = jw.matching_pursuit(v, w, level, k)
        return r.residual + 1e-30 * jnp.sum(r.amps, -1, keepdims=True)

    t_full = _t(full, x)

    # correlation ceiling: k fused-MODWPT passes of the same shape
    def corr_only(v):
        def body(u, _):
            c = jw.modwpt(u, w, level)
            return u + 1e-30 * jnp.sum(c, axis=0), None
        out, _ = jax.lax.scan(body, v, None, length=k)
        return out

    t_corr = _t(corr_only, x)

    # one-pick pipeline (transform + argmax + subtraction), k=1
    def one_pick(v):
        r = jw.matching_pursuit(v, w, level, 1)
        return r.residual + 1e-30 * jnp.sum(r.amps, -1, keepdims=True)

    t_one = _t(one_pick, x)

    print(f"matching pursuit (B={batch}, N={n}, L={level}, K={k}):")
    print(f"  full K-pick step       {t_full*1e3:8.2f} ms  "
          f"({batch*n/t_full/1e9:.4f} G inputs/s)")
    print(f"  K bare modwpt passes   {t_corr*1e3:8.2f} ms "
          f"→ correlations are {100*t_corr/t_full:.0f}% of the step")
    print(f"  one full pick          {t_one*1e3:8.2f} ms "
          f"(k× ≈ {k*t_one*1e3:.2f})")
    print(f"  argmax+subtract/pick   {(t_full - t_corr)/k*1e3:8.3f} ms")
    return t_full, t_corr


def dtcwt_roundtrip_ceiling(batch=32, n=1 << 20, level=5):
    """Exact executable ceiling for the DTCWT roundtrip (VERDICT r3 #5).

    The dual tree IS two orthonormal FWT roundtrips plus offset rolls, the
    final average, and the complex combine/split — so the honest ceiling
    is exactly that, minus the complex/q-shift parts: two real Symlet-8
    FWT roundtrips + rolls + average.  Prints both times and the ratio
    (docs/PERFORMANCE.md quotes ~91%).
    """
    from jwave_pro_tpu.ops.fwt import fwt, ifwt

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, n)), jnp.float32)
    w8 = jw.wavelet("Symlet 8")

    def two_tree_real(v):
        ca = ifwt(fwt(v, w8, level=level), w8, level=level)
        vb = jnp.roll(v, -1, axis=-1)
        cb = ifwt(fwt(vb, w8, level=level), w8, level=level)
        return 0.5 * (ca + jnp.roll(cb, 1, axis=-1))

    t_ceil = _t(two_tree_real, x)
    t_full = _t(lambda v: jw.idtcwt(jw.dtcwt(v, level)), x)
    print(f"dtcwt roundtrip (B={batch}, N=2^{n.bit_length() - 1}, L={level}):")
    print(f"  idtcwt(dtcwt(x))       {t_full*1e3:8.2f} ms "
          f"({batch*n/t_full/1e9:.2f} G)")
    print(f"  2-tree real ceiling    {t_ceil*1e3:8.2f} ms "
          f"→ dual tree at {100*t_ceil/t_full:.0f}% of its own ceiling")
    return t_full, t_ceil


if __name__ == "__main__":
    print(f"backend: {jax.devices()[0].platform}")
    scattering2d_roofline()
    mp_roofline()
    dtcwt_roundtrip_ceiling()
