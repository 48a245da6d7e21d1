#!/usr/bin/env python3
"""MXU formulations of the MODWT level step — measurement harness.

VERDICT r2 weak #2 / next-round #1: the fused Pallas MODWT kernel is
VPU-bound (~9.6 G samples/s of an ~819 GB/s ⇒ ~29 G HBM floor).  The FWT
went 0.58 → 7.9 G by absorbing its step into banded block-circulant
constants on the MXU (``ops/fwt.py:_analysis_matrix``); this harness
measures the same trick applied to the à-trous MODWT step, in every
plausible shape, against the shipping kernel:

  E0  shipping fused Pallas kernel (VPU roll+FMA)     — baseline
  E1  per-level banded block-circulant matmuls        — y_i = x_i·Wc + x_{i-1}·Wp
  E2  all-levels composite-filter one-shot matmul     — 6 rows straight from x
  E3  hybrid: VPU rolls for levels 1–2, composite MXU matmul for 3–5
  each at Precision.HIGHEST (6-pass bf16 → exact f32) and HIGH (3-pass).

FLOP accounting (why a negative result is expected a priori): a dense
128-contraction computes an 8-tap band — 16× FLOP waste.  Per sample,
L=5 Db4: VPU cascade 160 FLOPs; E1 5,120; E2 6,144; E3-MXU-part 4,096.
At the measured ~33 TF f32-HIGHEST MXU rate (docs/PERFORMANCE.md CWT note)
E1 tops out at ~6.4 G, E2 ~5.4 G; HIGH doubles those but must keep the
1e-5 f32 parity bound to count.  The harness exists to pin those numbers
(and any surprise) on real hardware.

Usage:  timeout 580 python tools/modwt_mxu_experiments.py [--quick]
Prints one JSON line per experiment; parity = max-abs-err vs the f64-exact
direct path evaluated in f32.
"""
from __future__ import annotations

import argparse
import functools
import json
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jwave_pro_tpu as jw
from jwave_pro_tpu.ops.modwt import modwt_base_filters
from jwave_pro_tpu.utils.profiling import time_chain


# ---------------------------------------------------------------------------
# Constant-matrix builders (host numpy float64)
# ---------------------------------------------------------------------------

def _banded_level_mats(g, h, d, blk=128):
    """(Wc, Wp): y[i·blk+v] = Σ_k f[k]·x[i·blk+v−kd] as x_i@Wc + x_{i-1}@Wp.

    Columns 0..blk-1 carry the g (V) branch, blk..2blk-1 the h (W) branch.
    Requires reach (M−1)·d < blk.
    """
    m = len(g)
    assert (m - 1) * d < blk, "band exceeds one previous block"
    wc = np.zeros((blk, 2 * blk))
    wp = np.zeros((blk, 2 * blk))
    for v in range(blk):
        for k in range(m):
            r = v - k * d
            if r >= 0:
                wc[r, v] += g[k]
                wc[r, blk + v] += h[k]
            else:
                wp[blk + r, v] += g[k]
                wp[blk + r, blk + v] += h[k]
    return wc, wp


def _composite_filters(g, h, level):
    """Time-domain composite filters straight from x: rows W_1..W_L, V_L.

    W_j = h̃_j ⊛ g̃_{j-1} ⊛ … ⊛ g̃_1 with level-j filters = base upsampled
    by 2^(j-1) (never materialized levelwise in the fast paths; here the
    full composition IS the point).
    """
    def up(f, d):
        o = np.zeros((len(f) - 1) * d + 1)
        o[::d] = f
        return o

    rows = []
    acc = np.array([1.0])
    for j in range(1, level + 1):
        d = 1 << (j - 1)
        rows.append(np.convolve(acc, up(h, d)))
        acc = np.convolve(acc, up(g, d))
    rows.append(acc)
    return rows


def _composite_mats(filters, blk):
    """(Wc, Wp): all C=len(filters) channels from [x_{i-1} | x_i] blocks."""
    c = len(filters)
    wc = np.zeros((blk, c * blk))
    wp = np.zeros((blk, c * blk))
    for ci, f in enumerate(filters):
        assert len(f) - 1 < blk, f"composite reach {len(f)-1} ≥ blk {blk}"
        for v in range(blk):
            for k in range(len(f)):
                r = v - k
                if r >= 0:
                    wc[r, ci * blk + v] += f[k]
                else:
                    wp[blk + r, ci * blk + v] += f[k]
    return wc, wp


# ---------------------------------------------------------------------------
# Transforms under test
# ---------------------------------------------------------------------------

def modwt_mxu_banded(x, wavelet, level, precision, blk=128):
    """E1: each à-trous level = one pair of banded block-circulant matmuls."""
    g, h = modwt_base_filters(wavelet)
    n = x.shape[-1]
    lead = x.shape[:-1]
    kb = n // blk
    rows = []
    v = x
    for j in range(1, level + 1):
        d = 1 << (j - 1)
        wc, wp = _banded_level_mats(g, h, d, blk)
        wc = jnp.asarray(wc, dtype=x.dtype)
        wp = jnp.asarray(wp, dtype=x.dtype)
        xb = v.reshape(lead + (kb, blk))
        out = (jnp.einsum("...ku,uv->...kv", xb, wc,
                          preferred_element_type=x.dtype,
                          precision=precision)
               + jnp.einsum("...ku,uv->...kv", jnp.roll(xb, 1, axis=-2), wp,
                            preferred_element_type=x.dtype,
                            precision=precision))
        v = out[..., :blk].reshape(lead + (n,))
        rows.append(out[..., blk:].reshape(lead + (n,)))
    rows.append(v)
    return jnp.stack(rows, axis=0)


def modwt_mxu_composite(x, wavelet, level, precision, blk=256,
                        from_level=1, v_in=None):
    """E2/E3 core: rows ``from_level``..L (+V_L) via composite matmuls."""
    g, h = modwt_base_filters(wavelet)
    filters = _composite_filters(g, h, level)
    if from_level > 1:
        # composites are built from V_{from_level-1}: drop the leading
        # g̃_1..g̃_{from_level-1} factors by rebuilding with shifted dilation
        def up(f, d):
            o = np.zeros((len(f) - 1) * d + 1)
            o[::d] = f
            return o

        rows_f = []
        acc = np.array([1.0])
        for j in range(from_level, level + 1):
            d = 1 << (j - 1)
            rows_f.append(np.convolve(acc, up(h, d)))
            acc = np.convolve(acc, up(g, d))
        rows_f.append(acc)
        filters = rows_f
        x = v_in
    wc, wp = _composite_mats(filters, blk)
    wc = jnp.asarray(wc, dtype=x.dtype)
    wp = jnp.asarray(wp, dtype=x.dtype)
    n = x.shape[-1]
    lead = x.shape[:-1]
    kb = n // blk
    xb = x.reshape(lead + (kb, blk))
    out = (jnp.einsum("...ku,uv->...kv", xb, wc,
                      preferred_element_type=x.dtype, precision=precision)
           + jnp.einsum("...ku,uv->...kv", jnp.roll(xb, 1, axis=-2), wp,
                        preferred_element_type=x.dtype, precision=precision))
    c = len(filters)
    # (..., kb, c·blk) → (c, ..., n)
    out = out.reshape(lead + (kb, c, blk))
    out = jnp.moveaxis(out, -2, 0)
    return out.reshape((c,) + lead + (n,))


def modwt_hybrid(x, wavelet, level, precision, split=2, blk=256):
    """E3: levels 1..split on the VPU (rolls), split+1..L composite MXU."""
    from jwave_pro_tpu.ops.modwt import _conv_channels

    g64, h64 = modwt_base_filters(wavelet)
    g = jnp.asarray(g64, dtype=x.dtype)
    h = jnp.asarray(h64, dtype=x.dtype)
    rows = []
    v = x
    for j in range(1, split + 1):
        out = _conv_channels(v, (g, h), 1 << (j - 1), adjoint=False)
        rows.append(out[..., 1, :])
        v = out[..., 0, :]
    deep = modwt_mxu_composite(x, wavelet, level, precision, blk=blk,
                               from_level=split + 1, v_in=v)
    return jnp.stack(rows + list(deep), axis=0)


# ---------------------------------------------------------------------------
# Harness
# ---------------------------------------------------------------------------

def _bench(fn, x, level):
    def step(v):
        c = fn(v)
        return c[level] + 1e-30 * jnp.sum(c[:level], axis=0)

    return x.size / time_chain(step, x)


def _parity(fn, x_small, wavelet, level):
    want = np.asarray(jw.modwt(x_small.astype(jnp.float64)
                               if jax.config.jax_enable_x64 else x_small,
                               wavelet, level, method="direct"),
                      dtype=np.float64)
    got = np.asarray(fn(x_small), dtype=np.float64)
    scale = max(np.max(np.abs(want)), 1e-30)
    return float(np.max(np.abs(got - want)) / scale)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--n", type=int, default=1 << 20)
    ap.add_argument("--level", type=int, default=5)
    args = ap.parse_args()

    w = jw.wavelet("Daubechies 4")
    level = args.level
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (args.batch, args.n)), jnp.float32)
    xs = x[:2, :1 << 14]

    HI, HS = lax.Precision.HIGH, lax.Precision.HIGHEST

    runs = [
        ("E0_pallas", lambda v: jw.modwt(v, w, level, method="auto")),
        ("E1_banded_highest",
         lambda v: modwt_mxu_banded(v, w, level, HS)),
        ("E1_banded_high",
         lambda v: modwt_mxu_banded(v, w, level, HI)),
        ("E2_composite_highest",
         lambda v: modwt_mxu_composite(v, w, level, HS)),
        ("E2_composite_high",
         lambda v: modwt_mxu_composite(v, w, level, HI)),
        ("E3_hybrid_high",
         lambda v: modwt_hybrid(v, w, level, HI)),
    ]
    if args.quick:
        runs = runs[:3]

    for name, fn in runs:
        err = _parity(fn, xs, w, level)
        gsps = _bench(jax.jit(fn), x, level) / 1e9
        print(json.dumps({"exp": name, "gsamples_per_s": round(gsps, 3),
                          "rel_err_vs_direct": f"{err:.2e}"}), flush=True)


if __name__ == "__main__":
    main()
