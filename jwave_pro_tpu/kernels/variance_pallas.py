"""Fused MODWT wavelet-variance Pallas kernel: one HBM pass per signal.

Wavelet variance (Percival–Walden; ops/analysis.py) needs only
``mean(W_j²)`` per level — never the coefficients themselves.  Computing it
as ``modwt`` + XLA mean costs (1 read + (L+1) writes) + (L+1) reads of
signal-sized rows; this kernel keeps the level chain in VMEM and emits only
a (level+1, rows, 128) partial-sum block, so HBM traffic is ~1 read of the
signal: a (2L+3)× traffic-floor advantage (L=5: measured vs the two-step
fused path in docs/PERFORMANCE.md).

Per grid step: the analysis chain of kernels/modwt_pallas._forward_kernel
(same revolving window DMAs + tile-major halo context), then each level's
squared valid lanes fold into a 128-lane partial accumulator.  The output
block's index map ignores the tile index j, so it stays resident in VMEM
and accumulates across the row's tiles (the standard Pallas reduction
pattern); the tiny (level+1, rows, 128) result is reduced to per-signal
means in XLA.

Semantics match ``mean(modwt(x)[j]²)`` exactly (tiles partition the lanes;
fold seams carry real circular context), up to f32 summation order.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from ..wavelets.base import DiscreteWavelet
from ..ops.modwt import _check_level, modwt_base_filters
from .modwt_pallas import (
    _aligned_halo, _circ_take, _f32, _fold_tails, _pad_circular,
    _pick_interpret, pallas_supported,
)

__all__ = ["modwt_var_fused", "var_fused_supported"]


def var_fused_supported(batch: int, n: int, level: int, m: int,
                        tile: int = 8192):
    """Padded (arbitrary-N) plans are supported at fold=1 (r4.1): the
    wrap-pad region would double-count duplicated coefficients, so the
    kernel masks lanes at signal positions ≥ N0 out of the Σw²
    accumulator (a per-128-group compare against a broadcast iota —
    folded plans would need per-sublane position arithmetic and stay on
    the two-step path)."""
    plan = pallas_supported(batch, n, level, m, tile)
    if plan is not None and (plan.n_pad == n or plan.fold == 1):
        return plan
    # the generic search prefers 16-sublane folded pads; re-search fold-1
    from .modwt_pallas import _padded_plan_search
    halo = _aligned_halo(m, level)
    return _padded_plan_search(batch, n, halo, tile,
                               lambda sub, t: halo < t and t % 128 == 0,
                               folds=(1,))


def _lane_partial(val, tile, j=None, n0=None):
    """(S, tile) → (S, 128) partial sums (128-lane groups stay vectorized).

    ``n0`` set → lanes at global signal position ≥ n0 (the wrap-pad
    region of a padded fold-1 plan) are zeroed before accumulating."""
    acc = None
    lane = None
    if n0 is not None:
        lane = jax.lax.broadcasted_iota(jnp.int32,
                                        val.shape[:-1] + (128,),
                                        val.ndim - 1)
    for p in range(tile // 128):
        seg = val[:, p * 128:(p + 1) * 128]
        if n0 is not None:
            pos = j * tile + p * 128 + lane
            seg = jnp.where(pos < n0, seg, 0.0)
        acc = seg if acc is None else acc + seg
    return acc


def _var_kernel(x_hbm, tails_hbm, out_ref, bufs, sems_m, sems_h, *, g, h,
                level, halo, tile, sublanes, n0=None):
    """One grid step: window (S, halo+tile) → accumulate (L+1, S, 128)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    j = pl.program_id(1)
    ni = pl.num_programs(0)
    nj = pl.num_programs(1)
    m = len(g)
    step = i * nj + j
    slot = step % 2

    def dmas(sl, ii, jj):
        rows = pl.ds(ii * sublanes, sublanes)
        return (
            pltpu.make_async_copy(
                x_hbm.at[rows, pl.ds(jj * tile, tile)],
                bufs.at[sl, :, pl.ds(halo, tile)], sems_m.at[sl]),
            pltpu.make_async_copy(
                tails_hbm.at[jj, rows],
                bufs.at[sl, :, pl.ds(0, halo)], sems_h.at[sl]),
        )

    @pl.when(step == 0)
    def _():
        for d in dmas(slot, i, j):
            d.start()

    last_j = j == nj - 1
    nxt_i = jnp.where(last_j, i + 1, i)
    nxt_j = jnp.where(last_j, 0, j + 1)

    @pl.when(step + 1 < ni * nj)
    def _():
        for d in dmas((step + 1) % 2, nxt_i, nxt_j):
            d.start()

    for d in dmas(slot, i, j):
        d.wait()

    v = _f32(bufs[slot])
    partials = []
    for lvl in range(1, level + 1):
        d = 1 << (lvl - 1)
        w_acc = None
        v_acc = None
        for k in range(m):
            seg = pltpu.roll(v, k * d, 1) if k else v
            w_acc = h[k] * seg if w_acc is None else w_acc + h[k] * seg
            v_acc = g[k] * seg if v_acc is None else v_acc + g[k] * seg
        w_valid = w_acc[:, halo:]
        partials.append(_lane_partial(w_valid * w_valid, tile, j, n0))
        v = v_acc
    v_valid = v[:, halo:]
    partials.append(_lane_partial(v_valid * v_valid, tile, j, n0))

    @pl.when(j == 0)
    def _():
        for lvl in range(level + 1):
            out_ref[lvl, :, :] = partials[lvl]

    @pl.when(j != 0)
    def _():
        for lvl in range(level + 1):
            out_ref[lvl, :, :] = out_ref[lvl, :, :] + partials[lvl]


@functools.partial(jax.jit, static_argnames=("wavelet", "level", "tile",
                                             "interpret"))
def modwt_var_fused(x: jax.Array, wavelet: DiscreteWavelet, level: int,
                    tile: int = 8192, interpret: bool | None = None
                    ) -> jax.Array:
    """Fused per-scale second moments: x (B, N) or (N,) → (level+1, B) /
    (level+1,) with rows ``mean(W_1²) … mean(W_L²), mean(V_L²)``.

    Rows 0..level−1 are the Percival–Walden wavelet variances ν²_j (biased,
    all-N, circular — the convention of ops/analysis.modwt_variance).
    """
    squeeze = x.ndim == 1
    if squeeze:
        x = x.reshape(1, -1)
    b, n = x.shape
    _check_level(n, level)
    g64, h64 = modwt_base_filters(wavelet)
    m = int(g64.shape[0])
    plan = var_fused_supported(b, n, level, m, tile)
    if plan is None:
        raise ValueError(f"unsupported shape {x.shape} for fused variance")
    sublanes, tile, fold, n_pad = plan
    halo = _aligned_halo(m, level)
    g = tuple(np.asarray(g64, dtype=np.float32))
    h = tuple(np.asarray(h64, dtype=np.float32))
    n0, pad = n, n_pad - n
    n = n_pad
    rows, nloc = b * fold, n // fold
    x_orig = x
    if pad:
        x = _pad_circular(x, pad)
    xr, tails = _fold_tails(x, fold, halo, tile)
    if pad:
        tails = tails.at[0, ::fold].set(
            _circ_take(x_orig, n0 - halo, halo).astype(tails.dtype))

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kernel = functools.partial(_var_kernel, g=g, h=h, level=level,
                               halo=halo, tile=tile, sublanes=sublanes,
                               n0=n0 if pad else None)
    out = pl.pallas_call(
        kernel,
        grid=(rows // sublanes, nloc // tile),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((level + 1, sublanes, 128),
                               lambda i, j: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((level + 1, rows, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, sublanes, halo + tile), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=_pick_interpret(interpret),
    )(xr, tails)
    sums = out.reshape(level + 1, b, fold * 128).sum(axis=-1) / n0
    return sums[:, 0] if squeeze else sums
