"""Fused MODWT denoise Pallas kernel: forward → shrink → inverse, one pass.

The two-kernel round trip (kernels/modwt_pallas.py) is HBM-floor-bound at
(1 read + (L+1) writes) + ((L+1) reads + 1 write) = 2·(L+2) passes because
the coefficient set materializes in HBM between the kernels.  Denoising
never needs the coefficients — only the shrunk reconstruction — so this
kernel keeps the whole level chain in VMEM per tile and touches HBM exactly
twice per sample (1 read + 1 write + ~6% halo/threshold traffic): a
(2·(L+2))/2 = 7× traffic-floor advantage at L=5.

Window layout: each grid step DMAs a (S, halo + tile + halo) window — left
context for forward validity, right context so the inverse's adjoint reads
(which look FORWARD k·2^{j-1} lanes) stay valid.  ``pltpu.roll`` wraps the
window edges, corrupting at most ``(M−1)(2^L−1) ≤ halo`` lanes from the
left on the analysis chain and from the right on the synthesis chain, so
lanes [halo, halo+tile) — exactly the output tile — are correct.  Both
contexts come from tiny tile-major tables (see modwt_pallas._fold_tails for
the Mosaic divisibility rationale); folding handles small batches the same
way as the transform kernels.

Semantics match ops/denoise.modwt_denoise (soft/hard shrink of W_1..W_L,
V_L kept, inverse; MODWTExample.java:125-172) for a caller-supplied
threshold; the public wrapper estimates the default universal threshold
from a one-level XLA pass first (a global median cannot live inside a
tiled single-pass kernel).

Not differentiable (shrinkage is piecewise; use method='auto' paths for
autodiff).
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from ..wavelets.base import DiscreteWavelet
from ..ops.modwt import _check_level, modwt_base_filters
from .modwt_pallas import (
    _aligned_halo, _circ_take, _f32, _pad_circular, _pick_interpret,
    pallas_supported,
)

__all__ = ["modwt_denoise_fused", "denoise_fused_supported"]


def denoise_fused_supported(batch: int, n: int, level: int, m: int):
    """Same plan space as the transform kernels, but the window needs
    2·halo of context inside one tile: require halo < tile//2.

    Padded (arbitrary-N) plans are supported (r4.1): the wrap-padded
    array with mod-N0 edge contexts IS a slice of the signal's infinite
    circular extension, so every output column in [0, N0) sees true
    values within halo on BOTH sides and the sliced reconstruction is
    exact — same argument as the transform kernels, applied to the
    two-sided window."""
    plan = pallas_supported(batch, n, level, m)
    if plan is None:
        return None
    sublanes, tile, fold, _ = plan
    if _aligned_halo(m, level) * 2 >= tile:
        return None
    return plan


def _denoise_kernel(x_hbm, tails_hbm, heads_hbm, thr_ref, out_ref, bufs,
                    sems_m, sems_l, sems_r, *, g, h, level, halo, tile,
                    sublanes, mode, out_dtype):
    """One grid step: window (S, 2·halo + tile) → denoised tile (S, tile)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    j = pl.program_id(1)
    ni = pl.num_programs(0)
    nj = pl.num_programs(1)
    m = len(g)
    width = tile + 2 * halo
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
                bufs.at[sl, :, pl.ds(0, halo)], sems_l.at[sl]),
            pltpu.make_async_copy(
                heads_hbm.at[jj, rows],
                bufs.at[sl, :, pl.ds(halo + tile, halo)], sems_r.at[sl]),
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

    # All 128 threshold lanes carry the same per-row value; a lane-reduce is
    # the cheap way to a broadcastable (S, 1) column.
    thr = jnp.max(thr_ref[...], axis=1, keepdims=True)

    # Analysis chain (garbage wraps in from the LEFT edge, ≤ halo lanes).
    v = _f32(bufs[slot])
    wrows = []
    for lvl in range(1, level + 1):
        d = 1 << (lvl - 1)
        w_acc = None
        v_acc = None
        for k in range(m):
            seg = pltpu.roll(v, k * d, 1) if k else v
            w_acc = h[k] * seg if w_acc is None else w_acc + h[k] * seg
            v_acc = g[k] * seg if v_acc is None else v_acc + g[k] * seg
        wrows.append(w_acc)
        v = v_acc

    # Shrink details (soft/hard), keep the approximation.
    shrunk = []
    for w_row in wrows:
        if mode == "soft":
            shrunk.append(jnp.sign(w_row) * jnp.maximum(jnp.abs(w_row) - thr,
                                                        0.0))
        else:
            shrunk.append(jnp.where(jnp.abs(w_row) > thr, w_row, 0.0))

    # Synthesis chain (garbage wraps in from the RIGHT edge, ≤ halo lanes).
    for lvl in range(level, 0, -1):
        d = 1 << (lvl - 1)
        w_row = shrunk[lvl - 1]
        acc = None
        for k in range(m):
            t = g[k] * v + h[k] * w_row
            t = pltpu.roll(t, width - k * d, 1) if k else t
            acc = t if acc is None else acc + t
        v = acc

    out_ref[:, :] = v[:, halo:halo + tile].astype(out_dtype)


def _signal_context(x, fold, halo, tile):
    """Per-tile left AND right context tables for the doubly-extended window.

    Returns (xr (rows, nloc), tails (nj, rows, halo), heads (nj, rows, halo))
    — tails[j] precedes tile j, heads[j] follows it, circular across each
    signal's fold chain (cf. modwt_pallas._fold_tails/_fold_heads).
    """
    b, n = x.shape
    nloc = n // fold
    xr = x if fold == 1 else x.reshape(b * fold, nloc)
    rows = b * fold
    nj = nloc // tile
    xt = xr.reshape(rows, nj, tile)
    t_tails = xt[:, :, tile - halo:]
    t_heads = xt[:, :, :halo]
    tails = jnp.roll(t_tails, 1, axis=1)
    heads = jnp.roll(t_heads, -1, axis=1)
    if fold > 1:
        first = jnp.roll(t_tails[:, -1].reshape(b, fold, halo), 1,
                         axis=1).reshape(rows, halo)
        last = jnp.roll(t_heads[:, 0].reshape(b, fold, halo), -1,
                        axis=1).reshape(rows, halo)
        tails = tails.at[:, 0].set(first)
        heads = heads.at[:, nj - 1].set(last)
    return xr, tails.transpose(1, 0, 2), heads.transpose(1, 0, 2)


@functools.partial(jax.jit, static_argnames=("wavelet", "level", "mode",
                                             "interpret"))
def modwt_denoise_fused(x: jax.Array, threshold: jax.Array,
                        wavelet: DiscreteWavelet, level: int,
                        mode: str = "soft",
                        interpret: bool | None = None) -> jax.Array:
    """Single-pass MODWT denoise: x (B, N), threshold (B,) → (B, N).

    ``threshold`` is per-signal (broadcast over scales, as in
    MODWTExample.java:151-166).  Use :func:`ops.denoise.modwt_denoise`
    (method='fused') for the public path with automatic thresholding.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n = x.shape
    _check_level(n, level)
    g64, h64 = modwt_base_filters(wavelet)
    m = int(g64.shape[0])
    plan = denoise_fused_supported(b, n, level, m)
    if plan is None:
        raise ValueError(f"unsupported shape {x.shape} for fused denoise")
    sublanes, tile, fold, n_pad = plan
    halo = _aligned_halo(m, level)
    dt = x.dtype
    g = tuple(np.asarray(g64, dtype=np.float32))
    h = tuple(np.asarray(h64, dtype=np.float32))
    n0, pad = n, n_pad - n
    n = n_pad
    rows, nloc = b * fold, n // fold
    x_orig = x
    if pad:
        x = _pad_circular(x, pad)
    xr, tails, heads = _signal_context(x, fold, halo, tile)
    if pad:
        # mod-N0 wrap contexts at the grid edges (cf. the transform
        # kernels' padded dispatch): left wrap = the ORIGINAL tail; right
        # wrap = circular position N_pad mod N0 = pad
        nj = nloc // tile
        tails = tails.at[0, ::fold].set(
            _circ_take(x_orig, n0 - halo, halo).astype(tails.dtype))
        heads = heads.at[nj - 1, fold - 1::fold].set(
            _circ_take(x_orig, pad, halo).astype(heads.dtype))
    # (rows, 128) broadcast block so per-row thresholds ride a VMEM BlockSpec
    thr = jnp.broadcast_to(
        jnp.asarray(threshold, jnp.float32).reshape(b, 1), (b, fold * 128)
    ).reshape(rows, 128)

    kernel = functools.partial(_denoise_kernel, g=g, h=h, level=level,
                               halo=halo, tile=tile, sublanes=sublanes,
                               mode=mode, out_dtype=dt)
    out = pl.pallas_call(
        kernel,
        grid=(rows // sublanes, nloc // tile),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec((sublanes, 128), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((sublanes, tile), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, nloc), dt),
        scratch_shapes=[
            pltpu.VMEM((2, sublanes, tile + 2 * halo), dt),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=_pick_interpret(interpret),
    )(xr, tails, heads, thr)
    if fold > 1:
        out = out.reshape(b, n)
    return out[..., :n0]
