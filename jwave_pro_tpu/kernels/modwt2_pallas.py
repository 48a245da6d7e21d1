"""Fused 2D MODWT forward Pallas kernel.

The XLA separable path writes/reads every intermediate band per level —
~(10·read + 13·write) image passes for L=3 — and measures 2.3–3.0 G px/s
on v5e.  This kernel keeps the whole level cascade of an image TILE in
VMEM: one (halo-extended) window DMA per tile, all levels computed with
statically-shifted rolls on BOTH axes, one write per output band.  Traffic
drops to ~(1 read + (3L+1) writes)·4 B/px — the floor given the transform's
inherent (3L+1)× output expansion.

Structure mirrors ``modwt_pallas.py``'s forward:

* Separable per level: lane-axis (column) conv first — (g, h) pair sharing
  ``pltpu.roll(·, k·d, 1)`` — then sublane-axis (row) convs via
  ``pltpu.roll(·, k·d, 0)`` (measured: in-kernel sublane rolls run ~0.6×
  lane-roll speed — fine, unlike XLA-level sublane rolls which lose to
  transposed lane rolls).
* The circular boundary is handled with an XLA pre-pad of ``halo`` rows on
  top and ``halo`` lanes on the left (wrap-around copies).  Unlike the 1D
  kernel — where a padded copy cost a full extra pass relative to (L+1)
  outputs — the 2D pad is ~(halo_r/R + halo_c/C) of ONE image against
  3L+1 output images of traffic (≈ 2–4%), so the r2.1 context-table
  machinery isn't warranted here.
* Garbage creeps in from the top/left as rolls rotate across the window
  edge; every level loses (M−1)·d rows/lanes of validity and the final
  stores slice ``[halo:, halo:]`` — total shrink = (M−1)(2^L−1) = halo.
* Input windows overlap by ``halo`` (BlockSpec index maps cannot express
  overlap), so the padded input stays in HBM (``memory_space=ANY``) and
  each grid step DMAs its window, double-buffered across steps.

Band order/letters identical to ``ops/modwt2d.modwt2`` ((LH, HL, HH) per
level, letters = (row, col), LL last).  f32 natively; bfloat16 images are
DMA'd as bf16 (half the HBM traffic — the r4 bf16 I/O tier) and converted
to f32 in VMEM for compute, bands stored back as bf16.  Other dtypes and
unaligned shapes fall back to the XLA path via :func:`pallas2d_supported`.
"""
from __future__ import annotations

import functools
import typing

import numpy as np

import jax
import jax.numpy as jnp

from ..wavelets.base import DiscreteWavelet
from ..ops.modwt import modwt_base_filters
from .modwt_pallas import _f32

__all__ = ["modwt2_fused", "imodwt2_fused", "pallas2d_supported",
           "modwt2_denoise_fused", "denoise2_fused_supported"]


class Plan2(typing.NamedTuple):
    """2D dispatch plan; ``(r_pad, c_pad) == (r, c)`` for exact tilings.

    Arbitrary sizes (r4, mirroring the 1D kernels) wrap-pad the image to
    the tile grid with TRUE mod-(R0, C0) halo contexts and slice the
    output back — see :func:`_pad_ctx2`.
    """
    rt: int
    ct: int
    hr: int
    hc: int
    r_pad: int
    c_pad: int


def _halo(m: int, level: int) -> int:
    return (m - 1) * ((1 << level) - 1)


def _aligned(v: int, q: int) -> int:
    return -(-v // q) * q


def _pick_tile(n: int, quantum: int, target: int):
    t = min(target, n)
    t -= t % quantum
    while t >= quantum:
        if n % t == 0:
            return t
        t -= quantum
    return None


def _vmem_ok(rt: int, ct: int, hr: int, hc: int, level: int) -> bool:
    # VMEM budget: window + 2 lane-pass accumulators (full window) +
    # double-buffered (3L+1, rt, ct) output blocks, f32
    win = (rt + hr) * (ct + hc)
    out = (3 * level + 1) * rt * ct
    return 4 * (3 * win + 2 * out) <= 12 << 20


def pallas2d_supported(r: int, c: int, level: int, m: int) -> Plan2 | None:
    """Return a :class:`Plan2`, or None if the kernel can't run."""
    if level < 1:
        return None
    halo = _halo(m, level)
    hr = _aligned(halo, 8)
    hc = _aligned(halo, 128)
    if hr >= r or hc >= c:
        return None
    rt = _pick_tile(r, 8, 128)
    ct = _pick_tile(c, 128, 512)
    if rt is not None and ct is not None and _vmem_ok(rt, ct, hr, hc, level):
        return Plan2(rt, ct, hr, hc, r, c)
    # --- padded (arbitrary-size) plans: wrap-pad to the tile grid,
    # minimizing total windowed area; > 25% pad waste → XLA path ---
    best = None
    best_cost = None
    # (tile menu kept to power-of-two-nested values so the inverse's VMEM
    # fallback shrink min(rt, 64)/min(ct, 256) preserves grid divisibility)
    for rt in (128, 64, 32, 16, 8):
        for ct in (512, 256, 128):
            if not _vmem_ok(rt, ct, hr, hc, level):
                continue
            r_pad = _aligned(r, rt)
            c_pad = _aligned(c, ct)
            if r_pad * c_pad * 4 > r * c * 5:
                continue
            cost = (r_pad * c_pad) * (1 + hr / rt) * (1 + hc / ct)
            if best is None or cost < best_cost:
                best = Plan2(rt, ct, hr, hc, r_pad, c_pad)
                best_cost = cost
    return best


def _next_bij(b, i, j, n_i, n_j):
    """Linear successor of grid position (b, i, j) for DMA prefetch."""
    last_j = j == n_j - 1
    last_i = i == n_i - 1
    nxt_j = jnp.where(last_j, 0, j + 1)
    nxt_i = jnp.where(last_j, jnp.where(last_i, 0, i + 1), i)
    nxt_b = jnp.where(last_j & last_i, b + 1, b)
    return nxt_b, nxt_i, nxt_j


def _level_analysis2(v, g, h, d):
    """One 2D analysis level on a window: lane pass (columns, shared rolls
    for the (g, h) pair) then sublane pass (rows).  Returns (ll, hl, lh,
    hh), letters (row, col).  Shared by the forward and single-pass
    denoise kernels — op order is part of the bit-exactness contract."""
    from jax.experimental.pallas import tpu as pltpu

    m = len(g)
    cl = ch = None
    for k in range(m):
        seg = pltpu.roll(v, k * d, 1) if k else v
        tcl, tch = g[k] * seg, h[k] * seg
        cl = tcl if cl is None else cl + tcl
        ch = tch if ch is None else ch + tch
    ll = hl = lh = hh = None
    for k in range(m):
        scl = pltpu.roll(cl, k * d, 0) if k else cl
        sch = pltpu.roll(ch, k * d, 0) if k else ch
        tll, thl = g[k] * scl, h[k] * scl
        tlh, thh = g[k] * sch, h[k] * sch
        ll = tll if ll is None else ll + tll
        hl = thl if hl is None else hl + thl
        lh = tlh if lh is None else lh + tlh
        hh = thh if hh is None else hh + thh
    return ll, hl, lh, hh


def _level_adjoint2(ll, hl, lh, hh, g, h, d, hgt, wid):
    """One 2D adjoint level (combine siblings BEFORE rolling — one roll
    per tap per pair): undo the row pass, then the column pass.  Shared
    by the inverse and single-pass denoise kernels."""
    from jax.experimental.pallas import tpu as pltpu

    m = len(g)
    cl = ch = None
    for k in range(m):
        tl = g[k] * ll + h[k] * hl
        th = g[k] * lh + h[k] * hh
        if k:
            tl = pltpu.roll(tl, hgt - k * d, 0)
            th = pltpu.roll(th, hgt - k * d, 0)
        cl = tl if cl is None else cl + tl
        ch = th if ch is None else ch + th
    acc = None
    for k in range(m):
        t = g[k] * cl + h[k] * ch
        if k:
            t = pltpu.roll(t, wid - k * d, 1)
        acc = t if acc is None else acc + t
    return acc


def _fwd2_kernel(x_hbm, out_ref, bufs, sems, *, g, h, level, hr, hc, rt, ct,
                 n_i, n_j, out_dtype):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    m = len(g)
    step = (b * n_i + i) * n_j + j
    slot = step % 2
    total = pl.num_programs(0) * n_i * n_j

    def dma(sl, bb, ii, jj):
        return pltpu.make_async_copy(
            x_hbm.at[bb, pl.ds(ii * rt, rt + hr), pl.ds(jj * ct, ct + hc)],
            bufs.at[sl], sems.at[sl])

    @pl.when(step == 0)
    def _():
        dma(slot, b, i, j).start()

    nxt_b, nxt_i, nxt_j = _next_bij(b, i, j, n_i, n_j)

    @pl.when(step + 1 < total)
    def _():
        dma((step + 1) % 2, nxt_b, nxt_i, nxt_j).start()

    dma(slot, b, i, j).wait()
    # (rt+hr, ct+hc); garbage creeps from top/left per level.  bf16 windows
    # convert to f32 here (compute always runs f32 in VMEM).
    v = _f32(bufs[slot])
    for lvl in range(1, level + 1):
        d = 1 << (lvl - 1)
        ll, hl, lh, hh = _level_analysis2(v, g, h, d)
        base = 3 * (lvl - 1)
        out_ref[base + 0, 0] = lh[hr:, hc:].astype(out_dtype)
        out_ref[base + 1, 0] = hl[hr:, hc:].astype(out_dtype)
        out_ref[base + 2, 0] = hh[hr:, hc:].astype(out_dtype)
        v = ll
    out_ref[3 * level, 0] = v[hr:, hc:].astype(out_dtype)


def _wrap_pad2(x, r_pad, c_pad):
    """Wrap-pad bottom/right to the tile grid: every padded position (i, j)
    holds ``x[..., i mod R0, j mod C0]`` (mode='wrap' handles multi-wrap)."""
    r0, c0 = x.shape[-2], x.shape[-1]
    width = [(0, 0)] * (x.ndim - 2) + [(0, r_pad - r0), (0, c_pad - c0)]
    return jnp.pad(x, width, mode="wrap")


def _circular_pad2(x, hr, hc, r0=None, c0=None):
    """Left/top circular context: (B, R, C) → (B, R+hr, C+hc).

    ``r0``/``c0``: the ORIGINAL image dims when ``x`` is wrap-padded to a
    tile grid — the circular wrap is mod (R0, C0), not mod the padded
    shape, so the contexts are tiny mod-index takes (the 2D analog of the
    1D kernels' re-pointed wrap tails).  Default = exact-tiling behavior
    (take indices reduce to the plain last-rows/cols slices).
    """
    r0 = x.shape[-2] if r0 is None else r0
    c0 = x.shape[-1] if c0 is None else c0
    top = jnp.take(x, jnp.asarray(np.arange(r0 - hr, r0) % r0), axis=-2)
    xr = jnp.concatenate([top, x], axis=-2)
    left = jnp.take(xr, jnp.asarray(np.arange(c0 - hc, c0) % c0), axis=-1)
    return jnp.concatenate([left, xr], axis=-1)


@functools.partial(jax.jit, static_argnames=("wavelet", "level", "interpret"))
def modwt2_fused(x: jax.Array, wavelet: DiscreteWavelet, level: int,
                 interpret: bool | None = None) -> jax.Array:
    """Fused forward 2D MODWT: (B, R, C) or (R, C) → (3·level+1, ..., R, C).

    Use :func:`..ops.modwt2d.modwt2` for the general dispatcher; this
    raises for unsupported shapes (see :func:`pallas2d_supported`).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    squeeze = x.ndim == 2
    if squeeze:
        x = x[None]
    if x.ndim != 3:
        raise ValueError("modwt2_fused expects (B, R, C) or (R, C)")
    bsz, r0, c0 = x.shape
    g64, h64 = modwt_base_filters(wavelet)
    m = int(g64.shape[0])
    sup = pallas2d_supported(r0, c0, level, m)
    if sup is None:
        raise ValueError(f"unsupported shape {x.shape} for fused 2D MODWT")
    rt, ct, hr, hc, r, c = sup
    dt = x.dtype if x.dtype in (jnp.float32, jnp.bfloat16) else jnp.float32
    g = tuple(np.asarray(g64, dtype=np.float32))
    h = tuple(np.asarray(h64, dtype=np.float32))
    if (r, c) != (r0, c0):
        x = _wrap_pad2(x, r, c)
    xp = _circular_pad2(x, hr, hc, r0, c0)
    n_i, n_j = r // rt, c // ct

    kernel = functools.partial(_fwd2_kernel, g=g, h=h, level=level, hr=hr,
                               hc=hc, rt=rt, ct=ct, n_i=n_i, n_j=n_j,
                               out_dtype=dt)
    interp = (jax.default_backend() != "tpu" if interpret is None
              else interpret)
    out = pl.pallas_call(
        kernel,
        grid=(bsz, n_i, n_j),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((3 * level + 1, 1, rt, ct),
                               lambda b, i, j: (0, b, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3 * level + 1, bsz, r, c), dt),
        scratch_shapes=[
            pltpu.VMEM((2, rt + hr, ct + hc), dt),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interp,
    )(xp.astype(dt))
    out = out[..., :r0, :c0]
    return out[:, 0] if squeeze else out


def _inv2_kernel(c_hbm, out_ref, bufs, sems, *, g, h, level, hr, hc, rt, ct,
                 n_i, n_j, out_dtype):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    m = len(g)
    step = (b * n_i + i) * n_j + j
    slot = step % 2
    total = pl.num_programs(0) * n_i * n_j
    rows = 3 * level + 1
    hgt, wid = rt + hr, ct + hc

    def dma(sl, bb, ii, jj):
        return pltpu.make_async_copy(
            c_hbm.at[:, bb, pl.ds(ii * rt, hgt), pl.ds(jj * ct, wid)],
            bufs.at[sl], sems.at[sl])

    @pl.when(step == 0)
    def _():
        dma(slot, b, i, j).start()

    nxt_b, nxt_i, nxt_j = _next_bij(b, i, j, n_i, n_j)

    @pl.when(step + 1 < total)
    def _():
        dma((step + 1) % 2, nxt_b, nxt_i, nxt_j).start()

    dma(slot, b, i, j).wait()
    c = bufs[slot]  # (rows, hgt, wid); garbage creeps from bottom/right
    # bf16 coefficient rows convert to f32 at first use (per-row, so the
    # f32 working set stays at the 4 live bands + carry)
    ll = _f32(c[rows - 1])
    for lvl in range(level, 0, -1):
        d = 1 << (lvl - 1)
        base = 3 * (lvl - 1)
        lh, hl, hh = (_f32(c[base]), _f32(c[base + 1]), _f32(c[base + 2]))
        ll = _level_adjoint2(ll, hl, lh, hh, g, h, d, hgt, wid)
    out_ref[0] = ll[:rt, :ct].astype(out_dtype)


def _circular_pad2_right(c, hr, hc, r0=None, c0=None):
    """Right/bottom circular context: (..., R, C) → (..., R+hr, C+hc).

    ``r0``/``c0``: the original dims when ``c`` is wrap-padded to a tile
    grid — row R_pad + k wraps to ``(R_pad + k) mod R0``, not row k (see
    :func:`_circular_pad2`'s mod-index rationale)."""
    r, cc = c.shape[-2], c.shape[-1]
    r0 = r if r0 is None else r0
    c0 = cc if c0 is None else c0
    bot = jnp.take(c, jnp.asarray(np.arange(r, r + hr) % r0), axis=-2)
    cr = jnp.concatenate([c, bot], axis=-2)
    right = jnp.take(cr, jnp.asarray(np.arange(cc, cc + hc) % c0), axis=-1)
    return jnp.concatenate([cr, right], axis=-1)


@functools.partial(jax.jit, static_argnames=("wavelet", "interpret"))
def imodwt2_fused(c: jax.Array, wavelet: DiscreteWavelet,
                  interpret: bool | None = None) -> jax.Array:
    """Fused inverse 2D MODWT: (3·level+1, B, R, C) or (3·level+1, R, C)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    squeeze = c.ndim == 3
    if squeeze:
        c = c[:, None]
    if c.ndim != 4 or c.shape[0] % 3 != 1:
        raise ValueError("imodwt2_fused expects a (3L+1, [B,] R, C) stack")
    rows, bsz, r0, c0 = c.shape
    level = (rows - 1) // 3
    g64, h64 = modwt_base_filters(wavelet)
    m = int(g64.shape[0])
    sup = pallas2d_supported(r0, c0, level, m)
    if sup is None:
        raise ValueError(f"unsupported shape {c.shape} for fused 2D iMODWT")
    rt, ct, hr, hc, r, cc = sup
    # the inverse holds the whole (3L+1)-row window stack double-buffered
    if 4 * (2 * rows * (rt + hr) * (ct + hc) + 2 * rt * ct) > 12 << 20:
        rt, ct = min(rt, 64), min(ct, 256)
        if r % rt or cc % ct or \
                4 * (2 * rows * (rt + hr) * (ct + hc) + 2 * rt * ct) > 12 << 20:
            raise ValueError(f"VMEM budget exceeded for {c.shape}")
    dt = c.dtype if c.dtype in (jnp.float32, jnp.bfloat16) else jnp.float32
    g = tuple(np.asarray(g64, dtype=np.float32))
    h = tuple(np.asarray(h64, dtype=np.float32))
    if (r, cc) != (r0, c0):
        c = _wrap_pad2(c, r, cc)
    cp = _circular_pad2_right(c, hr, hc, r0, c0)
    n_i, n_j = r // rt, cc // ct

    kernel = functools.partial(_inv2_kernel, g=g, h=h, level=level, hr=hr,
                               hc=hc, rt=rt, ct=ct, n_i=n_i, n_j=n_j,
                               out_dtype=dt)
    interp = (jax.default_backend() != "tpu" if interpret is None
              else interpret)
    out = pl.pallas_call(
        kernel,
        grid=(bsz, n_i, n_j),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, rt, ct), lambda b, i, j: (b, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, r, cc), dt),
        scratch_shapes=[
            pltpu.VMEM((2, rows, rt + hr, ct + hc), dt),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interp,
    )(cp.astype(dt))
    out = out[..., :r0, :c0]
    return out[0] if squeeze else out


# ---------------------------------------------------------------------------
# Single-pass fused 2D denoise (r5): forward → shrink → inverse in VMEM
# ---------------------------------------------------------------------------

def denoise2_fused_supported(r: int, c: int, level: int, m: int):
    """Plan for :func:`modwt2_denoise_fused` — the window carries context
    on ALL FOUR sides (analysis creep from top/left, adjoint creep from
    bottom/right), and the whole (3L+1)-band set stays live in VMEM
    between the cascades, so the feasible tiles are smaller than the
    transform kernels'.  Exact tilings only."""
    if level < 1:
        return None
    halo = _halo(m, level)
    hr = _aligned(halo, 8)
    hc = _aligned(halo, 128)
    if 2 * hr >= r or 2 * hc >= c:
        return None
    for rt in (128, 64, 32, 16, 8):
        if r % rt:
            continue
        for ct in (512, 256, 128):
            if c % ct:
                continue
            win = (rt + 2 * hr) * (ct + 2 * hc)
            out = rt * ct
            # live set ≈ input dbuf (2) + 3L detail windows + carry +
            # ~2 accumulator temps, + double-buffered output block
            if 4 * ((3 * level + 5) * win + 2 * out) <= 12 << 20:
                return Plan2(rt, ct, hr, hc, r, c)
    return None


def _denoise2_kernel(x_hbm, thr_hbm, out_ref, bufs, sems, *, g, h, level,
                     hr, hc, rt, ct, n_i, n_j, mode, out_dtype):
    """One grid step: window (rt+2hr, ct+2hc) → denoised tile (rt, ct).

    Analysis garbage wraps in from the top/left (≤ halo), the adjoint's
    from the bottom/right — the two-sided window keeps the CENTER tile
    exact (the 1D denoise kernel's argument, per axis)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    rows, cols = rt + 2 * hr, ct + 2 * hc
    step = (b * n_i + i) * n_j + j
    slot = step % 2
    total = pl.num_programs(0) * n_i * n_j

    def dma(sl, bb, ii, jj):
        return pltpu.make_async_copy(
            x_hbm.at[bb, pl.ds(ii * rt, rows), pl.ds(jj * ct, cols)],
            bufs.at[sl], sems.at[sl])

    @pl.when(step == 0)
    def _():
        dma(slot, b, i, j).start()

    nxt_b, nxt_i, nxt_j = _next_bij(b, i, j, n_i, n_j)

    @pl.when(step + 1 < total)
    def _():
        dma((step + 1) % 2, nxt_b, nxt_i, nxt_j).start()

    dma(slot, b, i, j).wait()
    thr = jnp.max(thr_hbm[...])          # (1, 8, 128) block → scalar

    v = _f32(bufs[slot])
    details = []                          # (lh, hl, hh) per level
    for lvl in range(1, level + 1):
        d = 1 << (lvl - 1)
        ll, hl, lh, hh = _level_analysis2(v, g, h, d)
        details.append((lh, hl, hh))
        v = ll

    def shrink(w_band):
        if mode == "soft":
            return jnp.sign(w_band) * jnp.maximum(jnp.abs(w_band) - thr, 0.0)
        return jnp.where(jnp.abs(w_band) > thr, w_band, 0.0)

    for lvl in range(level, 0, -1):
        d = 1 << (lvl - 1)
        lh, hl, hh = (shrink(w) for w in details[lvl - 1])
        v = _level_adjoint2(v, hl, lh, hh, g, h, d, rows, cols)
    out_ref[0] = v[hr:hr + rt, hc:hc + ct].astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("wavelet", "level", "mode",
                                             "interpret"))
def modwt2_denoise_fused(x: jax.Array, thr: jax.Array,
                         wavelet: DiscreteWavelet, level: int,
                         mode: str = "soft",
                         interpret: bool | None = None) -> jax.Array:
    """Single-pass fused 2D denoise: (B, R, C) or (R, C) + per-image
    threshold (B,) → denoised image(s).  ~2 HBM passes instead of the
    two-kernel pipeline's 2·(3L+1)+2; semantics = shrink every detail
    band, keep LL (ops/denoise.modwt2_denoise with a fixed threshold).
    Raises for unsupported shapes (:func:`denoise2_fused_supported`)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    squeeze = x.ndim == 2
    if squeeze:
        x = x[None]
    if x.ndim != 3:
        raise ValueError("modwt2_denoise_fused expects (B, R, C) or (R, C)")
    bsz, r0, c0 = x.shape
    g64, h64 = modwt_base_filters(wavelet)
    m = int(g64.shape[0])
    sup = denoise2_fused_supported(r0, c0, level, m)
    if sup is None:
        raise ValueError(f"unsupported shape {x.shape} for fused 2D denoise")
    rt, ct, hr, hc, _, _ = sup
    dt = x.dtype if x.dtype in (jnp.float32, jnp.bfloat16) else jnp.float32
    g = tuple(np.asarray(g64, dtype=np.float32))
    h = tuple(np.asarray(h64, dtype=np.float32))
    # four-sided circular context: append bottom/right, then prepend
    # top/left (both mod the ORIGINAL dims)
    xp = _circular_pad2_right(x.astype(dt), hr, hc, r0, c0)
    xp = _circular_pad2(xp, hr, hc, r0, c0)
    thr_arr = jnp.broadcast_to(
        jnp.asarray(thr, jnp.float32).reshape(-1, 1, 1), (bsz, 8, 128))
    n_i, n_j = r0 // rt, c0 // ct

    kernel = functools.partial(_denoise2_kernel, g=g, h=h, level=level,
                               hr=hr, hc=hc, rt=rt, ct=ct, n_i=n_i, n_j=n_j,
                               mode=mode, out_dtype=dt)
    interp = (jax.default_backend() != "tpu" if interpret is None
              else interpret)
    out = pl.pallas_call(
        kernel,
        grid=(bsz, n_i, n_j),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec((1, 8, 128), lambda b, i, j: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, rt, ct), lambda b, i, j: (b, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, r0, c0), dt),
        scratch_shapes=[
            pltpu.VMEM((2, rt + 2 * hr, ct + 2 * hc), dt),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interp,
    )(xp, thr_arr)
    return out[0] if squeeze else out
