"""Fused 3D MODWT Pallas kernels (forward + inverse).

The XLA separable path (``ops/modwt2d.modwt3``) writes/reads every
intermediate band to HBM per level — the transform's (7L+1)× output
expansion times ~3 axis passes — and measures 0.84 G voxels/s at 2×64³
Db4 L2 on v5e against a ~1.4 G traffic floor (docs/PERFORMANCE.md; the
r4.1 transpose-stacking attempt measured identical because XLA already
consolidates the separate convolutions — only a fused kernel moves this).

This kernel runs the whole level cascade of a depth-chunk in VMEM:
one haloed window DMA per chunk, all three axis passes per level as
vector shifts, one write per output octant.  Traffic falls to
~((dt+hd)/dt reads + (7L+1) writes) per voxel — within ~10–20% of the
floor for the chunk sizes the VMEM plan picks.

Layout is the TPU-native part: the volume is flattened to ``(D, R·C)``
— depth on sublanes, rows×cols merged on lanes — so a 64³ volume fills
4096 lanes instead of wasting half of every vreg on a 64-lane axis:

* **row shift** by s ≡ flat lane roll by ``(s mod R)·C`` — exact mod-R
  because the roll extent IS R·C (``C`` divides the shift, so rows never
  shear into each other);
* **col shift** by s ≡ two flat lane rolls + a positional select:
  ``roll(s')`` is correct at in-row positions ``c ≥ s'`` and
  ``roll(s'−C)`` at ``c < s'`` (s' = s mod C) — the select stitches the
  exact mod-C circular shift from the two candidates (one extra roll +
  select per tap instead of the 2× lane-waste of a 64-lane layout);
* **depth shift** ≡ sublane roll, with an ``hd``-row circular context
  pre-padded on top (XLA wrap concat — hd/D of one input pass, the 2D
  kernel's boundary strategy) so garbage creeps only into the sacrificial
  top rows; output stores slice ``[hd:]``.

Band order identical to ``ops/modwt2d.modwt3`` (binary octant order
(depth, row, col) per level, LLL last).  bfloat16 volumes are DMA'd as
bf16 and computed in f32 (the r4 bf16 I/O tier).  Unsupported shapes
(``R·C`` not a multiple of 128, VMEM plan failure, >25% depth padding)
return None from :func:`pallas3d_supported` and fall back to XLA.
"""
from __future__ import annotations

import functools
import math
import typing

import numpy as np

import jax
import jax.numpy as jnp

from ..wavelets.base import DiscreteWavelet
from ..ops.modwt import modwt_base_filters
from .modwt_pallas import _f32

__all__ = ["modwt3_fused", "imodwt3_fused", "pallas3d_supported"]


class Plan3(typing.NamedTuple):
    """3D dispatch plan: depth chunk ``dt``, top halo ``hd`` (8-aligned),
    wrap-padded depth ``d_pad`` (== D for exact tilings).  The lane axis
    always holds the full R·C plane."""
    dt: int
    hd: int
    d_pad: int
    nr: int      # plane rows per lane tile (== R for whole-plane plans)
    hr: int      # row halo on the lane axis (0 ⇒ exact circular r-shifts)


def _halo(m: int, level: int) -> int:
    return (m - 1) * ((1 << level) - 1)


def _aligned(v: int, q: int) -> int:
    return -(-v // q) * q


def _vmem_ok(dt: int, hd: int, win_lanes: int, out_lanes: int,
             level: int) -> bool:
    # Mosaic-calibrated model: the compiler's stack allocation for this
    # kernel measures 11 window-sized buffers (2 DMA slots + the cascade's
    # live intermediates — the kernel consumes each quadrant's octants
    # before building the next, but accumulator/roll temps double several
    # of them) + the double-buffered output block + ~0.9 MiB fixed, vs a
    # 16 MiB scoped limit.  (Empirical: 64³ L3 dt=8 → model 17.3 MiB,
    # Mosaic reported 17.36; 64³ L2 dt=16 → 15.2, compiled.)  The dt=16
    # plan this admits at 64³ L2 measured 1.8× the dt=8 plan a flat 12 MiB
    # budget picked.
    win_b = 4 * (dt + hd) * win_lanes
    out_b = 4 * (7 * level + 1) * dt * out_lanes
    return 11 * win_b + 2 * out_b + (1 << 20) <= 16 << 20


def pallas3d_supported(d: int, r: int, c: int, level: int,
                       m: int) -> Plan3 | None:
    """Return a :class:`Plan3`, or None if the fused kernel can't run.

    Whole-plane plans (nr = R, hr = 0) keep every shift exactly circular;
    larger volumes (r5.1, e.g. 128³) tile the merged lane axis in
    whole-row chunks of ``nr`` rows with an ``hr``-row circular context —
    the two-roll column select stays exact inside a window, and row/depth
    creep is confined to the sacrificial halo regions.
    """
    if level < 1 or d < 2 or r < 2 or c < 2:
        return None
    rc = r * c
    if rc % 128 != 0:
        return None
    halo = _halo(m, level)
    hd = _aligned(halo, 8)
    for dt in (32, 16, 8):
        d_pad = _aligned(d, dt)
        if d_pad * 4 > d * 5:       # > 25% padded depth → XLA is cheaper
            continue
        if _vmem_ok(dt, hd, rc, rc, level):
            return Plan3(dt, hd, d_pad, r, 0)
        # lane-tiled plans: nr | R, 128-aligned lane offsets/extents, and
        # the halo re-read ≤ 100% of the tile (else XLA is cheaper)
        q = 128 // math.gcd(c, 128)
        hr = _aligned(halo, q)
        if hr > r:
            continue
        for nr in (128, 64, 32, 16, 8):
            if r % nr or (nr * c) % 128 or nr < hr:
                continue
            if _vmem_ok(dt, hd, (nr + hr) * c, nr * c, level):
                return Plan3(dt, hd, d_pad, nr, hr)
    return None


def _shift_c(v, s, c, lane_mod_c):
    """Exact mod-C column shift of a flat (rows, W) window: want
    ``out[.., p] = v[.., row(p), (col(p) − s) mod C]``.  Exact for every
    window row (both roll branches stay within the row's own tile span —
    see the module docstring)."""
    from jax.experimental.pallas import tpu as pltpu

    w = v.shape[-1]
    s = s % c
    if s == 0:
        return v
    a = pltpu.roll(v, s, 1)             # right rows  (col ≥ s)
    b = pltpu.roll(v, w + s - c, 1)     # wrapped head (col < s)
    return jnp.where(lane_mod_c >= s, a, b)


def _shift_r(v, s, wr, c):
    """Row shift by ``s`` on a window of ``wr`` plane rows: flat lane roll
    by (s mod wr)·C.  Exact mod-R when the window is the whole plane
    (wr = R); on lane-tiled windows garbage creeps into the first ``s``
    rows (covered by the hr context)."""
    from jax.experimental.pallas import tpu as pltpu

    s = (s % wr) * c
    if s == 0:
        return v
    return pltpu.roll(v, s, 1)


def _shift_d(v, s):
    """Depth shift: sublane roll; garbage creeps into the top halo rows."""
    from jax.experimental.pallas import tpu as pltpu

    if s == 0:
        return v
    return pltpu.roll(v, s, 0)


def _lane_mod_c(shape, c):
    pos = jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)
    return pos % c


def _fwd3_kernel(x_hbm, out_ref, bufs, sems, *, g, h, level, hd, dt, nr, hr,
                 c, n_i, n_j, out_dtype):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    m = len(g)
    wr = nr + hr                              # plane rows in the window
    step = (b * n_i + i) * n_j + j
    slot = step % 2
    total = pl.num_programs(0) * n_i * n_j

    def dma(sl, bb, ii, jj):
        return pltpu.make_async_copy(
            x_hbm.at[bb, pl.ds(ii * dt, dt + hd),
                     pl.ds(jj * (nr * c), wr * c)],
            bufs.at[sl], sems.at[sl])

    @pl.when(step == 0)
    def _():
        dma(slot, b, i, j).start()

    last_j = j == n_j - 1
    last_i = i == n_i - 1
    nxt_j = jnp.where(last_j, 0, j + 1)
    nxt_i = jnp.where(last_j, jnp.where(last_i, 0, i + 1), i)
    nxt_b = jnp.where(last_j & last_i, b + 1, b)

    @pl.when(step + 1 < total)
    def _():
        dma((step + 1) % 2, nxt_b, nxt_i, nxt_j).start()

    dma(slot, b, i, j).wait()
    v = _f32(bufs[slot])                      # (dt + hd, wr·c)
    mod_c = _lane_mod_c(v.shape, c)

    def conv_pair(u, shift):
        """(u⋆g, u⋆h) sharing the shifted copies."""
        lo = hi = None
        for k in range(m):
            seg = shift(u, k) if k else u
            tl, th = g[k] * seg, h[k] * seg
            lo = tl if lo is None else lo + tl
            hi = th if hi is None else hi + th
        return lo, hi

    for lvl in range(1, level + 1):
        d = 1 << (lvl - 1)
        base = 7 * (lvl - 1)
        cl, ch = conv_pair(v, lambda u, k: _shift_c(u, k * d, c, mod_c))
        sh_r = lambda u, k: _shift_r(u, k * d, wr, c)
        sh_d = lambda u, k: _shift_d(u, k * d)

        def store(off, band):
            out_ref[base + off, 0] = \
                band[hd:, hr * c:].astype(out_dtype)

        # row pass then depth pass, each quadrant fully consumed (its
        # octants stored) before the next is built — keeps the VMEM peak
        # at carry + one quadrant + one band pair.  Octant letters read
        # (depth, row, col); binary order matches ops/modwt2d.modwt3.
        q_ll, q_hl = conv_pair(cl, sh_r)
        lhl, hhl = conv_pair(q_hl, sh_d)
        store(1, lhl); store(5, hhl)
        lll, hll = conv_pair(q_ll, sh_d)
        store(3, hll)
        q_lh, q_hh = conv_pair(ch, sh_r)
        llh, hlh = conv_pair(q_lh, sh_d)
        store(0, llh); store(4, hlh)
        lhh, hhh = conv_pair(q_hh, sh_d)
        store(2, lhh); store(6, hhh)
        v = lll
    out_ref[7 * level, 0] = v[hd:, hr * c:].astype(out_dtype)


def _pad_depth(x, d0, hd, d_pad, front: bool):
    """Wrap-pad depth (axis -2 of (B, D, RC)) to ``d_pad`` rows plus an
    ``hd``-row circular context (mod the ORIGINAL depth) on the creep side."""
    if d_pad != d0:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(0, d_pad - d0), (0, 0)],
                    mode="wrap")
    if front:
        ctx = jnp.take(x, jnp.asarray(np.arange(d0 - hd, d0) % d0), axis=-2)
        return jnp.concatenate([ctx, x], axis=-2)
    ctx = jnp.take(x, jnp.asarray(np.arange(d_pad, d_pad + hd) % d0),
                   axis=-2)
    return jnp.concatenate([x, ctx], axis=-2)


def _pad_rows(x, hr: int, front: bool):
    """Circular ``hr``-row context on the plane-row axis (-2 of
    (…, R, C)) — prefix for the forward's creep, suffix for the
    adjoint's."""
    if hr == 0:
        return x
    r0 = x.shape[-2]
    if front:
        ctx = jnp.take(x, jnp.asarray(np.arange(r0 - hr, r0) % r0), axis=-2)
        return jnp.concatenate([ctx, x], axis=-2)
    ctx = jnp.take(x, jnp.asarray(np.arange(r0, r0 + hr) % r0), axis=-2)
    return jnp.concatenate([x, ctx], axis=-2)


@functools.partial(jax.jit, static_argnames=("wavelet", "level", "interpret"))
def modwt3_fused(x: jax.Array, wavelet: DiscreteWavelet, level: int,
                 interpret: bool | None = None) -> jax.Array:
    """Fused forward 3D MODWT: (B, D, R, C) or (D, R, C) →
    (7·level+1, ..., D, R, C).  Raises for unsupported shapes — use
    :func:`..ops.modwt2d.modwt3` for the dispatcher."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    if x.ndim != 4:
        raise ValueError("modwt3_fused expects (B, D, R, C) or (D, R, C)")
    bsz, d0, r, c = x.shape
    g64, h64 = modwt_base_filters(wavelet)
    m = int(g64.shape[0])
    sup = pallas3d_supported(d0, r, c, level, m)
    if sup is None:
        raise ValueError(f"unsupported shape {x.shape} for fused 3D MODWT")
    dt, hd, d_pad, nr, hr = sup
    dtp = x.dtype if x.dtype in (jnp.float32, jnp.bfloat16) else jnp.float32
    g = tuple(np.asarray(g64, dtype=np.float32))
    h = tuple(np.asarray(h64, dtype=np.float32))
    rc = r * c
    xr = _pad_rows(x.astype(dtp), hr, front=True)       # (B, D, R+hr, C)
    xp = _pad_depth(xr.reshape(bsz, d0, (r + hr) * c), d0, hd, d_pad,
                    front=True)
    n_i = d_pad // dt
    n_j = r // nr

    kernel = functools.partial(_fwd3_kernel, g=g, h=h, level=level, hd=hd,
                               dt=dt, nr=nr, hr=hr, c=c, n_i=n_i, n_j=n_j,
                               out_dtype=dtp)
    interp = (jax.default_backend() != "tpu" if interpret is None
              else interpret)
    out = pl.pallas_call(
        kernel,
        grid=(bsz, n_i, n_j),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((7 * level + 1, 1, dt, nr * c),
                               lambda b, i, j: (0, b, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((7 * level + 1, bsz, d_pad, rc), dtp),
        scratch_shapes=[
            pltpu.VMEM((2, dt + hd, (nr + hr) * c), dtp),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interp,
    )(xp)
    out = out[:, :, :d0].reshape(7 * level + 1, bsz, d0, r, c)
    return out[:, 0] if squeeze else out


def _inv3_kernel(c_hbm, out_ref, bufs, llbuf, sems, llsem, *, g, h, level,
                 hd, dt, nr, hr, c, n_i, n_j, out_dtype):
    # The full (7L+1)-band window stack would not fit VMEM double-buffered
    # (15 bands × window ≈ 8 MiB at 64³ dt=8), so the inverse streams one
    # LEVEL SLAB (the 7 detail bands level j consumes) at a time, double-
    # buffered across levels AND grid steps via a global slab counter; the
    # LLL carry band is one small synchronous DMA per step.
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    m = len(g)
    wr = nr + hr
    step = (b * n_i + i) * n_j + j
    total = pl.num_programs(0) * n_i * n_j

    def slab_dma(sl, lvl, bb, ii, jj):
        return pltpu.make_async_copy(
            c_hbm.at[pl.ds(7 * (lvl - 1), 7), bb, pl.ds(ii * dt, dt + hd),
                     pl.ds(jj * (nr * c), wr * c)],
            bufs.at[sl], sems.at[sl])

    @pl.when(step == 0)
    def _():
        slab_dma(0, level, b, i, j).start()

    lldma = pltpu.make_async_copy(
        c_hbm.at[7 * level, b, pl.ds(i * dt, dt + hd),
                 pl.ds(j * (nr * c), wr * c)], llbuf, llsem)
    lldma.start()

    last_j = j == n_j - 1
    last_i = i == n_i - 1
    nxt_j = jnp.where(last_j, 0, j + 1)
    nxt_i = jnp.where(last_j, jnp.where(last_i, 0, i + 1), i)
    nxt_b = jnp.where(last_j & last_i, b + 1, b)
    mod_c = _lane_mod_c((dt + hd, wr * c), c)

    def adj_pair(u, w, shift):
        """Σ_k shift(g[k]·u + h[k]·w, −k) — one combined-adjoint step."""
        acc = None
        for k in range(m):
            t = g[k] * u + h[k] * w
            if k:
                t = shift(t, k)
            acc = t if acc is None else acc + t
        return acc

    lldma.wait()
    lll = _f32(llbuf[:])
    for lvl in range(level, 0, -1):
        d = 1 << (lvl - 1)
        off = level - lvl                    # slabs consumed this step
        slot = (step * level + off) % 2
        nxt_slot = (step * level + off + 1) % 2
        if lvl > 1:                          # prefetch the next level slab
            slab_dma(nxt_slot, lvl - 1, b, i, j).start()
        else:                                # ...or the next step's first

            @pl.when(step + 1 < total)
            def _():
                slab_dma(nxt_slot, level, nxt_b, nxt_i, nxt_j).start()

        slab_dma(slot, lvl, b, i, j).wait()
        cf = bufs[slot]                      # (7, dt + hd, wr·c)
        # adjoint shifts are −k·d; garbage creeps from the BOTTOM rows
        # (depth and plane-row creep both land in the suffix contexts)
        sh_d = lambda t, k: _shift_d(t, (dt + hd) - (k * d) % (dt + hd))
        sh_r = lambda t, k: _shift_r(t, -(k * d) % wr, wr, c)
        sh_c = lambda t, k: _shift_c(t, -(k * d) % c, c, mod_c)
        q_ll = adj_pair(lll, _f32(cf[3]), sh_d)          # (lll, hll)
        q_hl = adj_pair(_f32(cf[1]), _f32(cf[5]), sh_d)  # (lhl, hhl)
        cl = adj_pair(q_ll, q_hl, sh_r)
        q_lh = adj_pair(_f32(cf[0]), _f32(cf[4]), sh_d)  # (llh, hlh)
        q_hh = adj_pair(_f32(cf[2]), _f32(cf[6]), sh_d)  # (lhh, hhh)
        ch = adj_pair(q_lh, q_hh, sh_r)
        lll = adj_pair(cl, ch, sh_c)
    out_ref[0] = lll[:dt, :nr * c].astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("wavelet", "interpret"))
def imodwt3_fused(cf: jax.Array, wavelet: DiscreteWavelet,
                  interpret: bool | None = None) -> jax.Array:
    """Fused inverse 3D MODWT: (7·level+1, [B,] D, R, C) → ([B,] D, R, C)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    squeeze = cf.ndim == 4
    if squeeze:
        cf = cf[:, None]
    if cf.ndim != 5 or cf.shape[0] % 7 != 1:
        raise ValueError("imodwt3_fused expects a (7L+1, [B,] D, R, C) stack")
    rows, bsz, d0, r, c = cf.shape
    level = (rows - 1) // 7
    g64, h64 = modwt_base_filters(wavelet)
    m = int(g64.shape[0])
    sup = pallas3d_supported(d0, r, c, level, m)
    if sup is None:
        raise ValueError(f"unsupported shape {cf.shape} for fused 3D iMODWT")
    dt, hd, d_pad, nr, hr = sup
    # level-slab streaming holds 2×7-band slabs + LLL buffer + ~6 live
    # intermediates + double-buffered output block (see _inv3_kernel) —
    # heavier than the forward, so the inverse may pick SMALLER (dt, nr)
    # than the forward plan (it pads rows/depth itself, so the tilings
    # are independent).
    rc = r * c

    halo = _halo(m, level)

    def hr_for(nr_):
        # a whole-plane window keeps the plan's hr (0 ⇒ exact circular
        # row shifts); any SMALLER window MUST carry a row context or the
        # adjoint shifts wrap garbage into the last `halo` rows of every
        # tile (code-review r5: a forward hr=0 plan whose inverse re-plan
        # shrank nr silently corrupted rows nr-1, 2nr-1, … — reproduced
        # at (1, 8, 96, 128) Haar L1 before this fix)
        if nr_ == r:
            return hr
        return _aligned(halo, 128 // math.gcd(c, 128))

    def inv_fits(dt_, nr_):
        return (4 * (21 * (dt_ + hd) * (nr_ + hr_for(nr_)) * c
                     + 2 * dt_ * nr_ * c) + (1 << 20) <= 16 << 20)

    found = None
    for nr_i in sorted({n for n in (nr, r, 64, 32, 16, 8)
                        if n <= max(nr, r) and n >= 8 and r % n == 0
                        and (n * c) % 128 == 0
                        and (hr_for(n) * c) % 128 == 0}, reverse=True):
        for dt_i in (dt, dt // 2, 8):
            if dt_i >= 8 and d_pad % dt_i == 0 and inv_fits(dt_i, nr_i):
                found = (dt_i, nr_i)
                break
        if found:
            break
    if found is None:
        raise ValueError(f"VMEM budget exceeded for {cf.shape}")
    dt, nr = found
    hr = hr_for(nr)
    wl = (nr + hr) * c
    dtp = cf.dtype if cf.dtype in (jnp.float32, jnp.bfloat16) else jnp.float32
    g = tuple(np.asarray(g64, dtype=np.float32))
    h = tuple(np.asarray(h64, dtype=np.float32))
    cr = _pad_rows(cf.astype(dtp), hr, front=False)  # (rows, B, D, R+hr, C)
    cp = _pad_depth(cr.reshape(rows, bsz, d0, (r + hr) * c), d0, hd,
                    d_pad, front=False)
    n_i = d_pad // dt
    n_j = r // nr

    kernel = functools.partial(_inv3_kernel, g=g, h=h, level=level, hd=hd,
                               dt=dt, nr=nr, hr=hr, c=c, n_i=n_i, n_j=n_j,
                               out_dtype=dtp)
    interp = (jax.default_backend() != "tpu" if interpret is None
              else interpret)
    out = pl.pallas_call(
        kernel,
        grid=(bsz, n_i, n_j),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, dt, nr * c), lambda b, i, j: (b, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, d_pad, rc), dtp),
        scratch_shapes=[
            pltpu.VMEM((2, 7, dt + hd, wl), dtp),
            pltpu.VMEM((dt + hd, wl), dtp),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interp,
    )(cp)
    out = out[:, :d0].reshape(bsz, d0, r, c)
    return out[0] if squeeze else out
