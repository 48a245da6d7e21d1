"""Fused multi-level MODWT Pallas kernels for TPU.

Rationale: the XLA roll-formulation writes every level's (V, W) pair to HBM
and re-reads V for the next level — ~L·3·4 bytes/sample of traffic for an
L-level transform.  These kernels keep the whole level chain in VMEM: one
DMA of the (circularly pre-padded) signal window per tile, all levels
computed via statically-shifted slices, one write per output row.  Traffic
drops to (1 read + (L+1) writes)·4 bytes/sample — the HBM floor given the
transform's inherent (L+1)× output expansion.

Layout: signals are (B, N); one grid step processes a (SUBLANES, TILE)
window (sublane = batch row, lane = signal axis).  Tile windows overlap by
``halo = (M-1)·(2^L - 1)`` samples, which BlockSpec index maps cannot
express, so the input stays in HBM (``memory_space=ANY``) and each step DMAs
its window into VMEM scratch (double-buffered across grid steps by Mosaic's
automatic pipelining of the manual copy + compute).

Circular boundaries: the caller prepends the last ``halo`` samples (forward)
or appends the first ``halo`` (adjoint/inverse), so in-kernel indexing never
wraps.

Semantics are identical to ops/modwt.py's direct path (and therefore to
``MODWTTransform.circularConvolve`` on upsampled filters,
``MODWTTransform.java:677-716``).  Tests assert equality against the oracle
in interpret mode on CPU; the public API falls back to the XLA path for
unsupported shapes/dtypes/backends (see ops.modwt.modwt with
method='pallas'|'auto').
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from ..wavelets.base import DiscreteWavelet
from ..ops.modwt import _check_level, modwt_base_filters

__all__ = ["modwt_fused", "imodwt_fused", "pallas_supported"]

SUBLANES = 16      # preferred batch rows per grid step (falls back to 8)
DEFAULT_TILE = 8192  # lanes per grid step (VMEM: (L+1)·S·tile·4B out block, 2x buffered)


def _pick_sublanes(batch: int) -> int | None:
    # measured on v5e: S=16/tile=8192 → 13.0 Gs/s vs S=8 → 7.2, S=32 → 7.3
    for s in (16, 8):
        if batch % s == 0:
            return s
    return None


def _forward_kernel(x_hbm, out_ref, scratch, sem, *, g, h, level, halo, tile, sublanes):
    """One grid step: window (SUBLANES, tile+halo) → out (level+1, S, tile).

    Shifted taps are realized with ``pltpu.roll`` on full-width values —
    Mosaic requires 128-lane-aligned memref slices, so unaligned VMEM
    slicing is out; rolls rotate garbage into the (write-masked) halo lanes
    instead.  ``halo`` is pre-rounded to a multiple of 128 so the stored
    ``[halo:]`` tail slice is aligned.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    j = pl.program_id(1)
    m = len(g)
    copy = pltpu.make_async_copy(
        x_hbm.at[pl.ds(i * sublanes, sublanes), pl.ds(j * tile, tile + halo)],
        scratch, sem)
    copy.start()
    copy.wait()
    v = scratch[:, :]  # (S, tile + halo); garbage creeps in from the left
    for lvl in range(1, level + 1):
        d = 1 << (lvl - 1)
        w_acc = None
        v_acc = None
        for k in range(m):
            # output[n] needs input[n - k·d] → roll right by k·d
            seg = pltpu.roll(v, k * d, 1) if k else v
            w_acc = h[k] * seg if w_acc is None else w_acc + h[k] * seg
            v_acc = g[k] * seg if v_acc is None else v_acc + g[k] * seg
        out_ref[lvl - 1, :, :] = w_acc[:, halo:]
        v = v_acc
    out_ref[level, :, :] = v[:, halo:]


def _inverse_kernel(c_hbm, out_ref, scratch, sem, *, g, h, level, halo, tile, sublanes):
    """One grid step of the inverse: coefficient windows → signal tile.

    Implements V_{j-1} = adj(V_j, g̃_j) + adj(W_j, h̃_j) (MODWTTransform.
    java:337-375) with adj(y)[n] = Σ_k f[k]·y[n + k·d]; windows are
    right-extended so shifts never leave the buffer.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    j = pl.program_id(1)
    m = len(g)
    copy = pltpu.make_async_copy(
        c_hbm.at[:, pl.ds(i * sublanes, sublanes), pl.ds(j * tile, tile + halo)],
        scratch, sem)
    copy.start()
    copy.wait()
    v = scratch[level, :, :]  # (S, tile + halo); garbage creeps from right
    width = tile + halo
    for lvl in range(level, 0, -1):
        d = 1 << (lvl - 1)
        wrow = scratch[lvl - 1, :, :]
        acc = None
        for k in range(m):
            # adj: out[n] = Σ_k g[k]·v[n+kd] + h[k]·w[n+kd]
            #            = Σ_k roll(g[k]·v + h[k]·w, −kd)[n]
            # → combine the two branches BEFORE rolling: one roll per tap.
            # (pltpu.roll needs non-negative shift: left kd ≡ right width−kd)
            t = g[k] * v + h[k] * wrow
            t = pltpu.roll(t, width - k * d, 1) if k else t
            acc = t if acc is None else acc + t
        v = acc
    out_ref[:, :] = v[:, :tile]


def _aligned_halo(m: int, level: int) -> int:
    """Halo rounded up to the 128-lane tiling so stored slices are aligned."""
    halo = (m - 1) * ((1 << level) - 1)
    return -(-halo // 128) * 128


def pallas_supported(batch: int, n: int, level: int, m: int,
                     tile: int = DEFAULT_TILE):
    """Return (sublanes, tile), or None if the fused kernel can't run."""
    sub = _pick_sublanes(batch)
    if sub is None:
        return None
    halo = _aligned_halo(m, level)
    t = min(tile, n)
    while t >= 512:
        if n % t == 0 and halo < t:
            return (sub, t)
        t //= 2
    return None


def _pick_interpret(interpret):
    if interpret is not None:
        return interpret
    return jax.default_backend() != "tpu"


@functools.partial(jax.jit, static_argnames=("wavelet", "level", "tile",
                                             "interpret"))
def _modwt_fused_impl(x: jax.Array, wavelet: DiscreteWavelet, level: int,
                      tile: int = DEFAULT_TILE, interpret: bool | None = None
                      ) -> jax.Array:
    """Fused forward MODWT: x (B, N) → (level+1, B, N).

    Constraints: float32 (Mosaic lane rotates are 32-bit only), B % 8 == 0,
    N divisible by a power-of-two tile ≥ 512 that exceeds the halo.  Use
    :func:`ops.modwt.modwt` for the general path.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n = x.shape
    _check_level(n, level)
    g64, h64 = modwt_base_filters(wavelet)
    m = int(g64.shape[0])
    sup = pallas_supported(b, n, level, m, tile)
    if sup is None:
        raise ValueError(f"unsupported shape {x.shape} for fused MODWT")
    sublanes, tile = sup
    halo = _aligned_halo(m, level)
    dt = x.dtype
    g = tuple(np.asarray(g64, dtype=dt))
    h = tuple(np.asarray(h64, dtype=dt))
    xp = jnp.concatenate([x[:, n - halo:], x], axis=-1)  # circular left pad

    kernel = functools.partial(_forward_kernel, g=g, h=h, level=level,
                               halo=halo, tile=tile, sublanes=sublanes)
    return pl.pallas_call(
        kernel,
        grid=(b // sublanes, n // tile),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((level + 1, sublanes, tile),
                               lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((level + 1, b, n), dt),
        scratch_shapes=[
            pltpu.VMEM((sublanes, tile + halo), dt),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=_pick_interpret(interpret),
    )(xp)


@functools.partial(jax.jit, static_argnames=("wavelet", "tile", "interpret"))
def _imodwt_fused_impl(c: jax.Array, wavelet: DiscreteWavelet,
                       tile: int = DEFAULT_TILE, interpret: bool | None = None
                       ) -> jax.Array:
    """Fused inverse MODWT: (level+1, B, N) → (B, N)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows, b, n = c.shape
    level = rows - 1
    g64, h64 = modwt_base_filters(wavelet)
    m = int(g64.shape[0])
    sup = pallas_supported(b, n, level, m, tile)
    if sup is None:
        raise ValueError(f"unsupported shape {c.shape} for fused iMODWT")
    sublanes, tile = sup
    halo = _aligned_halo(m, level)
    dt = c.dtype
    g = tuple(np.asarray(g64, dtype=dt))
    h = tuple(np.asarray(h64, dtype=dt))
    cp = jnp.concatenate([c, c[:, :, :halo]], axis=-1)  # circular right pad

    kernel = functools.partial(_inverse_kernel, g=g, h=h, level=level,
                               halo=halo, tile=tile, sublanes=sublanes)
    return pl.pallas_call(
        kernel,
        grid=(b // sublanes, n // tile),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((sublanes, tile), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n), dt),
        scratch_shapes=[
            pltpu.VMEM((level + 1, sublanes, tile + halo), dt),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=_pick_interpret(interpret),
    )(cp)


# ---------------------------------------------------------------------------
# Autodiff: pallas_call has no automatic transpose, so the linear maps get
# explicit VJPs.  The MODWT analysis operator A satisfies Aᵀ = A⁻¹ with the
# reference's √2-normalized filter pipeline (that identity IS the perfect-
# reconstruction property, MODWTTransform.java:337-375), and the cotangent
# recursion of A is structurally the imodwt adjoint chain — so each fused
# kernel's VJP is simply the other kernel.
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def modwt_fused(x, wavelet, level, tile=DEFAULT_TILE, interpret=None):
    """Fused forward MODWT: x (B, N) → (level+1, B, N); differentiable."""
    return _modwt_fused_impl(x, wavelet, level, tile, interpret)


def _modwt_fwd(x, wavelet, level, tile, interpret):
    return _modwt_fused_impl(x, wavelet, level, tile, interpret), None


def _modwt_bwd(wavelet, level, tile, interpret, _, cot):
    return (_imodwt_fused_impl(cot, wavelet, tile, interpret),)


modwt_fused.defvjp(_modwt_fwd, _modwt_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def imodwt_fused(c, wavelet, tile=DEFAULT_TILE, interpret=None):
    """Fused inverse MODWT: (level+1, B, N) → (B, N); differentiable."""
    return _imodwt_fused_impl(c, wavelet, tile, interpret)


def _imodwt_fwd(c, wavelet, tile, interpret):
    return _imodwt_fused_impl(c, wavelet, tile, interpret), c.shape[0] - 1


def _imodwt_bwd(wavelet, tile, interpret, level, cot):
    return (_modwt_fused_impl(cot, wavelet, level, tile, interpret),)


imodwt_fused.defvjp(_imodwt_fwd, _imodwt_bwd)
