"""Fused MODWT kernel tests — interpret mode on CPU (the real-TPU numeric
check is tools/tpu_smoke.py; CLAUDE.md: CPU tests cannot catch TPU-only
precision issues, but interpret mode pins the kernel's *semantics* against
the XLA direct path for every structural variant: folds, dtypes, levels)."""
import numpy as np
import pytest

import jax.numpy as jnp

import jwave_pro_tpu as jw
from jwave_pro_tpu.kernels.modwt_pallas import (
    imodwt_fused, modwt_fused, pallas_supported,
)

DB4 = jw.wavelet("Daubechies 4")


def _ref(x, level):
    return np.asarray(jw.modwt(np.asarray(x, np.float64), DB4, level,
                               method="direct"))


@pytest.mark.parametrize("batch,n,level", [
    (8, 2048, 3),     # fold=1 (sublanes 8)
    (16, 2048, 2),    # fold=1 (sublanes 16)
    (1, 16384, 3),    # batch=1 → folded (VERDICT r1 weak #6)
    (2, 8192, 2),     # small batch → folded
    (3, 16384, 2),    # non-pow2 batch → folded to 48 rows
])
def test_forward_matches_direct(batch, n, level, rng):
    x = jnp.asarray(rng.standard_normal((batch, n)), jnp.float32)
    assert pallas_supported(batch, n, level, DB4.length) is not None
    got = np.asarray(modwt_fused(x, DB4, level, interpret=True))
    np.testing.assert_allclose(got, _ref(x, level), atol=2e-5)


@pytest.mark.parametrize("batch,n,level", [
    (8, 2048, 3),
    (1, 16384, 3),
    (2, 8192, 2),
])
def test_roundtrip(batch, n, level, rng):
    x = jnp.asarray(rng.standard_normal((batch, n)), jnp.float32)
    c = modwt_fused(x, DB4, level, interpret=True)
    xr = np.asarray(imodwt_fused(c, DB4, interpret=True))
    np.testing.assert_allclose(xr, np.asarray(x), atol=2e-5)


def test_level1_inverse(rng):
    x = jnp.asarray(rng.standard_normal((8, 2048)), jnp.float32)
    c = modwt_fused(x, DB4, 1, interpret=True)
    xr = np.asarray(imodwt_fused(c, DB4, interpret=True))
    np.testing.assert_allclose(xr, np.asarray(x), atol=2e-5)


def test_bfloat16_runs_fused(rng):
    """bf16 input: DMA'd at half traffic, computed in f32 in-VMEM."""
    x32 = jnp.asarray(rng.standard_normal((8, 2048)), jnp.float32)
    x16 = x32.astype(jnp.bfloat16)
    c = modwt_fused(x16, DB4, 3, interpret=True)
    assert c.dtype == jnp.bfloat16
    # bf16 has ~3 decimal digits; compare against f64 reference loosely
    np.testing.assert_allclose(np.asarray(c, np.float64),
                               _ref(x32, 3), atol=3e-2)
    xr = imodwt_fused(c, DB4, interpret=True)
    assert xr.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(xr, np.float64),
                               np.asarray(x32, np.float64), atol=5e-2)


def test_plan_fold_preferences():
    # unfolded always wins (fold prep costs an XLA re-layout pass)
    sub, tile, fold = pallas_supported(8, 1 << 20, 5, 8)
    assert sub == 8 and fold == 1
    sub, tile, fold = pallas_supported(32, 1 << 20, 5, 8)
    assert sub == 16 and fold == 1
    # mandatory fold: prefer 16 sublanes with smallest fold
    sub, tile, fold = pallas_supported(1, 1 << 20, 5, 8)
    assert sub == 16 and fold == 16
    sub, tile, fold = pallas_supported(2, 1 << 20, 5, 8)
    assert sub == 16 and fold == 8
    assert pallas_supported(5, 999, 5, 8) is None  # nothing divides


def test_batch1_long_series_parity(rng):
    """The financial use case: one long series, folded across sublanes —
    seams between folds must be exact (they carry real circular context)."""
    n = 1 << 15
    x = jnp.asarray(rng.standard_normal((1, n)), jnp.float32)
    got = np.asarray(modwt_fused(x, DB4, 5, interpret=True))
    want = _ref(x, 5)
    np.testing.assert_allclose(got, want, atol=2e-5)
    # check specifically around fold seams
    sub, tile, fold = pallas_supported(1, n, 5, DB4.length)
    seam = n // fold
    np.testing.assert_allclose(got[..., seam - 64:seam + 64],
                               want[..., seam - 64:seam + 64], atol=2e-5)


def test_grad_through_fused(rng):
    import jax

    x = jnp.asarray(rng.standard_normal((8, 2048)), jnp.float32)
    g = jax.grad(lambda v: jnp.sum(
        modwt_fused(v, DB4, 2, 8192, True) ** 2))(x)
    # A is orthonormal-ish (PR property): grad of ||Ax||² = 2·AᵀAx = 2x
    np.testing.assert_allclose(np.asarray(g), 2 * np.asarray(x), atol=1e-4)
