"""Market-data preprocessing (ops/financial.py — the reference's
FINANCIAL_ROADMAP.md:29-120 FinancialWaveletTransform preprocessing chain,
implemented as composable jittable stages)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import jwave_pro_tpu as jw


@pytest.fixture
def rng():
    return np.random.default_rng(5)


def test_log_returns_roundtrip(rng):
    p = np.exp(np.cumsum(0.01 * rng.standard_normal((3, 256)), axis=-1)) * 50
    r = jw.log_returns(p)
    assert r.shape == p.shape and float(jnp.max(jnp.abs(r[..., 0]))) == 0.0
    back = np.asarray(jw.cumulate_returns(r, p[..., :1]))
    np.testing.assert_allclose(back, p, rtol=1e-12)


def test_fill_gaps_all_methods(rng):
    x = rng.standard_normal(64)
    x[[0, 1, 10, 11, 12, 63]] = np.nan
    f = np.asarray(jw.fill_gaps(x, "ffill"))
    assert np.isfinite(f).all()
    # leading NaNs backfilled with first finite value, interior carried fwd
    assert f[0] == f[1] == x[2]
    assert f[10] == f[11] == f[12] == x[9]
    assert f[63] == x[62]
    z = np.asarray(jw.fill_gaps(x, "zero"))
    assert (z[[0, 1, 10]] == 0).all() and z[2] == x[2]
    m = np.asarray(jw.fill_gaps(x, "mean"))
    np.testing.assert_allclose(m[0], np.nanmean(x))
    with np.testing.assert_raises(ValueError):
        jw.fill_gaps(x, "bogus")


def test_median_select_matches_np_median(rng):
    # exact sort-free selection (VERDICT r4 #4): bitwise bisection must
    # reproduce np.median bit-for-bit — even/odd lengths, heavy ties,
    # negatives, both dtypes, non-last axis
    # (4 lengths × 2 dtypes: each distinct (dtype, n) costs a fresh XLA
    # compile of the bisection loop — r5 suite diet trimmed the grid)
    for dt in (np.float32, np.float64):
        for n in (1, 2, 17, 100):
            dense = rng.standard_normal((3, n)).astype(dt) * 100
            ties = rng.integers(-3, 4, size=(3, n)).astype(dt)
            for x in (dense, ties):
                np.testing.assert_array_equal(
                    np.asarray(jw.median_select(jnp.asarray(x))),
                    np.median(x, axis=-1))
    x = rng.standard_normal((7, 5))
    np.testing.assert_array_equal(
        np.asarray(jw.median_select(jnp.asarray(x), axis=0)),
        np.median(x, axis=0))
    # NaN propagates per row, like jnp.median (code-review r5: keys sort
    # NaN above +inf, which silently biased gappy rows before the guard)
    xn = rng.standard_normal((2, 9))
    xn[0, 3] = np.nan
    m = np.asarray(jw.median_select(jnp.asarray(xn)))
    assert np.isnan(m[0]) and m[1] == np.median(xn[1])


def test_median_select_extreme_values():
    # ±inf, denormals, all-equal: contract is JNP.median parity (XLA
    # flushes the denormal mean to 0 where np.median keeps 7.5e-324 —
    # both implementations agree with each other, pinned here)
    for row in ([1.0, np.inf, -np.inf, 2.0], [np.inf, np.inf, 1.0],
                [5e-324, 1e-323, 2e-308, 0.0], [-np.inf, -np.inf],
                [3.0, 3.0, 3.0]):
        x = jnp.asarray(np.array([row]))
        np.testing.assert_array_equal(
            np.asarray(jw.median_select(x)),
            np.asarray(jnp.median(x, axis=-1)))


def test_matmul_cumsum_matches_jnp(rng):
    # r5: the expanding-RMS floor and realized vol ride an MXU triangular-
    # matmul prefix sum (XLA's log-N cumsum was the EWMA tier's dominant
    # cost); must match jnp.cumsum to summation-order noise, any length
    from jwave_pro_tpu.ops.financial import _cumsum_last
    for n in (7, 512, 1024, 1500, 4096):
        x = rng.standard_normal((3, n)).astype(np.float32)
        got = np.asarray(_cumsum_last(jnp.asarray(x)))
        want = np.cumsum(x, axis=-1)
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-4)


def test_ewma_head_only_warmup_is_exact(rng):
    # the min_periods blend reads the expanding mean ONLY at t < m_p, so
    # the r5 head-only cumsum must be identical to the full-length form
    r = 0.01 * rng.standard_normal((2, 300))
    sig = np.asarray(jw.ewma_volatility(jnp.asarray(r), min_periods=10))
    r2 = r * r
    var_ref = np.asarray(jw.ewma_volatility(jnp.asarray(r),
                                            min_periods=0)) ** 2
    t = np.arange(300)
    blend = np.minimum(t / 10.0, 1.0)
    var_exp = np.cumsum(r2, axis=-1) / (t + 1.0)
    want = np.sqrt(blend * var_ref + (1 - blend) * var_exp)
    np.testing.assert_allclose(sig, want, rtol=1e-6, atol=1e-12)


def test_median_select_jits_and_batches(rng):
    x = rng.standard_normal((2, 3, 64)).astype(np.float32)
    m = np.asarray(jax.jit(jw.median_select)(jnp.asarray(x)))
    np.testing.assert_array_equal(m, np.median(x, axis=-1))


def test_winsorize_is_robust_to_the_outlier_itself(rng):
    r = 0.01 * rng.standard_normal(512)
    r[100] = 5.0  # a fat-finger print
    w = np.asarray(jw.winsorize_outliers(r, n_sigmas=5.0))
    assert abs(w[100]) < 0.2            # clipped near 5 sigma of the MAD
    # everything ordinary is untouched
    mask = np.ones(512, bool); mask[100] = False
    np.testing.assert_allclose(w[mask], r[mask])
    # a std-based clip would have been inflated by the outlier: check the
    # MAD scale used is close to the clean sigma
    assert abs(w[100]) < 10 * 0.01 * 5


def test_ewma_volatility_tracks_regimes(rng):
    r = np.concatenate([0.01 * rng.standard_normal(500),
                        0.05 * rng.standard_normal(500)])
    sig = np.asarray(jw.ewma_volatility(r))
    assert 0.005 < sig[400] < 0.02
    assert 0.03 < sig[-1] < 0.08


def test_normalize_volatility_causal_and_unit_scale(rng):
    r = np.concatenate([0.01 * rng.standard_normal(800),
                        0.05 * rng.standard_normal(800)])
    z, sig = jw.normalize_volatility(r)
    z = np.asarray(z)
    # devolatized series has ~unit scale in BOTH regimes
    assert 0.6 < np.std(z[200:780]) < 1.7
    assert 0.6 < np.std(z[900:]) < 1.7
    # causality: z[t] = r[t]/sigma[t-1]
    np.testing.assert_allclose(z[1:] * np.asarray(sig)[:-1], r[1:],
                               rtol=1e-10)


def test_realized_volatility_window_sum(rng):
    r = rng.standard_normal((2, 128))
    rv = np.asarray(jw.realized_volatility(r, 16))
    want = np.sqrt(np.sum(r[:, 48:64] ** 2, axis=-1))
    np.testing.assert_allclose(rv[:, 63], want, rtol=1e-6)
    ann = np.asarray(jw.realized_volatility(r, 16, annualize=252.0))
    np.testing.assert_allclose(ann, rv * np.sqrt(252.0), rtol=1e-6)


def test_preprocess_chain_jits_and_feeds_transforms(rng):
    p = np.exp(np.cumsum(0.01 * rng.standard_normal((2, 1024)), axis=-1))
    p[0, 100:110] = np.nan
    p[1, 500] = p[1, 499] * 3.0  # an outlier jump
    z, sig = jax.jit(jw.preprocess_prices)(jnp.asarray(p))
    z = np.asarray(z)
    assert np.isfinite(z).all() and np.isfinite(np.asarray(sig)).all()
    # the output feeds the analysis tier directly
    w = jw.wavelet("Daubechies 4")
    nu2 = np.asarray(jw.modwt_variance(jnp.asarray(z), w, 4))
    assert np.isfinite(nu2).all() and (nu2 > 0).all()


def test_modwt_changepoints_detects_variance_break(rng):
    w = jw.wavelet("Daubechies 4")
    n = 4096
    r = np.concatenate([0.01 * rng.standard_normal(n // 2),
                        0.05 * rng.standard_normal(n // 2)])
    cp = jw.modwt_changepoints(jnp.asarray(r), w, 5)
    sig = np.asarray(cp.significant)
    loc = np.asarray(cp.locations)
    # a 5x global volatility switch fires at (at least) the fine scales,
    # localized near the true break
    assert sig[:3].all(), np.asarray(cp.d)
    assert (np.abs(loc[:3] - n // 2) < n // 10).all(), loc
    # homogeneous noise: no scale fires (asymptotic 5% per scale — use a
    # fixed seed known-good draw)
    r0 = 0.01 * np.random.default_rng(11).standard_normal(n)
    cp0 = jw.modwt_changepoints(jnp.asarray(r0), w, 5)
    assert not np.asarray(cp0.significant).any(), np.asarray(cp0.d)


def test_modwt_changepoints_batched_jit(rng):
    import jax
    w = jw.wavelet("Haar")
    x = jnp.asarray(rng.standard_normal((3, 1024)))
    cp = jax.jit(lambda v: jw.modwt_changepoints(v, w, 4))(x)
    assert cp.d.shape == (4, 3) and cp.locations.shape == (4, 3)
    assert cp.critical.shape == (4,)
    with np.testing.assert_raises(ValueError):
        jw.modwt_changepoints(x, w, 4, alpha=0.07)


def test_winsorize_degenerate_mad_is_noop(rng):
    # >50% identical values (thin sessions): MAD = 0 → NO clipping rather
    # than collapsing everything to the median (code-review r4.1)
    r = np.zeros(128)
    r[::7] = 0.01 * rng.standard_normal(len(r[::7]))
    out = np.asarray(jw.winsorize_outliers(r))
    np.testing.assert_array_equal(out, r)


def test_ewma_volatility_is_strictly_causal(rng):
    # sigma[:t] must not change when the FUTURE changes (backtest safety;
    # the old full-sample var0 seed leaked ahead — code-review r4.1)
    r = 0.01 * rng.standard_normal(256)
    r2 = r.copy()
    r2[200:] *= 50.0
    s1 = np.asarray(jw.ewma_volatility(jnp.asarray(r)))
    s2 = np.asarray(jw.ewma_volatility(jnp.asarray(r2)))
    np.testing.assert_allclose(s1[:200], s2[:200], rtol=1e-12)
    z1, _ = jw.normalize_volatility(jnp.asarray(r))
    z2, _ = jw.normalize_volatility(jnp.asarray(r2))
    np.testing.assert_allclose(np.asarray(z1)[:200], np.asarray(z2)[:200],
                               rtol=1e-10)


def test_ewma_lam_edge_cases(rng):
    r = jnp.asarray(0.01 * rng.standard_normal(64))
    # lam=0: sigma[t] = |r[t]| (after the warm-up blend)
    s0 = np.asarray(jw.ewma_volatility(r, lam=0.0, min_periods=0))
    np.testing.assert_allclose(s0, np.abs(np.asarray(r)), rtol=1e-6)
    with np.testing.assert_raises(ValueError):
        jw.ewma_volatility(r, lam=1.0)
    with np.testing.assert_raises(ValueError):
        jw.ewma_volatility(r, lam=-0.1)
    # integer returns promote instead of silently zeroing the FIR taps
    si = np.asarray(jw.ewma_volatility(jnp.arange(32), min_periods=0))
    assert si.dtype == np.float32 and (si[1:] > 0).all()


def test_normalize_volatility_halted_session_floor(rng):
    # one shock then a long flat stretch (a gap-filled halted session):
    # sigma decays to ~0 and the first resumed return must NOT be blown
    # up by a bare-eps divisor — the relative floor caps it near
    # 1/rel_floor of the series' running scale (code-review r4.1)
    n = 1024
    r = np.zeros(n, np.float32)
    r[10] = 0.05
    r[-1] = 0.01   # market resumes
    z, _ = jw.normalize_volatility(jnp.asarray(r))
    z = np.asarray(z)
    assert np.isfinite(z).all()
    assert abs(z[-1]) < 2.0 / 1e-3 * abs(r[-1]) / np.sqrt(np.mean(r**2)) \
        and abs(z[-1]) < 1e7, z[-1]
