"""Synchrosqueezed CWT tests: sharpening, ridge tracking, mode extraction.

Beyond-reference tier (the reference's CWT stops at scalograms); referee is
the mathematics: the phase transform of a tone must sit at its frequency,
ridges must track a chirp's instantaneous frequency, Σ_bins Tx must equal
the icwt weighted scale sum, and band-masked inversion must pull individual
modes out of a mixture.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import jwave_pro_tpu as jw

FS = 200.0
SCALES = jw.generate_log_scales(0.01, 0.2, 64)


def _two_tone():
    t = np.arange(2048) / FS
    return t, np.sin(2 * np.pi * 15 * t) + 0.7 * np.sin(2 * np.pi * 45 * t)


def test_tone_bins_and_sharpening():
    _, x = _two_tone()
    res = jw.ssq_cwt(x, SCALES, sampling_rate=FS)
    assert res.Tx.shape == (64, 2048)
    freqs = np.asarray(res.ssq_freqs)
    prof = np.asarray(res.energy_profile)
    # the two strongest bins sit on the two tones
    top2 = np.sort(freqs[np.argsort(prof)[::-1][:2]])
    assert abs(top2[0] - 15.0) / 15.0 < 0.06
    assert abs(top2[1] - 45.0) / 45.0 < 0.06
    # synchrosqueezing concentrates: far fewer active bins than the CWT
    # has active scales (energy fraction > 1% of total)
    cwt_prof = np.asarray(jnp.sum(jnp.abs(res.Wx) ** 2, axis=-1))
    active = lambda p: int((p / p.sum() > 0.01).sum())
    assert active(prof) * 4 <= active(cwt_prof)


def test_tx_sum_equals_icwt_weighted_sum():
    # Σ_l Tx[l, t] must equal Σ_a Δln(a)/√a·W(a, t) up to the dropped
    # below-threshold / out-of-band coefficients (tiny for in-band tones).
    _, x = _two_tone()
    res = jw.ssq_cwt(x, SCALES, sampling_rate=FS)
    from jwave_pro_tpu.ops.cwt import _icwt_weights
    w = _icwt_weights(np.asarray(SCALES))
    want = np.einsum("s,st->t", w, np.asarray(res.Wx))
    got = np.asarray(jnp.sum(res.Tx, axis=-2))
    denom = np.abs(want).max()
    assert np.abs(got - want).max() < 0.02 * denom


def test_chirp_ridge_tracks_instantaneous_frequency():
    # linear chirp 10 → 60 Hz: argmax bin per time ≈ true IF
    t = np.arange(4096) / FS
    f0, f1 = 10.0, 60.0
    k = (f1 - f0) / t[-1]
    x = np.sin(2 * np.pi * (f0 * t + 0.5 * k * t * t))
    res = jw.ssq_cwt(x, SCALES, sampling_rate=FS, n_freqs=128)
    freqs = np.asarray(res.ssq_freqs)
    ridge = freqs[np.argmax(np.abs(np.asarray(res.Tx)), axis=0)]
    true_if = f0 + k * t
    sl = slice(256, -256)  # interior (edges smear)
    rel = np.abs(ridge[sl] - true_if[sl]) / true_if[sl]
    assert np.median(rel) < 0.04
    assert np.mean(rel < 0.15) > 0.95


def test_roundtrip_and_mode_extraction():
    t, x = _two_tone()
    res = jw.ssq_cwt(x, SCALES, sampling_rate=FS)
    xr = np.asarray(jw.issq_cwt(res))
    sl = slice(128, -128)
    rel = np.linalg.norm(xr[sl] - x[sl]) / np.linalg.norm(x[sl])
    assert rel < 0.02
    # band-masked inversion isolates each tone
    m15 = np.asarray(jw.issq_cwt(res, freq_range=(10.0, 22.0)))
    m45 = np.asarray(jw.issq_cwt(res, freq_range=(35.0, 60.0)))
    ref15 = np.sin(2 * np.pi * 15 * t)
    ref45 = 0.7 * np.sin(2 * np.pi * 45 * t)
    assert np.corrcoef(m15[sl], ref15[sl])[0, 1] > 0.99
    assert np.corrcoef(m45[sl], ref45[sl])[0, 1] > 0.99
    # and the two modes reassemble the signal
    rel2 = np.linalg.norm((m15 + m45)[sl] - x[sl]) / np.linalg.norm(x[sl])
    assert rel2 < 0.05


def test_batched_and_jitted():
    t, x = _two_tone()
    xs = np.stack([x, np.roll(x, 100)])
    scales_t = tuple(float(s) for s in SCALES)

    @jax.jit
    def f(v):
        r = jw.ssq_cwt(v, scales_t, sampling_rate=FS)
        return r.Tx, jw.issq_cwt(r, scales=scales_t)

    tx, xr = f(jnp.asarray(xs))
    assert tx.shape == (2, 64, 2048)
    single = jw.ssq_cwt(xs[1], scales_t, sampling_rate=FS).Tx
    np.testing.assert_allclose(np.asarray(tx[1]), np.asarray(single),
                               rtol=0, atol=1e-10)
    sl = slice(128, -128)
    rel = np.linalg.norm(np.asarray(xr)[0, sl] - xs[0, sl]) \
        / np.linalg.norm(xs[0, sl])
    assert rel < 0.02


def test_paul_wavelet_ssq():
    # the other analytic family must work too
    t = np.arange(2048) / FS
    x = np.sin(2 * np.pi * 25 * t)
    w = jw.PaulWavelet(4)
    res = jw.ssq_cwt(x, SCALES, w, sampling_rate=FS)
    freqs = np.asarray(res.ssq_freqs)
    best = freqs[np.argmax(np.asarray(res.energy_profile))]
    assert abs(best - 25.0) / 25.0 < 0.08
    xr = np.asarray(jw.issq_cwt(res, w))
    sl = slice(128, -128)
    assert np.linalg.norm(xr[sl] - x[sl]) / np.linalg.norm(x[sl]) < 0.05


def test_freq_range_and_validation():
    t, x = _two_tone()
    res = jw.ssq_cwt(x, SCALES, sampling_rate=FS, n_freqs=32,
                     freq_range=(5.0, 80.0))
    assert res.Tx.shape == (32, 2048)
    f = np.asarray(res.ssq_freqs)
    assert f[0] == pytest.approx(5.0) and f[-1] == pytest.approx(80.0)
    with pytest.raises(ValueError):
        jw.ssq_cwt(x, SCALES, freq_range=(10.0, 2.0))
    with pytest.raises(ValueError):
        jw.ssq_cwt(x, [-1.0, 2.0])
    with pytest.raises(ValueError):
        jw.ssq_cwt(x, SCALES, n_freqs=1)
    with pytest.raises(ValueError):
        jw.ssq_cwt(x.astype(np.complex128), SCALES)
    with pytest.raises(ValueError):
        jw.issq_cwt(res, freq_range=(500.0, 600.0))


def test_ssq_traced_scales_clear_error(rng):
    x = rng.standard_normal(256).astype(np.float32)
    with pytest.raises((ValueError, TypeError), match="STATIC|static"):
        jax.jit(lambda v, s: jw.ssq_cwt(v, s).Tx)(x, jnp.asarray([4.0, 8.0]))


def test_half_irfft_chunked_parity(rng):
    # the lax.map-chunked scale axis must match the unchunked product
    # (shared by cwt and ssq_cwt; knee shapes are too big for CPU tests,
    # so force chunk < s_count directly)
    from jwave_pro_tpu.ops.cwt import _half_irfft_chunked
    n = 256
    xh = jnp.asarray(rng.standard_normal((3, 1, n // 2 + 1))
                     + 1j * rng.standard_normal((3, 1, n // 2 + 1)),
                     jnp.complex64)
    mult = rng.standard_normal((8, n // 2 + 1)).astype(np.float32)
    full = _half_irfft_chunked(xh, mult, n, n, jnp.complex64, jnp.float32, 8)
    chunked = _half_irfft_chunked(xh, mult, n, n, jnp.complex64,
                                  jnp.float32, 2)
    assert chunked.shape == (3, 8, n)
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(full),
                               atol=1e-5)


class TestRidgeExtraction:
    def test_two_tone_flat_ridges(self, rng):
        fs = 1024.0
        t = np.arange(2048) / fs
        x = (np.sin(2 * np.pi * 60 * t)
             + 0.6 * np.sin(2 * np.pi * 190 * t)).astype(np.float32)
        fc = float(jw.MorletWavelet().center_frequency)
        scales = np.asarray(jw.generate_log_scales(fc / 300, fc / 30, 48))
        res = jw.ssq_cwt(x, scales, sampling_rate=fs)
        r = jw.extract_ridges(res.Tx, np.asarray(res.ssq_freqs), n_ridges=2,
                              mask_width=4)
        f = np.sort(np.median(np.asarray(r.frequencies), axis=-1))
        # strongest ridge first; frequencies within one log-bin
        np.testing.assert_allclose(f, [60.0, 190.0], rtol=0.06)
        assert np.asarray(r.energy)[0] >= np.asarray(r.energy)[1]

    def test_chirp_tracks_instantaneous_frequency(self, rng):
        fs = 2048.0
        n = 4096
        t = np.arange(n) / fs
        f0, f1 = 80.0, 320.0
        phase = 2 * np.pi * (f0 * t + (f1 - f0) * t ** 2 / (2 * t[-1]))
        x = np.sin(phase).astype(np.float32)
        fc = float(jw.MorletWavelet().center_frequency)
        scales = np.asarray(jw.generate_log_scales(fc / 400, fc / 50, 64))
        res = jw.ssq_cwt(x, scales, sampling_rate=fs)
        r = jw.extract_ridges(res.Tx, np.asarray(res.ssq_freqs),
                              penalty=1.0)
        truth = f0 + (f1 - f0) * t / t[-1]
        got = np.asarray(r.frequencies)[0]
        mid = slice(n // 8, -n // 8)  # ignore edge cones
        med_rel = np.median(np.abs(got[mid] - truth[mid]) / truth[mid])
        assert med_rel < 0.05, med_rel

    def test_penalty_rigidifies_against_noise(self, rng):
        fs = 512.0
        t = np.arange(1024) / fs
        x = (np.sin(2 * np.pi * 50 * t)
             + 0.8 * rng.standard_normal(1024)).astype(np.float32)
        fc = float(jw.MorletWavelet().center_frequency)
        scales = np.asarray(jw.generate_log_scales(fc / 120, fc / 15, 32))
        res = jw.ssq_cwt(x, scales, sampling_rate=fs)
        jumpy = np.asarray(jw.extract_ridges(res.Tx, penalty=0.0).indices[0])
        smooth = np.asarray(jw.extract_ridges(res.Tx, penalty=8.0).indices[0])
        assert np.abs(np.diff(smooth)).sum() <= np.abs(np.diff(jumpy)).sum()

    def test_batched_and_jit(self, rng):
        import jax
        xb = rng.standard_normal((2, 3, 16, 128)).astype(np.float32)
        r = jax.jit(lambda p: jw.extract_ridges(p, n_ridges=2).indices)(xb)
        assert r.shape == (2, 3, 2, 128)
        with pytest.raises(ValueError):
            jw.extract_ridges(np.zeros((4, 8)), n_ridges=5)


def test_ridge_mask_budget_guard(rng):
    with pytest.raises(ValueError, match="mask"):
        jw.extract_ridges(rng.standard_normal((8, 32)), n_ridges=3,
                          mask_width=2)
