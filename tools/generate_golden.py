#!/usr/bin/env python3
"""Generate golden test vectors into tests/golden/ (pure numpy, no JAX).

The analog of the reference's ``scripts/generate_reference_data.py`` (which
needs pywt/scipy): coefficients come from the brute-force oracles in
``tests/oracles.py`` — independent re-statements of the reference's scalar
loops — evaluated in float64 on deterministic signals.  Committed as .npz so
the fast TPU paths are pinned against drift (``tests/test_golden.py``).
"""
from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tests"))

import oracles  # noqa: E402

import jwave_pro_tpu as jw  # noqa: E402  (registry only; oracles do the math)

OUT = ROOT / "tests" / "golden"

WAVELETS_FWT = ["Haar", "Haar orthogonal", "Daubechies 2", "Daubechies 4",
                "Daubechies 20", "Symlet 8", "Coiflet 3", "BiOrthogonal 3/5",
                "BiOrthogonal 1/1", "Discrete Meyer"]
WAVELETS_MODWT = ["Haar", "Daubechies 4", "Symlet 8"]


def main():
    OUT.mkdir(exist_ok=True)
    rng = np.random.default_rng(20260817)
    sig64 = rng.standard_normal(64)
    sig100 = rng.standard_normal(100)

    payload = {"input_64": sig64, "input_100": sig100}
    for name in WAVELETS_FWT:
        w = jw.wavelet(name)
        key = name.replace(" ", "_").replace("/", "-")
        payload[f"fwt_{key}"] = oracles.fwt(sig64, w)
        payload[f"wpt_{key}"] = oracles.wpt(sig64, w, 3)
    for name in WAVELETS_MODWT:
        w = jw.wavelet(name)
        key = name.replace(" ", "_")
        payload[f"modwt_{key}_L4"] = oracles.modwt(sig100, w, 4)

    np.savez_compressed(OUT / "golden.npz", **payload)
    print(f"wrote {OUT/'golden.npz'} with {len(payload)} arrays")


if __name__ == "__main__":
    main()
