"""Golden-vector regression tests (tests/golden/golden.npz pins the fast
paths against the float64 oracle outputs; see tools/generate_golden.py)."""
from pathlib import Path

import numpy as np
import pytest

import jwave_pro_tpu as jw

GOLDEN = Path(__file__).parent / "golden" / "golden.npz"


@pytest.fixture(scope="module")
def golden():
    if not GOLDEN.exists():
        pytest.skip("golden.npz not generated")
    return np.load(GOLDEN)


def _wname(key):
    return key.replace("_", " ").replace("-", "/")


def test_fwt_golden(golden):
    x = golden["input_64"]
    for key in [k for k in golden.files if k.startswith("fwt_")]:
        w = jw.wavelet(_wname(key[4:]))
        got = np.asarray(jw.fwt(x, w))
        np.testing.assert_allclose(got, golden[key], atol=1e-10, err_msg=key)


def test_wpt_golden(golden):
    x = golden["input_64"]
    for key in [k for k in golden.files if k.startswith("wpt_")]:
        w = jw.wavelet(_wname(key[4:]))
        got = np.asarray(jw.wpt(x, w, 3))
        np.testing.assert_allclose(got, golden[key], atol=1e-10, err_msg=key)


def test_modwt_golden(golden):
    x = golden["input_100"]
    for key in [k for k in golden.files if k.startswith("modwt_")]:
        w = jw.wavelet(_wname(key[6:-3]))
        got = np.asarray(jw.modwt(x, w, 4, method="direct"))
        np.testing.assert_allclose(got, golden[key], atol=1e-10, err_msg=key)
