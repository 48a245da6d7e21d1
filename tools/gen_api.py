#!/usr/bin/env python3
"""Regenerate docs/API.md from module ``__all__``s + docstring summaries.

Run on CPU:  python tools/gen_api.py
"""
from __future__ import annotations

import importlib
import inspect
import sys
from pathlib import Path

import jax

jax.config.update("jax_platforms", "cpu")

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

SECTIONS = [
    ("jwave_pro_tpu", "Top-level functional API"),
    ("jwave_pro_tpu.wavelets", "Wavelet registry"),
    ("jwave_pro_tpu.wavelets.continuous", "Continuous wavelets"),
    ("jwave_pro_tpu.ops.fwt", "Fast Wavelet Transform"),
    ("jwave_pro_tpu.ops.wpt", "Wavelet Packet Transform + best basis"),
    ("jwave_pro_tpu.ops.modwt", "MODWT"),
    ("jwave_pro_tpu.ops.modwt2d", "2D MODWT"),
    ("jwave_pro_tpu.ops.modwpt", "MODWPT (shift-invariant packets)"),
    ("jwave_pro_tpu.ops.analysis", "Wavelet variance/covariance"),
    ("jwave_pro_tpu.ops.cwt", "Continuous Wavelet Transform (+ inverse)"),
    ("jwave_pro_tpu.ops.cwt2d", "2D Continuous Wavelet Transform"),
    ("jwave_pro_tpu.ops.ssq", "Synchrosqueezed CWT"),
    ("jwave_pro_tpu.ops.ridge", "Ridge extraction"),
    ("jwave_pro_tpu.ops.dtcwt", "Dual-tree complex WT"),
    ("jwave_pro_tpu.ops.ewt", "Empirical wavelet transform"),
    ("jwave_pro_tpu.ops.mp", "Matching pursuit"),
    ("jwave_pro_tpu.ops.scattering", "Wavelet scattering (1D)"),
    ("jwave_pro_tpu.ops.scattering2d", "Wavelet scattering (2D)"),
    ("jwave_pro_tpu.ops.fft", "Fourier transforms"),
    ("jwave_pro_tpu.ops.lifting", "Lifting schemes (CDF 5/3, 9/7)"),
    ("jwave_pro_tpu.ops.arbitrary", "Arbitrary-length wrappers"),
    ("jwave_pro_tpu.ops.compress", "Threshold compression"),
    ("jwave_pro_tpu.ops.denoise", "Denoising"),
    ("jwave_pro_tpu.ops.pywt_compat", "PyWavelets-style API"),
    ("jwave_pro_tpu.transforms", "Object facade + builders"),
    ("jwave_pro_tpu.parallel", "Meshes + sharded transforms"),
    ("jwave_pro_tpu.streaming", "Streaming + chunked processing"),
    ("jwave_pro_tpu.kernels.modwt_pallas", "Fused TPU kernels"),
    ("jwave_pro_tpu.kernels.denoise_pallas", "Fused single-pass denoise"),
    ("jwave_pro_tpu.kernels.variance_pallas", "Fused wavelet variance"),
    ("jwave_pro_tpu.kernels.cwt_pallas", "Fused CWT kernel"),
    ("jwave_pro_tpu.datatypes", "Data stores"),
    ("jwave_pro_tpu.exceptions", "Exception hierarchy"),
    ("jwave_pro_tpu.utils.validation", "Shape/level helpers"),
    ("jwave_pro_tpu.utils.signals", "Test-signal generators"),
    ("jwave_pro_tpu.utils.profiling", "Profiling helpers"),
]


def _kind(obj) -> str:
    if inspect.isclass(obj):
        return "class"
    if callable(obj):
        return "fn"
    return "const"


def _summary(obj) -> str:
    doc = inspect.getdoc(obj) or ""
    return doc.split("\n", 1)[0].strip()


def main() -> None:
    lines = [
        "# API reference (public surface)",
        "",
        "Generated from module `__all__`s and docstring summaries "
        "(`tools/gen_api.py`).",
    ]
    for modname, title in SECTIONS:
        mod = importlib.import_module(modname)
        names = getattr(mod, "__all__", None)
        if names is None:
            names = [n for n in dir(mod) if not n.startswith("_")]
        lines += ["", f"## `{modname}` — {title}", ""]
        for name in sorted(names):
            obj = getattr(mod, name)
            summ = _summary(obj)
            lines.append(f"- **`{name}`** ({_kind(obj)}) — {summ}")
    out = ROOT / "docs" / "API.md"
    out.write_text("\n".join(lines) + "\n")
    print(f"wrote {out} ({len(lines)} lines)")


if __name__ == "__main__":
    main()
