"""Model registry alias.

In an ML framework the "models/" tier holds trainable architectures; the
analog in a wavelet-transform engine is the wavelet family registry — the
parameterized mathematical objects the transforms are instantiated with.
This module exposes them under the conventional name for discoverability:

    from jwave_pro_tpu import models
    w = models.get("Daubechies 4")        # == wavelets.wavelet(...)
    models.list_models()                  # all discrete + continuous names
"""
from __future__ import annotations

from .wavelets import (  # noqa: F401
    DiscreteWavelet, REGISTRY, biorthogonal, coiflet, daubechies,
    good_wavelets, legendre, symlet, wavelet, wavelet_names,
)
from .wavelets.continuous import (  # noqa: F401
    ContinuousWavelet, DOGWavelet, MexicanHatWavelet, MeyerWavelet,
    MorletWavelet, PaulWavelet, continuous_wavelet,
)

__all__ = ["get", "list_models", "wavelet", "continuous_wavelet",
           "wavelet_names", "good_wavelets"]

_CONTINUOUS_NAMES = ["Morlet", "Mexican Hat (Ricker)", "Paul", "DOG", "Meyer"]


def get(name: str, **kwargs):
    """Look up a discrete or continuous wavelet by name."""
    try:
        return wavelet(name, **kwargs)
    except ValueError:
        return continuous_wavelet(name, **kwargs)


def list_models(include_continuous: bool = True):
    names = wavelet_names()
    if include_continuous:
        names = names + _CONTINUOUS_NAMES
    return names
