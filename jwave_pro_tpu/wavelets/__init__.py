from .base import DiscreteWavelet, qmf_biorthogonal, qmf_orthonormal
from .families import REGISTRY, good_wavelets, wavelet, wavelet_names

__all__ = [
    "DiscreteWavelet", "qmf_biorthogonal", "qmf_orthonormal",
    "REGISTRY", "good_wavelets", "wavelet", "wavelet_names",
]
