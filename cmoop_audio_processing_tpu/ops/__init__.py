"""Compute ops index: the framework's device-kernel surface in one place.

The hot-path kernels live with their subsystems; this package re-exports
them so the op inventory is discoverable at a glance:

* audio frontend GEMM pipeline + fused Pallas kernel (frontend/)
* population forward passes: masked supernet, grouped-conv (models/)
* training-step machinery: macro-FPR matmul, dataset padding (engine/)
* GP kernels: Matern/RBF/White Gram matrices as MXU matmuls (surrogate/)
"""

from ..engine.trainer import macro_fpr, pad_dataset
from ..frontend.features import log_mel, mfcc, stft_power
from ..frontend.pallas_kernels import log_mel_fused, mfcc_fused
from ..models.grouped import apply_population
from ..models.supernet import apply_model
from ..surrogate.kernels import matern, rbf, scaled_matern_white, sqdist

__all__ = [
    "macro_fpr",
    "pad_dataset",
    "log_mel",
    "mfcc",
    "stft_power",
    "log_mel_fused",
    "mfcc_fused",
    "apply_population",
    "apply_model",
    "matern",
    "rbf",
    "scaled_matern_white",
    "sqdist",
]
