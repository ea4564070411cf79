"""TPU-native audio frontend: wav -> frames -> DFT -> mel -> log / MFCC as
matmuls.

The reference consumed features produced offline by the librosa/TF stack
(SURVEY.md §2.2 "librosa/soxr/numba" row). The TPU-first design observes
that every stage after framing is a matrix product, which is exactly what
the MXU wants (GEMM-native DFT — no FFT butterflies, no scalar loops):

    P[f, k] = (frames ⊙ window) @ [cos | sin]      one (T x n_fft)(n_fft x 2K) GEMM
    power   = P_cos^2 + P_sin^2                    VPU elementwise
    mel     = power @ M^T                          (T x K)(K x n_mels) GEMM
    logmel  = 10 log10(clamp(mel))                 VPU
    mfcc    = logmel @ D^T                         (T x n_mels)(n_mels x n_mfcc)

For KWS shapes (n_fft=512, 1-second clips) the DFT matrix is ~1 MB — it
lives in VMEM and the whole pipeline is one fused program. A hand-fused
Pallas kernel for the hot path lives in frontend/pallas_kernels.py;
this module is the XLA-fusion path and the numerical contract (bit-matched
against frontend/reference_impl.py, which follows librosa's conventions).

Batched: all functions accept (batch, samples) and produce
(batch, n_frames, n_feats); vmap/jit friendly, static shapes throughout.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import reference_impl as ref


@dataclasses.dataclass(frozen=True)
class FrontendConfig:
    sr: int = 16000
    n_fft: int = 512
    hop_length: int = 160
    win_length: Optional[int] = None
    n_mels: int = 40
    n_mfcc: int = 13
    fmin: float = 0.0
    fmax: Optional[float] = None
    center: bool = True
    log: str = "db"  # "db" (librosa power_to_db) | "natural" (ln(mel+1e-6))
    top_db: Optional[float] = 80.0
    compute_dtype: str = "float32"

    @property
    def n_bins(self) -> int:
        return self.n_fft // 2 + 1


def dft_matrices(cfg: FrontendConfig) -> np.ndarray:
    """(n_fft, 2*n_bins) windowed real-DFT matrix [cos | -sin], window
    folded in so framing feeds the GEMM directly."""
    n = np.arange(cfg.n_fft)[:, None]
    k = np.arange(cfg.n_bins)[None, :]
    ang = 2.0 * np.pi * n * k / cfg.n_fft
    win_length = cfg.win_length or cfg.n_fft
    window = ref.hann_periodic(win_length)
    pad = cfg.n_fft - win_length
    window = np.pad(window, (pad // 2, pad - pad // 2))
    cos = np.cos(ang) * window[:, None]
    sin = -np.sin(ang) * window[:, None]
    return np.concatenate([cos, sin], axis=1).astype(np.float32)


def frame_indices(n_samples: int, cfg: FrontendConfig) -> np.ndarray:
    padded = n_samples + (cfg.n_fft if cfg.center else 0)
    n_frames = 1 + (padded - cfg.n_fft) // cfg.hop_length
    return (
        np.arange(n_frames)[:, None] * cfg.hop_length
        + np.arange(cfg.n_fft)[None, :]
    )


def _frame(y: jnp.ndarray, cfg: FrontendConfig) -> jnp.ndarray:
    """(batch, samples) -> (batch, n_frames, n_fft) with reflect centering."""
    if cfg.center:
        pad = cfg.n_fft // 2
        y = jnp.pad(y, ((0, 0), (pad, pad)), mode="reflect")
    idx = jnp.asarray(frame_indices(y.shape[1] - (cfg.n_fft if cfg.center else 0), cfg))
    return y[:, idx]


@partial(jax.jit, static_argnames=("cfg",))
def stft_power(y: jnp.ndarray, cfg: FrontendConfig = FrontendConfig()) -> jnp.ndarray:
    """(batch, samples) -> (batch, n_frames, n_bins) power spectrogram."""
    dtype = jnp.dtype(cfg.compute_dtype)
    frames = _frame(y.astype(jnp.float32), cfg)
    w = jnp.asarray(dft_matrices(cfg))
    # Precision.HIGHEST: TPU f32 matmuls default to bf16-grade MXU passes,
    # which breaks the librosa bit-match contract; the DFT/mel GEMMs must run
    # at full f32 precision.
    proj = jnp.einsum(
        "btn,nk->btk", frames.astype(dtype), w.astype(dtype),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    re, im = jnp.split(proj, 2, axis=-1)
    return re * re + im * im


def mel_matrix(cfg: FrontendConfig) -> np.ndarray:
    return ref.mel_filterbank(
        cfg.sr, cfg.n_fft, cfg.n_mels, cfg.fmin, cfg.fmax
    ).astype(np.float32)


@partial(jax.jit, static_argnames=("cfg",))
def log_mel(y: jnp.ndarray, cfg: FrontendConfig = FrontendConfig()) -> jnp.ndarray:
    """(batch, samples) -> (batch, n_frames, n_mels) log-mel features."""
    p = stft_power(y, cfg)
    m = jnp.asarray(mel_matrix(cfg))
    mel = jnp.einsum(
        "btk,mk->btm", p, m, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    if cfg.log == "natural":
        return jnp.log(mel + 1e-6)
    amin = 1e-10
    db = 10.0 * jnp.log10(jnp.maximum(mel, amin))
    if cfg.top_db is not None:
        # per-sample reference: max over that sample's spectrogram
        ref_db = 10.0 * jnp.log10(
            jnp.maximum(jnp.max(mel, axis=(1, 2), keepdims=True), amin)
        )
        db = db - ref_db
        db = jnp.maximum(
            db, jnp.max(db, axis=(1, 2), keepdims=True) - cfg.top_db
        )
    return db


@partial(jax.jit, static_argnames=("cfg",))
def mfcc(y: jnp.ndarray, cfg: FrontendConfig = FrontendConfig()) -> jnp.ndarray:
    """(batch, samples) -> (batch, n_frames, n_mfcc)."""
    p = stft_power(y, cfg)
    m = jnp.asarray(mel_matrix(cfg))
    mel = jnp.einsum(
        "btk,mk->btm", p, m, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    logmel = 10.0 * jnp.log10(jnp.maximum(mel, 1e-10))
    d = jnp.asarray(ref.dct_ortho_matrix(cfg.n_mfcc, cfg.n_mels).astype(np.float32))
    return jnp.einsum(
        "btm,cm->btc", logmel, d, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def extract_features_device(
    wavs: np.ndarray, cfg: FrontendConfig = FrontendConfig(), kind: str = "log_mel",
    use_pallas: bool = False,
) -> jnp.ndarray:
    """Like :func:`extract_features` but returns the DEVICE array without
    waiting for it: JAX's async dispatch lets the caller overlap host work
    (wav decoding for the next batch) with device compute for this one —
    the throughput mode bulk extraction uses (cli/extract_features.py,
    bench.py's sustained frames/s)."""
    y = jnp.asarray(np.atleast_2d(wavs), jnp.float32)
    if kind == "log_mel":
        if use_pallas:
            from .pallas_kernels import log_mel_fused

            return log_mel_fused(y, cfg)
        return log_mel(y, cfg)
    if kind == "mfcc":
        if use_pallas:
            from .pallas_kernels import mfcc_fused

            return mfcc_fused(y, cfg)
        return mfcc(y, cfg)
    if kind == "stft_power":
        return stft_power(y, cfg)
    raise ValueError(f"unknown feature kind {kind!r}")


def extract_features(
    wavs: np.ndarray, cfg: FrontendConfig = FrontendConfig(), kind: str = "log_mel",
    use_pallas: bool = False,
) -> np.ndarray:
    """Host-facing batch API: (batch, samples) float waveforms ->
    (batch, n_frames, n_feats) features ready for the data pipeline."""
    return np.asarray(extract_features_device(wavs, cfg, kind, use_pallas))
