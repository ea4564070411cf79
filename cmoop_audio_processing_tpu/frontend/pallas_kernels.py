"""Fused Pallas TPU kernel for the log-mel frontend hot path.

One kernel instance produces a 128-frame tile of the batch's FLATTENED
(batch*time) frame stream:

    (128, n_fft) frame tile -> (n_fft, 2*Kp) windowed-DFT GEMM on the MXU
      -> power = re^2 + im^2 on the VPU
      -> (128, Kp) @ (Kp, Mp) mel GEMM on the MXU
      -> log on the VPU -> out tile

Framing itself stays in XLA (a strided gather): Mosaic only permits
dynamic/lane-misaligned VMEM slicing at 128-multiples, and audio hops (160)
are not lane-aligned — two earlier in-kernel framing designs (per-frame
dynamic slices; one aligned chunk + static sub-slices) both hit Mosaic
relayout limits. What the fusion buys is that the DFT projection and the
power spectrogram — the two largest intermediates, (T, 2K) and (T, K) per
sample — never exist in HBM; XLA's own fusion cannot do this across two
GEMMs with an elementwise stage in between.

Tiling note: frames from all batch elements are flattened into one
(B*T, n_fft) stream before the kernel. A frame's DFT/mel/DCT math is
row-independent, so which rows share a tile cannot affect results — but it
decides MXU occupancy. The first version tiled 8 frames per instance
*within* each sample (grid (B, T/8)): every GEMM ran with an M of 8 rows
(6% of the 128-row systolic array) across thousands of tiny grid steps.
Flattening lifts M to the full 128 rows, cuts the grid ~16x, and amortizes
tail padding across the whole batch instead of per sample.

All operand shapes are padded to lane width (128): padded DFT columns
produce zero power, and padded mel rows multiply those zeros, so results are
bit-consistent with the unpadded math. Padded (all-zero) tail frames emit
garbage log values that are sliced off before reshaping back to (B, T, ...).

Supported log modes here: 'natural' (ln(mel+1e-6)) and raw dB
(10*log10(max(mel, 1e-10))); the per-sample-max referenced dB variant needs
a global reduction and is handled by the wrapper as a cheap epilogue.

Reference parity: this frontend reproduces the features the reference repo
consumes precomputed (log-mel/MFCC directories named at
nsga_penalty.py:157, sa_nsga_penalty.py:38,58); numerics are anchored to
librosa/tf.signal by tests/test_frontend.py and the bench's Pallas-vs-XLA
parity assertion.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .features import FrontendConfig, _frame, dft_matrices, mel_matrix

LANE = 128
FRAME_TILE = 128  # flattened frames per kernel instance = full MXU rows


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _padded_operands(cfg: FrontendConfig):
    """Lane-padded [cos|sin] DFT and mel matrices (host, cached by config)."""
    kp = _round_up(cfg.n_bins, LANE)
    mp = _round_up(cfg.n_mels, LANE)
    w = dft_matrices(cfg)  # (n_fft, 2*n_bins): [cos | sin]
    cos, sin = np.split(w, 2, axis=1)
    wp = np.zeros((cfg.n_fft, 2 * kp), np.float32)
    wp[:, : cfg.n_bins] = cos
    wp[:, kp : kp + cfg.n_bins] = sin
    m = mel_matrix(cfg)  # (n_mels, n_bins)
    mp_mat = np.zeros((kp, mp), np.float32)
    mp_mat[: cfg.n_bins, : cfg.n_mels] = m.T
    return wp, mp_mat, kp, mp


def _logmel_tile(frames, w_ref, mel_ref, kp, natural_log):
    proj = jnp.dot(
        frames, w_ref[:], preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    re = proj[:, :kp]
    im = proj[:, kp:]
    power = re * re + im * im  # (TILE, Kp); padded cols are exactly 0
    mel = jnp.dot(
        power, mel_ref[:], preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    if natural_log:
        return jnp.log(mel + 1e-6)
    return 10.0 * jnp.log10(jnp.maximum(mel, 1e-10))


def _kernel(frames_ref, w_ref, mel_ref, out_ref, *, kp, natural_log):
    out_ref[...] = _logmel_tile(frames_ref[...], w_ref, mel_ref, kp, natural_log)


def _mfcc_kernel(frames_ref, w_ref, mel_ref, dct_ref, out_ref, *, kp):
    """log-mel tile -> DCT-II GEMM, all in VMEM (MFCC uses the raw-dB
    variant, ref=1.0, librosa.feature.mfcc semantics)."""
    logmel = _logmel_tile(frames_ref[...], w_ref, mel_ref, kp, natural_log=False)
    out_ref[...] = jnp.dot(
        logmel, dct_ref[:], preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _flat_frames(y: jnp.ndarray, cfg: FrontendConfig):
    """Frame in XLA, flatten (B, T) -> rows, pad rows to the tile size."""
    frames = _frame(y.astype(jnp.float32), cfg)  # (B, T, n_fft)
    b, n_frames, _ = frames.shape
    n = b * n_frames
    n_pad = _round_up(n, FRAME_TILE)
    flat = jnp.pad(frames.reshape(n, cfg.n_fft), ((0, n_pad - n), (0, 0)))
    return flat, b, n_frames, n, n_pad


@partial(jax.jit, static_argnames=("cfg", "interpret"))
def log_mel_fused(
    y: jnp.ndarray, cfg: FrontendConfig = FrontendConfig(), interpret: bool | None = None
) -> jnp.ndarray:
    """(batch, samples) -> (batch, n_frames, n_mels) fused log-mel."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    flat, b, n_frames, n, n_pad = _flat_frames(y, cfg)
    wp, mp_mat, kp, mp = _padded_operands(cfg)
    natural = cfg.log == "natural"

    out = pl.pallas_call(
        partial(_kernel, kp=kp, natural_log=natural),
        grid=(n_pad // FRAME_TILE,),
        in_specs=[
            pl.BlockSpec(
                (FRAME_TILE, cfg.n_fft), lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (FRAME_TILE, mp), lambda i: (i, 0), memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, mp), jnp.float32),
        interpret=interpret,
    )(flat, jnp.asarray(wp), jnp.asarray(mp_mat))

    out = out[:n, : cfg.n_mels].reshape(b, n_frames, cfg.n_mels)
    if cfg.log == "db" and cfg.top_db is not None:
        # per-sample max-referenced dB epilogue (cheap VPU work in XLA)
        ref_db = jnp.max(out, axis=(1, 2), keepdims=True)
        out = out - ref_db
        out = jnp.maximum(out, jnp.max(out, axis=(1, 2), keepdims=True) - cfg.top_db)
    return out


@partial(jax.jit, static_argnames=("cfg", "interpret"))
def mfcc_fused(
    y: jnp.ndarray, cfg: FrontendConfig = FrontendConfig(), interpret: bool | None = None
) -> jnp.ndarray:
    """(batch, samples) -> (batch, n_frames, n_mfcc): the full MFCC chain
    (DFT -> power -> mel -> dB -> DCT-II) fused in VMEM per frame tile."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    flat, b, n_frames, n, n_pad = _flat_frames(y, cfg)
    wp, mp_mat, kp, mp = _padded_operands(cfg)
    # lane-padded orthonormal DCT: zero rows beyond n_mels nullify the
    # padded log-mel columns (which carry log10(amin), not zero)
    from .reference_impl import dct_ortho_matrix

    cp = _round_up(cfg.n_mfcc, LANE)
    dct = np.zeros((mp, cp), np.float32)
    dct[: cfg.n_mels, : cfg.n_mfcc] = dct_ortho_matrix(cfg.n_mfcc, cfg.n_mels).T

    out = pl.pallas_call(
        partial(_mfcc_kernel, kp=kp),
        grid=(n_pad // FRAME_TILE,),
        in_specs=[
            pl.BlockSpec(
                (FRAME_TILE, cfg.n_fft), lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (FRAME_TILE, cp), lambda i: (i, 0), memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, cp), jnp.float32),
        interpret=interpret,
    )(flat, jnp.asarray(wp), jnp.asarray(mp_mat), jnp.asarray(dct))
    return out[:n, : cfg.n_mfcc].reshape(b, n_frames, cfg.n_mfcc)
