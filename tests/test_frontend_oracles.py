"""Independent oracles for the audio frontend (VERDICT r1 items 2/5).

Round 1's bit-match contract was anchored to frontend/reference_impl.py —
a self-authored librosa re-derivation. These tests anchor that oracle (and
the device kernels above it) to software we did NOT write:

* ``tf.signal.stft``  — the STFT power path (librosa centering applied
  outside, since tf.signal does not center-pad). The float64 comparison is
  exact: both are textbook rFFTs of identically windowed frames.
* ``scipy.fft.dct`` / ``scipy.signal.get_window`` — DCT-II-ortho matrix and
  periodic Hann window to 1e-15.
* ``scipy.signal.resample_poly`` — the windowed-sinc resampler across chirp
  sweeps at KWS-relevant rate pairs (different filter designs, so the
  contract is small relative RMS error away from the edges, plus per-tone
  amplitude preservation).

If reference_impl.py itself drifts, these fail.
"""

import functools

import numpy as np
import pytest

from cmoop_audio_processing_tpu.frontend import reference_impl as ref
from cmoop_audio_processing_tpu.frontend.audio_io import resample
from cmoop_audio_processing_tpu.frontend.features import (
    FrontendConfig,
    stft_power,
)

scipy_signal = pytest.importorskip("scipy.signal")
scipy_fft = pytest.importorskip("scipy.fft")


def _tf_stft_power_centered(y64, n_fft, hop):
    """tf.signal.stft with librosa's reflect centering applied manually."""
    tf = pytest.importorskip("tensorflow")
    ypad = np.pad(y64, n_fft // 2, mode="reflect")
    s = tf.signal.stft(
        tf.constant(ypad, tf.float64),
        frame_length=n_fft,
        frame_step=hop,
        fft_length=n_fft,
        window_fn=functools.partial(tf.signal.hann_window, periodic=True),
    )
    return np.abs(s.numpy()) ** 2


def test_reference_stft_bitmatches_tf_signal():
    """The float64 oracle == tf.signal.stft EXACTLY (same windowed rFFT)."""
    rng = np.random.default_rng(0)
    y = rng.standard_normal(16000)
    p_tf = _tf_stft_power_centered(y, 512, 160)
    p_ref = ref.stft_power(y, 512, 160)
    assert p_ref.shape == p_tf.shape
    np.testing.assert_array_equal(p_ref, p_tf)


def test_device_stft_matches_tf_signal():
    """The XLA GEMM-DFT path agrees with tf.signal to f32 accumulation
    error (requires Precision.HIGHEST — TPU's default bf16-grade matmuls
    would fail this)."""
    rng = np.random.default_rng(1)
    y = rng.standard_normal((2, 16000)).astype(np.float32)
    cfg = FrontendConfig()
    p_dev = np.asarray(stft_power(y, cfg))
    for b in range(2):
        p_tf = _tf_stft_power_centered(y[b].astype(np.float64), cfg.n_fft,
                                       cfg.hop_length)
        np.testing.assert_allclose(
            p_dev[b], p_tf, rtol=1e-4, atol=1e-5 * p_tf.max()
        )


def test_dct_matrix_matches_scipy():
    d = ref.dct_ortho_matrix(13, 40)
    d_scipy = scipy_fft.dct(np.eye(40), type=2, norm="ortho", axis=0)[:13]
    np.testing.assert_allclose(d, d_scipy, atol=1e-14)


def test_hann_window_matches_scipy():
    w = ref.hann_periodic(400)
    w_scipy = scipy_signal.get_window("hann", 400, fftbins=True)
    np.testing.assert_allclose(w, w_scipy, atol=1e-14)


@pytest.mark.parametrize("sr_in,sr_out", [(22050, 16000), (8000, 16000),
                                          (44100, 16000), (16000, 8000)])
def test_resample_matches_scipy_on_chirp(sr_in, sr_out):
    """Full-band chirp sweep: windowed-sinc vs scipy polyphase agree to
    <1% relative RMS away from the boundary transients."""
    t = np.arange(int(sr_in * 1.0)) / sr_in
    f_hi = 0.4 * min(sr_in, sr_out)
    y = scipy_signal.chirp(t, 50.0, t[-1], f_hi).astype(np.float32)
    a = resample(y, sr_in, sr_out)
    g = np.gcd(sr_in, sr_out)
    b = scipy_signal.resample_poly(y.astype(np.float64), sr_out // g, sr_in // g)
    n = min(len(a), len(b))
    cut = sr_out // 10
    seg_a, seg_b = a[cut : n - cut], b[cut : n - cut]
    err = np.sqrt(np.mean((seg_a - seg_b) ** 2) / np.mean(seg_b ** 2))
    assert err < 0.01, f"rel RMS err {err:.4g}"


def test_resample_tone_amplitude_sweep():
    """Per-frequency amplitude preservation: pure tones across the passband
    keep unit amplitude within 1% after 22050 -> 16000 resampling."""
    sr_in, sr_out = 22050, 16000
    t = np.arange(int(sr_in * 0.5)) / sr_in
    for f in (100.0, 500.0, 1000.0, 2000.0, 4000.0, 6000.0):
        y = np.sin(2 * np.pi * f * t).astype(np.float32)
        out = resample(y, sr_in, sr_out)
        cut = sr_out // 10
        amp = np.sqrt(2.0 * np.mean(out[cut:-cut] ** 2))
        assert abs(amp - 1.0) < 0.01, f"{f} Hz: amplitude {amp:.4f}"
