"""Audio frontend tests: the numpy reference is anchored to np.fft and
closed-form identities; the JAX matmul pipeline and the fused Pallas kernel
are bit-matched against the reference (SURVEY.md §4 item 6)."""

import numpy as np
import pytest

from cmoop_audio_processing_tpu.frontend import reference_impl as ref
from cmoop_audio_processing_tpu.frontend.features import (
    FrontendConfig,
    extract_features,
    log_mel,
    mfcc,
    stft_power,
)

CFG = FrontendConfig(sr=16000, n_fft=512, hop_length=160, n_mels=40, n_mfcc=13)


def tone(freq, sr=16000, dur=1.0, amp=0.5):
    t = np.arange(int(sr * dur)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


# --- numpy reference self-consistency ---------------------------------------

def test_reference_stft_matches_manual_dft():
    y = tone(440, dur=0.1)
    p = ref.stft_power(y, n_fft=256, hop_length=128)
    # frame 1 by hand (center-padded)
    ypad = np.pad(y.astype(np.float64), 128, mode="reflect")
    frame = ypad[128 : 128 + 256] * ref.hann_periodic(256)
    manual = np.abs(np.fft.rfft(frame)) ** 2
    np.testing.assert_allclose(p[1], manual, rtol=1e-10)


def test_reference_frame_count():
    y = tone(100, dur=1.0)  # 16000 samples
    p = ref.stft_power(y, n_fft=512, hop_length=160)
    # centered: 1 + 16000//160 = 101 frames
    assert p.shape == (101, 257)


def test_tone_peaks_at_right_bin():
    sr, n_fft = 16000, 512
    freq = 1000.0
    p = ref.stft_power(tone(freq), n_fft=n_fft, hop_length=160)
    peak_bin = p[50].argmax()
    assert peak_bin == round(freq * n_fft / sr)  # bin 32


def test_mel_scale_roundtrip():
    f = np.array([0.0, 200.0, 999.0, 1000.0, 4000.0, 8000.0])
    np.testing.assert_allclose(
        ref.mel_to_hz_slaney(ref.hz_to_mel_slaney(f)), f, rtol=1e-12
    )


def test_mel_filterbank_properties():
    fb = ref.mel_filterbank(16000, 512, 40)
    assert fb.shape == (40, 257)
    assert (fb >= 0).all()
    # each filter is unimodal with a single triangular peak, and slaney
    # normalization makes filter areas ~equal in Hz terms
    assert (fb.sum(axis=1) > 0).all()
    # filters cover the full band: every interior bin has some weight
    covered = (fb.sum(axis=0) > 0)
    assert covered[3:-2].all()


def test_dct_matrix_orthonormal():
    d = ref.dct_ortho_matrix(40, 40)
    np.testing.assert_allclose(d @ d.T, np.eye(40), atol=1e-12)


def test_dct_matches_scipy():
    from scipy.fft import dct

    x = np.random.default_rng(0).standard_normal(40)
    want = dct(x, type=2, norm="ortho")[:13]
    got = ref.dct_ortho_matrix(13, 40) @ x
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_power_to_db_semantics():
    s = np.array([[1.0, 0.1, 1e-15]])
    db = ref.power_to_db(s, ref=1.0, top_db=None)
    np.testing.assert_allclose(db, [[0.0, -10.0, -100.0]], atol=1e-9)
    db2 = ref.power_to_db(s, ref=1.0, top_db=80.0)
    assert db2.min() == pytest.approx(-80.0)


# --- JAX pipeline vs reference ----------------------------------------------

def _signals():
    rng = np.random.default_rng(7)
    return np.stack([
        tone(440),
        tone(3000, amp=0.3) + tone(150, amp=0.2),
        rng.standard_normal(16000).astype(np.float32) * 0.1,
    ])


def test_jax_stft_power_matches_reference():
    ys = _signals()
    got = np.asarray(stft_power(ys, CFG))
    for i, y in enumerate(ys):
        want = ref.stft_power(y, CFG.n_fft, CFG.hop_length)
        np.testing.assert_allclose(got[i], want, rtol=2e-3, atol=2e-4)


def test_jax_log_mel_matches_reference():
    ys = _signals()
    got = np.asarray(log_mel(ys, CFG))
    for i, y in enumerate(ys):
        want = ref.log_mel_spectrogram(
            y, CFG.sr, CFG.n_fft, CFG.hop_length, CFG.n_mels, top_db=80.0
        )
        np.testing.assert_allclose(got[i], want, atol=2e-2)


def test_jax_mfcc_matches_reference():
    ys = _signals()
    got = np.asarray(mfcc(ys, CFG))
    for i, y in enumerate(ys):
        want = ref.mfcc(y, CFG.sr, CFG.n_mfcc, CFG.n_fft, CFG.hop_length, CFG.n_mels)
        np.testing.assert_allclose(got[i], want, atol=3e-2)


def test_extract_features_api():
    feats = extract_features(_signals(), CFG, kind="log_mel")
    assert feats.shape == (3, 101, 40)
    feats_m = extract_features(_signals(), CFG, kind="mfcc")
    assert feats_m.shape == (3, 101, 13)


def test_extract_features_device_async_and_mfcc_pallas_route():
    """extract_features_device returns an unmaterialized device array, and
    kind='mfcc' + use_pallas routes to the fused kernel (parity with the
    XLA path — before round 5 the flag was silently ignored for mfcc)."""
    import jax

    from cmoop_audio_processing_tpu.frontend.features import (
        extract_features_device,
    )

    ys = _signals()
    dev = extract_features_device(ys, CFG, kind="mfcc", use_pallas=True)
    assert isinstance(dev, jax.Array)
    want = np.asarray(mfcc(ys, CFG))
    np.testing.assert_allclose(np.asarray(dev), want, atol=2e-2)


# --- Pallas fused kernel -----------------------------------------------------

def test_pallas_log_mel_matches_xla_path():
    from cmoop_audio_processing_tpu.frontend.pallas_kernels import log_mel_fused

    ys = _signals()
    cfg = FrontendConfig(log="natural")
    want = np.asarray(log_mel(ys, cfg))
    got = np.asarray(log_mel_fused(ys, cfg))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_pallas_log_mel_db_mode():
    from cmoop_audio_processing_tpu.frontend.pallas_kernels import log_mel_fused

    ys = _signals()
    want = np.asarray(log_mel(ys, CFG))
    got = np.asarray(log_mel_fused(ys, CFG))
    np.testing.assert_allclose(got, want, atol=2e-2)


# --- audio io ----------------------------------------------------------------

def test_wav_roundtrip(tmp_path):
    from cmoop_audio_processing_tpu.frontend.audio_io import load_wav, save_wav

    y = tone(440, dur=0.25)
    path = str(tmp_path / "t.wav")
    save_wav(path, y, 16000)
    y2, sr = load_wav(path)
    assert sr == 16000
    np.testing.assert_allclose(y2, y, atol=1e-3)


def test_resample_preserves_tone():
    from cmoop_audio_processing_tpu.frontend.audio_io import resample

    y = tone(440, sr=22050, dur=0.5)
    y16 = resample(y, 22050, 16000)
    assert abs(len(y16) - int(0.5 * 16000)) <= 1
    # dominant frequency preserved
    spec = np.abs(np.fft.rfft(y16 * np.hanning(len(y16))))
    peak_hz = spec.argmax() * 16000 / len(y16)
    assert abs(peak_hz - 440) < 5


def test_pallas_mfcc_matches_xla_path():
    from cmoop_audio_processing_tpu.frontend.pallas_kernels import mfcc_fused

    ys = _signals()
    want = np.asarray(mfcc(ys, CFG))
    got = np.asarray(mfcc_fused(ys, CFG))
    assert got.shape == want.shape
    # dB-scale values span hundreds; observed rel diff ~6e-4 (f32 matmul
    # reassociation between the fused and XLA paths)
    np.testing.assert_allclose(got, want, atol=3e-2, rtol=1e-3)


def test_pallas_flattened_tiles_at_birdclef_shape():
    """5-s clips (80k samples -> 501 frames): batch*time = 1503 rows is NOT
    a multiple of the 128-row flattened tile, so the padded tail frames and
    the row->(B,T) reshape are both exercised; each sample's features must
    match the per-sample XLA path exactly (the dB epilogue's per-sample max
    is the easiest thing to get wrong when samples share tiles)."""
    from cmoop_audio_processing_tpu.frontend.pallas_kernels import (
        log_mel_fused, mfcc_fused,
    )

    rng = np.random.default_rng(3)
    ys = np.stack([
        tone(700, dur=5.0) + rng.standard_normal(80000).astype(np.float32) * 0.05,
        tone(2100, dur=5.0) * 0.2,
        rng.standard_normal(80000).astype(np.float32),
    ])
    assert ys.shape == (3, 80000)
    got = np.asarray(mfcc_fused(ys, CFG))
    want = np.asarray(mfcc(ys, CFG))
    assert got.shape == want.shape == (3, 501, 13)
    np.testing.assert_allclose(got, want, atol=3e-2, rtol=1e-3)
    cfg_db = FrontendConfig(log="db", top_db=80.0)
    gl = np.asarray(log_mel_fused(ys, cfg_db))
    wl = np.asarray(log_mel(ys, cfg_db))
    np.testing.assert_allclose(gl, wl, atol=3e-2, rtol=1e-3)
