"""DSP tests (reference: tests/test_audio.py amp/db roundtrip, plus the
self-contained STFT/mel implementations verified against scipy and known
properties)."""
import numpy as np
import pytest

from wavenet_vocoder_tpu.config import Config
from wavenet_vocoder_tpu.dsp import audio


def test_amp_db_roundtrip():
    # (reference: tests/test_audio.py:15-20)
    x = np.random.RandomState(0).rand(64).astype(np.float64)
    db = audio.amp_to_db(x)
    x2 = audio.db_to_amp(db)
    np.testing.assert_allclose(x, x2, atol=1e-5)


def test_normalize_roundtrip():
    S = np.random.RandomState(1).uniform(-100, 0, (80, 20))
    n = audio.normalize(S)
    assert n.min() >= 0 and n.max() <= 1
    np.testing.assert_allclose(audio.denormalize(n), S, atol=1e-6)


def test_stft_matches_scipy():
    from scipy.signal import stft as sp_stft
    sr, n_fft, hop = 16000, 512, 128
    t = np.arange(sr // 4) / sr
    y = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    D = audio.stft(y, n_fft=n_fft, hop_length=hop, win_length=n_fft,
                   center=True, pad_mode="constant")
    # scipy with the same periodic hann, zero padding, matching segments
    _, _, Z = sp_stft(y, nperseg=n_fft, noverlap=n_fft - hop,
                      window=audio.hann_window(n_fft), boundary="zeros",
                      padded=False, return_onesided=True)
    # scipy scales by 1/win.sum(); undo
    Z = Z * audio.hann_window(n_fft).sum()
    n = min(D.shape[1], Z.shape[1])
    np.testing.assert_allclose(np.abs(D[:, :n]), np.abs(Z[:, :n]),
                               atol=1e-3, rtol=1e-3)


def test_stft_peak_bin():
    sr, n_fft, hop = 16000, 1024, 256
    freq = 1000.0
    t = np.arange(sr) / sr
    y = np.sin(2 * np.pi * freq * t).astype(np.float32)
    D = np.abs(audio.stft(y, n_fft=n_fft, hop_length=hop))
    peak_bin = int(np.argmax(D[:, D.shape[1] // 2]))
    expected = freq * n_fft / sr
    assert abs(peak_bin - expected) <= 1


def test_mel_scale_roundtrip():
    f = np.array([0.0, 125.0, 440.0, 1000.0, 4000.0, 7600.0])
    np.testing.assert_allclose(audio.mel_to_hz(audio.hz_to_mel(f)), f,
                               rtol=1e-6, atol=1e-3)


def test_mel_filterbank_properties():
    fb = audio.mel_filterbank(22050, 1024, n_mels=80, fmin=125, fmax=7600)
    assert fb.shape == (80, 513)
    assert np.all(fb >= 0)
    # every filter has some support
    assert np.all(fb.sum(axis=1) > 0)
    # filters are band-limited: no energy below fmin or above fmax bins
    freqs = np.linspace(0, 22050 / 2, 513)
    assert fb[:, freqs < 120].sum() == 0
    assert fb[:, freqs > 7700].sum() == 0


def test_logmelspectrogram_shape_and_range():
    cfg = Config()
    y = np.random.RandomState(2).uniform(-0.5, 0.5, 22050).astype(np.float32)
    S = audio.logmelspectrogram(y, cfg)
    assert S.shape[1] == cfg.num_mels
    # center=True: n_frames = 1 + len // hop
    assert S.shape[0] == 1 + len(y) // cfg.hop_size
    assert S.dtype == np.float32
    assert np.all(S >= -10.0)  # log10 floor at 1e-10


def test_preemphasis_roundtrip():
    x = np.random.RandomState(3).randn(1000).astype(np.float32)
    y = audio.preemphasis(x, 0.85)
    x2 = audio.inv_preemphasis(y, 0.85)
    np.testing.assert_allclose(x, x2, atol=1e-4)


def test_start_and_end_indices():
    # (reference: audio.py:87-98)
    q = np.full(100, 127, dtype=np.int32)
    q[20] = 140
    q[70] = 100
    s, e = audio.start_and_end_indices(q, silence_threshold=2)
    assert s == 20 and e == 70
    # within threshold -> treated as silence
    q2 = np.full(10, 127, dtype=np.int32)
    q2[3] = 129
    s2, e2 = audio.start_and_end_indices(q2, silence_threshold=2)
    assert s2 == 0 and e2 == 9  # nothing above threshold


def test_adjust_time_resolution():
    # (reference: audio.py:61-84)
    q = np.full(100, 200, dtype=np.int32)  # all non-silent
    mel = np.random.RandomState(4).randn(10, 4).astype(np.float32)
    q2, mel2 = audio.adjust_time_resolution(q, mel)
    assert q2.shape[0] == mel2.shape[0]
    # frame i repeated 10x
    np.testing.assert_array_equal(mel2[0], mel[0])
    np.testing.assert_array_equal(mel2[9], mel[0])
    np.testing.assert_array_equal(mel2[10], mel[1])


def test_trim_silence():
    sr = 16000
    sig = np.zeros(sr, dtype=np.float32)
    sig[4000:8000] = np.sin(2 * np.pi * 440 * np.arange(4000) / sr) * 0.5
    trimmed = audio.trim_silence(sig, top_db=30)
    assert trimmed.size < sig.size
    assert trimmed.size >= 4000


def test_save_load_wav_roundtrip(tmp_path):
    sr = 16000
    x = (0.5 * np.sin(2 * np.pi * 440 * np.arange(sr // 4) / sr)).astype(np.float32)
    p = str(tmp_path / "t.wav")
    audio.save_wav(x, p, sr)
    y = audio.load_wav(p, sr)
    assert y.shape == x.shape
    # save_wav peak-normalizes; compare up to scale
    scale = np.max(np.abs(y)) / np.max(np.abs(x))
    np.testing.assert_allclose(y, x * scale, atol=1e-3)


def test_resample_length():
    x = np.random.RandomState(5).randn(24000).astype(np.float32)
    y = audio.resample(x, 24000, 22050)
    assert abs(y.size - 22050) <= 2


def test_low_cut_filter_removes_dc():
    sr = 16000
    t = np.arange(sr) / sr
    sig = 0.5 + 0.3 * np.sin(2 * np.pi * 1000 * t)  # DC + 1kHz
    out = audio.low_cut_filter(sig, sr, cutoff=70)
    # The 255-tap firwin design (same as the reference, audio.py:26) has
    # ~-19dB DC gain; assert attenuation vs the input's 0.5 DC, not zero.
    assert abs(np.mean(out[2000:])) < 0.1
    # 1 kHz content preserved
    assert np.std(out[2000:]) > 0.2


def test_hop_win_resolution():
    cfg = Config()
    assert audio.get_hop_size(cfg) == 256
    assert audio.get_win_length(cfg) == 1024
    cfg2 = cfg.replace(hop_size=None, frame_shift_ms=10.0)
    assert audio.get_hop_size(cfg2) == 220  # 10ms @ 22050
    cfg3 = cfg.replace(win_length=-1, win_length_ms=50.0)
    assert audio.get_win_length(cfg3) == 1102
