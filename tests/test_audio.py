"""From-scratch audio DSP: verified on analytically-known signals."""

import numpy as np
import pytest

from tcdiff_tpu.data import audio as A
from tcdiff_tpu.data.features import SR, HOP_LENGTH, extract_music_features, wav_processing


def _sine(freq, dur=2.0, sr=SR, amp=0.5):
    t = np.arange(int(dur * sr)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def _clicks(bpm, dur=8.0, sr=SR):
    """Broadband click track: short noise bursts on the beat grid."""
    rng = np.random.default_rng(7)
    y = rng.normal(size=int(dur * sr)).astype(np.float32) * 1e-4  # dither floor
    period = int(60 / bpm * sr)
    for s in range(0, len(y), period):
        n = min(64, len(y) - s)
        y[s : s + n] += rng.normal(size=n).astype(np.float32) * np.hanning(n).astype(np.float32)
    return y


def test_stft_parseval_and_peak():
    y = _sine(440.0)
    S = np.abs(A.stft(y))
    # frequency bin of the peak should be 440 Hz
    peak_bin = S[:, S.shape[1] // 2].argmax()
    freq = peak_bin * SR / 2048
    assert abs(freq - 440) < SR / 2048 * 1.5


def test_istft_roundtrip():
    y = _sine(220.0, dur=1.0) + 0.1 * _sine(1337.0, dur=1.0)
    rec = A.istft(A.stft(y), length=len(y))
    # interior samples reconstruct well (edges lose window coverage)
    err = np.abs(rec[2048:-2048] - y[2048:-2048]).max()
    assert err < 1e-3


def test_mel_filterbank_shape_and_coverage():
    fb = A.mel_filterbank(SR, 2048, 128)
    assert fb.shape == (128, 1025)
    assert (fb >= 0).all()
    assert (fb.sum(axis=1) > 0).all()  # every filter covers some bins


def test_mfcc_dc_term_tracks_spectral_flatness():
    # with ref=max, c0 measures how close ALL mel bands sit to the peak band:
    # white noise (flat spectrum) must score higher than a pure tone
    tone = A.mfcc_from_db(A.power_to_db(A.melspectrogram(_sine(440, amp=0.9), SR), ref=np.max))
    noise = np.random.default_rng(0).normal(size=2 * SR).astype(np.float32) * 0.5
    flat = A.mfcc_from_db(A.power_to_db(A.melspectrogram(noise, SR), ref=np.max))
    assert tone.shape[0] == flat.shape[0] == 20
    assert flat[0].mean() > tone[0].mean()


def test_delta_of_linear_ramp_is_slope():
    x = np.tile(np.arange(100, dtype=np.float64), (3, 1)) * 2.0
    d = A.delta(x, width=3)
    np.testing.assert_allclose(d[:, 5:-5], 2.0, atol=1e-8)


def test_hpss_separates_tone_from_clicks():
    tone = _sine(440, dur=4.0)
    clicks = _clicks(120, dur=4.0)
    mix = tone + clicks
    h, p = A.hpss(mix)
    assert h.shape == p.shape == mix.shape
    # harmonic part should correlate with the tone, percussive with clicks
    ch = np.corrcoef(h, tone)[0, 1]
    cp = np.corrcoef(p, clicks)[0, 1]
    assert ch > 0.8, ch
    assert cp > 0.5, cp


def test_chroma_peaks_at_played_pitch_class():
    # A4 = 440 Hz is pitch class 9 (C=0)
    chroma = A.chroma_cqt(_sine(440.0, dur=3.0), SR)
    assert chroma.shape[0] == 12
    mid = chroma[:, chroma.shape[1] // 2]
    assert mid.argmax() == 9
    # E (pc 4) is the strongest harmonic contaminant; still A should dominate
    assert mid[9] > 0.99


def test_onset_strength_spikes_on_clicks():
    env = A.onset_strength(_clicks(120, dur=6.0), SR)
    assert env.min() >= 0
    period = int(round(60 / 120 * SR / HOP_LENGTH))  # frames per beat
    # autocorrelation of the envelope should peak near the click period
    ac = np.correlate(env - env.mean(), env - env.mean(), mode="full")[len(env) - 1 :]
    lo, hi = period - 3, period + 4
    assert ac[lo:hi].max() > 0.5 * ac[0]


def test_tempo_estimate_close_to_truth():
    env = A.onset_strength(_clicks(120, dur=10.0), SR)
    bpm = A.estimate_tempo(env, SR)
    assert 110 < bpm < 130, bpm


def test_beat_track_finds_click_grid():
    env = A.onset_strength(_clicks(100, dur=10.0), SR)
    bpm, beats = A.beat_track(env, SR, start_bpm=100.0)
    assert len(beats) >= 10
    intervals = np.diff(beats)
    period = 60 / 100 * SR / HOP_LENGTH
    assert abs(np.median(intervals) - period) < 3, (np.median(intervals), period)


def test_tempogram_shape_and_norm():
    env = A.onset_strength(_clicks(120, dur=6.0), SR)
    tg = A.tempogram(env, SR)
    assert tg.shape == (384, len(env))
    assert np.abs(tg).max() <= 1.0 + 1e-6
    np.testing.assert_allclose(tg[0, 10:-10], 1.0, atol=1e-4)  # lag-0 autocorr is the max


def test_extract_music_features_full_shape():
    y = _clicks(120, dur=5.0) + 0.3 * _sine(440, dur=5.0)
    feats = extract_music_features(y)
    n_frames = feats.shape[0]
    assert feats.shape[1] == 438
    assert abs(n_frames - 5 * 60) <= 2  # ~60 FPS
    assert np.isfinite(feats).all()
    # beat channel is one-hot: mfcc(20) + delta(20) + chroma(12) + onset(1) -> 53
    beat = feats[:, 53]
    assert set(np.unique(beat)).issubset({0.0, 1.0})
    assert beat.sum() >= 5  # ~2 beats/sec for 5 s


def test_wav_roundtrip_and_processing(tmp_path):
    y = _clicks(120, dur=2.0) * 0.2
    p = str(tmp_path / "t.wav")
    A.save_wav(p, y, SR)
    y2, sr = A.load_wav(p)
    assert sr == SR
    np.testing.assert_allclose(y2, y, atol=1e-3)
    feats = wav_processing(p)
    assert feats.shape[1] == 438

    # resampling path
    A.save_wav(p, y[::2], SR // 2)
    y3, sr3 = A.load_wav(p, sr=SR)
    assert sr3 == SR and abs(len(y3) - len(y)) < 4


def test_load_wav_24bit(tmp_path):
    import wave

    t = np.arange(SR) / SR
    y = (0.4 * np.sin(2 * np.pi * 440 * t)).astype(np.float64)
    i32 = np.clip(y * 2147483647, -2147483648, 2147483647).astype("<i4")
    # write top 3 bytes (little-endian 24-bit PCM)
    b = i32.view(np.uint8).reshape(-1, 4)[:, 1:]
    p = str(tmp_path / "s24.wav")
    with wave.open(p, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(3)
        w.setframerate(SR)
        w.writeframes(b.tobytes())
    x, sr = A.load_wav(p)
    assert sr == SR
    np.testing.assert_allclose(x, y, atol=2e-7)
