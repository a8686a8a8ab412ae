"""wav -> choreography serving path (--mode generate)."""

import glob
import os

import numpy as np
import pytest

from tcdiff_tpu.data.audio import save_wav
from tcdiff_tpu.data.features import SR
from tcdiff_tpu.train.orchestrator import TCDiff

from tests.test_orchestrator import _opt, _tiny_cfg


def test_generate_from_wav(tmp_path):
    # tiny cfg: seq_len=16 -> windows of 33 feature frames... but features run
    # at 60 FPS so seq_len frames = seq_len/30 seconds of audio per window.
    runner = TCDiff(_tiny_cfg(), use_ema_for_eval=False)
    opt = _opt(tmp_path, mode="generate")
    # synthetic normalizer stands in for a trained checkpoint's
    runner.normalizer = runner.load_datasets(opt)[0].normalizer

    # 3 seconds of clicky audio -> several 16-frame windows
    rng = np.random.default_rng(0)
    y = rng.normal(size=int(3.0 * SR)).astype(np.float32) * 1e-3
    for s in range(0, len(y), SR // 2):
        nburst = min(64, len(y) - s)
        y[s : s + nburst] += rng.normal(size=nburst).astype(np.float32) * 0.4
    wav = str(tmp_path / "song.wav")
    save_wav(wav, y, SR)

    opt.render = True
    poses = runner.generate(wav, opt)
    # long mode returns the stitched (dn, L, 24, 3) clip
    assert poses.ndim == 4 and poses.shape[0] == 2 and poses.shape[2] == 24
    assert np.isfinite(poses).all()
    assert glob.glob(str(tmp_path / "renders" / "GEN_song" / "*.gif"))


def test_generate_too_short_audio_raises(tmp_path):
    runner = TCDiff(_tiny_cfg(), use_ema_for_eval=False)
    opt = _opt(tmp_path, mode="generate")
    runner.normalizer = runner.load_datasets(opt)[0].normalizer
    wav = str(tmp_path / "blip.wav")
    save_wav(wav, np.zeros(SR // 10, np.float32), SR)
    with pytest.raises(ValueError, match="shorter"):
        runner.generate(wav, opt)


def test_generate_streaming(tmp_path):
    runner = TCDiff(_tiny_cfg(), use_ema_for_eval=False)
    opt = _opt(tmp_path, mode="generate")
    runner.normalizer = runner.load_datasets(opt)[0].normalizer
    rng = np.random.default_rng(1)
    y = rng.normal(size=int(3.0 * SR)).astype(np.float32) * 1e-3
    for s in range(0, len(y), SR // 2):
        n = min(64, len(y) - s)
        y[s : s + n] += rng.normal(size=n).astype(np.float32) * 0.4
    wav = str(tmp_path / "stream.wav")
    save_wav(wav, y, SR)

    opt.render = False
    full = runner.generate_streaming(wav, opt)
    # seq_len 16 @ 30fps motion / 60fps feats: 3 s -> several half-window steps
    assert full.ndim == 3 and full.shape[1] == 2 and full.shape[2] == 151
    assert full.shape[0] > 16  # longer than one slice
    assert np.isfinite(full).all()
    # the imposed trajectory survives sampling: frame 0 carries the circle
    # seed (rollout frame 0 IS the seed window's first frame)
    angles = 2 * np.pi * np.arange(2) / 2
    world = np.stack([np.cos(angles), np.sin(angles)], -1)
    scale = np.asarray(runner.normalizer.scale)[4:6]
    offset = np.asarray(runner.normalizer.offset)[4:6]
    seed_xy = np.clip(world * scale + offset, -1, 1)
    np.testing.assert_allclose(full[0, :, 4:6], seed_xy, atol=1e-4)
