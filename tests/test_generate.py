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


def test_generate_short_audio_pads_and_truncates(tmp_path):
    """Audio shorter than one window used to ValueError; now it is
    edge-padded to one window and the motion truncated to the true audio
    length (tiny cfg: window = 33 feature frames = 0.55 s)."""
    runner = TCDiff(_tiny_cfg(), use_ema_for_eval=False)
    opt = _opt(tmp_path, mode="generate")
    runner.normalizer = runner.load_datasets(opt)[0].normalizer
    wav = str(tmp_path / "blip.wav")
    rng = np.random.default_rng(3)
    dur = 0.3  # seconds -> ~18 feature frames -> ~9 motion frames
    save_wav(wav, rng.normal(size=int(dur * SR)).astype(np.float32) * 0.1, SR)
    opt.render = False
    poses = runner.generate(wav, opt)
    # normal-mode return: (1, dn, m, 24, 3) with m = true motion frames < seq
    assert poses.ndim == 5 and poses.shape[0] == 1 and poses.shape[1] == 2
    assert 0 < poses.shape[2] < 16, poses.shape
    assert np.isfinite(poses).all()


def test_generate_streaming_short_audio(tmp_path):
    runner = TCDiff(_tiny_cfg(), use_ema_for_eval=False)
    opt = _opt(tmp_path, mode="generate")
    runner.normalizer = runner.load_datasets(opt)[0].normalizer
    wav = str(tmp_path / "blip2.wav")
    rng = np.random.default_rng(4)
    save_wav(wav, rng.normal(size=int(0.3 * SR)).astype(np.float32) * 0.1, SR)
    opt.render = False
    full = runner.generate_streaming(wav, opt)
    assert full.ndim == 3 and full.shape[1] == 2 and 0 < full.shape[0] < 16
    assert np.isfinite(full).all()


def test_checkpoint_dancer_count_mismatch_raises(tmp_path):
    """A checkpoint trained for N dancers must fail loudly, not with an
    opaque shape error, when loaded for M != N dancers."""
    from tests.test_orchestrator import _tiny_cfg as tiny

    opt = _opt(tmp_path, epochs=1, save_interval=1)
    runner = TCDiff(tiny(dancers=2), use_ema_for_eval=False)
    runner.train_loop(opt)
    import glob as _g

    ckpt = sorted(_g.glob(str(tmp_path / "runs" / "t" / "checkpoints" / "ckpt_*")))[-1]
    runner3 = TCDiff(tiny(dancers=3), use_ema_for_eval=False)
    with pytest.raises(ValueError, match="trained for 2 dancers"):
        runner3._load_checkpoint(ckpt)


def test_generate_streaming_mid_song_resume(tmp_path):
    """Resuming a stream at slice k with the previous slice's tail must
    reproduce the uninterrupted stream exactly (each slice depends only on
    its window, trajectory, key, and the previous tail)."""
    runner = TCDiff(_tiny_cfg(), use_ema_for_eval=False)
    opt = _opt(tmp_path, mode="generate")
    runner.normalizer = runner.load_datasets(opt)[0].normalizer
    rng = np.random.default_rng(7)
    y = rng.normal(size=int(3.0 * SR)).astype(np.float32) * 1e-3
    for s in range(0, len(y), SR // 2):
        n = min(64, len(y) - s)
        y[s : s + n] += rng.normal(size=n).astype(np.float32) * 0.4
    wav = str(tmp_path / "resume.wav")
    save_wav(wav, y, SR)
    opt.render = False

    seq, dn, half = 16, 2, 8
    tails = {}

    def keep_tail(i, s4):
        tails[i] = np.asarray(s4[:, half:]).reshape(1, half * dn, s4.shape[-1])

    full = runner.generate_streaming(wav, opt, on_slice=keep_tail)
    assert len(tails) >= 2, "need >=2 slices for a resume test"

    resumed = runner.generate_streaming(
        wav, opt, resume_from=1, resume_tail=tails[0]
    )
    np.testing.assert_array_equal(resumed, full[seq:])

    import pytest as _pytest

    with _pytest.raises(ValueError, match="resume_tail"):
        runner.generate_streaming(wav, opt, resume_from=1)
    with _pytest.raises(ValueError, match="out of range"):
        runner.generate_streaming(wav, opt, resume_from=99, resume_tail=tails[0])


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
