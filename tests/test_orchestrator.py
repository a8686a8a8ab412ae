"""End-to-end orchestration: train epochs with checkpoints, all three CLI
modes on synthetic data, and resume-from-checkpoint."""

import dataclasses
import glob
import json
import os

import numpy as np
import pytest

from tcdiff_tpu.config import (
    DanceDecoderConfig,
    DiffusionConfig,
    TCDiffConfig,
    TrainConfig,
    TrajDecoderConfig,
)
from tcdiff_tpu.cli.args import parse_train_opt
from tcdiff_tpu.train.orchestrator import TCDiff


def _tiny_cfg(seq_len=16, dancers=2):
    return TCDiffConfig(
        model=DanceDecoderConfig(
            seq_len=seq_len,
            latent_dim=32,
            ff_size=32,
            num_layers=1,
            num_heads=2,
            cond_feature_dim=438,
            dancer_num=dancers,
            head_dim=16,
        ),
        diffusion=DiffusionConfig(
            sampling_timesteps=2, n_timestep=10,
            footwork_frames=(4, 12), footwork_blend_width=2,
        ),
        train=TrainConfig(batch_size=8, save_interval=1, epochs=2, dp=-1),
        traj=TrajDecoderConfig(window_size=8, step=4, trans_layer=1, latent_dim=16),
    )


def _opt(tmp_path, mode="train", **over):
    args = [
        "--mode", mode, "--synthetic", "--synthetic_size", "16",
        "--project", str(tmp_path / "runs"), "--exp_name", "t",
        "--render_dir", str(tmp_path / "renders"), "--no_render",
        "--epochs", "2", "--save_interval", "1", "--batch_size", "8",
        "--required_dancer_num", "2", "--window_size", "16",
        "--render_count", "2",
    ]
    opt = parse_train_opt(args)
    for k, v in over.items():
        setattr(opt, k, v)
    return opt


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("orch")
    opt = _opt(tmp_path)
    runner = TCDiff(_tiny_cfg(), use_ema_for_eval=False)
    runner.train_loop(opt)
    return tmp_path, runner


def test_train_loop_checkpoints_and_metrics(trained):
    tmp_path, runner = trained
    ckpts = glob.glob(str(tmp_path / "runs" / "t" / "checkpoints" / "ckpt_*"))
    assert len(ckpts) == 2  # save_interval=1, 2 epochs
    assert int(runner.state.step) == 4  # 8 samples / batch 4 * 2 epochs
    rows = [
        json.loads(l)
        for l in open(tmp_path / "runs" / "t" / "metrics.jsonl")
        if "_config" not in l
    ]
    assert len(rows) == 2
    assert np.isfinite(rows[-1]["total"])
    for key in ("recon", "velocity", "fk", "foot", "steps_per_sec"):
        assert key in rows[-1]


def test_resume_from_checkpoint(trained):
    tmp_path, runner = trained
    ckpt_dir = str(tmp_path / "runs" / "t" / "checkpoints")
    resumed = TCDiff(_tiny_cfg(), checkpoint_path=ckpt_dir, use_ema_for_eval=False)
    assert int(resumed.state.step) == int(runner.state.step)
    a = np.asarray(next(iter(jax_leaves(resumed.state.params))))
    b = np.asarray(next(iter(jax_leaves(runner.state.params))))
    np.testing.assert_allclose(a, b)
    assert resumed.normalizer is not None


def jax_leaves(tree):
    import jax

    return jax.tree.leaves(tree)


def test_val_without_trajmodel_mode(trained, tmp_path):
    _, runner = trained
    opt = _opt(tmp_path, mode="val_without_TrajModel", epochs=1)
    runner.given_trajectory_generation_loop(opt)


def test_test_mode_full_pipeline(trained, tmp_path):
    _, runner = trained
    opt = _opt(tmp_path, mode="test", epochs=1)
    runner.test_loop(opt)  # random DBN weights: exercises rollout+kalman+sampler


def test_render_eval_samples_writes_files(trained, tmp_path):
    _, runner = trained
    ds = runner.load_datasets(_opt(tmp_path))[1]
    out = str(tmp_path / "r")
    poses = runner.render_eval_samples(ds, epoch=1, render_dir=out, count=1, render=True)
    assert poses.shape[0] == 1
    assert glob.glob(os.path.join(out, "*.gif"))


def test_train_loop_scan_steps(tmp_path):
    """scan_steps=2 runs pairs of batches as one lax.scan dispatch
    (TrainConfig.scan_steps; BENCH_NOTES r5 host-dispatch amortization).
    With 3 batches/epoch the epoch tail (1 batch) must still train via
    the single-step path — no data dropped, step counter exact."""
    opt = _opt(tmp_path, scan_steps=2, synthetic_size=24)
    cfg = _tiny_cfg()
    runner = TCDiff(cfg, use_ema_for_eval=False)
    runner.train_loop(opt)
    assert int(runner.state.step) == 6  # 24/8 = 3 steps x 2 epochs
    rows = [
        json.loads(l)
        for l in open(tmp_path / "runs" / "t" / "metrics.jsonl")
        if "_config" not in l
    ]
    assert len(rows) == 2
    assert np.isfinite(rows[-1]["total"])
    assert rows[-1]["steps_per_sec"] > 0
