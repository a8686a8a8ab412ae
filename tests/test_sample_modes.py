"""CLI-reachable sampler modes: footwork adaptor and DDPM via the orchestrator."""

import numpy as np
import pytest

from tcdiff_tpu.cli.args import parse_train_opt
from tcdiff_tpu.train.orchestrator import TCDiff

from tests.test_orchestrator import _opt, _tiny_cfg


@pytest.fixture(scope="module")
def runner():
    return TCDiff(_tiny_cfg(), use_ema_for_eval=False)


def test_val_loop_footwork_mode(runner, tmp_path):
    opt = _opt(tmp_path, mode="val_without_TrajModel", epochs=1)
    opt.sample_mode = "footwork"
    runner.given_trajectory_generation_loop(opt)


def test_val_loop_ddpm_mode(runner, tmp_path):
    # tiny n_timestep=10 keeps the ancestral loop short
    opt = _opt(tmp_path, mode="val_without_TrajModel", epochs=1)
    opt.sample_mode = "ddpm"
    runner.given_trajectory_generation_loop(opt)


def test_cli_accepts_all_sample_modes():
    for m in ("normal", "long", "footwork", "ddpm"):
        opt = parse_train_opt(["--sample_mode", m])
        assert opt.sample_mode == m
    with pytest.raises(SystemExit):
        parse_train_opt(["--sample_mode", "bogus"])


def test_test_loop_with_trained_dbn_checkpoint(runner, tmp_path):
    """Two-stage pipeline consuming a TrajTrainer-saved orbax checkpoint dir."""
    from tcdiff_tpu.config import TrajDecoderConfig
    from tcdiff_tpu.trajdecoder import SyntheticTrajDataset, TrajTrainer

    import dataclasses

    tcfg = dataclasses.replace(runner.cfg.traj, print_iter=2)  # save at iter 2
    trainer = TrajTrainer(tcfg, dancer_num=runner.cfg.model.dancer_num)
    ds = SyntheticTrajDataset(16, runner.cfg.model.dancer_num, seq_len=16, seed=0)
    trainer.train(ds, None, total_iter=2, out_dir=str(tmp_path / "traj"), batch_size=8)

    opt = _opt(tmp_path, mode="test", epochs=1)
    opt.traj_checkpoint = str(tmp_path / "traj" / "ckpt")
    runner.test_loop(opt)
