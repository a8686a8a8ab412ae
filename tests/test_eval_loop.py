"""--mode eval: end-to-end metric report through the orchestrator."""

import json
import os

import numpy as np

from tcdiff_tpu.train.orchestrator import TCDiff

from tests.test_orchestrator import _opt, _tiny_cfg


def test_evaluate_loop_writes_report(tmp_path):
    runner = TCDiff(_tiny_cfg(), use_ema_for_eval=False)
    opt = _opt(tmp_path, mode="eval")
    report = runner.evaluate_loop(opt)
    for key in ("fid_k", "fid_g", "div_k", "foot_skate", "beat_align", "collision_freq"):
        assert key in report, key
        assert np.isfinite(report[key])
    on_disk = json.load(open(tmp_path / "runs" / "t" / "eval.json"))
    assert on_disk.keys() == report.keys()


def test_evaluate_loop_dbn_traj_source(tmp_path):
    """--traj_source both: the full-pipeline (DBN rollout + Kalman) setting
    is reported alongside the GT-trajectory setting — the paper's main
    table is full-pipeline (`/root/reference/TCDiff.py:434-625`)."""
    runner = TCDiff(_tiny_cfg(), use_ema_for_eval=False)
    opt = _opt(tmp_path, mode="eval", traj_source="both")
    report = runner.evaluate_loop(opt)
    assert report["traj_source"] == "both"
    assert "dbn_traj" in report
    for key in ("fid_k", "fid_g", "div_k", "foot_skate", "beat_align", "collision_freq"):
        assert np.isfinite(report[key]), key
        assert np.isfinite(report["dbn_traj"][key]), key
    # the two settings sample with different trajectories -> different metrics
    assert report["dbn_traj"]["fid_k"] != report["fid_k"]
    on_disk = json.load(open(tmp_path / "runs" / "t" / "eval.json"))
    assert on_disk["dbn_traj"].keys() == report["dbn_traj"].keys()


def test_evaluate_loop_dbn_only(tmp_path):
    runner = TCDiff(_tiny_cfg(), use_ema_for_eval=False)
    opt = _opt(tmp_path, mode="eval", traj_source="dbn")
    report = runner.evaluate_loop(opt)
    assert report["traj_source"] == "dbn"
    assert "dbn_traj" not in report
    assert np.isfinite(report["fid_g"])


def test_eval_during_train(tmp_path):
    runner = TCDiff(_tiny_cfg(), use_ema_for_eval=False)
    opt = _opt(tmp_path, epochs=1)
    opt.eval_during_train = True
    opt.render_during_train = False
    runner.train_loop(opt)
    rows = [
        json.loads(l)
        for l in open(tmp_path / "runs" / "t" / "metrics.jsonl")
        if "_config" not in l
    ]
    assert any("eval/fid_k" in r for r in rows)
