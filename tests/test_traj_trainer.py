"""DBN trainer: jitted window step, lr schedule, eval rollout, renders."""

import glob
import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tcdiff_tpu.config import TrajDecoderConfig
from tcdiff_tpu.trajdecoder import (
    SyntheticTrajDataset,
    TrajTrainer,
    make_traj_optimizer,
    traj_losses,
)


def _tiny_cfg(**over):
    base = dict(
        window_size=8, step=4, trans_layer=1, latent_dim=16, n_head=2,
        total_iter=4, print_iter=2, batch_size=8, lr=1e-3,
        lr_milestones=(2,), gamma=0.1, seed=0,
    )
    base.update(over)
    return TrajDecoderConfig(**base)


def test_traj_losses_match_reference_formula():
    """Same three-term loss as `train_traj.py:183-196` computed with numpy."""
    rng = np.random.default_rng(0)
    pred = rng.normal(size=(2, 3, 10, 2)).astype(np.float32)
    target = rng.normal(size=(2, 3, 10, 2)).astype(np.float32)
    total, parts = traj_losses(jnp.asarray(pred), jnp.asarray(target))

    recon = np.mean((pred - target) ** 2)
    dis = np.mean(
        ((target[:, 1:] - target[:, :-1]) - (pred[:, 1:] - pred[:, :-1])) ** 2
    )
    vel = np.mean(
        ((target[:, :, 1:] - target[:, :, :-1]) - (pred[:, :, 1:] - pred[:, :, :-1])) ** 2
    )
    np.testing.assert_allclose(float(parts["recon"]), recon, rtol=1e-5)
    np.testing.assert_allclose(float(parts["dis_loss"]), dis, rtol=1e-5)
    np.testing.assert_allclose(float(parts["v_loss"]), vel, rtol=1e-5)
    np.testing.assert_allclose(float(total), recon + 2 * dis + 2 * vel, rtol=1e-5)


def test_lr_schedule_multistep():
    cfg = _tiny_cfg(lr=2e-3, lr_milestones=(60_000,), gamma=0.05)
    import optax

    sched = optax.piecewise_constant_schedule(cfg.lr, {m: cfg.gamma for m in cfg.lr_milestones})
    assert np.isclose(float(sched(0)), 2e-3)
    assert np.isclose(float(sched(59_999)), 2e-3)
    assert np.isclose(float(sched(60_001)), 1e-4)  # 2e-3 * 0.05


def test_traj_trainer_end_to_end(tmp_path):
    cfg = _tiny_cfg()
    trainer = TrajTrainer(cfg, dancer_num=2)
    train_ds = SyntheticTrajDataset(16, 2, seq_len=16, seed=0)
    test_ds = SyntheticTrajDataset(8, 2, seq_len=16, seed=1, normalizer=train_ds.normalizer)

    trainer.train(train_ds, test_ds, out_dir=str(tmp_path), render=True)
    assert int(trainer.state.step) == cfg.total_iter

    rows = [json.loads(l) for l in open(tmp_path / "metrics.jsonl") if "_config" not in l]
    assert len(rows) == 2  # print_iter=2, total=4
    assert np.isfinite(rows[-1]["total"])
    assert glob.glob(str(tmp_path / "ckpt" / "ckpt_*"))
    assert glob.glob(str(tmp_path / "renders" / "traj_*.gif"))

    # eval rollout extends the seed window by step-multiples
    batch = next(iter(test_ds.batches(4)))
    traj = trainer.eval_rollout(batch)
    assert traj.shape[0] == 4 and traj.shape[1] == 2 and traj.shape[3] == 2
    assert traj.shape[2] >= cfg.window_size
    assert np.isfinite(traj).all()


def test_traj_dataset_shapes_and_normalization():
    ds = SyntheticTrajDataset(6, 3, seq_len=16, seed=0)
    assert ds.roots.shape == (6, 3, 16, 3)
    assert np.abs(ds.roots).max() <= 1.0 + 1e-5  # min-max normalized to [-1, 1]
    b = next(iter(ds.batches(4)))
    assert b["x"].shape == (4, 3, 16, 3)
    assert b["cond"].shape == (4, 33, 438)
