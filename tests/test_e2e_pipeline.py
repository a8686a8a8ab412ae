"""Grand integration: raw AIOZ-like tree -> offline pipeline -> training ->
two-stage test-mode sampling -> FK export -> Blender-pipeline artifacts.

Exercises every layer the way a user of the reference would drive it.
"""

import glob
import os
import pickle

import numpy as np
import pytest

from tcdiff_tpu.cli.args import parse_train_opt
from tcdiff_tpu.config import (
    DanceDecoderConfig,
    DiffusionConfig,
    TCDiffConfig,
    TrainConfig,
    TrajDecoderConfig,
)
from tcdiff_tpu.export import pkl_to_bvh, split_pkl_file
from tcdiff_tpu.train.orchestrator import TCDiff


@pytest.fixture(scope="module")
def pipeline_tmp(tmp_path_factory):
    return tmp_path_factory.mktemp("e2e")


@pytest.fixture(scope="module")
def raw_tree(pipeline_tmp):
    from tests.test_create_dataset import _make_raw_tree, create_dataset, parse_opt

    root = pipeline_tmp / "aioz"
    _make_raw_tree(root, n_train=2, n_test=1, dancers=2, dur_s=6.0)
    create_dataset(parse_opt(["--dataset_folder", str(root), "--root-path", str(root)]))
    return root


def _cfg():
    return TCDiffConfig(
        model=DanceDecoderConfig(
            seq_len=150, latent_dim=32, ff_size=32, num_layers=1, num_heads=2,
            dancer_num=2, head_dim=16,
        ),
        diffusion=DiffusionConfig(sampling_timesteps=2, n_timestep=10),
        train=TrainConfig(batch_size=2, save_interval=1, epochs=1, dp=1),
        traj=TrajDecoderConfig(window_size=100, step=25, trans_layer=1, latent_dim=16),
    )


def test_full_user_journey(raw_tree, pipeline_tmp):
    out = pipeline_tmp
    args = [
        "--mode", "train", "--data_path", str(raw_tree),
        "--processed_data_dir", str(out / "backup"),
        "--project", str(out / "runs"), "--exp_name", "e2e",
        "--render_dir", str(out / "renders"), "--no_render",
        "--epochs", "1", "--save_interval", "1", "--batch_size", "2",
        "--required_dancer_num", "2", "--render_count", "2",
        "--vis_fk_out", str(out / "fk_out"),
    ]
    opt = parse_train_opt(args)

    # 1) train one epoch on the real (tiny) dataset, checkpointing
    runner = TCDiff(_cfg(), use_ema_for_eval=False)
    runner.train_loop(opt)
    ckpts = glob.glob(str(out / "runs" / "e2e" / "checkpoints" / "ckpt_*"))
    assert ckpts
    # processed-dataset cache was written
    assert glob.glob(str(out / "backup" / "*.npz"))

    # 2) resume into a fresh orchestrator and run the FULL two-stage test
    #    mode (random DBN weights) with FK export
    runner2 = TCDiff(
        _cfg(), checkpoint_path=str(out / "runs" / "e2e" / "checkpoints"),
        use_ema_for_eval=False,
    )
    opt.epochs = 1
    runner2.test_loop(opt)
    fk_pkls = glob.glob(str(out / "fk_out" / "*.pkl"))
    assert fk_pkls

    # 3) FK pkl -> per-dancer pkls -> BVH (the Blender pipeline input)
    with open(fk_pkls[0], "rb") as f:
        fk = pickle.load(f)
    assert fk["full_pose"].shape[0] == 2  # dancers
    assert fk["smpl_poses"].shape[1] == 72
    per_dancer = split_pkl_file(fk_pkls[0], str(out / "split"), os.path.basename(fk_pkls[0]))
    assert len(per_dancer) == 2
    bvh = pkl_to_bvh(per_dancer[0], str(out / "bvh"))
    text = open(bvh).read()
    assert text.startswith("HIERARCHY") and "Frames: 150" in text
