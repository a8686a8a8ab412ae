"""The full FILE-BASED path, end to end (VERDICT r3 #7).

A tiny synthetic fixture written in the RAW AIOZ-GDance on-disk layout
(`motions_smpl/<seq>.pkl` + `musics438/<seq>.wav` + split txts) is pushed
through `create_dataset` (split -> slice -> feats438), loaded back through
`AIOZDataset`, and evaluated with `--mode eval --traj_source both` — so on
real data, day one, the only untested step is the data itself.

Reference path under test: `/root/reference/data/create_dataset.py:12-26`
-> `dataset/group_dataset.py:93-97` -> `TCDiff.py:310-431`.
"""

import pickle
import types

import numpy as np
import pytest

from tcdiff_tpu.config import (
    DanceDecoderConfig,
    DiffusionConfig,
    TCDiffConfig,
    TrainConfig,
    TrajDecoderConfig,
)

SR = 30720  # the feats438 recipe's native rate (data/features.py)


def _write_raw_tree(root, seqs_train, seqs_test, dn=2, T=165, secs=5.5):
    """Raw AIOZ layout: 165 motion frames / 5.5 s audio -> 2 slices each
    (5 s window, 0.5 s stride)."""
    from tcdiff_tpu.data.audio import save_wav

    rng = np.random.default_rng(0)
    (root / "motions_smpl").mkdir(parents=True)
    (root / "musics438").mkdir()
    for name in (*seqs_train, *seqs_test):
        md = {
            "root_trans": (rng.normal(size=(dn, T, 3)) * 0.2).astype(np.float32),
            "smpl_poses": (rng.normal(size=(dn, T, 72)) * 0.2).astype(np.float32),
            "smpl_betas": np.zeros((dn, 10), np.float32),
            "meta": {"name": name},
        }
        with open(root / "motions_smpl" / f"{name}.pkl", "wb") as f:
            pickle.dump(md, f)
        t = np.arange(int(secs * SR)) / SR
        y = 0.2 * np.sin(2 * np.pi * 220.0 * t) + 0.02 * rng.normal(size=t.shape)
        save_wav(str(root / "musics438" / f"{name}.wav"), y.astype(np.float32), SR)
    (root / "train_split_sequence_names.txt").write_text("\n".join(seqs_train) + "\n")
    (root / "val_split_sequence_names.txt").write_text("\n".join(seqs_test) + "\n")


@pytest.fixture(scope="module")
def aioz_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("aioz_raw") / "AIOZ"
    _write_raw_tree(root, seqs_train=("seq_a", "seq_b"), seqs_test=("seq_c",))

    from tcdiff_tpu.data.create_dataset import create_dataset

    opt = types.SimpleNamespace(
        dataset_folder=str(root), root_path=str(root),
        stride=0.5, length=5.0, workers=1,
    )
    create_dataset(opt)
    return root


def test_create_dataset_layout(aioz_tree):
    root = aioz_tree
    for split, n_seq in (("train", 2), ("test", 1)):
        motions = sorted((root / split / "motions_sliced").glob("*.pkl"))
        wavs = sorted((root / split / "wavs_sliced").glob("*.wav"))
        feats = sorted((root / split / "feats438").glob("*.npy"))
        assert len(motions) == len(wavs) == len(feats) == 2 * n_seq
        with open(motions[0], "rb") as f:
            sl = pickle.load(f)
        assert sl["pos"].shape == (2, 150, 3) and sl["q"].shape == (2, 150, 72)
        feat = np.load(feats[0])
        assert feat.shape == (301, 438)


def test_files_to_eval_report(aioz_tree, tmp_path):
    from tcdiff_tpu.cli.args import parse_train_opt
    from tcdiff_tpu.data.dataset import AIOZDataset
    from tcdiff_tpu.train.orchestrator import TCDiff

    root = aioz_tree
    train = AIOZDataset(str(root), train=True, required_dancer_num=2)
    test = AIOZDataset(
        str(root), train=False, required_dancer_num=2, normalizer=train.normalizer
    )
    assert len(train) == 4 and len(test) == 2
    assert train.poses.shape[1:] == (2, 150, 151)

    # tiny net at the DATA's structural shapes (seq 150, cond 438)
    cfg = TCDiffConfig(
        model=DanceDecoderConfig(
            seq_len=150, latent_dim=32, ff_size=32, num_layers=1, num_heads=2,
            head_dim=16, cond_feature_dim=438, dancer_num=2,
        ),
        diffusion=DiffusionConfig(sampling_timesteps=2, n_timestep=10),
        train=TrainConfig(batch_size=2, dp=-1),
        traj=TrajDecoderConfig(window_size=30, step=15, trans_layer=1, latent_dim=16),
    )
    opt = parse_train_opt([
        "--mode", "eval", "--traj_source", "both",
        "--data_path", str(root), "--no_cache",
        "--project", str(tmp_path / "runs"), "--exp_name", "e2e",
        "--required_dancer_num", "2", "--render_count", "2",
    ])
    runner = TCDiff(cfg, use_ema_for_eval=False)
    report = runner.evaluate_loop(opt)
    assert report["traj_source"] == "both"
    for key in ("fid_k", "fid_g", "div_k", "foot_skate", "beat_align", "collision_freq"):
        assert np.isfinite(report[key]), key
        assert np.isfinite(report["dbn_traj"][key]), key
    assert (tmp_path / "runs" / "e2e" / "eval.json").exists()
