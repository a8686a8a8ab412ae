"""Offline pipeline integration: raw tree -> split/slice/feats438 -> datasets."""

import glob
import os
import pickle

import numpy as np
import pytest

from tcdiff_tpu.data.audio import save_wav
from tcdiff_tpu.data.create_dataset import (
    create_dataset,
    generate_dancer_split,
    parse_opt,
    slice_audio,
)
from tcdiff_tpu.data.dataset import AIOZDataset, load_split_file
from tcdiff_tpu.data.features import SR
from tcdiff_tpu.trajdecoder.dataset import TrajDataset


def _make_raw_tree(root, n_train=2, n_test=1, dancers=2, dur_s=6.0):
    rng = np.random.default_rng(0)
    (root / "motions_smpl").mkdir(parents=True)
    (root / "musics438").mkdir()
    names = [f"seq{i:03d}" for i in range(n_train + n_test)]
    frames = int(dur_s * 30)
    for name in names:
        motion = {
            "root_trans": rng.normal(size=(dancers, frames, 3)).astype(np.float32) * 0.1,
            "smpl_poses": rng.normal(size=(dancers, frames, 72)).astype(np.float32) * 0.2,
            "smpl_betas": np.zeros((dancers, 10), np.float32),
            "meta": {"fps": 30},
        }
        with open(root / "motions_smpl" / f"{name}.pkl", "wb") as f:
            pickle.dump(motion, f)
        t = np.arange(int(dur_s * SR)) / SR
        wav = 0.2 * np.sin(2 * np.pi * 220 * t).astype(np.float32)
        wav[:: SR // 2] = 0.9  # impulses for onset/beat channels
        save_wav(str(root / "musics438" / f"{name}.wav"), wav, SR)
    with open(root / "train_split_sequence_names.txt", "w") as f:
        f.writelines(n + "\n" for n in names[:n_train])
    with open(root / "val_split_sequence_names.txt", "w") as f:
        f.writelines(n + "\n" for n in names[n_train:])
    return names


@pytest.fixture(scope="module")
def raw_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("aioz")
    names = _make_raw_tree(root)
    opt = parse_opt(
        ["--dataset_folder", str(root), "--root-path", str(root)]
    )
    create_dataset(opt)
    return root, names


def test_pipeline_file_layout(raw_tree):
    root, names = raw_tree
    # 6 s @ stride 0.5 with 5 s windows -> 3 slices per sequence
    train_motions = sorted(glob.glob(str(root / "train" / "motions_sliced" / "*.pkl")))
    train_wavs = sorted(glob.glob(str(root / "train" / "wavs_sliced" / "*.wav")))
    train_feats = sorted(glob.glob(str(root / "train" / "feats438" / "*.npy")))
    assert len(train_motions) == 2 * 3
    assert len(train_wavs) == len(train_feats) == len(train_motions)
    assert len(glob.glob(str(root / "test" / "motions_sliced" / "*.pkl"))) == 3

    with open(train_motions[0], "rb") as f:
        m = pickle.load(f)
    assert m["pos"].shape == (2, 150, 3)
    assert m["q"].shape == (2, 150, 72)
    feat = np.load(train_feats[0])
    assert feat.shape == (301, 438)
    assert np.isfinite(feat).all()


def test_datasets_load_created_tree(raw_tree):
    root, _ = raw_tree
    train = AIOZDataset(str(root), train=True, required_dancer_num=2)
    test = AIOZDataset(
        str(root), train=False, required_dancer_num=2, normalizer=train.normalizer
    )
    assert len(train) == 6 and len(test) == 3
    batch = next(iter(train.batches(2)))
    assert batch["x"].shape == (2, 2, 150, 151)
    assert batch["cond"].shape == (2, 301, 438)

    traj = TrajDataset(str(root), train=True, required_dancer_num=2)
    assert traj.roots.shape == (6, 2, 150, 3)


def test_dancer_split_generator(raw_tree, tmp_path):
    root, names = raw_tree
    out = generate_dancer_split(str(root / "motions_smpl"), str(tmp_path), 2)
    listed = load_split_file(out)
    assert sorted(listed) == sorted(names)  # all sequences have 2 dancers
    out3 = generate_dancer_split(str(root / "motions_smpl"), str(tmp_path), 3)
    assert load_split_file(out3) == []


def test_split_file_filters_dataset(raw_tree, tmp_path):
    root, names = raw_tree
    split = [names[0]]
    ds = AIOZDataset(str(root), train=True, required_dancer_num=2, split_file=split)
    assert len(ds) == 3  # only seq000's slices


def test_slice_audio_counts(tmp_path):
    wav = np.zeros(int(7.2 * SR), np.float32)
    save_wav(str(tmp_path / "a.wav"), wav, SR)
    n = slice_audio(str(tmp_path / "a.wav"), 0.5, 5.0, str(tmp_path))
    assert n == 5  # starts at 0, 0.5, ..., 2.0


def test_slice_audio_folder(tmp_path):
    from tcdiff_tpu.data.create_dataset import slice_audio_folder

    wav_dir = tmp_path / "ood"
    wav_dir.mkdir()
    save_wav(str(wav_dir / "song.wav"), np.zeros(int(6.0 * SR), np.float32), SR)
    slice_audio_folder(str(wav_dir))
    out = sorted(glob.glob(str(tmp_path / "ood_sliced" / "*.wav")))
    assert len(out) == 3  # 6 s -> starts 0, 0.5, 1.0
    slice_audio_folder(str(wav_dir))  # idempotent
    assert len(glob.glob(str(tmp_path / "ood_sliced" / "*.wav"))) == 3
