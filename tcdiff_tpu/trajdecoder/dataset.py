"""Trajectory dataset: root positions only, for DBN training.

Rebuilds `/root/reference/TrajDecoder/dataset/traj_dataset.py:24-295` — the
same sliced-motion loading as the main dataset but keeping only the 3-d root
position per dancer, Y-up -> Z-up rotated, min-max normalized. The
reference's per-sample normalizer-refit quirk (`traj_dataset.py:169-176`,
last sample's stats win) is preserved by default for parity.
"""

from __future__ import annotations

import glob
import os
import pickle
from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from tcdiff_tpu.data.dataset import rotate_points_x90
from tcdiff_tpu.data.normalizer import Normalizer


@jax.jit
def _per_sample_normalize_roots(roots: jnp.ndarray):
    def one(sample):
        flat = sample.reshape(-1, sample.shape[-1])
        norm = Normalizer.fit(flat)
        return norm.normalize(sample), norm

    normalized, norms = jax.vmap(one)(roots)
    return normalized, jax.tree.map(lambda a: a[-1], norms)


class TrajDataset:
    """Yields (x (B, dn, S, 3) normalized roots, cond (B, 2S+1, 438), names, wavs)."""

    def __init__(
        self,
        data_path: str,
        train: bool,
        required_dancer_num: int = 3,
        split_file: Optional[Sequence[str]] = None,
        normalizer: Optional[Normalizer] = None,
        per_sample_normalization: bool = True,
        cache_features: bool = True,
    ):
        self.train = train
        self._feature_cache = {} if cache_features else None

        split_dir = os.path.join(data_path, "train" if train else "test")
        motion_dir = os.path.join(split_dir, "motions_sliced")
        feats_dir = os.path.join(split_dir, "feats438")
        wav_dir = os.path.join(split_dir, "wavs_sliced")

        all_pos, names, wavs = [], [], []
        for motion_p in sorted(glob.glob(os.path.join(motion_dir, "*.pkl"))):
            stem = os.path.splitext(os.path.basename(motion_p))[0]
            origin = "_".join(stem.split("_")[:-1])
            if split_file is not None and origin not in split_file:
                continue
            feat_p = os.path.join(feats_dir, stem + ".npy")
            if not os.path.exists(feat_p):
                continue
            with open(motion_p, "rb") as f:
                data = pickle.load(f)
            pos = np.asarray(data["pos"], dtype=np.float32)
            if pos.shape[0] != required_dancer_num:
                continue
            all_pos.append(pos)
            names.append(feat_p)
            wavs.append(os.path.join(wav_dir, stem + ".wav"))

        if not all_pos:
            raise FileNotFoundError(
                f"no {required_dancer_num}-dancer motion slices under {motion_dir}"
            )
        roots = jnp.asarray(np.stack(all_pos))  # (N, dn, S, 3) Y-up
        roots = rotate_points_x90(roots)

        if train and normalizer is None:
            if per_sample_normalization:
                normalized, self.normalizer = _per_sample_normalize_roots(roots)
            else:
                self.normalizer = Normalizer.fit(roots.reshape(-1, 3))
                normalized = self.normalizer.normalize(roots)
        else:
            assert normalizer is not None, "test split needs the train normalizer"
            self.normalizer = normalizer
            normalized = self.normalizer.normalize(roots)

        self.roots = np.asarray(normalized)
        self.feature_files = names
        self.wav_files = wavs

    def __len__(self):
        return len(self.roots)

    def _load_feature(self, path: str) -> np.ndarray:
        if self._feature_cache is not None and path in self._feature_cache:
            return self._feature_cache[path]
        feat = np.load(path).astype(np.float32)
        if self._feature_cache is not None:
            self._feature_cache[path] = feat
        return feat

    def get(self, idx: int):
        return (
            self.roots[idx],
            self._load_feature(self.feature_files[idx]),
            self.feature_files[idx],
            self.wav_files[idx],
        )

    def batches(self, batch_size: int, rng: Optional[np.random.Generator] = None, drop_last=True):
        order = np.arange(len(self))
        if rng is not None:
            rng.shuffle(order)
        for i in range(0, len(order), batch_size):
            idx = order[i : i + batch_size]
            if drop_last and len(idx) < batch_size:
                return
            yield {
                "x": self.roots[idx],
                "cond": np.stack([self._load_feature(self.feature_files[j]) for j in idx]),
                "filename": [self.feature_files[j] for j in idx],
                "wav": [self.wav_files[j] for j in idx],
            }


class SyntheticTrajDataset:
    """Dataset-free stand-in with identical shapes (for tests/CI)."""

    def __init__(self, n: int, dancer_num: int = 3, seq_len: int = 150, seed: int = 0,
                 normalizer: Optional[Normalizer] = None):
        from tcdiff_tpu.data.synthetic import synthetic_motion, synthetic_music

        pos, _ = synthetic_motion(n, dancer_num, seq_len, seed)
        roots = rotate_points_x90(jnp.asarray(pos))
        if normalizer is None:
            normalized, self.normalizer = _per_sample_normalize_roots(roots)
        else:
            self.normalizer = normalizer
            normalized = normalizer.normalize(roots)
        self.roots = np.asarray(normalized)
        self.music = synthetic_music(n, 2 * seq_len + 1, seed=seed + 1)
        self.feature_files = [f"synthetic_{i}_slice0.npy" for i in range(n)]
        self.wav_files = [f"synthetic_{i}_slice0.wav" for i in range(n)]

    __len__ = TrajDataset.__len__
    get = lambda self, idx: (
        self.roots[idx], self.music[idx], self.feature_files[idx], self.wav_files[idx]
    )

    def batches(self, batch_size, rng=None, drop_last=True):
        order = np.arange(len(self))
        if rng is not None:
            rng.shuffle(order)
        for i in range(0, len(order), batch_size):
            idx = order[i : i + batch_size]
            if drop_last and len(idx) < batch_size:
                return
            yield {
                "x": self.roots[idx],
                "cond": self.music[idx],
                "filename": [self.feature_files[j] for j in idx],
                "wav": [self.wav_files[j] for j in idx],
            }
