"""AIOZ-GDance dataset: host-side loading, device-side processing.

Rebuilds the behavior of the reference's `AIOZDataset`
(`/root/reference/dataset/group_dataset.py:23-238`):

  * load 5 s motion slices (pkl: pos (dn, 150, 3), q (dn, 150, 72)) filtered
    by a dancer-count split file and by the existence of the matching
    feats438 music-feature file
  * rotate Y-up AIOZ data to Z-up (root orientation and root positions)
  * run SMPL FK and threshold foot velocities (< 0.01) into contact labels
  * convert joint rotations to 6D and pack [contacts(4), root(3), rot6d(144)]
    = 151 channels
  * min-max normalize to [-1, 1]

The whole per-sequence pipeline is ONE jitted, vmapped function — the
reference loops sequence-by-sequence in Python with a fresh FK each time
(`group_dataset.py:173-232`); here the full dataset is processed in a single
batched XLA program.

Quirk preserved for parity: the reference re-fits the train normalizer on
every sequence, so each train sample is normalized by its OWN min/max and the
*last* sequence's stats become the dataset normalizer
(`group_dataset.py:216-218`). `per_sample_normalization=True` (default)
replicates that; pass False for the saner single-fit behavior.
"""

from __future__ import annotations

import glob
import os
import pickle
from pathlib import Path
from typing import List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from tcdiff_tpu.config import FOOT_JOINTS
from tcdiff_tpu.data.normalizer import Normalizer
from tcdiff_tpu.geometry import (
    axis_angle_to_quaternion,
    ax_to_6v,
    quat_multiply,
    quaternion_to_axis_angle,
    smpl_fk,
)

# 90° about +X as a wxyz quaternion: rotates Y-up into Z-up
# (reference `group_dataset.py:186-198`)
_YUP_TO_ZUP_QUAT = np.array([0.7071068, 0.7071068, 0.0, 0.0], dtype=np.float32)


def rotate_points_x90(points: jnp.ndarray) -> jnp.ndarray:
    """(x, y, z) -> (x, -z, y): the RotateAxisAngle(90, 'X') of the reference."""
    x, y, z = points[..., 0], points[..., 1], points[..., 2]
    return jnp.stack([x, -z, y], axis=-1)


def _process_one(root_pos: jnp.ndarray, local_q: jnp.ndarray) -> jnp.ndarray:
    """(dn, S, 3), (dn, S, 24, 3) axis-angle -> (dn, S, 151) unnormalized."""
    # Z-up rotation of root orientation
    root_aa = local_q[:, :, 0, :]
    root_quat = quat_multiply(
        jnp.asarray(_YUP_TO_ZUP_QUAT), axis_angle_to_quaternion(root_aa)
    )
    root_aa = quaternion_to_axis_angle(root_quat)
    local_q = local_q.at[:, :, 0, :].set(root_aa)
    root_pos = rotate_points_x90(root_pos)

    # foot contacts from FK velocities (`group_dataset.py:201-207`)
    positions = smpl_fk(local_q, root_pos)  # (dn, S, 24, 3)
    feet = positions[:, :, FOOT_JOINTS, :]
    vel = jnp.linalg.norm(feet[:, 1:] - feet[:, :-1], axis=-1)
    feetv = jnp.concatenate([vel, jnp.zeros_like(vel[:, :1])], axis=1)
    contacts = (feetv < 0.01).astype(local_q.dtype)  # (dn, S, 4)

    rot6d = ax_to_6v(local_q)  # (dn, S, 24, 6)
    dn, s = rot6d.shape[:2]
    return jnp.concatenate(
        [contacts, root_pos, rot6d.reshape(dn, s, -1)], axis=-1
    )  # (dn, S, 151)


@jax.jit
def _process_batch(root_pos: jnp.ndarray, local_q: jnp.ndarray) -> jnp.ndarray:
    """(N, dn, S, 3), (N, dn, S, 24, 3) -> (N, dn, S, 151) unnormalized."""
    return jax.vmap(_process_one)(root_pos, local_q)


@jax.jit
def _per_sample_normalize(packed: jnp.ndarray):
    """Normalize each sequence by its own min/max (train-path parity quirk).

    packed: (N, dn, S, C). Returns normalized data and the LAST sequence's
    normalizer stats (what the reference ends up with as `self.normalizer`).
    """

    def one(sample):
        flat = sample.reshape(-1, sample.shape[-1])
        norm = Normalizer.fit(flat)
        return norm.normalize(sample), norm

    normalized, norms = jax.vmap(one)(packed)
    last = jax.tree.map(lambda a: a[-1], norms)
    return normalized, last


def load_split_file(path: str) -> List[str]:
    with open(path) as f:
        return [line.strip() for line in f if line.strip()]


class AIOZDataset:
    """In-memory dataset of processed motion slices + lazy music features.

    Iteration yields dict batches with:
      x:    (B, dn, 150, 151) normalized motion  — the reference's pose tensor
      cond: (B, 301, 438) music features
      filename / wav: lists of paths
    """

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
        self.required_dancer_num = required_dancer_num
        self._feature_cache = {} if cache_features else None

        split_dir = os.path.join(data_path, "train" if train else "test")
        motion_dir = os.path.join(split_dir, "motions_sliced")
        feats_dir = os.path.join(split_dir, "feats438")
        wav_dir = os.path.join(split_dir, "wavs_sliced")

        all_pos, all_q, names, wavs = [], [], [], []
        for motion_p in sorted(glob.glob(os.path.join(motion_dir, "*.pkl"))):
            stem = os.path.splitext(os.path.basename(motion_p))[0]
            origin = "_".join(stem.split("_")[:-1])  # strip _sliceN
            if split_file is not None and origin not in split_file:
                continue
            feat_p = os.path.join(feats_dir, stem + ".npy")
            if not os.path.exists(feat_p):
                continue
            with open(motion_p, "rb") as f:
                data = pickle.load(f)
            pos, q = np.asarray(data["pos"]), np.asarray(data["q"])
            if pos.shape[0] != required_dancer_num:
                continue
            all_pos.append(pos.astype(np.float32))
            all_q.append(q.astype(np.float32))
            names.append(feat_p)
            wavs.append(os.path.join(wav_dir, stem + ".wav"))

        if not all_pos:
            raise FileNotFoundError(
                f"no {required_dancer_num}-dancer motion slices under {motion_dir}"
            )

        pos_arr = np.stack(all_pos)  # (N, dn, S, 3)
        q_arr = np.stack(all_q)  # (N, dn, S, 72)
        n, dn, s, _ = q_arr.shape
        q_arr = q_arr.reshape(n, dn, s, 24, 3)

        packed = _process_batch(jnp.asarray(pos_arr), jnp.asarray(q_arr))

        if train:
            if per_sample_normalization:
                normalized, self.normalizer = _per_sample_normalize(packed)
            else:
                flat = packed.reshape(-1, packed.shape[-1])
                self.normalizer = Normalizer.fit(flat)
                normalized = self.normalizer.normalize(packed)
        else:
            assert normalizer is not None, "test split needs the train normalizer"
            self.normalizer = normalizer
            normalized = self.normalizer.normalize(packed)

        poses = np.asarray(normalized)
        assert not np.isnan(poses).any()
        self.poses = poses  # (N, dn, S, 151)
        self.feature_files = names
        self.wav_files = wavs

    def __len__(self):
        return len(self.poses)

    # ---------------------------------------------------------------- cache
    # The reference pickles whole Dataset objects as a cache
    # (`TCDiff.py:143-173`, gated by --no_cache/--force_reload); here the
    # processed arrays go into one npz, loadable without reprocessing.
    def save_cache(self, path: str) -> None:
        Path(os.path.dirname(path) or ".").mkdir(parents=True, exist_ok=True)
        stats = self.normalizer.to_numpy()
        np.savez_compressed(
            path,
            poses=self.poses,
            feature_files=np.asarray(self.feature_files),
            wav_files=np.asarray(self.wav_files),
            norm_scale=stats["scale"],
            norm_offset=stats["offset"],
            train=np.asarray(self.train),
        )

    @classmethod
    def from_cache(cls, path: str) -> "AIOZDataset":
        z = np.load(path, allow_pickle=False)
        self = cls.__new__(cls)
        self.train = bool(z["train"])
        self.poses = z["poses"]
        self.required_dancer_num = self.poses.shape[1]
        self.feature_files = [str(s) for s in z["feature_files"]]
        self.wav_files = [str(s) for s in z["wav_files"]]
        self.normalizer = Normalizer.from_torch_state(z["norm_scale"], z["norm_offset"])
        self._feature_cache = {}
        return self

    def _load_feature(self, path: str) -> np.ndarray:
        if self._feature_cache is not None and path in self._feature_cache:
            return self._feature_cache[path]
        feat = np.load(path).astype(np.float32)
        if self._feature_cache is not None:
            self._feature_cache[path] = feat
        return feat

    def get(self, idx: int):
        return (
            self.poses[idx],
            self._load_feature(self.feature_files[idx]),
            self.feature_files[idx],
            self.wav_files[idx],
        )

    def batches(self, batch_size: int, rng: np.random.Generator = None, drop_last=True):
        """Shuffled epoch iterator over host numpy batches."""
        order = np.arange(len(self))
        if rng is not None:
            rng.shuffle(order)
        stop = len(order) - (len(order) % batch_size if drop_last else 0)
        for i in range(0, stop or len(order), batch_size):
            idx = order[i : i + batch_size]
            if drop_last and len(idx) < batch_size:
                return
            feats = np.stack([self._load_feature(self.feature_files[j]) for j in idx])
            yield {
                "x": self.poses[idx],
                "cond": feats,
                "filename": [self.feature_files[j] for j in idx],
                "wav": [self.wav_files[j] for j in idx],
            }
