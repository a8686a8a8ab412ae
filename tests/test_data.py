"""Normalizer + dataset-processing tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from tcdiff_tpu.data.normalizer import Normalizer
from tcdiff_tpu.data.dataset import (
    _per_sample_normalize,
    _process_batch,
    rotate_points_x90,
)
from tcdiff_tpu.data.synthetic import synthetic_dataset, synthetic_motion


class TestNormalizer:
    def test_range_and_roundtrip(self):
        rng = np.random.default_rng(0)
        data = rng.normal(size=(100, 151)).astype(np.float32) * 3 + 1
        norm = Normalizer.fit(jnp.asarray(data))
        y = norm.normalize(jnp.asarray(data))
        assert float(y.min()) >= -1.0 - 1e-6 and float(y.max()) <= 1.0 + 1e-6
        # channel-wise extremes map to exactly -1/1
        np.testing.assert_allclose(np.asarray(y).min(axis=0), -1, atol=1e-5)
        np.testing.assert_allclose(np.asarray(y).max(axis=0), 1, atol=1e-5)
        back = norm.unnormalize(y)
        np.testing.assert_allclose(np.asarray(back), data, atol=1e-4)

    def test_constant_channel(self):
        data = np.ones((10, 3), dtype=np.float32) * 7
        norm = Normalizer.fit(jnp.asarray(data))
        y = norm.normalize(jnp.asarray(data))
        assert np.all(np.isfinite(np.asarray(y)))

    def test_trailing_channel_unnormalize(self):
        """The reference unnormalizes the 147 trailing (non-contact) channels
        with the 151-channel scaler (`dataset/scaler.py:80-83`)."""
        rng = np.random.default_rng(1)
        data = rng.normal(size=(50, 151)).astype(np.float32)
        norm = Normalizer.fit(jnp.asarray(data))
        y = np.asarray(norm.normalize(jnp.asarray(data)))
        sub = jnp.asarray(y[:, 4:])  # trailing 147 channels
        back = np.asarray(norm.unnormalize(sub))
        np.testing.assert_allclose(back, data[:, 4:], atol=1e-4)

    def test_clip_out_of_range(self):
        data = np.linspace(0, 1, 20, dtype=np.float32).reshape(-1, 1)
        norm = Normalizer.fit(jnp.asarray(data))
        y = norm.normalize(jnp.asarray([[5.0]]))
        assert float(y[0, 0]) == 1.0


class TestProcessing:
    def test_rotate_points_x90(self):
        p = jnp.asarray([[1.0, 2.0, 3.0]])
        out = np.asarray(rotate_points_x90(p))
        np.testing.assert_allclose(out, [[1.0, -3.0, 2.0]], atol=1e-6)

    def test_packed_shape_and_channels(self):
        pos, q = synthetic_motion(2, dancer_num=3, seq_len=30, seed=0)
        packed = _process_batch(
            jnp.asarray(pos), jnp.asarray(q.reshape(2, 3, 30, 24, 3))
        )
        assert packed.shape == (2, 3, 30, 151)
        contacts = np.asarray(packed[..., :4])
        assert set(np.unique(contacts)).issubset({0.0, 1.0})
        # last frame always reads contact (velocity 0 padding)
        assert np.all(contacts[:, :, -1] == 1.0)
        # root channels are the Z-up rotated positions
        root = np.asarray(packed[..., 4:7])
        expected = np.stack([pos[..., 0], -pos[..., 2], pos[..., 1]], axis=-1)
        np.testing.assert_allclose(root, expected, atol=1e-5)

    def test_per_sample_normalization_quirk(self):
        pos, q = synthetic_motion(3, dancer_num=2, seq_len=20, seed=1)
        packed = _process_batch(
            jnp.asarray(pos), jnp.asarray(q.reshape(3, 2, 20, 24, 3))
        )
        normalized, last_norm = _per_sample_normalize(packed)
        # each sample individually spans [-1, 1]
        flat = np.asarray(normalized).reshape(3, -1, 151)
        for i in range(3):
            np.testing.assert_allclose(flat[i].min(axis=0).min(), -1, atol=1e-5)
        # the returned stats are the LAST sample's fit
        own = Normalizer.fit(packed[-1].reshape(-1, 151))
        np.testing.assert_allclose(
            np.asarray(last_norm.scale), np.asarray(own.scale), atol=1e-6
        )

    def test_synthetic_dataset_shapes(self):
        poses, music, norm = synthetic_dataset(n=4, dancer_num=3, seq_len=30)
        assert poses.shape == (4, 3, 30, 151)
        assert music.shape == (4, 61, 438)
        assert np.isfinite(poses).all() and np.isfinite(music).all()
