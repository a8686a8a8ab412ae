"""Processed-dataset npz cache round-trip and orchestrator integration."""

import os

import numpy as np
import pytest

from tcdiff_tpu.data.dataset import AIOZDataset


def test_cache_roundtrip(tmp_path):
    # reuse the created tree from the create_dataset integration fixture
    from tests.test_create_dataset import _make_raw_tree, create_dataset, parse_opt

    root = tmp_path / "aioz"
    _make_raw_tree(root)
    create_dataset(parse_opt(["--dataset_folder", str(root), "--root-path", str(root)]))

    ds = AIOZDataset(str(root), train=True, required_dancer_num=2)
    cache = str(tmp_path / "backup" / "train.npz")
    ds.save_cache(cache)
    ds2 = AIOZDataset.from_cache(cache)

    assert ds2.train is True
    assert ds2.required_dancer_num == 2
    np.testing.assert_array_equal(ds.poses, ds2.poses)
    assert ds.feature_files == ds2.feature_files
    assert ds.wav_files == ds2.wav_files
    x = np.random.default_rng(0).normal(size=(1, 151)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(ds.normalizer.normalize(x)),
        np.asarray(ds2.normalizer.normalize(x)),
        rtol=1e-6,
    )
    b = next(iter(ds2.batches(2)))
    assert b["x"].shape == (2, 2, 150, 151)
