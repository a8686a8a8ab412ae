"""Native C++ prefetcher: npy parsing, batch assembly, ordering, fallback."""

import numpy as np
import pytest

from tcdiff_tpu.data.native_loader import (
    NativePrefetcher,
    PrefetchingBatches,
    native_available,
    read_npy_f32,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="g++ toolchain unavailable"
)


def _write_files(tmp_path, n=6, shape=(7, 5), dtype=np.float32):
    files, arrays = [], []
    for i in range(n):
        a = (np.arange(np.prod(shape)).reshape(shape) * (i + 1)).astype(dtype)
        p = str(tmp_path / f"f{i}.npy")
        np.save(p, a)
        files.append(p)
        arrays.append(a.astype(np.float32))
    return files, arrays


def test_read_npy_f32_single(tmp_path):
    files, arrays = _write_files(tmp_path, n=1)
    out = read_npy_f32(files[0], (7, 5))
    np.testing.assert_array_equal(out, arrays[0])


def test_read_npy_f64_converts(tmp_path):
    files, arrays = _write_files(tmp_path, n=1, dtype=np.float64)
    out = read_npy_f32(files[0], (7, 5))
    np.testing.assert_allclose(out, arrays[0])


def test_prefetcher_batches_in_submit_order(tmp_path):
    files, arrays = _write_files(tmp_path, n=6)
    pf = NativePrefetcher(files, (7, 5), n_threads=3)
    pf.submit([0, 2, 4])
    pf.submit([5, 1])
    b1 = pf.next()
    b2 = pf.next()
    pf.close()
    np.testing.assert_array_equal(b1, np.stack([arrays[0], arrays[2], arrays[4]]))
    np.testing.assert_array_equal(b2, np.stack([arrays[5], arrays[1]]))


def test_prefetcher_bad_file_raises(tmp_path):
    p = tmp_path / "bad.npy"
    p.write_bytes(b"not a numpy file at all")
    pf = NativePrefetcher([str(p)], (4,), n_threads=1)
    pf.submit([0])
    with pytest.raises(IOError):
        pf.next()
    pf.close()


class _FakeDataset:
    def __init__(self, files, n, item_shape):
        self.feature_files = files
        self.wav_files = [f + ".wav" for f in files]
        self.poses = np.arange(n * 3, dtype=np.float32).reshape(n, 3)
        self._shape = item_shape

    def __len__(self):
        return len(self.feature_files)

    def batches(self, batch_size, rng=None):
        raise AssertionError("fallback path should not be used when native exists")


def test_prefetching_batches_iterator(tmp_path):
    files, arrays = _write_files(tmp_path, n=6)
    ds = _FakeDataset(files, 6, (7, 5))
    out = list(
        PrefetchingBatches(ds, batch_size=2, depth=2, item_shape=(7, 5))
    )
    assert len(out) == 3
    np.testing.assert_array_equal(out[0]["cond"], np.stack(arrays[0:2]))
    np.testing.assert_array_equal(out[2]["cond"], np.stack(arrays[4:6]))
    assert out[1]["filename"] == files[2:4]
    np.testing.assert_array_equal(out[1]["x"], ds.poses[[2, 3]])


def test_prefetcher_order_under_contention(tmp_path):
    """Delivery must follow submit order even when completion is reordered:
    many single-item batches with a large thread pool."""
    files, arrays = _write_files(tmp_path, n=24, shape=(64, 32))
    pf = NativePrefetcher(files, (64, 32), n_threads=12)
    for i in range(24):
        pf.submit([i])
    for i in range(24):
        out = pf.next()
        np.testing.assert_array_equal(out[0], arrays[i], err_msg=str(i))
    pf.close()
