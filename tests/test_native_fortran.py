"""Native reader handles 2-D fortran-order .npy (transposed-save case)."""

import numpy as np
import pytest

from tcdiff_tpu.data.native_loader import native_available, read_npy_f32

pytestmark = pytest.mark.skipif(not native_available(), reason="no g++")


def test_fortran_order_2d(tmp_path):
    a = np.arange(12, dtype=np.float32).reshape(3, 4)
    fa = np.asfortranarray(a)
    p = str(tmp_path / "f.npy")
    np.save(p, fa)
    out = read_npy_f32(p, (3, 4))
    np.testing.assert_array_equal(out, a)


def test_fortran_order_f64(tmp_path):
    a = np.random.default_rng(0).normal(size=(5, 7))
    p = str(tmp_path / "f.npy")
    np.save(p, np.asfortranarray(a))
    out = read_npy_f32(p, (5, 7))
    np.testing.assert_allclose(out, a.astype(np.float32))
