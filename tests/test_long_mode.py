"""Long-form generation: consecutive-slice selection and the long eval loop."""

import numpy as np
import pytest

from tcdiff_tpu.train.orchestrator import TCDiff, consecutive_slice_indices

from tests.test_orchestrator import _opt, _tiny_cfg


def test_consecutive_slice_indices_picks_ordered_run():
    files = [
        "a/songA_slice0.npy",  # 0
        "a/songB_slice3.npy",  # 1
        "a/songA_slice2.npy",  # 2 (gap: slice1 missing)
        "a/songB_slice4.npy",  # 3
        "a/songB_slice5.npy",  # 4
        "a/songB_slice6.npy",  # 5
        "a/songA_slice1.npy",  # 6
    ]
    idx = consecutive_slice_indices(files, 3)
    # songA reaches a full 3-run first: slices 0,1,2 -> indices 0,6,2 in order
    assert idx == [0, 6, 2]
    # with a bigger request, songB's 4-run (slices 3..6) wins
    assert consecutive_slice_indices(files, 10) == [1, 3, 4, 5]


def test_consecutive_slice_indices_no_match():
    assert consecutive_slice_indices(["x.npy", "y.npy"], 2) == []


def test_val_loop_long_mode_stitches(tmp_path):
    runner = TCDiff(_tiny_cfg(), use_ema_for_eval=False)
    opt = _opt(tmp_path, mode="val_without_TrajModel", epochs=1)
    opt.sample_mode = "long"
    opt.render = True  # exercise the stitch + render path
    runner.given_trajectory_generation_loop(opt)
    import glob

    assert glob.glob(str(tmp_path / "renders" / "VAL_t" / "*.gif"))
