"""Coverage for smaller public surfaces: profiler trace, traj pkl export,
Blender script emission, logging helpers."""

import glob
import os
import pickle

import numpy as np

from tcdiff_tpu.export.blender_launch import blender_available, write_blender_import_script
from tcdiff_tpu.utils import get_logger, trace
from tcdiff_tpu.viz.traj_render import render_traj_sample


def test_trace_noop_and_capture(tmp_path):
    with trace(None):  # no-op path
        pass
    import jax
    import jax.numpy as jnp

    with trace(str(tmp_path / "prof")):
        jnp.sum(jnp.ones((8, 8))).block_until_ready()
    assert glob.glob(str(tmp_path / "prof" / "**" / "*"), recursive=True)


def test_render_traj_sample_pkl_export(tmp_path):
    rng = np.random.default_rng(0)
    trajs = rng.normal(size=(3, 2, 12, 2)).astype(np.float32)
    render_traj_sample(
        trajs, str(tmp_path / "r"), epoch=5, names=["a.wav", "b.wav", "c.wav"],
        pkl_out=str(tmp_path / "pkl"), render=True, max_renders=1,
    )
    assert len(glob.glob(str(tmp_path / "r" / "*.gif"))) == 1  # max_renders honored
    pkls = sorted(glob.glob(str(tmp_path / "pkl" / "*.pkl")))
    assert len(pkls) == 3
    with open(pkls[0], "rb") as f:
        d = pickle.load(f)
    assert d["smpl_trans"].shape == (2, 12, 3)
    np.testing.assert_array_equal(d["smpl_trans"][..., 2], 0.0)  # z zero-padded


def test_blender_script_emission(tmp_path):
    p = write_blender_import_script(str(tmp_path / "sub" / "imp.py"))
    text = open(p).read()
    assert "bpy.ops.import_anim.bvh" in text
    assert "save_as_mainfile" in text
    assert blender_available() is False  # no blender in this image


def test_get_logger_file_handler(tmp_path):
    lg = get_logger(str(tmp_path), name="misc_cov_test")
    lg.info("hello")
    assert os.path.exists(tmp_path / "run.log")
    # repeated calls don't duplicate handlers
    assert get_logger(str(tmp_path), name="misc_cov_test") is lg
    assert len(lg.handlers) == 2
