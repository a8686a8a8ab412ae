"""Trajectory post-processing utilities vs the reference formulas."""

import numpy as np
import jax.numpy as jnp

from tcdiff_tpu.trajdecoder.postprocess import (
    get_ci,
    get_motion_with_trans,
    offset2xyz,
    process_traj,
    smooth_data,
)


def test_offset2xyz_matches_loop_reference():
    rng = np.random.default_rng(0)
    offset = rng.normal(size=(2, 3, 9, 3)).astype(np.float32)
    start = rng.normal(size=(2, 3, 1, 3)).astype(np.float32)
    out = np.asarray(offset2xyz(jnp.asarray(offset), jnp.asarray(start)))
    # reference semantics: xyz_t = start + sum(offset[:t]) (`utils_model.py:86-100`)
    ref = [start]
    for i in range(1, 10):
        ref.append(start + offset[:, :, :i].sum(axis=2, keepdims=True))
    ref = np.concatenate(ref, axis=2)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_process_traj_clamps_and_holds():
    rng = np.random.default_rng(1)
    traj = np.cumsum(rng.normal(size=(1, 2, 31, 2)) * 0.05, axis=2).astype(np.float32)
    out = np.asarray(process_traj(jnp.asarray(traj), v_max=0.01, var_frame=5))
    assert out.shape == traj.shape
    vel = np.diff(out, axis=2)
    assert np.abs(vel).max() <= 0.01 + 1e-6  # clamped
    # velocity held constant within each 5-frame block
    for s in range(0, vel.shape[2] - 5, 5):
        block = vel[:, :, s : s + 5]
        np.testing.assert_allclose(
            block, np.broadcast_to(block[:, :, :1], block.shape), atol=1e-6
        )
    # start point preserved
    np.testing.assert_allclose(out[:, :, 0], traj[:, :, 0], atol=1e-6)


def test_smooth_data_reduces_noise():
    rng = np.random.default_rng(2)
    t = np.linspace(0, 2 * np.pi, 60)
    clean = np.sin(t)[None, None, :, None] * np.ones((2, 2, 60, 3))
    noisy = clean + rng.normal(size=clean.shape) * 0.1
    sm = smooth_data(noisy)
    assert np.abs(sm - clean).mean() < np.abs(noisy - clean).mean()


def test_get_ci():
    mean, ci = get_ci([1.0, 2.0, 3.0, 4.0])
    assert np.isclose(mean, 2.5)
    assert np.isclose(ci, 1.96 * np.std([1, 2, 3, 4]) / 2.0)


def test_get_motion_with_trans_zeroes_first_frame():
    rng = np.random.default_rng(3)
    motion = rng.normal(size=(2, 10, 72)).astype(np.float32)
    vel = rng.normal(size=(2, 10, 3)).astype(np.float32)
    out = np.asarray(get_motion_with_trans(jnp.asarray(motion), jnp.asarray(vel)))
    np.testing.assert_allclose(out[:, 0], motion[:, 0], atol=1e-6)  # first frame unshifted
    trans = np.cumsum(vel, axis=1) - np.cumsum(vel, axis=1)[:, :1]
    np.testing.assert_allclose(out, motion + np.tile(trans, (1, 1, 24)), rtol=1e-5)
