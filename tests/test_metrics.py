"""Evaluation metrics: analytic sanity checks on controlled motion."""

import numpy as np
import jax.numpy as jnp
import pytest

from tcdiff_tpu.eval import (
    beat_alignment_score,
    collision_frequency,
    diversity,
    evaluate,
    extract_features,
    foot_skating_ratio,
    frechet_distance,
    kinematic_beats,
    kinetic_features,
    music_beats_from_features,
)


def _still_pose(T=60):
    rng = np.random.default_rng(0)
    pose = rng.normal(size=(1, 24, 3)).astype(np.float32)
    return np.repeat(pose, T, axis=0)


def test_kinetic_features_zero_for_still_motion():
    np.testing.assert_allclose(np.asarray(kinetic_features(jnp.asarray(_still_pose()))), 0.0)


def test_kinetic_features_scale_with_speed():
    T = 60
    slow = _still_pose(T) + np.linspace(0, 1, T)[:, None, None] * np.array([1, 0, 0])
    fast = _still_pose(T) + np.linspace(0, 2, T)[:, None, None] * np.array([1, 0, 0])
    ks = np.asarray(kinetic_features(jnp.asarray(slow)))
    kf = np.asarray(kinetic_features(jnp.asarray(fast)))
    assert kf.sum() > 3.9 * ks.sum()  # E ~ v^2


def test_frechet_distance_identity_and_shift():
    rng = np.random.default_rng(1)
    a = rng.normal(size=(200, 8))
    b = rng.normal(size=(200, 8))
    same = frechet_distance(a, a)
    near = frechet_distance(a, b)
    far = frechet_distance(a, b + 5.0)
    assert same < 1e-6
    assert near < far
    assert far > 25 * 8 * 0.9  # dominated by the mean shift ||5||^2 * dim


def test_diversity_orders_spread():
    rng = np.random.default_rng(2)
    tight = rng.normal(size=(100, 4)) * 0.1
    wide = rng.normal(size=(100, 4)) * 2.0
    assert diversity(wide) > diversity(tight)


def test_kinematic_beats_found_at_pauses():
    # motion that pauses every 10 frames -> speed minima there
    T = 60
    t = np.arange(T)
    pos = np.cumsum(np.abs(np.sin(np.pi * t / 10))[:, None, None] * np.ones((T, 24, 3)) * 0.1, axis=0)
    beats = kinematic_beats(pos)
    assert len(beats) >= 4
    assert all(min(abs(b % 10), 10 - (b % 10)) <= 2 for b in beats)


def test_beat_alignment_perfect_vs_offset():
    T = 60
    t = np.arange(T)
    pos = np.cumsum(np.abs(np.sin(np.pi * t / 10))[:, None, None] * np.ones((T, 24, 3)) * 0.1, axis=0)
    kin = kinematic_beats(pos)
    aligned = beat_alignment_score(pos, kin)
    offset = beat_alignment_score(pos, kin + 5)
    assert aligned > 0.99
    assert offset < aligned


def test_music_beats_from_features():
    mf = np.zeros((100, 438), np.float32)
    mf[[10, 50, 90], 53] = 1.0
    np.testing.assert_array_equal(music_beats_from_features(mf), [5, 25, 45])


def test_foot_skating_still_vs_sliding():
    still = _still_pose(40)
    assert float(foot_skating_ratio(jnp.asarray(still))) == 0.0
    sliding = still + np.linspace(0, 4, 40)[:, None, None] * np.array([1, 0, 0])
    assert float(foot_skating_ratio(jnp.asarray(sliding))) > 0.9


def test_collision_frequency():
    T = 30
    apart = np.zeros((2, T, 3)); apart[1, :, 0] = 5.0
    assert float(collision_frequency(jnp.asarray(apart))) == 0.0
    together = np.zeros((2, T, 3)); together[1, :, 0] = 0.1
    assert float(collision_frequency(jnp.asarray(together))) == 1.0


def test_evaluate_report_keys():
    rng = np.random.default_rng(3)
    gen = rng.normal(size=(3, 2, 30, 24, 3)).astype(np.float32) * 0.1
    ref = rng.normal(size=(3, 2, 30, 24, 3)).astype(np.float32) * 0.1
    mf = [np.zeros((60, 438), np.float32) for _ in range(3)]
    for m in mf:
        m[::20, 53] = 1.0
    roots = rng.normal(size=(3, 2, 30, 3)).astype(np.float32)
    report = evaluate(gen, ref, music_feats=mf, gen_roots=roots)
    for key in ("fid_k", "fid_g", "div_k", "div_g", "foot_skate", "beat_align", "collision_freq"):
        assert key in report and np.isfinite(report[key]), key


def test_group_motion_consistency():
    from tcdiff_tpu.eval import group_motion_consistency

    rng = np.random.default_rng(5)
    base = np.cumsum(rng.normal(size=(1, 40, 24, 3)) * 0.05, axis=1)
    synced = np.concatenate([base, base + 1.0], axis=0)  # identical motion, offset
    indep = np.concatenate(
        [base, np.cumsum(rng.normal(size=(1, 40, 24, 3)) * 0.05, axis=1)], axis=0
    )
    assert group_motion_consistency(synced) > 0.999
    assert group_motion_consistency(synced) > group_motion_consistency(indep)
    assert group_motion_consistency(base) == 1.0  # single dancer
