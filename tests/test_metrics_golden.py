"""Closed-form / independent-implementation cross-checks for eval metrics
(VERDICT round-1 item: `eval/metrics.py` had only property tests, so paper
comparisons wouldn't be trustworthy without an external cross-check).

The FID is checked two ways: against the exact 1-D closed form
FID = (mu1-mu2)^2 + (s1-s2)^2, and against an independent eigh-based
implementation of tr((S1^0.5 S2 S1^0.5)^0.5) that shares nothing with the
scipy.linalg.sqrtm path the production code uses. Beat alignment, foot
skating, collisions, and GMC are checked on constructions whose scores are
known in closed form.
"""

import numpy as np
import jax.numpy as jnp

from tcdiff_tpu.eval.metrics import (
    beat_alignment_score,
    collision_frequency,
    foot_skating_ratio,
    frechet_distance,
    group_motion_consistency,
    kinematic_beats,
)


def test_fid_matches_1d_closed_form():
    rng = np.random.default_rng(0)
    a = rng.normal(2.0, 1.5, size=(4000, 1))
    b = rng.normal(-1.0, 0.5, size=(4000, 1))
    mu1, mu2 = a.mean(), b.mean()
    s1, s2 = np.cov(a, rowvar=False).item(), np.cov(b, rowvar=False).item()
    closed = (mu1 - mu2) ** 2 + (np.sqrt(s1) - np.sqrt(s2)) ** 2
    np.testing.assert_allclose(frechet_distance(a, b), closed, rtol=1e-6)


def _fid_eigh(feats_a, feats_b):
    """Independent FID: tr((S1^1/2 S2 S1^1/2)^1/2) via symmetric eigh only."""
    mu1, mu2 = feats_a.mean(0), feats_b.mean(0)
    s1 = np.cov(feats_a, rowvar=False)
    s2 = np.cov(feats_b, rowvar=False)
    w, v = np.linalg.eigh(s1)
    rt1 = (v * np.sqrt(np.maximum(w, 0))) @ v.T
    m = rt1 @ s2 @ rt1
    wm = np.linalg.eigvalsh((m + m.T) / 2)
    tr_sqrt = np.sum(np.sqrt(np.maximum(wm, 0)))
    diff = mu1 - mu2
    return float(diff @ diff + np.trace(s1 + s2) - 2 * tr_sqrt)


def test_fid_matches_independent_eigh_implementation():
    rng = np.random.default_rng(1)
    a = rng.normal(size=(500, 8)) @ rng.normal(size=(8, 8)) + rng.normal(size=8)
    b = rng.normal(size=(400, 8)) @ rng.normal(size=(8, 8))
    got = frechet_distance(a, b)
    want = _fid_eigh(a, b)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_fid_invariances():
    rng = np.random.default_rng(2)
    a = rng.normal(size=(300, 6))
    assert abs(frechet_distance(a, a.copy())) < 1e-6
    # joint orthogonal transform leaves FID unchanged
    q, _ = np.linalg.qr(rng.normal(size=(6, 6)))
    b = rng.normal(size=(300, 6)) * 2 + 1
    np.testing.assert_allclose(
        frechet_distance(a @ q, b @ q), frechet_distance(a, b), rtol=1e-4, atol=1e-6
    )


def _motion_with_speed_profile(speeds):
    """(T-1,) per-frame speeds -> (T, 24, 3) motion whose mean joint speed
    is exactly `speeds` (all joints translate together along +x)."""
    steps = np.concatenate([[0.0], np.asarray(speeds)]) / 30.0
    x = np.cumsum(steps)
    joints = np.zeros((len(x), 24, 3))
    joints[:, :, 0] = x[:, None]
    return joints


def test_kinematic_beats_at_constructed_minima():
    # strictly increasing base profile (a constant one hits cumsum/diff ulp
    # noise that fabricates spurious strict minima) with sharp dips
    speeds = np.linspace(1.0, 2.0, 50)
    for f in (10, 25, 40):
        speeds[f] = 0.1
    joints = _motion_with_speed_profile(speeds)
    np.testing.assert_array_equal(kinematic_beats(joints), [10, 25, 40])


def test_beat_alignment_closed_form():
    speeds = np.linspace(1.0, 2.0, 60)
    for f in (10, 30, 50):
        speeds[f] = 0.1
    joints = _motion_with_speed_profile(speeds)
    # perfectly aligned music beats -> score 1
    np.testing.assert_allclose(
        beat_alignment_score(joints, np.array([10, 30, 50])), 1.0, atol=1e-9
    )
    # all music beats off by exactly 2 frames -> exp(-4/(2*9))
    np.testing.assert_allclose(
        beat_alignment_score(joints, np.array([12, 32, 52])),
        np.exp(-4.0 / 18.0),
        atol=1e-9,
    )


def test_foot_skating_exact_fraction():
    T = 41
    joints = np.zeros((T, 24, 3))
    joints[:, :, 2] = 1.0  # body high
    from tcdiff_tpu.config import FOOT_JOINTS

    # feet at ground level the whole time -> grounded in all 40 velocity
    # frames; slide horizontally in exactly 10 of them
    joints[:, FOOT_JOINTS, 2] = 0.0
    for t in range(10, 20):
        joints[t + 1 :, FOOT_JOINTS, 0] += 0.01  # 0.3 units/s > 0.075
    got = float(foot_skating_ratio(jnp.asarray(joints)))
    np.testing.assert_allclose(got, 10.0 / 40.0, atol=1e-7)


def test_collision_frequency_exact_fraction():
    T = 50
    roots = np.zeros((2, T, 3))
    roots[1, :, 0] = 10.0  # far apart...
    roots[1, 20:30, 0] = 0.1  # ...except 10 frames inside the 0.4 radius
    got = float(collision_frequency(jnp.asarray(roots)))
    np.testing.assert_allclose(got, 10.0 / 50.0, atol=1e-7)


def test_gmc_bounds():
    rng = np.random.default_rng(3)
    a = rng.normal(size=(1, 30, 24, 3)).cumsum(axis=1)
    same = np.concatenate([a, a], axis=0)
    np.testing.assert_allclose(group_motion_consistency(same), 1.0, atol=1e-6)
    # one dancer moves only in x, the other only in y -> orthogonal kinetic
    # feature vectors -> similarity 0
    b = np.zeros((2, 30, 24, 3))
    b[0, :, :, 0] = np.arange(30)[:, None]
    b[1, :, :, 1] = np.arange(30)[:, None]
    np.testing.assert_allclose(group_motion_consistency(b), 0.0, atol=1e-6)
