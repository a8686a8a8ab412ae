"""Cross-validate the boolean geometric FID_g feature map.

The vectorized JAX extractor (tcdiff_tpu/eval/geometric.py) is checked
against an INDEPENDENT per-frame numpy implementation written directly
from the Müller-2005 primitive definitions (the structure of the
AIST++/Bailando `manual.py` loop: one frame at a time, python scalars),
plus distribution-level sanity properties of FID_g built on it.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tcdiff_tpu.eval.geometric import (
    FEATURE_SPECS,
    FPS,
    HL,
    HW,
    NUM_GEOMETRIC_FEATURES,
    SW,
    _thr,
    boolean_geometric_features,
    geometric_feature_frames,
    J,
)


# ------------------------------------------------- independent reference
def _to_yup(p):
    return np.stack([p[..., 0], p[..., 2], -p[..., 1]], axis=-1)


class _RefFrame:
    """Per-frame reference evaluator: fetches positions as plain lists,
    computes each primitive with scalar math (no shared code with the
    vectorized implementation)."""

    def __init__(self, joints_yup, f):
        self.p = joints_yup
        self.f = f

    def get(self, name, prev=False):
        t = self.f - 1 if prev else self.f
        if name == "zero":
            return np.zeros(3)
        if name == "up":
            return np.array([0.0, 1.0, 0.0])
        if name == "down":
            return np.array([0.0, -1.0, 0.0])
        if name == "floor":
            return np.array([0.0, self.p[t][:, 1].min(), 0.0])
        return np.asarray(self.p[t][J[name]], dtype=np.float64)

    def move(self, j1, j2, j3, j4, thr):
        vel = (self.get(j4) - self.get(j3)) - (self.get(j4, True) - self.get(j3, True))
        d = self.get(j2) - self.get(j1)
        d = d / max(np.linalg.norm(d), 1e-10)
        return float(np.dot(vel, d)) * FPS > thr

    def nmove(self, j1, j2, j3, j4, thr):
        vel = (self.get(j4) - self.get(j1)) - (self.get(j4, True) - self.get(j1, True))
        n = np.cross(self.get(j3) - self.get(j1), self.get(j2) - self.get(j1))
        n = n / max(np.linalg.norm(n), 1e-10)
        return float(np.dot(vel, n)) * FPS > thr

    def plane(self, j1, j2, j3, j4, thr):
        n = np.cross(self.get(j3) - self.get(j1), self.get(j2) - self.get(j1))
        n = n / max(np.linalg.norm(n), 1e-10)
        return float(np.dot(self.get(j4) - self.get(j1), n)) > thr

    def nplane(self, j1, j2, j3, j4, thr):
        n = self.get(j2) - self.get(j1)
        n = n / max(np.linalg.norm(n), 1e-10)
        return float(np.dot(self.get(j4) - self.get(j3), n)) > thr

    def angle(self, j1, j2, k1, k2, rng):
        a = self.get(j2) - self.get(j1)
        b = self.get(k2) - self.get(k1)
        cos = np.dot(a, b) / max(np.linalg.norm(a) * np.linalg.norm(b), 1e-10)
        deg = np.degrees(np.arccos(np.clip(cos, -1, 1)))
        return rng[0] < deg < rng[1]

    def fast(self, j, thr):
        return float(np.linalg.norm(self.get(j) - self.get(j, True))) * FPS > thr


def _ref_features(joints_zup):
    p = _to_yup(np.asarray(joints_zup, dtype=np.float64))
    rows = []
    for f in range(1, p.shape[0]):
        ev = _RefFrame(p, f)
        row = []
        for spec in FEATURE_SPECS:
            op = spec[0]
            if op == "angle":
                row.append(ev.angle(*spec[1:5], spec[5]))
            elif op == "fast":
                row.append(ev.fast(spec[1], _thr(spec)))
            else:
                row.append(getattr(ev, op)(*spec[1:5], _thr(spec)))
        rows.append(row)
    return np.array(rows, dtype=np.float32)


def _dance(seed, t=40, energetic=1.0):
    """Synthetic articulated motion around the rest pose."""
    from tcdiff_tpu.eval.geometric import _REST

    rng = np.random.default_rng(seed)
    base = _to_yup_inv(_REST)  # rest pose in Z-up
    phases = rng.uniform(0, 2 * np.pi, size=(24, 3))
    freqs = rng.uniform(0.5, 3.0, size=(24, 3))
    amp = 0.25 * energetic
    tt = np.arange(t)[:, None, None] / FPS
    wav = amp * np.sin(2 * np.pi * freqs[None] * tt + phases[None])
    drift = np.zeros((t, 1, 3))
    drift[:, 0, 0] = np.linspace(0, 0.8 * energetic, t)
    return base[None] + wav + drift


def _to_yup_inv(p_yup_rest):
    # the skeleton offsets are Y-up; express the rest pose in the Z-up
    # convention the extractor expects: (x, y, z)_yup -> (x, -z, y)_zup
    return np.stack(
        [p_yup_rest[..., 0], -p_yup_rest[..., 2], p_yup_rest[..., 1]], axis=-1
    )


def test_feature_count_and_scales():
    assert NUM_GEOMETRIC_FEATURES == 32
    # skeleton scales in plausible human ranges (meters)
    assert 0.15 < HL < 0.40
    assert 0.15 < SW < 0.50
    assert 0.05 < HW < 0.30


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_vectorized_matches_per_frame_reference(seed):
    joints = _dance(seed)
    ref = _ref_features(joints)
    out = np.asarray(geometric_feature_frames(jnp.asarray(joints, jnp.float32)))
    assert out.shape == ref.shape == (joints.shape[0] - 1, 32)
    mismatch = np.flatnonzero((out != ref).any(axis=0))
    assert mismatch.size == 0, f"feature cols differ: {mismatch.tolist()}"


def test_clip_vector_is_frame_mean():
    joints = _dance(7)
    frames = np.asarray(geometric_feature_frames(jnp.asarray(joints, jnp.float32)))
    clip = np.asarray(boolean_geometric_features(jnp.asarray(joints, jnp.float32)))
    np.testing.assert_allclose(clip, frames.mean(axis=0), atol=1e-6)
    assert ((clip >= 0) & (clip <= 1)).all()


def test_features_fire_and_discriminate():
    """Distribution sanity: a population of energetic dances must (a) fire a
    decent share of predicates and (b) be separated from a near-static
    population by FID_g, while FID_g(X, X) ~ 0."""
    from tcdiff_tpu.eval.metrics import extract_features, frechet_distance

    lively = np.stack([_dance(s, energetic=1.0) for s in range(16)])
    static = np.stack([_dance(100 + s, energetic=0.02) for s in range(16)])
    fg_l = extract_features(lively, "geometric")
    fg_s = extract_features(static, "geometric")
    assert fg_l.shape == (16, 32)
    assert (fg_l.mean(axis=0) > 0).sum() >= 8, "too few predicates ever fire"
    self_fid = frechet_distance(fg_l[:8], fg_l[8:])
    cross_fid = frechet_distance(fg_l, fg_s)
    assert cross_fid > 10 * max(self_fid, 1e-6)


def test_rotation_invariance_about_up_axis():
    """Relational features depend on the body, not its heading: rotating the
    whole motion about the vertical axis must not change any feature."""
    joints = _dance(3)
    th = 1.1
    rot = np.array(
        [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]]
    )
    rotated = joints @ rot.T
    a = np.asarray(boolean_geometric_features(jnp.asarray(joints, jnp.float32)))
    b = np.asarray(boolean_geometric_features(jnp.asarray(rotated, jnp.float32)))
    np.testing.assert_allclose(a, b, atol=1e-6)
