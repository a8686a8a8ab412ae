"""Rotation conversion tests.

Cross-checked against scipy.spatial.transform.Rotation (an independent
implementation) and via representation round trips — the same invariants the
reference relies on pytorch3d for (`/root/reference/dataset/quaternion.py`).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation as R

from tcdiff_tpu.geometry import (
    axis_angle_to_matrix,
    axis_angle_to_quaternion,
    ax_from_6v,
    ax_to_6v,
    matrix_to_axis_angle,
    matrix_to_quaternion,
    matrix_to_rotation_6d,
    quat_apply,
    quat_multiply,
    quat_slerp,
    quaternion_to_axis_angle,
    quaternion_to_matrix,
    rotation_6d_to_matrix,
)


def random_axis_angle(n, seed=0, max_angle=np.pi * 0.98):
    rng = np.random.default_rng(seed)
    axes = rng.normal(size=(n, 3))
    axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
    angles = rng.uniform(1e-4, max_angle, size=(n, 1))
    return (axes * angles).astype(np.float32)


def wxyz_to_scipy(q):
    # scipy is xyzw scalar-last
    return np.concatenate([q[..., 1:], q[..., :1]], axis=-1)


def quat_allclose(a, b, atol=1e-5):
    """Quaternions are a double cover: q and -q are the same rotation."""
    return np.all(
        np.minimum(
            np.abs(a - b).max(axis=-1), np.abs(a + b).max(axis=-1)
        )
        < atol
    )


class TestVsScipy:
    def test_axis_angle_to_matrix(self):
        ax = random_axis_angle(64)
        ours = np.asarray(axis_angle_to_matrix(jnp.array(ax)))
        theirs = R.from_rotvec(ax).as_matrix()
        np.testing.assert_allclose(ours, theirs, atol=1e-5)

    def test_axis_angle_to_quaternion(self):
        ax = random_axis_angle(64, seed=1)
        ours = np.asarray(axis_angle_to_quaternion(jnp.array(ax)))
        theirs = R.from_rotvec(ax).as_quat()  # xyzw
        assert quat_allclose(wxyz_to_scipy(ours), theirs)

    def test_quaternion_to_matrix(self):
        ax = random_axis_angle(64, seed=2)
        q = R.from_rotvec(ax).as_quat()
        q_wxyz = np.concatenate([q[..., 3:], q[..., :3]], axis=-1)
        ours = np.asarray(quaternion_to_matrix(jnp.array(q_wxyz, dtype=jnp.float32)))
        theirs = R.from_rotvec(ax).as_matrix()
        np.testing.assert_allclose(ours, theirs, atol=1e-5)

    def test_matrix_to_quaternion(self):
        ax = random_axis_angle(256, seed=3)
        mats = R.from_rotvec(ax).as_matrix().astype(np.float32)
        ours = np.asarray(matrix_to_quaternion(jnp.array(mats)))
        theirs = wxyz_to_scipy(ours)
        recon = R.from_quat(theirs).as_matrix()
        np.testing.assert_allclose(recon, mats, atol=1e-5)

    def test_quat_apply_matches_matrix(self):
        ax = random_axis_angle(64, seed=4)
        v = np.random.default_rng(5).normal(size=(64, 3)).astype(np.float32)
        q = np.asarray(axis_angle_to_quaternion(jnp.array(ax)))
        ours = np.asarray(quat_apply(jnp.array(q), jnp.array(v)))
        theirs = np.einsum("nij,nj->ni", R.from_rotvec(ax).as_matrix(), v)
        np.testing.assert_allclose(ours, theirs, atol=1e-5)

    def test_quat_multiply_composition(self):
        ax1 = random_axis_angle(64, seed=6)
        ax2 = random_axis_angle(64, seed=7)
        q1 = axis_angle_to_quaternion(jnp.array(ax1))
        q2 = axis_angle_to_quaternion(jnp.array(ax2))
        composed = np.asarray(quaternion_to_matrix(quat_multiply(q1, q2)))
        theirs = R.from_rotvec(ax1).as_matrix() @ R.from_rotvec(ax2).as_matrix()
        np.testing.assert_allclose(composed, theirs, atol=1e-5)


class TestRoundTrips:
    def test_6d_roundtrip(self):
        ax = random_axis_angle(256, seed=8)
        d6 = ax_to_6v(jnp.array(ax))
        back = ax_from_6v(d6)
        # compare as matrices (axis-angle has a 2-pi ambiguity)
        np.testing.assert_allclose(
            np.asarray(axis_angle_to_matrix(jnp.array(ax))),
            np.asarray(axis_angle_to_matrix(back)),
            atol=1e-4,
        )

    def test_6d_is_first_two_rows(self):
        ax = random_axis_angle(16, seed=9)
        m = axis_angle_to_matrix(jnp.array(ax))
        d6 = matrix_to_rotation_6d(m)
        np.testing.assert_allclose(
            np.asarray(d6).reshape(16, 2, 3), np.asarray(m)[:, :2, :], atol=1e-6
        )

    def test_rotation_6d_to_matrix_orthonormal(self):
        rng = np.random.default_rng(10)
        d6 = rng.normal(size=(128, 6)).astype(np.float32)  # arbitrary, not on-manifold
        m = np.asarray(rotation_6d_to_matrix(jnp.array(d6)))
        eye = np.einsum("nij,nkj->nik", m, m)
        np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (128, 3, 3)), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(m), np.ones(128), atol=1e-5)

    def test_identity_and_small_angles(self):
        ax = jnp.zeros((4, 3))
        q = axis_angle_to_quaternion(ax)
        np.testing.assert_allclose(np.asarray(q), [[1, 0, 0, 0]] * 4, atol=1e-7)
        back = quaternion_to_axis_angle(q)
        np.testing.assert_allclose(np.asarray(back), np.zeros((4, 3)), atol=1e-7)
        # tiny but nonzero
        tiny = jnp.full((1, 3), 1e-8)
        m = axis_angle_to_matrix(tiny)
        np.testing.assert_allclose(np.asarray(m)[0], np.eye(3), atol=1e-6)

    def test_gradients_finite_at_identity(self):
        def f(ax):
            return jnp.sum(axis_angle_to_matrix(ax))

        g = jax.grad(f)(jnp.zeros((3,)) + 1e-9)
        assert np.all(np.isfinite(np.asarray(g)))


class TestSlerp:
    def test_endpoints(self):
        ax1 = random_axis_angle(8, seed=11)
        ax2 = random_axis_angle(8, seed=12)
        q1 = axis_angle_to_quaternion(jnp.array(ax1))
        q2 = axis_angle_to_quaternion(jnp.array(ax2))
        s0 = quat_slerp(q1, q2, jnp.array(0.0))
        s1 = quat_slerp(q1, q2, jnp.array(1.0))
        assert quat_allclose(np.asarray(s0), np.asarray(q1), atol=1e-5)
        # slerp may return -q2 after the shortest-path flip
        assert quat_allclose(np.asarray(s1), np.asarray(q2), atol=1e-5)

    def test_vs_scipy_slerp(self):
        from scipy.spatial.transform import Slerp

        ax1 = random_axis_angle(1, seed=13)[0]
        ax2 = random_axis_angle(1, seed=14)[0]
        r = R.from_rotvec([ax1, ax2])
        sl = Slerp([0, 1], r)
        ts = np.linspace(0, 1, 7)
        theirs = sl(ts).as_matrix()

        q1 = axis_angle_to_quaternion(jnp.array(ax1))
        q2 = axis_angle_to_quaternion(jnp.array(ax2))
        ours = quat_slerp(
            jnp.broadcast_to(q1, (7, 4)), jnp.broadcast_to(q2, (7, 4)), jnp.array(ts)
        )
        ours_m = np.asarray(quaternion_to_matrix(ours / jnp.linalg.norm(ours, axis=-1, keepdims=True)))
        np.testing.assert_allclose(ours_m, theirs, atol=1e-4)

    def test_does_not_mutate_inputs(self):
        ax1 = random_axis_angle(8, seed=15)
        q1 = axis_angle_to_quaternion(jnp.array(ax1))
        q2 = -q1  # forces the sign-flip path
        q2_before = np.asarray(q2).copy()
        quat_slerp(q1, q2, jnp.array(0.5))
        np.testing.assert_array_equal(np.asarray(q2), q2_before)


def test_matrix_to_axis_angle_roundtrip():
    ax = random_axis_angle(128, seed=16)
    m = axis_angle_to_matrix(jnp.array(ax))
    back = matrix_to_axis_angle(m)
    np.testing.assert_allclose(
        np.asarray(axis_angle_to_matrix(back)), np.asarray(m), atol=1e-4
    )


def test_gradients_finite_at_degenerate_inputs():
    """Backward-pass safety: sqrt/norm guards must give finite (zero)
    subgradients at zero rotations and fp-noisy rotation matrices — a NaN
    here silently kills a whole training step (regression for the
    sqrt(max(x,0)) 0*inf gradient)."""
    import jax

    from tcdiff_tpu.geometry.rotations import (
        axis_angle_to_quaternion,
        matrix_to_quaternion,
        quaternion_to_axis_angle,
        rotation_6d_to_matrix,
    )

    # zero axis-angle
    g = jax.grad(lambda a: jnp.sum(axis_angle_to_quaternion(a) ** 2))(jnp.zeros(3))
    assert bool(jnp.isfinite(g).all())

    # identity quaternion (zero vector part)
    g = jax.grad(lambda q: jnp.sum(quaternion_to_axis_angle(q) ** 2))(
        jnp.array([1.0, 0.0, 0.0, 0.0])
    )
    assert bool(jnp.isfinite(g).all())

    # rotation matrices whose non-dominant quaternion candidates are exactly
    # or slightly-negative (identity has three zero candidates; the perturbed
    # one dips below zero by float error)
    eye = jnp.eye(3)
    for m in (eye, eye + 1e-8, -eye + 2e-8):
        g = jax.grad(lambda mm: jnp.sum(matrix_to_quaternion(mm) ** 2))(m)
        assert bool(jnp.isfinite(g).all()), m

    # degenerate 6D input (zero rows)
    g = jax.grad(lambda d: jnp.sum(rotation_6d_to_matrix(d) ** 2))(jnp.zeros(6))
    assert bool(jnp.isfinite(g).all())
