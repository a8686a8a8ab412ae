"""Rotation representation conversions, pure jnp.

Replaces the pytorch3d transforms the reference leans on
(`/root/reference/dataset/quaternion.py:7-71`): 6D <-> rotation matrix <->
quaternion <-> axis-angle, plus batched slerp. Quaternions are real-first
(w, x, y, z), matching pytorch3d's convention so recorded reference tensors
can be compared bit-for-bit (within float tolerance).

All functions broadcast over arbitrary leading batch dimensions and are
differentiable; small-angle paths use Taylor guards so gradients stay finite
at the identity rotation. Everything here is elementwise/VPU work — XLA fuses
these chains into the surrounding kernels, so no Pallas is needed.
"""

from __future__ import annotations

import jax.numpy as jnp


def _sqrt_positive_part(x: jnp.ndarray) -> jnp.ndarray:
    """sqrt(max(0, x)) with a subgradient of zero where x <= 0.

    The double-where keeps the backward pass finite: a plain
    sqrt(maximum(x, 0)) yields 0 * inf = NaN gradients wherever x < 0, which
    happens by float error for the non-dominant candidates in
    matrix_to_quaternion and silently NaNs the whole training step.
    """
    safe = jnp.where(x > 0, x, 1.0)
    return jnp.where(x > 0, jnp.sqrt(safe), 0.0)


def _safe_norm(x: jnp.ndarray, keepdims: bool = True) -> jnp.ndarray:
    """L2 norm over the last axis with zero (not NaN) gradient at x == 0."""
    sq = jnp.sum(x * x, axis=-1, keepdims=keepdims)
    safe = jnp.where(sq > 0, sq, 1.0)
    return jnp.where(sq > 0, jnp.sqrt(safe), 0.0)


# ---------------------------------------------------------------------------
# axis-angle <-> quaternion
# ---------------------------------------------------------------------------

def axis_angle_to_quaternion(axis_angle: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) axis-angle -> (..., 4) wxyz quaternion.

    angle = ||axis_angle||; q = [cos(a/2), sin(a/2) * axis]. The sin(a/2)/a
    factor is Taylor-expanded (0.5 - a^2/48) below 1e-6 rad for stability.
    """
    angles = _safe_norm(axis_angle)
    half = angles * 0.5
    eps = 1e-6
    small = jnp.abs(angles) < eps
    # guard the division; the where picks the Taylor branch for small angles
    safe_angles = jnp.where(small, jnp.ones_like(angles), angles)
    sin_half_over_angle = jnp.where(
        small, 0.5 - (angles * angles) / 48.0, jnp.sin(half) / safe_angles
    )
    return jnp.concatenate([jnp.cos(half), axis_angle * sin_half_over_angle], axis=-1)


def quaternion_to_axis_angle(quaternion: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) wxyz quaternion -> (..., 3) axis-angle."""
    norms = _safe_norm(quaternion[..., 1:])
    half_angles = jnp.arctan2(norms, quaternion[..., :1])
    angles = 2.0 * half_angles
    eps = 1e-6
    small = jnp.abs(angles) < eps
    safe_angles = jnp.where(small, jnp.ones_like(angles), angles)
    sin_half_over_angle = jnp.where(
        small, 0.5 - (angles * angles) / 48.0, jnp.sin(half_angles) / safe_angles
    )
    return quaternion[..., 1:] / sin_half_over_angle


# ---------------------------------------------------------------------------
# quaternion algebra
# ---------------------------------------------------------------------------

def quat_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product of wxyz quaternions; broadcasts over batch dims."""
    aw, ax, ay, az = jnp.split(a, 4, axis=-1)
    bw, bx, by, bz = jnp.split(b, 4, axis=-1)
    return jnp.concatenate(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_apply(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vectors v (..., 3) by quaternions q (..., 4), wxyz.

    Uses v' = v + 2 * cross(q_vec, cross(q_vec, v) + w * v) — 15 mul + 15 add
    per vector instead of two full quaternion products.
    """
    w = q[..., :1]
    qv = q[..., 1:]
    t = jnp.cross(qv, v) * 2.0
    return v + w * t + jnp.cross(qv, t)


def quat_slerp(x: jnp.ndarray, y: jnp.ndarray, a: jnp.ndarray) -> jnp.ndarray:
    """Batched spherical linear interpolation, functional.

    Mirrors the math of the reference `dataset/quaternion.py:35-71` (including
    its shortest-path sign flip and the linear fallback when the quaternions
    are within cos-angle 0.99 of each other) but never mutates its inputs —
    the reference version flips `y` in place (`quaternion.py:47-48`).

    x, y: (..., 4); a: broadcastable interpolation weights in [0, 1].
    """
    cos_omega = jnp.sum(x * y, axis=-1)
    neg = cos_omega < 0.0
    cos_omega = jnp.where(neg, -cos_omega, cos_omega)
    y = jnp.where(neg[..., None], -y, y)

    a = jnp.zeros_like(x[..., 0]) + a

    linear = (1.0 - cos_omega) < 0.01
    # guard acos/sin against the linear branch
    safe_cos = jnp.where(linear, jnp.zeros_like(cos_omega), cos_omega)
    omega = jnp.arccos(jnp.clip(safe_cos, -1.0, 1.0))
    sin_omega = jnp.sin(omega)
    safe_sin = jnp.where(linear, jnp.ones_like(sin_omega), sin_omega)

    amount0 = jnp.where(linear, 1.0 - a, jnp.sin((1.0 - a) * omega) / safe_sin)
    amount1 = jnp.where(linear, a, jnp.sin(a * omega) / safe_sin)
    return amount0[..., None] * x + amount1[..., None] * y


# ---------------------------------------------------------------------------
# quaternion <-> rotation matrix
# ---------------------------------------------------------------------------

def quaternion_to_matrix(quaternion: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) wxyz quaternion -> (..., 3, 3) rotation matrix."""
    w, x, y, z = jnp.split(quaternion, 4, axis=-1)
    two_s = 2.0 / jnp.sum(quaternion * quaternion, axis=-1, keepdims=True)
    rows = [
        1 - two_s * (y * y + z * z),
        two_s * (x * y - z * w),
        two_s * (x * z + y * w),
        two_s * (x * y + z * w),
        1 - two_s * (x * x + z * z),
        two_s * (y * z - x * w),
        two_s * (x * z - y * w),
        two_s * (y * z + x * w),
        1 - two_s * (x * x + y * y),
    ]
    m = jnp.concatenate(rows, axis=-1)
    return m.reshape(quaternion.shape[:-1] + (3, 3))


def matrix_to_quaternion(matrix: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) rotation matrix -> (..., 4) wxyz quaternion.

    Branch-free version of the classic four-candidate algorithm: build the
    candidate quaternion for each dominant diagonal case and select the one
    with the largest discriminant via argmax + one-hot contraction (JAX has
    no data-dependent control flow under jit).
    """
    m = matrix
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    q_abs = _sqrt_positive_part(
        jnp.stack(
            [
                1.0 + m00 + m11 + m22,
                1.0 + m00 - m11 - m22,
                1.0 - m00 + m11 - m22,
                1.0 - m00 - m11 + m22,
            ],
            axis=-1,
        )
    )

    # candidate quaternions (un-normalized), one per dominant component
    quat_by_w = jnp.stack([q_abs[..., 0] ** 2, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    quat_by_x = jnp.stack([m21 - m12, q_abs[..., 1] ** 2, m10 + m01, m02 + m20], axis=-1)
    quat_by_y = jnp.stack([m02 - m20, m10 + m01, q_abs[..., 2] ** 2, m12 + m21], axis=-1)
    quat_by_z = jnp.stack([m10 - m01, m20 + m02, m21 + m12, q_abs[..., 3] ** 2], axis=-1)
    quat_candidates = jnp.stack([quat_by_w, quat_by_x, quat_by_y, quat_by_z], axis=-2)

    # divide each candidate by 2 * q_abs of its own branch; the 0.1 floor is
    # pytorch3d's (only non-selected candidates are ever near it, and it
    # keeps their — discarded — gradients bounded)
    denom = 2.0 * jnp.maximum(q_abs, 0.1)[..., None]
    quat_candidates = quat_candidates / denom

    best = jnp.argmax(q_abs, axis=-1)
    one_hot = jnp.eye(4, dtype=matrix.dtype)[best]  # (..., 4)
    out = jnp.sum(quat_candidates * one_hot[..., None], axis=-2)
    return out / jnp.linalg.norm(out, axis=-1, keepdims=True)


def axis_angle_to_matrix(axis_angle: jnp.ndarray) -> jnp.ndarray:
    return quaternion_to_matrix(axis_angle_to_quaternion(axis_angle))


def matrix_to_axis_angle(matrix: jnp.ndarray) -> jnp.ndarray:
    return quaternion_to_axis_angle(matrix_to_quaternion(matrix))


# ---------------------------------------------------------------------------
# 6D rotation representation (Zhou et al., CVPR'19)
# ---------------------------------------------------------------------------

def rotation_6d_to_matrix(d6: jnp.ndarray) -> jnp.ndarray:
    """(..., 6) -> (..., 3, 3) via Gram-Schmidt on the two encoded rows."""
    a1 = d6[..., :3]
    a2 = d6[..., 3:]
    b1 = a1 / jnp.maximum(_safe_norm(a1), 1e-12)
    a2_proj = jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = a2 - a2_proj
    b2 = b2 / jnp.maximum(_safe_norm(b2), 1e-12)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


def matrix_to_rotation_6d(matrix: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) -> (..., 6): the first two rows, flattened."""
    return matrix[..., :2, :].reshape(matrix.shape[:-2] + (6,))


# convenience aliases matching the reference's names (`dataset/quaternion.py`)
def quat_to_6v(q: jnp.ndarray) -> jnp.ndarray:
    return matrix_to_rotation_6d(quaternion_to_matrix(q))


def quat_from_6v(d6: jnp.ndarray) -> jnp.ndarray:
    return matrix_to_quaternion(rotation_6d_to_matrix(d6))


def ax_to_6v(ax: jnp.ndarray) -> jnp.ndarray:
    return matrix_to_rotation_6d(axis_angle_to_matrix(ax))


def ax_from_6v(d6: jnp.ndarray) -> jnp.ndarray:
    return matrix_to_axis_angle(rotation_6d_to_matrix(d6))
