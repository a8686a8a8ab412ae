"""SMPL 24-joint skeleton and level-parallel forward kinematics.

The reference walks the kinematic chain one joint at a time in Python
(`/root/reference/vis.py:330-406`, 24 sequential steps). On TPU the FK sits
inside the training loss (`model/diffusion.py:693-708`), so we restructure it
by tree depth: joints at the same depth have independent parents and are
processed together, collapsing 24 sequential steps into 9 level steps of
batched quaternion ops that XLA fuses. Numerically identical to the
reference's chain (same offsets, parents, quaternion math).
"""

from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp

from tcdiff_tpu.geometry.rotations import (
    axis_angle_to_quaternion,
    quat_apply,
    quat_multiply,
    rotation_6d_to_matrix,
    matrix_to_quaternion,
)

# Joint names / parents / rest-pose offsets (reference `vis.py:20-101`).
SMPL_JOINTS = [
    "root", "lhip", "rhip", "belly", "lknee", "rknee", "spine", "lankle",
    "rankle", "chest", "ltoes", "rtoes", "neck", "linshoulder", "rinshoulder",
    "head", "lshoulder", "rshoulder", "lelbow", "relbow", "lwrist", "rwrist",
    "lhand", "rhand",
]

SMPL_PARENTS = np.array(
    [-1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17, 18, 19, 20, 21],
    dtype=np.int32,
)

SMPL_OFFSETS = np.array(
    [
        [0.0, 0.0, 0.0],
        [0.05858135, -0.08228004, -0.01766408],
        [-0.06030973, -0.09051332, -0.01354254],
        [0.00443945, 0.12440352, -0.03838522],
        [0.04345142, -0.38646945, 0.008037],
        [-0.04325663, -0.38368791, -0.00484304],
        [0.00448844, 0.1379564, 0.02682033],
        [-0.01479032, -0.42687458, -0.037428],
        [0.01905555, -0.4200455, -0.03456167],
        [-0.00226458, 0.05603239, 0.00285505],
        [0.04105436, -0.06028581, 0.12204243],
        [-0.03483987, -0.06210566, 0.13032329],
        [-0.0133902, 0.21163553, -0.03346758],
        [0.07170245, 0.11399969, -0.01889817],
        [-0.08295366, 0.11247234, -0.02370739],
        [0.01011321, 0.08893734, 0.05040987],
        [0.12292141, 0.04520509, -0.019046],
        [-0.11322832, 0.04685326, -0.00847207],
        [0.2553319, -0.01564902, -0.02294649],
        [-0.26012748, -0.01436928, -0.03126873],
        [0.26570925, 0.01269811, -0.00737473],
        [-0.26910836, 0.00679372, -0.00602676],
        [0.08669055, -0.01063603, -0.01559429],
        [-0.0887537, -0.00865157, -0.01010708],
    ],
    dtype=np.float32,
)

N_JOINTS = 24


def _levels(parents: np.ndarray):
    """Group joint indices by tree depth (root excluded; it is level 0)."""
    depth = np.zeros(len(parents), dtype=np.int64)
    for j, p in enumerate(parents):
        if p >= 0:
            depth[j] = depth[p] + 1
    levels = []
    for d in range(1, int(depth.max()) + 1):
        levels.append(np.nonzero(depth == d)[0])
    return levels


_LEVELS = _levels(SMPL_PARENTS)  # 8 levels of non-root joints


def _anc_matrix(parents: np.ndarray) -> np.ndarray:
    """(J-1, J-1) ancestor-chain matrix over non-root joints.

    A[k-1, j-1] = 1 iff joint j lies on the chain root->k (j >= 1). A world
    position relative to the root is then the chain sum of parent-rotated
    rest offsets: rel = A @ rotated_offsets — one small constant matmul
    instead of a per-level accumulate.
    """
    n = len(parents)
    a = np.zeros((n - 1, n - 1), dtype=np.float32)
    for k in range(1, n):
        j = k
        while j > 0:
            a[k - 1, j - 1] = 1.0
            j = int(parents[j])
    return a


_ANC = _anc_matrix(SMPL_PARENTS)


def _jump_tables(parents: np.ndarray) -> list:
    """Pointer-jumping ancestor tables for log-depth world rotations.

    tables[k][j] is the 2^k-th ancestor of joint j, with exhausted chains
    parked on a virtual identity slot at index J. The deepest SMPL chain is
    9 joints (root->hand), so 4 doubling steps cover it: the world rotation
    becomes 4 batched quat_multiply's over all 24 joints with STATIC gather
    indices — no per-level stack/scatter (the r5 profile put those gathers
    + two f32[...,24,4] layout copies at ~3.4 ms of the 113.7 ms step).
    """
    n = len(parents)
    ident = n
    ptr = np.where(parents < 0, ident, parents).astype(np.int64)
    tables = []
    while not np.all(ptr == ident):
        tables.append(ptr.copy())
        ext = np.append(ptr, ident)
        ptr = ext[ptr]
    return tables


_JUMP = _jump_tables(SMPL_PARENTS)  # 4 tables for the depth-9 SMPL tree


def _use_ancmat() -> bool:
    """Ancestor-matrix FK positions (TCDIFF_FK_ANCMAT; opt-in until the
    paired on-chip A/B lands — house rule: defaults flip on measured wins).

    Replaces the per-level position accumulation (two stacks + a scatter per
    level, 8 levels) with one parent gather, one batched quat_apply over all
    23 offsets, and a (23,23) constant matmul the MXU eats. Identical math to
    the chain walk up to f32 summation order (golden atol 1e-4 >> the ~1e-6
    reassociation noise). Read at trace time — changing the env mid-process
    needs jax.clear_caches() (tools/ab_train.py does this per arm).
    """
    return os.environ.get("TCDIFF_FK_ANCMAT", "0") == "1"


def smpl_fk(rotations: jnp.ndarray, root_positions: jnp.ndarray) -> jnp.ndarray:
    """Forward kinematics.

    Args:
      rotations: (..., J, 3) local axis-angle rotations per joint.
      root_positions: (..., 3) world root positions. Leading dims must match
        `rotations`' leading dims.

    Returns:
      (..., J, 3) world joint positions — same layout as the reference's
      `SMPLSkeleton.forward` output (`vis.py:358-406`).
    """
    assert rotations.shape[-1] == 3 and rotations.shape[-2] == N_JOINTS
    quats = axis_angle_to_quaternion(rotations)  # (..., J, 4)
    return _fk_from_quats(quats, root_positions)


def smpl_fk_from_6d(rot6d: jnp.ndarray, root_positions: jnp.ndarray) -> jnp.ndarray:
    """FK straight from the 6D representation, skipping the axis-angle hop.

    The reference converts 6d -> matrix -> axis-angle -> quaternion inside the
    loss (`model/diffusion.py:693` then `vis.py:369`); the composition is the
    identity on rotations, so we go 6d -> matrix -> quaternion directly.
    """
    quats = matrix_to_quaternion(rotation_6d_to_matrix(rot6d))
    return _fk_from_quats(quats, root_positions)


def smpl_fk_rel_from_6d(rot6d: jnp.ndarray) -> jnp.ndarray:
    """Root-relative FK from 6D rotations: positions of joints 1..23 minus
    the root, shape (..., J-1, 3) — no root positions needed.

    This is exactly what the reference's FK loss consumes
    (`model/diffusion.py:700-708` computes world positions then subtracts
    joint 0), so the loss can skip the absolute assembly entirely.
    """
    quats = matrix_to_quaternion(rotation_6d_to_matrix(rot6d))
    rot_w = _world_quats(quats)
    return _rel_positions(rot_w, quats.dtype)


def _world_quats(quats: jnp.ndarray) -> jnp.ndarray:
    """World rotation per joint as one (..., J, 4) array, by pointer
    jumping: after step k every joint holds the composition of its 2^k
    nearest chain quats, so ceil(log2(depth 9)) = 4 batched quat_multiply's
    with constant gather tables replace the 8-level stack/scatter walk."""
    ident = jnp.broadcast_to(
        jnp.asarray([1.0, 0.0, 0.0, 0.0], quats.dtype), quats[..., :1, :].shape
    )
    w = quats
    for ptr in _JUMP:
        w_ext = jnp.concatenate([w, ident], axis=-2)  # (..., J+1, 4)
        w = quat_multiply(w_ext[..., ptr, :], w)
    return w


def _rel_positions(rot_w: jnp.ndarray, dtype) -> jnp.ndarray:
    """Root-relative positions of joints 1..23 via the ancestor matmul."""
    parent_rot = rot_w[..., SMPL_PARENTS[1:], :]  # (..., 23, 4) static gather
    offs = jnp.broadcast_to(
        jnp.asarray(SMPL_OFFSETS[1:], dtype), parent_rot.shape[:-1] + (3,)
    )
    rotated = quat_apply(parent_rot, offs)  # (..., 23, 3)
    return jnp.einsum("...jc,kj->...kc", rotated, jnp.asarray(_ANC, rotated.dtype))


def _fk_from_quats(quats: jnp.ndarray, root_positions: jnp.ndarray) -> jnp.ndarray:
    if _use_ancmat():
        rel = _rel_positions(_world_quats(quats), root_positions.dtype)
        rel = jnp.concatenate([jnp.zeros_like(rel[..., :1, :]), rel], axis=-2)
        return root_positions[..., None, :] + rel

    batch_shape = quats.shape[:-2]
    offsets = jnp.asarray(SMPL_OFFSETS, dtype=root_positions.dtype)
    offsets = jnp.broadcast_to(offsets, batch_shape + offsets.shape)

    # world rotation / position per joint, filled level by level
    rot_w = [None] * N_JOINTS
    pos_w = [None] * N_JOINTS
    rot_w[0] = quats[..., 0, :]
    pos_w[0] = root_positions

    for level in _LEVELS:
        # all joints in a level share no ancestry, so batch them in one op
        parent_rot = jnp.stack([rot_w[SMPL_PARENTS[j]] for j in level], axis=-2)
        parent_pos = jnp.stack([pos_w[SMPL_PARENTS[j]] for j in level], axis=-2)
        local_off = offsets[..., list(level), :]
        local_rot = quats[..., list(level), :]

        world_pos = quat_apply(parent_rot, local_off) + parent_pos
        world_rot = quat_multiply(parent_rot, local_rot)

        for k, j in enumerate(level):
            pos_w[j] = world_pos[..., k, :]
            rot_w[j] = world_rot[..., k, :]

    return jnp.stack(pos_w, axis=-2)
