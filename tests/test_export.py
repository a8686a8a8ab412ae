"""Export tooling: pkl splitting, BVH writing, masks, FBX gating."""

import os
import pickle

import numpy as np
import jax.numpy as jnp
import pytest

from tcdiff_tpu.diffusion.masks import (
    first_last_mask,
    joint_indices_to_channel_indices,
    lowerbody_mask,
    upperbody_mask,
)
from tcdiff_tpu.export import fbx_available, pkl_to_bvh, split_pkl_file, write_bvh
from tcdiff_tpu.export.bvh import _axis_angle_to_euler_zxy_deg, _traversal_order
from tcdiff_tpu.geometry.skeleton import SMPL_PARENTS


def _fk_pkl(tmp_path, dn=2, T=5):
    rng = np.random.default_rng(0)
    data = {
        "smpl_poses": rng.normal(size=(T * dn, 72)).astype(np.float32) * 0.3,
        "smpl_trans": rng.normal(size=(T * dn, 3)).astype(np.float32),
        "full_pose": rng.normal(size=(dn, T, 24, 3)).astype(np.float32),
    }
    p = tmp_path / "e1_sample.pkl"
    with open(p, "wb") as f:
        pickle.dump(data, f)
    return str(p), data


def test_split_pkl_per_dancer(tmp_path):
    p, data = _fk_pkl(tmp_path, dn=2, T=5)
    written = split_pkl_file(p, str(tmp_path), os.path.basename(p))
    assert len(written) == 2
    with open(written[1], "rb") as f:
        sub = pickle.load(f)
    assert sub["smpl_poses"].shape == (5, 72)
    assert sub["smpl_trans"].shape == (5, 3)
    assert sub["full_pose"].shape == (1, 5, 24, 3)
    # dancer 1's frame t lives at flat index t*dn + 1
    np.testing.assert_allclose(
        sub["smpl_poses"][2], data["smpl_poses"].reshape(5, 2, 72)[2, 1]
    )


def test_euler_roundtrip_identity_and_axis():
    # zero rotation -> zero euler
    np.testing.assert_allclose(_axis_angle_to_euler_zxy_deg(np.zeros((1, 3))), 0.0)
    # pure X rotation of 30 degrees
    aa = np.array([[np.radians(30), 0, 0]])
    e = _axis_angle_to_euler_zxy_deg(aa)[0]
    np.testing.assert_allclose(e, [0.0, 30.0, 0.0], atol=1e-6)
    # pure Z rotation
    aa = np.array([[0, 0, np.radians(-45)]])
    e = _axis_angle_to_euler_zxy_deg(aa)[0]
    np.testing.assert_allclose(e, [-45.0, 0.0, 0.0], atol=1e-6)


def test_bvh_file_structure(tmp_path):
    T = 4
    rng = np.random.default_rng(1)
    poses = rng.normal(size=(T, 72)) * 0.2
    trans = rng.normal(size=(T, 3))
    path = write_bvh(str(tmp_path / "a.bvh"), poses, trans, fps=30)
    text = open(path).read()
    assert text.startswith("HIERARCHY")
    assert text.count("JOINT") == 23  # 24 joints, one is ROOT
    assert f"Frames: {T}" in text
    motion = text.split("MOTION")[1].strip().splitlines()[2:]
    assert len(motion) == T
    # 6 root channels + 23 * 3 rotation channels
    assert len(motion[0].split()) == 6 + 23 * 3
    # traversal covers every joint exactly once
    order = _traversal_order()
    assert sorted(order) == list(range(len(SMPL_PARENTS)))


def test_pkl_to_bvh(tmp_path):
    p, _ = _fk_pkl(tmp_path, dn=1, T=3)
    out = pkl_to_bvh(p, str(tmp_path / "bvh"))
    assert os.path.exists(out)


def test_fbx_gated():
    assert fbx_available() is False  # SDK not in this image
    from tcdiff_tpu.export import pkl_to_fbx

    with pytest.raises(ImportError, match="bvh"):
        pkl_to_fbx("x.pkl", "t.fbx", "o.fbx")


def test_masks():
    shape = (2, 10, 151)
    m = first_last_mask(shape, 2, 3)
    assert float(m[0, 0, 0]) == 1.0 and float(m[0, 1, 0]) == 1.0
    assert float(m[0, 4, 0]) == 0.0 and float(m[0, -3, 0]) == 1.0

    low = lowerbody_mask(shape)
    up = upperbody_mask(shape)
    # root channels kept by both; contacts by neither
    assert float(low[0, 0, 4]) == float(up[0, 0, 4]) == 1.0
    assert float(low[0, 0, 0]) == float(up[0, 0, 0]) == 0.0
    # pelvis (joint 0) belongs to both groups; lleg (joint 1) only to lower
    j0 = joint_indices_to_channel_indices([0])[0]
    j1 = joint_indices_to_channel_indices([1])[0]
    assert float(low[0, 0, j0]) == float(up[0, 0, j0]) == 1.0
    assert float(low[0, 0, j1]) == 1.0 and float(up[0, 0, j1]) == 0.0
