"""SMPL FK tests: the level-parallel FK must match a straightforward
sequential reference walk (independent numpy implementation of the chain in
`/root/reference/vis.py:358-406`)."""

import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as R

from tcdiff_tpu.geometry import (
    SMPL_OFFSETS,
    SMPL_PARENTS,
    ax_to_6v,
    smpl_fk,
    smpl_fk_from_6d,
)


def sequential_fk_numpy(rotations_ax, root_positions):
    """Plain sequential FK in numpy/scipy: the golden model."""
    N, L, J, _ = rotations_ax.shape
    flat = rotations_ax.reshape(-1, 3)
    mats = R.from_rotvec(flat).as_matrix().reshape(N, L, J, 3, 3)

    pos = np.zeros((N, L, J, 3))
    rot_w = np.zeros((N, L, J, 3, 3))
    pos[:, :, 0] = root_positions
    rot_w[:, :, 0] = mats[:, :, 0]
    for j in range(1, J):
        p = SMPL_PARENTS[j]
        pos[:, :, j] = (
            np.einsum("nlij,j->nli", rot_w[:, :, p], SMPL_OFFSETS[j]) + pos[:, :, p]
        )
        rot_w[:, :, j] = np.einsum("nlij,nljk->nlik", rot_w[:, :, p], mats[:, :, j])
    return pos


def make_inputs(n=2, l=5, seed=0):
    rng = np.random.default_rng(seed)
    axes = rng.normal(size=(n, l, 24, 3))
    axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
    angles = rng.uniform(0, np.pi * 0.9, size=(n, l, 24, 1))
    rotations = (axes * angles).astype(np.float32)
    roots = rng.normal(size=(n, l, 3)).astype(np.float32)
    return rotations, roots


def test_fk_matches_sequential():
    rotations, roots = make_inputs()
    ours = np.asarray(smpl_fk(jnp.array(rotations), jnp.array(roots)))
    golden = sequential_fk_numpy(rotations, roots)
    np.testing.assert_allclose(ours, golden, atol=1e-4)


def test_fk_rest_pose_is_offsets_chain():
    """Zero rotations: every joint sits at the cumulative offset from root."""
    rotations = np.zeros((1, 1, 24, 3), dtype=np.float32)
    roots = np.zeros((1, 1, 3), dtype=np.float32)
    out = np.asarray(smpl_fk(jnp.array(rotations), jnp.array(roots)))[0, 0]
    expected = np.zeros((24, 3))
    for j in range(1, 24):
        expected[j] = expected[SMPL_PARENTS[j]] + SMPL_OFFSETS[j]
    np.testing.assert_allclose(out, expected, atol=1e-6)


def test_fk_root_translation_equivariance():
    rotations, roots = make_inputs(seed=1)
    shift = np.array([1.5, -2.0, 0.25], dtype=np.float32)
    a = np.asarray(smpl_fk(jnp.array(rotations), jnp.array(roots)))
    b = np.asarray(smpl_fk(jnp.array(rotations), jnp.array(roots + shift)))
    np.testing.assert_allclose(b, a + shift, atol=1e-5)


def test_fk_from_6d_matches_axis_angle_path():
    rotations, roots = make_inputs(seed=2)
    d6 = ax_to_6v(jnp.array(rotations))
    a = np.asarray(smpl_fk(jnp.array(rotations), jnp.array(roots)))
    b = np.asarray(smpl_fk_from_6d(d6, jnp.array(roots)))
    np.testing.assert_allclose(a, b, atol=1e-4)


def test_fk_jit_and_grad():
    rotations, roots = make_inputs(n=1, l=3, seed=3)

    @jax.jit
    def loss(rot, root):
        return jnp.sum(smpl_fk(rot, root) ** 2)

    g = jax.grad(loss)(jnp.array(rotations), jnp.array(roots))
    assert np.all(np.isfinite(np.asarray(g)))


def test_ancmat_fk_matches_level_walk(monkeypatch):
    """TCDIFF_FK_ANCMAT=1 (ancestor-matrix positions) vs the level walk:
    identical up to f32 summation order, on absolute FK and on grads."""
    rotations, roots = make_inputs(seed=4)
    monkeypatch.setenv("TCDIFF_FK_ANCMAT", "0")
    jax.clear_caches()
    legacy = np.asarray(smpl_fk(jnp.array(rotations), jnp.array(roots)))
    g_legacy = jax.grad(
        lambda r, p: jnp.sum(smpl_fk(r, p) ** 2)
    )(jnp.array(rotations), jnp.array(roots))
    monkeypatch.setenv("TCDIFF_FK_ANCMAT", "1")
    jax.clear_caches()
    anc = np.asarray(smpl_fk(jnp.array(rotations), jnp.array(roots)))
    g_anc = jax.grad(
        lambda r, p: jnp.sum(smpl_fk(r, p) ** 2)
    )(jnp.array(rotations), jnp.array(roots))
    jax.clear_caches()
    np.testing.assert_allclose(anc, legacy, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_anc), np.asarray(g_legacy), atol=1e-4)


def test_rel_fk_equals_absolute_minus_root():
    from tcdiff_tpu.geometry import smpl_fk_rel_from_6d

    rotations, roots = make_inputs(seed=5)
    d6 = ax_to_6v(jnp.array(rotations))
    absolute = np.asarray(smpl_fk_from_6d(d6, jnp.array(roots)))
    rel = np.asarray(smpl_fk_rel_from_6d(d6))
    np.testing.assert_allclose(
        rel, absolute[..., 1:, :] - absolute[..., :1, :], atol=1e-5
    )
