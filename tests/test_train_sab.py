"""Training-path fused self-attention block (TCDIFF_TRAIN_SAB).

The custom-VJP Pallas program (ops/fused_sa_block_train.py) must match the
unfused flax TRAIN path (deterministic=False) exactly in the rate=0 limit —
values AND parameter/input gradients — and share the parameter tree.  With
rate>0 the in-kernel hash PRNG is a different (identically-distributed)
draw than flax's threefry, so those tests assert mechanics (finiteness,
mask reconstruction, seed sensitivity) rather than bit parity.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tcdiff_tpu.config import DanceDecoderConfig
from tcdiff_tpu.models import DanceDecoder


@pytest.fixture
def env(monkeypatch):
    return monkeypatch


def _model_io(dropout=0.0, dancers=2, seq=8):
    cfg = DanceDecoderConfig(
        seq_len=seq, latent_dim=64, ff_size=64, num_layers=2, num_heads=4,
        cond_feature_dim=24, dancer_num=dancers, head_dim=16, dropout=dropout,
    )
    model = DanceDecoder(cfg)
    tokens = seq * dancers
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, tokens, cfg.nfeats)).astype(np.float32))
    cond = jnp.asarray(rng.normal(size=(2, 2 * seq + 1, 24)).astype(np.float32))
    t = jnp.asarray([3, 7], dtype=jnp.int32)
    params = model.init(jax.random.key(0), x, cond, t)["params"]
    return model, params, (x, cond, t)


def _train_apply(model, params, io, drop_key=0):
    x, cond, t = io
    return model.apply(
        {"params": params}, x, cond, t,
        deterministic=False, rngs={"dropout": jax.random.key(drop_key)},
    )


def test_train_sab_matches_flax_rate0(env):
    """rate=0: the fused train block is exact math — value parity."""
    model, params, io = _model_io(dropout=0.0)
    env.setenv("TCDIFF_TRAIN_SAB", "0")
    ref = _train_apply(model, params, io)
    env.setenv("TCDIFF_TRAIN_SAB", "1")
    jax.clear_caches()
    out = _train_apply(model, params, io)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5, rtol=3e-5)


@pytest.mark.parametrize("lblk", [None, "4"])
def test_train_sab_grads_match_flax_rate0(env, lblk):
    """rate=0: parameter AND input grads from the hand-written backward
    match flax/XLA autodiff. lblk="4" forces the row-blocked K5 backward
    (grid (b, L//lblk)) that real shapes hit by default (L=450 > 160) —
    the whole-L K5 measured a 16.65 MB scoped stack vs the 16 MB limit
    on the real toolchain (r4b arm TRAIN_SAB_XAB)."""
    if lblk is not None:
        env.setenv("TCDIFF_SAB_LBLK", lblk)
    model, params, io = _model_io(dropout=0.0)

    def loss(p, x):
        out = model.apply(
            {"params": p}, x, io[1], io[2],
            deterministic=False, rngs={"dropout": jax.random.key(0)},
        )
        return jnp.sum(out * out) / out.size

    env.setenv("TCDIFF_TRAIN_SAB", "0")
    ref_gp, ref_gx = jax.grad(loss, argnums=(0, 1))(params, io[0])
    env.setenv("TCDIFF_TRAIN_SAB", "1")
    jax.clear_caches()
    gp, gx = jax.grad(loss, argnums=(0, 1))(params, io[0])

    np.testing.assert_allclose(np.asarray(gx), np.asarray(ref_gx), atol=5e-5, rtol=5e-5)
    flat_ref = jax.tree_util.tree_leaves_with_path(ref_gp)
    flat = dict(jax.tree_util.tree_leaves_with_path(gp))
    assert len(flat) == len(flat_ref)
    for path, leaf_ref in flat_ref:
        leaf = flat[path]
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(leaf_ref), atol=1e-4, rtol=1e-4,
            err_msg=jax.tree_util.keystr(path),
        )


def test_train_sab_param_tree_unchanged(env):
    env.setenv("TCDIFF_TRAIN_SAB", "1")
    jax.clear_caches()
    model, params_p, _ = _model_io(dropout=0.0)
    env.setenv("TCDIFF_TRAIN_SAB", "0")
    jax.clear_caches()
    _, params_f, _ = _model_io(dropout=0.0)
    tp = jax.tree.map(lambda a: (a.shape, a.dtype), params_p)
    tf = jax.tree.map(lambda a: (a.shape, a.dtype), params_f)
    assert jax.tree.structure(tp) == jax.tree.structure(tf)
    assert jax.tree.leaves(tp) == jax.tree.leaves(tf)


def test_train_sab_dropout_runs_and_varies(env):
    """rate>0: output + grads finite; different dropout rngs give different
    outputs (the seeds actually reach the kernel); same rng is deterministic."""
    model, params, io = _model_io(dropout=0.2)
    env.setenv("TCDIFF_TRAIN_SAB", "1")
    jax.clear_caches()
    out_a = _train_apply(model, params, io, drop_key=1)
    out_a2 = _train_apply(model, params, io, drop_key=1)
    out_b = _train_apply(model, params, io, drop_key=2)
    assert np.all(np.isfinite(np.asarray(out_a)))
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_a2))
    assert not np.allclose(np.asarray(out_a), np.asarray(out_b))

    def loss(p):
        out = model.apply(
            {"params": p}, *io,
            deterministic=False, rngs={"dropout": jax.random.key(1)},
        )
        return jnp.mean(out * out)

    g = jax.grad(loss)(params)
    for leaf in jax.tree.leaves(g):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_keep_mask_plain_jax_reconstruction():
    """The kernel's hash dropout is reconstructable in plain JAX: applying
    _keep_mask twice (fwd and 'bwd') gives the identical mask, and the keep
    fraction is within sampling noise of 1-rate."""
    from tcdiff_tpu.ops.fused_sa_block_train import _keep_mask

    seed = jnp.uint32(1234)
    m1 = _keep_mask(seed, 0x100, (64, 64), 0.3)
    m2 = _keep_mask(seed, 0x100, (64, 64), 0.3)
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
    frac = float(jnp.mean(m1.astype(jnp.float32)))
    assert abs(frac - 0.7) < 0.05
    m3 = _keep_mask(seed, 0x200, (64, 64), 0.3)
    assert not np.array_equal(np.asarray(m1), np.asarray(m3))


def test_train_sab_composes_with_remat(env):
    """The custom-VJP op must compose with nn.remat (the --remat train
    path): values and grads agree with the non-remat fused path."""
    model, params, io = _model_io(dropout=0.0)
    model_r = DanceDecoder(model.cfg, remat=True)
    env.setenv("TCDIFF_TRAIN_SAB", "1")
    jax.clear_caches()

    def loss(m):
        def f(p):
            out = m.apply(
                {"params": p}, *io,
                deterministic=False, rngs={"dropout": jax.random.key(0)},
            )
            return jnp.mean(out * out)
        return f

    ref = loss(model)(params)
    out = loss(model_r)(params)
    np.testing.assert_allclose(float(out), float(ref), atol=1e-5, rtol=1e-5)
    g_ref = jax.grad(loss(model))(params)
    g = jax.grad(loss(model_r))(params)
    for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)
