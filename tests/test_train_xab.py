"""Training-path fused cross-attention block (TCDIFF_TRAIN_XAB).

Mirror of tests/test_train_sab.py for ops/fused_ca_block_train.py: exact
value/grad parity vs the unfused flax train path at rate=0, parameter-tree
stability, dropout mechanics, the all-three-kernels stack, and a rate>0
exact-gradient check against a pure-JAX replica (same hash masks) that
also pins the MEMORY cotangent — the path the cond encoder trains through.
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


def test_train_xab_matches_flax_rate0(env):
    model, params, io = _model_io(dropout=0.0)
    env.setenv("TCDIFF_TRAIN_XAB", "0")
    ref = _train_apply(model, params, io)
    env.setenv("TCDIFF_TRAIN_XAB", "1")
    jax.clear_caches()
    out = _train_apply(model, params, io)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5, rtol=3e-5)


def test_train_xab_grads_match_flax_rate0(env):
    """Parameter AND input grads — including the grads that flow through
    the memory cotangent into the cond encoder's parameters."""
    model, params, io = _model_io(dropout=0.0)

    def loss(p, x, cond):
        out = model.apply(
            {"params": p}, x, cond, io[2],
            deterministic=False, rngs={"dropout": jax.random.key(0)},
        )
        return jnp.sum(out * out) / out.size

    env.setenv("TCDIFF_TRAIN_XAB", "0")
    ref_gp, ref_gx, ref_gc = jax.grad(loss, argnums=(0, 1, 2))(params, io[0], io[1])
    env.setenv("TCDIFF_TRAIN_XAB", "1")
    jax.clear_caches()
    gp, gx, gc = jax.grad(loss, argnums=(0, 1, 2))(params, io[0], io[1])

    np.testing.assert_allclose(np.asarray(gx), np.asarray(ref_gx), atol=5e-5, rtol=5e-5)
    # cond grads flow ONLY through the memory cotangent -> cond encoder
    np.testing.assert_allclose(np.asarray(gc), np.asarray(ref_gc), atol=5e-5, rtol=5e-5)
    flat_ref = jax.tree_util.tree_leaves_with_path(ref_gp)
    flat = dict(jax.tree_util.tree_leaves_with_path(gp))
    assert len(flat) == len(flat_ref)
    for path, leaf_ref in flat_ref:
        np.testing.assert_allclose(
            np.asarray(flat[path]), np.asarray(leaf_ref), atol=1e-4, rtol=1e-4,
            err_msg=jax.tree_util.keystr(path),
        )


def test_train_xab_param_tree_unchanged(env):
    env.setenv("TCDIFF_TRAIN_XAB", "1")
    jax.clear_caches()
    model, params_p, _ = _model_io(dropout=0.0)
    env.setenv("TCDIFF_TRAIN_XAB", "0")
    jax.clear_caches()
    _, params_f, _ = _model_io(dropout=0.0)
    tp = jax.tree.map(lambda a: (a.shape, a.dtype), params_p)
    tf = jax.tree.map(lambda a: (a.shape, a.dtype), params_f)
    assert jax.tree.structure(tp) == jax.tree.structure(tf)
    assert jax.tree.leaves(tp) == jax.tree.leaves(tf)


def test_train_xab_dropout_runs_and_varies(env):
    model, params, io = _model_io(dropout=0.2)
    env.setenv("TCDIFF_TRAIN_XAB", "1")
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


def test_all_three_train_kernels_stack_rate0(env):
    """SAB + XAB + FFB at once (the intended TPU train default if the A/Bs
    land): values and grads still match the fully unfused path at rate=0."""
    model, params, io = _model_io(dropout=0.0)

    def loss(p):
        out = model.apply(
            {"params": p}, *io,
            deterministic=False, rngs={"dropout": jax.random.key(0)},
        )
        return jnp.mean(out * out)

    for var in ("TCDIFF_TRAIN_SAB", "TCDIFF_TRAIN_XAB", "TCDIFF_TRAIN_FFB"):
        env.setenv(var, "0")
    ref = loss(params)
    ref_g = jax.grad(loss)(params)
    for var in ("TCDIFF_TRAIN_SAB", "TCDIFF_TRAIN_XAB", "TCDIFF_TRAIN_FFB"):
        env.setenv(var, "1")
    jax.clear_caches()
    out = loss(params)
    g = jax.grad(loss)(params)
    np.testing.assert_allclose(float(out), float(ref), atol=1e-5, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(ref_g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("save", [None, "1"])
def test_train_xab_rate_grads_match_pure_jax_replica(monkeypatch, save):
    """rate>0: jax.grad of a plain-jnp replica (same hash masks) must match
    the hand-written split backward — including dmem. save="1"
    (TCDIFF_TRAIN_SAVE_RESID) makes the forward write q/k/v/o residuals
    and the backward skip its K1x/K2 recompute programs; grads must be
    unchanged (identical masks and rounding points)."""
    if save is not None:
        monkeypatch.setenv("TCDIFF_TRAIN_SAVE_RESID", save)
        jax.clear_caches()
    from tcdiff_tpu.ops.fused_ca_block_train import fused_ca_block_train
    from tcdiff_tpu.ops.fused_sa_block_train import (
        _SALT_ATTN, _SALT_FC, _SALT_OUT, _drop, sa_train_tables,
    )

    def _ln(x, s, b, eps):
        x = x.astype(jnp.float32)
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(x * x, axis=-1, keepdims=True) - mu * mu
        return (x - mu) * jax.lax.rsqrt(var + eps) * s + b

    def _swap(y):
        d = y.shape[-1]
        y2 = y.reshape(y.shape[:-1] + (d // 2, 2))
        return y2[..., ::-1].reshape(y.shape)

    def _rand(shape, seed, scale=1.0):
        return jnp.asarray(
            np.random.default_rng(seed).normal(size=shape).astype(np.float32) * scale
        )

    b, L, Lm, d, nhead = 2, 16, 10, 32, 4
    dk = d // nhead
    rate = 0.3
    scale = 1.0 / np.sqrt(dk)
    x = _rand((b, L, d), 1)
    mem = _rand((b, Lm, d), 2)
    s2, b2 = _rand((d,), 3, 0.1) + 1.0, _rand((d,), 4, 0.1)
    ss, sb = _rand((d,), 5, 0.1) + 1.0, _rand((d,), 6, 0.1)
    wq, wk, wv = _rand((d, d), 7, 0.2), _rand((d, d), 8, 0.2), _rand((d, d), 9, 0.2)
    wfc = _rand((d, d), 10, 0.2)
    fs, fb = _rand((b, d), 11, 0.1), _rand((b, d), 12, 0.1)
    cosx, ssinx = sa_train_tables(x, _rand((L, d), 13, 0.5), d)
    cosm, ssinm = sa_train_tables(mem, _rand((Lm, d), 14, 0.5), d)
    seeds = jnp.asarray(
        np.random.default_rng(0).integers(0, 2**32, size=(b,), dtype=np.uint32)
    )

    def replica_one(xi, mi, wq, wk, wv, wfc, s2, b2, ss, sb, fsi, fbi, seed):
        h = _ln(xi, s2, b2, 1e-5)
        r = h * cosx + _swap(h) * ssinx
        rm = mi * cosm + _swap(mi) * ssinm
        q, k, v = r @ wq, rm @ wk, mi @ wv
        outs = []
        for i in range(nhead):
            sl = slice(i * dk, (i + 1) * dk)
            logits = (q[:, sl] * scale) @ k[:, sl].T
            m = jnp.max(logits, axis=-1, keepdims=True)
            e = jnp.exp(logits - m)
            p = e / jnp.sum(e, axis=-1, keepdims=True)
            outs.append(_drop(p, seed, _SALT_ATTN + i, rate) @ v[:, sl])
        o = jnp.concatenate(outs, axis=-1)
        z2 = _drop(o @ wfc, seed, _SALT_FC, rate)
        sa_d = _drop(_ln(z2, ss, sb, 1e-6), seed, _SALT_OUT, rate)
        return xi + (fsi + 1.0) * sa_d + fbi

    def loss_replica(args):
        x, mem, wq, wk, wv, wfc, s2, b2, ss, sb, fs, fb = args
        out = jnp.stack([
            replica_one(x[i], mem[i], wq, wk, wv, wfc, s2, b2, ss, sb,
                        fs[i], fb[i], seeds[i])
            for i in range(b)
        ])
        return jnp.mean(out * out)

    def loss_kernel(args):
        x, mem, wq, wk, wv, wfc, s2, b2, ss, sb, fs, fb = args
        out = fused_ca_block_train(
            x, mem, s2, b2, cosx, ssinx, cosm, ssinm, wq, wk, wv, wfc,
            ss, sb, fs, fb, seeds, nhead, rate, 1e-5, 1e-6,
        )
        return jnp.mean(out * out)

    args = (x, mem, wq, wk, wv, wfc, s2, b2, ss, sb, fs, fb)
    np.testing.assert_allclose(
        float(loss_kernel(args)), float(loss_replica(args)), rtol=2e-5
    )
    ref_g = jax.grad(loss_replica)(args)
    ker_g = jax.grad(loss_kernel)(args)
    names = ("x", "mem", "wq", "wk", "wv", "wfc", "s2", "b2", "ss", "sb",
             "fs", "fb")
    for name, a, r in zip(names, ker_g, ref_g):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(r), atol=5e-5, rtol=5e-5, err_msg=name
        )
