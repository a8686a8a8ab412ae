"""Tensor-parallel sharding: params actually shard over tp; the train step
runs on a (dp, tp) mesh and matches the dp-only result."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from tcdiff_tpu.config import DanceDecoderConfig, DiffusionConfig
from tcdiff_tpu.diffusion import GaussianDiffusion
from tcdiff_tpu.models import DanceDecoder
from tcdiff_tpu.optim import adan
from tcdiff_tpu.parallel import (
    make_mesh,
    params_pspecs,
    shard_batch,
    shard_train_state,
)
from tcdiff_tpu.train import create_train_state, make_train_step


def _setup(tp):
    cfg = DanceDecoderConfig(
        seq_len=8, latent_dim=64, ff_size=64, num_layers=2, num_heads=4,
        dancer_num=2, head_dim=16,
    )
    model = DanceDecoder(cfg)
    diff = GaussianDiffusion(model, DiffusionConfig(n_timestep=10))
    tokens = cfg.seq_len * cfg.dancer_num
    params = model.init(
        jax.random.key(0),
        jnp.zeros((1, tokens, cfg.nfeats)),
        jnp.zeros((1, 2 * cfg.seq_len + 1, cfg.cond_feature_dim)),
        jnp.zeros((1,), jnp.int32),
    )["params"]
    tx = adan(5e-5, weight_decay=0.02)
    return cfg, model, diff, params, tx


def test_pspecs_shard_large_kernels():
    _, _, _, params, _ = _setup(2)
    specs = params_pspecs(params, tp=2)
    flat = jax.tree_util.tree_flatten_with_path(specs)[0]
    sharded = [(p, s) for p, s in flat if s != P()]
    assert len(sharded) > 10  # most dense kernels shard
    # FF down-projection (linear2) is row-parallel: input dim sharded
    d = dict(
        ("/".join(k.key for k in path), spec) for path, spec in flat
    )
    assert d["decoder_0/linear2/kernel"] == P("tp", None)
    assert d["decoder_0/linear1/kernel"] == P(None, "tp")
    # biases replicated
    assert d["final_layer/bias"] == P()


def test_train_step_dp_times_tp_matches_dp_only():
    n = len(jax.devices())
    if n < 8:
        pytest.skip("needs the 8-device CPU mesh")
    cfg, model, diff, params, tx = _setup(2)
    b = 8
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, cfg.dancer_num, cfg.seq_len, cfg.nfeats)).astype(np.float32) * 0.3)
    cond = jnp.asarray(rng.normal(size=(b, 2 * cfg.seq_len + 1, cfg.cond_feature_dim)).astype(np.float32))

    results = []
    for dp, tp in ((8, 1), (4, 2)):
        mesh = make_mesh(dp=dp, tp=tp)
        state = shard_train_state(create_train_state(params, tx), mesh)
        xs, cs = shard_batch((x, cond), mesh)
        step = jax.jit(make_train_step(diff, tx))
        key = jax.device_put(
            jax.random.key(1), jax.sharding.NamedSharding(mesh, P())
        )
        new_state, metrics = step(state, xs, cs, key)
        results.append((float(metrics["total"]), new_state))

    # same math on both meshes
    np.testing.assert_allclose(results[0][0], results[1][0], rtol=2e-5)
    jax.tree.map(
        lambda a, b_: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=5e-4, atol=5e-6
        ),
        results[0][1].params,
        results[1][1].params,
    )


def test_tp_sharding_is_actually_distributed():
    n = len(jax.devices())
    if n < 8:
        pytest.skip("needs the 8-device CPU mesh")
    _, _, _, params, tx = _setup(2)
    mesh = make_mesh(dp=4, tp=2)
    from tcdiff_tpu.train import create_train_state

    state = shard_train_state(create_train_state(params, tx), mesh)
    # at least one large kernel must be sharded (not fully replicated)
    leaves = jax.tree.leaves(state.params)
    assert any(
        not l.sharding.is_fully_replicated for l in leaves if hasattr(l, "sharding")
    )
