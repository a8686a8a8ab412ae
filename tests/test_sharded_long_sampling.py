"""Sequence-parallel long-form sampling: slices sharded over dp must produce
EXACTLY the single-mesh result (the half-window coupling crosses shard
boundaries via the XLA-inserted collective permute)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tcdiff_tpu.config import DanceDecoderConfig, DiffusionConfig
from tcdiff_tpu.diffusion import GaussianDiffusion
from tcdiff_tpu.models import DanceDecoder
from tcdiff_tpu.parallel import make_mesh


@pytest.fixture(scope="module")
def setup():
    cfg = DanceDecoderConfig(
        seq_len=8, latent_dim=32, ff_size=32, num_layers=1, num_heads=2,
        dancer_num=2, head_dim=16,
    )
    model = DanceDecoder(cfg)
    diff = GaussianDiffusion(model, DiffusionConfig(sampling_timesteps=4, n_timestep=10))
    tokens = cfg.seq_len * cfg.dancer_num
    params = model.init(
        jax.random.key(0), jnp.zeros((1, tokens, cfg.nfeats)),
        jnp.zeros((1, 2 * cfg.seq_len + 1, cfg.cond_feature_dim)),
        jnp.zeros((1,), jnp.int32),
    )["params"]
    return cfg, diff, params, tokens


def test_sharded_long_ddim_matches_unsharded(setup):
    cfg, diff, params, tokens = setup
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    n_slices = 8
    shape = (n_slices, tokens, cfg.nfeats)
    rng = np.random.default_rng(0)
    cond = jnp.asarray(
        rng.normal(size=(n_slices, 2 * cfg.seq_len + 1, cfg.cond_feature_dim)).astype(np.float32)
    )
    noise = {
        "init": rng.normal(size=shape).astype(np.float32),
        "steps": rng.normal(size=(4,) + shape).astype(np.float32),
    }
    x_0 = jnp.asarray(rng.normal(size=(n_slices, tokens, 3)).astype(np.float32) * 0.2)

    ref = diff.long_ddim_sample(params, shape, cond, jax.random.key(1), x_0=x_0, noise=noise)

    mesh = make_mesh(dp=8, tp=1)
    out = diff.long_ddim_sample_sharded(
        params, shape, cond, jax.random.key(1), mesh, x_0=x_0, noise=noise
    )
    # the output really is sharded over slices
    assert not out.sharding.is_fully_replicated
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_sharded_long_ddim_with_serving_kernels(setup, monkeypatch):
    """Serving block kernels + threaded mesh: the Pallas call sites run
    under shard_map over dp (parallel/kernel_shard.py, VERDICT r3 #4) and
    the sharded long-DDIM still matches the unsharded kernels-ON result."""
    cfg, _, params, tokens = setup
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    for var in ("TCDIFF_PALLAS_SAB", "TCDIFF_PALLAS_FFB"):
        monkeypatch.setenv(var, "1")
    jax.clear_caches()

    dcfg = DiffusionConfig(sampling_timesteps=4, n_timestep=10)
    n_slices = 8
    shape = (n_slices, tokens, cfg.nfeats)
    rng = np.random.default_rng(0)
    cond = jnp.asarray(
        rng.normal(size=(n_slices, 2 * cfg.seq_len + 1, cfg.cond_feature_dim)).astype(np.float32)
    )
    noise = {
        "init": rng.normal(size=shape).astype(np.float32),
        "steps": rng.normal(size=(4,) + shape).astype(np.float32),
    }
    x_0 = jnp.asarray(rng.normal(size=(n_slices, tokens, 3)).astype(np.float32) * 0.2)

    ref = GaussianDiffusion(DanceDecoder(cfg), dcfg).long_ddim_sample(
        params, shape, cond, jax.random.key(1), x_0=x_0, noise=noise
    )

    mesh = make_mesh(dp=8, tp=1)
    diff_m = GaussianDiffusion(DanceDecoder(cfg, mesh=mesh), dcfg)
    out = diff_m.long_ddim_sample_sharded(
        params, shape, cond, jax.random.key(1), mesh, x_0=x_0, noise=noise
    )
    assert not out.sharding.is_fully_replicated
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    jax.clear_caches()


def test_orchestrator_sample_shards_over_dp(setup):
    """Eval-loop sampling shards the batch over dp with identical results."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    from tests.test_orchestrator import _tiny_cfg
    from tcdiff_tpu.train.orchestrator import TCDiff

    runner = TCDiff(_tiny_cfg(), use_ema_for_eval=False)
    cfg = runner.cfg.model
    b = 8
    rng = np.random.default_rng(0)
    cond = rng.normal(size=(b, 2 * cfg.seq_len + 1, cfg.cond_feature_dim)).astype(np.float32)
    x0 = jnp.asarray(rng.normal(size=(b, cfg.seq_len * cfg.dancer_num, 3)).astype(np.float32) * 0.2)

    sharded = runner._sample(cond, x0, jax.random.key(3))
    assert not sharded.sharding.is_fully_replicated  # really distributed
    # single-device reference
    shape = (b, cfg.seq_len * cfg.dancer_num, cfg.nfeats)
    ref = runner.diffusion.ddim_sample(
        runner.eval_params(), shape, jnp.asarray(cond), jax.random.key(3), x0
    )
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(ref), atol=1e-5)
