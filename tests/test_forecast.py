"""Opt-in LMS feature-forecast sampling (PAPERS.md: BlockDance / multistep
feature forecasting). forecast_every=0/1 must be the EXACT sampler; >=2
skips model forwards but keeps all per-step semantics."""

import numpy as np
import jax
import jax.numpy as jnp

from tcdiff_tpu.config import DanceDecoderConfig, DiffusionConfig
from tcdiff_tpu.diffusion import GaussianDiffusion
from tcdiff_tpu.models import DanceDecoder


def _setup(steps=8):
    cfg = DanceDecoderConfig(
        seq_len=16, latent_dim=32, ff_size=32, num_layers=1, num_heads=2,
        cond_feature_dim=24, dancer_num=2, head_dim=16,
    )
    model = DanceDecoder(cfg)
    diff = GaussianDiffusion(model, DiffusionConfig(sampling_timesteps=steps, n_timestep=50))
    tokens = cfg.seq_len * 2
    rng = np.random.default_rng(0)
    cond = jnp.asarray(rng.normal(size=(2, 33, 24)).astype(np.float32))
    x0 = jnp.asarray(rng.normal(size=(2, tokens, 3)).astype(np.float32) * 0.2)
    params = model.init(
        jax.random.key(0), jnp.zeros((2, tokens, cfg.nfeats)), cond,
        jnp.zeros((2,), jnp.int32),
    )["params"]
    return diff, params, (2, tokens, cfg.nfeats), cond, x0


def test_forecast_off_and_one_are_exact():
    diff, params, shape, cond, x0 = _setup()
    ref = diff.ddim_sample(params, shape, cond, jax.random.key(1), x0)
    off = diff.ddim_sample(params, shape, cond, jax.random.key(1), x0, forecast_every=0)
    one = diff.ddim_sample(params, shape, cond, jax.random.key(1), x0, forecast_every=1)
    np.testing.assert_array_equal(np.asarray(off), np.asarray(ref))
    np.testing.assert_array_equal(np.asarray(one), np.asarray(ref))


def test_forecast_two_runs_and_respects_trajectory():
    diff, params, shape, cond, x0 = _setup()
    out = diff.ddim_sample(params, shape, cond, jax.random.key(1), x0, forecast_every=2)
    out = np.asarray(out)
    assert np.isfinite(out).all()
    # the trajectory clamp runs on every step, forecast or not
    np.testing.assert_allclose(out[..., 4], np.asarray(x0)[..., 0], atol=1e-6)
    np.testing.assert_allclose(out[..., 5], np.asarray(x0)[..., 1], atol=1e-6)
    # and the result stays in the clip range like the exact sampler
    assert np.abs(out).max() <= 1.0 + 1e-5


def test_forecast_tracks_exact_sampler():
    """With a smooth (randomly initialized but deterministic) denoiser the
    forecasted trajectory must stay close to the exact one — the skipped
    steps extrapolate a smoothly varying x0 prediction."""
    diff, params, shape, cond, x0 = _setup(steps=12)
    noise = {
        "init": np.random.default_rng(5).normal(size=shape).astype(np.float32),
        "steps": np.random.default_rng(6).normal(size=(12,) + shape).astype(np.float32),
    }
    exact = np.asarray(
        diff.ddim_sample(params, shape, cond, jax.random.key(1), x0, noise=noise)
    )
    fast = np.asarray(
        diff.ddim_sample(
            params, shape, cond, jax.random.key(1), x0, noise=noise, forecast_every=2
        )
    )
    err = np.sqrt(np.mean((fast - exact) ** 2))
    scale = np.sqrt(np.mean(exact**2))
    assert err < 0.35 * scale, (err, scale)
