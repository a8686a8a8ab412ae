"""Whole-layer fused program (TCDIFF_LAYER_FUSE) parity vs the default path.

The fused layer (ops/fused_layer.py) must reproduce the serving forward —
SA block, cached-k/v cross-attention, FF + tail, FiLM — to fp tolerance,
in both variants (FF in-program / FF via the separate fused_ff_tail).
Reference chain: `/root/reference/model/model.py:318-344`.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tcdiff_tpu.config import DanceDecoderConfig
from tcdiff_tpu.models import DanceDecoder


def _setup():
    cfg = DanceDecoderConfig(
        seq_len=16, latent_dim=32, ff_size=48, num_layers=2, num_heads=2,
        cond_feature_dim=24, dancer_num=2, head_dim=16,
    )
    model = DanceDecoder(cfg)
    tokens = cfg.seq_len * cfg.dancer_num
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(3, tokens, cfg.nfeats)).astype(np.float32))
    cond = jnp.asarray(
        rng.normal(size=(3, 2 * cfg.seq_len + 1, cfg.cond_feature_dim)).astype(np.float32)
    )
    times = jnp.asarray([2, 5, 9], jnp.int32)
    params = model.init(jax.random.key(0), x, cond, times)["params"]
    return model, params, x, cond, times


@pytest.mark.parametrize("kv_batch", ["1", "0"])
@pytest.mark.parametrize("ff_in_program", [True, False])
def test_fused_layer_matches_default_forward(monkeypatch, ff_in_program, kv_batch):
    """kv_batch covers both cross-attention t-row sources: the stacked
    all-layer einsum (kv_projected=True) and the per-layer projection the
    call site performs itself (kv_projected=False)."""
    monkeypatch.setenv("TCDIFF_KV_BATCH", kv_batch)
    jax.clear_caches()
    model, params, x, cond, times = _setup()
    ref = model.apply({"params": params}, x, cond, times)

    monkeypatch.setenv("TCDIFF_LAYER_FUSE", "1")
    monkeypatch.setenv("TCDIFF_LAYER_FUSE_FF", "1" if ff_in_program else "0")
    jax.clear_caches()
    got = model.apply({"params": params}, x, cond, times)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5)
    assert not np.allclose(np.asarray(got), 0.0)
    jax.clear_caches()


def test_fused_layer_in_guided_sampler_step(monkeypatch):
    """The sampler path (doubled-batch CFG + cond-cache hoist + dedup)
    produces the same guided output with the whole-layer program on."""
    from tcdiff_tpu.config import DiffusionConfig
    from tcdiff_tpu.diffusion import GaussianDiffusion

    model, params, x, cond, times = _setup()
    diff = GaussianDiffusion(model, DiffusionConfig(sampling_timesteps=2, n_timestep=10))
    shape = x.shape
    x0 = jnp.zeros(shape[:2] + (3,))
    ref = diff.ddim_sample(params, shape, cond, jax.random.key(1), x0)

    monkeypatch.setenv("TCDIFF_LAYER_FUSE", "1")
    jax.clear_caches()
    got = diff.ddim_sample(params, shape, cond, jax.random.key(1), x0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-5)
