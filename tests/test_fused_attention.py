"""Pallas fused attention vs the XLA einsum reference path."""

import numpy as np
import jax
import jax.numpy as jnp

from tcdiff_tpu.ops import fused_attention


def _ref_attention(q, k, v, scale, table=None, dist=None):
    logits = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k)
    if table is not None:
        indexed = jnp.einsum("bhqd,hnd->bhqn", q, table)
        idx = jnp.broadcast_to(dist[:, None, :, :], logits.shape)
        logits = logits + jnp.take_along_axis(indexed, idx, axis=3)
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


def _rand(shape, seed):
    return jnp.asarray(np.random.default_rng(seed).normal(size=shape).astype(np.float32))


def test_fused_attention_matches_einsum():
    b, h, lq, lk, dk = 2, 4, 30, 30, 16
    q, k, v = _rand((b, h, lq, dk), 0), _rand((b, h, lk, dk), 1), _rand((b, h, lk, dk), 2)
    scale = 1.0 / np.sqrt(dk)
    out = fused_attention(q, k, v, scale)
    ref = _ref_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_attention_cross_shape():
    # cross-attention: lq != lk, dv == dk
    b, h, lq, lk, dk = 1, 2, 12, 33, 8
    q, k, v = _rand((b, h, lq, dk), 3), _rand((b, h, lk, dk), 4), _rand((b, h, lk, dk), 5)
    out = fused_attention(q, k, v, 0.25)
    ref = _ref_attention(q, k, v, 0.25)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_attention_trpe_bias():
    b, h, lq, dk = 2, 3, 20, 16
    lk = lq
    q, k, v = _rand((b, h, lq, dk), 6), _rand((b, h, lk, dk), 7), _rand((b, h, lk, dk), 8)
    table = _rand((h, 10, dk), 9) * 0.3
    dist = jnp.asarray(
        np.random.default_rng(10).integers(0, 10, size=(b, lq, lk)), jnp.int32
    )
    scale = 1.0 / np.sqrt(dk)
    out = fused_attention(q, k, v, scale, table, dist)
    ref = _ref_attention(q, k, v, scale, table, dist)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_sbimsa_deterministic_uses_same_math_as_training_path():
    """The flax module's two branches (fused vs einsum+dropout-off) agree."""
    from tcdiff_tpu.models.dance_decoder import SBIMSA

    m = SBIMSA(n_head=2, d_model=32, dk=8, dropout=0.0)
    x = _rand((2, 10, 32), 11)
    emb = _rand((10, 16), 12)
    dist = jnp.asarray(np.random.default_rng(13).integers(0, 10, (2, 10, 10)), jnp.int32)
    params = m.init(jax.random.key(0), x, x, x, emb, dist)
    det = m.apply(params, x, x, x, emb, dist, deterministic=True)
    # dropout=0 -> the stochastic branch is deterministic too
    trn = m.apply(
        params, x, x, x, emb, dist, deterministic=False,
        rngs={"dropout": jax.random.key(1)},
    )
    np.testing.assert_allclose(np.asarray(det), np.asarray(trn), atol=2e-5)


def test_cond_cache_matches_direct_forward():
    """Hoisted cond encoding must match the inline path. Tolerance note:
    with TCDIFF_KV_BATCH (default ON) the cache's t-row k/v come from one
    stacked all-layer einsum whose XLA tiling orders f32 accumulation
    differently than the per-layer matmuls — same algebra, last-ulp float
    drift (measured max 2e-6); the bit-exact 3-tuple layout is covered by
    test_kv_cache_hoist_matches_uncached."""
    from tcdiff_tpu.config import DanceDecoderConfig, DiffusionConfig
    from tcdiff_tpu.diffusion import GaussianDiffusion
    from tcdiff_tpu.models import DanceDecoder

    cfg = DanceDecoderConfig(
        seq_len=8, latent_dim=32, ff_size=32, num_layers=1, num_heads=2,
        dancer_num=2, head_dim=16,
    )
    model = DanceDecoder(cfg)
    diff = GaussianDiffusion(model, DiffusionConfig(sampling_timesteps=2, n_timestep=10))
    tokens = cfg.seq_len * cfg.dancer_num
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, tokens, cfg.nfeats)).astype(np.float32))
    cond = jnp.asarray(rng.normal(size=(2, 2 * cfg.seq_len + 1, cfg.cond_feature_dim)).astype(np.float32))
    t = jnp.asarray([3, 7], jnp.int32)
    params = model.init(jax.random.key(0), x, cond, t)["params"]

    direct = diff.guided(params, x, cond, t, 2.0)
    cache = diff.encode_cond_cfg(params, cond)
    cached = diff.guided(params, x, cond, t, 2.0, cond_cache=cache)
    np.testing.assert_allclose(np.asarray(direct), np.asarray(cached), atol=1e-5)


def test_fused_attention_batched_matches_einsum():
    from tcdiff_tpu.ops.fused_attention import fused_attention_batched

    b, h, lq, lk, dk = 2, 4, 30, 30, 16
    q, k, v = _rand((b, h, lq, dk), 20), _rand((b, h, lk, dk), 21), _rand((b, h, lk, dk), 22)
    scale = 1.0 / np.sqrt(dk)
    out = fused_attention_batched(q, k, v, scale)
    ref = _ref_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_layernorm_matches_flax():
    import flax.linen as fnn

    from tcdiff_tpu.ops.fused_layernorm import fused_layernorm

    rng = np.random.default_rng(30)
    for rows, d in ((7, 32), (450, 512), (96, 128)):
        x = jnp.asarray(rng.normal(size=(2, rows, d)).astype(np.float32))
        scale = jnp.asarray(rng.normal(size=(d,)).astype(np.float32))
        bias = jnp.asarray(rng.normal(size=(d,)).astype(np.float32))
        ln = fnn.LayerNorm(epsilon=1e-6)
        ref = ln.apply({"params": {"scale": scale, "bias": bias}}, x)
        out = fused_layernorm(x, scale, bias, eps=1e-6)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_sbimsa_pallas_ln_env(monkeypatch):
    from tcdiff_tpu.models.dance_decoder import SBIMSA

    m = SBIMSA(n_head=2, d_model=32, dk=8, dropout=0.0)
    x = _rand((2, 10, 32), 31)
    params = m.init(jax.random.key(0), x, x, x)
    base = m.apply(params, x, x, x, deterministic=True)
    monkeypatch.setenv("TCDIFF_PALLAS_LN", "1")
    fused = m.apply(params, x, x, x, deterministic=True)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(base), atol=2e-5)


def test_kv_cache_hoist_matches_uncached(monkeypatch):
    """TCDIFF_KV_CACHE (hoisted music-token k/v) must match the
    full-memory path through the cache AND the direct forward."""
    from tcdiff_tpu.config import DanceDecoderConfig, DiffusionConfig
    from tcdiff_tpu.diffusion import GaussianDiffusion
    from tcdiff_tpu.models import DanceDecoder

    cfg = DanceDecoderConfig(
        seq_len=8, latent_dim=32, ff_size=32, num_layers=2, num_heads=2,
        dancer_num=2, head_dim=16,
    )
    model = DanceDecoder(cfg)
    diff = GaussianDiffusion(model, DiffusionConfig(sampling_timesteps=2, n_timestep=10))
    tokens = cfg.seq_len * cfg.dancer_num
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(2, tokens, cfg.nfeats)).astype(np.float32))
    cond = jnp.asarray(
        rng.normal(size=(2, 2 * cfg.seq_len + 1, cfg.cond_feature_dim)).astype(np.float32)
    )
    t = jnp.asarray([3, 7], jnp.int32)
    params = model.init(jax.random.key(0), x, cond, t)["params"]

    # this test pins the 3-tuple cache structure; the batched-kv layout
    # (TCDIFF_KV_BATCH, default ON) has its own tests below
    monkeypatch.setenv("TCDIFF_KV_BATCH", "0")
    monkeypatch.setenv("TCDIFF_KV_CACHE", "0")
    jax.clear_caches()
    cache_off = diff.encode_cond_cfg(params, cond)
    assert len(cache_off) == 2
    ref = diff.guided(params, x, cond, t, 2.0, cond_cache=cache_off)

    monkeypatch.setenv("TCDIFF_KV_CACHE", "1")
    jax.clear_caches()
    cache_on = diff.encode_cond_cfg(params, cond)
    assert len(cache_on) == 3 and len(cache_on[2]) == cfg.num_layers
    out = diff.guided(params, x, cond, t, 2.0, cond_cache=cache_on)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_kv_cache_hoist_remat_safe(monkeypatch):
    """Regression (ADVICE r2, high): default-ON TCDIFF_KV_CACHE used to
    crash sampling for remat=True models — encode_cond_cfg returned the
    3-tuple kv cache, __call__ set memory=None, but the remat layer branch
    drops kv_cache so SBIMSA saw None. Under remat the hoist must be
    skipped and guided() must still match the cache-off path exactly."""
    from tcdiff_tpu.config import DanceDecoderConfig, DiffusionConfig
    from tcdiff_tpu.diffusion import GaussianDiffusion
    from tcdiff_tpu.models import DanceDecoder

    cfg = DanceDecoderConfig(
        seq_len=8, latent_dim=32, ff_size=32, num_layers=2, num_heads=2,
        dancer_num=2, head_dim=16,
    )
    tokens = cfg.seq_len * cfg.dancer_num
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(2, tokens, cfg.nfeats)).astype(np.float32))
    cond = jnp.asarray(
        rng.normal(size=(2, 2 * cfg.seq_len + 1, cfg.cond_feature_dim)).astype(np.float32)
    )
    t = jnp.asarray([3, 7], jnp.int32)
    params = DanceDecoder(cfg).init(jax.random.key(0), x, cond, t)["params"]

    model_r = DanceDecoder(cfg, remat=True)
    diff_r = GaussianDiffusion(model_r, DiffusionConfig(sampling_timesteps=2, n_timestep=10))

    monkeypatch.setenv("TCDIFF_KV_BATCH", "0")  # pin the 3-tuple structure
    monkeypatch.setenv("TCDIFF_KV_CACHE", "0")
    jax.clear_caches()
    ref = diff_r.guided(params, x, cond, t, 2.0, cond_cache=diff_r.encode_cond_cfg(params, cond))

    monkeypatch.setenv("TCDIFF_KV_CACHE", "1")
    jax.clear_caches()
    cache_on = diff_r.encode_cond_cfg(params, cond)
    assert len(cache_on) == 2, "remat model must not produce a kv cache"
    out = diff_r.guided(params, x, cond, t, 2.0, cond_cache=cache_on)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)

    # a 3-tuple cache built by a NON-remat twin must also be safe to replay
    # through the remat model (kv part ignored, memory path used)
    diff_nr = GaussianDiffusion(
        DanceDecoder(cfg), DiffusionConfig(sampling_timesteps=2, n_timestep=10)
    )
    cache3 = diff_nr.encode_cond_cfg(params, cond)
    assert len(cache3) == 3
    out3 = diff_r.guided(params, x, cond, t, 2.0, cond_cache=cache3)
    np.testing.assert_allclose(np.asarray(out3), np.asarray(ref), atol=2e-6)


def test_cfg_dedup_matches_doubled_batch(monkeypatch):
    """TCDIFF_CFG_DEDUP (x-prefix computed once per CFG pair) must match
    the plain doubled-batch forward, with and without TRPE."""
    from tcdiff_tpu.config import DanceDecoderConfig, DiffusionConfig
    from tcdiff_tpu.diffusion import GaussianDiffusion
    from tcdiff_tpu.models import DanceDecoder

    cfg = DanceDecoderConfig(
        seq_len=8, latent_dim=32, ff_size=32, num_layers=2, num_heads=2,
        dancer_num=2, head_dim=16,
    )
    model = DanceDecoder(cfg)
    diff = GaussianDiffusion(model, DiffusionConfig(sampling_timesteps=2, n_timestep=10))
    tokens = cfg.seq_len * cfg.dancer_num
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.normal(size=(2, tokens, cfg.nfeats)).astype(np.float32))
    cond = jnp.asarray(
        rng.normal(size=(2, 2 * cfg.seq_len + 1, cfg.cond_feature_dim)).astype(np.float32)
    )
    t = jnp.asarray([3, 7], jnp.int32)
    trj = jnp.asarray(rng.integers(0, 10, (2, tokens, tokens)), jnp.int32)
    params = model.init(jax.random.key(0), x, cond, t)["params"]
    cache = diff.encode_cond_cfg(params, cond)

    monkeypatch.setenv("TCDIFF_CFG_DEDUP", "0")
    jax.clear_caches()
    ref = diff.guided(params, x, cond, t, 2.0, cond_cache=cache)
    ref_trj = diff.guided(params, x, cond, t, 2.0, trj, cond_cache=cache)

    monkeypatch.setenv("TCDIFF_CFG_DEDUP", "1")
    jax.clear_caches()
    out = diff.guided(params, x, cond, t, 2.0, cond_cache=cache)
    out_trj = diff.guided(params, x, cond, t, 2.0, trj, cond_cache=cache)
    # same dot products per row, but XLA compiles the b and 2b graphs
    # with different accumulation schedules -> fp-reassociation tolerance
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5, rtol=5e-5)
    np.testing.assert_allclose(np.asarray(out_trj), np.asarray(ref_trj), atol=5e-5, rtol=5e-5)


def test_kv_batch_matches_per_layer(monkeypatch):
    """TCDIFF_KV_BATCH (all-layer batched t-row k/v projection) must match
    the per-layer projection path exactly — same math, one stacked einsum."""
    from tcdiff_tpu.config import DanceDecoderConfig, DiffusionConfig
    from tcdiff_tpu.diffusion import GaussianDiffusion
    from tcdiff_tpu.models import DanceDecoder

    cfg = DanceDecoderConfig(
        seq_len=8, latent_dim=32, ff_size=32, num_layers=2, num_heads=2,
        dancer_num=2, head_dim=16,
    )
    model = DanceDecoder(cfg)
    diff = GaussianDiffusion(model, DiffusionConfig(sampling_timesteps=2, n_timestep=10))
    tokens = cfg.seq_len * cfg.dancer_num
    rng = np.random.default_rng(17)
    x = jnp.asarray(rng.normal(size=(2, tokens, cfg.nfeats)).astype(np.float32))
    cond = jnp.asarray(
        rng.normal(size=(2, 2 * cfg.seq_len + 1, cfg.cond_feature_dim)).astype(np.float32)
    )
    t = jnp.asarray([3, 7], jnp.int32)
    params = model.init(jax.random.key(0), x, cond, t)["params"]

    monkeypatch.setenv("TCDIFF_KV_CACHE", "1")
    monkeypatch.setenv("TCDIFF_KV_BATCH", "0")
    jax.clear_caches()
    cache_off = diff.encode_cond_cfg(params, cond)
    assert len(cache_off) == 3
    ref = diff.guided(params, x, cond, t, 2.0, cond_cache=cache_off)

    monkeypatch.setenv("TCDIFF_KV_BATCH", "1")
    jax.clear_caches()
    cache_on = diff.encode_cond_cfg(params, cond)
    assert len(cache_on) == 4 and cache_on[3][0].shape[0] == cfg.num_layers
    out = diff.guided(params, x, cond, t, 2.0, cond_cache=cache_on)
    # the stacked einsum reassociates the (d) contraction — pure
    # accumulation-order noise
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_kv_batch_full_sampler_matches(monkeypatch):
    """The 4-tuple cache must flow through the jitted DDIM scan unchanged."""
    from tcdiff_tpu.config import DanceDecoderConfig, DiffusionConfig
    from tcdiff_tpu.diffusion import GaussianDiffusion
    from tcdiff_tpu.models import DanceDecoder

    cfg = DanceDecoderConfig(
        seq_len=8, latent_dim=32, ff_size=32, num_layers=2, num_heads=2,
        dancer_num=2, head_dim=16,
    )
    model = DanceDecoder(cfg)
    diff = GaussianDiffusion(model, DiffusionConfig(sampling_timesteps=3, n_timestep=10))
    rng = np.random.default_rng(23)
    cond = jnp.asarray(
        rng.normal(size=(1, 2 * cfg.seq_len + 1, cfg.cond_feature_dim)).astype(np.float32)
    )
    shape = (1, cfg.seq_len * cfg.dancer_num, cfg.nfeats)
    x0 = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    params = model.init(
        jax.random.key(0), x0, cond, jnp.zeros((1,), jnp.int32)
    )["params"]

    monkeypatch.setenv("TCDIFF_KV_CACHE", "1")
    monkeypatch.setenv("TCDIFF_KV_BATCH", "0")
    jax.clear_caches()
    ref = diff.ddim_sample(params, shape, cond, jax.random.key(3))
    monkeypatch.setenv("TCDIFF_KV_BATCH", "1")
    jax.clear_caches()
    out = diff.ddim_sample(params, shape, cond, jax.random.key(3))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-6)
