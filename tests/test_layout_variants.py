"""Layout-variant equivalence: the profile-targeted reformulations
(BENCH_NOTES.md buckets) must not change the math.

  * TCDIFF_ROTARY=roll vs pair — bit-identical (multiplying by the ±1 sign
    vector is exact in IEEE, everything else is the same ops).
  * TCDIFF_FUSION=einsum vs dense — same dot products, dancer-blocked
    partial sums (fp tolerance).
  * TCDIFF_LN_BF16 — opt-in numerics change; asserted to be a NO-OP in f32
    and within bf16 tolerance of the f32-stats path in bf16.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tcdiff_tpu.config import DanceDecoderConfig
from tcdiff_tpu.models import DanceDecoder
from tcdiff_tpu.models.rotary import apply_rotary, rotary_freqs


@pytest.fixture
def env(monkeypatch):
    return monkeypatch


def _model_io(dancers=3, seq=16):
    cfg = DanceDecoderConfig(
        seq_len=seq, latent_dim=64, ff_size=64, num_layers=2, num_heads=4,
        cond_feature_dim=24, dancer_num=dancers, head_dim=16,
    )
    model = DanceDecoder(cfg)
    tokens = seq * dancers
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, tokens, cfg.nfeats)).astype(np.float32))
    cond = jnp.asarray(rng.normal(size=(2, 2 * seq + 1, 24)).astype(np.float32))
    t = jnp.asarray([3, 7], dtype=jnp.int32)
    params = model.init(jax.random.key(0), x, cond, t)["params"]
    return model, params, (x, cond, t)


def test_rotary_roll_bitwise_equals_pair(env):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 150, 512)).astype(np.float32))
    angles = jnp.asarray(rotary_freqs(150, 512))
    env.setenv("TCDIFF_ROTARY", "pair")
    ref = apply_rotary(x, angles)
    env.setenv("TCDIFF_ROTARY", "roll")
    out = apply_rotary(x, angles)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_rotary_roll_bitwise_equals_pair_bf16(env):
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 64, 128)).astype(np.float32)).astype(jnp.bfloat16)
    angles = jnp.asarray(rotary_freqs(64, 128))
    env.setenv("TCDIFF_ROTARY", "pair")
    ref = apply_rotary(x, angles)
    env.setenv("TCDIFF_ROTARY", "roll")
    out = apply_rotary(x, angles)
    np.testing.assert_array_equal(
        np.asarray(out, dtype=np.float32), np.asarray(ref, dtype=np.float32)
    )


def test_fusion_einsum_matches_dense(env):
    model, params, io = _model_io()
    env.setenv("TCDIFF_FUSION", "dense")
    ref = model.apply({"params": params}, *io)
    env.setenv("TCDIFF_FUSION", "einsum")
    jax.clear_caches()  # flags are read at trace time
    out = model.apply({"params": params}, *io)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_fusion_einsum_param_tree_unchanged(env):
    """Both paths must produce the same parameter structure so checkpoints
    are interchangeable."""
    env.setenv("TCDIFF_FUSION", "einsum")
    jax.clear_caches()
    model, params_e, io = _model_io()
    env.setenv("TCDIFF_FUSION", "dense")
    jax.clear_caches()
    model2, params_d, _ = _model_io()
    td = jax.tree.map(lambda a: (a.shape, a.dtype), params_d)
    te = jax.tree.map(lambda a: (a.shape, a.dtype), params_e)
    assert jax.tree.structure(td) == jax.tree.structure(te)
    assert jax.tree.leaves(td) == jax.tree.leaves(te)


def test_ln_bf16_flag_is_noop_in_f32(env):
    model, params, io = _model_io()
    env.setenv("TCDIFF_LN_BF16", "0")
    ref = model.apply({"params": params}, *io)
    env.setenv("TCDIFF_LN_BF16", "1")
    jax.clear_caches()
    out = model.apply({"params": params}, *io)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_ln_bf16_close_in_bf16(env):
    cfg = DanceDecoderConfig(
        seq_len=16, latent_dim=64, ff_size=64, num_layers=2, num_heads=4,
        cond_feature_dim=24, dancer_num=2, head_dim=16,
    )
    rng = np.random.default_rng(3)
    tokens = 32
    x = jnp.asarray(rng.normal(size=(2, tokens, cfg.nfeats)).astype(np.float32))
    cond = jnp.asarray(rng.normal(size=(2, 33, 24)).astype(np.float32))
    t = jnp.asarray([3, 7], dtype=jnp.int32)
    model = DanceDecoder(cfg, dtype=jnp.bfloat16)
    params = model.init(jax.random.key(0), x, cond, t)["params"]
    env.setenv("TCDIFF_LN_BF16", "0")
    ref = model.apply({"params": params}, x, cond, t)
    env.setenv("TCDIFF_LN_BF16", "1")
    jax.clear_caches()
    out = model.apply({"params": params}, x, cond, t)
    # bf16 stats over 512 channels: expect agreement to bf16 resolution
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=0.05, rtol=0.05)


def test_pallas_lnmm_matches_flax(env):
    """TCDIFF_PALLAS_LNMM=1 (fused LN->projection) must match the flax path
    to dot-accumulation tolerance, sharing the same param tree."""
    model, params, io = _model_io()
    env.setenv("TCDIFF_PALLAS_LNMM", "0")
    ref = model.apply({"params": params}, *io)
    env.setenv("TCDIFF_PALLAS_LNMM", "1")
    jax.clear_caches()
    out = model.apply({"params": params}, *io)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5, rtol=3e-5)


def test_pallas_lnmm_param_tree_unchanged(env):
    env.setenv("TCDIFF_PALLAS_LNMM", "1")
    jax.clear_caches()
    model, params_p, _ = _model_io()
    env.setenv("TCDIFF_PALLAS_LNMM", "0")
    jax.clear_caches()
    _, params_f, _ = _model_io()
    tp = jax.tree.map(lambda a: (a.shape, a.dtype), params_p)
    tf = jax.tree.map(lambda a: (a.shape, a.dtype), params_f)
    assert jax.tree.structure(tp) == jax.tree.structure(tf)
    assert jax.tree.leaves(tp) == jax.tree.leaves(tf)


def test_pallas_lnrot_matches_flax(env):
    """TCDIFF_PALLAS_LNROT=1 (fused LN->rotary->q/k/v) must match the flax
    path to dot-accumulation tolerance, sharing the same param tree."""
    model, params, io = _model_io()
    env.setenv("TCDIFF_PALLAS_LNROT", "0")
    ref = model.apply({"params": params}, *io)
    env.setenv("TCDIFF_PALLAS_LNROT", "1")
    jax.clear_caches()
    out = model.apply({"params": params}, *io)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5, rtol=3e-5)


def test_pallas_lnrot_with_trpe_matches_flax(env):
    """The fused projections must feed the TRPE gather-bias path unchanged."""
    model, params, (x, cond, t) = _model_io()
    tokens = x.shape[1]
    rng = np.random.default_rng(7)
    trj = jnp.asarray(rng.integers(0, 10, size=(2, tokens, tokens)), jnp.int32)
    env.setenv("TCDIFF_PALLAS_LNROT", "0")
    ref = model.apply({"params": params}, x, cond, t, None, trj)
    env.setenv("TCDIFF_PALLAS_LNROT", "1")
    jax.clear_caches()
    out = model.apply({"params": params}, x, cond, t, None, trj)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5, rtol=3e-5)


def test_pallas_sab_matches_flax(env):
    """TCDIFF_PALLAS_SAB=1 (whole self-attention block in one program) must
    match the flax path to dot-accumulation tolerance."""
    model, params, io = _model_io()
    env.setenv("TCDIFF_PALLAS_SAB", "0")
    ref = model.apply({"params": params}, *io)
    env.setenv("TCDIFF_PALLAS_SAB", "1")
    jax.clear_caches()
    out = model.apply({"params": params}, *io)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5, rtol=3e-5)


def test_pallas_sab_with_trpe_matches_flax(env):
    """The in-kernel TRPE predicated-add bias must match the gather path."""
    model, params, (x, cond, t) = _model_io()
    tokens = x.shape[1]
    rng = np.random.default_rng(11)
    trj = jnp.asarray(rng.integers(0, 10, size=(2, tokens, tokens)), jnp.int32)
    env.setenv("TCDIFF_PALLAS_SAB", "0")
    ref = model.apply({"params": params}, x, cond, t, None, trj)
    env.setenv("TCDIFF_PALLAS_SAB", "1")
    jax.clear_caches()
    out = model.apply({"params": params}, x, cond, t, None, trj)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5, rtol=3e-5)


def test_pallas_sab_batched2_matches_flax(env):
    """TCDIFF_SAB_BATCHED2 (no-reshape batched-heads layout: weights
    pre-shaped outside, batch-leading dot_generals + per-head out-proj sum)
    must match the flax path, with and without TRPE, and with exp2
    softmax."""
    model, params, (x, cond, t) = _model_io()
    tokens = x.shape[1]
    rng = np.random.default_rng(12)
    trj = jnp.asarray(rng.integers(0, 10, size=(2, tokens, tokens)), jnp.int32)
    env.setenv("TCDIFF_PALLAS_SAB", "0")
    ref = model.apply({"params": params}, *(x, cond, t))
    ref_trj = model.apply({"params": params}, x, cond, t, None, trj)
    env.setenv("TCDIFF_PALLAS_SAB", "1")
    env.setenv("TCDIFF_SAB_BATCHED2", "1")
    jax.clear_caches()
    out = model.apply({"params": params}, *(x, cond, t))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5, rtol=3e-5)
    out_trj = model.apply({"params": params}, x, cond, t, None, trj)
    np.testing.assert_allclose(np.asarray(out_trj), np.asarray(ref_trj), atol=3e-5, rtol=3e-5)
    env.setenv("TCDIFF_SAB_EXP2", "1")
    jax.clear_caches()
    out2 = model.apply({"params": params}, *(x, cond, t))
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref), atol=3e-5, rtol=3e-5)


def test_pallas_sab_exp2_matches_flax(env):
    """exp2 softmax on the DEFAULT sliced-head layout."""
    model, params, io = _model_io()
    env.setenv("TCDIFF_PALLAS_SAB", "0")
    ref = model.apply({"params": params}, *io)
    env.setenv("TCDIFF_PALLAS_SAB", "1")
    env.setenv("TCDIFF_SAB_EXP2", "1")
    jax.clear_caches()
    out = model.apply({"params": params}, *io)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5, rtol=3e-5)


def test_pallas_sab_param_tree_unchanged(env):
    env.setenv("TCDIFF_PALLAS_SAB", "1")
    jax.clear_caches()
    model, params_p, _ = _model_io()
    env.setenv("TCDIFF_PALLAS_SAB", "0")
    jax.clear_caches()
    _, params_f, _ = _model_io()
    tp = jax.tree.map(lambda a: (a.shape, a.dtype), params_p)
    tf = jax.tree.map(lambda a: (a.shape, a.dtype), params_f)
    assert jax.tree.structure(tp) == jax.tree.structure(tf)
    assert jax.tree.leaves(tp) == jax.tree.leaves(tf)


def test_pallas_ffb_matches_flax(env):
    """TCDIFF_PALLAS_FFB=1 (whole FF block in one program) must match the
    flax path to dot-accumulation tolerance."""
    model, params, io = _model_io()
    env.setenv("TCDIFF_PALLAS_FFB", "0")
    ref = model.apply({"params": params}, *io)
    env.setenv("TCDIFF_PALLAS_FFB", "1")
    jax.clear_caches()
    out = model.apply({"params": params}, *io)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5, rtol=3e-5)


def test_pallas_ffb_param_tree_unchanged(env):
    env.setenv("TCDIFF_PALLAS_FFB", "1")
    jax.clear_caches()
    model, params_p, _ = _model_io()
    env.setenv("TCDIFF_PALLAS_FFB", "0")
    jax.clear_caches()
    _, params_f, _ = _model_io()
    tp = jax.tree.map(lambda a: (a.shape, a.dtype), params_p)
    tf = jax.tree.map(lambda a: (a.shape, a.dtype), params_f)
    assert jax.tree.structure(tp) == jax.tree.structure(tf)
    assert jax.tree.leaves(tp) == jax.tree.leaves(tf)


def test_pallas_fusion_stack_matches_flax(env):
    """All block-fusion flags together (SAB + FFB + LNROT cross-attn +
    LNMM linear3) must still match the flax path."""
    model, params, io = _model_io()
    flags = ("TCDIFF_PALLAS_SAB", "TCDIFF_PALLAS_FFB", "TCDIFF_PALLAS_XAB",
             "TCDIFF_PALLAS_LNROT", "TCDIFF_PALLAS_LNMM")
    for f in flags:
        env.setenv(f, "0")
    ref = model.apply({"params": params}, *io)
    for f in flags:
        env.setenv(f, "1")
    jax.clear_caches()
    out = model.apply({"params": params}, *io)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5, rtol=5e-5)


def test_pallas_xab_matches_flax(env):
    """TCDIFF_PALLAS_XAB=1 (whole cross-attention block in one program)
    must match the flax path to dot-accumulation tolerance."""
    model, params, io = _model_io()
    env.setenv("TCDIFF_PALLAS_XAB", "0")
    ref = model.apply({"params": params}, *io)
    env.setenv("TCDIFF_PALLAS_XAB", "1")
    jax.clear_caches()
    out = model.apply({"params": params}, *io)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5, rtol=3e-5)


def test_pallas_xab_param_tree_unchanged(env):
    env.setenv("TCDIFF_PALLAS_XAB", "1")
    jax.clear_caches()
    model, params_p, _ = _model_io()
    env.setenv("TCDIFF_PALLAS_XAB", "0")
    jax.clear_caches()
    _, params_f, _ = _model_io()
    tp = jax.tree.map(lambda a: (a.shape, a.dtype), params_p)
    tf = jax.tree.map(lambda a: (a.shape, a.dtype), params_f)
    assert jax.tree.structure(tp) == jax.tree.structure(tf)
    assert jax.tree.leaves(tp) == jax.tree.leaves(tf)


def test_fuse_film_matches_flax(env):
    """TCDIFF_FUSE_FILM=1 (residual+FiLM folded into the block kernels)
    must match the flax path, with and without TRPE."""
    model, params, (x, cond, t) = _model_io()
    for f in ("TCDIFF_PALLAS_SAB", "TCDIFF_PALLAS_FFB", "TCDIFF_PALLAS_XAB"):
        env.setenv(f, "0")
    env.setenv("TCDIFF_FUSE_FILM", "0")
    ref = model.apply({"params": params}, x, cond, t)
    for f in ("TCDIFF_PALLAS_SAB", "TCDIFF_PALLAS_FFB", "TCDIFF_PALLAS_XAB"):
        env.setenv(f, "1")
    env.setenv("TCDIFF_FUSE_FILM", "1")
    jax.clear_caches()
    out = model.apply({"params": params}, x, cond, t)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5, rtol=5e-5)
    tokens = x.shape[1]
    rng = np.random.default_rng(13)
    trj = jnp.asarray(rng.integers(0, 10, size=(2, tokens, tokens)), jnp.int32)
    out_t = model.apply({"params": params}, x, cond, t, None, trj)
    for f in ("TCDIFF_PALLAS_SAB", "TCDIFF_PALLAS_FFB", "TCDIFF_PALLAS_XAB"):
        env.setenv(f, "0")
    env.setenv("TCDIFF_FUSE_FILM", "0")
    jax.clear_caches()
    ref_t = model.apply({"params": params}, x, cond, t, None, trj)
    np.testing.assert_allclose(np.asarray(out_t), np.asarray(ref_t), atol=5e-5, rtol=5e-5)


def test_fuse_film_param_tree_unchanged(env):
    for f in ("TCDIFF_PALLAS_SAB", "TCDIFF_PALLAS_FFB", "TCDIFF_PALLAS_XAB",
              "TCDIFF_FUSE_FILM"):
        env.setenv(f, "1")
    jax.clear_caches()
    model, params_p, _ = _model_io()
    for f in ("TCDIFF_PALLAS_SAB", "TCDIFF_PALLAS_FFB", "TCDIFF_PALLAS_XAB",
              "TCDIFF_FUSE_FILM"):
        env.setenv(f, "0")
    jax.clear_caches()
    _, params_f, _ = _model_io()
    tp = jax.tree.map(lambda a: (a.shape, a.dtype), params_p)
    tf = jax.tree.map(lambda a: (a.shape, a.dtype), params_f)
    assert jax.tree.structure(tp) == jax.tree.structure(tf)
    assert jax.tree.leaves(tp) == jax.tree.leaves(tf)


def test_pallas_lnrot_param_tree_unchanged(env):
    env.setenv("TCDIFF_PALLAS_LNROT", "1")
    jax.clear_caches()
    model, params_p, _ = _model_io()
    env.setenv("TCDIFF_PALLAS_LNROT", "0")
    jax.clear_caches()
    _, params_f, _ = _model_io()
    tp = jax.tree.map(lambda a: (a.shape, a.dtype), params_p)
    tf = jax.tree.map(lambda a: (a.shape, a.dtype), params_f)
    assert jax.tree.structure(tp) == jax.tree.structure(tf)
    assert jax.tree.leaves(tp) == jax.tree.leaves(tf)


def test_pallas_ffb_tail_matches_flax(env):
    """TCDIFF_PALLAS_FFT=1 (FF block + residual/FiLM + linear3(norm4) in
    one program) must match the flax path."""
    model, params, io = _model_io()
    for f in ("TCDIFF_PALLAS_FFB", "TCDIFF_PALLAS_FFT"):
        env.setenv(f, "0")
    ref = model.apply({"params": params}, *io)
    for f in ("TCDIFF_PALLAS_FFB", "TCDIFF_PALLAS_FFT"):
        env.setenv(f, "1")
    jax.clear_caches()
    out = model.apply({"params": params}, *io)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5, rtol=5e-5)


def test_pallas_ffb_tail_param_tree_unchanged(env):
    for f in ("TCDIFF_PALLAS_FFB", "TCDIFF_PALLAS_FFT"):
        env.setenv(f, "1")
    jax.clear_caches()
    model, params_p, _ = _model_io()
    for f in ("TCDIFF_PALLAS_FFB", "TCDIFF_PALLAS_FFT"):
        env.setenv(f, "0")
    jax.clear_caches()
    _, params_f, _ = _model_io()
    tp = jax.tree.map(lambda a: (a.shape, a.dtype), params_p)
    tf = jax.tree.map(lambda a: (a.shape, a.dtype), params_f)
    assert jax.tree.structure(tp) == jax.tree.structure(tf)
    assert jax.tree.leaves(tp) == jax.tree.leaves(tf)
