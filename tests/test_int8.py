"""Int8 quantized serving path (TCDIFF_INT8=1, ops/int8.py).

The reference has no quantized path (fp32 matmuls throughout,
`/root/reference/model/model.py:54-107`); this is a TPU-native serving
feature (v5e int8 MXU peak is 2x bf16). Quantization changes numerics by
design, so the contract tested here is: bounded relative error vs the
exact forward, unchanged parameter tree (checkpoint interop), and an
untouched training path.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tcdiff_tpu.config import DanceDecoderConfig
from tcdiff_tpu.models import DanceDecoder
from tcdiff_tpu.ops.int8 import int8_dense, quantize_weight


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


def test_quantize_weight_roundtrip():
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.normal(size=(128, 64)).astype(np.float32))
    wq, scale = quantize_weight(w)
    assert wq.dtype == jnp.int8
    back = np.asarray(wq, np.float32) * np.asarray(scale)
    # symmetric per-channel int8: max abs error is half a step per channel
    step = np.asarray(scale)
    assert np.all(np.abs(back - np.asarray(w)) <= 0.5 * step + 1e-7)


def test_int8_dense_accuracy():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(64, 512)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(512, 256)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(256,)).astype(np.float32))
    exact = x @ w + b
    quant = int8_dense(x, w, b)
    rel = np.linalg.norm(np.asarray(quant - exact)) / np.linalg.norm(np.asarray(exact))
    # dynamic per-token + per-channel symmetric int8 on gaussian data:
    # expected relative error ~0.5%; assert an order-of-magnitude bound
    assert rel < 0.02, rel


def test_int8_dense_no_bias_dtype():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(8, 32)).astype(np.float32)).astype(jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(32, 16)).astype(np.float32))
    y = int8_dense(x, w)
    assert y.dtype == jnp.bfloat16
    assert y.shape == (8, 16)


def test_int8_forward_bounded_error(env):
    model, params, io = _model_io()
    env.setenv("TCDIFF_INT8", "0")
    ref = model.apply({"params": params}, *io)
    env.setenv("TCDIFF_INT8", "1")
    jax.clear_caches()  # flags are read at trace time
    out = model.apply({"params": params}, *io)
    ref, out = np.asarray(ref), np.asarray(out)
    rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
    assert rel > 0, "int8 path not taken (outputs bit-identical)"
    assert rel < 0.05, rel


def test_int8_param_tree_unchanged(env):
    env.setenv("TCDIFF_INT8", "1")
    jax.clear_caches()
    model, params_q, _ = _model_io()
    env.setenv("TCDIFF_INT8", "0")
    jax.clear_caches()
    _, params_f, _ = _model_io()
    tq = jax.tree.map(lambda a: (a.shape, a.dtype), params_q)
    tf = jax.tree.map(lambda a: (a.shape, a.dtype), params_f)
    assert jax.tree.structure(tq) == jax.tree.structure(tf)
    assert jax.tree.leaves(tq) == jax.tree.leaves(tf)


def test_int8_training_path_untouched(env):
    """deterministic=False (training) must not quantize even with the flag."""
    model, params, (x, cond, t) = _model_io()
    rngs = {"dropout": jax.random.key(1)}
    env.setenv("TCDIFF_INT8", "0")
    ref = model.apply({"params": params}, x, cond, t, deterministic=False, rngs=rngs)
    env.setenv("TCDIFF_INT8", "1")
    jax.clear_caches()
    out = model.apply({"params": params}, x, cond, t, deterministic=False, rngs=rngs)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_int8_takes_precedence_over_block_kernel_defaults(env):
    """Regression (ADVICE r2, low): TCDIFF_INT8=1 must not be silently
    shadowed by the default-ON SAB/FFB/FFT block kernels — with int8 on
    and no explicit block flags, the TPU defaults fall back to OFF; an
    explicit =1 wins but emits a one-time warning."""
    import warnings

    from tcdiff_tpu.models.dance_decoder import (
        _WARNED_INT8_SHADOW,
        _use_ffb_tail,
        _use_pallas_ffb,
        _use_pallas_sab,
    )

    env.setenv("TCDIFF_INT8", "1")
    for var in ("TCDIFF_PALLAS_SAB", "TCDIFF_PALLAS_FFB", "TCDIFF_PALLAS_FFT"):
        env.delenv(var, raising=False)
    assert not _use_pallas_sab()
    assert not _use_pallas_ffb()
    assert not _use_ffb_tail()

    _WARNED_INT8_SHADOW.clear()
    env.setenv("TCDIFF_PALLAS_SAB", "1")
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        assert _use_pallas_sab()
    assert any("int8" in str(w.message).lower() for w in rec)
    # one-time only
    with warnings.catch_warnings(record=True) as rec2:
        warnings.simplefilter("always")
        assert _use_pallas_sab()
    assert not rec2
