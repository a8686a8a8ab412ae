"""Int8 quantized dense projections for TPU serving.

The reference serves the denoiser in full precision (fp32 matmuls,
`/root/reference/model/model.py:54-107,308-343`); there is no quantized
path to mirror. This module is a TPU-native serving feature: the v5e MXU
has 2x int8 peak over bf16 (394 TOPS vs 197 TFLOPS), and the sampler is
compute-bound with ~40% of device time in dense projections
(BENCH_NOTES.md), so routing the hot projections through int8 buys up to
~1.25x end-to-end.

Scheme (standard dynamic activation quantization, AQT-style):
  * weights: symmetric per-output-channel int8 — scale_j = max_i|W_ij|/127.
    Quantization happens inside the jitted forward. The weights are
    loop-invariant in the sampling `lax.scan`; whether or not XLA's LICM
    hoists the quantize step out of the loop, its cost (~3 elementwise ops
    per weight element) is ~1% of the matmul it feeds, so the win does not
    depend on hoisting.
  * activations: symmetric dynamic per-token int8 — scale_t = max_j|x_tj|/127.
  * matmul: int8 x int8 -> int32 accumulation on the MXU
    (`lax.dot_general(..., preferred_element_type=int32)`), dequantized by
    the rank-1 outer product of the two scale vectors.

Opt-in via TCDIFF_INT8=1, deterministic (serving) path only — training and
the default sampler stay exact. Changes numerics: validate generation
quality (eval/metrics.py) before production use.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def use_int8() -> bool:
    return os.environ.get("TCDIFF_INT8", "0") == "1"


def quantize_weight(w: jnp.ndarray):
    """Symmetric per-output-channel int8. w: (d_in, d_out) -> (int8 w, (d_out,) f32 scale)."""
    w = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=0)  # (d_out,)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    wq = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return wq, scale


def _quantize_act(x: jnp.ndarray):
    """Symmetric dynamic per-token int8. x: (..., d_in) -> (int8 x, (...,) f32 scale)."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)  # (...,)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(xf / scale[..., None]), -127, 127).astype(jnp.int8)
    return xq, scale


def int8_dense(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray | None = None,
               out_dtype=None):
    """y = x @ kernel (+ bias) with int8 MXU accumulation.

    x: (..., d_in) activations (any float dtype); kernel: (d_in, d_out)
    float weights (quantized here — loop-invariant, hoisted by XLA's LICM
    out of sampling scans); bias: (d_out,) or None. Returns x.dtype (or
    out_dtype) with f32 dequantization applied.
    """
    out_dtype = out_dtype or x.dtype
    wq, sw = quantize_weight(kernel)
    xq, sx = _quantize_act(x)
    acc = jax.lax.dot_general(
        xq, wq,
        dimension_numbers=(((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * (sx[..., None] * sw)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)
