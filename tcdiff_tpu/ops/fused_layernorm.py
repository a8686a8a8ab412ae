"""Pallas TPU kernel: fused LayerNorm.

Profile-driven (BENCH_NOTES.md): the sampler spends ~19% of device time in
8 `convert_reduce` fusions — the f32 mean/variance reductions of the
SBI-MSA LayerNorms over [b*tokens, 512]. XLA materializes the converted
stats pair before a separate normalize fusion; this kernel does
read-bf16 -> f32 stats -> normalize -> scale/shift -> write-bf16 in ONE
VMEM-resident pass over large row blocks (coarse grid, per the
fused-attention lesson).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _ln_kernel(x_ref, scale_ref, bias_ref, o_ref, *, eps):
    x = x_ref[:].astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(x * x, axis=-1, keepdims=True) - mu * mu
    y = (x - mu) * jax.lax.rsqrt(var + eps)
    y = y * scale_ref[:].astype(jnp.float32) + bias_ref[:].astype(jnp.float32)
    o_ref[:] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps",))
def fused_layernorm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray, eps: float = 1e-6):
    """LayerNorm over the last dim. x: (..., d); scale/bias: (d,)."""
    orig_shape = x.shape
    d = orig_shape[-1]
    rows = 1
    for s in orig_shape[:-1]:
        rows *= s
    x2 = x.reshape(rows, d)

    # coarse grid: big row blocks, bounded by VMEM (in+out+f32 temp)
    block = rows
    max_rows = max(256, (8 * 1024 * 1024) // (d * 8))
    while block > max_rows or rows % block != 0:
        # largest divisor of rows not exceeding max_rows
        block -= 1
    grid = (rows // block,)

    out = pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, d), x.dtype),
        interpret=_interpret(),
    )(x2, scale, bias)
    return out.reshape(orig_shape)
