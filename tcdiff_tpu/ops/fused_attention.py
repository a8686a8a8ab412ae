"""Pallas TPU kernel: fused attention for the SBI-MSA block.

The hot op of the denoiser (`model/model.py:54-107` in the reference): per
(batch, head), logits = (q*scale) @ k^T [+ trajectory-relative-position
bias], softmax, @ v. Sequence lengths here are short (tokens = seq*dancers
<= 1500, dk = 64), so one grid program owns a whole (lq, dk) head: q, k, v
and the (lq, lk) logits all live in VMEM — the fusion saves the two HBM
round-trips XLA would spend materializing logits and softmax outputs.

The TRPE bias is the reference's gather over an embedding-indexed matrix:
bias[i, j] = (q[i] . table[trj_dist[i, j]]). Gathers don't vectorize on the
VPU, so the kernel contracts q against ALL 10 table rows (an MXU matmul,
(lq, dk) @ (dk, 10)) and selects per-element with 10 predicated adds —
branch-free and lane-parallel.

Used in the inference paths (samplers); training keeps the XLA einsum path
(same math) so autodiff needs no custom VJP.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_TRJ_BUCKETS = 10  # embeddings_table rows (`model/model.py:532`)


def _interpret() -> bool:
    # Mosaic compiles only for TPU; on the CPU test mesh run interpreted
    return jax.default_backend() != "tpu"


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale):
    # matmuls run at the inputs' native dtype (bf16 inputs = full-rate MXU)
    # with float32 accumulation; softmax stays in float32
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    logits = jax.lax.dot_general(
        q * jnp.asarray(scale, q.dtype), k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(v.dtype)
    o_ref[0, 0] = jnp.dot(
        p, v, preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def _attn_bias_kernel(q_ref, k_ref, v_ref, table_ref, dist_ref, o_ref, *, scale):
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    logits = jax.lax.dot_general(
        q * jnp.asarray(scale, q.dtype), k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # (lq, 10): q (UNSCALED, reference quirk) against every bucket embedding
    indexed = jax.lax.dot_general(
        q, table_ref[0].astype(q.dtype), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dist = dist_ref[0]
    for n in range(N_TRJ_BUCKETS):  # static unroll: predicated adds, no gather
        logits = logits + jnp.where(dist == n, indexed[:, n : n + 1], 0.0)
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(v.dtype)
    o_ref[0, 0] = jnp.dot(p, v, preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _attn_kernel_allheads(q_ref, k_ref, v_ref, o_ref, *, scale):
    """Coarse-grid variant: one program per BATCH element, heads batched
    inside (b*h tiny programs under-utilize the scalar core; see
    BENCH_NOTES.md)."""
    q = q_ref[0]  # (h, lq, dk)
    k = k_ref[0]
    v = v_ref[0]
    logits = jax.lax.dot_general(
        q * jnp.asarray(scale, q.dtype), k,
        (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32,
    )  # (h, lq, lk)
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(v.dtype)
    o_ref[0] = jax.lax.dot_general(
        p, v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale",))
def fused_attention_batched(q, k, v, scale):
    """Grid=(b,) all-heads-per-program variant (no TRPE bias)."""
    b, h, lq, dk = q.shape
    lk = k.shape[2]
    dv = v.shape[3]

    def ix(i):
        return (i, 0, 0, 0)

    return pl.pallas_call(
        functools.partial(_attn_kernel_allheads, scale=scale),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, lq, dk), ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, lk, dk), ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, lk, dv), ix, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, lq, dv), ix, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, lq, dv), q.dtype),
        interpret=_interpret(),
    )(q, k, v)


@functools.partial(jax.jit, static_argnames=("scale",))
def fused_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    table: Optional[jnp.ndarray] = None,
    trj_dist: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """q, k: (b, h, lq/lk, dk); v: (b, h, lk, dv). Returns (b, h, lq, dv).

    With `table` ((h, n_buckets, dk) bucket embeddings) and `trj_dist`
    ((b, lq, lk) int32 bucket ids), adds the TRPE bias before softmax.
    """
    b, h, lq, dk = q.shape
    lk = k.shape[2]
    dv = v.shape[3]
    grid = (b, h)

    def ix(i, j):
        return (i, j, 0, 0)

    qkv_specs = [
        pl.BlockSpec((1, 1, lq, dk), ix, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, lk, dk), ix, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, lk, dv), ix, memory_space=pltpu.VMEM),
    ]
    out_spec = pl.BlockSpec((1, 1, lq, dv), ix, memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((b, h, lq, dv), q.dtype)
    cost = pl.CostEstimate(
        flops=2 * lq * lk * (dk + dv) + (0 if table is None else 2 * lq * dk * N_TRJ_BUCKETS),
        bytes_accessed=4 * (lq * dk + lk * dk + lk * dv + lq * dv + lq * lk),
        transcendentals=lq * lk,
    )

    if table is None:
        return pl.pallas_call(
            functools.partial(_attn_kernel, scale=scale),
            grid=grid,
            in_specs=qkv_specs,
            out_specs=out_spec,
            out_shape=out_shape,
            cost_estimate=cost,
            interpret=_interpret(),
        )(q, k, v)

    specs = qkv_specs + [
        # per-head bucket table, replicated over batch
        pl.BlockSpec(
            (1, N_TRJ_BUCKETS, dk), lambda i, j: (j, 0, 0), memory_space=pltpu.VMEM
        ),
        # per-batch distances, replicated over heads
        pl.BlockSpec((1, lq, lk), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
    ]
    return pl.pallas_call(
        functools.partial(_attn_bias_kernel, scale=scale),
        grid=grid,
        in_specs=specs,
        out_specs=out_spec,
        out_shape=out_shape,
        cost_estimate=cost,
        interpret=_interpret(),
    )(q, k, v, table, trj_dist)
