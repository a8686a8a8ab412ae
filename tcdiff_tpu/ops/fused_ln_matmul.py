"""Pallas TPU kernel: LayerNorm fused INTO the following projection.

Round-1/2 lesson (BENCH_NOTES.md): op-local kernels (attention, LN alone)
lose to XLA's global fusion because the pallas_call boundary breaks the
surrounding elementwise fusions. This kernel moves the boundary to a place
where fusion was NOT happening anyway — the matmul edge: it reads the
residual-stream block once, computes the f32 LN statistics in VMEM, and
feeds the normalized rows straight into the MXU projection without ever
writing the normalized activations to HBM. Targets the decoder layer's
norm3->linear1 and norm4->linear3 sites (`/root/reference/model/model.py:
336-344` dataflow), the two LN->Dense pairs whose parameters live in the
same module scope. Opt-in via TCDIFF_PALLAS_LNMM=1, inference path only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    # Mosaic compiles only for TPU; on the CPU test mesh run interpreted
    return jax.default_backend() != "tpu"


def _lnmm_kernel(x_ref, scale_ref, bias_ref, w_ref, b_ref, o_ref, *, eps):
    x = x_ref[:].astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(x * x, axis=-1, keepdims=True) - mu * mu
    y = (x - mu) * jax.lax.rsqrt(var + eps)
    y = y * scale_ref[:].astype(jnp.float32) + bias_ref[:].astype(jnp.float32)
    y = y.astype(w_ref.dtype)  # flax LayerNorm(dtype) casts before the Dense
    out = jnp.dot(y, w_ref[:], preferred_element_type=jnp.float32)
    out = out.astype(o_ref.dtype) + b_ref[:].astype(o_ref.dtype)
    o_ref[:] = out


@functools.partial(jax.jit, static_argnames=("eps",))
def fused_ln_matmul(x, scale, bias, w, b, eps: float = 1e-5):
    """(LayerNorm(x) @ w) + b in one VMEM-resident pass.

    x: (..., d_in); scale/bias: (d_in,) LN affine; w: (d_in, d_out) in the
    COMPUTE dtype; b: (d_out,). Matches
    nn.Dense(dtype)(nn.LayerNorm(eps, dtype)(x)) to dot-accumulation
    tolerance.
    """
    orig_shape = x.shape
    d_in = orig_shape[-1]
    d_out = w.shape[-1]
    rows = 1
    for s in orig_shape[:-1]:
        rows *= s
    x2 = x.reshape(rows, d_in)

    # row block bounded by VMEM (in + out + f32 temps + weights). Mosaic
    # requires the block's sublane dim be a multiple of the dtype tile (8 for
    # f32, 16 for bf16) unless it equals the full array dim — use 32 to cover
    # all dtypes. The grid may leave a partial final block: LN is row-wise,
    # so the padded garbage rows never affect stored rows.
    budget = 4 * 1024 * 1024
    max_rows = max(256, budget // ((d_in + d_out) * 8))
    if rows <= max_rows:
        block = rows
    else:
        block = max(32, (max_rows // 32) * 32)
    grid = (pl.cdiv(rows, block),)

    out = pl.pallas_call(
        functools.partial(_lnmm_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, d_in), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d_in,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((d_in,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((d_in, d_out), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d_out,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, d_out), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, d_out), x.dtype),
        interpret=_interpret(),
    )(x2, scale, bias, w, b)
    return out.reshape(orig_shape[:-1] + (d_out,))
