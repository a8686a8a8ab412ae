"""Pallas TPU kernel: the decoder layer's feed-forward block in one
VMEM-resident program per batch element.

Fuses LayerNorm(eps 1e-5) -> linear1 -> exact GELU -> linear2 — the chain
the reference runs as four modules (`/root/reference/model/model.py:318-343`,
norm3/linear1/activation/linear2). Same design rationale as
ops/fused_sa_block.py: one program reads the residual stream and both
weight matrices once and writes only the final (L, d) result; the
normalized and hidden activations never touch HBM.

Numerics: LN stats and matmul accumulations in f32, GELU exact
(erf form, matching jax.nn.gelu(approximate=False)), MXU inputs cast to
the weights' compute dtype like the unfused path.

Opt-in via TCDIFF_PALLAS_FFB=1, deterministic (serving) path only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _ln(x, scale, bias, eps):
    x = x.astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(x * x, axis=-1, keepdims=True) - mu * mu
    y = (x - mu) * jax.lax.rsqrt(var + eps)
    return y * scale.astype(jnp.float32) + bias.astype(jnp.float32)


_ERF_ALPHA = (0.00022905065861350646, 0.0034082910107109506, 0.050955695062380861,
              0.18520832239976145, 1.128379143519084)
_ERF_BETA = (-1.1791602954361697e-7, 0.000023547966471313185, 0.0010179625278914885,
             0.014070470171167667, 0.11098505178285362, 0.49746925110067538, 1.0)


def _erf_f32(x):
    """XLA's own f32 erf rational approximation (x*P(x^2)/Q(x^2), |x|
    clamped to 4) — Mosaic implements neither erf nor erfc, so the kernel
    inlines the same polynomial XLA lowers `lax.erf` to, keeping the fused
    path numerically aligned with the unfused one (~1 ulp)."""
    x = jnp.clip(x, -4.0, 4.0)
    x2 = x * x
    p = jnp.float32(_ERF_ALPHA[0])
    for c in _ERF_ALPHA[1:]:
        p = p * x2 + jnp.float32(c)
    q = jnp.float32(_ERF_BETA[0])
    for c in _ERF_BETA[1:]:
        q = q * x2 + jnp.float32(c)
    return x * p / q


def _gelu_exact(x):
    """0.5*x*(1+erf(x/sqrt(2))) == jax.nn.gelu(approximate=False) in f32."""
    return 0.5 * x * (1.0 + _erf_f32(x * jnp.float32(0.7071067811865476)))


def _ff_kernel(x_ref, s_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref, *rest, eps, film):
    if film:
        fs_ref, fb_ref, o_ref = rest
    else:
        (o_ref,) = rest
    y = _ln(x_ref[0], s_ref[:], b_ref[:], eps).astype(w1_ref.dtype)
    h = jnp.dot(y, w1_ref[:], preferred_element_type=jnp.float32)
    h = h + b1_ref[:].astype(jnp.float32)
    h = _gelu_exact(h).astype(w2_ref.dtype)
    o = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)
    o = o + b2_ref[:].astype(jnp.float32)
    if film:
        # residual + FiLM in-kernel: x + (scale+1)*ff + shift (f32)
        o = (
            x_ref[0].astype(jnp.float32)
            + (fs_ref[0].astype(jnp.float32) + 1.0) * o
            + fb_ref[0].astype(jnp.float32)
        )
    o_ref[0] = o.astype(o_ref.dtype)


def _ff_tail_kernel(x_ref, s_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                    fs_ref, fb_ref, s4_ref, b4_ref, w3_ref, b3_ref, o_ref,
                    *, eps):
    """FF block + the layer tail: x' = x + (fs+1)*FF(LN3(x)) + fb, then
    linear3(LN4(x')) — the decoder layer's complete post-cross-attention
    remainder (`model/model.py:318-344`) in one program."""
    y = _ln(x_ref[0], s_ref[:], b_ref[:], eps).astype(w1_ref.dtype)
    h = jnp.dot(y, w1_ref[:], preferred_element_type=jnp.float32)
    h = h + b1_ref[:].astype(jnp.float32)
    h = _gelu_exact(h).astype(w2_ref.dtype)
    o = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)
    o = o + b2_ref[:].astype(jnp.float32)
    o = (
        x_ref[0].astype(jnp.float32)
        + (fs_ref[0].astype(jnp.float32) + 1.0) * o
        + fb_ref[0].astype(jnp.float32)
    )
    z = _ln(o, s4_ref[:], b4_ref[:], eps).astype(w3_ref.dtype)
    out = jnp.dot(z, w3_ref[:], preferred_element_type=jnp.float32)
    o_ref[0] = (out + b3_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "mesh"))
def fused_ff_tail(x, scale, bias, w1, b1, w2, b2, film_scale, film_shift,
                  s4, b4, w3, b3, eps: float = 1e-5, mesh=None):
    """linear3(LN4(x + FiLM(FF(LN3(x))))) — the whole decoder-layer tail in
    one VMEM-resident pass. film_scale/film_shift: (b, d) FiLM rows."""
    b, L, d = x.shape
    ff = w1.shape[-1]
    vec = lambda n: pl.BlockSpec((n,), lambda i: (0,), memory_space=pltpu.VMEM)
    mat = lambda r, c: pl.BlockSpec((r, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    bmat3 = lambda r, c: pl.BlockSpec((1, r, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

    def build(*a):
        bl = a[0].shape[0]  # LOCAL batch when sharded over dp (kernel_shard)
        return pl.pallas_call(
            functools.partial(_ff_tail_kernel, eps=eps),
            grid=(bl,),
            in_specs=[
                bmat3(L, d), vec(d), vec(d),
                mat(d, ff), vec(ff), mat(ff, d), vec(d),
                bmat3(1, d), bmat3(1, d),
                vec(d), vec(d), mat(d, d), vec(d),
            ],
            out_specs=bmat3(L, d),
            out_shape=jax.ShapeDtypeStruct((bl, L, d), x.dtype),
            cost_estimate=pl.CostEstimate(
                flops=2 * L * d * (2 * ff + d),
                bytes_accessed=4 * L * d * 2 + 2 * (2 * d * ff + d * d),
                transcendentals=L * ff,
            ),
            interpret=_interpret(),
        )(*a)

    from tcdiff_tpu.parallel.kernel_shard import dp_kernel_mesh, dp_shard

    flags = (True,) + (False,) * 6 + (True, True) + (False,) * 4
    return dp_shard(build, dp_kernel_mesh(mesh, b), flags, True)(
        x, scale, bias, w1, b1, w2, b2,
        film_scale[:, None, :], film_shift[:, None, :], s4, b4, w3, b3)


@functools.partial(jax.jit, static_argnames=("eps", "mesh"))
def fused_ff_block(x, scale, bias, w1, b1, w2, b2, film_scale=None,
                   film_shift=None, eps: float = 1e-5, mesh=None):
    """linear2(gelu(linear1(LN(x)))) in one VMEM-resident pass.

    x: (b, L, d); scale/bias: (d,) LN affine; w1: (d, ff) + b1: (ff,);
    w2: (ff, d) + b2: (d,) in the COMPUTE dtype. Matches the flax chain to
    dot-accumulation tolerance. With film_scale/film_shift ((b, d) FiLM
    rows) the kernel also applies the residual + featurewise affine and
    returns x + (scale+1)*block + shift.
    """
    b, L, d = x.shape
    ff = w1.shape[-1]
    film = film_scale is not None

    in_specs = [
        pl.BlockSpec((1, L, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
        pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
        pl.BlockSpec((d, ff), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((ff,), lambda i: (0,), memory_space=pltpu.VMEM),
        pl.BlockSpec((ff, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
    ]
    args = [x, scale, bias, w1, b1, w2, b2]
    if film:
        # (b, 1, d) full-size trailing block (Mosaic block-shape rule)
        in_specs += [
            pl.BlockSpec((1, 1, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ]
        args += [film_scale[:, None, :], film_shift[:, None, :]]

    def build(*a):
        bl = a[0].shape[0]  # LOCAL batch when sharded over dp (kernel_shard)
        return pl.pallas_call(
            functools.partial(_ff_kernel, eps=eps, film=film),
            grid=(bl,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, L, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((bl, L, d), x.dtype),
            cost_estimate=pl.CostEstimate(
                flops=2 * L * d * ff * 2,
                bytes_accessed=4 * L * d * 2 + 2 * 2 * d * ff,
                transcendentals=L * ff,
            ),
            interpret=_interpret(),
        )(*a)

    from tcdiff_tpu.parallel.kernel_shard import dp_kernel_mesh, dp_shard

    flags = (True,) + (False,) * 6 + ((True, True) if film else ())
    return dp_shard(build, dp_kernel_mesh(mesh, b), flags, True)(*args)
