"""Pallas TPU kernel: LayerNorm -> rotary -> projection(s) in one pass.

Extends ops/fused_ln_matmul.py's matmul-edge fusion to the decoder layer's
norm1/norm2 sites, where the reference applies RoPE to the FULL normalized
model vector before the q/k projections
(`/root/reference/model/model.py:231,375,387-388`). One kernel invocation
reads the residual-stream block once, computes f32 LN statistics in VMEM,
applies the pair rotation as lane rolls (the "roll" layout of
models/rotary.py — bit-identical math), and feeds BOTH the rotated vector
(into the q/k projections) and the un-rotated one (into the v projection)
straight to the MXU — the normalized and rotated activations never touch
HBM. Opt-in via TCDIFF_PALLAS_LNROT=1, inference path only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    # Mosaic compiles only for TPU; on the CPU test mesh run interpreted
    return jax.default_backend() != "tpu"


def _swap_pairs_lanes(x):
    """(x0, x1, x2, x3, ...) -> (x1, x0, x3, x2, ...) on the lane axis.
    Mirrors models/rotary.py::_swap_pairs with kernel-safe 2-D iota."""
    n = x.shape[-1]
    even = (
        jax.lax.broadcasted_iota(jnp.int32, (1, n), dimension=1) % 2
    ) == 0
    # pltpu.roll requires non-negative shifts: roll(-1) == roll(n-1)
    left = pltpu.roll(x, n - 1, axis=len(x.shape) - 1)
    right = pltpu.roll(x, 1, axis=len(x.shape) - 1)
    return jnp.where(even, left, right)


def _ln_rot(x_ref, scale_ref, bias_ref, cos_ref, ssin_ref, eps):
    """Shared body: f32 LN stats in VMEM, then the lane-roll pair rotation.
    Returns (normalized y, rotated r), both in the weights' compute dtype."""
    x = x_ref[0].astype(jnp.float32)  # (L, d)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(x * x, axis=-1, keepdims=True) - mu * mu
    y = (x - mu) * jax.lax.rsqrt(var + eps)
    y = y * scale_ref[:].astype(jnp.float32) + bias_ref[:].astype(jnp.float32)
    return y


def _kernel(x_ref, scale_ref, bias_ref, cos_ref, ssin_ref, wr_ref, wp_ref,
            qk_ref, v_ref, *, eps):
    # Rotary stays in f32: Mosaic's lane rotate only supports 32-bit types
    # ("Rotate with non-32-bit data" otherwise); cast at the MXU edge.
    y = _ln_rot(x_ref, scale_ref, bias_ref, cos_ref, ssin_ref, eps)
    # rotary on the full model vector (roll layout): y*cos + swap(y)*(sign*sin)
    r = y * cos_ref[:].astype(y.dtype) + _swap_pairs_lanes(y) * ssin_ref[:].astype(y.dtype)
    r = r.astype(wr_ref.dtype)
    y = y.astype(wr_ref.dtype)
    qk_ref[0] = jnp.dot(r, wr_ref[:], preferred_element_type=jnp.float32).astype(qk_ref.dtype)
    v_ref[0] = jnp.dot(y, wp_ref[:], preferred_element_type=jnp.float32).astype(v_ref.dtype)


def _kernel_rot_only(x_ref, scale_ref, bias_ref, cos_ref, ssin_ref, wr_ref,
                     qk_ref, *, eps):
    y = _ln_rot(x_ref, scale_ref, bias_ref, cos_ref, ssin_ref, eps)
    r = y * cos_ref[:].astype(y.dtype) + _swap_pairs_lanes(y) * ssin_ref[:].astype(y.dtype)
    qk_ref[0] = jnp.dot(r.astype(wr_ref.dtype), wr_ref[:], preferred_element_type=jnp.float32).astype(qk_ref.dtype)


def _tables(x, angles, d):
    # jnp (not numpy): angles is traced under this function's jit; XLA
    # constant-folds the cos/sin when the angle table is a constant
    sign = jnp.asarray(np.tile([-1.0, 1.0], d // 2), jnp.float32)
    ang = angles.astype(jnp.float32)
    cos = jnp.cos(ang).astype(x.dtype)
    ssin = (jnp.sin(ang) * sign).astype(x.dtype)
    return cos, ssin


@functools.partial(jax.jit, static_argnames=("eps",))
def fused_ln_rotary_matmul(x, scale, bias, angles, w_rot, w_plain, eps: float = 1e-5):
    """(rotary(LN(x)) @ w_rot, LN(x) @ w_plain) in one VMEM-resident pass.

    x: (b, L, d); scale/bias: (d,) LN affine; angles: (L, d) rotary angle
    table (f32, from models/rotary.py::rotary_freqs); w_rot: (d, Fr) and
    w_plain: (d, Fp) in the COMPUTE dtype. w_plain=None computes only the
    rotated projection. Matches `Dense(rotary(LayerNorm(x)))` /
    `Dense(LayerNorm(x))` to dot-accumulation tolerance (the rotation itself
    is bit-identical to apply_rotary's roll layout).
    """
    b, L, d = x.shape
    fr = w_rot.shape[-1]
    cos, ssin = _tables(x, angles, d)
    common_in = [
        pl.BlockSpec((1, L, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
        pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
        pl.BlockSpec((L, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((L, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((d, fr), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    if w_plain is None:
        return pl.pallas_call(
            functools.partial(_kernel_rot_only, eps=eps),
            grid=(b,),
            in_specs=common_in,
            out_specs=pl.BlockSpec((1, L, fr), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, L, fr), x.dtype),
            interpret=_interpret(),
        )(x, scale, bias, cos, ssin, w_rot)

    fp = w_plain.shape[-1]
    qk, v = pl.pallas_call(
        functools.partial(_kernel, eps=eps),
        grid=(b,),
        in_specs=common_in
        + [pl.BlockSpec((d, fp), lambda i: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((1, L, fr), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, fp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, L, fr), x.dtype),
            jax.ShapeDtypeStruct((b, L, fp), x.dtype),
        ),
        interpret=_interpret(),
    )(x, scale, bias, cos, ssin, w_rot, w_plain)
    return qk, v
