"""Pallas TPU kernel: the decoder layer's cross-attention block in one
VMEM-resident program per batch element.

Sibling of ops/fused_sa_block.py for the norm2/multihead_attn site
(`/root/reference/model/model.py:328-333`): the query side is
LayerNorm(eps 1e-5) -> rotary -> q-projection of the residual stream,
while k comes from the PRE-ROTATED music/time memory and v from the raw
memory (the reference rotates memory once outside the block,
`model/model.py:375,387-388`). The kernel fuses

    LN -> rotary -> q  |  k = mrot @ wk, v = mem @ wv
      -> per-head attention -> out projection -> LayerNorm(eps 1e-6)

so q/k/v, the (Lq, Lkv) logits, and the attention output never touch HBM.
The memory is small (2*seq_len//2 + 2 tokens ~ 152 at window 150), so both
memory views ride along in VMEM. No TRPE on cross-attention (the reference
never passes trj_dist to it with consistent shapes — see
models/dance_decoder.py's norm2 comment).

Opt-in via TCDIFF_PALLAS_XAB (default ON on TPU if it measures faster —
see BENCH_NOTES.md), deterministic (serving) path only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tcdiff_tpu.ops.fused_ln_rotary_matmul import _swap_pairs_lanes, _tables
from tcdiff_tpu.ops.fused_sa_block import _ln


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _ca_block_kernel(
    x_ref, s1_ref, b1_ref, cos_ref, ssin_ref, mem_ref, mrot_ref,
    wq_ref, wk_ref, wv_ref, wfc_ref, s2_ref, b2_ref, *rest,
    nhead, dk, scale, eps1, eps2, film,
):
    if film:
        fs_ref, fb_ref, o_ref = rest
    else:
        (o_ref,) = rest
    y = _ln(x_ref[0], s1_ref[:], b1_ref[:], eps1)
    r = y * cos_ref[:].astype(y.dtype) + _swap_pairs_lanes(y) * ssin_ref[:].astype(y.dtype)
    rc = r.astype(wq_ref.dtype)

    q = jnp.dot(rc, wq_ref[:], preferred_element_type=jnp.float32)
    k = jnp.dot(mrot_ref[0].astype(wk_ref.dtype), wk_ref[:], preferred_element_type=jnp.float32)
    v = jnp.dot(mem_ref[0].astype(wv_ref.dtype), wv_ref[:], preferred_element_type=jnp.float32)

    outs = []
    for i in range(nhead):
        sl = slice(i * dk, (i + 1) * dk)
        qi = q[:, sl].astype(wq_ref.dtype)
        ki = k[:, sl].astype(wq_ref.dtype)
        vi = v[:, sl].astype(wq_ref.dtype)
        logits = jax.lax.dot_general(
            qi * jnp.asarray(scale, qi.dtype), ki, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(vi.dtype)
        outs.append(jnp.dot(p, vi, preferred_element_type=jnp.float32))
    o = jnp.concatenate(outs, axis=-1)

    z = jnp.dot(o.astype(wfc_ref.dtype), wfc_ref[:], preferred_element_type=jnp.float32)
    ca = _ln(z, s2_ref[:], b2_ref[:], eps2)
    if film:
        ca = (
            x_ref[0].astype(jnp.float32)
            + (fs_ref[0].astype(jnp.float32) + 1.0) * ca
            + fb_ref[0].astype(jnp.float32)
        )
    o_ref[0] = ca.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("nhead", "eps1", "eps2", "mesh"))
def fused_ca_block(
    x, s1, b1, angles, memory, memory_rot, wq, wk, wv, wfc, s2, b2,
    film_scale=None, film_shift=None, *, nhead, eps1=1e-5, eps2=1e-6,
    mesh=None,
):
    """SBIMSA cross-attention block output for pre-norm input x.

    x: (b, Lq, d); memory/memory_rot: (b, Lkv, d) raw and rotated cond
    memory; s1/b1: norm2 affine; angles: (Lq, d) rotary table for the
    query side; wq/wk/wv: (d, h*dk); wfc: (h*dk, d); s2/b2: the block's
    post-attention LayerNorm affine. Matches
    SBIMSA(rotary(LN(x)), memory_rot, memory) on the deterministic path.
    """
    b, Lq, d = x.shape
    Lkv = memory.shape[1]
    hd = wq.shape[-1]
    dk = hd // nhead
    scale = float(1.0 / (dk ** 0.5))
    cos, ssin = _tables(x, angles, d)

    vec = lambda: pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM)
    mat = lambda r, c: pl.BlockSpec((r, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    bmat = lambda r, c: pl.BlockSpec((1, r, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

    in_specs = [
        bmat(Lq, d), vec(), vec(), mat(Lq, d), mat(Lq, d),
        bmat(Lkv, d), bmat(Lkv, d),
        mat(d, hd), mat(d, hd), mat(d, hd), mat(hd, d),
        vec(), vec(),
    ]
    args = [x, s1, b1, cos, ssin, memory, memory_rot, wq, wk, wv, wfc, s2, b2]
    film = film_scale is not None
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
            functools.partial(
                _ca_block_kernel, nhead=nhead, dk=dk, scale=scale,
                eps1=eps1, eps2=eps2, film=film,
            ),
            grid=(bl,),
            in_specs=in_specs,
            out_specs=bmat(Lq, d),
            out_shape=jax.ShapeDtypeStruct((bl, Lq, d), x.dtype),
            cost_estimate=pl.CostEstimate(
                flops=2 * Lq * d * hd + 2 * 2 * Lkv * d * hd
                + nhead * 2 * Lq * Lkv * 2 * dk + 2 * Lq * hd * d,
                bytes_accessed=4 * (Lq * d * 2 + 2 * Lkv * d) + 2 * 4 * d * hd,
                transcendentals=Lq * Lkv * nhead,
            ),
            interpret=_interpret(),
        )(*a)

    from tcdiff_tpu.parallel.kernel_shard import dp_kernel_mesh, dp_shard

    flags = (True, False, False, False, False, True, True) + (False,) * 6 \
        + ((True, True) if film else ())
    return dp_shard(build, dp_kernel_mesh(mesh, b), flags, True)(*args)
