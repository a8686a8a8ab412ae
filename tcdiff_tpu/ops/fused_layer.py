"""Pallas TPU kernel: an ENTIRE decoder layer in one VMEM-resident program.

Round-2/3 closed the per-block levers: the self-attention block and the
FF block + tail each run as one Pallas program (ops/fused_sa_block.py,
ops/fused_ff_block.py) and the cross-attention k/v ride in from the
hoisted cond cache — leaving a measured ~63 ms XLA remainder per 50-step
call dominated by the per-layer cross-attention glue (BENCH_NOTES
"Final-default profile"). This kernel is the remaining structural lever
(ROADMAP "whole-layer single program"): SA block -> cached-k/v
cross-attention -> FF block + tail, all per batch element, so the residual
stream crosses a kernel boundary once per LAYER instead of three times.

Covers the serving configuration that is default-ON on TPU: deterministic,
kv-cache cross-attention (pre-projected (b, Lm, h*dk) k/v — music rows
from the cond cache + the 2 per-step t-token rows, concatenated OUTSIDE in
XLA), FiLM fused, no TRPE bias (no reference entry point passes trj_dist —
models/dance_decoder.py norm2 comment). The layer-0 CFG-dedup site and
non-cache paths keep the per-block kernels.

Math is byte-for-byte the composition of the three block kernels,
including the bf16 round-trip of the residual stream at each former
kernel boundary (x1/x2 are cast to the stream dtype before reuse) so the
fused and unfused serving paths agree to the same tolerance as the blocks
themselves. Reference chain: `/root/reference/model/model.py:318-344`.

TCDIFF_LAYER_FUSE=1 opt-in (flip to default only on a measured win);
TCDIFF_LAYER_FUSE_FF=0 drops the FF section back to the separate
fused_ff_tail program (a fallback if the full program exceeds the 16 MB
scoped-VMEM stack on real Mosaic — see the TRAIN_SAB saga, BENCH_NOTES r3).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tcdiff_tpu.ops.fused_ff_block import _gelu_exact
from tcdiff_tpu.ops.fused_ln_rotary_matmul import _swap_pairs_lanes, _tables
from tcdiff_tpu.ops.fused_sa_block import _ln


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _heads_attn(q, k, v, nhead, dk, scale, cd):
    """Per-head softmax attention, heads as static 64-wide lane slices —
    the measured-best serving layout (fused_sa_block.py)."""
    outs = []
    for i in range(nhead):
        sl = slice(i * dk, (i + 1) * dk)
        qi = q[:, sl].astype(cd)
        ki = k[:, sl].astype(cd)
        vi = v[:, sl].astype(cd)
        logits = jax.lax.dot_general(
            qi * jnp.asarray(scale, qi.dtype), ki, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(vi.dtype)
        outs.append(jnp.dot(p, vi, preferred_element_type=jnp.float32))
    return jnp.concatenate(outs, axis=-1)  # (L, h*dk) f32


def _film(x32, blk, fs_ref, fb_ref):
    return (
        x32
        + (fs_ref[0].astype(jnp.float32) + 1.0) * blk
        + fb_ref[0].astype(jnp.float32)
    )


def _layer_kernel(
    x_ref, cos_ref, ssin_ref,
    s1_ref, b1_ref, wq_ref, wk_ref, wv_ref, wfc_ref, sa_s2_ref, sa_b2_ref,
    f1s_ref, f1b_ref,
    n2s_ref, n2b_ref, cwq_ref, cfc_ref, ca_s2_ref, ca_b2_ref,
    kcat_ref, vcat_ref, f2s_ref, f2b_ref,
    *rest, nhead, dk, scale, eps1, eps2, include_ff,
):
    if include_ff:
        (s3_ref, b3_ref, w1_ref, bb1_ref, w2_ref, bb2_ref,
         f3s_ref, f3b_ref, s4_ref, b4_ref, w3_ref, bb3_ref, o_ref) = rest
    else:
        (o_ref,) = rest
    cd = wq_ref.dtype
    cos = cos_ref[:]
    ssin = ssin_ref[:]

    # ---- self-attention block (== _sa_block_kernel, film path) ----
    y = _ln(x_ref[0], s1_ref[:], b1_ref[:], eps1)
    r = y * cos.astype(y.dtype) + _swap_pairs_lanes(y) * ssin.astype(y.dtype)
    rc = r.astype(cd)
    yc = y.astype(cd)
    q = jnp.dot(rc, wq_ref[:], preferred_element_type=jnp.float32)
    k = jnp.dot(rc, wk_ref[:], preferred_element_type=jnp.float32)
    v = jnp.dot(yc, wv_ref[:], preferred_element_type=jnp.float32)
    o = _heads_attn(q, k, v, nhead, dk, scale, cd)
    z = jnp.dot(o.astype(wfc_ref.dtype), wfc_ref[:], preferred_element_type=jnp.float32)
    sa = _ln(z, sa_s2_ref[:], sa_b2_ref[:], eps2)
    # bf16 round-trip at the former kernel boundary (parity with the
    # 3-program path, whose residual stream lands in HBM at x.dtype)
    x1 = _film(x_ref[0].astype(jnp.float32), sa, f1s_ref, f1b_ref).astype(x_ref.dtype)

    # ---- cross-attention block, cached k/v (== SBIMSA kv_parts path) ----
    y2 = _ln(x1, n2s_ref[:], n2b_ref[:], eps1)
    r2 = y2 * cos.astype(y2.dtype) + _swap_pairs_lanes(y2) * ssin.astype(y2.dtype)
    qc = jnp.dot(r2.astype(cd), cwq_ref[:], preferred_element_type=jnp.float32)
    oc = _heads_attn(qc, kcat_ref[0].astype(jnp.float32),
                     vcat_ref[0].astype(jnp.float32), nhead, dk, scale, cd)
    zc = jnp.dot(oc.astype(cfc_ref.dtype), cfc_ref[:], preferred_element_type=jnp.float32)
    ca = _ln(zc, ca_s2_ref[:], ca_b2_ref[:], eps2)
    x2 = _film(x1.astype(jnp.float32), ca, f2s_ref, f2b_ref).astype(x_ref.dtype)

    if not include_ff:
        o_ref[0] = x2
        return

    # ---- FF block + layer tail (== _ff_tail_kernel) ----
    y3 = _ln(x2, s3_ref[:], b3_ref[:], eps1).astype(w1_ref.dtype)
    h = jnp.dot(y3, w1_ref[:], preferred_element_type=jnp.float32)
    h = _gelu_exact(h + bb1_ref[:].astype(jnp.float32)).astype(w2_ref.dtype)
    ff = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)
    ff = ff + bb2_ref[:].astype(jnp.float32)
    x3 = _film(x2.astype(jnp.float32), ff, f3s_ref, f3b_ref)
    out = jnp.dot(
        _ln(x3, s4_ref[:], b4_ref[:], eps1).astype(w3_ref.dtype), w3_ref[:],
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = (out + bb3_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("nhead", "eps1", "eps2", "include_ff", "mesh")
)
def fused_layer(
    x, angles,
    s1, b1, wq, wk, wv, wfc, sa_s2, sa_b2, f1s, f1b,
    n2s, n2b, cwq, cfc, ca_s2, ca_b2, kcat, vcat, f2s, f2b,
    s3=None, b3=None, w1=None, bb1=None, w2=None, bb2=None, f3s=None, f3b=None,
    s4=None, b4=None, w3=None, bb3=None,
    *, nhead, eps1=1e-5, eps2=1e-6, include_ff=True, mesh=None,
):
    """One decoder layer for pre-norm input x: SA block + FiLM, cached-k/v
    cross-attention + FiLM, and (include_ff) FF block + FiLM + tail.

    x: (b, L, d); angles: (L, d) rotary table; f*s/f*b: (b, d) FiLM rows;
    kcat/vcat: (b, Lm, h*dk) pre-projected cross-attention k/v (cond-cache
    music rows + per-step t rows, concatenated by the caller); weight
    matrices in the compute dtype. Returns the layer output (b, L, d)
    (with include_ff=False: the residual stream after cross-attention,
    to be finished by fused_ff_tail)."""
    b, L, d = x.shape
    hd = wq.shape[-1]
    dk = hd // nhead
    scale = float(1.0 / (dk ** 0.5))
    Lm = kcat.shape[1]
    cos, ssin = _tables(x, angles, d)

    vec = lambda n: pl.BlockSpec((n,), lambda i: (0,), memory_space=pltpu.VMEM)
    mat = lambda r, c: pl.BlockSpec((r, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    bx = pl.BlockSpec((1, L, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    bm = lambda r, c: pl.BlockSpec((1, r, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    brow = bm(1, d)

    in_specs = [
        bx, mat(L, d), mat(L, d),
        vec(d), vec(d), mat(d, hd), mat(d, hd), mat(d, hd), mat(hd, d),
        vec(d), vec(d), brow, brow,
        vec(d), vec(d), mat(d, hd), mat(hd, d), vec(d), vec(d),
        bm(Lm, hd), bm(Lm, hd), brow, brow,
    ]
    args = [
        x, cos, ssin,
        s1, b1, wq, wk, wv, wfc, sa_s2, sa_b2,
        f1s[:, None, :], f1b[:, None, :],
        n2s, n2b, cwq, cfc, ca_s2, ca_b2,
        kcat, vcat, f2s[:, None, :], f2b[:, None, :],
    ]
    batch_in = [True, False, False] + [False] * 8 + [True, True] \
        + [False] * 6 + [True, True, True, True]
    if include_ff:
        ff = w1.shape[-1]
        in_specs += [
            vec(d), vec(d), mat(d, ff), vec(ff), mat(ff, d), vec(d),
            brow, brow, vec(d), vec(d), mat(d, d), vec(d),
        ]
        args += [
            s3, b3, w1, bb1, w2, bb2,
            f3s[:, None, :], f3b[:, None, :], s4, b4, w3, bb3,
        ]
        batch_in += [False, False, False, False, False, False,
                     True, True, False, False, False, False]
        flops = (
            2 * L * d * 4 * hd + nhead * 2 * L * L * 2 * dk  # SA
            + 2 * L * d * 2 * hd + nhead * 2 * L * Lm * 2 * dk  # CA q/out+attn
            + 2 * L * d * (2 * ff + d)  # FF + tail
        )
    else:
        flops = (
            2 * L * d * 4 * hd + nhead * 2 * L * L * 2 * dk
            + 2 * L * d * 2 * hd + nhead * 2 * L * Lm * 2 * dk
        )

    def build(*a):
        bl = a[0].shape[0]  # LOCAL batch when sharded over dp (kernel_shard)
        return pl.pallas_call(
            functools.partial(
                _layer_kernel, nhead=nhead, dk=dk, scale=scale,
                eps1=eps1, eps2=eps2, include_ff=include_ff,
            ),
            grid=(bl,),
            in_specs=in_specs,
            out_specs=bx,
            out_shape=jax.ShapeDtypeStruct((bl, L, d), x.dtype),
            cost_estimate=pl.CostEstimate(
                flops=flops,
                bytes_accessed=2 * L * d * 2 + 2 * Lm * hd * 2
                + 2 * (6 * d * hd + (2 * d * (w1.shape[-1]) + d * d if include_ff else 0)),
                transcendentals=L * L * nhead + L * Lm * nhead,
            ),
            interpret=_interpret(),
        )(*a)

    from tcdiff_tpu.parallel.kernel_shard import dp_kernel_mesh, dp_shard

    return dp_shard(build, dp_kernel_mesh(mesh, b), tuple(batch_in), True)(*args)
