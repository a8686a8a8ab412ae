"""Pallas TPU kernel: the ENTIRE SBI-MSA self-attention block in one
VMEM-resident program per batch element.

Fuses the full chain the reference computes as seven separate modules
(`/root/reference/model/model.py:54-107,318-327`):

    LayerNorm(eps 1e-5) -> rotary (roll layout, full model dim)
      -> q/k/v projections -> per-head attention [+ TRPE bucket bias]
      -> out projection -> LayerNorm(eps 1e-6)

Rationale (BENCH_NOTES.md): op-local Pallas kernels (attention-only, LN-only,
LN+matmul) all LOST to XLA because each pallas_call boundary breaks XLA's
surrounding elementwise fusions; the LN->rotary->QKV kernel
(ops/fused_ln_rotary_matmul.py) was the first to reach parity. This kernel
extends that fusion through the attention and output projection so the
normalized/rotated activations, q/k/v, the (L, L) logits, and the attention
output never touch HBM — the block reads x and the weights once and writes
only the final (L, d) result.

Numerics: LN statistics, rotary, logits, softmax, and all matmul
accumulations in f32; MXU inputs cast to the weights' compute dtype
(bf16 in the bench path) exactly like the unfused path. The TRPE bias uses
UNSCALED q (reference quirk, `model/model.py:82-94`) and is realized as a
(L, dk) @ (dk, 10) contraction + 10 predicated adds (no gather), the same
scheme as ops/fused_attention.py.

Head handling: q/k/v are produced as (L, h*dk) by single full-width
matmuls (MXU-efficient), then each head takes a static 64-wide lane slice.

Opt-in via TCDIFF_PALLAS_SAB=1, deterministic (serving) path only.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tcdiff_tpu.ops.fused_ln_rotary_matmul import _swap_pairs_lanes, _tables

N_TRJ_BUCKETS = 10  # embeddings_table rows (`model/model.py:532`)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _ln(x, scale, bias, eps):
    x = x.astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(x * x, axis=-1, keepdims=True) - mu * mu
    y = (x - mu) * jax.lax.rsqrt(var + eps)
    return y * scale.astype(jnp.float32) + bias.astype(jnp.float32)


_LOG2E = 1.4426950408889634


def _softmax_rows(logits, exp2: bool):
    """Row softmax in f32. exp2=True computes e^x as 2^(x*log2 e) — one VPU
    multiply traded for exp->exp2, which Mosaic lowers more cheaply
    (hardware exponent path); bit-level differences are ~1 ulp."""
    m = jnp.max(logits, axis=-1, keepdims=True)
    if exp2:
        e = jnp.exp2((logits - m) * jnp.float32(_LOG2E))
    else:
        e = jnp.exp(logits - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _sa_block_kernel(
    x_ref, s1_ref, b1_ref, cos_ref, ssin_ref, wq_ref, wk_ref, wv_ref,
    wfc_ref, s2_ref, b2_ref, *rest, nhead, dk, scale, eps1, eps2, bias, film,
    batched, wsplit, batched2, exp2
):
    rest = list(rest)
    if bias:
        table_ref, dist_ref = rest.pop(0), rest.pop(0)
    if film:
        fs_ref, fb_ref = rest.pop(0), rest.pop(0)
    o_ref = rest.pop(0)

    # LN1 + rotary in f32 (Mosaic lane rotate needs 32-bit data)
    y = _ln(x_ref[0], s1_ref[:], b1_ref[:], eps1)
    r = y * cos_ref[:].astype(y.dtype) + _swap_pairs_lanes(y) * ssin_ref[:].astype(y.dtype)
    rc = r.astype(wq_ref.dtype)
    yc = y.astype(wq_ref.dtype)

    if batched2:
        # NO-RESHAPE batched-heads layout (TCDIFF_SAB_BATCHED2): weights
        # arrive pre-shaped (h, d, dk) / (h, dk, d) (free XLA reshapes
        # OUTSIDE the kernel), so every in-kernel step is a dot_general
        # with a LEADING batch dim — never the lane-splitting reshape that
        # blocks the `batched` variant in Mosaic. The out projection runs
        # per-head against (h, dk, d) slices of wfc and SUMS over heads —
        # agrees with concat-then-matmul to fp tolerance only (the
        # per-head partial-sum order differs from the single contraction).
        cd = wq_ref.dtype
        qh = jax.lax.dot_general(  # (h, dk, L)
            wq_ref[:].astype(cd), rc, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(cd)
        kh = jax.lax.dot_general(
            wk_ref[:].astype(cd), rc, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(cd)
        vh = jax.lax.dot_general(
            wv_ref[:].astype(cd), yc, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(cd)
        logits = jax.lax.dot_general(  # (h, L, L)
            qh * jnp.asarray(scale, cd), kh, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        if bias:
            indexed = jax.lax.dot_general(  # (h, L, n_buckets), UNSCALED q
                qh, table_ref[:].astype(cd), (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            dist = dist_ref[0][None]
            for n in range(N_TRJ_BUCKETS):
                logits = logits + jnp.where(dist == n, indexed[:, :, n : n + 1], 0.0)
        p = _softmax_rows(logits, exp2).astype(cd)
        oh = jax.lax.dot_general(  # (h, L, dk)
            p, vh, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        ).astype(cd)
        z3 = jax.lax.dot_general(  # (h, L, d)
            oh, wfc_ref[:].astype(cd), (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        sa = _ln(jnp.sum(z3, axis=0), s2_ref[:], b2_ref[:], eps2)
        if film:
            sa = (
                x_ref[0].astype(jnp.float32)
                + (fs_ref[0].astype(jnp.float32) + 1.0) * sa
                + fb_ref[0].astype(jnp.float32)
            )
        o_ref[0] = sa.astype(o_ref.dtype)
        return
    if not wsplit:
        # full-width projections on the MXU, f32 accumulation
        q = jnp.dot(rc, wq_ref[:], preferred_element_type=jnp.float32)
        k = jnp.dot(rc, wk_ref[:], preferred_element_type=jnp.float32)
        v = jnp.dot(yc, wv_ref[:], preferred_element_type=jnp.float32)

    L = rc.shape[0]
    if batched:
        # all-heads batched attention: one relayout to (h, L, dk) then two
        # 3-D batched MXU contractions instead of 8 sliced loops
        cd = wq_ref.dtype
        qh = q.astype(cd).reshape(L, nhead, dk).swapaxes(0, 1)
        kh = k.astype(cd).reshape(L, nhead, dk).swapaxes(0, 1)
        vh = v.astype(cd).reshape(L, nhead, dk).swapaxes(0, 1)
        logits = jax.lax.dot_general(
            qh * jnp.asarray(scale, cd), kh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (h, L, L)
        if bias:
            indexed = jax.lax.dot_general(
                qh, table_ref[:].astype(cd).reshape(N_TRJ_BUCKETS, nhead, dk).swapaxes(0, 1),
                (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32,
            )  # (h, L, 10)
            dist = dist_ref[0][None]
            for n in range(N_TRJ_BUCKETS):
                logits = logits + jnp.where(dist == n, indexed[:, :, n : n + 1], 0.0)
        p = _softmax_rows(logits, exp2).astype(cd)
        oh = jax.lax.dot_general(
            p, vh, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )  # (h, L, dk)
        o = oh.swapaxes(0, 1).reshape(L, nhead * dk)
    elif wsplit:
        # weight-split layout: per-head projections from (h, d, dk)-shaped
        # weights (reshaped for free by XLA outside the kernel) — no
        # activation lane slicing at all; narrow-N (dk) matmuls instead
        outs = []
        for i in range(nhead):
            qi = jnp.dot(rc, wq_ref[i], preferred_element_type=jnp.float32).astype(wq_ref.dtype)
            ki = jnp.dot(rc, wk_ref[i], preferred_element_type=jnp.float32).astype(wq_ref.dtype)
            vi = jnp.dot(yc, wv_ref[i], preferred_element_type=jnp.float32).astype(wq_ref.dtype)
            logits = jax.lax.dot_general(
                qi * jnp.asarray(scale, qi.dtype), ki, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if bias:
                indexed = jax.lax.dot_general(
                    qi, table_ref[i].astype(qi.dtype), (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                dist = dist_ref[0]
                for n in range(N_TRJ_BUCKETS):
                    logits = logits + jnp.where(dist == n, indexed[:, n : n + 1], 0.0)
            p = _softmax_rows(logits, exp2).astype(vi.dtype)
            outs.append(jnp.dot(p, vi, preferred_element_type=jnp.float32))
        o = jnp.concatenate(outs, axis=-1)
    else:
        # per-head attention, statically unrolled; heads are 64-wide lane slices
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
            if bias:
                # (L, 10): UNSCALED q against every bucket embedding of this head
                indexed = jax.lax.dot_general(
                    qi, table_ref[:, sl].astype(qi.dtype), (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                dist = dist_ref[0]
                for n in range(N_TRJ_BUCKETS):
                    logits = logits + jnp.where(dist == n, indexed[:, n : n + 1], 0.0)
            p = _softmax_rows(logits, exp2).astype(vi.dtype)
            outs.append(jnp.dot(p, vi, preferred_element_type=jnp.float32))
        o = jnp.concatenate(outs, axis=-1)  # (L, h*dk) f32

    # out projection + post-attention LayerNorm (eps 1e-6)
    z = jnp.dot(o.astype(wfc_ref.dtype), wfc_ref[:], preferred_element_type=jnp.float32)
    sa = _ln(z, s2_ref[:], b2_ref[:], eps2)
    if film:
        # residual + FiLM in-kernel: x + (scale+1)*sa + shift (f32)
        sa = (
            x_ref[0].astype(jnp.float32)
            + (fs_ref[0].astype(jnp.float32) + 1.0) * sa
            + fb_ref[0].astype(jnp.float32)
        )
    o_ref[0] = sa.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("nhead", "eps1", "eps2", "mesh"))
def fused_sa_block(
    x, s1, b1, angles, wq, wk, wv, wfc, s2, b2,
    table=None, trj_dist=None, film_scale=None, film_shift=None,
    *, nhead, eps1=1e-5, eps2=1e-6, mesh=None,
):
    """SBIMSA self-attention block output for pre-norm input x.

    x: (b, L, d). s1/b1: norm1 affine; angles: (L, d) rotary table;
    wq/wk/wv: (d, h*dk); wfc: (h*dk, d); s2/b2: the block's post-attention
    LayerNorm affine. Optional TRPE: table (n_buckets, h*dk) + trj_dist
    (b, L, L) int32. Matches SBIMSA(rotary(LN(x)), rotary(LN(x)), LN(x))
    on the deterministic path to dot-accumulation tolerance.

    With film_scale/film_shift ((b, d) per-batch FiLM rows) the kernel also
    applies the residual + featurewise affine in-place and returns
    x + (scale+1)*block + shift — the layer's full self-attention update.
    """
    b, L, d = x.shape
    hd = wq.shape[-1]
    dk = hd // nhead
    scale = float(1.0 / (dk ** 0.5))
    cos, ssin = _tables(x, angles, d)

    vec = lambda: pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM)
    mat = lambda r, c: pl.BlockSpec((r, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    mat3 = lambda a, r, c: pl.BlockSpec((a, r, c), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    wsplit = os.environ.get("TCDIFF_SAB_WSPLIT", "0") == "1"
    batched2 = os.environ.get("TCDIFF_SAB_BATCHED2", "0") == "1"
    if wsplit or batched2:
        # (h, d, dk) weight layout: XLA performs the reshape outside the
        # kernel; in-kernel heads index the leading dim (no lane slicing)
        wq = wq.reshape(d, nhead, hd // nhead).swapaxes(0, 1)
        wk = wk.reshape(d, nhead, hd // nhead).swapaxes(0, 1)
        wv = wv.reshape(d, nhead, hd // nhead).swapaxes(0, 1)
        wproj = lambda: mat3(nhead, d, hd // nhead)
    else:
        wproj = lambda: mat(d, hd)
    if batched2:
        # the out projection runs per-head + sum: (h, dk, d) slices
        wfc = wfc.reshape(nhead, hd // nhead, d)
        wout_spec = mat3(nhead, hd // nhead, d)
    else:
        wout_spec = mat(hd, d)
    in_specs = [
        pl.BlockSpec((1, L, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        vec(), vec(), mat(L, d), mat(L, d),
        wproj(), wproj(), wproj(), wout_spec,
        vec(), vec(),
    ]
    args = [x, s1, b1, cos, ssin, wq, wk, wv, wfc, s2, b2]
    bias = table is not None and trj_dist is not None
    if bias:
        if batched2:
            # (h, dk, n_buckets): contraction-ready for the batched2 form
            table = table.reshape(N_TRJ_BUCKETS, nhead, hd // nhead).transpose(1, 2, 0)
            in_specs += [mat3(nhead, hd // nhead, N_TRJ_BUCKETS)]
        elif wsplit:
            table = table.reshape(N_TRJ_BUCKETS, nhead, hd // nhead).swapaxes(0, 1)
            in_specs += [mat3(nhead, N_TRJ_BUCKETS, hd // nhead)]
        else:
            in_specs += [mat(N_TRJ_BUCKETS, hd)]
        in_specs += [
            pl.BlockSpec((1, L, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ]
        args += [table, trj_dist.astype(jnp.int32)]
    film = film_scale is not None
    if film:
        # (b, 1, d) with a full-size trailing block: Mosaic requires the
        # last two block dims to be (8, 128)-divisible or full-size
        in_specs += [
            pl.BlockSpec((1, 1, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ]
        args += [film_scale[:, None, :], film_shift[:, None, :]]

    cost = pl.CostEstimate(
        flops=2 * L * d * (3 * hd + hd) + nhead * (2 * L * L * 2 * dk),
        bytes_accessed=4 * (L * d * 2) + 2 * (3 * d * hd + hd * d),
        transcendentals=L * L * nhead,
    )

    def build(*a):
        bl = a[0].shape[0]  # LOCAL batch when sharded over dp (kernel_shard)
        return pl.pallas_call(
            functools.partial(
                _sa_block_kernel, nhead=nhead, dk=dk, scale=scale,
                eps1=eps1, eps2=eps2, bias=bias, film=film,
                # TCDIFF_SAB_BATCHED=1: all-heads batched attention layout
                # (one (h, L, dk) relayout + 3-D contractions vs 8 sliced
                # loops). Does NOT compile on current Mosaic — the lane-
                # splitting reshape hits "infer-vector-layout: unsupported
                # shape cast"; kept for interpret-mode comparison and future
                # Mosaic versions. The sliced-loop layout is the default.
                batched=os.environ.get("TCDIFF_SAB_BATCHED", "0") == "1",
                wsplit=wsplit,
                # TCDIFF_SAB_BATCHED2: no-reshape batched-heads layout — the
                # round-3 answer to the Mosaic shape-cast blocker (weights
                # pre-shaped outside, batch-leading dot_generals inside).
                batched2=batched2,
                # TCDIFF_SAB_EXP2: softmax exponential via exp2 (see
                # _softmax_rows) — measured A/B against lax.exp lowering.
                exp2=os.environ.get("TCDIFF_SAB_EXP2", "0") == "1",
            ),
            grid=(bl,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, L, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((bl, L, d), x.dtype),
            cost_estimate=cost,
            interpret=_interpret(),
        )(*a)

    from tcdiff_tpu.parallel.kernel_shard import dp_kernel_mesh, dp_shard

    flags = [True] + [False] * 10
    if bias:
        flags += [False, True]  # table replicated, trj_dist batch-leading
    if film:
        flags += [True, True]
    return dp_shard(build, dp_kernel_mesh(mesh, b), tuple(flags), True)(*args)
