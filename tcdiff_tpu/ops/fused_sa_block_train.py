"""Pallas TPU kernels: the SBI-MSA self-attention block for TRAINING —
fused forward AND hand-written backward behind one `jax.custom_vjp`.

The inference-side block kernel (ops/fused_sa_block.py) covers the chain
the reference computes as seven modules (`/root/reference/model/model.py:
54-107,318-327`) but gates on the deterministic path, so the train step ran
pure XLA. The train-step profile (BENCH_NOTES r3) showed why that matters:
XLA's attention backward materializes the (b, h, L, L) probability tensors
in HBM (207 MB each at batch 64) and spends ~60 ms/step re-laying-out
(b, h, L, dk) head tensors — together ~37% of the step. These kernels keep
everything per-batch-element in VMEM, fwd and bwd, like the inference
kernel does for sampling.

Forward (per batch element, grid over b):
    LN1(eps 1e-5) -> rotary (lane-roll layout) -> q/k/v projections
      -> per-head softmax attention -> dropout(p) -> @v -> out projection
      -> dropout -> LN2(eps 1e-6) -> dropout -> x + (film_scale+1)*sa +
      film_shift
(the three dropout sites mirror the unfused train path: inside SBIMSA on
the attention weights and after fc — `model/model.py:66,100-104` — plus the
layer's post-block dropout before FiLM, `model/model.py:322-327`).

Backward: a flash-style FIVE-kernel split (see the comment block above
`_bwd_qkv_kernel`) — residuals are just the kernel INPUTS (recompute
recipe, composes with jax.checkpoint for free), per-head (L, L) work runs
on a (b, nhead) grid so exactly one head's probability matrices exist per
program, weight gradients are accumulated across the sequential TPU
grid by revisiting the same output block (init at program 0, add after),
and the K5 projection/LN1 stage additionally row-blocks L on a
(b, L//lblk) grid (TCDIFF_SAB_LBLK, chooser shared with
ops/fused_ff_block_train.py) — its whole-L form measured a 16.65 MB
scoped stack vs the 16 MB limit when compiled next to the XLA FF
backward (r4b arm TRAIN_SAB_XAB).
A single-program backward does NOT fit the 16 MB scoped-VMEM stack at
L=450 — Mosaic allocates the unrolled head loop's f32 temporaries without
cross-iteration reuse (measured 32.6 MB, then 29.5 MB after liveness
surgery; BENCH_NOTES r3).

Dropout masks are regenerated bit-identically in the backward from the same
per-batch-element uint32 seed via a murmur-style integer hash over
broadcasted_iota (`_keep_mask`) — portable across Mosaic and interpret
mode, and computable in plain JAX so tests can reconstruct the exact masks.

Training math parity: with rate=0 this matches the unfused flax train path
to dot-accumulation tolerance; with rate>0 the masks are a different (but
identically-distributed) draw than flax's threefry — training is
stochastic, not bit-pinned, exactly like changing the seed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tcdiff_tpu.ops.fused_ln_rotary_matmul import _swap_pairs_lanes, _tables
from tcdiff_tpu.ops.fused_sa_block import _ln


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _save_resid() -> bool:
    """TCDIFF_TRAIN_SAVE_RESID=1 makes the attention train forwards write
    their per-head attention OUTPUT o ((b, nhead, L, dk) in the compute
    dtype, post-attention-dropout) to HBM as a custom-VJP residual, so the
    backward SKIPS its K2 program — the per-head (L, L) attention
    recompute, the expensive half of the backward's recompute budget
    (~0.7 ms/layer across SAB+XAB in the r4 stacked profile) — for
    ~0.07 ms/layer of extra HBM traffic at batch 64/L=450. K1 (LN ->
    rotary -> q/k/v, three narrow matmuls) stays recomputed: a first
    attempt saved q/k/v too and the FOUR extra output windows pushed the
    forward kernel's scoped-VMEM stack to 16.10 MB vs the 16 MB limit on
    the real toolchain (r5b arm "train SAVE_RESID", twice). The saved o
    uses the same hash dropout masks, so backward math is bit-identical
    either way. Default ON on TPU since the r5d paired A,B,A,B bracket
    (saves 6.359/6.380 vs controls 6.016/5.973 steps/s at b64 — +6.3%
    reproducible; +9.6% paired at b128); TCDIFF_TRAIN_SAVE_RESID=0 opts
    out. Read at TRACE time (changing it mid-process needs
    jax.clear_caches())."""
    import os

    default = "1" if jax.default_backend() == "tpu" else "0"
    return os.environ.get("TCDIFF_TRAIN_SAVE_RESID", default) == "1"


# dropout-site salts (any distinct constants)
_SALT_ATTN = 0x100  # + head index
_SALT_FC = 0x200
_SALT_OUT = 0x300


def _keep_mask(seed, salt, shape, rate, row0=0):
    """Deterministic keep mask: murmur3-finalizer hash of (seed, salt,
    element index), keep iff hash >= rate * 2^32. Pure jnp on iota — the
    same bits in the fwd kernel, the bwd kernel, and plain JAX (tests).

    `row0` is the GLOBAL index of the block's first row: a kernel that
    row-blocks its (L, n) arrays (ops/fused_ff_block_train.py's backward)
    passes `block_j * block_rows` so the hash stays a function of the
    global element index — bit-identical to the unblocked forward and to
    the pure-JAX test replicas."""
    r = jax.lax.broadcasted_iota(jnp.uint32, shape, 0) + jnp.uint32(row0)
    c = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    x = r * jnp.uint32(shape[1]) + c
    x = x ^ (seed.astype(jnp.uint32) + jnp.uint32(0x9E3779B9) * jnp.uint32(salt))
    x = (x ^ (x >> jnp.uint32(16))) * jnp.uint32(0x7FEB352D)
    x = (x ^ (x >> jnp.uint32(15))) * jnp.uint32(0x846CA68B)
    x = x ^ (x >> jnp.uint32(16))
    thresh = jnp.uint32(min(int(round(rate * 2**32)), 2**32 - 1))
    return x >= thresh


def _drop(x, seed, salt, rate, row0=0):
    if rate == 0.0:
        return x
    keep = _keep_mask(seed, salt, x.shape, rate, row0)
    return jnp.where(keep, x * jnp.asarray(1.0 / (1.0 - rate), x.dtype), 0.0)


def _ln_stats(x, eps):
    """f32 LN internals: (x_hat, rstd)."""
    x = x.astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(x * x, axis=-1, keepdims=True) - mu * mu
    rstd = jax.lax.rsqrt(var + eps)
    return (x - mu) * rstd, rstd


def _ln_bwd(g, x_hat, rstd, scale):
    """Given dL/d(LN out) and saved normalization internals, return
    (dL/dx, dL/dscale_rows, dL/dbias_rows) — the affine grads still need a
    sum over rows (done by the caller so it can fuse accumulations)."""
    g = g.astype(jnp.float32)
    gxh = g * scale.astype(jnp.float32)
    m1 = jnp.mean(gxh, axis=-1, keepdims=True)
    m2 = jnp.mean(gxh * x_hat, axis=-1, keepdims=True)
    dx = rstd * (gxh - m1 - x_hat * m2)
    return dx, g * x_hat, g


def _rot(y, cos, ssin):
    return y * cos + _swap_pairs_lanes(y) * ssin


def _rot_t(g, cos, ssin):
    """Transpose of the lane-roll rotary map: g*cos + swap(g*ssin)."""
    return g * cos + _swap_pairs_lanes(g * ssin)


def _head_probs(q, k, i, dk, scale, seed, rate, cd):
    """Recompute head i's softmax probabilities (f32) and their dropped
    compute-dtype copy. Called once in the fwd chain and again per head in
    the backward so only ONE head's (L, L) matrices are ever live —
    keeping all heads' probabilities (the obvious layout) needs
    2*h*L*L*4 B of VMEM (13 MB at L=450, h=8), past the 16 MB scoped
    limit."""
    sl = slice(i * dk, (i + 1) * dk)
    logits = jax.lax.dot_general(
        q[:, sl].astype(cd) * jnp.asarray(scale, cd), k[:, sl].astype(cd),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    )
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    pd = _drop(p, seed, _SALT_ATTN + i, rate).astype(cd)
    return p, pd


def _fwd_body(x, s1, b1, cos, ssin, wq, wk, wv, wfc, s2, b2, seed,
              *, nhead, dk, scale, eps1, eps2, rate):
    """Shared forward chain (f32 LN/softmax, MXU in the weights' dtype).
    Returns the pre-FiLM block output `sa_d` plus the intermediates the
    backward needs when called from the bwd kernel. Per-head probability
    matrices are NOT kept (see _head_probs)."""
    cd = wq.dtype
    xh1, rstd1 = _ln_stats(x, eps1)
    y = xh1 * s1.astype(jnp.float32) + b1.astype(jnp.float32)
    r = _rot(y, cos.astype(jnp.float32), ssin.astype(jnp.float32))
    rc, yc = r.astype(cd), y.astype(cd)
    # q/k/v/o live in the compute dtype: every consumer casts to cd before
    # its dot anyway (exact same numerics), and the f32 copies were ~40% of
    # the scoped-VMEM budget at L=450
    q = jnp.dot(rc, wq, preferred_element_type=jnp.float32).astype(cd)
    k = jnp.dot(rc, wk, preferred_element_type=jnp.float32).astype(cd)
    v = jnp.dot(yc, wv, preferred_element_type=jnp.float32).astype(cd)

    outs = []
    for i in range(nhead):
        sl = slice(i * dk, (i + 1) * dk)
        _, pd = _head_probs(q, k, i, dk, scale, seed, rate, cd)
        outs.append(
            jnp.dot(pd, v[:, sl], preferred_element_type=jnp.float32).astype(cd)
        )
    o = jnp.concatenate(outs, axis=-1)  # (L, hd) cd

    z = jnp.dot(o, wfc, preferred_element_type=jnp.float32)
    z2 = _drop(z, seed, _SALT_FC, rate)
    xh2, rstd2 = _ln_stats(z2, eps2)
    sa = xh2 * s2.astype(jnp.float32) + b2.astype(jnp.float32)
    sa_d = _drop(sa, seed, _SALT_OUT, rate)
    return sa_d, (rc, yc, q, k, v, o, xh1, rstd1, xh2, rstd2)


def _sa_train_fwd_kernel(
    x_ref, s1_ref, b1_ref, cos_ref, ssin_ref, wq_ref, wk_ref, wv_ref,
    wfc_ref, s2_ref, b2_ref, fs_ref, fb_ref, seed_ref, o_ref,
    *, nhead, dk, scale, eps1, eps2, rate,
):
    seed = seed_ref[pl.program_id(0)]
    sa_d, _ = _fwd_body(
        x_ref[0], s1_ref[:], b1_ref[:], cos_ref[:], ssin_ref[:],
        wq_ref[:], wk_ref[:], wv_ref[:], wfc_ref[:], s2_ref[:], b2_ref[:],
        seed, nhead=nhead, dk=dk, scale=scale, eps1=eps1, eps2=eps2, rate=rate,
    )
    out = (
        x_ref[0].astype(jnp.float32)
        + (fs_ref[0].astype(jnp.float32) + 1.0) * sa_d
        + fb_ref[0].astype(jnp.float32)
    )
    o_ref[0] = out.astype(o_ref.dtype)


def _sa_train_fwd_save_kernel(
    x_ref, s1_ref, b1_ref, cos_ref, ssin_ref, wq_ref, wk_ref, wv_ref,
    wfc_ref, s2_ref, b2_ref, fs_ref, fb_ref, seed_ref,
    o_ref, oh_ref,
    *, nhead, dk, scale, eps1, eps2, rate,
):
    """Forward twin that ALSO writes the per-head attention output o as a
    residual (TCDIFF_TRAIN_SAVE_RESID; see _save_resid) — the backward
    then skips its K2 recompute program. `o` is the post-attention-dropout
    per-head output, exactly what K2 would recompute."""
    seed = seed_ref[pl.program_id(0)]
    sa_d, (rc, yc, q, k, v, o, xh1, rstd1, xh2, rstd2) = _fwd_body(
        x_ref[0], s1_ref[:], b1_ref[:], cos_ref[:], ssin_ref[:],
        wq_ref[:], wk_ref[:], wv_ref[:], wfc_ref[:], s2_ref[:], b2_ref[:],
        seed, nhead=nhead, dk=dk, scale=scale, eps1=eps1, eps2=eps2, rate=rate,
    )
    out = (
        x_ref[0].astype(jnp.float32)
        + (fs_ref[0].astype(jnp.float32) + 1.0) * sa_d
        + fb_ref[0].astype(jnp.float32)
    )
    o_ref[0] = out.astype(o_ref.dtype)
    for i in range(nhead):
        oh_ref[0, i] = o[:, i * dk:(i + 1) * dk]


# ---------------------------------------------------------------------------
# Backward: five small kernels instead of one monolith.
#
# A single-program-per-batch-element backward holds too much: Mosaic
# allocates the unrolled 8-head loop's (L, L) f32 temporaries without
# cross-iteration stack reuse, and the kernel OOM'd the 16 MB scoped-VMEM
# stack at 29.5-32.6 MB (L=450) across two layouts. The flash-style split
# below bounds every program: per-head (L, L) work moves to a (b, nhead)
# grid where exactly ONE head's matrices exist per program, and the (b,)
# kernels contain only (L, d)-sized chains (<10 MB each). Intermediates
# (q/k/v/o/do/dq/dk/dv) ride HBM as (b, nhead, L, dk) arrays in the compute
# dtype — the same rounding points as the monolith, ~0.7 ms/layer of extra
# HBM traffic at batch 64 vs the ~115 ms/step of XLA layout+softmax-bwd
# work this replaces (r3 train profile).
# ---------------------------------------------------------------------------


def _head_probs_sliced(qi, ki, scale, seed, salt, rate, cd):
    """Per-head softmax probabilities from ALREADY-SLICED (L, dk) q/k —
    identical math to _head_probs (which slices from (L, h*dk))."""
    logits = jax.lax.dot_general(
        qi.astype(cd) * jnp.asarray(scale, cd), ki.astype(cd),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    )
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    pd = _drop(p, seed, salt, rate).astype(cd)
    return p, pd


def _bwd_qkv_kernel(x_ref, s1_ref, b1_ref, cos_ref, ssin_ref,
                    wq_ref, wk_ref, wv_ref, q_ref, k_ref, v_ref,
                    *, nhead, dk, eps1):
    """K1 (grid b): LN1 -> rotary -> q/k/v, written out per head."""
    cd = wq_ref.dtype
    xh1, _ = _ln_stats(x_ref[0], eps1)
    y = xh1 * s1_ref[:].astype(jnp.float32) + b1_ref[:].astype(jnp.float32)
    r = _rot(y, cos_ref[:].astype(jnp.float32), ssin_ref[:].astype(jnp.float32))
    rc, yc = r.astype(cd), y.astype(cd)
    q = jnp.dot(rc, wq_ref[:], preferred_element_type=jnp.float32).astype(cd)
    k = jnp.dot(rc, wk_ref[:], preferred_element_type=jnp.float32).astype(cd)
    v = jnp.dot(yc, wv_ref[:], preferred_element_type=jnp.float32).astype(cd)
    for i in range(nhead):
        sl = slice(i * dk, (i + 1) * dk)
        q_ref[0, i] = q[:, sl]
        k_ref[0, i] = k[:, sl]
        v_ref[0, i] = v[:, sl]


def _bwd_ohead_kernel(q_ref, k_ref, v_ref, seed_ref, o_ref,
                      *, scale, rate):
    """K2 (grid (b, nhead)): one head's forward attention output."""
    bi, hi = pl.program_id(0), pl.program_id(1)
    seed = seed_ref[bi]
    cd = q_ref.dtype
    _, pd = _head_probs_sliced(
        q_ref[0, 0], k_ref[0, 0], scale, seed, _SALT_ATTN + hi, rate, cd
    )
    o_ref[0, 0] = jnp.dot(
        pd, v_ref[0, 0], preferred_element_type=jnp.float32
    ).astype(cd)


def _bwd_chain_top_kernel(o_ref, wfc_ref, s2_ref, b2_ref, fs_ref, seed_ref,
                          g_ref, do_ref, dwfc_ref, ds2_ref, db2_ref,
                          dfs_ref, dfb_ref, *, nhead, dk, eps2, rate):
    """K3 (grid b): forward chain top (out-proj -> dropout -> LN2 ->
    dropout -> FiLM) recomputed, then its backward down to do."""
    prog = pl.program_id(0)
    seed = seed_ref[prog]
    cd = wfc_ref.dtype

    def acc(ref, val):
        @pl.when(prog == 0)
        def _init():
            ref[...] = val

        @pl.when(prog != 0)
        def _add():
            ref[...] += val

    o = jnp.concatenate([o_ref[0, i] for i in range(nhead)], axis=-1)
    z2 = _drop(
        jnp.dot(o, wfc_ref[:], preferred_element_type=jnp.float32),
        seed, _SALT_FC, rate,
    )
    xh2, rstd2 = _ln_stats(z2, eps2)
    sa_d = _drop(
        xh2 * s2_ref[:].astype(jnp.float32) + b2_ref[:].astype(jnp.float32),
        seed, _SALT_OUT, rate,
    )
    g = g_ref[0].astype(jnp.float32)
    fs = fs_ref[0].astype(jnp.float32)
    dfs_ref[0] = jnp.sum(g * sa_d, axis=0, keepdims=True).astype(dfs_ref.dtype)
    dfb_ref[0] = jnp.sum(g, axis=0, keepdims=True).astype(dfb_ref.dtype)
    dsa = _drop(g * (fs + 1.0), seed, _SALT_OUT, rate)
    dz2, gs2, gb2 = _ln_bwd(dsa, xh2, rstd2, s2_ref[:])
    acc(ds2_ref, jnp.sum(gs2, axis=0))
    acc(db2_ref, jnp.sum(gb2, axis=0))
    dz = _drop(dz2, seed, _SALT_FC, rate)
    # do stored in cd: every consumer is a cd-input dot — same rounding
    # point as an f32 store + per-use cast
    dzc = dz.astype(cd)
    do = jax.lax.dot_general(  # dz @ wfc^T
        dzc, wfc_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(cd)
    acc(dwfc_ref, jax.lax.dot_general(  # o^T @ dz
        o, dzc, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ))
    for i in range(nhead):
        do_ref[0, i] = do[:, i * dk:(i + 1) * dk]


def _bwd_attn_head_kernel(q_ref, k_ref, v_ref, do_ref, seed_ref,
                          dq_ref, dk_ref, dv_ref, *, scale, rate):
    """K4 (grid (b, nhead)): one head's attention backward — probabilities
    recomputed (flash recipe), only this head's (L, L) matrices live."""
    bi, hi = pl.program_id(0), pl.program_id(1)
    seed = seed_ref[bi]
    cd = q_ref.dtype
    qi, ki, vi, doi = q_ref[0, 0], k_ref[0, 0], v_ref[0, 0], do_ref[0, 0]
    p, pd = _head_probs_sliced(
        qi, ki, scale, seed, _SALT_ATTN + hi, rate, cd
    )
    dpd = jax.lax.dot_general(  # do @ v^T
        doi, vi, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    dv_ref[0, 0] = jax.lax.dot_general(  # pd^T @ do
        pd, doi, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(cd)
    dp = _drop(dpd, seed, _SALT_ATTN + hi, rate)
    dlogc = (p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))).astype(cd)
    dq_ref[0, 0] = (jax.lax.dot_general(  # dlog @ k
        dlogc, ki, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale).astype(cd)
    dk_ref[0, 0] = (jax.lax.dot_general(  # dlog^T @ q
        dlogc, qi, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale).astype(cd)


def _bwd_proj_ln_kernel(x_ref, s1_ref, b1_ref, cos_ref, ssin_ref,
                        wq_ref, wk_ref, wv_ref, dqh_ref, dkh_ref, dvh_ref,
                        g_ref, dx_ref, dwq_ref, dwk_ref, dwv_ref,
                        ds1_ref, db1_ref, *, nhead, eps1):
    """K5 (grid (b, L//lblk)): projection weight/activation grads (wide
    matmuls), rotary transpose, LN1 backward, final dx — per ROW BLOCK.

    Row-blocking (the ops/fused_ff_block_train.py recipe) exists because
    the whole-L program measured a 16.65 MB scoped-VMEM stack vs the 16 MB
    limit on the real toolchain at L=450/d=512 when compiled next to the
    XLA FF backward (r4b arm TRAIN_SAB_XAB, twice) — every op in this
    chain is row-parallel (LN1 is a per-row reduce over d), so blocking
    only changes how often the weight-grad accumulators are revisited."""
    bi, lj = pl.program_id(0), pl.program_id(1)
    first = (bi == 0) & (lj == 0)
    cd = wq_ref.dtype
    x = x_ref[0, 0]
    s1 = s1_ref[:]
    cos32 = cos_ref[0].astype(jnp.float32)
    ssin32 = ssin_ref[0].astype(jnp.float32)

    def acc(ref, val):
        @pl.when(first)
        def _init():
            ref[...] = val

        @pl.when(jnp.logical_not(first))
        def _add():
            ref[...] += val

    xh1, rstd1 = _ln_stats(x, eps1)
    y = xh1 * s1.astype(jnp.float32) + b1_ref[:].astype(jnp.float32)
    rc = _rot(y, cos32, ssin32).astype(cd)
    yc = y.astype(cd)
    dqc = jnp.concatenate([dqh_ref[0, i, 0] for i in range(nhead)], axis=-1)
    dkc = jnp.concatenate([dkh_ref[0, i, 0] for i in range(nhead)], axis=-1)
    dvc = jnp.concatenate([dvh_ref[0, i, 0] for i in range(nhead)], axis=-1)
    acc(dwq_ref, jax.lax.dot_general(
        rc, dqc, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32))
    acc(dwk_ref, jax.lax.dot_general(
        rc, dkc, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32))
    acc(dwv_ref, jax.lax.dot_general(
        yc, dvc, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32))
    dr = jax.lax.dot_general(
        dqc, wq_ref[:], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) + jax.lax.dot_general(
        dkc, wk_ref[:], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    dy = _rot_t(dr, cos32, ssin32) + jax.lax.dot_general(
        dvc, wv_ref[:], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    dxl, gs1, gb1 = _ln_bwd(dy, xh1, rstd1, s1)
    acc(ds1_ref, jnp.sum(gs1, axis=0))
    acc(db1_ref, jnp.sum(gb1, axis=0))
    g = g_ref[0, 0].astype(jnp.float32)
    dx_ref[0, 0] = (g + dxl).astype(dx_ref.dtype)  # FiLM's direct residual path


def _specs(b, L, d, hd):
    vec = lambda: pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM)
    mat = lambda r, c: pl.BlockSpec((r, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    bx = pl.BlockSpec((1, L, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    brow = pl.BlockSpec((1, 1, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    # Mosaic requires rank-1 SMEM blocks to cover the whole array (or a
    # 128-multiple): pass ALL seeds to every program, index by program_id
    seed = pl.BlockSpec((b,), lambda i: (0,), memory_space=pltpu.SMEM)
    in_specs = [
        bx, vec(), vec(), mat(L, d), mat(L, d),
        mat(d, hd), mat(d, hd), mat(d, hd), mat(hd, d),
        vec(), vec(), brow, brow, seed,
    ]
    return in_specs, bx, brow, vec, mat


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(14, 15, 16, 17, 18)
)
def fused_sa_block_train(
    x, s1, b1, cos, ssin, wq, wk, wv, wfc, s2, b2,
    film_scale, film_shift, seeds, nhead, rate, eps1, eps2, mesh=None,
):
    """Training-path SBIMSA block with fused Pallas fwd+bwd.

    x: (b, L, d); cos/ssin: (L, d) precomputed rotary tables (see
    `sa_train_tables`); wq/wk/wv: (d, h*dk) in the compute dtype; wfc:
    (h*dk, d); film_scale/film_shift: (b, d) FiLM rows; seeds: (b,) uint32
    per-batch-element dropout seeds. Returns
    x + (film_scale+1)*block(x) + film_shift, with dropout(rate) applied at
    the three reference sites when rate > 0.

    mesh: optional (dp, tp) Mesh — when its dp axis divides b, the Pallas
    programs run under shard_map with the batch sharded over dp and weight
    grads psum'd (parallel/kernel_shard.py); otherwise GSPMD would
    all-gather the custom call's operands.
    """
    return _fwd(
        x, s1, b1, cos, ssin, wq, wk, wv, wfc, s2, b2,
        film_scale, film_shift, seeds, nhead, rate, eps1, eps2, mesh,
    )[0]


def _fwd(x, s1, b1, cos, ssin, wq, wk, wv, wfc, s2, b2,
         film_scale, film_shift, seeds, nhead, rate, eps1, eps2, mesh):
    from tcdiff_tpu.parallel.kernel_shard import dp_kernel_mesh, dp_shard

    hd = wq.shape[-1]
    dk = hd // nhead
    scale = float(1.0 / (dk ** 0.5))
    save = _save_resid()
    cd = wq.dtype

    def build(x, s1, b1, cos, ssin, wq, wk, wv, wfc, s2, b2, fs, fb, seeds):
        b, L, d = x.shape  # LOCAL batch under shard_map
        in_specs, bx, brow, _, _ = _specs(b, L, d, hd)
        if not save:
            return pl.pallas_call(
                functools.partial(
                    _sa_train_fwd_kernel, nhead=nhead, dk=dk, scale=scale,
                    eps1=eps1, eps2=eps2, rate=rate,
                ),
                grid=(b,),
                in_specs=in_specs,
                out_specs=bx,
                out_shape=jax.ShapeDtypeStruct((b, L, d), x.dtype),
                interpret=_interpret(),
            )(x, s1, b1, cos, ssin, wq, wk, wv, wfc, s2, b2, fs, fb, seeds)
        heads_all = pl.BlockSpec((1, nhead, L, dk), lambda i: (i, 0, 0, 0),
                                 memory_space=pltpu.VMEM)
        hshape = jax.ShapeDtypeStruct((b, nhead, L, dk), cd)
        return pl.pallas_call(
            functools.partial(
                _sa_train_fwd_save_kernel, nhead=nhead, dk=dk, scale=scale,
                eps1=eps1, eps2=eps2, rate=rate,
            ),
            grid=(b,),
            in_specs=in_specs,
            out_specs=(bx, heads_all),
            out_shape=(jax.ShapeDtypeStruct((b, L, d), x.dtype), hshape),
            interpret=_interpret(),
        )(x, s1, b1, cos, ssin, wq, wk, wv, wfc, s2, b2, fs, fb, seeds)

    outs = dp_shard(
        build, dp_kernel_mesh(mesh, x.shape[0]),
        batch_in=(True,) + (False,) * 10 + (True, True, True),
        batch_out=(True, True) if save else True,
    )(
        x, s1, b1, cos, ssin, wq, wk, wv, wfc, s2, b2,
        film_scale[:, None, :], film_shift[:, None, :], seeds,
    )
    out, o_sv = (outs[0], outs[1]) if save else (outs, None)
    res = (x, s1, b1, cos, ssin, wq, wk, wv, wfc, s2, b2,
           film_scale, film_shift, seeds, o_sv)
    return out, res


def _bwd(nhead, rate, eps1, eps2, mesh, res, g):
    from tcdiff_tpu.parallel.kernel_shard import dp_kernel_mesh, dp_shard

    (x, s1, b1, cos, ssin, wq, wk, wv, wfc, s2, b2,
     film_scale, film_shift, seeds, o_sv) = res
    saved = o_sv is not None
    hd = wq.shape[-1]
    dk = hd // nhead
    scale = float(1.0 / (dk ** 0.5))
    cd = wq.dtype
    f32 = jnp.float32
    interp = _interpret()

    def chain(x, s1, b1, cos, ssin, wq, wk, wv, wfc, s2, b2,
              film_scale, film_shift, seeds, g, *o_saved):
        b, L, d = x.shape  # LOCAL batch under shard_map

        vec = lambda n: pl.BlockSpec((n,), lambda i: (0,), memory_space=pltpu.VMEM)
        mat = lambda r, c: pl.BlockSpec((r, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
        bx = pl.BlockSpec((1, L, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        brow = pl.BlockSpec((1, 1, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        seed_b = pl.BlockSpec((b,), lambda i: (0,), memory_space=pltpu.SMEM)
        # (b, nhead, L, dk) head arrays: all heads for a (b,)-grid program,
        # one head for a (b, nhead)-grid program
        heads_all = pl.BlockSpec((1, nhead, L, dk), lambda i: (i, 0, 0, 0),
                                 memory_space=pltpu.VMEM)
        head_one = pl.BlockSpec((1, 1, L, dk), lambda i, j: (i, j, 0, 0),
                                memory_space=pltpu.VMEM)
        seed_bh = pl.BlockSpec((b,), lambda i, j: (0,), memory_space=pltpu.SMEM)
        hshape = jax.ShapeDtypeStruct((b, nhead, L, dk), cd)

        # K1: LN1 -> rotary -> q/k/v per head (three narrow matmuls —
        # always recomputed; saving q/k/v overflowed the forward's scoped
        # stack, see _save_resid)
        q, k, v = pl.pallas_call(
            functools.partial(_bwd_qkv_kernel, nhead=nhead, dk=dk, eps1=eps1),
            grid=(b,),
            in_specs=[bx, vec(d), vec(d), mat(L, d), mat(L, d),
                      mat(d, hd), mat(d, hd), mat(d, hd)],
            out_specs=(heads_all, heads_all, heads_all),
            out_shape=(hshape, hshape, hshape),
            interpret=interp,
        )(x, s1, b1, cos, ssin, wq, wk, wv)

        if saved:
            # K2 SKIPPED: o was written by the forward kernel
            # (TCDIFF_TRAIN_SAVE_RESID; bit-identical — o is the
            # post-attention-dropout per-head output)
            (o,) = o_saved
        else:
            # K2: per-head forward attention outputs
            o = pl.pallas_call(
                functools.partial(_bwd_ohead_kernel, scale=scale, rate=rate),
                grid=(b, nhead),
                in_specs=[head_one, head_one, head_one, seed_bh],
                out_specs=head_one,
                out_shape=hshape,
                interpret=interp,
            )(q, k, v, seeds)

        # K3: chain-top forward recompute + backward down to do
        do, dwfc, ds2, db2, dfs, dfb = pl.pallas_call(
            functools.partial(_bwd_chain_top_kernel, nhead=nhead, dk=dk,
                              eps2=eps2, rate=rate),
            grid=(b,),
            in_specs=[heads_all, mat(hd, d), vec(d), vec(d), brow, seed_b, bx],
            out_specs=(heads_all, mat(hd, d), vec(d), vec(d), brow, brow),
            out_shape=(
                hshape,
                jax.ShapeDtypeStruct((hd, d), f32),
                jax.ShapeDtypeStruct((d,), f32),
                jax.ShapeDtypeStruct((d,), f32),
                jax.ShapeDtypeStruct((b, 1, d), f32),
                jax.ShapeDtypeStruct((b, 1, d), f32),
            ),
            interpret=interp,
        )(o, wfc, s2, b2, film_scale[:, None, :], seeds, g)

        # K4: per-head attention backward
        dqh, dkh, dvh = pl.pallas_call(
            functools.partial(_bwd_attn_head_kernel, scale=scale, rate=rate),
            grid=(b, nhead),
            in_specs=[head_one, head_one, head_one, head_one, seed_bh],
            out_specs=(head_one, head_one, head_one),
            out_shape=(hshape, hshape, hshape),
            interpret=interp,
        )(q, k, v, do, seeds)

        # K5: projection grads, rotary transpose, LN1 backward, dx — on a
        # (b, L//lblk) ROW-BLOCK grid: the whole-L program's scoped stack
        # measured 16.65 MB vs the 16 MB limit on the real toolchain
        # (r4b arm TRAIN_SAB_XAB; see _bwd_proj_ln_kernel). The reshapes
        # are free (row-major) and exist because Mosaic wants a block's
        # second-to-minor dim 8-aligned OR equal to the array dim — after
        # reshaping, each block IS the full (lblk, ·) trailing extent.
        from tcdiff_tpu.ops.fused_ff_block_train import _row_block

        lblk = _row_block(L, env="TCDIFF_SAB_LBLK")
        nblk = L // lblk
        bx2 = pl.BlockSpec((1, 1, lblk, d), lambda i, j: (i, j, 0, 0),
                           memory_space=pltpu.VMEM)
        cs2 = pl.BlockSpec((1, lblk, d), lambda i, j: (j, 0, 0),
                           memory_space=pltpu.VMEM)
        vec2 = lambda n: pl.BlockSpec((n,), lambda i, j: (0,),
                                      memory_space=pltpu.VMEM)
        mat2 = lambda r, c: pl.BlockSpec((r, c), lambda i, j: (0, 0),
                                         memory_space=pltpu.VMEM)
        heads2 = pl.BlockSpec((1, nhead, 1, lblk, dk),
                              lambda i, j: (i, 0, j, 0, 0),
                              memory_space=pltpu.VMEM)
        hs5 = lambda a: a.reshape(b, nhead, nblk, lblk, dk)
        dx, dwq, dwk, dwv, ds1, db1 = pl.pallas_call(
            functools.partial(_bwd_proj_ln_kernel, nhead=nhead, eps1=eps1),
            grid=(b, nblk),
            in_specs=[bx2, vec2(d), vec2(d), cs2, cs2,
                      mat2(d, hd), mat2(d, hd), mat2(d, hd),
                      heads2, heads2, heads2, bx2],
            out_specs=(bx2, mat2(d, hd), mat2(d, hd), mat2(d, hd),
                       vec2(d), vec2(d)),
            out_shape=(
                jax.ShapeDtypeStruct((b, nblk, lblk, d), x.dtype),
                jax.ShapeDtypeStruct((d, hd), f32),
                jax.ShapeDtypeStruct((d, hd), f32),
                jax.ShapeDtypeStruct((d, hd), f32),
                jax.ShapeDtypeStruct((d,), f32),
                jax.ShapeDtypeStruct((d,), f32),
            ),
            interpret=interp,
        )(x.reshape(b, nblk, lblk, d), s1, b1,
          cos.reshape(nblk, lblk, d), ssin.reshape(nblk, lblk, d),
          wq, wk, wv, hs5(dqh), hs5(dkh), hs5(dvh),
          g.reshape(b, nblk, lblk, d))
        return (dx.reshape(b, L, d), dwq, dwk, dwv, dwfc, ds1, db1,
                ds2, db2, dfs, dfb)

    extra = (o_sv,) if saved else ()
    dx, dwq, dwk, dwv, dwfc, ds1, db1, ds2, db2, dfs, dfb = dp_shard(
        chain, dp_kernel_mesh(mesh, x.shape[0]),
        batch_in=(True,) + (False,) * 10 + (True, True, True, True)
        + (True,) * len(extra),
        # weight grads are summed over the local batch inside the kernels
        # -> psum over dp; dx/dfs/dfb stay batch-sharded
        batch_out=(True,) + (False,) * 8 + (True, True),
    )(x, s1, b1, cos, ssin, wq, wk, wv, wfc, s2, b2,
      film_scale, film_shift, seeds, g, *extra)

    dseeds = np.zeros(seeds.shape, dtype=jax.dtypes.float0)
    return (
        dx,
        ds1.astype(s1.dtype), db1.astype(b1.dtype),
        jnp.zeros_like(cos), jnp.zeros_like(ssin),
        dwq.astype(wq.dtype), dwk.astype(wk.dtype), dwv.astype(wv.dtype),
        dwfc.astype(wfc.dtype),
        ds2.astype(s2.dtype), db2.astype(b2.dtype),
        dfs[:, 0].astype(film_scale.dtype), dfb[:, 0].astype(film_shift.dtype),
        dseeds,
    )


fused_sa_block_train.defvjp(_fwd, _bwd)


def sa_train_tables(x, angles, d):
    """(cos, signed sin) rotary tables for the train kernel — identical to
    the inference kernel's `_tables` (lane-roll layout)."""
    return _tables(x, angles, d)
