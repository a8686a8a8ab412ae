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

Backward: one program per batch element recomputes the forward in VMEM
(flash-attention-2 recipe — residuals are just the kernel INPUTS, which
also makes the op compose with jax.checkpoint for free) and emits
dx / dwq / dwk / dwv / dwfc / dLN affine / dfilm. Weight gradients are
accumulated across the sequential TPU grid by revisiting the same output
block (init at i==0, add after).

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


# dropout-site salts (any distinct constants)
_SALT_ATTN = 0x100  # + head index
_SALT_FC = 0x200
_SALT_OUT = 0x300


def _keep_mask(seed, salt, shape, rate):
    """Deterministic keep mask: murmur3-finalizer hash of (seed, salt,
    element index), keep iff hash >= rate * 2^32. Pure jnp on iota — the
    same bits in the fwd kernel, the bwd kernel, and plain JAX (tests)."""
    r = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    c = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    x = r * jnp.uint32(shape[1]) + c
    x = x ^ (seed.astype(jnp.uint32) + jnp.uint32(0x9E3779B9) * jnp.uint32(salt))
    x = (x ^ (x >> jnp.uint32(16))) * jnp.uint32(0x7FEB352D)
    x = (x ^ (x >> jnp.uint32(15))) * jnp.uint32(0x846CA68B)
    x = x ^ (x >> jnp.uint32(16))
    thresh = jnp.uint32(min(int(round(rate * 2**32)), 2**32 - 1))
    return x >= thresh


def _drop(x, seed, salt, rate):
    if rate == 0.0:
        return x
    keep = _keep_mask(seed, salt, x.shape, rate)
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


def _sa_train_bwd_kernel(
    x_ref, s1_ref, b1_ref, cos_ref, ssin_ref, wq_ref, wk_ref, wv_ref,
    wfc_ref, s2_ref, b2_ref, fs_ref, fb_ref, seed_ref, g_ref,
    dx_ref, dwq_ref, dwk_ref, dwv_ref, dwfc_ref,
    ds1_ref, db1_ref, ds2_ref, db2_ref, dfs_ref, dfb_ref,
    *, nhead, dk, scale, eps1, eps2, rate,
):
    seed = seed_ref[pl.program_id(0)]
    cd = wq_ref.dtype
    x = x_ref[0]
    s1, b1, s2, b2 = s1_ref[:], b1_ref[:], s2_ref[:], b2_ref[:]
    cos32 = cos_ref[:].astype(jnp.float32)
    ssin32 = ssin_ref[:].astype(jnp.float32)

    # recompute the forward entirely in VMEM (residuals = inputs only)
    sa_d, (rc, yc, q, k, v, o, xh1, rstd1, xh2, rstd2) = _fwd_body(
        x, s1, b1, cos_ref[:], ssin_ref[:],
        wq_ref[:], wk_ref[:], wv_ref[:], wfc_ref[:], s2, b2,
        seed, nhead=nhead, dk=dk, scale=scale, eps1=eps1, eps2=eps2, rate=rate,
    )

    g = g_ref[0].astype(jnp.float32)
    fs = fs_ref[0].astype(jnp.float32)

    # FiLM: out = x + (fs+1)*sa_d + fb
    dsa_d = g * (fs + 1.0)
    dfs_row = jnp.sum(g * sa_d, axis=0, keepdims=True)  # (1, d)
    dfb_row = jnp.sum(g, axis=0, keepdims=True)

    # dropout3 -> LN2 -> dropout2
    dsa = _drop(dsa_d, seed, _SALT_OUT, rate)
    dz2, gs2, gb2 = _ln_bwd(dsa, xh2, rstd2, s2)
    dz = _drop(dz2, seed, _SALT_FC, rate)

    # out projection: z = o @ wfc  (do stored in cd: every consumer is a
    # cd-input dot — same rounding point as an f32 store + per-use cast)
    dzc = dz.astype(cd)
    do = jax.lax.dot_general(  # dz @ wfc^T: contract output dims
        dzc, wfc_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(cd)
    dwfc = jax.lax.dot_general(  # o^T @ dz
        o, dzc, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    # per-head attention backward: recompute head i's probabilities here
    # (second recompute) so only one head's (L, L) matrices are live
    dq = []
    dk_ = []
    dv = []
    for i in range(nhead):
        sl = slice(i * dk, (i + 1) * dk)
        qi, ki, vi = q[:, sl], k[:, sl], v[:, sl]
        p, pd = _head_probs(q, k, i, dk, scale, seed, rate, cd)
        doi = do[:, sl]
        dpd = jax.lax.dot_general(  # do @ v^T
            doi, vi, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        dvi = jax.lax.dot_general(  # pd^T @ do
            pd, doi, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dp = _drop(dpd, seed, _SALT_ATTN + i, rate)
        dlog = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dlogc = dlog.astype(cd)
        dqi = jax.lax.dot_general(  # dlog @ k
            dlogc, ki, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        dki = jax.lax.dot_general(  # dlog^T @ q
            dlogc, qi, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        # store per-head cotangents in cd — the projection-backward dots
        # consume cd either way, so the rounding point is unchanged
        dq.append(dqi.astype(cd))
        dk_.append(dki.astype(cd))
        dv.append(dvi.astype(cd))
    dqc = jnp.concatenate(dq, axis=-1)
    dkc = jnp.concatenate(dk_, axis=-1)
    dvc = jnp.concatenate(dv, axis=-1)

    # projections: q = r @ wq, k = r @ wk, v = y @ wv
    dr = jax.lax.dot_general(
        dqc, wq_ref[:], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) + jax.lax.dot_general(
        dkc, wk_ref[:], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    dy_v = jax.lax.dot_general(
        dvc, wv_ref[:], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    dwq = jax.lax.dot_general(
        rc, dqc, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dwk = jax.lax.dot_general(
        rc, dkc, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dwv = jax.lax.dot_general(
        yc, dvc, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    # rotary transpose + LN1 backward
    dy = _rot_t(dr, cos32, ssin32) + dy_v
    dxl, gs1, gb1 = _ln_bwd(dy, xh1, rstd1, s1)
    dx = g + dxl  # FiLM's direct residual path

    dx_ref[0] = dx.astype(dx_ref.dtype)
    dfs_ref[0] = dfs_row.astype(dfs_ref.dtype)
    dfb_ref[0] = dfb_row.astype(dfb_ref.dtype)

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        dwq_ref[...] = dwq
        dwk_ref[...] = dwk
        dwv_ref[...] = dwv
        dwfc_ref[...] = dwfc
        ds1_ref[...] = jnp.sum(gs1, axis=0)
        db1_ref[...] = jnp.sum(gb1, axis=0)
        ds2_ref[...] = jnp.sum(gs2, axis=0)
        db2_ref[...] = jnp.sum(gb2, axis=0)

    @pl.when(i != 0)
    def _acc():
        dwq_ref[...] += dwq
        dwk_ref[...] += dwk
        dwv_ref[...] += dwv
        dwfc_ref[...] += dwfc
        ds1_ref[...] += jnp.sum(gs1, axis=0)
        db1_ref[...] += jnp.sum(gb1, axis=0)
        ds2_ref[...] += jnp.sum(gs2, axis=0)
        db2_ref[...] += jnp.sum(gb2, axis=0)


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
    jax.custom_vjp, nondiff_argnums=(14, 15, 16, 17)
)
def fused_sa_block_train(
    x, s1, b1, cos, ssin, wq, wk, wv, wfc, s2, b2,
    film_scale, film_shift, seeds, nhead, rate, eps1, eps2,
):
    """Training-path SBIMSA block with fused Pallas fwd+bwd.

    x: (b, L, d); cos/ssin: (L, d) precomputed rotary tables (see
    `sa_train_tables`); wq/wk/wv: (d, h*dk) in the compute dtype; wfc:
    (h*dk, d); film_scale/film_shift: (b, d) FiLM rows; seeds: (b,) uint32
    per-batch-element dropout seeds. Returns
    x + (film_scale+1)*block(x) + film_shift, with dropout(rate) applied at
    the three reference sites when rate > 0.
    """
    return _fwd(
        x, s1, b1, cos, ssin, wq, wk, wv, wfc, s2, b2,
        film_scale, film_shift, seeds, nhead, rate, eps1, eps2,
    )[0]


def _fwd(x, s1, b1, cos, ssin, wq, wk, wv, wfc, s2, b2,
         film_scale, film_shift, seeds, nhead, rate, eps1, eps2):
    b, L, d = x.shape
    hd = wq.shape[-1]
    dk = hd // nhead
    scale = float(1.0 / (dk ** 0.5))
    in_specs, bx, brow, _, _ = _specs(b, L, d, hd)
    args = (
        x, s1, b1, cos, ssin, wq, wk, wv, wfc, s2, b2,
        film_scale[:, None, :], film_shift[:, None, :], seeds,
    )
    out = pl.pallas_call(
        functools.partial(
            _sa_train_fwd_kernel, nhead=nhead, dk=dk, scale=scale,
            eps1=eps1, eps2=eps2, rate=rate,
        ),
        grid=(b,),
        in_specs=in_specs,
        out_specs=bx,
        out_shape=jax.ShapeDtypeStruct((b, L, d), x.dtype),
        interpret=_interpret(),
    )(*args)
    res = (x, s1, b1, cos, ssin, wq, wk, wv, wfc, s2, b2,
           film_scale, film_shift, seeds)
    return out, res


def _bwd(nhead, rate, eps1, eps2, res, g):
    (x, s1, b1, cos, ssin, wq, wk, wv, wfc, s2, b2,
     film_scale, film_shift, seeds) = res
    b, L, d = x.shape
    hd = wq.shape[-1]
    dk = hd // nhead
    scale = float(1.0 / (dk ** 0.5))
    in_specs, bx, brow, vec, mat = _specs(b, L, d, hd)
    in_specs = in_specs + [bx]  # cotangent
    out_specs = (
        bx,  # dx
        mat(d, hd), mat(d, hd), mat(d, hd), mat(hd, d),  # dwq/dwk/dwv/dwfc
        vec(), vec(), vec(), vec(),  # ds1, db1, ds2, db2
        brow, brow,  # dfs, dfb
    )
    f32 = jnp.float32
    out_shape = (
        jax.ShapeDtypeStruct((b, L, d), x.dtype),
        jax.ShapeDtypeStruct((d, hd), f32),
        jax.ShapeDtypeStruct((d, hd), f32),
        jax.ShapeDtypeStruct((d, hd), f32),
        jax.ShapeDtypeStruct((hd, d), f32),
        jax.ShapeDtypeStruct((d,), f32),
        jax.ShapeDtypeStruct((d,), f32),
        jax.ShapeDtypeStruct((d,), f32),
        jax.ShapeDtypeStruct((d,), f32),
        jax.ShapeDtypeStruct((b, 1, d), f32),
        jax.ShapeDtypeStruct((b, 1, d), f32),
    )
    args = (
        x, s1, b1, cos, ssin, wq, wk, wv, wfc, s2, b2,
        film_scale[:, None, :], film_shift[:, None, :], seeds, g,
    )
    (dx, dwq, dwk, dwv, dwfc, ds1, db1, ds2, db2, dfs, dfb) = pl.pallas_call(
        functools.partial(
            _sa_train_bwd_kernel, nhead=nhead, dk=dk, scale=scale,
            eps1=eps1, eps2=eps2, rate=rate,
        ),
        grid=(b,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_interpret(),
    )(*args)
    zeros_rot = jnp.zeros_like(cos), jnp.zeros_like(ssin)
    dseeds = np.zeros(seeds.shape, dtype=jax.dtypes.float0)
    return (
        dx,
        ds1.astype(s1.dtype), db1.astype(b1.dtype),
        zeros_rot[0], zeros_rot[1],
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
