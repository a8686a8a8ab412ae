"""Pallas TPU kernels: the decoder layer's FF block + tail for TRAINING —
fused forward AND hand-written backward behind one `jax.custom_vjp`.

Covers the training-path chain the reference runs as seven modules
(`/root/reference/model/model.py:318-344`): norm3 -> linear1 -> exact GELU
-> dropout -> linear2 -> dropout -> residual+FiLM(t), then the layer tail
linear3(norm4(x)).  The inference twin (ops/fused_ff_block.py::fused_ff_tail)
is the same math minus dropout and runs at 78% of bf16 peak; the train step
ran it unfused through XLA, whose backward re-materializes the (L, ff)
hidden activations from HBM and runs every LayerNorm backward as a separate
reduce fusion (30% of the step in the r3 train profile).

Backward: one program per (batch element, row block) recomputes the forward
for its rows in VMEM (residuals are the kernel INPUTS — composes with
jax.checkpoint for free) and emits dx plus all parameter grads. The
scoped-VMEM discipline matches ops/fused_sa_block_train.py: parameter grads
are accumulated into their output refs the moment they are computed
(sequential-grid revisit trick), LN affine grads reduce to (d,) rows
immediately, and LN3 internals are recomputed at the tail rather than held
across the wide (L, ff) stage. Row-blocking (grid (b, L//lblk), _row_block)
exists because the real TPU toolchain measured the whole-L backward's stack
at 21.71 MB vs the 16 MB scoped-VMEM limit at L=450/ff=1024 (r4 campaign
arm TRAIN_ALL3) — every op in the chain is row-parallel, so only the grad
accumulators see the extra revisits, and the dropout hash is re-keyed by
the global row offset so masks stay bit-identical to the unblocked forward.

Dropout masks are regenerated bit-identically in the backward from the same
per-batch-element uint32 seed via the shared `_keep_mask` hash (two fresh
salts for the two FF sites). With rate=0 this matches the unfused flax
train path to dot-accumulation tolerance; with rate>0 the masks are a
different (identically-distributed) draw than flax's threefry.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tcdiff_tpu.ops.fused_ff_block import _erf_f32, _gelu_exact
from tcdiff_tpu.ops.fused_sa_block_train import _drop, _ln_bwd, _ln_stats

_SALT_FF1 = 0x400  # dropout after GELU        (model/model.py:338)
_SALT_FF2 = 0x500  # dropout after linear2     (model/model.py:341)

_INV_SQRT2 = 0.7071067811865476
_INV_SQRT2PI = 0.3989422804014327


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _gelu_grad(u):
    """d/du [0.5*u*(1+erf(u/sqrt(2)))] = 0.5*(1+erf(u/sqrt(2))) + u*phi(u),
    phi the standard normal pdf — f32, same erf polynomial as the forward."""
    cdf = 0.5 * (1.0 + _erf_f32(u * jnp.float32(_INV_SQRT2)))
    pdf = jnp.float32(_INV_SQRT2PI) * jnp.exp(-0.5 * u * u)
    return cdf + u * pdf


def _ff_train_fwd_body(x, s3, b3, w1, bb1, w2, bb2, fs, fb, s4, b4, w3, bb3,
                       seed, *, eps, rate, row0=0):
    """Forward chain in f32 stats / compute-dtype MXU. Returns the final
    output and the intermediates the backward re-derives cheaply. `row0`
    is the global index of x's first row (non-zero when the caller
    row-blocks L) — the dropout hash stays global-position-keyed."""
    cd = w1.dtype
    xh3, _ = _ln_stats(x, eps)
    y = xh3 * s3.astype(jnp.float32) + b3.astype(jnp.float32)
    yc = y.astype(cd)
    u = jnp.dot(yc, w1, preferred_element_type=jnp.float32) + bb1.astype(jnp.float32)
    ad = _drop(_gelu_exact(u), seed, _SALT_FF1, rate, row0)
    adc = ad.astype(cd)
    z = jnp.dot(adc, w2, preferred_element_type=jnp.float32) + bb2.astype(jnp.float32)
    zd = _drop(z, seed, _SALT_FF2, rate, row0)
    x2 = x.astype(jnp.float32) + (fs + 1.0) * zd + fb
    xh4, rstd4 = _ln_stats(x2, eps)
    y4 = xh4 * s4.astype(jnp.float32) + b4.astype(jnp.float32)
    y4c = y4.astype(cd)
    out = jnp.dot(y4c, w3, preferred_element_type=jnp.float32) + bb3.astype(jnp.float32)
    return out, (yc, u, adc, zd, x2, xh4, rstd4, y4c)


def _ff_train_fwd_kernel(
    x_ref, s3_ref, b3_ref, w1_ref, bb1_ref, w2_ref, bb2_ref,
    fs_ref, fb_ref, s4_ref, b4_ref, w3_ref, bb3_ref, seed_ref, o_ref,
    *, eps, rate,
):
    seed = seed_ref[pl.program_id(0)]
    out, _ = _ff_train_fwd_body(
        x_ref[0], s3_ref[:], b3_ref[:], w1_ref[:], bb1_ref[:], w2_ref[:],
        bb2_ref[:], fs_ref[0].astype(jnp.float32), fb_ref[0].astype(jnp.float32),
        s4_ref[:], b4_ref[:], w3_ref[:], bb3_ref[:], seed, eps=eps, rate=rate,
    )
    o_ref[0] = out.astype(o_ref.dtype)


def _ff_train_bwd_kernel(
    x_ref, s3_ref, b3_ref, w1_ref, bb1_ref, w2_ref, bb2_ref,
    fs_ref, fb_ref, s4_ref, b4_ref, w3_ref, bb3_ref, seed_ref, g_ref,
    dx_ref, ds3_ref, db3_ref, dw1_ref, dbb1_ref, dw2_ref, dbb2_ref,
    dfs_ref, dfb_ref, ds4_ref, db4_ref, dw3_ref, dbb3_ref,
    *, eps, rate, lblk,
):
    # grid (b, L//lblk): one program per (batch element, row block). Every
    # op in this chain is row-parallel (LN is a per-row reduce over d), so
    # row-blocking only changes how often the grad accumulators are
    # revisited — the real TPU toolchain measured the unblocked program's
    # stack at 21.71 MB vs the 16 MB scoped-VMEM limit at L=450 (r4 arm
    # TRAIN_ALL3), and the footprint scales with lblk.
    bi, lj = pl.program_id(0), pl.program_id(1)
    seed = seed_ref[bi]
    row0 = lj * lblk
    cd = w1_ref.dtype
    x = x_ref[0, 0]
    first = (bi == 0) & (lj == 0)

    def acc(ref, val):
        @pl.when(first)
        def _init():
            ref[...] = val

        @pl.when(jnp.logical_not(first))
        def _add():
            ref[...] += val

    def acc_row(ref, val):
        # per-batch-element FiLM grads: accumulate across this element's
        # row blocks only (the (i, 0, 0) output block is flushed when bi
        # advances)
        @pl.when(lj == 0)
        def _init():
            ref[...] = val

        @pl.when(lj != 0)
        def _add():
            ref[...] += val

    # forward recompute entirely in VMEM (residuals = inputs only)
    _, (yc, u, adc, zd, x2, xh4, rstd4, y4c) = _ff_train_fwd_body(
        x, s3_ref[:], b3_ref[:], w1_ref[:], bb1_ref[:], w2_ref[:], bb2_ref[:],
        fs_ref[0].astype(jnp.float32), fb_ref[0].astype(jnp.float32),
        s4_ref[:], b4_ref[:], w3_ref[:], bb3_ref[:], seed, eps=eps, rate=rate,
        row0=row0,
    )

    g = g_ref[0, 0].astype(jnp.float32)
    gc = g.astype(cd)

    # tail: out = y4 @ w3 + bb3
    acc(dbb3_ref, jnp.sum(g, axis=0))
    acc(dw3_ref, jax.lax.dot_general(
        y4c, gc, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ))
    dy4 = jax.lax.dot_general(
        gc, w3_ref[:], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    )
    dx2, gs4, gb4 = _ln_bwd(dy4, xh4, rstd4, s4_ref[:])
    acc(ds4_ref, jnp.sum(gs4, axis=0))
    acc(db4_ref, jnp.sum(gb4, axis=0))

    # FiLM: x2 = x + (fs+1)*zd + fb
    fs = fs_ref[0].astype(jnp.float32)
    acc_row(dfs_ref, jnp.sum(dx2 * zd, axis=0, keepdims=True)[None].astype(dfs_ref.dtype))
    acc_row(dfb_ref, jnp.sum(dx2, axis=0, keepdims=True)[None].astype(dfb_ref.dtype))
    dz = _drop(dx2 * (fs + 1.0), seed, _SALT_FF2, rate, row0)

    # linear2: z = ad @ w2 + bb2
    acc(dbb2_ref, jnp.sum(dz, axis=0))
    dzc = dz.astype(cd)
    acc(dw2_ref, jax.lax.dot_general(
        adc, dzc, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ))
    dad = jax.lax.dot_general(
        dzc, w2_ref[:], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    )

    # dropout1 + exact-GELU backward
    du = _drop(dad, seed, _SALT_FF1, rate, row0) * _gelu_grad(u)
    acc(dbb1_ref, jnp.sum(du, axis=0))
    duc = du.astype(cd)
    acc(dw1_ref, jax.lax.dot_general(
        yc, duc, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ))
    dy = jax.lax.dot_general(
        duc, w1_ref[:], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    )

    # LN3 backward (stats recomputed at the tail, not held across the
    # wide (L, ff) stage)
    xh3_t, rstd3_t = _ln_stats(x, eps)
    dxl, gs3, gb3 = _ln_bwd(dy, xh3_t, rstd3_t, s3_ref[:])
    acc(ds3_ref, jnp.sum(gs3, axis=0))
    acc(db3_ref, jnp.sum(gb3, axis=0))
    dx_ref[0, 0] = (dx2 + dxl).astype(dx_ref.dtype)  # residual + LN3 paths


def _specs(b, L, d, ff):
    vec = lambda n: pl.BlockSpec((n,), lambda i: (0,), memory_space=pltpu.VMEM)
    mat = lambda r, c: pl.BlockSpec((r, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    bx = pl.BlockSpec((1, L, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    brow = pl.BlockSpec((1, 1, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    seed = pl.BlockSpec((b,), lambda i: (0,), memory_space=pltpu.SMEM)
    in_specs = [
        bx, vec(d), vec(d), mat(d, ff), vec(ff), mat(ff, d), vec(d),
        brow, brow, vec(d), vec(d), mat(d, d), vec(d), seed,
    ]
    return in_specs, bx, brow, vec, mat


def _row_block(L, env="TCDIFF_FFB_LBLK", default=160):
    """Largest divisor of L at or below the row-block target (default 160
    rows ~ 7 MB of f32 temporaries for the backward at ff=1024 — the
    measured 21.71 MB / 16 MB overrun at L=450 scales with the block).
    The env var (TCDIFF_FFB_LBLK here; ops/fused_sa_block_train.py reuses
    the chooser with TCDIFF_SAB_LBLK) overrides for sweeps; values not
    dividing L fall back to the chooser. NOTE: the env is read at TRACE
    time — a process that changes it after a shape has been traced must
    `jax.clear_caches()` (the parity tests do; the bench campaigns run one
    process per arm). Default kept at 160: the 225 bracket arm measured
    SLOWER (5.53 vs 5.82 steps/s, BENCH_NOTES r4c)."""
    import os

    want = int(os.environ.get(env, str(default)))
    if want >= L:
        return L
    for n in range(2, L + 1):
        if L % n == 0 and L // n <= want:
            return L // n
    return 1


def _bwd_specs(b, L, d, ff, lblk):
    # 2-D (batch, row-block) grid twins of _specs: weight/affine grads are
    # revisited every iteration (constant index map), FiLM row grads are
    # revisited across one element's row blocks, x/g/dx stream (1, 1, lblk,
    # d) tiles of their (b, L//lblk, lblk, d) reshape. The reshape exists
    # because Mosaic requires a block's second-to-minor dim to be 8-aligned
    # OR equal to the array dim — L=450 has no 8-aligned divisor, but after
    # the (free, row-major) reshape the block IS the full (lblk, d) trailing
    # extent, which takes the same masked path the unblocked forward uses
    # for its 450-row blocks.
    vec = lambda n: pl.BlockSpec((n,), lambda i, j: (0,), memory_space=pltpu.VMEM)
    mat = lambda r, c: pl.BlockSpec((r, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM)
    bx = pl.BlockSpec((1, 1, lblk, d), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM)
    brow = pl.BlockSpec((1, 1, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM)
    seed = pl.BlockSpec((b,), lambda i, j: (0,), memory_space=pltpu.SMEM)
    in_specs = [
        bx, vec(d), vec(d), mat(d, ff), vec(ff), mat(ff, d), vec(d),
        brow, brow, vec(d), vec(d), mat(d, d), vec(d), seed,
    ]
    return in_specs, bx, brow, vec, mat


@functools.partial(jax.custom_vjp, nondiff_argnums=(14, 15, 16))
def fused_ff_tail_train(
    x, s3, b3, w1, bb1, w2, bb2, film_scale, film_shift, s4, b4, w3, bb3,
    seeds, rate, eps, mesh=None,
):
    """Training-path FF block + layer tail with fused Pallas fwd+bwd.

    x: (b, L, d); w1: (d, ff), w2: (ff, d), w3: (d, d) in the compute
    dtype; film_scale/film_shift: (b, d) FiLM rows; seeds: (b,) uint32
    per-batch-element dropout seeds. Returns
    linear3(LN4(x + (film_scale+1)*FF(LN3(x)) + film_shift)) with
    dropout(rate) at the two reference FF sites when rate > 0.
    """
    return _fwd(x, s3, b3, w1, bb1, w2, bb2, film_scale, film_shift,
                s4, b4, w3, bb3, seeds, rate, eps, mesh)[0]


def _fwd(x, s3, b3, w1, bb1, w2, bb2, film_scale, film_shift, s4, b4, w3,
         bb3, seeds, rate, eps, mesh):
    from tcdiff_tpu.parallel.kernel_shard import dp_kernel_mesh, dp_shard

    def build(x, s3, b3, w1, bb1, w2, bb2, fs, fb, s4, b4, w3, bb3, seeds):
        b, L, d = x.shape  # LOCAL batch under shard_map
        ff = w1.shape[-1]
        in_specs, bx, brow, _, _ = _specs(b, L, d, ff)
        return pl.pallas_call(
            functools.partial(_ff_train_fwd_kernel, eps=eps, rate=rate),
            grid=(b,),
            in_specs=in_specs,
            out_specs=bx,
            out_shape=jax.ShapeDtypeStruct((b, L, d), x.dtype),
            cost_estimate=pl.CostEstimate(
                flops=2 * b * L * d * (2 * ff + d),
                bytes_accessed=b * L * d * 2 * 2 + 2 * (2 * d * ff + d * d),
                transcendentals=b * L * ff,
            ),
            interpret=_interpret(),
        )(x, s3, b3, w1, bb1, w2, bb2, fs, fb, s4, b4, w3, bb3, seeds)

    out = dp_shard(
        build, dp_kernel_mesh(mesh, x.shape[0]),
        batch_in=(True,) + (False,) * 6 + (True, True) + (False,) * 4 + (True,),
        batch_out=True,
    )(x, s3, b3, w1, bb1, w2, bb2,
      film_scale[:, None, :], film_shift[:, None, :],
      s4, b4, w3, bb3, seeds)
    res = (x, s3, b3, w1, bb1, w2, bb2, film_scale, film_shift,
           s4, b4, w3, bb3, seeds)
    return out, res


def _bwd(rate, eps, mesh, res, g):
    from tcdiff_tpu.parallel.kernel_shard import dp_kernel_mesh, dp_shard

    (x, s3, b3, w1, bb1, w2, bb2, film_scale, film_shift,
     s4, b4, w3, bb3, seeds) = res

    def build(x, s3, b3, w1, bb1, w2, bb2, fs, fb, s4, b4, w3, bb3, seeds, g):
        b, L, d = x.shape  # LOCAL batch under shard_map
        ff = w1.shape[-1]
        lblk = _row_block(L)
        nblk = L // lblk
        in_specs, bx, brow, vec, mat = _bwd_specs(b, L, d, ff, lblk)
        in_specs = in_specs + [bx]  # cotangent
        out_specs = (
            bx,  # dx
            vec(d), vec(d),  # ds3, db3
            mat(d, ff), vec(ff), mat(ff, d), vec(d),  # dw1, dbb1, dw2, dbb2
            brow, brow,  # dfs, dfb
            vec(d), vec(d), mat(d, d), vec(d),  # ds4, db4, dw3, dbb3
        )
        f32 = jnp.float32
        out_shape = (
            jax.ShapeDtypeStruct((b, nblk, lblk, d), x.dtype),
            jax.ShapeDtypeStruct((d,), f32), jax.ShapeDtypeStruct((d,), f32),
            jax.ShapeDtypeStruct((d, ff), f32), jax.ShapeDtypeStruct((ff,), f32),
            jax.ShapeDtypeStruct((ff, d), f32), jax.ShapeDtypeStruct((d,), f32),
            jax.ShapeDtypeStruct((b, 1, d), f32), jax.ShapeDtypeStruct((b, 1, d), f32),
            jax.ShapeDtypeStruct((d,), f32), jax.ShapeDtypeStruct((d,), f32),
            jax.ShapeDtypeStruct((d, d), f32), jax.ShapeDtypeStruct((d,), f32),
        )
        outs = pl.pallas_call(
            functools.partial(_ff_train_bwd_kernel, eps=eps, rate=rate, lblk=lblk),
            grid=(b, nblk),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=_interpret(),
        )(x.reshape(b, nblk, lblk, d), s3, b3, w1, bb1, w2, bb2, fs, fb,
          s4, b4, w3, bb3, seeds, g.reshape(b, nblk, lblk, d))
        return (outs[0].reshape(b, L, d),) + tuple(outs[1:])

    (dx, ds3, db3, dw1, dbb1, dw2, dbb2, dfs, dfb, ds4, db4, dw3, dbb3) = (
        dp_shard(
            build, dp_kernel_mesh(mesh, x.shape[0]),
            batch_in=(True,) + (False,) * 6 + (True, True) + (False,) * 4
            + (True, True),
            # weight/affine grads are local-batch sums -> psum over dp
            batch_out=(True,) + (False,) * 6 + (True, True) + (False,) * 4,
        )(x, s3, b3, w1, bb1, w2, bb2,
          film_scale[:, None, :], film_shift[:, None, :],
          s4, b4, w3, bb3, seeds, g)
    )
    dseeds = np.zeros(seeds.shape, dtype=jax.dtypes.float0)
    return (
        dx,
        ds3.astype(s3.dtype), db3.astype(b3.dtype),
        dw1.astype(w1.dtype), dbb1.astype(bb1.dtype),
        dw2.astype(w2.dtype), dbb2.astype(bb2.dtype),
        dfs[:, 0].astype(film_scale.dtype), dfb[:, 0].astype(film_shift.dtype),
        ds4.astype(s4.dtype), db4.astype(b4.dtype),
        dw3.astype(w3.dtype), dbb3.astype(bb3.dtype),
        dseeds,
    )


fused_ff_tail_train.defvjp(_fwd, _bwd)
