"""Pallas TPU kernels: the CROSS-attention block for TRAINING — fused
forward + hand-written split backward behind one `jax.custom_vjp`.

Covers the decoder layer's cross-attention to the music/time tokens as the
reference runs it in training (`/root/reference/model/model.py:54-107,
328-334`): norm2(eps 1e-5) -> rotary(q side) -> q proj; rotary(memory) ->
k proj; memory -> v proj; per-head softmax attention -> dropout -> @v ->
out projection -> dropout -> LayerNorm(eps 1e-6) -> dropout -> residual +
FiLM(t). Unlike the self-attention twin (ops/fused_sa_block_train.py) the
key/value source is the cond-encoder output, so the backward also emits
the MEMORY cotangent (the cond encoder trains through it).

Structure mirrors the SAB train kernels: monolithic forward (grid b; the
(L, Lm)=450x152 probability matrices are ~3x smaller than self-attention's,
well inside scoped VMEM), and the flash-style split backward reusing the
SAB's (b, nhead)-grid head kernels (K2/K4 are shape-generic in Lq/Lk) and
chain-top kernel (K3), with cross-attention-specific projection kernels at
both ends. Dropout masks regenerate from the same per-batch-element hash
PRNG; rate>0 gradients are pinned against a pure-JAX replica in
tests/test_train_kernels_rate_grad.py style.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tcdiff_tpu.ops.fused_sa_block_train import (
    _SALT_ATTN, _SALT_FC, _SALT_OUT,
    _bwd_attn_head_kernel, _bwd_chain_top_kernel, _bwd_ohead_kernel,
    _drop, _head_probs, _ln_bwd, _ln_stats, _rot, _rot_t, _save_resid,
)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _ca_train_fwd_kernel(
    x_ref, mem_ref, s2_ref, b2_ref, cosx_ref, ssinx_ref, cosm_ref, ssinm_ref,
    wq_ref, wk_ref, wv_ref, wfc_ref, sa_s_ref, sa_b_ref, fs_ref, fb_ref,
    seed_ref, o_ref, *, nhead, dk, scale, eps1, eps2, rate,
):
    """Monolithic forward, one program per batch element."""
    seed = seed_ref[pl.program_id(0)]
    cd = wq_ref.dtype
    x = x_ref[0]
    xh, _ = _ln_stats(x, eps1)
    h = xh * s2_ref[:].astype(jnp.float32) + b2_ref[:].astype(jnp.float32)
    r = _rot(h, cosx_ref[:].astype(jnp.float32), ssinx_ref[:].astype(jnp.float32))
    mem = mem_ref[0].astype(jnp.float32)
    rm = _rot(mem, cosm_ref[:].astype(jnp.float32), ssinm_ref[:].astype(jnp.float32))
    q = jnp.dot(r.astype(cd), wq_ref[:], preferred_element_type=jnp.float32).astype(cd)
    k = jnp.dot(rm.astype(cd), wk_ref[:], preferred_element_type=jnp.float32).astype(cd)
    v = jnp.dot(mem.astype(cd), wv_ref[:], preferred_element_type=jnp.float32).astype(cd)
    outs = []
    for i in range(nhead):
        _, pd = _head_probs(q, k, i, dk, scale, seed, rate, cd)
        outs.append(
            jnp.dot(pd, v[:, i * dk:(i + 1) * dk],
                    preferred_element_type=jnp.float32).astype(cd)
        )
    o = jnp.concatenate(outs, axis=-1)
    z2 = _drop(
        jnp.dot(o, wfc_ref[:], preferred_element_type=jnp.float32),
        seed, _SALT_FC, rate,
    )
    xh2, _ = _ln_stats(z2, eps2)
    sa_d = _drop(
        xh2 * sa_s_ref[:].astype(jnp.float32) + sa_b_ref[:].astype(jnp.float32),
        seed, _SALT_OUT, rate,
    )
    out = (
        x.astype(jnp.float32)
        + (fs_ref[0].astype(jnp.float32) + 1.0) * sa_d
        + fb_ref[0].astype(jnp.float32)
    )
    o_ref[0] = out.astype(o_ref.dtype)


def _ca_train_fwd_save_kernel(
    x_ref, mem_ref, s2_ref, b2_ref, cosx_ref, ssinx_ref, cosm_ref, ssinm_ref,
    wq_ref, wk_ref, wv_ref, wfc_ref, sa_s_ref, sa_b_ref, fs_ref, fb_ref,
    seed_ref, o_ref, oh_ref,
    *, nhead, dk, scale, eps1, eps2, rate,
):
    """Forward twin that ALSO writes the per-head attention output o
    (post-attention-dropout, L-side) as a residual
    (TCDIFF_TRAIN_SAVE_RESID; ops/fused_sa_block_train.py::_save_resid) —
    the backward then skips its K2 recompute program. q/k/v stay
    recomputed in K1x (the four-window save overflowed the SAB forward's
    scoped stack; o-only keeps both forwards well inside it)."""
    seed = seed_ref[pl.program_id(0)]
    cd = wq_ref.dtype
    x = x_ref[0]
    xh, _ = _ln_stats(x, eps1)
    h = xh * s2_ref[:].astype(jnp.float32) + b2_ref[:].astype(jnp.float32)
    r = _rot(h, cosx_ref[:].astype(jnp.float32), ssinx_ref[:].astype(jnp.float32))
    mem = mem_ref[0].astype(jnp.float32)
    rm = _rot(mem, cosm_ref[:].astype(jnp.float32), ssinm_ref[:].astype(jnp.float32))
    q = jnp.dot(r.astype(cd), wq_ref[:], preferred_element_type=jnp.float32).astype(cd)
    k = jnp.dot(rm.astype(cd), wk_ref[:], preferred_element_type=jnp.float32).astype(cd)
    v = jnp.dot(mem.astype(cd), wv_ref[:], preferred_element_type=jnp.float32).astype(cd)
    outs = []
    for i in range(nhead):
        sl = slice(i * dk, (i + 1) * dk)
        _, pd = _head_probs(q, k, i, dk, scale, seed, rate, cd)
        oi = jnp.dot(pd, v[:, sl], preferred_element_type=jnp.float32).astype(cd)
        outs.append(oi)
        oh_ref[0, i] = oi
    o = jnp.concatenate(outs, axis=-1)
    z2 = _drop(
        jnp.dot(o, wfc_ref[:], preferred_element_type=jnp.float32),
        seed, _SALT_FC, rate,
    )
    xh2, _ = _ln_stats(z2, eps2)
    sa_d = _drop(
        xh2 * sa_s_ref[:].astype(jnp.float32) + sa_b_ref[:].astype(jnp.float32),
        seed, _SALT_OUT, rate,
    )
    out = (
        x.astype(jnp.float32)
        + (fs_ref[0].astype(jnp.float32) + 1.0) * sa_d
        + fb_ref[0].astype(jnp.float32)
    )
    o_ref[0] = out.astype(o_ref.dtype)


def _ca_bwd_qkv_kernel(
    x_ref, mem_ref, s2_ref, b2_ref, cosx_ref, ssinx_ref, cosm_ref, ssinm_ref,
    wq_ref, wk_ref, wv_ref, q_ref, k_ref, v_ref, *, nhead, dk, eps1,
):
    """K1x (grid b): x-side LN -> rotary -> q; memory-side rotary -> k, v."""
    cd = wq_ref.dtype
    xh, _ = _ln_stats(x_ref[0], eps1)
    h = xh * s2_ref[:].astype(jnp.float32) + b2_ref[:].astype(jnp.float32)
    r = _rot(h, cosx_ref[:].astype(jnp.float32), ssinx_ref[:].astype(jnp.float32))
    mem = mem_ref[0].astype(jnp.float32)
    rm = _rot(mem, cosm_ref[:].astype(jnp.float32), ssinm_ref[:].astype(jnp.float32))
    q = jnp.dot(r.astype(cd), wq_ref[:], preferred_element_type=jnp.float32).astype(cd)
    k = jnp.dot(rm.astype(cd), wk_ref[:], preferred_element_type=jnp.float32).astype(cd)
    v = jnp.dot(mem.astype(cd), wv_ref[:], preferred_element_type=jnp.float32).astype(cd)
    for i in range(nhead):
        sl = slice(i * dk, (i + 1) * dk)
        q_ref[0, i] = q[:, sl]
        k_ref[0, i] = k[:, sl]
        v_ref[0, i] = v[:, sl]


def _ca_bwd_projx_kernel(
    x_ref, s2_ref, b2_ref, cosx_ref, ssinx_ref, wq_ref, dqh_ref, g_ref,
    dx_ref, dwq_ref, ds2_ref, db2_ref, *, nhead, eps1,
):
    """K5x-a (grid b): X-SIDE projection/rotary/LN2 backward + FiLM
    residual. Split from the former both-sides kernel: on the real
    toolchain the combined program's stack measured 16.65 MB vs the 16 MB
    scoped-VMEM limit at L=450/Lm=152 (r4b arm TRAIN_SAB_XAB — borderline:
    the identical kernel fit inside the ALL3 step's graph, so operand
    staging alone tipped it). The x side alone is strictly smaller than
    the SAB twin's chain-bottom kernel, which carries three head concats
    through the same LN — known to fit with margin."""
    prog = pl.program_id(0)
    cd = wq_ref.dtype
    x = x_ref[0]
    s2 = s2_ref[:]
    cosx = cosx_ref[:].astype(jnp.float32)
    ssinx = ssinx_ref[:].astype(jnp.float32)

    def acc(ref, val):
        @pl.when(prog == 0)
        def _init():
            ref[...] = val

        @pl.when(prog != 0)
        def _add():
            ref[...] += val

    xh, rstd = _ln_stats(x, eps1)
    h = xh * s2.astype(jnp.float32) + b2_ref[:].astype(jnp.float32)
    rc = _rot(h, cosx, ssinx).astype(cd)
    dqc = jnp.concatenate([dqh_ref[0, i] for i in range(nhead)], axis=-1)
    acc(dwq_ref, jax.lax.dot_general(
        rc, dqc, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32))

    # x side: q = rot_x(LN2(x)) @ wq
    dr = jax.lax.dot_general(
        dqc, wq_ref[:], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    dh = _rot_t(dr, cosx, ssinx)
    dxl, gs, gb = _ln_bwd(dh, xh, rstd, s2)
    acc(ds2_ref, jnp.sum(gs, axis=0))
    acc(db2_ref, jnp.sum(gb, axis=0))
    dx_ref[0] = (g_ref[0].astype(jnp.float32) + dxl).astype(dx_ref.dtype)


def _ca_bwd_projm_kernel(
    mem_ref, cosm_ref, ssinm_ref, wk_ref, wv_ref, dkh_ref, dvh_ref,
    dmem_ref, dwk_ref, dwv_ref, *, nhead,
):
    """K5x-b (grid b): MEMORY-SIDE k/v projection + rotary backward —
    dmem feeds the cond encoder's gradients. Small: every (Lm, d) tensor
    is ~3x narrower than the x side's (L, d)."""
    prog = pl.program_id(0)
    cd = wk_ref.dtype
    cosm = cosm_ref[:].astype(jnp.float32)
    ssinm = ssinm_ref[:].astype(jnp.float32)

    def acc(ref, val):
        @pl.when(prog == 0)
        def _init():
            ref[...] = val

        @pl.when(prog != 0)
        def _add():
            ref[...] += val

    mem = mem_ref[0].astype(jnp.float32)
    rmc = _rot(mem, cosm, ssinm).astype(cd)
    memc = mem.astype(cd)
    dkc = jnp.concatenate([dkh_ref[0, i] for i in range(nhead)], axis=-1)
    dvc = jnp.concatenate([dvh_ref[0, i] for i in range(nhead)], axis=-1)

    acc(dwk_ref, jax.lax.dot_general(
        rmc, dkc, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32))
    acc(dwv_ref, jax.lax.dot_general(
        memc, dvc, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32))

    # memory side: k = rot_m(mem) @ wk, v = mem @ wv
    drm = jax.lax.dot_general(
        dkc, wk_ref[:], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    dmem = _rot_t(drm, cosm, ssinm) + jax.lax.dot_general(
        dvc, wv_ref[:], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    dmem_ref[0] = dmem.astype(dmem_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(17, 18, 19, 20, 21))
def fused_ca_block_train(
    x, mem, s2, b2, cosx, ssinx, cosm, ssinm, wq, wk, wv, wfc,
    sa_s, sa_b, film_scale, film_shift, seeds, nhead, rate, eps1, eps2,
    mesh=None,
):
    """Training-path cross-attention block with fused Pallas fwd+bwd.

    x: (b, L, d) residual stream; mem: (b, Lm, d) cond tokens; s2/b2:
    norm2 affine; cosx/ssinx: (L, d) and cosm/ssinm: (Lm, d) rotary
    tables; wq/wk/wv: (d, h*dk), wfc: (h*dk, d) in the compute dtype;
    sa_s/sa_b: SBIMSA's internal LayerNorm affine (eps2); film_scale/
    film_shift: (b, d) FiLM rows; seeds: (b,) uint32. Returns
    x + (film_scale+1)*block + film_shift; gradients flow to x AND mem.

    mesh: optional (dp, tp) Mesh — shard the Pallas programs' batch over
    dp via shard_map (parallel/kernel_shard.py) instead of letting GSPMD
    all-gather the custom-call operands.
    """
    return _fwd(x, mem, s2, b2, cosx, ssinx, cosm, ssinm, wq, wk, wv, wfc,
                sa_s, sa_b, film_scale, film_shift, seeds,
                nhead, rate, eps1, eps2, mesh)[0]


def _common_specs(b, L, Lm, d, hd):
    vec = lambda n: pl.BlockSpec((n,), lambda i: (0,), memory_space=pltpu.VMEM)
    mat = lambda r, c: pl.BlockSpec((r, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    bx = pl.BlockSpec((1, L, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    bm = pl.BlockSpec((1, Lm, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    brow = pl.BlockSpec((1, 1, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    seed_b = pl.BlockSpec((b,), lambda i: (0,), memory_space=pltpu.SMEM)
    return vec, mat, bx, bm, brow, seed_b


def _fwd(x, mem, s2, b2, cosx, ssinx, cosm, ssinm, wq, wk, wv, wfc,
         sa_s, sa_b, film_scale, film_shift, seeds, nhead, rate, eps1, eps2,
         mesh):
    from tcdiff_tpu.parallel.kernel_shard import dp_kernel_mesh, dp_shard

    hd = wq.shape[-1]
    dk = hd // nhead
    scale = float(1.0 / (dk ** 0.5))
    save = _save_resid()
    cd = wq.dtype

    def build(x, mem, s2, b2, cosx, ssinx, cosm, ssinm, wq, wk, wv, wfc,
              sa_s, sa_b, fs, fb, seeds):
        b, L, d = x.shape  # LOCAL batch under shard_map
        Lm = mem.shape[1]
        vec, mat, bx, bm, brow, seed_b = _common_specs(b, L, Lm, d, hd)
        in_specs = [
            bx, bm, vec(d), vec(d), mat(L, d), mat(L, d), mat(Lm, d), mat(Lm, d),
            mat(d, hd), mat(d, hd), mat(d, hd), mat(hd, d),
            vec(d), vec(d), brow, brow, seed_b,
        ]
        if not save:
            return pl.pallas_call(
                functools.partial(
                    _ca_train_fwd_kernel, nhead=nhead, dk=dk, scale=scale,
                    eps1=eps1, eps2=eps2, rate=rate,
                ),
                grid=(b,),
                in_specs=in_specs,
                out_specs=bx,
                out_shape=jax.ShapeDtypeStruct((b, L, d), x.dtype),
                interpret=_interpret(),
            )(x, mem, s2, b2, cosx, ssinx, cosm, ssinm, wq, wk, wv, wfc,
              sa_s, sa_b, fs, fb, seeds)
        heads_q = pl.BlockSpec((1, nhead, L, dk), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)
        qshape = jax.ShapeDtypeStruct((b, nhead, L, dk), cd)
        return pl.pallas_call(
            functools.partial(
                _ca_train_fwd_save_kernel, nhead=nhead, dk=dk, scale=scale,
                eps1=eps1, eps2=eps2, rate=rate,
            ),
            grid=(b,),
            in_specs=in_specs,
            out_specs=(bx, heads_q),
            out_shape=(jax.ShapeDtypeStruct((b, L, d), x.dtype), qshape),
            interpret=_interpret(),
        )(x, mem, s2, b2, cosx, ssinx, cosm, ssinm, wq, wk, wv, wfc,
          sa_s, sa_b, fs, fb, seeds)

    outs = dp_shard(
        build, dp_kernel_mesh(mesh, x.shape[0]),
        batch_in=(True, True) + (False,) * 12 + (True, True, True),
        batch_out=(True, True) if save else True,
    )(x, mem, s2, b2, cosx, ssinx, cosm, ssinm, wq, wk, wv, wfc,
      sa_s, sa_b, film_scale[:, None, :], film_shift[:, None, :], seeds)
    out, o_sv = (outs[0], outs[1]) if save else (outs, None)
    res = (x, mem, s2, b2, cosx, ssinx, cosm, ssinm, wq, wk, wv, wfc,
           sa_s, sa_b, film_scale, film_shift, seeds, o_sv)
    return out, res


def _bwd(nhead, rate, eps1, eps2, mesh, res, g):
    from tcdiff_tpu.parallel.kernel_shard import dp_kernel_mesh, dp_shard

    (x, mem, s2, b2, cosx, ssinx, cosm, ssinm, wq, wk, wv, wfc,
     sa_s, sa_b, film_scale, film_shift, seeds, o_sv) = res
    saved = o_sv is not None
    hd = wq.shape[-1]
    dk = hd // nhead
    scale = float(1.0 / (dk ** 0.5))
    cd = wq.dtype
    f32 = jnp.float32
    interp = _interpret()

    def chain(x, mem, s2, b2, cosx, ssinx, cosm, ssinm, wq, wk, wv, wfc,
              sa_s, sa_b, film_scale, film_shift, seeds, g, *o_saved):
        b, L, d = x.shape  # LOCAL batch under shard_map
        Lm = mem.shape[1]
        vec, mat, bx, bm, brow, seed_b = _common_specs(b, L, Lm, d, hd)
        heads_q = pl.BlockSpec((1, nhead, L, dk), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)
        heads_kv = pl.BlockSpec((1, nhead, Lm, dk), lambda i: (i, 0, 0, 0),
                                memory_space=pltpu.VMEM)
        head_q1 = pl.BlockSpec((1, 1, L, dk), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM)
        head_kv1 = pl.BlockSpec((1, 1, Lm, dk), lambda i, j: (i, j, 0, 0),
                                memory_space=pltpu.VMEM)
        seed_bh = pl.BlockSpec((b,), lambda i, j: (0,), memory_space=pltpu.SMEM)
        qshape = jax.ShapeDtypeStruct((b, nhead, L, dk), cd)
        kvshape = jax.ShapeDtypeStruct((b, nhead, Lm, dk), cd)

        # K1x: projections on both sides (always recomputed — narrow
        # matmuls; see ops/fused_sa_block_train.py::_save_resid)
        q, k, v = pl.pallas_call(
            functools.partial(_ca_bwd_qkv_kernel, nhead=nhead, dk=dk, eps1=eps1),
            grid=(b,),
            in_specs=[bx, bm, vec(d), vec(d), mat(L, d), mat(L, d),
                      mat(Lm, d), mat(Lm, d), mat(d, hd), mat(d, hd), mat(d, hd)],
            out_specs=(heads_q, heads_kv, heads_kv),
            out_shape=(qshape, kvshape, kvshape),
            interpret=interp,
        )(x, mem, s2, b2, cosx, ssinx, cosm, ssinm, wq, wk, wv)

        if saved:
            # K2 SKIPPED: o was written by the forward kernel
            # (TCDIFF_TRAIN_SAVE_RESID; bit-identical values)
            (o,) = o_saved
        else:
            # K2 (shared): per-head forward attention outputs
            o = pl.pallas_call(
                functools.partial(_bwd_ohead_kernel, scale=scale, rate=rate),
                grid=(b, nhead),
                in_specs=[head_q1, head_kv1, head_kv1, seed_bh],
                out_specs=head_q1,
                out_shape=qshape,
                interpret=interp,
            )(q, k, v, seeds)

        # K3 (shared): chain-top forward recompute + backward down to do
        do, dwfc, dss, dsb, dfs, dfb = pl.pallas_call(
            functools.partial(_bwd_chain_top_kernel, nhead=nhead, dk=dk,
                              eps2=eps2, rate=rate),
            grid=(b,),
            in_specs=[heads_q, mat(hd, d), vec(d), vec(d), brow, seed_b, bx],
            out_specs=(heads_q, mat(hd, d), vec(d), vec(d), brow, brow),
            out_shape=(
                qshape,
                jax.ShapeDtypeStruct((hd, d), f32),
                jax.ShapeDtypeStruct((d,), f32),
                jax.ShapeDtypeStruct((d,), f32),
                jax.ShapeDtypeStruct((b, 1, d), f32),
                jax.ShapeDtypeStruct((b, 1, d), f32),
            ),
            interpret=interp,
        )(o, wfc, sa_s, sa_b, film_scale[:, None, :], seeds, g)

        # K4 (shared): per-head attention backward
        dqh, dkh, dvh = pl.pallas_call(
            functools.partial(_bwd_attn_head_kernel, scale=scale, rate=rate),
            grid=(b, nhead),
            in_specs=[head_q1, head_kv1, head_kv1, head_q1, seed_bh],
            out_specs=(head_q1, head_kv1, head_kv1),
            out_shape=(qshape, kvshape, kvshape),
            interpret=interp,
        )(q, k, v, do, seeds)

        # K5x-a: x-side projection/rotary/LN2 backward (+ FiLM residual)
        dx, dwq, ds2, db2 = pl.pallas_call(
            functools.partial(_ca_bwd_projx_kernel, nhead=nhead, eps1=eps1),
            grid=(b,),
            in_specs=[bx, vec(d), vec(d), mat(L, d), mat(L, d), mat(d, hd),
                      heads_q, bx],
            out_specs=(bx, mat(d, hd), vec(d), vec(d)),
            out_shape=(
                jax.ShapeDtypeStruct((b, L, d), x.dtype),
                jax.ShapeDtypeStruct((d, hd), f32),
                jax.ShapeDtypeStruct((d,), f32),
                jax.ShapeDtypeStruct((d,), f32),
            ),
            interpret=interp,
        )(x, s2, b2, cosx, ssinx, wq, dqh, g)

        # K5x-b: memory-side k/v projection + rotary backward
        dmem, dwk, dwv = pl.pallas_call(
            functools.partial(_ca_bwd_projm_kernel, nhead=nhead),
            grid=(b,),
            in_specs=[bm, mat(Lm, d), mat(Lm, d), mat(d, hd), mat(d, hd),
                      heads_kv, heads_kv],
            out_specs=(bm, mat(d, hd), mat(d, hd)),
            out_shape=(
                jax.ShapeDtypeStruct((b, Lm, d), mem.dtype),
                jax.ShapeDtypeStruct((d, hd), f32),
                jax.ShapeDtypeStruct((d, hd), f32),
            ),
            interpret=interp,
        )(mem, cosm, ssinm, wk, wv, dkh, dvh)
        return dx, dmem, dwq, dwk, dwv, dwfc, ds2, db2, dss, dsb, dfs, dfb

    extra = (o_sv,) if saved else ()
    (dx, dmem, dwq, dwk, dwv, dwfc, ds2, db2, dss, dsb, dfs, dfb) = dp_shard(
        chain, dp_kernel_mesh(mesh, x.shape[0]),
        batch_in=(True, True) + (False,) * 12 + (True, True, True, True)
        + (True,) * len(extra),
        # weight/affine grads are local-batch sums -> psum over dp
        batch_out=(True, True) + (False,) * 8 + (True, True),
    )(x, mem, s2, b2, cosx, ssinx, cosm, ssinm, wq, wk, wv, wfc,
      sa_s, sa_b, film_scale, film_shift, seeds, g, *extra)

    dseeds = np.zeros(seeds.shape, dtype=jax.dtypes.float0)
    return (
        dx, dmem,
        ds2.astype(s2.dtype), db2.astype(b2.dtype),
        jnp.zeros_like(cosx), jnp.zeros_like(ssinx),
        jnp.zeros_like(cosm), jnp.zeros_like(ssinm),
        dwq.astype(wq.dtype), dwk.astype(wk.dtype), dwv.astype(wv.dtype),
        dwfc.astype(wfc.dtype),
        dss.astype(sa_s.dtype), dsb.astype(sa_b.dtype),
        dfs[:, 0].astype(film_scale.dtype), dfb[:, 0].astype(film_shift.dtype),
        dseeds,
    )


fused_ca_block_train.defvjp(_fwd, _bwd)
