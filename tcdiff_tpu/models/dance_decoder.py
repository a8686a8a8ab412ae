"""DanceDecoder — the multi-dancer diffusion denoiser, TPU-first.

Re-implements the capability of the reference network
(`/root/reference/model/model.py:416-624`) as a flax.linen module with
explicit RNG threading, static shapes, and a batched classifier-free
guidance path (one doubled-batch forward instead of two sequential calls —
`model/model.py:542-546` runs the network twice per DDIM step).

Faithfully kept reference semantics (each with its citation):
  * RoPE on the full model vector pre-projection (`model/model.py:231,375`).
  * SBI_MSA: bias-free q/k/v/out projections, post-attention LayerNorm
    (eps 1e-6), optional trajectory-relative position bias gathered from a
    10-entry shared embedding table (`model/model.py:54-107`).
  * FiLM decoder layer: pre-norm self-attn / cross-attn / FF, each followed
    by featurewise affine of a DenseFiLM(t) (`model/model.py:308-343`).
  * Fusion projection mixing the dancers of each frame
    (`model/model.py:522-528,561`).
  * Trajectory embedding of per-token XY deltas (`model/model.py:536-540,557`)
    — deltas are taken over the flat token axis, so they cross dancer
    boundaries exactly like the reference (`model/model.py:557`).
  * The ConcatSquash trajectory-modulation MLP is computed but its output is
    DISCARDED in the reference's norm_first path — the layer returns
    `linear3(norm4(x))` and `out` is dead (`model/model.py:344-371`; this is
    why the reference needs DDP `find_unused_parameters=True`,
    `TCDiff.py:52`). We default to the reference dataflow; set
    `use_traj_modulation=True` to enable the paper-described path. The
    parameters exist either way so checkpoints are interchangeable.

Everything is MXU-shaped: d_model 512, heads 8x64, tokens seq_len*dancers.
Params live in float32; activations can run in bfloat16 via `dtype`.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from tcdiff_tpu.config import DanceDecoderConfig
from tcdiff_tpu.models.rotary import apply_rotary, rotary_freqs


def _use_pallas_ln() -> bool:
    """TCDIFF_PALLAS_LN=1 routes the SBI-MSA LayerNorms through the fused
    Pallas kernel (profile-driven: the f32 stat reductions are ~19% of
    sampler device time; see BENCH_NOTES.md)."""
    import os

    return os.environ.get("TCDIFF_PALLAS_LN", "0") == "1"


class _LNParams(nn.Module):
    """Parameter-only stand-in with nn.LayerNorm's param names, so the fused
    kernel shares checkpoints with the flax module."""

    d: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.d,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.d,), jnp.float32)
        return scale, bias


def _ln_kwargs() -> dict:
    """TCDIFF_LN_BF16=1 lets LayerNorm statistics stay in the compute dtype
    instead of flax's f32 upcast — the profile's largest non-matmul bucket
    (~19% of sampler device time is bf16->f32 convert+reduce fusions,
    BENCH_NOTES.md). Changes numerics (bf16 mean/var over 512 channels), so
    it is opt-in; parity tests run f32 where it is a no-op."""
    import os

    if os.environ.get("TCDIFF_LN_BF16", "0") == "1":
        return {"force_float32_reductions": False}
    return {}


def _use_pallas_lnmm() -> bool:
    """TCDIFF_PALLAS_LNMM=1 fuses the decoder layer's norm3->linear1 and
    norm4->linear3 LayerNorm+projection pairs into one Pallas kernel
    (ops/fused_ln_matmul.py) on the deterministic path."""
    import os

    return os.environ.get("TCDIFF_PALLAS_LNMM", "0") == "1"


_WARNED_INT8_SHADOW = set()


def _flag_default_on_tpu(name: str) -> bool:
    """Fusion flags that measured FASTER than XLA on the TPU default to ON
    there and OFF elsewhere (CPU tests/interpret mode pay kernel-emulation
    cost for no benefit). The env var overrides either way ("1"/"0").

    TCDIFF_INT8=1 takes precedence over the TPU defaults (ADVICE r2): the
    bf16 block kernels would otherwise shadow the int8 projections and the
    advertised speedup could never materialize. An EXPLICIT "1" still wins,
    with a one-time warning about the partial int8 effect."""
    import os

    v = os.environ.get(name)
    if v is not None:
        on = v == "1"
        if on and _use_int8() and name not in _WARNED_INT8_SHADOW:
            _WARNED_INT8_SHADOW.add(name)
            import warnings

            warnings.warn(
                f"TCDIFF_INT8=1 with {name}=1: the bf16 block kernel takes "
                "this site, so int8 only reaches the remaining projections.",
                stacklevel=2,
            )
        return on
    if _use_int8():
        return False
    return jax.default_backend() == "tpu"


def _use_pallas_sab() -> bool:
    """TCDIFF_PALLAS_SAB computes each decoder layer's ENTIRE self-attention
    block (norm1 -> rotary -> q/k/v -> attention [+TRPE] -> out-proj ->
    post-attention LayerNorm) as one VMEM-resident Pallas program
    (ops/fused_sa_block.py) on the deterministic path. Default ON on TPU:
    measured 138.5/133.1 vs 132.4 control, and +19% combined with FFB
    (BENCH_NOTES.md round-2 block-fusion sweep)."""
    return _flag_default_on_tpu("TCDIFF_PALLAS_SAB")


def _use_layer_fuse() -> bool:
    """TCDIFF_LAYER_FUSE=1 computes an ENTIRE decoder layer (SA block +
    cached-k/v cross-attention + FF block + tail, FiLM fused) as ONE
    Pallas program per batch element (ops/fused_layer.py) — the
    whole-layer structural lever against the measured per-layer XLA
    cross-attention remainder (BENCH_NOTES "Final-default profile";
    ROADMAP round-3 follow-ups). Serving path only, requires the kv
    cache and no TRPE; the layer-0 CFG-dedup site keeps the per-block
    kernels. Opt-in until the TPU A/B lands."""
    import os

    return os.environ.get("TCDIFF_LAYER_FUSE", "0") == "1"


def _layer_fuse_ff() -> bool:
    """TCDIFF_LAYER_FUSE_FF=0 drops the FF section out of the fused layer
    program (SA+CA fused, FF via the separate fused_ff_tail) — the
    fallback if the full program exceeds Mosaic's 16 MB scoped-VMEM
    stack at real shapes."""
    import os

    return os.environ.get("TCDIFF_LAYER_FUSE_FF", "1") == "1"


def _train_kernel_flag(name: str, mesh) -> bool:
    """Default-ON-on-TPU gate for the TRAIN block kernels, with one extra
    guard the serving kernels don't need: under a threaded mesh with tp>1
    the shard_map wrap duplicates the kernel compute across tp peers
    (parallel/kernel_shard.py module docstring — the kernels want whole-d
    weights), so the DEFAULT yields to the XLA/Megatron path there. An
    explicit env "1"/"0" still wins either way."""
    import os

    if os.environ.get(name) is None and mesh is not None and \
            mesh.shape.get("tp", 1) > 1:
        return False
    return _flag_default_on_tpu(name)


def _use_train_sab(mesh=None) -> bool:
    """TCDIFF_TRAIN_SAB=1 routes the TRAINING-path self-attention block
    (norm1 -> rotary -> q/k/v -> attention -> dropout -> fc -> dropout ->
    post-LN -> dropout -> FiLM residual) through one Pallas program with a
    hand-written flash-style backward (ops/fused_sa_block_train.py) — the
    train-step profile's largest bucket (XLA materializes the (b,h,L,L)
    attention probabilities in HBM for the backward). Default ON on TPU:
    solo +38% (4.14 vs 2.99 steps/s controls), and the full
    SAB+XAB+FFB stack measured 6.11 steps/s / MFU 20.3% vs the 2.99 /
    9.9% XLA control — +105% (BENCH_NOTES r4 campaign, arms TRAIN_SAB /
    ALL3 FLAT_OPT0). Dropout inside the kernel uses a hash-counter PRNG —
    a different (identically-distributed) draw than flax's threefry, like
    changing the seed. Training never passes trj_dist (TRPE applies only at
    sampling; the reference's train callsites never pass it,
    `/root/reference/model/model.py:446-540`), so the kernel omits the
    TRPE bias path."""
    return _train_kernel_flag("TCDIFF_TRAIN_SAB", mesh)


def _use_train_xab(mesh=None) -> bool:
    """TCDIFF_TRAIN_XAB=1 routes the TRAINING-path cross-attention block
    (norm2 -> rotary -> q; rotary(memory) -> k; memory -> v -> attention ->
    dropout -> fc -> dropout -> post-LN -> dropout -> FiLM residual)
    through the fused custom-VJP program (ops/fused_ca_block_train.py),
    including the memory cotangent for the cond encoder. Default ON on TPU
    as part of the measured train-kernel stack (BENCH_NOTES r4: ALL3 6.11
    steps/s vs 2.99 control; the XAB increment over SAB+FFB is what closed
    the last ~15%); dropout PRNG caveat as _use_train_sab."""
    return _train_kernel_flag("TCDIFF_TRAIN_XAB", mesh)


def _use_train_ffb(mesh=None) -> bool:
    """TCDIFF_TRAIN_FFB=1 routes the TRAINING-path FF block + layer tail
    (norm3 -> linear1 -> GELU -> dropout -> linear2 -> dropout -> FiLM
    residual -> linear3(norm4)) through one Pallas program with a
    hand-written backward (ops/fused_ff_block_train.py). Targets the
    r3 train profile's LN-reduce bucket (30% of the step) and the (L, ff)
    hidden-activation HBM round-trips in XLA's FF backward. Default ON on
    TPU: solo +8% (3.22 steps/s vs 2.99 control) and part of the ALL3
    stack's 6.11 vs 2.99 (BENCH_NOTES r4); dropout PRNG caveat as
    _use_train_sab."""
    return _train_kernel_flag("TCDIFF_TRAIN_FFB", mesh)


class _CAKV(nn.Module):
    """Parameter-only access to a layer's cross-attention k/v kernels
    (decoder_i/multihead_attn/{w_ks,w_vs}) for the hoisted-k/v cond cache."""

    d: int
    hd: int

    @nn.compact
    def __call__(self):
        wk = _DenseKernel(self.d, self.hd, name="w_ks")()
        wv = _DenseKernel(self.d, self.hd, name="w_vs")()
        return wk, wv


class _LayerCAKV(nn.Module):
    d: int
    hd: int

    @nn.compact
    def __call__(self):
        return _CAKV(self.d, self.hd, name="multihead_attn")()


class _SAParams(nn.Module):
    """Parameter-only stand-in matching SBIMSA's projection/LayerNorm param
    tree (w_qs/w_ks/w_vs/fc kernels + layer_norm scale/bias), so the fused
    self-attention block shares checkpoints with the flax module."""

    d_model: int
    hd: int

    @nn.compact
    def __call__(self):
        wq = _DenseKernel(self.d_model, self.hd, name="w_qs")()
        wk = _DenseKernel(self.d_model, self.hd, name="w_ks")()
        wv = _DenseKernel(self.d_model, self.hd, name="w_vs")()
        fc = _DenseKernel(self.hd, self.d_model, name="fc")()
        s2, b2 = _LNParams(self.d_model, name="layer_norm")()
        return wq, wk, wv, fc, s2, b2


def _use_cfg_dedup() -> bool:
    """TCDIFF_CFG_DEDUP (default ON): in the doubled-batch CFG forward the
    two halves share the SAME x and times — they first diverge where the
    condition enters (cond_hidden inside film1 and the cross-attention
    memory). With cfg_pair=True the caller passes the HALF batch x and the
    model computes the x-only prefix (input/fusion/trajectory projections
    and layer 0's self-attention block) once, tiling to the doubled batch
    at the first FiLM — exact same math, ~4% of sampler device time."""
    import os

    return os.environ.get("TCDIFF_CFG_DEDUP", "1") == "1"


def _use_kv_cache() -> bool:
    """TCDIFF_KV_CACHE (default ON): hoist the cross-attention k/v of the
    music tokens out of the sampling scan. The cond memory is
    concat([ct, t_tokens]) -> row-wise LayerNorm -> per-position rotary ->
    per-layer k/v projections; every one of those steps treats the 150 ct
    rows independently of the timestep, so their k/v are loop-invariant
    and only the 2 t_token rows need recomputing per step — exact same
    per-row math, ~4% of sampler FLOPs removed. Applies when a cond_cache
    is used (deterministic sampling); takes precedence over the XAB
    kernel at the cross-attention site."""
    import os

    return os.environ.get("TCDIFF_KV_CACHE", "1") == "1"


def _use_kv_batch() -> bool:
    """TCDIFF_KV_BATCH=1: with the hoisted-k/v cache active, project ALL
    decoder layers' 2 t-token rows in one stacked einsum pair per sampling
    step instead of 2 tiny (2, d)@(d, hd) matmuls inside every layer — the
    per-layer k/v assembly named in the round-2 profile's 63 ms XLA
    remainder. Exact same math; the stacked kernels ride in the cond cache
    (built once per clip). Default ON since the round-3 A/B: 179.7 vs
    167.6/170.2 paired controls (+6%, BENCH_NOTES r3 campaign 2);
    TCDIFF_KV_BATCH=0 restores the per-layer assembly."""
    import os

    return os.environ.get("TCDIFF_KV_BATCH", "1") == "1"


def _use_ffb_tail() -> bool:
    """TCDIFF_PALLAS_FFT extends the FF-block kernel through the layer
    tail: residual+FiLM and the closing linear3(norm4(x)) run in the same
    program (ops/fused_ff_block.py::fused_ff_tail). Requires the FFB
    kernel to be active. Default ON on TPU: measured 168.5/163.8 vs
    166.4/158.3 paired controls (BENCH_NOTES.md)."""
    return _flag_default_on_tpu("TCDIFF_PALLAS_FFT")


def _use_fuse_film() -> bool:
    """TCDIFF_FUSE_FILM=1 folds each block's residual + FiLM featurewise
    affine into the block-fusion kernels (SAB/XAB/FFB take the per-batch
    FiLM rows and return x + (scale+1)*block + shift directly), removing
    the remaining elementwise HBM round-trips per site. Only affects sites
    whose block kernel is active."""
    import os

    return os.environ.get("TCDIFF_FUSE_FILM", "0") == "1"


def _use_pallas_xab() -> bool:
    """TCDIFF_PALLAS_XAB=1 computes each decoder layer's cross-attention
    block (norm2 -> rotary -> q; k/v from the cond memory; attention ->
    out-proj -> post-attention LayerNorm) as one VMEM-resident Pallas
    program (ops/fused_ca_block.py) on the deterministic path. Opt-in
    until it measures faster than the XLA path."""
    import os

    return os.environ.get("TCDIFF_PALLAS_XAB", "0") == "1"


def _use_pallas_ffb() -> bool:
    """TCDIFF_PALLAS_FFB computes each decoder layer's feed-forward block
    (norm3 -> linear1 -> exact GELU -> linear2) as one VMEM-resident Pallas
    program (ops/fused_ff_block.py) on the deterministic path. Default ON
    on TPU: measured 152.1 alone and 157.35 with SAB vs 132.4 control
    (BENCH_NOTES.md round-2 block-fusion sweep)."""
    return _flag_default_on_tpu("TCDIFF_PALLAS_FFB")


def _use_int8() -> bool:
    """TCDIFF_INT8=1 routes the decoder layers' hot projections (q/k/v/out,
    FF linear1/2/3) through int8 MXU matmuls on the deterministic path —
    ops/int8.py. v5e int8 peak is 2x bf16. Changes numerics (opt-in,
    serving only); not combinable with the Pallas fusion flags (those paths
    keep their own precision)."""
    import os

    return os.environ.get("TCDIFF_INT8", "0") == "1"


def _use_pallas_lnrot() -> bool:
    """TCDIFF_PALLAS_LNROT=1 fuses the decoder layer's norm1 -> rotary ->
    q/k/v and norm2 -> rotary -> q LayerNorm+rotation+projection chains into
    one Pallas kernel each (ops/fused_ln_rotary_matmul.py) on the
    deterministic path — the normalized and rotated activations never touch
    HBM."""
    import os

    return os.environ.get("TCDIFF_PALLAS_LNROT", "0") == "1"


class _DenseKernel(nn.Module):
    """Parameter-only stand-in for a bias-free nn.Dense (param name
    "kernel"), so fused projection paths share checkpoints."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        return self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.in_features, self.features),
            jnp.float32,
        )


def _fusion_einsum() -> bool:
    """Default: compute the fusion projection as dancer-blocked einsums on a
    (b, seq, dn, d) view instead of reshaping the token stream
    (b, seq*dn, d) <-> (b, seq, d*dn) — the profile's ~5% relayout-copy
    bucket (BENCH_NOTES.md): retiling (450,512)->(150,1536) forces a
    physical copy on TPU even though the linear memory order is unchanged.
    Same dot products, summed per dancer block (partial-sum order differs,
    so results agree to fp tolerance, not bitwise). Measured +1%
    s-motion/s on v5e (134.0 vs 132.6); TCDIFF_FUSION=dense restores the
    reshape path."""
    import os

    return os.environ.get("TCDIFF_FUSION", "einsum") != "dense"


class _DenseParams(nn.Module):
    """Parameter-only stand-in with nn.Dense's param names/shapes so custom
    einsum paths share checkpoints with the flax module."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.in_features, self.features),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return kernel, bias


def _use_pallas_attention() -> bool:
    """Measured on TPU v5e (BENCH_NOTES.md): at these shapes (tokens<=1500,
    dk=64) XLA's batched attention outperforms the per-(batch, head) Pallas
    grid by ~23% — the kernel's 64-wide matmuls under-fill the MXU and the
    fine grid adds launch overhead. The XLA path is therefore the default;
    set TCDIFF_PALLAS_ATTENTION=1 to route deterministic attention through
    the fused kernel (tested bit-compatible)."""
    import os

    return os.environ.get("TCDIFF_PALLAS_ATTENTION", "0") != "0"


def _pallas_coarse() -> bool:
    """TCDIFF_PALLAS_ATTENTION=2 selects the grid=(b,) all-heads variant."""
    import os

    return os.environ.get("TCDIFF_PALLAS_ATTENTION", "0") == "2"


def mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


def sinusoidal_pos_emb(x: jnp.ndarray, dim: int) -> jnp.ndarray:
    """Diffusion-timestep embedding (`model/utils.py:36-48`): note the
    reference's half_dim-1 denominator and [sin | cos] concat order."""
    half = dim // 2
    freqs = jnp.exp(jnp.arange(half) * (-np.log(10000.0) / (half - 1)))
    args = x.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


class DenseFiLM(nn.Module):
    """FiLM generator (`model/model.py:154-168`): Mish -> Dense(2d) -> split."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, t):
        h = nn.Dense(self.dim * 2, dtype=self.dtype, name="block")(mish(t))
        h = h[:, None, :]  # (b, 1, 2d)
        scale, shift = jnp.split(h, 2, axis=-1)
        return scale, shift


def featurewise_affine(x, scale_shift):
    scale, shift = scale_shift
    return (scale + 1.0) * x + shift


class ConcatSquashLinear(nn.Module):
    """Context-gated linear (`model/model.py:15-26`)."""

    dim_out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, ctx, x):
        gate = jax.nn.sigmoid(nn.Dense(self.dim_out, dtype=self.dtype, name="hyper_gate")(ctx))
        bias = nn.Dense(self.dim_out, use_bias=False, dtype=self.dtype, name="hyper_bias")(ctx)
        return nn.Dense(self.dim_out, dtype=self.dtype, name="layer")(x) * gate + bias


class SBIMSA(nn.Module):
    """Socially/trajectory-aware multi-head attention (`model/model.py:54-107`).

    q/k/v/out projections are bias-free; logits get an optional TRPE bias
    (an embedding-table lookup realized as gather over q @ table^T); output is
    dropout(fc(attn @ v)) followed by LayerNorm(eps=1e-6) — the norm lives
    INSIDE the attention block in the reference, not outside.
    """

    n_head: int
    d_model: int
    dk: int = 64
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, q_in, k_in, v_in, shared_emb=None, trj_dist=None, *,
        deterministic=True, prenorm=None, kv_parts=None, kv_projected=False,
    ):
        h, dk = self.n_head, self.dk
        if prenorm is not None:
            # fused LN -> rotary -> projection path (TCDIFF_PALLAS_LNROT=1):
            # the caller passes the RAW residual stream + its LN params +
            # the rotary angle table instead of pre-normalized inputs
            from tcdiff_tpu.ops.fused_ln_rotary_matmul import fused_ln_rotary_matmul

            x_raw, s_ln, b_ln, angles, eps = prenorm
            b, lq = x_raw.shape[0], x_raw.shape[1]
            wq = _DenseKernel(x_raw.shape[-1], h * dk, name="w_qs")()
            if k_in is None:
                # self-attention: q,k rotated + v plain, all in one kernel
                wk = _DenseKernel(x_raw.shape[-1], h * dk, name="w_ks")()
                wv = _DenseKernel(x_raw.shape[-1], h * dk, name="w_vs")()
                qk_cat, v = fused_ln_rotary_matmul(
                    x_raw,
                    s_ln,
                    b_ln,
                    angles,
                    jnp.concatenate([wq, wk], axis=1).astype(self.dtype),
                    wv.astype(self.dtype),
                    eps=eps,
                )
                q, k = jnp.split(qk_cat, 2, axis=-1)
                lk = lq
            else:
                # cross-attention: only the query side is LN'd+rotated here
                q = fused_ln_rotary_matmul(
                    x_raw, s_ln, b_ln, angles, wq.astype(self.dtype), None, eps=eps
                )
                lk = k_in.shape[1]
                k = nn.Dense(h * dk, use_bias=False, dtype=self.dtype, name="w_ks")(k_in)
                v = nn.Dense(h * dk, use_bias=False, dtype=self.dtype, name="w_vs")(v_in)
        elif kv_parts is not None:
            # cross-attention with hoisted music-token k/v (_use_kv_cache):
            # only the 2 t_token rows are projected here; the 150 ct rows'
            # k/v ride in from the cond cache — exact same per-row math.
            # kv_parts is (kct, vct, norm_t, rot_t) raw t-rows projected
            # here, or — with kv_projected=True — (kct, vct, kt, vt)
            # already projected by the model's batched all-layer einsum
            # (_use_kv_batch).
            kct, vct, tp3, tp4 = kv_parts
            b, lq = q_in.shape[0], q_in.shape[1]
            q = nn.Dense(h * dk, use_bias=False, dtype=self.dtype, name="w_qs")(q_in)
            if kv_projected:
                kt, vt = tp3, tp4
            else:
                norm_t, rot_t = tp3, tp4
                wk = _DenseKernel(norm_t.shape[-1], h * dk, name="w_ks")().astype(self.dtype)
                wv = _DenseKernel(norm_t.shape[-1], h * dk, name="w_vs")().astype(self.dtype)
                kt = rot_t.astype(self.dtype) @ wk
                vt = norm_t.astype(self.dtype) @ wv
            k = jnp.concatenate([kct.astype(self.dtype), kt.astype(self.dtype)], axis=1)
            v = jnp.concatenate([vct.astype(self.dtype), vt.astype(self.dtype)], axis=1)
            lk = k.shape[1]
        else:
            b, lq = q_in.shape[0], q_in.shape[1]
            lk = k_in.shape[1]
            if deterministic and _use_int8():
                from tcdiff_tpu.ops.int8 import int8_dense

                q = int8_dense(q_in, _DenseKernel(q_in.shape[-1], h * dk, name="w_qs")())
                k = int8_dense(k_in, _DenseKernel(k_in.shape[-1], h * dk, name="w_ks")())
                v = int8_dense(v_in, _DenseKernel(v_in.shape[-1], h * dk, name="w_vs")())
            else:
                q = nn.Dense(h * dk, use_bias=False, dtype=self.dtype, name="w_qs")(q_in)
                k = nn.Dense(h * dk, use_bias=False, dtype=self.dtype, name="w_ks")(k_in)
                v = nn.Dense(h * dk, use_bias=False, dtype=self.dtype, name="w_vs")(v_in)
        q = q.reshape(b, lq, h, dk).transpose(0, 2, 1, 3)
        k = k.reshape(b, lk, h, dk).transpose(0, 2, 1, 3)
        v = v.reshape(b, lk, h, dk).transpose(0, 2, 1, 3)

        scale = float(1.0 / np.sqrt(dk))
        if deterministic and _use_pallas_attention():
            # inference: one fused Pallas program per (batch, head) — no
            # dropout on attention weights, no autodiff needed
            from tcdiff_tpu.ops import fused_attention

            table = None
            dist = None
            if trj_dist is not None:
                table = shared_emb.reshape(10, h, dk).transpose(1, 0, 2)
                dist = trj_dist.astype(jnp.int32)
            if dist is None and _pallas_coarse():
                from tcdiff_tpu.ops.fused_attention import fused_attention_batched

                out = fused_attention_batched(q, k, v, scale)
            else:
                out = fused_attention(q, k, v, scale, table, dist)
        else:
            logits = jnp.einsum("bhqd,bhkd->bhqk", q * jnp.asarray(scale, q.dtype), k)
            if trj_dist is not None:
                # shared_emb: (10, h*dk) table; bias[b,h,i,j] = q[b,h,i] . emb[trj_dist[b,i,j], h]
                # (the reference's gather over an indexed matrix, `model/model.py:82-94`;
                # note the bias uses the UNSCALED q there)
                table = shared_emb.reshape(10, h, dk).transpose(1, 0, 2)  # (h, 10, dk)
                indexed = jnp.einsum("bhqd,hnd->bhqn", q, table.astype(q.dtype))  # (b,h,lq,10)
                idx = jnp.broadcast_to(trj_dist[:, None, :, :], (b, h, lq, lk))
                logits = logits + jnp.take_along_axis(indexed, idx, axis=3)
            attn = jax.nn.softmax(logits, axis=-1)
            attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
            out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, lq, h * dk)
        if deterministic and _use_int8():
            from tcdiff_tpu.ops.int8 import int8_dense

            out = int8_dense(out, _DenseKernel(h * dk, self.d_model, name="fc")())
        else:
            out = nn.Dense(self.d_model, use_bias=False, dtype=self.dtype, name="fc")(out)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        if deterministic and _use_pallas_ln():
            from tcdiff_tpu.ops.fused_layernorm import fused_layernorm

            scale, bias = _LNParams(self.d_model, name="layer_norm")()
            return fused_layernorm(out, scale, bias, eps=1e-6)
        return nn.LayerNorm(**_ln_kwargs(), epsilon=1e-6, dtype=self.dtype, name="layer_norm")(out)


class TorchMHA(nn.Module):
    """torch.nn.MultiheadAttention equivalent (biased in/out projections,
    dropout on attention weights) used by the music cond encoder
    (`model/model.py:192-194,228-240`)."""

    n_head: int
    d_model: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q_in, k_in, v_in, *, deterministic=True):
        b, lq = q_in.shape[0], q_in.shape[1]
        lk = k_in.shape[1]
        h = self.n_head
        dh = self.d_model // h
        q = nn.Dense(self.d_model, dtype=self.dtype, name="q_proj")(q_in)
        k = nn.Dense(self.d_model, dtype=self.dtype, name="k_proj")(k_in)
        v = nn.Dense(self.d_model, dtype=self.dtype, name="v_proj")(v_in)
        q = q.reshape(b, lq, h, dh).transpose(0, 2, 1, 3)
        k = k.reshape(b, lk, h, dh).transpose(0, 2, 1, 3)
        v = v.reshape(b, lk, h, dh).transpose(0, 2, 1, 3)
        scale = float(1.0 / np.sqrt(dh))
        if deterministic and _use_pallas_attention():
            if _pallas_coarse():
                from tcdiff_tpu.ops.fused_attention import fused_attention_batched

                out = fused_attention_batched(q, k, v, scale)
            else:
                from tcdiff_tpu.ops import fused_attention

                out = fused_attention(q, k, v, scale)
        else:
            logits = jnp.einsum("bhqd,bhkd->bhqk", q * jnp.asarray(scale, q.dtype), k)
            attn = jax.nn.softmax(logits, axis=-1)
            attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
            out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, lq, self.d_model)
        return nn.Dense(self.d_model, dtype=self.dtype, name="out_proj")(out)


class TransformerEncoderLayer(nn.Module):
    """Pre-norm encoder layer with rotary (`model/model.py:176-245`)."""

    d_model: int
    n_head: int
    ff_size: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic=True):
        angles = jnp.asarray(rotary_freqs(x.shape[-2], self.d_model))

        h = nn.LayerNorm(**_ln_kwargs(), epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        qk = apply_rotary(h, angles)
        sa = TorchMHA(self.n_head, self.d_model, self.dropout, self.dtype, name="self_attn")(
            qk, qk, h, deterministic=deterministic
        )
        x = x + nn.Dropout(self.dropout)(sa, deterministic=deterministic)

        h = nn.LayerNorm(**_ln_kwargs(), epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        h = nn.Dense(self.ff_size, dtype=self.dtype, name="linear1")(h)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(h)
        x = x + nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return x


class FiLMTransformerDecoderLayer(nn.Module):
    """FiLM-conditioned decoder layer (`model/model.py:248-401`)."""

    d_model: int
    n_head: int
    ff_size: int
    dropout: float = 0.1
    use_traj_modulation: bool = False
    dtype: jnp.dtype = jnp.float32
    # the reference hardcodes d_k=64 (`model/model.py:55,532`); configurable
    # so small test configs stay consistent with the TRPE table sizing
    head_dim: int = 64
    # (dp, tp) Mesh for dp-sharded training: threads into the fused TRAIN
    # kernels so their Pallas programs run under shard_map with the batch
    # sharded over dp (parallel/kernel_shard.py) instead of GSPMD
    # all-gathering the custom-call operands. None = single-device/unsharded.
    mesh: Any = None

    @nn.compact
    def __call__(self, x, memory, t, traj_emb, shared_emb, trj_dist=None, *,
                 deterministic=True, kv_cache=None, kv_projected=False,
                 tile_sa=False):
        """tile_sa: CFG-dedup mode (see _use_cfg_dedup) — x/traj_emb/
        trj_dist arrive at HALF batch; the self-attention block runs once
        and its output is tiled to the doubled batch at the first FiLM
        (where cond_hidden, and thus the halves, first diverge)."""
        d = self.d_model
        angles_x = jnp.asarray(rotary_freqs(x.shape[-2], d))
        angles_m = (
            None if memory is None else jnp.asarray(rotary_freqs(memory.shape[-2], d))
        )

        fuse_lnrot = deterministic and _use_pallas_lnrot()

        # in-kernel film needs the doubled batch inside the SA kernel, so
        # dedup mode falls back to the external film add at this site
        fuse_film = deterministic and _use_fuse_film() and not tile_sa

        # whole-layer fusion (TCDIFF_LAYER_FUSE): SA + cached-k/v CA + FF
        # + tail in one Pallas program (ops/fused_layer.py); the per-block
        # sections below are skipped when it applies
        use_layer = (
            deterministic and _use_layer_fuse() and kv_cache is not None
            and trj_dist is None and not tile_sa
        )
        if use_layer:
            from tcdiff_tpu.ops.fused_layer import fused_layer

            s1, b1 = _LNParams(d, name="norm1")()
            wq, wk, wv, fc, sa_s2, sa_b2 = _SAParams(
                d, self.n_head * self.head_dim, name="self_attn"
            )()
            fsc, fsh = DenseFiLM(d, self.dtype, name="film1")(t)
            n2s, n2b = _LNParams(d, name="norm2")()
            cwq, cwk, cwv, cfc, cs2, cb2 = _SAParams(
                d, self.n_head * self.head_dim, name="multihead_attn"
            )()
            fsc2, fsh2 = DenseFiLM(d, self.dtype, name="film2")(t)
            s3, b3 = _LNParams(d, name="norm3")()
            k1, bb1 = _DenseParams(d, self.ff_size, name="linear1")()
            k2f, bb2f = _DenseParams(self.ff_size, d, name="linear2")()
            fsc3, fsh3 = DenseFiLM(d, self.dtype, name="film3")(t)
            s4, b4 = _LNParams(d, name="norm4")()
            k3, bb3 = _DenseParams(d, d, name="linear3")()

            # assemble the full cross-attention k/v outside the kernel:
            # cached music rows + the 2 per-step t rows (tiny XLA concat,
            # identical math to the SBIMSA kv_parts path)
            kct, vct, tp3, tp4 = kv_cache
            if kv_projected:
                kt, vt = tp3, tp4
            else:
                norm_t, rot_t = tp3, tp4
                kt = rot_t.astype(self.dtype) @ cwk.astype(self.dtype)
                vt = norm_t.astype(self.dtype) @ cwv.astype(self.dtype)
            kcat = jnp.concatenate(
                [kct.astype(self.dtype), kt.astype(self.dtype)], axis=1
            )
            vcat = jnp.concatenate(
                [vct.astype(self.dtype), vt.astype(self.dtype)], axis=1
            )
            common = (
                x, angles_x,
                s1, b1,
                wq.astype(self.dtype), wk.astype(self.dtype),
                wv.astype(self.dtype), fc.astype(self.dtype), sa_s2, sa_b2,
                fsc[:, 0], fsh[:, 0],
                n2s, n2b, cwq.astype(self.dtype), cfc.astype(self.dtype),
                cs2, cb2, kcat, vcat, fsc2[:, 0], fsh2[:, 0],
            )
            if _layer_fuse_ff():
                x = fused_layer(
                    *common,
                    s3, b3, k1.astype(self.dtype), bb1,
                    k2f.astype(self.dtype), bb2f, fsc3[:, 0], fsh3[:, 0],
                    s4, b4, k3.astype(self.dtype), bb3,
                    nhead=self.n_head, mesh=self.mesh,
                )
            else:
                from tcdiff_tpu.ops.fused_ff_block import fused_ff_tail

                x = fused_layer(
                    *common, nhead=self.n_head, include_ff=False,
                    mesh=self.mesh,
                )
                x = fused_ff_tail(
                    x, s3, b3,
                    k1.astype(self.dtype), bb1, k2f.astype(self.dtype), bb2f,
                    fsc3[:, 0], fsh3[:, 0], s4, b4,
                    k3.astype(self.dtype), bb3, eps=1e-5, mesh=self.mesh,
                )

        # self-attention + FiLM(t)
        if use_layer:
            pass  # handled by the whole-layer program above
        elif deterministic and _use_pallas_sab():
            from tcdiff_tpu.ops.fused_sa_block import fused_sa_block

            s1, b1 = _LNParams(d, name="norm1")()
            wq, wk, wv, fc, s2, b2 = _SAParams(d, self.n_head * self.head_dim, name="self_attn")()
            fsc, fsh = DenseFiLM(d, self.dtype, name="film1")(t)
            sab_args = (
                x, s1, b1, angles_x,
                wq.astype(self.dtype), wk.astype(self.dtype), wv.astype(self.dtype),
                fc.astype(self.dtype), s2, b2,
                shared_emb if trj_dist is not None else None, trj_dist,
            )
            if fuse_film:
                x = fused_sa_block(
                    *sab_args, fsc[:, 0], fsh[:, 0], nhead=self.n_head,
                    mesh=self.mesh,
                )
            else:
                sa = fused_sa_block(*sab_args, nhead=self.n_head, mesh=self.mesh)
                if tile_sa:
                    sa = jnp.concatenate([sa, sa], axis=0)
                    x = jnp.concatenate([x, x], axis=0)
                    traj_emb = jnp.concatenate([traj_emb, traj_emb], axis=0)
                x = x + featurewise_affine(sa, (fsc, fsh))
        elif (not deterministic) and _use_train_sab(self.mesh) and trj_dist is None:
            # fused TRAIN self-attention block: custom-VJP Pallas program
            # (ops/fused_sa_block_train.py); params shared 1:1 with the
            # unfused flax path via the stand-in modules
            from tcdiff_tpu.ops.fused_sa_block_train import (
                fused_sa_block_train,
                sa_train_tables,
            )

            s1, b1 = _LNParams(d, name="norm1")()
            wq, wk, wv, fc, s2, b2 = _SAParams(
                d, self.n_head * self.head_dim, name="self_attn"
            )()
            fsc, fsh = DenseFiLM(d, self.dtype, name="film1")(t)
            cos, ssin = sa_train_tables(x, angles_x, d)
            rate = float(self.dropout)
            if rate > 0.0:
                seeds = jax.random.bits(
                    self.make_rng("dropout"), (x.shape[0],), jnp.uint32
                )
            else:
                seeds = jnp.zeros((x.shape[0],), jnp.uint32)
            x = fused_sa_block_train(
                x, s1, b1, cos, ssin,
                wq.astype(self.dtype), wk.astype(self.dtype),
                wv.astype(self.dtype), fc.astype(self.dtype), s2, b2,
                fsc[:, 0], fsh[:, 0], seeds,
                self.n_head, rate, 1e-5, 1e-6, self.mesh,
            )
        else:
            if fuse_lnrot:
                s1, b1 = _LNParams(d, name="norm1")()
                sa = SBIMSA(self.n_head, d, self.head_dim, self.dropout, self.dtype, name="self_attn")(
                    None, None, None, shared_emb, trj_dist,
                    deterministic=deterministic, prenorm=(x, s1, b1, angles_x, 1e-5),
                )
            else:
                h = nn.LayerNorm(**_ln_kwargs(), epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
                qk = apply_rotary(h, angles_x)
                sa = SBIMSA(self.n_head, d, self.head_dim, self.dropout, self.dtype, name="self_attn")(
                    qk, qk, h, shared_emb, trj_dist, deterministic=deterministic
                )
            sa = nn.Dropout(self.dropout)(sa, deterministic=deterministic)
            if tile_sa:
                sa = jnp.concatenate([sa, sa], axis=0)
                x = jnp.concatenate([x, x], axis=0)
                traj_emb = jnp.concatenate([traj_emb, traj_emb], axis=0)
            x = x + featurewise_affine(sa, DenseFiLM(d, self.dtype, name="film1")(t))

        # cross-attention to music/time tokens + FiLM(t)
        # trj_dist applies only to dancer-token self-attention: the reference
        # forwards it to cross-attention too (`model/model.py:331-333`) but its
        # gather shapes are only consistent for query-length keys, and no
        # reference entry point ever passes a non-None trj_dist.
        k = None if memory is None else apply_rotary(memory, angles_m)
        if use_layer:
            pass  # handled by the whole-layer program above
        elif kv_cache is not None:
            # hoisted music-token k/v (_use_kv_cache): q side as usual,
            # k/v assembled inside SBIMSA from the cache + t-token rows
            h = nn.LayerNorm(**_ln_kwargs(), epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
            q = apply_rotary(h, angles_x)
            ca = SBIMSA(self.n_head, d, self.head_dim, self.dropout, self.dtype, name="multihead_attn")(
                q, None, None, shared_emb, None,
                deterministic=deterministic, kv_parts=kv_cache,
                kv_projected=kv_projected,
            )
            ca = nn.Dropout(self.dropout)(ca, deterministic=deterministic)
            x = x + featurewise_affine(ca, DenseFiLM(d, self.dtype, name="film2")(t))
        elif deterministic and _use_pallas_xab():
            from tcdiff_tpu.ops.fused_ca_block import fused_ca_block

            s2, b2 = _LNParams(d, name="norm2")()
            cwq, cwk, cwv, cfc, cs2, cb2 = _SAParams(
                d, self.n_head * self.head_dim, name="multihead_attn"
            )()
            fsc2, fsh2 = DenseFiLM(d, self.dtype, name="film2")(t)
            xab_args = (
                x, s2, b2, angles_x, memory, k,
                cwq.astype(self.dtype), cwk.astype(self.dtype),
                cwv.astype(self.dtype), cfc.astype(self.dtype), cs2, cb2,
            )
            if fuse_film:
                x = fused_ca_block(
                    *xab_args, fsc2[:, 0], fsh2[:, 0], nhead=self.n_head,
                    mesh=self.mesh,
                )
            else:
                ca = fused_ca_block(*xab_args, nhead=self.n_head, mesh=self.mesh)
                x = x + featurewise_affine(ca, (fsc2, fsh2))
        elif (not deterministic) and _use_train_xab(self.mesh) and memory is not None:
            # fused TRAIN cross-attention block: custom-VJP Pallas program
            # (ops/fused_ca_block_train.py); params shared 1:1 with the
            # unfused flax path via the stand-in modules
            from tcdiff_tpu.ops.fused_ca_block_train import fused_ca_block_train
            from tcdiff_tpu.ops.fused_sa_block_train import sa_train_tables

            s2ln, b2ln = _LNParams(d, name="norm2")()
            cwq, cwk, cwv, cfc, cs2, cb2 = _SAParams(
                d, self.n_head * self.head_dim, name="multihead_attn"
            )()
            fsc2, fsh2 = DenseFiLM(d, self.dtype, name="film2")(t)
            cosx, ssinx = sa_train_tables(x, angles_x, d)
            cosm, ssinm = sa_train_tables(memory, angles_m, d)
            rate = float(self.dropout)
            if rate > 0.0:
                seeds = jax.random.bits(
                    self.make_rng("dropout"), (x.shape[0],), jnp.uint32
                )
            else:
                seeds = jnp.zeros((x.shape[0],), jnp.uint32)
            x = fused_ca_block_train(
                x, memory, s2ln, b2ln, cosx, ssinx, cosm, ssinm,
                cwq.astype(self.dtype), cwk.astype(self.dtype),
                cwv.astype(self.dtype), cfc.astype(self.dtype), cs2, cb2,
                fsc2[:, 0], fsh2[:, 0], seeds,
                self.n_head, rate, 1e-5, 1e-6, self.mesh,
            )
        else:
            if fuse_lnrot:
                s2, b2 = _LNParams(d, name="norm2")()
                ca = SBIMSA(self.n_head, d, self.head_dim, self.dropout, self.dtype, name="multihead_attn")(
                    None, k, memory, shared_emb, None,
                    deterministic=deterministic, prenorm=(x, s2, b2, angles_x, 1e-5),
                )
            else:
                h = nn.LayerNorm(**_ln_kwargs(), epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
                q = apply_rotary(h, angles_x)
                ca = SBIMSA(self.n_head, d, self.head_dim, self.dropout, self.dtype, name="multihead_attn")(
                    q, k, memory, shared_emb, None, deterministic=deterministic
                )
            ca = nn.Dropout(self.dropout)(ca, deterministic=deterministic)
            x = x + featurewise_affine(ca, DenseFiLM(d, self.dtype, name="film2")(t))

        # feed-forward + FiLM(t)
        fuse_lnmm = deterministic and _use_pallas_lnmm()
        quant = deterministic and _use_int8()
        if quant:
            from tcdiff_tpu.ops.int8 import int8_dense
        tail_done = False
        if use_layer:
            tail_done = True  # FF + tail handled by the whole-layer program
        elif deterministic and _use_pallas_ffb():
            from tcdiff_tpu.ops.fused_ff_block import fused_ff_block, fused_ff_tail

            s3, b3 = _LNParams(d, name="norm3")()
            k1, bb1 = _DenseParams(d, self.ff_size, name="linear1")()
            k2f, bb2f = _DenseParams(self.ff_size, d, name="linear2")()
            fsc3, fsh3 = DenseFiLM(d, self.dtype, name="film3")(t)
            if _use_ffb_tail():
                s4, b4 = _LNParams(d, name="norm4")()
                k3, bb3 = _DenseParams(d, d, name="linear3")()
                x = fused_ff_tail(
                    x, s3, b3,
                    k1.astype(self.dtype), bb1, k2f.astype(self.dtype), bb2f,
                    fsc3[:, 0], fsh3[:, 0], s4, b4,
                    k3.astype(self.dtype), bb3, eps=1e-5, mesh=self.mesh,
                )
                tail_done = True
            elif fuse_film:
                x = fused_ff_block(
                    x, s3, b3,
                    k1.astype(self.dtype), bb1, k2f.astype(self.dtype), bb2f,
                    fsc3[:, 0], fsh3[:, 0], eps=1e-5, mesh=self.mesh,
                )
            else:
                h = fused_ff_block(
                    x, s3, b3,
                    k1.astype(self.dtype), bb1, k2f.astype(self.dtype), bb2f,
                    eps=1e-5, mesh=self.mesh,
                )
                x = x + featurewise_affine(h, (fsc3, fsh3))
        elif (not deterministic) and _use_train_ffb(self.mesh):
            # fused TRAIN FF block + tail: custom-VJP Pallas program
            # (ops/fused_ff_block_train.py); params shared 1:1 with the
            # unfused flax path via the stand-in modules
            from tcdiff_tpu.ops.fused_ff_block_train import fused_ff_tail_train

            s3, b3 = _LNParams(d, name="norm3")()
            k1, bb1 = _DenseParams(d, self.ff_size, name="linear1")()
            k2f, bb2f = _DenseParams(self.ff_size, d, name="linear2")()
            fsc3, fsh3 = DenseFiLM(d, self.dtype, name="film3")(t)
            s4, b4 = _LNParams(d, name="norm4")()
            k3, bb3 = _DenseParams(d, d, name="linear3")()
            rate = float(self.dropout)
            if rate > 0.0:
                seeds = jax.random.bits(
                    self.make_rng("dropout"), (x.shape[0],), jnp.uint32
                )
            else:
                seeds = jnp.zeros((x.shape[0],), jnp.uint32)
            x = fused_ff_tail_train(
                x, s3, b3,
                k1.astype(self.dtype), bb1, k2f.astype(self.dtype), bb2f,
                fsc3[:, 0], fsh3[:, 0], s4, b4,
                k3.astype(self.dtype), bb3, seeds, rate, 1e-5, self.mesh,
            )
            tail_done = True
        else:
            if fuse_lnmm:
                from tcdiff_tpu.ops.fused_ln_matmul import fused_ln_matmul

                s3, b3 = _LNParams(d, name="norm3")()
                k1, bb1 = _DenseParams(d, self.ff_size, name="linear1")()
                h = fused_ln_matmul(x, s3, b3, k1.astype(self.dtype), bb1, eps=1e-5)
            elif quant:
                h = nn.LayerNorm(**_ln_kwargs(), epsilon=1e-5, dtype=self.dtype, name="norm3")(x)
                k1, bb1 = _DenseParams(d, self.ff_size, name="linear1")()
                h = int8_dense(h, k1, bb1)
            else:
                h = nn.LayerNorm(**_ln_kwargs(), epsilon=1e-5, dtype=self.dtype, name="norm3")(x)
                h = nn.Dense(self.ff_size, dtype=self.dtype, name="linear1")(h)
            h = jax.nn.gelu(h, approximate=False)
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
            if quant:
                k2q, bb2 = _DenseParams(self.ff_size, d, name="linear2")()
                h = int8_dense(h, k2q, bb2)
            else:
                h = nn.Dense(d, dtype=self.dtype, name="linear2")(h)
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
            x = x + featurewise_affine(h, DenseFiLM(d, self.dtype, name="film3")(t))

        # the reference ends every layer with linear3(norm4(x)) (`model/model.py:344`)
        if tail_done:
            pass  # fused_ff_tail already applied norm4 + linear3 in-kernel
        elif fuse_lnmm:
            from tcdiff_tpu.ops.fused_ln_matmul import fused_ln_matmul

            s4, b4 = _LNParams(d, name="norm4")()
            k3, bb3 = _DenseParams(d, d, name="linear3")()
            x = fused_ln_matmul(x, s4, b4, k3.astype(self.dtype), bb3, eps=1e-5)
        elif quant:
            k3, bb3 = _DenseParams(d, d, name="linear3")()
            x = int8_dense(
                nn.LayerNorm(**_ln_kwargs(), epsilon=1e-5, dtype=self.dtype, name="norm4")(x),
                k3, bb3,
            )
        else:
            x = nn.Dense(d, dtype=self.dtype, name="linear3")(
                nn.LayerNorm(**_ln_kwargs(), epsilon=1e-5, dtype=self.dtype, name="norm4")(x)
            )

        # ConcatSquash trajectory modulation. In the reference this result is
        # computed then dropped (`model/model.py:351-355` assigns `out`,
        # `:371` returns `x`); with the flag off we keep parameters but skip
        # the dead compute (XLA would DCE it anyway).
        ctx = jnp.concatenate([t[:, None, :], traj_emb], axis=-2)
        out = ConcatSquashLinear(128, self.dtype, name="traj_mod0")(ctx, x)
        out = jax.nn.leaky_relu(out)
        out = ConcatSquashLinear(128, self.dtype, name="traj_mod1")(ctx, out)
        out = jax.nn.leaky_relu(out)
        out = ConcatSquashLinear(d, self.dtype, name="traj_mod2")(ctx, out)
        if self.use_traj_modulation:
            x = out
        return x


class _PositionalFiLMLayer(FiLMTransformerDecoderLayer):
    """Adapter for nn.remat: `deterministic` as a static POSITIONAL arg
    (jax.checkpoint cannot trace a python-bool kwarg)."""

    @nn.compact
    def __call__(self, x, memory, t, traj_emb, shared_emb, trj_dist, deterministic):  # noqa: D401
        return super().__call__(
            x, memory, t, traj_emb, shared_emb, trj_dist, deterministic=deterministic
        )


class DanceDecoder(nn.Module):
    """Full denoiser (`model/model.py:416-624`).

    __call__(x, cond, times, keep_mask) with
      x: (b, seq_len*dn, 151) noised motion, time-major token order
      cond: (b, 301, 438) music features @ 60 FPS
      times: (b,) diffusion timesteps
      keep_mask: (b,) bool, True = keep the real music condition
                 (None = keep everywhere). Replaces the reference's
                 cond_drop_prob RNG (`model/utils.py:52-58`).
    """

    cfg: DanceDecoderConfig
    use_traj_modulation: bool = False
    dtype: jnp.dtype = jnp.float32
    remat: bool = False  # rematerialize decoder layers (memory <- FLOPs)
    # (dp, tp) Mesh threaded to the fused TRAIN kernels so their Pallas
    # programs shard the batch over dp via shard_map (see
    # FiLMTransformerDecoderLayer.mesh); None = unsharded/single-device
    mesh: Any = None

    @nn.compact
    def __call__(
        self, x, cond, times, keep_mask=None, trj_dist=None, *,
        deterministic=True, cond_cache=None, return_cond_cache=False,
        cfg_pair=False,
    ):
        """`cond_cache`/`return_cond_cache`: the music-cond encoding is
        independent of x and t, so samplers encode it ONCE
        (return_cond_cache=True -> (ct, cond_hidden)) and replay it through
        every denoising step via cond_cache — exact math, hoisted out of the
        50-step scan. The reference re-encodes the condition in all 100
        forwards per clip (`model/model.py:571-581`).

        `cfg_pair=True` (CFG dedup, see _use_cfg_dedup): x and trj_dist
        arrive at HALF the batch of cond/times/keep_mask; the x-only
        prefix (input/fusion/trajectory projections, layer-0 self-attn)
        runs once and is tiled to the doubled batch at the first FiLM.
        Exact math; output is doubled-batch. Not supported with remat."""
        if cfg_pair:
            assert not self.remat, "cfg_pair dedup is a sampling-path feature"
        cfg = self.cfg
        d = cfg.latent_dim
        if keep_mask is None:
            b0 = cond.shape[0] if x is None else x.shape[0]
            keep_mask = jnp.ones((b0,), dtype=bool)

        # CFG null embeddings (`model/model.py:468-469,585-611`)
        null_cond_embed = self.param(
            "null_cond_embed", nn.initializers.normal(1.0), (1, cfg.seq_len, d), jnp.float32
        )
        null_cond_hidden = self.param(
            "null_cond_hidden", nn.initializers.normal(1.0), (1, d), jnp.float32
        )

        if cond_cache is None:
            # music condition: pack 2 frames (60 -> 30 FPS), project, encode
            # (`model/model.py:571-581`)
            cond = cond.astype(self.dtype)
            b = cond.shape[0]
            if cond.shape[1] % 2 == 1:
                cond = cond[:, :-1]
            cond2 = cond.reshape(b, cond.shape[1] // 2, cfg.cond_feature_dim * 2)
            ct = nn.Dense(cfg.cond_feature_dim, dtype=self.dtype, name="cond_projection_0")(cond2)
            ct = jax.nn.relu(ct)
            ct = nn.Dense(d, dtype=self.dtype, name="cond_projection_1")(ct)
            for i in range(2):
                ct = TransformerEncoderLayer(
                    d, cfg.num_heads, cfg.ff_size, cfg.dropout, self.dtype, name=f"cond_encoder_{i}"
                )(ct, deterministic=deterministic)

            km3 = keep_mask[:, None, None]
            ct = jnp.where(km3, ct, null_cond_embed.astype(self.dtype))

            pooled = jnp.mean(ct, axis=-2)
            ch = nn.LayerNorm(**_ln_kwargs(), epsilon=1e-6, dtype=self.dtype, name="non_attn_norm")(pooled)
            ch = nn.Dense(d, dtype=self.dtype, name="non_attn_dense0")(ch)
            ch = jax.nn.silu(ch)
            cond_hidden = nn.Dense(d, dtype=self.dtype, name="non_attn_dense1")(ch)
            cond_hidden = jnp.where(
                keep_mask[:, None], cond_hidden, null_cond_hidden.astype(self.dtype)
            )
            if return_cond_cache:
                # the remat layer path cannot thread kv_cache through
                # nn.remat's positional adapter — under remat the hoist is
                # skipped and the plain (ct, cond_hidden) cache is returned
                # (ADVICE r2: default-ON kv-cache used to crash remat models)
                if _use_kv_cache() and not self.remat:
                    # hoist the cross-attention k/v of the music tokens:
                    # row-wise norm_cond + per-position rotary + per-layer
                    # k/v projections of the ct rows are t-independent
                    norm_ct = nn.LayerNorm(
                        **_ln_kwargs(), epsilon=1e-6, dtype=self.dtype, name="norm_cond"
                    )(ct)
                    ang_full = jnp.asarray(rotary_freqs(ct.shape[1] + 2, d))
                    rot_ct = apply_rotary(norm_ct, ang_full[: ct.shape[1]])
                    kv = []
                    wks, wvs = [], []
                    for i in range(cfg.num_layers):
                        wk_i, wv_i = _LayerCAKV(
                            d, cfg.head_dim * cfg.num_heads, name=f"decoder_{i}"
                        )()
                        kv.append((
                            rot_ct.astype(self.dtype) @ wk_i.astype(self.dtype),
                            norm_ct.astype(self.dtype) @ wv_i.astype(self.dtype),
                        ))
                        wks.append(wk_i)
                        wvs.append(wv_i)
                    if _use_kv_batch():
                        # carry the stacked per-layer k/v kernels so each
                        # sampling step can project ALL layers' 2 t-token
                        # rows in one batched einsum (_use_kv_batch)
                        w_stack = (
                            jnp.stack(wks).astype(self.dtype),
                            jnp.stack(wvs).astype(self.dtype),
                        )
                        return ct, cond_hidden, tuple(kv), w_stack
                    return ct, cond_hidden, tuple(kv)
                return ct, cond_hidden
        else:
            kv_w_stack = None
            if len(cond_cache) == 4:
                ct, cond_hidden, kv_list, kv_w_stack = cond_cache
            elif len(cond_cache) == 3:
                ct, cond_hidden, kv_list = cond_cache
            else:
                ct, cond_hidden = cond_cache
                kv_list = None
            if self.remat:
                # a hoisted-k/v cache built without remat: fall back to the
                # full-memory path rather than dropping kv in the layers
                kv_list = None
                kv_w_stack = None
            ct = ct.astype(self.dtype)
            cond_hidden = cond_hidden.astype(self.dtype)

        if cond_cache is None:
            kv_list = None
            kv_w_stack = None

        b, tokens, nfeats = x.shape
        dn = tokens // cfg.seq_len
        x = x.astype(self.dtype)

        # per-token XY deltas -> traj embedding (`model/model.py:557`)
        xy = x[:, :, [4, 5]]
        deltas = xy[:, 1:] - xy[:, :-1]  # (b, tokens-1, 2)
        traj_emb = nn.Dense(64, dtype=self.dtype, name="traj_embedding_0")(deltas)
        traj_emb = jax.nn.relu(traj_emb)
        traj_emb = nn.Dense(d, dtype=self.dtype, name="traj_embedding_1")(traj_emb)

        # input projection + fusion projection over the dancers of each frame
        if _fusion_einsum():
            # dancer-blocked einsums: never materialize the (b, seq, d*dn)
            # retile — see _fusion_einsum. Param names/shapes match the
            # nn.Dense path exactly, so checkpoints are interchangeable.
            x4 = x.reshape(b, cfg.seq_len, dn, nfeats)
            h4 = nn.Dense(d, dtype=self.dtype, name="input_projection")(x4)
            k0, b0_ = _DenseParams(d * dn, d * 2, name="relative_projection_0")()
            f = jnp.einsum(
                "bsjd,jdf->bsf", h4, k0.reshape(dn, d, d * 2).astype(self.dtype)
            ) + b0_.astype(self.dtype)
            f = jax.nn.relu(f)
            f = nn.Dense(d * 2, dtype=self.dtype, name="relative_projection_1")(f)
            f = jax.nn.relu(f)
            k2, b2_ = _DenseParams(d * 2, d * dn, name="relative_projection_2")()
            h4 = jnp.einsum(
                "bsf,fjd->bsjd", f, k2.reshape(d * 2, dn, d).astype(self.dtype)
            ) + b2_.reshape(dn, d).astype(self.dtype)
            h = h4.reshape(b, tokens, d)
        else:
            h = nn.Dense(d, dtype=self.dtype, name="input_projection")(x)
            f = h.reshape(b, cfg.seq_len, d * dn)
            f = nn.Dense(d * 2, dtype=self.dtype, name="relative_projection_0")(f)
            f = jax.nn.relu(f)
            f = nn.Dense(d * 2, dtype=self.dtype, name="relative_projection_1")(f)
            f = jax.nn.relu(f)
            f = nn.Dense(d * dn, dtype=self.dtype, name="relative_projection_2")(f)
            h = f.reshape(b, tokens, d)

        # timestep embedding (`model/model.py:454-465,601-612`)
        t_hidden = sinusoidal_pos_emb(times, d).astype(self.dtype)
        t_hidden = nn.Dense(d * 4, dtype=self.dtype, name="time_mlp")(t_hidden)
        t_hidden = mish(t_hidden)
        t = nn.Dense(d, dtype=self.dtype, name="to_time_cond")(t_hidden)
        t_tokens = nn.Dense(d * 2, dtype=self.dtype, name="to_time_tokens")(t_hidden)
        # times (and thus t_tokens) are at the FULL batch — in cfg_pair mode
        # that is 2x the x-side b
        t_tokens = t_tokens.reshape(times.shape[0], 2, d)

        t = t + cond_hidden

        if kv_list is not None:
            # hoisted-k/v mode: only the 2 t_token rows need norm+rotary;
            # the layers never materialize the full memory
            norm_t = nn.LayerNorm(
                **_ln_kwargs(), epsilon=1e-6, dtype=self.dtype, name="norm_cond"
            )(t_tokens)
            ang_full = jnp.asarray(rotary_freqs(ct.shape[1] + 2, d))
            rot_t = apply_rotary(norm_t, ang_full[ct.shape[1]:])
            memory = None
            kt_all = vt_all = None
            if kv_w_stack is not None:
                # batched all-layer t-row projection (_use_kv_batch): one
                # (L_layers) einsum pair per step instead of 2 tiny matmuls
                # inside every decoder layer — exact same per-row math
                wk_all, wv_all = kv_w_stack
                kt_all = jnp.einsum(
                    "btd,ldh->lbth", rot_t.astype(self.dtype), wk_all
                )
                vt_all = jnp.einsum(
                    "btd,ldh->lbth", norm_t.astype(self.dtype), wv_all
                )
        else:
            memory = jnp.concatenate([ct, t_tokens], axis=-2)
            memory = nn.LayerNorm(**_ln_kwargs(), epsilon=1e-6, dtype=self.dtype, name="norm_cond")(memory)

        # shared TRPE embedding table (`model/model.py:532-533`)
        shared_emb = self.param(
            "embeddings_table",
            nn.initializers.normal(1.0),
            (cfg.max_dancers, cfg.head_dim * cfg.num_heads),
            jnp.float32,
        )

        # remat: deterministic is arg 6 (after self-shift) and must be static
        layer_cls = (
            nn.remat(_PositionalFiLMLayer, static_argnums=(7,))
            if self.remat
            else FiLMTransformerDecoderLayer
        )
        for i in range(cfg.num_layers):
            layer = layer_cls(
                d,
                cfg.num_heads,
                cfg.ff_size,
                cfg.dropout,
                self.use_traj_modulation,
                self.dtype,
                cfg.head_dim,
                mesh=self.mesh,
                name=f"decoder_{i}",
            )
            if self.remat:
                h = layer(h, memory, t, traj_emb, shared_emb, trj_dist, deterministic)
            else:
                if kv_list is None:
                    kv_cache_i, kv_proj = None, False
                elif kt_all is not None:
                    kv_cache_i = (kv_list[i][0], kv_list[i][1], kt_all[i], vt_all[i])
                    kv_proj = True
                else:
                    kv_cache_i = (kv_list[i][0], kv_list[i][1], norm_t, rot_t)
                    kv_proj = False
                h = layer(
                    h, memory, t, traj_emb, shared_emb, trj_dist,
                    deterministic=deterministic,
                    kv_cache=kv_cache_i,
                    kv_projected=kv_proj,
                    tile_sa=cfg_pair and i == 0,
                )
            if cfg_pair and i == 0:
                # layer 0 tiled h internally; tile the x-side companions
                # for the remaining (doubled-batch) layers
                traj_emb = jnp.concatenate([traj_emb, traj_emb], axis=0)
                if trj_dist is not None:
                    trj_dist = jnp.concatenate([trj_dist, trj_dist], axis=0)

        out = nn.Dense(cfg.nfeats, dtype=self.dtype, name="final_layer")(h)
        return out.astype(jnp.float32)


def guided_forward(model: DanceDecoder, params, x, cond, times, guidance_weight, trj_dist=None):
    """Classifier-free guidance as ONE doubled-batch forward.

    The reference calls the network twice per step (`model/model.py:542-546`);
    batching the conditional and unconditional passes halves kernel launches
    and doubles MXU utilization at identical math.
    """
    b = x.shape[0]
    keep = jnp.concatenate([jnp.zeros((b,), bool), jnp.ones((b,), bool)])
    xx = jnp.concatenate([x, x], axis=0)
    cc = jnp.concatenate([cond, cond], axis=0)
    tt = jnp.concatenate([times, times], axis=0)
    td = None if trj_dist is None else jnp.concatenate([trj_dist, trj_dist], axis=0)
    out = model.apply({"params": params}, xx, cc, tt, keep, td, deterministic=True)
    unc, c = out[:b], out[b:]
    return unc + (c - unc) * guidance_weight
