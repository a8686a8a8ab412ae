"""Paired single-process SAMPLER A/B: measure several serving configs in
ONE process so they share the session (tunnel state, host load, clocks) —
the same methodology as tools/ab_train.py, applied to the headline metric.
Cross-process spread of identical sampler configs is the 191-197 band
(BENCH_NOTES r4/r5); any <5% batch-point or flag decision needs pairing.

Usage:
    python tools/ab_sample.py 'b16=BENCH_BATCH=16' 'b20=BENCH_BATCH=20' ...

Each positional arg is `label=ENV1=v1,ENV2=v2` (empty env list = defaults:
batch 16 bf16, the shipped serving config). Each config re-sets the env
vars, clears jax caches (kernel gates read env at trace time), AOT-compiles
the 50-step DDIM sampler at the bench shapes (50-step DDIM, eta 1, CFG as
one doubled batch, 3 dancers — `/root/reference/model/diffusion.py:386-442`
and `test_demo.py` defaults), and times BENCH_REPS (default 5) calls with
the per-call host-sync methodology bench.py uses. One JSON line per config
with s-motion/s and analytic MFU. Pass A,B,A order to bracket drift.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(label, env_pairs):
    import jax
    import jax.numpy as jnp
    import numpy as np

    for kv in env_pairs:
        if not kv:
            continue
        k, _, v = kv.partition("=")
        os.environ[k] = v
    jax.clear_caches()

    from bench import V5E_PEAK_BF16, _analytic_sampler_flops, _baseline_target
    from tcdiff_tpu.config import DanceDecoderConfig, DiffusionConfig
    from tcdiff_tpu.diffusion import GaussianDiffusion
    from tcdiff_tpu.models import DanceDecoder

    batch = int(os.environ.get("BENCH_BATCH", "16"))
    if os.environ.get("AB_TINY", "0") == "1":
        # CPU smoke-test config: proves the harness, numbers meaningless
        cfg = DanceDecoderConfig(
            seq_len=12, latent_dim=64, ff_size=64, num_layers=1,
            num_heads=4, cond_feature_dim=16, dancer_num=3,
        )
        dcfg = DiffusionConfig(sampling_timesteps=3, n_timestep=10)
    else:
        cfg = DanceDecoderConfig(dancer_num=3)
        dcfg = DiffusionConfig()
    dtype = jnp.bfloat16 if os.environ.get("BENCH_DTYPE", "bf16") == "bf16" else jnp.float32
    model = DanceDecoder(cfg, dtype=dtype)
    diff = GaussianDiffusion(model, dcfg)
    tokens = cfg.seq_len * cfg.dancer_num
    cond_len = 301 if cfg.seq_len == 150 else 2 * cfg.seq_len + 1
    shape = (batch, tokens, cfg.nfeats)

    rng = np.random.default_rng(0)
    cond = jnp.asarray(rng.normal(size=(batch, cond_len, cfg.cond_feature_dim)).astype(np.float32))
    x0 = jnp.asarray(rng.normal(size=(batch, tokens, 3)).astype(np.float32) * 0.1)
    params = model.init(
        jax.random.key(0),
        jnp.zeros((1, tokens, cfg.nfeats)),
        jnp.zeros((1, cond_len, cfg.cond_feature_dim)),
        jnp.zeros((1,), jnp.int32),
    )["params"]

    def _sample_fn(params, cond, key, x0):
        return diff.ddim_sample(params, shape, cond, key, x0)

    sample = (
        jax.jit(_sample_fn).lower(params, cond, jax.random.key(1), x0).compile()
    )
    # warmup + per-rep host scalar fetch: block_until_ready alone does not
    # reliably synchronize through the axon tunnel (bench.py methodology)
    out = sample(params, cond, jax.random.key(1), x0)
    float(jnp.sum(out))
    reps = int(os.environ.get("BENCH_REPS", "5"))
    t0 = time.perf_counter()
    for i in range(reps):
        out = sample(params, cond, jax.random.key(2 + i), x0)
        float(jnp.sum(out))
    elapsed = (time.perf_counter() - t0) / reps

    throughput = batch * 5.0 / elapsed  # 5 s of motion per clip, one chip
    res = {
        "ab_label": label,
        "s_motion_per_s": round(throughput, 1),
        "batch": batch,
        "vs_baseline": round(throughput / _baseline_target(), 3),
    }
    if jax.devices()[0].platform != "cpu":
        an = _analytic_sampler_flops(cfg, batch, dcfg.sampling_timesteps)
        res["mfu_vs_v5e_bf16_peak"] = round(an / elapsed / V5E_PEAK_BF16, 4)
    print(json.dumps(res), flush=True)
    del sample, out, params, cond, x0
    return elapsed


def main():
    if os.environ.get("AB_CPU", "0") == "1":
        # force CPU before backend init (JAX_PLATFORMS alone is defeated
        # by sitecustomize's axon TPU grab — see tests/conftest.py)
        import jax

        jax.config.update("jax_platforms", "cpu")
    base = dict(os.environ)
    for spec in sys.argv[1:]:
        # restore the base env so one config's flags can't leak into the next
        os.environ.clear()
        os.environ.update(base)
        label, _, envs = spec.partition("=")
        measure(label, envs.split(",") if envs else [])


if __name__ == "__main__":
    main()
