"""Paired single-process train A/B: measure several env-flag configs in ONE
process so they share the session (tunnel state, host load, clocks) — the
cross-process spread of the no-env-vars train config measured 5.47-6.08
steps/s across four r5 sessions on one day, swamping any <10% A/B run as
separate bench.py invocations.

Usage:
    python tools/ab_train.py 'NAME1=VAR=1,VAR2=0' 'NAME2=' ...

Each positional arg is `label=ENV1=v1,ENV2=v2` (empty env list = defaults).
Each config re-sets the env vars, clears jax caches (the kernel gates and
row-block choosers read env at trace time), builds a fresh train step at
the bench shapes (batch BENCH_BATCH default 64, bf16), and times
BENCH_REPS (default 10) steps with the per-step-sync methodology. Order
alternates are the caller's job (pass A,B,A to bracket drift). One JSON
line per config.
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

    from tcdiff_tpu.config import DanceDecoderConfig, DiffusionConfig
    from tcdiff_tpu.diffusion import GaussianDiffusion
    from tcdiff_tpu.models import DanceDecoder
    from tcdiff_tpu.optim import adan
    from tcdiff_tpu.parallel import make_mesh, replicated, shard_batch
    from tcdiff_tpu.train import create_train_state, make_train_step

    batch = int(os.environ.get("BENCH_BATCH", "64"))
    if os.environ.get("AB_TINY", "0") == "1":
        # CPU smoke-test config (matches tests/test_train.py scale); the
        # numbers it prints are meaningless — it only proves the harness.
        cfg = DanceDecoderConfig(
            seq_len=12, latent_dim=64, ff_size=64, num_layers=1,
            num_heads=4, cond_feature_dim=16, dancer_num=3,
        )
    else:
        cfg = DanceDecoderConfig(dancer_num=3)
    model = DanceDecoder(cfg, dtype=jnp.bfloat16)
    diff = GaussianDiffusion(model, DiffusionConfig())
    tokens = cfg.seq_len * 3
    cond_len = 301 if cfg.seq_len == 150 else 2 * cfg.seq_len + 1
    mesh = make_mesh()
    params = model.init(
        jax.random.key(0),
        jnp.zeros((1, tokens, cfg.nfeats)),
        jnp.zeros((1, cond_len, cfg.cond_feature_dim)),
        jnp.zeros((1,), jnp.int32),
    )["params"]
    tx = adan(5e-5, weight_decay=0.02)
    state = jax.device_put(create_train_state(params, tx), replicated(mesh))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, 3, cfg.seq_len, cfg.nfeats)).astype(np.float32) * 0.3)
    cond = jnp.asarray(rng.normal(size=(batch, cond_len, cfg.cond_feature_dim)).astype(np.float32))
    xs, cs = shard_batch((x, cond), mesh)
    flat_ema = os.environ.get("TCDIFF_FLAT_EMA", "1") == "1"
    inner = make_train_step(diff, tx, flat_ema=flat_ema)
    # BENCH_SCAN_STEPS=N: N steps per dispatch via lax.scan (mirrors
    # bench.py; measures device-bound throughput without the per-step
    # tunnel dispatch latency)
    scan_steps = int(os.environ.get("BENCH_SCAN_STEPS", "0"))
    if scan_steps > 1:
        from jax import lax

        def _multi(state, xs_, cs_, key_):
            def body(s, _):
                s2, metrics = inner(s, xs_, cs_, key_)
                return s2, metrics["total"]

            return lax.scan(body, state, None, length=scan_steps)

        step = jax.jit(_multi, donate_argnums=0)
        sync = lambda t: float(t[-1])  # noqa: E731
        per_call = scan_steps
    else:
        step = jax.jit(inner, donate_argnums=0)
        sync = lambda metrics: float(metrics["total"])  # noqa: E731
        per_call = 1
    key = jax.device_put(jax.random.key(1), replicated(mesh))

    state, m = step(state, xs, cs, key)
    sync(m)  # warm + sync
    reps = int(os.environ.get("BENCH_REPS", "10"))
    t0 = time.perf_counter()
    for _ in range(reps):
        state, m = step(state, xs, cs, key)
        sync(m)
    dt = (time.perf_counter() - t0) / (reps * per_call)
    out = {
        "ab_label": label,
        "steps_per_s": round(1.0 / dt, 3),
        "samples_per_s": round(batch / dt, 1),
        "batch": batch,
    }
    if scan_steps > 1:
        out["scan_steps"] = scan_steps
    print(json.dumps(out), flush=True)
    # free device buffers before the next config re-traces
    del state, xs, cs, step, params
    return dt


def main():
    if os.environ.get("AB_CPU", "0") == "1":
        # force CPU before backend init (JAX_PLATFORMS alone is defeated
        # by sitecustomize's axon TPU grab — see tests/conftest.py)
        import jax

        jax.config.update("jax_platforms", "cpu")
    base = dict(os.environ)
    for spec in sys.argv[1:]:
        # restore the base env so one config's flags can't leak into the
        # next (configs only ADD vars; removal = absence from the spec)
        os.environ.clear()
        os.environ.update(base)
        label, _, envs = spec.partition("=")
        measure(label, envs.split(",") if envs else [])


if __name__ == "__main__":
    main()
