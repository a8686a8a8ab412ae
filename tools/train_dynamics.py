"""Training-dynamics demonstration on the real TPU chip (VERDICT item 5).

Trains the FULL-SIZE denoiser (8 layers, d=512, 3 dancers — the exact
reference config, `/root/reference/TCDiff.py:76-102`) on synthetic data for
several hundred steps and records the 4-term loss trajectory
(`model/diffusion.py:668-741` semantics), plus eval-style quality metrics
(FID_k / diversity / foot-skate against a held-out synthetic set) at the
start and end; then runs the DBN trainer
(`/root/reference/TrajDecoder/train_traj.py:26-287` semantics) for a few
thousand iterations. This is the strongest convergence evidence available
without AIOZ-GDance on this machine.

Writes JSONL curves to /tmp/train_dynamics.jsonl and a summary JSON line to
stdout. Run on the TPU: `python tools/train_dynamics.py` (no env needed);
budget a cold ~5-10 min train-step compile through the axon tunnel.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tcdiff_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tcdiff_tpu.config import DanceDecoderConfig, DiffusionConfig
from tcdiff_tpu.data.synthetic import synthetic_dataset
from tcdiff_tpu.diffusion import GaussianDiffusion
from tcdiff_tpu.models import DanceDecoder
from tcdiff_tpu.optim import adan
from tcdiff_tpu.parallel import make_mesh, replicated, shard_batch
from tcdiff_tpu.train import create_train_state, make_train_step


def _yield_to_driver_bench() -> float:
    """Cooperative chip-sharing with a driver-fired bench.py.

    The campaign's dynamics arms run up to 2 h inside one process, so the
    shell-level yield (tools/bench_campaign_r4.sh yield_chip) can't help
    mid-arm. When bench.py's wanted marker appears (and is fresher than
    120 min — staleness rule shared with the campaign), idle the chip here:
    drop the campaign's busy lock so the bench starts within one of its
    30 s polls, wait for the bench to finish, restore the lock, resume.
    Returns seconds idled so the caller can keep throughput timings honest.
    """
    marker = os.environ.get("TPU_WANTED_MARK", "/tmp/tpu_wanted")
    busy = os.environ.get("TPU_BUSY_LOCK", "/tmp/tpu_busy")

    def fresh():
        try:
            return time.time() - os.path.getmtime(marker) < 7200
        except OSError:  # marker gone (bench exited) or being removed
            return False

    if not fresh():
        return 0.0
    t0 = time.perf_counter()
    had_busy = os.path.exists(busy)
    if had_busy:
        try:
            os.unlink(busy)
        except OSError:
            pass
    print("train_dynamics: yielding chip to driver bench", file=sys.stderr)
    poll = float(os.environ.get("DYN_YIELD_POLL_S", "30"))
    while fresh():
        time.sleep(poll)
    if had_busy:
        open(busy, "w").close()
    print("train_dynamics: resuming after driver bench", file=sys.stderr)
    return time.perf_counter() - t0

LOG = os.environ.get("DYN_LOG", "/tmp/train_dynamics.jsonl")
STEPS = int(os.environ.get("DYN_STEPS", "400"))
BATCH = int(os.environ.get("DYN_BATCH", "32"))
N_DATA = int(os.environ.get("DYN_DATA", "256"))
EVAL_SAMPLES = int(os.environ.get("DYN_EVAL", "8"))
SEED = int(os.environ.get("DYN_SEED", "0"))  # data/init/train-rng seed
DANCERS = int(os.environ.get("DYN_DANCERS", "3"))
TINY = os.environ.get("DYN_TINY", "0") == "1"  # CPU smoke-test sizing
if TINY:
    # smoke tests must NOT grab the axon TPU (never run two TPU
    # processes; JAX_PLATFORMS env does not work here — see CLAUDE.md)
    jax.config.update("jax_platforms", "cpu")


def _fk(flat, normalizer, dn):
    """(b, seq*dn, 151) normalized -> (b, dn, seq, 24, 3) FK positions."""
    from tcdiff_tpu.geometry.skeleton import smpl_fk
    from tcdiff_tpu.viz.postprocess import split_sample

    _, pos, q = split_sample(jnp.asarray(flat), normalizer, dn)
    joints = smpl_fk(q, pos)  # (b, seq*dn, 24, 3)
    b, tokens = joints.shape[:2]
    seq = tokens // dn
    return np.asarray(
        jnp.transpose(joints.reshape(b, seq, dn, 24, 3), (0, 2, 1, 3, 4))
    )


_SAMPLE_FN = {}


def _sample_jit(diff, forecast=0):
    """One jitted sampler per (diffusion object, forecast) — the pre- and
    post-training evals must share the compiled executable (a fresh
    jax.jit wrapper per call recompiles: ~10-15 min each through the axon
    tunnel)."""
    key = (diff, forecast)
    if key not in _SAMPLE_FN:
        fn = functools.partial(diff.ddim_sample, forecast_every=forecast)
        _SAMPLE_FN[key] = jax.jit(fn, static_argnums=(1,))
    return _SAMPLE_FN[key]


def eval_metrics(diff, model, params, normalizer, eval_x, eval_cond, key,
                 forecast=0):
    """Sample with GT trajectories (val_without_TrajModel semantics,
    `TCDiff.py:382-402`) and score vs the ground-truth clips."""
    from tcdiff_tpu.eval.metrics import evaluate

    b = eval_x.shape[0]
    dn, s, c = eval_x.shape[1], eval_x.shape[2], eval_x.shape[3]
    xy = jnp.transpose(eval_x[..., 4:6], (0, 2, 1, 3)).reshape(b, s * dn, 2)
    x_0 = jnp.concatenate([xy, jnp.zeros_like(xy[..., :1])], axis=-1)
    shape = (b, s * dn, c)
    sample = _sample_jit(diff, forecast)(params, shape, jnp.asarray(eval_cond), key, x_0)
    gen = _fk(sample, normalizer, dn)
    gt_flat = jnp.transpose(jnp.asarray(eval_x), (0, 2, 1, 3)).reshape(b, s * dn, c)
    ref = _fk(gt_flat, normalizer, dn)
    rep = evaluate(gen, ref)
    keep = ("fid_k", "fid_g", "div_k", "div_g", "foot_skate", "gmc")
    return {k: float(v) for k, v in rep.items() if k in keep}


def train_denoiser(log, seeds=None):
    """Train + eval for each seed in `seeds` (default [SEED]) INSIDE one
    process: all seeds share the identical-shape jitted train step and
    sampler executables, so a 3-seed sweep pays the axon cold compiles
    (train ~5-10 min, sampler ~10-15 min) exactly once (VERDICT r2 item 6:
    forecast quality across seeds)."""
    seeds = [SEED] if seeds is None else seeds
    if TINY:
        cfg = DanceDecoderConfig(
            seq_len=16, latent_dim=32, ff_size=32, num_layers=1, num_heads=2,
            dancer_num=DANCERS, head_dim=16,
        )
        dcfg = DiffusionConfig(sampling_timesteps=2, n_timestep=10)
    else:
        cfg = DanceDecoderConfig(dancer_num=DANCERS)
        dcfg = DiffusionConfig()
    model = DanceDecoder(cfg, dtype=jnp.bfloat16)
    diff = GaussianDiffusion(model, dcfg)
    tokens = cfg.seq_len * DANCERS
    mesh = make_mesh()
    tx = adan(5e-5, weight_decay=0.02)
    step = jax.jit(make_train_step(diff, tx), donate_argnums=0)
    fks = [
        int(v)
        for v in os.environ.get("DYN_FORECAST_EVAL", "").split(",")
        if v.strip()
    ]

    out = {}
    for seed in seeds:
        poses, music, normalizer = synthetic_dataset(
            N_DATA, DANCERS, cfg.seq_len, seed=seed
        )
        eval_poses, eval_music, _ = synthetic_dataset(
            EVAL_SAMPLES, DANCERS, cfg.seq_len, seed=99 + seed
        )
        params = model.init(
            jax.random.key(seed),
            jnp.zeros((1, tokens, cfg.nfeats)),
            jnp.zeros((1, 2 * cfg.seq_len + 1, cfg.cond_feature_dim)),
            jnp.zeros((1,), jnp.int32),
        )["params"]
        state = jax.device_put(create_train_state(params, tx), replicated(mesh))
        key = jax.device_put(jax.random.key(seed + 1), replicated(mesh))

        pre_eval = eval_metrics(
            diff, model, state.params, normalizer, jnp.asarray(eval_poses),
            eval_music, jax.random.key(seed + 7),
        )
        log({"event": "denoiser_eval", "seed": seed, "step": 0, **pre_eval})

        rng = np.random.default_rng(seed)
        first = last = None
        t0 = time.perf_counter()
        for i in range(STEPS):
            if i % 100 == 0:
                t0 += _yield_to_driver_bench()
            idx = rng.integers(0, N_DATA, size=BATCH)
            xs, cs = shard_batch(
                (jnp.asarray(poses[idx]), jnp.asarray(music[idx])), mesh
            )
            state, m = step(state, xs, cs, key)
            if i % 10 == 0 or i == STEPS - 1:
                vals = {k: float(v) for k, v in m.items()}
                log({"event": "denoiser", "seed": seed, "step": i, **vals})
                if first is None:
                    first = vals
                last = vals
        train_s = time.perf_counter() - t0

        post_eval = eval_metrics(
            diff, model, state.params, normalizer, jnp.asarray(eval_poses),
            eval_music, jax.random.key(seed + 7),
        )
        log({"event": "denoiser_eval", "seed": seed, "step": STEPS, **post_eval})
        res = {
            "denoiser_first": first,
            "denoiser_last": last,
            "denoiser_eval_pre": pre_eval,
            "denoiser_eval_post": post_eval,
            "denoiser_steps": STEPS,
            "denoiser_train_seconds": round(train_s, 1),
        }
        # DYN_FORECAST_EVAL=k1,k2,...: quality of the opt-in LMS feature
        # forecast on the SAME trained weights vs the exact sampler above
        for k in fks:
            fe = eval_metrics(
                diff, model, state.params, normalizer, jnp.asarray(eval_poses),
                eval_music, jax.random.key(seed + 7), forecast=k,
            )
            log({"event": "denoiser_eval_forecast", "seed": seed, "k": k, **fe})
            res[f"denoiser_eval_forecast{k}"] = fe
        out.update(res if seed == seeds[0] else {})
        out[f"seed{seed}"] = res
    return out


def train_dbn(log):
    """Full-size DBN (trans_layer 6) on synthetic trajectories; reads the
    loss curve back from the trainer's JSONL metrics."""
    from tcdiff_tpu.config import TrajDecoderConfig
    from tcdiff_tpu.trajdecoder.dataset import SyntheticTrajDataset
    from tcdiff_tpu.trajdecoder.trainer import TrajTrainer

    iters = int(os.environ.get("DYN_DBN_ITERS", "2000"))
    print_iter = int(os.environ.get("DYN_DBN_PRINT", "200"))
    tcfg = (
        TrajDecoderConfig(print_iter=50, window_size=8, step=4, trans_layer=1,
                          latent_dim=16)
        if TINY
        else TrajDecoderConfig(print_iter=print_iter)
    )
    trainer = TrajTrainer(tcfg, dancer_num=3)
    train_ds = SyntheticTrajDataset(128, 3, seq_len=16 if TINY else 150, seed=42)
    out_dir = "/tmp/dyn_dbn"
    trainer.train(train_ds, None, total_iter=iters, out_dir=out_dir, render=False)

    rows = [
        json.loads(line)
        for line in open(os.path.join(out_dir, "metrics.jsonl"))
        if "_config" not in line
    ]
    for r in rows:
        log({"event": "dbn", **{k: r[k] for k in r if not k.startswith("_")}})
    keys = ("total", "recon", "dis_loss", "v_loss")
    first = {k: rows[0][k] for k in keys if k in rows[0]}
    last = {k: rows[-1][k] for k in keys if k in rows[-1]}
    return {"dbn_first": first, "dbn_last": last, "dbn_iters": iters}


def main():
    out = open(LOG, "w")

    def log(row):
        out.write(json.dumps(row) + "\n")
        out.flush()

    summary = {}
    if os.environ.get("DYN_SKIP_DENOISER", "0") != "1":
        seeds = [
            int(v)
            for v in os.environ.get("DYN_SEEDS", str(SEED)).split(",")
            if v.strip()
        ]
        summary.update(train_denoiser(log, seeds))
    if os.environ.get("DYN_SKIP_DBN", "0") != "1":
        try:
            summary.update(train_dbn(log))
        except Exception as e:  # DBN trainer API may differ; denoiser is core
            summary["dbn_error"] = repr(e)
    out.close()
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
