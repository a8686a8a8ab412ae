"""North-star benchmark: seconds of motion generated / sec / chip.

50-step DDIM (eta=1, CFG weight 2 as one doubled-batch forward per step) on
the full-size DanceDecoder (8 layers, d=512), 3 dancers, 5 s clips @ 30 FPS —
the reference's inference configuration (`/root/reference/model/diffusion.py:387`,
`TCDiff.py:76-102`). Prints ONE JSON line.

vs_baseline = measured_throughput / (5 * a100_reference_anchor), the 5x bar
from BASELINE.json. The anchor is MEASURED, not estimated: the reference
publishes no numbers, so tools/measure_baseline.py times the reference's own
ddim_sample (torch) and ours on IDENTICAL hardware (this host's CPU) and
extrapolates to A100 with the formula documented in BASELINE_MEASURED.json
(equal fraction-of-peak at the reference's actual dtype, fp32 w/o TF32).
Falls back to the old 1.0 s-motion/s estimate only if the measured file is
absent. Also reports MFU from XLA's own FLOP count of the compiled sampler
(v5e bf16 peak 197 TFLOP/s).
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tcdiff_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from tcdiff_tpu.config import DanceDecoderConfig, DiffusionConfig
from tcdiff_tpu.diffusion import GaussianDiffusion
from tcdiff_tpu.models import DanceDecoder

V5E_PEAK_BF16 = 197e12


def _baseline_target() -> float:
    """5x the measured A100 anchor (tools/measure_baseline.py); falls back
    to the round-1 estimate if the measurement file is missing."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BASELINE_MEASURED.json")
    try:
        with open(path) as f:
            anchor = float(json.load(f)["a100_anchor_smotion_per_s"])
    except (OSError, KeyError, ValueError):
        anchor = 1.0  # round-1 estimate; see BASELINE.md
    return 5.0 * anchor


def _flops_per_call(compiled) -> float:
    """XLA's own FLOP count for one execution of a compiled function.
    CAVEAT: control-flow bodies (lax.scan) are counted ONCE, so for the
    50-step sampler this is ~one step's FLOPs; use _analytic_sampler_flops
    for totals."""
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0))
    except Exception:
        return 0.0


def _analytic_fwd_macs(cfg):
    """Per-sample matmul+attention MACs of (one denoiser forward, one
    music-cond encoding). Mirrors tcdiff_tpu/models/dance_decoder.py's
    dataflow."""
    d, ff, L = cfg.latent_dim, cfg.ff_size, cfg.num_layers
    dn, seq, C = cfg.dancer_num, cfg.seq_len, cfg.nfeats
    tokens = seq * dn
    mem = seq + 2  # cond tokens (2-frame packed) + 2 time tokens
    cf = cfg.cond_feature_dim

    per_layer = (
        4 * tokens * d * d  # self-attn q/k/v/out
        + 2 * 2 * tokens * tokens * d  # self-attn logits + AV (h*dk = d)
        + 2 * tokens * d * d + 2 * mem * d * d  # cross q,out / k,v
        + 2 * 2 * tokens * mem * d
        + 2 * tokens * d * ff  # FF
        + tokens * d * d  # linear3
        + 3 * d * 2 * d  # FiLM generators (per batch element)
    )
    per_fwd = (
        tokens * C * d  # input projection
        + seq * (d * dn * 2 * d + 2 * d * 2 * d + 2 * d * d * dn)  # fusion MLP
        + (tokens - 1) * (2 * 64 + 64 * d)  # traj embedding
        + d * 4 * d + 4 * d * d + 4 * d * 2 * d  # time MLP + tokens
        + L * per_layer
        + tokens * d * C  # final layer
    )
    cond_once = (
        (seq + 1) * (2 * cf * cf + cf * d)  # cond projection
        + 2 * (4 * seq * d * d + 2 * 2 * seq * seq * d + 2 * seq * d * ff)  # 2 enc layers
        + 2 * d * d  # non-attn pooled MLP
    )
    return per_fwd, cond_once


def _analytic_sampler_flops(cfg, batch: int, steps: int) -> float:
    """Matmul+attention FLOPs of one 50-step DDIM call: `steps` guided
    forwards (CFG doubles the batch) of the DanceDecoder denoiser, with the
    music-cond encoder hoisted out of the scan (counted once); 2 FLOPs/MAC."""
    per_fwd, cond_once = _analytic_fwd_macs(cfg)
    guided_batch = 2 * batch
    return 2.0 * guided_batch * (steps * per_fwd + cond_once)


def _analytic_train_flops(cfg, batch: int) -> float:
    """Matmul+attention FLOPs of one train step: forward + backward of one
    full denoiser forward per sample (cond encoder runs per step in
    training — no hoist). Standard MFU accounting: backward costs 2x the
    forward's matmul FLOPs (grad wrt activations + grad wrt weights), so
    train = 3x fwd. The FK loss / Adan update are quaternion/elementwise
    chains — O(batch * seq * joints) FLOPs, <0.1% of the matmuls — and are
    deliberately excluded so MFU is not flattered."""
    per_fwd, cond_once = _analytic_fwd_macs(cfg)
    return 2.0 * batch * 3.0 * (per_fwd + cond_once)


def bench_train():
    """BENCH_MODE=train: data-parallel train-step throughput on this host's
    devices (falls back to a single-device mesh on the one TPU chip)."""
    import numpy as np

    from tcdiff_tpu.config import DanceDecoderConfig, DiffusionConfig
    from tcdiff_tpu.diffusion import GaussianDiffusion
    from tcdiff_tpu.models import DanceDecoder
    from tcdiff_tpu.optim import adan
    from tcdiff_tpu.parallel import make_mesh, replicated, shard_batch
    from tcdiff_tpu.train import create_train_state, make_train_step

    # defaults = the measured-best honest train config (BENCH_NOTES r4):
    # batch 64 bf16 is what every decision arm ran; the Pallas train
    # kernels (TPU default since r5) were measured at exactly this shape.
    batch = int(os.environ.get("BENCH_BATCH", "64"))
    dancers = 3
    dtype = jnp.bfloat16 if os.environ.get("BENCH_DTYPE", "bf16") == "bf16" else jnp.float32
    cfg = DanceDecoderConfig(dancer_num=dancers)
    model = DanceDecoder(cfg, dtype=dtype, remat=os.environ.get("BENCH_REMAT", "0") == "1")
    diff = GaussianDiffusion(model, DiffusionConfig())
    tokens = cfg.seq_len * dancers
    mesh = make_mesh()
    params = model.init(
        jax.random.key(0),
        jnp.zeros((1, tokens, cfg.nfeats)),
        jnp.zeros((1, 301, cfg.cond_feature_dim)),
        jnp.zeros((1,), jnp.int32),
    )["params"]
    tx = adan(5e-5, weight_decay=0.02)
    state = jax.device_put(create_train_state(params, tx), replicated(mesh))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, dancers, cfg.seq_len, cfg.nfeats)).astype(np.float32) * 0.3)
    cond = jnp.asarray(rng.normal(size=(batch, 301, cfg.cond_feature_dim)).astype(np.float32))
    xs, cs = shard_batch((x, cond), mesh)
    # TCDIFF_FLAT_EMA=0 swaps the fused flat-vector EMA lerp for per-leaf
    # lerps (A/B lever: the flat form's two ravel-concats are ~3.8 ms of
    # the 113.7 ms kernel-stack step — r5 SAVE_RESID profile)
    flat_ema = os.environ.get("TCDIFF_FLAT_EMA", "1") == "1"
    inner = make_train_step(diff, tx, flat_ema=flat_ema)
    # BENCH_SCAN_STEPS=N runs N train steps as ONE jitted lax.scan, i.e.
    # one dispatch per N steps. The per-step wall-vs-device gap on this
    # host (164 ms wall vs 123 ms device at defaults, r5 profile) is axon
    # tunnel dispatch latency that even the pipelined loop could not
    # remove (dispatch is serial on the 1-core host); a production host
    # with a local chip does not pay it. The scan measures the chip's
    # device-bound throughput. Semantics per step are identical to the
    # dispatch-per-step loop (rng folds with state.step, which advances;
    # the batch is the same synthetic one each step, as in the plain
    # loop) — equality is unit-tested (tests/test_train.py). Default 10
    # since r5d measured it paired: 7.781/8.433 steps/s (control/save)
    # vs 6.016 dispatch-per-step — and the orchestrator offers the same
    # loop to real users (--scan_steps). BENCH_SCAN_STEPS=1 is the
    # r3/r4-continuity dispatch-per-step methodology; the metric string
    # records the scan length either way.
    scan_steps = int(os.environ.get("BENCH_SCAN_STEPS", "10"))
    if scan_steps > 1:
        from jax import lax

        def _multi(state, xs_, cs_, key_):
            def body(s, _):
                s2, metrics = inner(s, xs_, cs_, key_)
                return s2, metrics["total"]

            return lax.scan(body, state, None, length=scan_steps)

        step = jax.jit(_multi, donate_argnums=0)
        sync = lambda t: float(t[-1])  # noqa: E731 — fetch depends on all steps
        per_call = scan_steps
    else:
        step = jax.jit(inner, donate_argnums=0)
        sync = lambda metrics: float(metrics["total"])  # noqa: E731
        per_call = 1
    key = jax.device_put(jax.random.key(1), replicated(mesh))

    state, m = step(state, xs, cs, key)
    sync(m)  # warm + sync

    # BENCH_PROFILE_DIR: capture one traced step (tools/parse_xplane.py)
    prof_dir = os.environ.get("BENCH_PROFILE_DIR")
    if prof_dir:
        with jax.profiler.trace(prof_dir):
            state, m = step(state, xs, cs, key)
            sync(m)

    reps = int(os.environ.get("BENCH_REPS", "10"))
    # BENCH_SYNC_EVERY=0 times the PIPELINED loop (dispatch all steps,
    # sync once). MEASURED SLOWER through the axon tunnel than the
    # per-step-sync loop it was meant to beat (5.693 vs 6.084 steps/s,
    # r5 campaign arms "train defaults" vs "train defaults syncstep" —
    # within-config session variance is ±5%, so at best neutral), so the
    # per-step fetch stays the default: it is also the r3/r4 continuity
    # methodology every historical number used.
    sync_every = os.environ.get("BENCH_SYNC_EVERY", "1") == "1"
    t0 = time.perf_counter()
    for _ in range(reps):
        state, m = step(state, xs, cs, key)
        if sync_every:
            sync(m)
    if not sync_every:
        # host-fetch scalars that depend on the LAST step's loss AND its
        # optimizer update — block_until_ready alone does not reliably
        # synchronize through the axon tunnel (see bench_sample)
        sync(m)
        float(jnp.sum(jax.tree.leaves(state.params)[0]))
    dt = (time.perf_counter() - t0) / (reps * per_call)
    # anchor: measured train-step A100 extrapolation
    # (tools/measure_train_baseline.py); ratio to the plain reference, no 5x
    # bar declared for training
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BASELINE_MEASURED.json")
    try:
        with open(path) as f:
            anchor = float(json.load(f)["train"]["a100_anchor_samples_per_s"])
    except (OSError, KeyError, ValueError):
        anchor = None
    samples_per_s = batch / dt
    scan_tag = f", scan {scan_steps}" if scan_steps > 1 else ""
    result = {
        "metric": f"train_steps/sec (batch {batch}, 3 dancers{scan_tag})",
        "value": round(1.0 / dt, 3),
        "unit": "steps/s",
        # null (not steps/s) when no anchor: keep the field's unit
        # stable for downstream consumers (ADVICE r2, low)
        "vs_baseline": round(samples_per_s / anchor, 3) if anchor else None,
        "train_samples_per_s": round(samples_per_s, 1),
    }
    if jax.devices()[0].platform != "cpu":
        an_flops = _analytic_train_flops(cfg, batch)
        result["mfu_vs_v5e_bf16_peak"] = round(an_flops / dt / V5E_PEAK_BF16, 4)
        result["analytic_tflops_per_step"] = round(an_flops / 1e12, 3)
    print(json.dumps(result))


def bench_stream():
    """BENCH_MODE=stream: per-slice latency of causal streaming generation —
    the time between a new 5 s audio window arriving and its motion being
    ready (steady state, after compile)."""
    import numpy as np

    from tcdiff_tpu.config import DanceDecoderConfig, DiffusionConfig
    from tcdiff_tpu.diffusion import GaussianDiffusion
    from tcdiff_tpu.models import DanceDecoder

    dancers = 3
    cfg = DanceDecoderConfig(dancer_num=dancers)
    model = DanceDecoder(cfg, dtype=jnp.bfloat16)
    diff = GaussianDiffusion(model, DiffusionConfig())
    tokens = cfg.seq_len * dancers
    shape = (1, tokens, cfg.nfeats)
    rng = np.random.default_rng(0)
    cond = jnp.asarray(rng.normal(size=(1, 301, cfg.cond_feature_dim)).astype(np.float32))
    x0 = jnp.asarray(rng.normal(size=(1, tokens, 3)).astype(np.float32) * 0.1)
    prev = jnp.asarray(
        rng.normal(size=(1, (cfg.seq_len // 2) * dancers, cfg.nfeats)).astype(np.float32)
    )
    params = model.init(
        jax.random.key(0),
        jnp.zeros((1, tokens, cfg.nfeats)),
        jnp.zeros((1, 301, cfg.cond_feature_dim)),
        jnp.zeros((1,), jnp.int32),
    )["params"]
    fn = jax.jit(diff.ddim_sample_stream, static_argnums=(1,))
    out = fn(params, shape, cond, jax.random.key(1), x0, prev)
    float(jnp.sum(out))
    reps = int(os.environ.get("BENCH_REPS", "10"))
    t0 = time.perf_counter()
    for i in range(reps):
        out = fn(params, shape, cond, jax.random.key(2 + i), x0, prev)
        float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / reps
    # each slice advances the song by 2.5 s of motion
    print(
        json.dumps(
            {
                "metric": "streaming slice latency (50-step DDIM, 3 dancers)",
                "value": round(dt * 1000, 1),
                "unit": "ms/slice (2.5 s motion)",
                "vs_baseline": round(2.5 / dt, 2),
            }
        )
    )


def bench_stream_e2e():
    """BENCH_MODE=stream_e2e: the FULL streaming pipeline (DBN rollout +
    Kalman + per-slice denoise) over a 60 s song, pipelined (incremental
    TrajectoryStreamer, VERDICT item 8) vs the up-front variant the
    reference's structure implies (whole-song rollout before slice 0,
    `TCDiff.py:527-550`). Reports time-to-first-motion for both and the
    pipelined steady-state slice latency."""
    import numpy as np

    from tcdiff_tpu.config import DanceDecoderConfig, DiffusionConfig, TrajDecoderConfig
    from tcdiff_tpu.diffusion import GaussianDiffusion
    from tcdiff_tpu.models import DanceDecoder
    from tcdiff_tpu.trajdecoder.kalman import kalman_smooth_batch
    from tcdiff_tpu.trajdecoder.model import TrajDecoder
    from tcdiff_tpu.trajdecoder.rollout import autoregressive_rollout
    from tcdiff_tpu.trajdecoder.streaming import TrajectoryStreamer

    dancers = 3
    cfg = DanceDecoderConfig(dancer_num=dancers)
    tcfg = TrajDecoderConfig()
    model = DanceDecoder(cfg, dtype=jnp.bfloat16)
    diff = GaussianDiffusion(model, DiffusionConfig())
    traj_model = TrajDecoder(tcfg)
    seq, half = cfg.seq_len, cfg.seq_len // 2
    tokens = seq * dancers
    shape = (1, tokens, cfg.nfeats)

    rng = np.random.default_rng(0)
    song_s = float(os.environ.get("BENCH_SONG_SECONDS", "60"))
    feats = rng.normal(size=(1, int(song_s * 60), cfg.cond_feature_dim)).astype(np.float32)
    win_f, stride_f = 2 * seq + 1, seq
    starts = list(range(0, feats.shape[1] - win_f + 1, stride_f))
    seed = rng.normal(size=(1, dancers, tcfg.window_size, 2)).astype(np.float32) * 0.1

    params = model.init(
        jax.random.key(0),
        jnp.zeros((1, tokens, cfg.nfeats)),
        jnp.zeros((1, 301, cfg.cond_feature_dim)),
        jnp.zeros((1,), jnp.int32),
    )["params"]
    traj_params = traj_model.init(
        jax.random.key(1),
        jnp.zeros((1, dancers, tcfg.window_size, tcfg.nfeats)),
        jnp.zeros((1, (tcfg.window_size + tcfg.step) * 2, tcfg.cond_feature_dim)),
    )["params"]
    stream_fn = jax.jit(diff.ddim_sample_stream, static_argnums=(1,))

    def run_pipelined(record_first=True):
        streamer = TrajectoryStreamer(
            traj_model, traj_params, seed, feats, tcfg.window_size, tcfg.step
        )
        t0 = time.perf_counter()
        t_first = None
        prev_tail = None
        for i, s in enumerate(starts):
            t = streamer.frames(i * half + seq)[0][:, i * half : i * half + seq]
            xy = jnp.transpose(t, (1, 0, 2)).reshape(1, tokens, 2)
            x_0 = jnp.concatenate([xy, jnp.zeros_like(xy[..., :1])], axis=-1)
            cond = jnp.asarray(feats[:, s : s + win_f])
            sample = stream_fn(params, shape, cond, jax.random.key(1000 + i), x_0, prev_tail)
            s4 = sample.reshape(1, seq, dancers, cfg.nfeats)
            prev_tail = s4[:, half:].reshape(1, half * dancers, cfg.nfeats)
            if i == 0 and record_first:
                jax.block_until_ready(sample)
                t_first = time.perf_counter() - t0
        jax.block_until_ready(prev_tail)
        return t_first, time.perf_counter() - t0

    def run_upfront():
        t0 = time.perf_counter()
        traj = autoregressive_rollout(
            traj_model, traj_params, jnp.asarray(seed), jnp.asarray(feats),
            tcfg.window_size, tcfg.step,
        )
        traj = kalman_smooth_batch(traj)[0]
        need = (len(starts) - 1) * half + seq
        if traj.shape[1] < need:
            pad = jnp.repeat(traj[:, -1:], need - traj.shape[1], axis=1)
            traj = jnp.concatenate([traj, pad], axis=1)
        t = traj[:, :seq]
        xy = jnp.transpose(t, (1, 0, 2)).reshape(1, tokens, 2)
        x_0 = jnp.concatenate([xy, jnp.zeros_like(xy[..., :1])], axis=-1)
        cond = jnp.asarray(feats[:, starts[0] : starts[0] + win_f])
        sample = stream_fn(params, shape, cond, jax.random.key(1000), x_0, None)
        jax.block_until_ready(sample)
        return time.perf_counter() - t0

    run_pipelined(record_first=False)  # warmup: compiles everything
    run_upfront()
    t_first_pipe, total = run_pipelined()
    t_first_up = run_upfront()
    steady = (total - t_first_pipe) / max(1, len(starts) - 1)
    print(
        json.dumps(
            {
                "metric": "streaming e2e time-to-first-motion (DBN+Kalman+DDIM)",
                "value": round(t_first_pipe * 1000, 1),
                "unit": "ms (pipelined)",
                "vs_baseline": round(t_first_up / t_first_pipe, 2),
                "upfront_ttfm_ms": round(t_first_up * 1000, 1),
                "steady_ms_per_slice": round(steady * 1000, 1),
                "slices": len(starts),
                "song_seconds": song_s,
            }
        )
    )


# env-overridable so the protocol is testable against scratch paths
# (tools/bench_campaign_r4.sh honors the same variables)
_TPU_BUSY = os.environ.get("TPU_BUSY_LOCK", "/tmp/tpu_busy")
_TPU_WANTED = os.environ.get("TPU_WANTED_MARK", "/tmp/tpu_wanted")


def _release_wanted():
    try:
        os.unlink(_TPU_WANTED)
    except OSError:
        pass


def _chip_lock_coordination():
    """Serialize with a running measurement campaign over the single chip.

    tools/bench_campaign_r4.sh holds /tmp/tpu_busy while it owns the chip
    and yields between arms when /tmp/tpu_wanted appears. A driver-fired
    bench overlapping a campaign arm both distorts the arm (~15% measured
    on this 1-core host, BENCH_NOTES) and risks a second concurrent axon
    client. The campaign's own bench children set TCDIFF_BENCH_LOCK_OWNER=1
    and skip this. The wanted marker is held until process exit so the
    campaign cannot retake the chip mid-measurement; the campaign treats a
    marker older than 120 min as stale (a crashed bench) and ignores it.
    If the lock does not clear within BENCH_LOCK_WAIT seconds, proceed
    anyway with a warning: a possibly noisy number beats forfeiting the
    round's bench entirely. Default 1200 s — dynamics arms yield within
    ~2 min and only a mid-compile bench/AOT arm holds longer, while a
    longer wait risks the DRIVER killing this process at its own budget
    (an rc=124 records as a hard fail, worse than a distorted number —
    see MULTICHIP_r03).
    """
    import atexit
    import sys

    if os.environ.get("TCDIFF_BENCH_LOCK_OWNER"):
        return
    try:
        with open(_TPU_WANTED, "w") as f:
            f.write(str(os.getpid()))
    except OSError:
        return
    atexit.register(_release_wanted)
    limit = float(os.environ.get("BENCH_LOCK_WAIT", "1200"))
    t0 = time.time()
    while os.path.exists(_TPU_BUSY):
        waited = time.time() - t0
        if waited >= limit:
            print(
                f"bench: campaign lock {_TPU_BUSY} still present after "
                f"{waited:.0f}s; proceeding anyway (may overlap a campaign arm)",
                file=sys.stderr,
            )
            break
        print(
            f"bench: waiting for the campaign to yield the chip ({waited:.0f}s)",
            file=sys.stderr,
        )
        try:
            os.utime(_TPU_WANTED)  # keep the marker fresh for the staleness check
        except OSError:
            pass
        time.sleep(30)


def _backend_watchdog():
    """Retry backend init with backoff; fail with a parseable JSON error.

    The axon backend has outage windows where client init hangs
    indefinitely or raises UNAVAILABLE (observed 2026-08-17/18, 12+ hours);
    without this a driver-run bench would hang until its own timeout with
    no diagnostic. Probes jax.devices() on a daemon thread with a
    BENCH_INIT_TIMEOUT per-attempt limit (default 600 — cold axon init is
    minutes, never 10). On a hang/error, a hung client init cannot be
    retried in-process (the init lock is held by the stuck thread), so the
    retry re-execs this process after BENCH_INIT_BACKOFF seconds — one
    transient init failure no longer forfeits the round's number (VERDICT
    r3 #3). Total worst case with defaults: 3 x 600 s + 2 x 120 s ≈ 34 min,
    inside the driver's bench budget."""
    import sys
    import threading

    limit = float(os.environ.get("BENCH_INIT_TIMEOUT", "600"))
    attempts_left = int(os.environ.get("BENCH_INIT_RETRIES", "2"))
    backoff = float(os.environ.get("BENCH_INIT_BACKOFF", "120"))
    done = threading.Event()
    ok = []

    def probe():
        try:
            jax.devices()
            ok.append(True)
        except Exception as e:  # UNAVAILABLE during outage windows
            print(f"bench: backend init error: {e!r}", file=sys.stderr)
        finally:
            done.set()

    threading.Thread(target=probe, daemon=True).start()
    if done.wait(limit) and ok:
        return
    if attempts_left > 0:
        print(
            f"bench: backend init failed/hung (limit {limit:.0f}s); "
            f"retrying after {backoff:.0f}s ({attempts_left} attempts left)",
            file=sys.stderr,
        )
        time.sleep(backoff)
        env = dict(os.environ, BENCH_INIT_RETRIES=str(attempts_left - 1))
        os.execve(sys.executable, [sys.executable] + sys.argv, env)
    print(json.dumps({
        "metric": "bench_error", "value": None, "unit": "",
        "vs_baseline": None,
        "error": f"TPU backend init did not answer within {limit:.0f}s "
                 "after retries (axon outage — see BENCH_NOTES r3/r4)",
    }))
    _release_wanted()  # os._exit skips atexit; don't stall a yielding campaign
    os._exit(2)


def main():
    _chip_lock_coordination()
    _backend_watchdog()
    mode = os.environ.get("BENCH_MODE", "sample")
    if mode == "train":
        bench_train()
        return
    if mode == "stream":
        bench_stream()
        return
    if mode == "stream_e2e":
        bench_stream_e2e()
        return
    # batch 16 is the measured-best serving config: 191.2/192.9 s-motion/s
    # across two sessions (MFU 63%) vs the batch-8 181 band and batch-32's
    # 187.4 (BENCH_NOTES r4). Per-request latency stays amortized-honest:
    # the metric divides by the whole batch's wall time.
    batch = int(os.environ.get("BENCH_BATCH", "16"))
    dancers = 3
    clip_seconds = 5.0
    compute_dtype = jnp.bfloat16 if os.environ.get("BENCH_DTYPE", "bf16") == "bf16" else jnp.float32

    cfg = DanceDecoderConfig(dancer_num=dancers)
    model = DanceDecoder(cfg, dtype=compute_dtype)
    dcfg = DiffusionConfig(scan_unroll=int(os.environ.get("BENCH_UNROLL", "1")))
    diff = GaussianDiffusion(model, dcfg)
    tokens = cfg.seq_len * dancers
    shape = (batch, tokens, cfg.nfeats)

    rng = np.random.default_rng(0)
    cond = jnp.asarray(rng.normal(size=(batch, 301, cfg.cond_feature_dim)).astype(np.float32))
    x0 = jnp.asarray(rng.normal(size=(batch, tokens, 3)).astype(np.float32) * 0.1)
    params = model.init(
        jax.random.key(0),
        jnp.zeros((1, tokens, cfg.nfeats)),
        jnp.zeros((1, 301, cfg.cond_feature_dim)),
        jnp.zeros((1,), jnp.int32),
    )["params"]
    # measured slightly SLOWER on v5e at batch 8 (90.4 vs 94.5 s-motion/s):
    # sampling there is compute-, not weight-bandwidth-bound; off by default
    if compute_dtype == jnp.bfloat16 and os.environ.get("BENCH_CAST_PARAMS", "0") == "1":
        # store weights in bf16 too: halves the HBM weight traffic that
        # dominates small-batch sampling (60M params x 50 steps)
        params = jax.tree.map(
            lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p, params
        )

    # opt-in LMS feature forecasting (skips model forwards; see gaussian.py)
    forecast = int(os.environ.get("BENCH_FORECAST", "0"))

    def _sample_fn(params, cond, key, x0):
        return diff.ddim_sample(
            params, shape, cond, key, x0, forecast_every=forecast
        )

    # AOT-compile ONCE (one axon compile serves execution + FLOP counting)
    sample = (
        jax.jit(_sample_fn)
        .lower(params, cond, jax.random.key(1), x0)
        .compile()
    )
    flops = _flops_per_call(sample)

    # warmup; fetch a scalar to the HOST each rep — block_until_ready
    # alone does not reliably synchronize through the axon tunnel
    out = sample(params, cond, jax.random.key(1), x0)
    float(jnp.sum(out))

    # BENCH_PROFILE_DIR: capture one traced call (parse with
    # tools/parse_xplane.py) before the timed reps
    prof_dir = os.environ.get("BENCH_PROFILE_DIR")
    if prof_dir:
        with jax.profiler.trace(prof_dir):
            out = sample(params, cond, jax.random.key(99), x0)
            float(jnp.sum(out))

    reps = int(os.environ.get("BENCH_REPS", "3"))
    t0 = time.perf_counter()
    for i in range(reps):
        out = sample(params, cond, jax.random.key(2 + i), x0)
        float(jnp.sum(out))
    elapsed = (time.perf_counter() - t0) / reps

    n_chips = 1  # bench runs on the single tunneled chip
    motion_seconds = batch * clip_seconds
    throughput = motion_seconds / elapsed / n_chips

    is_tpu = jax.devices()[0].platform != "cpu"
    name = "sec_of_motion/sec/chip (50-step DDIM, 3 dancers)"
    model_steps = dcfg.sampling_timesteps
    if forecast >= 2:
        um = np.zeros(dcfg.sampling_timesteps, bool)
        um[::forecast] = True
        um[:2] = True
        um[-1] = True
        model_steps = int(um.sum())
        name += f" forecast_every={forecast}"
    result = {
        "metric": name,
        "value": round(throughput, 3),
        "unit": "s_motion/s/chip",
        "vs_baseline": round(throughput / _baseline_target(), 3),
    }
    if is_tpu:
        an_flops = _analytic_sampler_flops(cfg, batch, model_steps)
        result["mfu_vs_v5e_bf16_peak"] = round(an_flops / elapsed / V5E_PEAK_BF16, 4)
        result["analytic_tflops_per_call"] = round(an_flops / 1e12, 3)
        if flops > 0:
            # XLA's count (scan body once) — recorded for cross-checking
            result["xla_tflops_scan_body"] = round(flops / 1e12, 3)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
