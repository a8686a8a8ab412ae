"""Measure the PyTorch reference vs tcdiff_tpu on IDENTICAL hardware (this
host's CPU), so bench.py's `vs_baseline` anchors to a measured number
instead of an estimate (VERDICT round-1 item 2).

Workload: the reference inference configuration — 50-step DDIM (eta=1,
guidance 2), full-size DanceDecoder (8 layers, d=512, ff=1024, 8 heads,
cond 438), 3 dancers, 5 s clips (450 tokens x 151 ch), float32. The
reference code timed is `/root/reference/model/diffusion.py:386-442`
(`ddim_sample`, which calls `guided_forward` = 2 full forwards per step),
imported through the same `tests/_refstubs.py` shims the golden-parity
tests use. No reference code is copied; it is imported and executed.

Usage:
    python tools/measure_baseline.py ref    # torch reference on CPU
    python tools/measure_baseline.py ours   # tcdiff_tpu on CPU
    python tools/measure_baseline.py both   # both, then write BASELINE_MEASURED.json

Each phase prints a JSON line; `both` merges them into
/root/repo/BASELINE_MEASURED.json, which bench.py consumes for its anchor.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "BASELINE_MEASURED.json")

BATCH = int(os.environ.get("BASELINE_BATCH", "1"))
REPS = int(os.environ.get("BASELINE_REPS", "2"))
DANCERS = 3
SEQ = 150
CH = 151
COND_DIM = 438
CLIP_SECONDS = 5.0


def _host_info():
    import platform

    cpus = os.cpu_count()
    model = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("model name"):
                    model = line.split(":", 1)[1].strip()
                    break
    except OSError:
        pass
    return {"cpus": cpus, "cpu_model": model, "platform": platform.platform()}


def measure_ref() -> dict:
    """Time the reference's own ddim_sample on torch CPU."""
    sys.path.insert(0, os.path.join(REPO, "tests"))
    import _refstubs

    _refstubs.install()
    import torch

    from model.diffusion import GaussianDiffusion as RefGaussianDiffusion
    from model.model import DanceDecoder as TorchDanceDecoder
    from vis import SMPLSkeleton

    torch.manual_seed(0)
    model = TorchDanceDecoder(
        nfeats=CH,
        seq_len=SEQ,
        latent_dim=512,
        ff_size=1024,
        num_layers=8,
        num_heads=8,
        dropout=0.1,
        cond_feature_dim=COND_DIM,
        activation=torch.nn.functional.gelu,
        use_rotary=True,
        required_dancer_num=DANCERS,
    ).eval()
    diff = RefGaussianDiffusion(
        model=model,
        horizon=SEQ,
        repr_dim=CH,
        smpl=SMPLSkeleton(torch.device("cpu")),
        schedule="cosine",
        n_timestep=1000,
        loss_type="l2",
        clip_denoised=True,
        predict_epsilon=False,
        guidance_weight=2,
        use_p2=False,
        cond_drop_prob=0.25,
        seq_len=SEQ,
    )
    n_params = sum(p.numel() for p in model.parameters())

    tokens = SEQ * DANCERS
    gen = torch.Generator().manual_seed(1)
    cond = torch.randn((BATCH, 301, COND_DIM), generator=gen)
    x0 = torch.randn((BATCH, tokens, 3), generator=gen) * 0.1

    times = []
    with torch.no_grad():
        for _ in range(REPS):
            t0 = time.perf_counter()
            out = diff.ddim_sample((BATCH, tokens, CH), cond, x_0=x0)
            _ = float(out.sum())
            times.append(time.perf_counter() - t0)
    best = min(times)
    res = {
        "framework": "reference (PyTorch CPU)",
        "n_params": n_params,
        "batch": BATCH,
        "reps": REPS,
        "per_call_seconds": [round(t, 2) for t in times],
        "smotion_per_s": round(BATCH * CLIP_SECONDS / best, 4),
        "torch_threads": __import__("torch").get_num_threads(),
    }
    print(json.dumps(res))
    return res


def measure_ours() -> dict:
    """Time tcdiff_tpu's ddim_sample on the SAME CPU (forced platform)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/tcdiff_jax_cache")
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, REPO)
    from tcdiff_tpu.config import DanceDecoderConfig, DiffusionConfig
    from tcdiff_tpu.diffusion import GaussianDiffusion
    from tcdiff_tpu.models import DanceDecoder

    cfg = DanceDecoderConfig(dancer_num=DANCERS)
    model = DanceDecoder(cfg)  # float32, like the torch reference on CPU
    diff = GaussianDiffusion(model, DiffusionConfig())
    tokens = cfg.seq_len * DANCERS
    shape = (BATCH, tokens, cfg.nfeats)
    rng = np.random.default_rng(0)
    cond = jnp.asarray(rng.normal(size=(BATCH, 301, cfg.cond_feature_dim)).astype(np.float32))
    x0 = jnp.asarray(rng.normal(size=(BATCH, tokens, 3)).astype(np.float32) * 0.1)
    params = model.init(
        jax.random.key(0),
        jnp.zeros((1, tokens, cfg.nfeats)),
        jnp.zeros((1, 301, cfg.cond_feature_dim)),
        jnp.zeros((1,), jnp.int32),
    )["params"]
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))

    sample = jax.jit(diff.ddim_sample, static_argnums=(1,))
    out = sample(params, shape, cond, jax.random.key(1), x0)  # compile (excluded)
    float(jnp.sum(out))
    times = []
    for i in range(REPS):
        t0 = time.perf_counter()
        out = sample(params, shape, cond, jax.random.key(2 + i), x0)
        float(jnp.sum(out))
        times.append(time.perf_counter() - t0)
    best = min(times)
    res = {
        "framework": "tcdiff_tpu (JAX CPU)",
        "n_params": n_params,
        "batch": BATCH,
        "reps": REPS,
        "per_call_seconds": [round(t, 2) for t in times],
        "smotion_per_s": round(BATCH * CLIP_SECONDS / best, 4),
    }
    print(json.dumps(res))
    return res


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which == "ref":
        measure_ref()
        return
    if which == "ours":
        measure_ours()
        return
    if which == "merge":  # recompute anchors from already-measured numbers
        with open(OUT) as f:
            doc = json.load(f)
        write_merged(doc["reference_cpu"], doc["tcdiff_tpu_cpu"])
        return
    # run each phase in a clean subprocess so torch/jax thread pools and
    # allocator state don't contaminate each other's timing
    import subprocess

    results = {}
    for phase in ("ref", "ours"):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), phase],
            capture_output=True,
            text=True,
            check=True,
        )
        line = out.stdout.strip().splitlines()[-1]
        results[phase] = json.loads(line)

    write_merged(results["ref"], results["ours"])


def write_merged(ref: dict, ours: dict) -> None:
    """Derive the A100 anchor from the measurements, extrapolation explicit.

    anchor = ref_cpu * (ours_tpu / ours_cpu) * (A100_peak / v5e_peak)

    i.e. assume the torch reference, moved from this CPU to an A100,
    achieves the SAME fraction of the device's peak FLOPs that our
    XLA-compiled sampler achieves moving from this CPU to a v5e chip —
    already generous to the reference, since eager PyTorch with a host-side
    Python step loop and two sequential CFG forwards per step will not
    match compiled XLA's utilization. The peak used for the A100 is the
    dtype the reference actually runs: fp32 without TF32 (19.5 TFLOP/s) —
    the repo contains no autocast/TF32/half anywhere (verified by grep),
    and torch disables TF32 matmuls by default. TF32 and bf16 variants are
    recorded for completeness. ours_tpu is the round-1 measured
    116.3 s-motion/s/chip (BENCH_r01.json / BENCH_NOTES.md).
    """
    ratio = ours["smotion_per_s"] / ref["smotion_per_s"]
    ours_tpu = 116.3
    scale = ref["smotion_per_s"] * ours_tpu / ours["smotion_per_s"]
    v5e_peak_bf16 = 197.0
    anchors = {
        "fp32_no_tf32_19.5TF": round(scale * 19.5 / v5e_peak_bf16, 3),
        "tf32_156TF": round(scale * 156.0 / v5e_peak_bf16, 3),
        "bf16_312TF": round(scale * 312.0 / v5e_peak_bf16, 3),
    }
    doc = {
        "workload": "50-step DDIM, CFG w=2, 3 dancers, 5s clip, full-size net, f32",
        "host": _host_info(),
        "reference_cpu": ref,
        "tcdiff_tpu_cpu": ours,
        "same_hardware_speedup": round(ratio, 3),
        "a100_anchor_formula": (
            "ref_cpu_smotion_per_s * (ours_tpu / ours_cpu) * (a100_peak / 197)"
        ),
        "ours_tpu_smotion_per_s_r1": ours_tpu,
        "a100_anchor_variants": anchors,
        # primary anchor: the dtype the reference actually executes in
        "a100_anchor_smotion_per_s": anchors["fp32_no_tf32_19.5TF"],
    }
    with open(OUT, "w") as f:
        json.dump(doc, f, indent=2)
        f.write("\n")
    print(json.dumps({"written": OUT, "a100_anchor": doc["a100_anchor_smotion_per_s"]}))


if __name__ == "__main__":
    main()
