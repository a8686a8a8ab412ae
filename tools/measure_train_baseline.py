"""Measure TRAIN-step throughput: PyTorch reference vs tcdiff_tpu on
IDENTICAL hardware (this host's CPU) — the training-side companion to
tools/measure_baseline.py (ROADMAP "train-throughput baseline").

Workload: one full training step of the reference's inner loop
(`/root/reference/TCDiff.py:223-245`): the 4-term diffusion loss forward
(incl. SMPL FK, `model/diffusion.py:636-741`), backward, Adan update
(`model/adan.py`, lr 5e-5 wd 0.02 per `TCDiff.py:110`), and the EMA lerp
(`model/diffusion.py:61-76`). Full-size net (8 layers, d=512), 3 dancers,
float32, same batch for both frameworks. The reference code is imported
through `tests/_refstubs.py` and executed — never copied.

Usage:
    python tools/measure_train_baseline.py ref   # torch reference on CPU
    python tools/measure_train_baseline.py ours  # tcdiff_tpu on CPU
    python tools/measure_train_baseline.py both  # both -> merge into BASELINE_MEASURED.json

`both` adds a "train" section to /root/repo/BASELINE_MEASURED.json; bench.py's
BENCH_MODE=train consumes its anchor for vs_baseline.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "BASELINE_MEASURED.json")

BATCH = int(os.environ.get("BASELINE_BATCH", "8"))
REPS = int(os.environ.get("BASELINE_REPS", "3"))
DANCERS = 3
SEQ = 150
CH = 151
COND_DIM = 438

# our measured TPU train throughput to extrapolate with (BENCH_NOTES.md,
# batch 32 bf16 on one v5e chip)
OURS_TPU_SAMPLES_PER_S = 184.0
V5E_PEAK_BF16_TF = 197.0
A100_FP32_TF = 19.5  # reference trains in f32; no autocast/TF32 in its repo


def measure_ref() -> dict:
    """Time the reference's own train step on torch CPU."""
    sys.path.insert(0, os.path.join(REPO, "tests"))
    import _refstubs

    _refstubs.install()
    import torch

    from model.adan import Adan
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
    ).train()
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
    ).train()
    optim = Adan(model.parameters(), lr=5e-5, weight_decay=0.02)

    gen = torch.Generator().manual_seed(1)
    x = torch.randn((BATCH, DANCERS, SEQ, CH), generator=gen) * 0.3
    cond = torch.randn((BATCH, 301, COND_DIM), generator=gen)

    def one_step():
        total_loss, _parts = diff(x, cond, t_override=None)
        optim.zero_grad()
        total_loss.backward()
        optim.step()
        diff.ema.update_model_average(diff.master_model, diff.model)
        return float(total_loss.detach())

    one_step()  # warmup (allocator, autograd graph caches)
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        one_step()
        times.append(time.perf_counter() - t0)
    best = min(times)
    res = {
        "framework": "reference (PyTorch CPU)",
        "batch": BATCH,
        "reps": REPS,
        "per_step_seconds": [round(t, 2) for t in times],
        "samples_per_s": round(BATCH / best, 4),
        "torch_threads": torch.get_num_threads(),
    }
    print(json.dumps(res))
    return res


def measure_ours() -> dict:
    """Time tcdiff_tpu's train step on the SAME CPU (forced platform, f32)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/tcdiff_jax_cache")
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, REPO)
    from tcdiff_tpu.config import DanceDecoderConfig, DiffusionConfig
    from tcdiff_tpu.diffusion import GaussianDiffusion
    from tcdiff_tpu.models import DanceDecoder
    from tcdiff_tpu.optim import adan
    from tcdiff_tpu.train import create_train_state, make_train_step

    cfg = DanceDecoderConfig(dancer_num=DANCERS)
    model = DanceDecoder(cfg)  # float32, like the torch reference on CPU
    diff = GaussianDiffusion(model, DiffusionConfig())
    tokens = cfg.seq_len * DANCERS
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(BATCH, DANCERS, SEQ, CH)).astype(np.float32) * 0.3)
    cond = jnp.asarray(rng.normal(size=(BATCH, 301, COND_DIM)).astype(np.float32))
    params = model.init(
        jax.random.key(0),
        jnp.zeros((1, tokens, cfg.nfeats)),
        jnp.zeros((1, 301, cfg.cond_feature_dim)),
        jnp.zeros((1,), jnp.int32),
    )["params"]
    tx = adan(5e-5, weight_decay=0.02)
    state = create_train_state(params, tx)
    step = jax.jit(make_train_step(diff, tx), donate_argnums=0)
    key = jax.random.key(1)

    state, m = step(state, x, cond, key)  # compile (excluded)
    float(m["total"])
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        state, m = step(state, x, cond, key)
        float(m["total"])
        times.append(time.perf_counter() - t0)
    best = min(times)
    res = {
        "framework": "tcdiff_tpu (JAX CPU)",
        "batch": BATCH,
        "reps": REPS,
        "per_step_seconds": [round(t, 2) for t in times],
        "samples_per_s": round(BATCH / best, 4),
    }
    print(json.dumps(res))
    return res


def write_merged(ref: dict, ours: dict) -> None:
    """Same equal-fraction-of-peak extrapolation as the sampler baseline:
    anchor = ref_cpu * (ours_tpu / ours_cpu) * (A100_fp32_peak / v5e_bf16_peak).
    """
    with open(OUT) as f:
        doc = json.load(f)
    anchor = round(
        ref["samples_per_s"]
        * (OURS_TPU_SAMPLES_PER_S / ours["samples_per_s"])
        * (A100_FP32_TF / V5E_PEAK_BF16_TF),
        3,
    )
    doc["train"] = {
        "workload": "full train step (4-term loss + backward + Adan + EMA), f32, batch %d" % BATCH,
        "reference_cpu": ref,
        "tcdiff_tpu_cpu": ours,
        "same_hardware_speedup": round(ours["samples_per_s"] / ref["samples_per_s"], 3),
        "ours_tpu_samples_per_s_r1": OURS_TPU_SAMPLES_PER_S,
        "a100_anchor_formula": (
            "ref_cpu_samples_per_s * (ours_tpu / ours_cpu) * (19.5 / 197)"
        ),
        "a100_anchor_samples_per_s": anchor,
    }
    with open(OUT, "w") as f:
        json.dump(doc, f, indent=2)
        f.write("\n")
    print(json.dumps({"written": OUT, "a100_train_anchor": anchor}))


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which == "ref":
        measure_ref()
        return
    if which == "ours":
        measure_ours()
        return
    import subprocess

    results = {}
    for phase in ("ref", "ours"):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), phase],
            capture_output=True,
            text=True,
            check=True,
        )
        results[phase] = json.loads(out.stdout.strip().splitlines()[-1])
    write_merged(results["ref"], results["ours"])


if __name__ == "__main__":
    main()
