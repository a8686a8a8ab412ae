"""Orchestration: the three top-level loops of the reference's `TCDiff` class.

Rebuilds `/root/reference/TCDiff.py:39-657` TPU-first:

  * `train_loop` — epochs over sharded device batches; ONE jitted train step
    (loss + grad + Adan + EMA, gradient psum inserted by XLA over the dp
    mesh axis) instead of accelerate/DDP; orbax checkpoints every
    `save_interval` epochs with sample renders from the EMA weights
    (`TCDiff.py:216-303`).
  * `given_trajectory_generation_loop` — diffusion-stage eval with
    ground-truth trajectories (`TCDiff.py:310-431`).
  * `test_loop` — full two-stage pipeline: DBN autoregressive rollout (a
    lax.scan, not the reference's Python window loop `TCDiff.py:527-547`),
    vectorized Kalman smoothing on device (not filterpy on host), then
    trajectory-conditioned DDIM sampling (`TCDiff.py:434-625`).

Host/device split: datasets are host numpy, every compute step is jitted;
rendering and pkl export stay host-side.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from tcdiff_tpu.config import TCDiffConfig
from tcdiff_tpu.data.dataset import AIOZDataset, load_split_file
from tcdiff_tpu.data.normalizer import Normalizer
from tcdiff_tpu.data.synthetic import synthetic_dataset
from tcdiff_tpu.diffusion import GaussianDiffusion
from tcdiff_tpu.models import DanceDecoder
from tcdiff_tpu.optim import adan
from tcdiff_tpu.parallel import make_mesh, replicated, shard_batch, shard_stacked_batch
from tcdiff_tpu.train.state import create_train_state
from tcdiff_tpu.train.train_step import make_train_step
from tcdiff_tpu.trajdecoder import TrajDecoder, autoregressive_rollout, kalman_smooth_batch
from tcdiff_tpu.utils import (
    MetricLogger,
    StepTimer,
    get_logger,
    latest_checkpoint,
    restore_train_state,
    save_checkpoint,
)
from tcdiff_tpu.viz.postprocess import render_sample


class _SyntheticDataset:
    """AIOZDataset-shaped wrapper over synthetic arrays (dataset-free runs)."""

    def __init__(self, n, dancer_num, seed, normalizer=None, seq_len=150):
        per_sample = normalizer is None
        poses, music, norm = synthetic_dataset(
            n, dancer_num, seq_len=seq_len, seed=seed, per_sample_normalization=per_sample
        )
        self.poses, self.music = poses, music
        self.normalizer = normalizer if normalizer is not None else norm
        if normalizer is not None:
            self.poses = np.asarray(normalizer.normalize(jnp.asarray(poses)))
        self.feature_files = [f"synthetic_{i}_slice0.npy" for i in range(n)]
        self.wav_files = [f"synthetic_{i}_slice0.wav" for i in range(n)]

    def __len__(self):
        return len(self.poses)

    def get(self, idx):
        return self.poses[idx], self.music[idx], self.feature_files[idx], self.wav_files[idx]

    def batches(self, batch_size, rng=None, drop_last=True):
        order = np.arange(len(self))
        if rng is not None:
            rng.shuffle(order)
        for i in range(0, len(order), batch_size):
            idx = order[i : i + batch_size]
            if drop_last and len(idx) < batch_size:
                return
            yield {
                "x": self.poses[idx],
                "cond": self.music[idx],
                "filename": [self.feature_files[j] for j in idx],
                "wav": [self.wav_files[j] for j in idx],
            }


def consecutive_slice_indices(feature_files, count: int):
    """Indices of up to `count` CONSECUTIVE slices of one origin sequence.

    Long-form generation couples neighboring half-overlapping slices inside
    the sampler (`model/diffusion.py:502-506`), so the batch must be slices
    i, i+1, ... of the SAME song in order — not a shuffled draw. Picks the
    origin with the longest run.
    """
    import re

    groups = {}
    for i, f in enumerate(feature_files):
        stem = os.path.splitext(os.path.basename(f))[0]
        m = re.match(r"(.+)_slice(\d+)$", stem)
        if not m:
            continue
        groups.setdefault(m.group(1), []).append((int(m.group(2)), i))
    best = []
    for slices in groups.values():
        slices.sort()
        run = [slices[0]]
        for prev, cur in zip(slices, slices[1:]):
            run = run + [cur] if cur[0] == prev[0] + 1 else [cur]
            if len(run) >= count:
                break
        if len(run) > len(best):
            best = run
    return [i for _, i in best[:count]]


def _gt_traj_x0(x: np.ndarray) -> jnp.ndarray:
    """(B, dn, S, 151) normalized -> (B, S*dn, 3) with z=0.

    The reference extracts channels [4,5] and zero-pads z
    (`TCDiff.py:382-389`), in time-major token order.
    """
    b, dn, s, _ = x.shape
    xy = np.transpose(x[:, :, :, 4:6], (0, 2, 1, 3)).reshape(b, s * dn, 2)
    return jnp.asarray(np.concatenate([xy, np.zeros_like(xy[..., :1])], axis=-1))


class TCDiff:
    """Top-level trainer/sampler, the reference `TCDiff` class rebuilt."""

    def __init__(
        self,
        cfg: TCDiffConfig,
        checkpoint_path: Optional[str] = None,
        use_ema_for_eval: bool = True,
    ):
        self.cfg = cfg
        dtype = jnp.bfloat16 if cfg.train.compute_dtype == "bfloat16" else jnp.float32
        self.mesh = make_mesh(dp=cfg.train.dp, tp=cfg.train.tp)
        self.model = DanceDecoder(
            cfg.model, dtype=dtype, remat=cfg.train.remat,
            # thread the mesh so opt-in fused TRAIN kernels shard their
            # batch over dp via shard_map (parallel/kernel_shard.py)
            mesh=self.mesh if self.mesh.shape.get("dp", 1) > 1 else None,
        )
        self.diffusion = GaussianDiffusion(self.model, cfg.diffusion)
        self.tx = adan(
            cfg.train.learning_rate,
            betas=cfg.train.adan_betas,
            eps=cfg.train.adan_eps,
            weight_decay=cfg.train.weight_decay,
            # flat-vector update concatenates every leaf; under tp>1 the
            # leaves are Megatron-sharded, so stay per-leaf (ADVICE r3)
            fused=False if cfg.train.tp > 1 else None,
        )
        self.logger = get_logger()
        self.normalizer: Optional[Normalizer] = None
        self.use_ema_for_eval = use_ema_for_eval

        m = cfg.model
        self.state = jax.device_put(
            create_train_state(self._init_params(), self.tx), replicated(self.mesh)
        )
        n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(self.state.params))
        self.logger.info("DanceDecoder parameters: %.2fM", n_params / 1e6)

        self.checkpoint_path = checkpoint_path
        if checkpoint_path:
            self._load_checkpoint(checkpoint_path)

        self._sample_fn = jax.jit(self.diffusion.ddim_sample, static_argnums=(1,))
        self._long_sample_fn = jax.jit(self.diffusion.long_ddim_sample, static_argnums=(1,))

    # ------------------------------------------------------------------ setup
    def _init_params(self):
        m = self.cfg.model
        tokens = m.seq_len * m.dancer_num
        return self.model.init(
            jax.random.key(self.cfg.train.seed),
            jnp.zeros((1, tokens, m.nfeats)),
            jnp.zeros((1, 2 * m.seq_len + 1, m.cond_feature_dim)),
            jnp.zeros((1,), jnp.int32),
        )["params"]

    def _check_dancer_count(self, params, path: str) -> None:
        """The fusion projection's input width is d*dancer_num, so a
        checkpoint is only valid for the dancer count it was trained with
        (the reference silently assumes this throughout `TCDiff.py:310-625`
        and would crash with an opaque shape error). Raise explicitly."""
        try:
            kern = params["relative_projection_0"]["kernel"]
        except (KeyError, TypeError):
            return
        d = self.cfg.model.latent_dim
        dn_ckpt = int(kern.shape[0]) // d
        if dn_ckpt != self.cfg.model.dancer_num:
            raise ValueError(
                f"checkpoint {path} was trained for {dn_ckpt} dancers but this "
                f"run is configured for {self.cfg.model.dancer_num} "
                f"(--required_dancer_num); re-run with "
                f"--required_dancer_num {dn_ckpt} or use a matching checkpoint"
            )

    def _load_checkpoint(self, path: str) -> None:
        if path.endswith(".pt"):
            from tcdiff_tpu.utils import load_reference_checkpoint

            params, norm = load_reference_checkpoint(
                path, num_layers=self.cfg.model.num_layers, use_ema=self.use_ema_for_eval
            )
            self._check_dancer_count(params, path)
            params = jax.tree.map(jnp.asarray, params)
            self.state = self.state.replace(
                params=params, ema_params=jax.tree.map(jnp.copy, params)
            )
            self.normalizer = norm
            self.logger.info("loaded reference torch checkpoint %s", path)
            return
        if os.path.isdir(path) and not os.path.basename(path).startswith("ckpt_"):
            found = latest_checkpoint(path)
            if found is None:
                raise FileNotFoundError(f"no ckpt_* under {path}")
            path = found
        try:
            self.state, norm = restore_train_state(path, self.state)
        except Exception as err:
            # a mid-restore shape error is most often a dancer-count
            # mismatch; diagnose it from the raw checkpoint and say so
            from tcdiff_tpu.utils import load_checkpoint

            try:
                raw = load_checkpoint(path)
                raw_params = raw["state"]["params"]
            except Exception:
                raise err
            self._check_dancer_count(raw_params, path)
            raise
        self._check_dancer_count(self.state.params, path)
        if norm is not None:
            self.normalizer = norm
        self.logger.info("restored checkpoint %s (step %d)", path, int(self.state.step))

    def eval_params(self):
        return self.state.ema_params if self.use_ema_for_eval else self.state.params

    # ------------------------------------------------------------------- data
    def load_datasets(self, opt):
        """(train_ds, test_ds) from AIOZ on disk, or synthetic with --synthetic."""
        dn = self.cfg.model.dancer_num
        if getattr(opt, "synthetic", False):
            n = getattr(opt, "synthetic_size", 16)
            s = self.cfg.model.seq_len
            train = _SyntheticDataset(n, dn, seed=self.cfg.train.seed, seq_len=s)
            test = _SyntheticDataset(
                max(2, n // 4), dn, seed=self.cfg.train.seed + 1,
                normalizer=train.normalizer, seq_len=s,
            )
            return train, test
        split = None
        if getattr(opt, "split_file", None):
            split = load_split_file(opt.split_file)

        # processed-dataset cache (`TCDiff.py:143-173` semantics); the split
        # selection is part of the key so switching --split_file can't serve
        # a stale cache
        import hashlib

        cache_dir = getattr(opt, "processed_data_dir", None)
        no_cache = getattr(opt, "no_cache", False)
        force = getattr(opt, "force_reload", False)
        split_key = (
            hashlib.sha1("\n".join(sorted(split)).encode()).hexdigest()[:8]
            if split else "all"
        )
        tr_cache = (
            os.path.join(cache_dir, f"train_dn{dn}_{split_key}.npz") if cache_dir else None
        )
        te_cache = (
            os.path.join(cache_dir, f"test_dn{dn}_{split_key}.npz") if cache_dir else None
        )
        if (
            not no_cache and not force and tr_cache
            and os.path.exists(tr_cache) and os.path.exists(te_cache)
        ):
            return AIOZDataset.from_cache(tr_cache), AIOZDataset.from_cache(te_cache)

        train = AIOZDataset(
            opt.data_path, train=True, required_dancer_num=dn, split_file=split
        )
        test = AIOZDataset(
            opt.data_path,
            train=False,
            required_dancer_num=dn,
            split_file=split,
            normalizer=train.normalizer,
        )
        if tr_cache and not no_cache:
            train.save_cache(tr_cache)
            test.save_cache(te_cache)
        return train, test

    # ------------------------------------------------------------ train loop
    def train_loop(self, opt, train_ds=None, test_ds=None) -> None:
        cfg = self.cfg
        if train_ds is None:
            train_ds, test_ds = self.load_datasets(opt)
        self.normalizer = train_ds.normalizer

        run_dir = Path(opt.project) / opt.exp_name
        ckpt_dir = run_dir / "checkpoints"
        render_dir = Path(getattr(opt, "render_dir", run_dir / "renders"))
        # host-0 gating: the analogue of accelerate's is_main_process checks
        # (`TCDiff.py:237-251`); on multi-host meshes only process 0 logs,
        # checkpoints, and renders
        is_host0 = jax.process_index() == 0
        metrics = MetricLogger(
            str(run_dir), project=getattr(opt, "wandb_pj_name", "tcdiff_tpu"),
            config={"lr": cfg.train.learning_rate, "batch": cfg.train.batch_size},
        ) if is_host0 else None

        inner_step = make_train_step(
            self.diffusion, self.tx, cfg.train.ema_beta, cfg.train.ema_interval,
            flat_ema=cfg.train.tp <= 1,
        )
        step_fn = jax.jit(inner_step, donate_argnums=0)
        # scan_steps > 1: run K steps as ONE dispatch (lax.scan over
        # stacked batches) — amortizes per-step host dispatch latency
        # (~25% of wall on a tunneled host, BENCH_NOTES r5). rng folds
        # with state.step inside make_train_step, so per-step randomness
        # is identical to the dispatch-per-step loop
        # (tests/test_train.py::test_scan_of_steps_matches_sequential_dispatch).
        scan_k = max(1, int(getattr(opt, "scan_steps", cfg.train.scan_steps)))
        if scan_k > 1:
            def _scan_block(state, xs_k, cs_k, rng):
                def body(s, xc):
                    return inner_step(s, xc[0], xc[1], rng)

                return jax.lax.scan(body, state, (xs_k, cs_k))

            scan_fn = jax.jit(_scan_block, donate_argnums=0)
        base_rng = jax.device_put(jax.random.key(cfg.train.seed), replicated(self.mesh))
        data_rng = np.random.default_rng(cfg.train.seed)
        timer = StepTimer()
        epochs = getattr(opt, "epochs", cfg.train.epochs)
        save_interval = getattr(opt, "save_interval", cfg.train.save_interval)
        batch_size = getattr(opt, "batch_size", cfg.train.batch_size)
        motion_s = batch_size * cfg.model.seq_len / cfg.data.raw_fps

        # overlap host IO with device steps via the native C++ prefetcher
        # (falls back to synchronous loading without a toolchain)
        from tcdiff_tpu.data.native_loader import PrefetchingBatches, native_available

        use_native = native_available() and not isinstance(train_ds, _SyntheticDataset)

        profile_dir = getattr(opt, "profile_dir", None)
        running, n_batches = {}, 0
        for epoch in range(1, epochs + 1):
            if profile_dir and epoch == 2 and is_host0:
                # trace epoch 2 (epoch 1 pays the compile) — SURVEY §5 notes
                # the reference has no profiling at all
                jax.profiler.start_trace(profile_dir)
            batches = (
                PrefetchingBatches(train_ds, batch_size, rng=data_rng)
                if use_native
                else train_ds.batches(batch_size, rng=data_rng)
            )
            group: list = []
            for batch in batches:
                if scan_k > 1:
                    group.append(batch)
                    if len(group) < scan_k:
                        continue
                    xs, cs = shard_stacked_batch(
                        (
                            jnp.stack([jnp.asarray(b["x"]) for b in group]),
                            jnp.stack([jnp.asarray(b["cond"]) for b in group]),
                        ),
                        self.mesh,
                    )
                    group = []
                    timer.tick()
                    self.state, m = scan_fn(self.state, xs, cs, base_rng)
                    jax.block_until_ready(m["total"])
                    timer.tock(steps=scan_k)
                    k_steps = scan_k
                else:
                    xs, cs = shard_batch(
                        (jnp.asarray(batch["x"]), jnp.asarray(batch["cond"])), self.mesh
                    )
                    timer.tick()
                    self.state, m = step_fn(self.state, xs, cs, base_rng)
                    jax.block_until_ready(m["total"])
                    timer.tock()
                    k_steps = 1
                totals = np.asarray(m["total"]).reshape(-1)
                if not np.isfinite(totals).all():
                    # failure detection the reference lacks (SURVEY §5): halt
                    # with a rescue checkpoint instead of training on NaNs
                    if is_host0:
                        path = save_checkpoint(
                            str(ckpt_dir), int(self.state.step), self.state, self.normalizer
                        )
                        self.logger.error(
                            "non-finite loss %s at step %d; rescue checkpoint at %s",
                            totals, int(self.state.step), path,
                        )
                    raise FloatingPointError(
                        f"non-finite loss at step {int(self.state.step)}"
                    )
                for k, v in m.items():
                    running[k] = running.get(k, 0.0) + float(np.asarray(v).sum())
                n_batches += k_steps
            # epoch tail shorter than a scan block: run it step-by-step so
            # no data is dropped (step_fn is compiled either way)
            for b in group:
                xs, cs = shard_batch(
                    (jnp.asarray(b["x"]), jnp.asarray(b["cond"])), self.mesh
                )
                self.state, m = step_fn(self.state, xs, cs, base_rng)
                total = float(m["total"])
                if not np.isfinite(total):
                    raise FloatingPointError(
                        f"non-finite loss at step {int(self.state.step)}"
                    )
                for k, v in m.items():
                    running[k] = running.get(k, 0.0) + float(v)
                n_batches += 1

            if profile_dir and epoch == 2 and is_host0:
                jax.profiler.stop_trace()

            if epoch % save_interval == 0 and n_batches and is_host0:
                means = {k: v / n_batches for k, v in running.items()}
                means.update(timer.metrics(motion_seconds_per_step=motion_s))
                means["epoch"] = epoch
                metrics.log(means, step=int(self.state.step))
                self.logger.info(
                    "epoch %d | loss %.4f | %.2f steps/s",
                    epoch, means.get("total", float("nan")),
                    means.get("steps_per_sec", float("nan")),
                )
                running, n_batches = {}, 0
                save_checkpoint(str(ckpt_dir), int(self.state.step), self.state, self.normalizer)
                if getattr(opt, "render_during_train", True) and test_ds is not None:
                    try:
                        self.render_eval_samples(
                            test_ds, epoch, str(render_dir), count=2,
                            render=getattr(opt, "render", True),
                        )
                    except Exception as e:  # rendering must never kill training
                        self.logger.warning("render failed: %s", e)
                if getattr(opt, "eval_during_train", False) and test_ds is not None:
                    # quality metrics every save interval (the reference has
                    # only visual smoke tests, SURVEY §4)
                    try:
                        report = self.evaluate_loop(opt, test_ds=test_ds)
                        flat = {
                            f"eval/{k}": v for k, v in report.items()
                            if isinstance(v, (int, float))
                        }
                        for k, v in report.items():  # dbn_traj sub-dict
                            if isinstance(v, dict):
                                flat.update({
                                    f"eval/{k}/{kk}": vv for kk, vv in v.items()
                                    if isinstance(vv, (int, float))
                                })
                        metrics.log(flat, step=int(self.state.step))
                    except Exception as e:
                        self.logger.warning("eval failed: %s", e)
        if metrics is not None:
            metrics.close()

    # -------------------------------------------------------------- sampling
    def _sample(self, cond, x_0, rng, mode="normal", full_ref=None):
        """mode: normal (DDIM), long (sliced DDIM with half-window coupling),
        footwork (leg channels driven by `full_ref`), ddpm (ancestral loop).

        Normal-mode batches shard over the dp mesh axis when divisible —
        sampling is embarrassingly batch-parallel, so eval/serving scales
        across chips with zero communication."""
        cfg = self.cfg.model
        b = cond.shape[0]
        shape = (b, cfg.seq_len * cfg.dancer_num, cfg.nfeats)
        cond = jnp.asarray(cond)
        params = self.eval_params()
        if mode == "long":
            return self._long_sample_fn(params, shape, cond, rng, x_0)
        dp = self.mesh.shape.get("dp", 1)
        if mode == "normal" and dp > 1 and b % dp == 0:
            from jax.sharding import NamedSharding, PartitionSpec as P

            sh = NamedSharding(self.mesh, P("dp"))
            rep = NamedSharding(self.mesh, P())
            fn = jax.jit(self.diffusion.ddim_sample, static_argnums=(1,), out_shardings=sh)
            return fn(
                jax.tree.map(lambda a: jax.device_put(a, rep), params),
                shape,
                jax.device_put(cond, sh),
                jax.device_put(rng, rep),
                None if x_0 is None else jax.device_put(jnp.asarray(x_0), sh),
            )
        if mode == "footwork":
            assert full_ref is not None, "footwork mode needs a reference motion"
            return jax.jit(self.diffusion.ddim_sample_footwork, static_argnums=(1,))(
                params, shape, cond, rng, jnp.asarray(full_ref)
            )
        if mode == "ddpm":
            return jax.jit(self.diffusion.p_sample_loop, static_argnums=(1,))(
                params, shape, cond, rng
            )
        return self._sample_fn(params, shape, cond, rng, x_0)

    def render_eval_samples(
        self, ds, epoch, render_dir, count=2, mode="normal", fk_out=None, render=True
    ):
        """Draw `count` clips with ground-truth trajectories and render them
        (the train-time visual smoke test, `TCDiff.py:276-303`)."""
        idx = list(range(min(count, len(ds))))
        x = np.stack([ds.get(i)[0] for i in idx])
        cond = np.stack([ds.get(i)[1] for i in idx])
        names = [ds.get(i)[3] for i in idx]
        samples = self._sample(
            cond, _gt_traj_x0(x), jax.random.key(int(self.state.step)), mode
        )
        return render_sample(
            samples, self.normalizer, epoch, render_dir,
            self.cfg.model.dancer_num, fk_out=fk_out, name=names, sound=False,
            mode=mode, render=render,
        )

    # ----------------------------------------------- eval loop (GT trajectory)
    def given_trajectory_generation_loop(self, opt, test_ds=None) -> None:
        """Diffusion-stage eval with ground-truth trajectories
        (`TCDiff.py:310-431`, `--mode val_without_TrajModel`)."""
        if test_ds is None:
            _, test_ds = self.load_datasets(opt)
        if self.normalizer is None:
            self.normalizer = test_ds.normalizer
        render_dir = os.path.join(
            getattr(opt, "render_dir", "renders"), "VAL_" + getattr(opt, "exp_name", "exp")
        )
        render_count = min(getattr(opt, "render_count", 30), len(test_ds))
        rng = np.random.default_rng(self.cfg.train.seed)
        mode = getattr(opt, "sample_mode", "normal")
        for epoch in range(1, getattr(opt, "epochs", 1) + 1):
            if mode == "long":
                idx = consecutive_slice_indices(test_ds.feature_files, render_count)
                if len(idx) < 2:  # no consecutive run (e.g. synthetic); any 2+
                    idx = list(range(min(render_count, len(test_ds))))
                items = [test_ds.get(i) for i in idx]
                batch = {
                    "x": np.stack([it[0] for it in items]),
                    "cond": np.stack([it[1] for it in items]),
                    "filename": [it[2] for it in items],
                    "wav": [it[3] for it in items],
                }
            else:
                batch = next(iter(test_ds.batches(render_count, rng=rng)))
            b, dn, s, c = batch["x"].shape
            full_ref = (
                np.transpose(batch["x"], (0, 2, 1, 3)).reshape(b, s * dn, c)
                if mode == "footwork"
                else None
            )
            samples = self._sample(
                batch["cond"], _gt_traj_x0(batch["x"]), jax.random.key(epoch),
                mode, full_ref=full_ref,
            )
            render_sample(
                samples, self.normalizer, epoch, render_dir,
                self.cfg.model.dancer_num,
                fk_out=getattr(opt, "vis_fk_out", None),
                name=batch["wav"], sound=False,
                mode=getattr(opt, "sample_mode", "normal"),
                render=getattr(opt, "render", True),
            )
            self.logger.info("[VAL-RENDER SAVED at Epoch %d]", epoch)

    # ----------------------------------------------------------- metric eval
    def evaluate_loop(self, opt, test_ds=None) -> dict:
        """Quality metrics on generated motion vs ground truth (`--mode eval`).

        The reference has no eval code at all (SURVEY §4); this computes the
        paper's quality axes: FID over kinetic/geometric features,
        diversity, beat alignment, foot skating, collision frequency.

        `--traj_source {gt,dbn,both}` selects the trajectory setting:
        `gt` conditions on ground-truth trajectories (the reference's
        `val_without_TrajModel` stage isolation, `TCDiff.py:310-431`);
        `dbn` runs the FULL two-stage pipeline — DBN rollout + Kalman
        exactly as `test_loop` does (`TCDiff.py:503-553`) — so the report
        is comparable to the paper's main (full-pipeline) table; `both`
        reports the GT-setting metrics flat plus a `dbn_traj` sub-dict.
        """
        import json

        from tcdiff_tpu.eval import evaluate
        from tcdiff_tpu.geometry import smpl_fk
        from tcdiff_tpu.viz.postprocess import split_sample

        if test_ds is None:
            _, test_ds = self.load_datasets(opt)
        if self.normalizer is None:
            self.normalizer = test_ds.normalizer
        count = min(getattr(opt, "render_count", 30), len(test_ds))
        dn = self.cfg.model.dancer_num
        traj_source = getattr(opt, "traj_source", "gt")
        assert traj_source in ("gt", "dbn", "both"), traj_source

        def fk_batch(samples):
            _, pos, q = split_sample(samples, self.normalizer, dn)
            joints = np.asarray(smpl_fk(q, pos))  # (b, seq*dn, 24, 3)
            b = joints.shape[0]
            seq = joints.shape[1] // dn
            joints = joints.reshape(b, seq, dn, 24, 3).transpose(0, 2, 1, 3, 4)
            roots = np.asarray(pos).reshape(b, seq, dn, 3).transpose(0, 2, 1, 3)
            return joints, roots

        batch = next(iter(test_ds.batches(count, rng=np.random.default_rng(0))))
        x = batch["x"]
        b, dnn, s, c = x.shape
        gt_flat = jnp.asarray(np.transpose(x, (0, 2, 1, 3)).reshape(b, s * dnn, c))
        ref_joints, _ = fk_batch(gt_flat)

        def metric_set(x_0):
            samples = self._sample(
                batch["cond"], x_0, jax.random.key(self.cfg.train.seed)
            )
            gen_joints, gen_roots = fk_batch(samples)
            return evaluate(
                gen_joints, ref_joints,
                music_feats=list(batch["cond"]), gen_roots=gen_roots,
            )

        report = {}
        if traj_source in ("gt", "both"):
            report.update(metric_set(_gt_traj_x0(x)))
        if traj_source in ("dbn", "both"):
            dbn_set = metric_set(self._make_dbn_traj_fn(opt)(x, batch["cond"]))
            if traj_source == "dbn":
                report.update(dbn_set)
            else:
                report["dbn_traj"] = dbn_set
        report["traj_source"] = traj_source
        self.logger.info("eval metrics: %s", report)
        out = Path(getattr(opt, "project", "runs")) / getattr(opt, "exp_name", "exp")
        out.mkdir(parents=True, exist_ok=True)
        with open(out / "eval.json", "w") as f:
            json.dump(report, f, indent=2)
        return report

    # ------------------------------------------------ DBN trajectory stage
    def _make_dbn_traj_fn(self, opt):
        """Build the DBN trajectory stage of the two-stage pipeline
        (`TCDiff.py:503-553`): load the TrajDecoder, return a function
        (x, cond) -> x_0 that seeds on the first `window_size` GT frames,
        rolls out autoregressively, Kalman-smooths, and packs the generated
        XY (+ zero z) in the sampler's x_0 layout. Shared by `test_loop`
        and `evaluate_loop(traj_source="dbn")` so metrics exercise exactly
        the render path."""
        tcfg = self.cfg.traj
        traj_model = TrajDecoder(tcfg)
        traj_params = self._load_traj_params(opt, traj_model)
        rollout = jax.jit(
            lambda p, seed, music: autoregressive_rollout(
                traj_model, p, seed, music, tcfg.window_size, tcfg.step
            )
        )

        def dbn_traj(x, cond):
            x = jnp.asarray(x)  # (b, dn, S, 151) normalized
            cond = jnp.asarray(cond)
            seed_traj = x[:, :, : tcfg.window_size, 4:6]
            traj = rollout(traj_params, seed_traj, cond)  # (b, dn, L, 2)
            traj = kalman_smooth_batch(traj)
            s = x.shape[2]
            if traj.shape[2] < s:  # music too short to roll the full clip
                pad = jnp.repeat(traj[:, :, -1:], s - traj.shape[2], axis=2)
                traj = jnp.concatenate([traj, pad], axis=2)
            traj = traj[:, :, :s]  # clamp to the clip length
            b, dn = traj.shape[:2]
            xy = jnp.transpose(traj, (0, 2, 1, 3)).reshape(b, s * dn, 2)
            return jnp.concatenate([xy, jnp.zeros_like(xy[..., :1])], axis=-1)

        return dbn_traj

    # --------------------------------------------------- test loop (full DBN)
    def test_loop(self, opt, test_ds=None) -> None:
        """Full two-stage pipeline (`TCDiff.py:434-625`, `--mode test`):
        DBN rollout seeds on the first `window_size` GT frames, extends by
        `step` frames per scan iteration, Kalman-smooths, then conditions
        the diffusion sampler on the generated trajectory."""
        tcfg = self.cfg.traj
        if test_ds is None:
            _, test_ds = self.load_datasets(opt)
        if self.normalizer is None:
            self.normalizer = test_ds.normalizer

        dbn_traj = self._make_dbn_traj_fn(opt)
        render_dir = os.path.join(
            getattr(opt, "render_dir", "renders"), "TEST_" + getattr(opt, "exp_name", "exp")
        )
        render_count = min(getattr(opt, "render_count", 30), len(test_ds))
        rng = np.random.default_rng(tcfg.seed)

        for epoch in range(1, getattr(opt, "epochs", 1) + 1):
            batch = next(iter(test_ds.batches(render_count, rng=rng)))
            cond = jnp.asarray(batch["cond"])
            x_0 = dbn_traj(batch["x"], cond)
            samples = self._sample(cond, x_0, jax.random.key(epoch))
            render_sample(
                samples, self.normalizer, epoch, render_dir,
                self.cfg.model.dancer_num,
                fk_out=getattr(opt, "vis_fk_out", None),
                name=batch["wav"], sound=False,
                render=getattr(opt, "render", True),
            )
            self.logger.info("[TEST-RENDER SAVED at Epoch %d]", epoch)

    # ------------------------------------------------- wav -> dance serving
    def _window_starts(self, feats, wav_path):
        """Window starts for slicing `feats` into 301-frame windows at
        2.5 s stride. Audio shorter than one 5 s window is edge-padded to
        one full window (the caller truncates the generated motion back to
        the true audio length) instead of erroring — the reference
        silently assumes well-formed input (`TCDiff.py:310-625`)."""
        seq = self.cfg.model.seq_len
        win_f, stride_f = 2 * seq + 1, seq
        if feats.shape[0] < 2:
            raise ValueError(f"{wav_path}: audio too short to extract any features")
        true_motion = feats.shape[0] // 2  # music runs at 2x motion FPS
        starts = list(range(0, feats.shape[0] - win_f + 1, stride_f))
        if not starts:
            pad = win_f - feats.shape[0]
            self.logger.warning(
                "%s: audio (%d feature frames) shorter than one 5 s window; "
                "edge-padding and truncating the motion to %d frames",
                wav_path, feats.shape[0], true_motion,
            )
            feats = np.concatenate([feats, np.repeat(feats[-1:], pad, axis=0)])
            starts = [0]
        else:
            covered = (len(starts) - 1) * (seq // 2) + seq
            if true_motion > covered:
                # multi-window mode keeps the reference's whole-window
                # stitching, so audio past the last full 5 s window is
                # dropped — say so instead of doing it silently (ADVICE r3;
                # the short-audio path above already warns)
                self.logger.warning(
                    "%s: dropping %d trailing motion frames (%.2f s) past "
                    "the last full window (%d of %d frames covered)",
                    wav_path, true_motion - covered,
                    (true_motion - covered) / 30.0, covered, true_motion,
                )
            true_motion = covered
        return feats, starts, true_motion

    @staticmethod
    def _truncate_motion(flat, seq, dn, m):
        """(b, seq*dn, C) time-major tokens -> first m motion frames."""
        if m >= seq:
            return flat
        b, _, c = flat.shape
        return flat.reshape(b, seq, dn, c)[:, :m].reshape(b, m * dn, c)

    def generate(self, wav_path: str, opt) -> np.ndarray:
        """Direct wav-to-choreography inference (`--mode generate`).

        The full serving path with no dataset on disk: extract 438-d
        features from the wav, slice them into 5 s windows at 2.5 s stride
        (SURVEY §5 long-form scheme), roll the DBN trajectory over the whole
        song from a default circle formation, then run the slice-coupled
        long-form DDIM and stitch. Requires a trained checkpoint for good
        output; runs end-to-end regardless.
        """
        from tcdiff_tpu.data.features import SR, wav_processing

        assert self.normalizer is not None, "generate needs a checkpoint (normalizer)"
        mcfg = self.cfg.model
        tcfg = self.cfg.traj
        seq = mcfg.seq_len
        feats = wav_processing(wav_path)  # (F, 438) @ 60 FPS
        win_f = 2 * seq + 1  # 301-frame windows, 2.5 s stride
        feats, starts, true_motion = self._window_starts(feats, wav_path)
        cond = np.stack([feats[s : s + win_f] for s in starts])  # (n, 301, 438)
        n = len(starts)
        dn = mcfg.dancer_num

        # default formation: dancers on a circle, in NORMALIZED XY space
        # (channels 4,5) like the DBN consumes in test mode (`TCDiff.py:533`)
        angles = 2 * np.pi * np.arange(dn) / dn
        world = np.stack([np.cos(angles), np.sin(angles)], -1) * 1.0  # (dn, 2)
        scale = np.asarray(self.normalizer.scale)[4:6]
        offset = np.asarray(self.normalizer.offset)[4:6]
        seed_xy = np.clip(world * scale + offset, -1, 1).astype(np.float32)
        seed = np.broadcast_to(
            seed_xy[None, :, None, :], (1, dn, tcfg.window_size, 2)
        ).copy()

        traj_model = TrajDecoder(tcfg)
        traj_params = self._load_traj_params(opt, traj_model)
        traj = autoregressive_rollout(
            traj_model, traj_params, jnp.asarray(seed), jnp.asarray(feats[None]),
            tcfg.window_size, tcfg.step,
        )
        traj = kalman_smooth_batch(traj)[0]  # (dn, L, 2)

        need = (n - 1) * (seq // 2) + seq  # motion frames covered by slices
        if traj.shape[1] < need:
            pad = jnp.repeat(traj[:, -1:], need - traj.shape[1], axis=1)
            traj = jnp.concatenate([traj, pad], axis=1)
        # per-slice trajectories at 2.5 s (= seq//2 motion frames) stride
        x0 = []
        for i in range(n):
            lo = i * (seq // 2)
            t = traj[:, lo : lo + seq]  # (dn, seq, 2)
            xy = jnp.transpose(t, (1, 0, 2)).reshape(seq * dn, 2)
            x0.append(jnp.concatenate([xy, jnp.zeros_like(xy[:, :1])], axis=-1))
        x_0 = jnp.stack(x0)  # (n, seq*dn, 3)

        # a single (possibly padded) window has no neighbor to couple with:
        # plain DDIM, truncated back to the true audio length
        mode = "long" if n > 1 else "normal"
        samples = self._sample(cond, x_0, jax.random.key(self.cfg.train.seed), mode)
        if n == 1:
            samples = self._truncate_motion(samples, seq, dn, true_motion)
        stem = os.path.splitext(os.path.basename(wav_path))[0]
        return render_sample(
            samples, self.normalizer, "gen",
            os.path.join(getattr(opt, "render_dir", "renders"), "GEN_" + stem),
            dn, fk_out=getattr(opt, "vis_fk_out", None),
            name=[wav_path] * n, sound=False, mode=mode,
            render=getattr(opt, "render", True),
        )

    def generate_streaming(
        self, wav_path: str, opt, on_slice=None,
        resume_from: int = 0, resume_tail=None,
    ) -> np.ndarray:
        """Low-latency wav-to-dance: slices are generated CAUSALLY, one at a
        time, each inpainting its first half-window from the previous
        slice's tail (`ddim_sample_stream`). First motion appears after one
        slice instead of after the whole song; memory is O(1) in song
        length.

        The DBN stage is PIPELINED with denoising via `TrajectoryStreamer`:
        instead of rolling the whole song's trajectory up-front
        (`/root/reference/TCDiff.py:527-550` — O(song) before the first
        frame), the rollout + Kalman advance only far enough for the next
        slice, and slice i's trajectory is produced while the device still
        owns slice i-1's denoise (async dispatch, no host syncs in the
        loop). The trajectory values are exactly the full-rollout result
        (tests/test_streaming_pipeline.py).

        `on_slice(i, s4)`: optional consumer called with each slice's device
        array as soon as it is enqueued — a live client would block on
        exactly one slice here. Returns the assembled (L, dn, 151) motion
        and renders/exports like `generate`.

        Mid-song resume: `resume_from=k` restarts generation at slice k
        given `resume_tail`, the (1, half*dn, C) normalized tail of slice
        k-1 (as produced by a previous run's slices). Each slice depends
        only on (its window, its trajectory, its key, the previous tail)
        and the trajectory streamer is deterministic, so the resumed
        stream is bit-identical to the uninterrupted one; the return value
        covers slices k..end."""
        from tcdiff_tpu.data.features import wav_processing
        from tcdiff_tpu.trajdecoder.streaming import TrajectoryStreamer

        assert self.normalizer is not None, "needs a checkpoint (normalizer)"
        mcfg = self.cfg.model
        tcfg = self.cfg.traj
        seq, dn = mcfg.seq_len, mcfg.dancer_num
        half = seq // 2
        feats = wav_processing(wav_path)
        win_f = 2 * seq + 1
        feats, starts, true_motion = self._window_starts(feats, wav_path)
        if resume_from:
            if not 0 < resume_from < len(starts):
                raise ValueError(
                    f"resume_from={resume_from} out of range (1..{len(starts) - 1})"
                )
            if resume_tail is None:
                raise ValueError("resume_from needs resume_tail (previous slice's tail)")
            starts_iter = list(enumerate(starts))[resume_from:]
        else:
            starts_iter = list(enumerate(starts))

        # trajectory seed: default circle formation, as in generate()
        angles = 2 * np.pi * np.arange(dn) / dn
        world = np.stack([np.cos(angles), np.sin(angles)], -1)
        scale = np.asarray(self.normalizer.scale)[4:6]
        offset = np.asarray(self.normalizer.offset)[4:6]
        seed_xy = np.clip(world * scale + offset, -1, 1).astype(np.float32)
        seed = np.broadcast_to(seed_xy[None, :, None, :], (1, dn, tcfg.window_size, 2)).copy()
        traj_model = TrajDecoder(tcfg)
        traj_params = self._load_traj_params(opt, traj_model)
        streamer = TrajectoryStreamer(
            traj_model, traj_params, seed, feats[None], tcfg.window_size, tcfg.step
        )

        shape = (1, seq * dn, mcfg.nfeats)
        stream_fn = jax.jit(self.diffusion.ddim_sample_stream, static_argnums=(1,))
        params = self.eval_params()
        pieces = []
        prev_tail = None if not resume_from else jnp.asarray(resume_tail)
        for i, s in starts_iter:
            t = streamer.frames(i * half + seq)[0, :, i * half : i * half + seq]
            xy = jnp.transpose(t, (1, 0, 2)).reshape(1, seq * dn, 2)
            x_0 = jnp.concatenate([xy, jnp.zeros_like(xy[..., :1])], axis=-1)
            cond = jnp.asarray(feats[s : s + win_f][None])
            sample = stream_fn(
                params, shape, cond, jax.random.key(1000 + i), x_0, prev_tail
            )  # (1, seq*dn, C) — enqueued, NOT synced: the host moves on to
            # the next slice's trajectory while the device denoises
            s4 = sample.reshape(1, seq, dn, mcfg.nfeats)
            pieces.append(s4[0] if i == 0 else s4[0, half:])
            prev_tail = s4[:, half:].reshape(1, half * dn, mcfg.nfeats)
            if on_slice is not None:
                on_slice(i, s4)

        full = np.asarray(jnp.concatenate(pieces, axis=0))  # (L, dn, C) normalized
        if not resume_from and full.shape[0] > true_motion:
            full = full[:true_motion]  # padded short audio: drop the pad tail
        flat = jnp.asarray(full.reshape(1, -1, mcfg.nfeats))
        stem = os.path.splitext(os.path.basename(wav_path))[0]
        render_sample(
            flat, self.normalizer, "stream",
            os.path.join(getattr(opt, "render_dir", "renders"), "GEN_" + stem),
            dn, fk_out=getattr(opt, "vis_fk_out", None),
            name=[wav_path], sound=False, render=getattr(opt, "render", True),
        )
        return full

    def _load_traj_params(self, opt, traj_model: TrajDecoder):
        tcfg = self.cfg.traj
        init = traj_model.init(
            jax.random.key(tcfg.seed),
            jnp.zeros((1, self.cfg.model.dancer_num, tcfg.window_size, tcfg.nfeats)),
            jnp.zeros((1, (tcfg.window_size + tcfg.step) * 2, tcfg.cond_feature_dim)),
        )["params"]
        path = getattr(opt, "traj_checkpoint", None)
        if not path:
            self.logger.warning("no --traj_checkpoint given; using random DBN weights")
            return init
        if path.endswith(".pt") or path.endswith(".pth"):
            import torch

            from tcdiff_tpu.interop.torch_convert import traj_decoder_params_from_torch

            sd = {
                k: v.numpy()
                for k, v in torch.load(path, map_location="cpu", weights_only=False)["net"].items()
            }
            loaded = traj_decoder_params_from_torch(sd, trans_layer=tcfg.trans_layer)
            return jax.tree.map(jnp.asarray, loaded)
        from tcdiff_tpu.utils import latest_checkpoint, load_checkpoint

        if os.path.isdir(path) and not os.path.basename(path).startswith("ckpt_"):
            found = latest_checkpoint(path)
            if found is None:
                raise FileNotFoundError(f"no ckpt_* under {path}")
            path = found
        restored = load_checkpoint(path)
        from flax import serialization

        return serialization.from_state_dict(init, restored["state"]["params"])
