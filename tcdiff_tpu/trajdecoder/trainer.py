"""DBN (Dance-Beat Navigator) trainer.

Rebuilds `/root/reference/TrajDecoder/train_traj.py:26-287` as a jitted
iteration step: random 100-frame window with 25-frame prediction shift, the
three-term loss (recon + 2*inter-dancer-distance + 2*velocity,
`train_traj.py:183-196`), AdamW betas (0.5, 0.9) with a MultiStep lr
schedule (x0.05 at iter 60000, `utils_model.py:156`,
`option_traj.py:53-56`). The random window index moves inside the jitted
step (folded PRNG), so the whole iteration is one XLA program.

Every `print_iter` iterations: eval rollout on a test batch, vectorized
Kalman smoothing, optional trajectory render, checkpoint
(`train_traj.py:211-284`).
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax

from tcdiff_tpu.config import TrajDecoderConfig
from tcdiff_tpu.parallel import make_mesh, replicated, shard_batch
from tcdiff_tpu.train.state import TrainState, create_train_state
from tcdiff_tpu.trajdecoder.kalman import kalman_smooth_batch
from tcdiff_tpu.trajdecoder.model import TrajDecoder
from tcdiff_tpu.trajdecoder.rollout import autoregressive_rollout
from tcdiff_tpu.utils import MetricLogger, StepTimer, get_logger, save_checkpoint


def make_traj_optimizer(cfg: TrajDecoderConfig) -> optax.GradientTransformation:
    schedule = optax.piecewise_constant_schedule(
        cfg.lr, {m: cfg.gamma for m in cfg.lr_milestones}
    )
    return optax.adamw(
        schedule, b1=cfg.adam_betas[0], b2=cfg.adam_betas[1], weight_decay=cfg.weight_decay
    )


def traj_losses(pred: jnp.ndarray, target: jnp.ndarray):
    """recon + 2*dis + 2*vel on (b, dn, W, 2) (`train_traj.py:183-196`)."""
    recon = jnp.mean((pred - target) ** 2)
    dis = jnp.mean(
        ((target[:, 1:] - target[:, :-1]) - (pred[:, 1:] - pred[:, :-1])) ** 2
    ) if pred.shape[1] > 1 else jnp.zeros(())
    vel = jnp.mean(
        ((target[:, :, 1:] - target[:, :, :-1]) - (pred[:, :, 1:] - pred[:, :, :-1])) ** 2
    )
    total = recon + 2.0 * dis + 2.0 * vel
    return total, {"recon": recon, "dis_loss": dis, "v_loss": vel}


def make_traj_train_step(model: TrajDecoder, tx, cfg: TrajDecoderConfig):
    w, step = cfg.window_size, cfg.step

    def train_step(state: TrainState, x, cond, rng):
        """x: (b, dn, S, 3) normalized roots; cond: (b, >=2S, 438)."""
        step_rng = jax.random.fold_in(rng, state.step)
        win_rng, drop_rng = jax.random.split(step_rng)
        s = x.shape[2]
        rand_start = jax.random.randint(win_rng, (), 0, s - w - step)

        xy = x[..., :2]
        x_cond = jax.lax.dynamic_slice_in_dim(xy, rand_start, w, axis=2)
        x_target = jax.lax.dynamic_slice_in_dim(xy, rand_start + step, w, axis=2)
        music = jax.lax.dynamic_slice_in_dim(cond, rand_start * 2, (w + step) * 2, axis=1)

        def loss_fn(params):
            pred = model.apply(
                {"params": params}, x_cond, music,
                deterministic=False, rngs={"dropout": drop_rng},
            )
            return traj_losses(pred, x_target)

        (total, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1, params=new_params, ema_params=state.ema_params,
            opt_state=new_opt,
        )
        return new_state, dict(parts, total=total)

    return train_step


class TrajTrainer:
    """Iteration-based DBN training orchestration."""

    def __init__(self, cfg: TrajDecoderConfig, dancer_num: int = 3, dp: int = -1):
        self.cfg = cfg
        self.dancer_num = dancer_num
        self.model = TrajDecoder(cfg)
        self.tx = make_traj_optimizer(cfg)
        self.mesh = make_mesh(dp=dp, tp=1)
        self.logger = get_logger()

        params = self.model.init(
            jax.random.key(cfg.seed),
            jnp.zeros((1, dancer_num, cfg.window_size, cfg.nfeats)),
            jnp.zeros((1, (cfg.window_size + cfg.step) * 2, cfg.cond_feature_dim)),
        )["params"]
        n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
        self.logger.info("TrajDecoder parameters: %.2fM", n_params / 1e6)
        self.state = jax.device_put(
            create_train_state(params, self.tx), replicated(self.mesh)
        )
        self._step_fn = jax.jit(
            make_traj_train_step(self.model, self.tx, cfg), donate_argnums=0
        )
        self._rollout_fn = jax.jit(
            lambda p, seed, music: autoregressive_rollout(
                self.model, p, seed, music, cfg.window_size, cfg.step
            )
        )

    def eval_rollout(self, batch, smooth: bool = True):
        """Seeded AR rollout over a host batch; returns (b, dn, L, 2) numpy."""
        x = jnp.asarray(batch["x"])[..., :2]
        seed = x[:, :, : self.cfg.window_size]
        traj = self._rollout_fn(self.state.params, seed, jnp.asarray(batch["cond"]))
        if smooth:
            traj = kalman_smooth_batch(traj)
        return np.asarray(traj)

    def train(
        self,
        train_ds,
        test_ds=None,
        total_iter: Optional[int] = None,
        out_dir: str = "runs/traj",
        render: bool = False,
        batch_size: Optional[int] = None,
    ):
        cfg = self.cfg
        total = total_iter if total_iter is not None else cfg.total_iter
        bs = batch_size or cfg.batch_size
        if bs > len(train_ds):  # drop_last batching would yield nothing
            self.logger.warning(
                "batch %d > dataset %d; clamping", bs, len(train_ds)
            )
            bs = len(train_ds)
        out = Path(out_dir)
        metrics = MetricLogger(str(out), config={"lr": cfg.lr, "batch": bs})
        base_rng = jax.device_put(jax.random.key(cfg.seed), replicated(self.mesh))
        data_rng = np.random.default_rng(cfg.seed)
        timer = StepTimer()

        def cycle():
            while True:
                yield from train_ds.batches(bs, rng=data_rng)

        it = cycle()
        running, n = {}, 0
        while int(self.state.step) < total:
            batch = next(it)
            xs, cs = shard_batch(
                (jnp.asarray(batch["x"]), jnp.asarray(batch["cond"])), self.mesh
            )
            timer.tick()
            self.state, m = self._step_fn(self.state, xs, cs, base_rng)
            jax.block_until_ready(m["total"])
            timer.tock()
            for k, v in m.items():
                running[k] = running.get(k, 0.0) + float(v)
            n += 1

            it_num = int(self.state.step)
            if it_num % cfg.print_iter == 0:
                means = {k: v / n for k, v in running.items()}
                means.update(timer.metrics())
                metrics.log(means, step=it_num)
                self.logger.info(
                    "Train. Iter %d : Loss. %.5f recon. %.5f dis_loss. %.5f v_loss. %.5f",
                    it_num, means.get("total", 0), means.get("recon", 0),
                    means.get("dis_loss", 0), means.get("v_loss", 0),
                )
                running, n = {}, 0
                save_checkpoint(str(out / "ckpt"), it_num, self.state, train_ds.normalizer)
                if test_ds is not None:
                    eval_batch = next(iter(test_ds.batches(min(bs, len(test_ds)))))
                    traj = self.eval_rollout(eval_batch)
                    if render:
                        from tcdiff_tpu.viz.traj_render import render_traj_sample

                        render_traj_sample(
                            traj, str(out / "renders"), epoch=it_num,
                            names=eval_batch["wav"],
                            pkl_out=str(out / "traj_pkl"),
                        )
        metrics.close()
        return self.state
