"""The pjit-able training step.

One jitted function covering what the reference spreads over
`TCDiff.train_loop`'s inner loop (`/root/reference/TCDiff.py:223-245`):
loss forward, backward, Adan step, EMA lerp. Under a (dp, tp) mesh with the
batch sharded over dp and params replicated, XLA inserts the gradient
all-reduce (psum over ICI) automatically — the analogue of
`accelerator.backward`'s NCCL all-reduce.

The EMA updates every `ema_interval` steps from the post-update params, like
the reference's main-process EMA after `optim.step()`
(`TCDiff.py:234,242-245`); since pjit params are identical on all replicas,
updating everywhere matches main-process-only semantics.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

from tcdiff_tpu.diffusion import GaussianDiffusion
from tcdiff_tpu.optim import ema_update
from tcdiff_tpu.optim.flatten import flat, homogeneous_dtype, unflat_like
from tcdiff_tpu.train.state import TrainState


def make_train_step(
    diffusion: GaussianDiffusion,
    tx: optax.GradientTransformation,
    ema_beta: float = 0.9999,
    ema_interval: int = 1,
    flat_ema: bool = True,
) -> Callable:
    """Returns train_step(state, x, cond, rng) -> (state, metrics).

    x: (B, dn, seq, 151) normalized motion; cond: (B, 301, 438).
    rng: a base key — folded with state.step so one key serves the whole run.
    flat_ema: use the fused flat-vector EMA lerp (optim/flatten.py). Pass
    False under tp>1 — concatenating tensor-parallel-sharded leaves into one
    vector would force a mid-step gather (ADVICE r3); callers that know the
    mesh gate this (orchestrator, dryrun).
    """

    def train_step(state: TrainState, x, cond, rng):
        step_rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            return diffusion.loss(params, x, cond, step_rng)

        (total, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        do_ema = (state.step % ema_interval) == 0
        if flat_ema and homogeneous_dtype(state.ema_params):
            # one flat fused lerp (see optim/flatten.py), elementwise-
            # identical to the per-leaf form
            fe = flat(state.ema_params)
            fl = fe * ema_beta + (1.0 - ema_beta) * flat(new_params)
            new_ema = unflat_like(jnp.where(do_ema, fl, fe), state.ema_params)
        else:
            lerped = ema_update(state.ema_params, new_params, ema_beta)
            new_ema = jax.tree.map(
                lambda e, l: jnp.where(do_ema, l, e), state.ema_params, lerped
            )

        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            ema_params=new_ema,
            opt_state=new_opt_state,
        )
        metrics = dict(parts, total=total, grad_norm=optax.global_norm(grads))
        return new_state, metrics

    return train_step
