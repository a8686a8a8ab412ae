"""Training state pytree: params, EMA shadow, optimizer state, step.

The reference keeps these spread across `self.model`, `diffusion.master_model`
(the EMA deepcopy, `model/diffusion.py:100-101`) and the torch optimizer;
here it is one pytree that rides through jit/donation/checkpointing.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    ema_params: Any
    opt_state: Any


def create_train_state(params, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(
        step=jnp.zeros([], jnp.int32),
        params=params,
        ema_params=jax.tree.map(jnp.copy, params),
        opt_state=tx.init(params),
    )
