"""Adan (Adaptive Nesterov Momentum) as an optax GradientTransformation.

Semantics match the reference implementation
(`/root/reference/model/adan.py:33-123`) exactly, including its quirks:

  * on the FIRST step the moment buffers stay zero (the `step > 0` guard,
    `adan.py:71`), so the only effect is the multiplicative weight-decay
    shrink `params /= (1 + wd * lr)`;
  * bias corrections use the post-increment step count (`adan.py:88-92`);
  * decoupled weight decay is applied as a division AFTER the gradient step
    (`adan.py:99-105`).

The restart condition (`adan.py:111-116`) is not reproduced — the reference
never passes one (`TCDiff.py:110` constructs Adan without it).

The elementwise math can run over ONE raveled flat vector (see
optim/flatten.py) with results sliced back into the unchanged per-leaf
state layout; TCDIFF_FLAT_OPT=1/0 or fused=True/False forces either form
(per-leaf is automatic when param dtypes are mixed). The two are
elementwise-identical. The DEFAULT is backend-dependent, both directions
measured (BENCH_NOTES r2/r4c): on the pure-XLA train step the flat form
won 27% of the step, but under the fused Pallas train kernels (default ON
on TPU since r5) the step is ~3x faster and the flat form's ravel/concat
traffic LOST 5% absolute MFU (ALL3 FLAT_OPT0 6.114 steps/s vs 5.82/5.52
with it). So: per-leaf on TPU (where the kernels are the default), flat
elsewhere.
"""

from __future__ import annotations

import os
from typing import NamedTuple, Optional, Tuple

import chex
import jax
import jax.numpy as jnp
import optax

from tcdiff_tpu.optim.flatten import flat, homogeneous_dtype, unflat_like


class AdanState(NamedTuple):
    count: chex.Array  # int32 scalar
    m: optax.Updates
    v: optax.Updates
    n: optax.Updates
    prev_grad: optax.Updates


def adan(
    learning_rate: float,
    betas: Tuple[float, float, float] = (0.02, 0.08, 0.01),
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    fused: Optional[bool] = None,
) -> optax.GradientTransformation:
    b1, b2, b3 = betas
    if fused is None:
        v = os.environ.get("TCDIFF_FLAT_OPT")
        if v is not None:
            fused = v == "1"
        else:
            # measured both ways (module docstring): flat wins on the XLA
            # train path, loses under the TPU-default Pallas train kernels
            fused = jax.default_backend() != "tpu"

    def init_fn(params):
        zeros = lambda: jax.tree.map(jnp.zeros_like, params)
        return AdanState(jnp.zeros([], jnp.int32), zeros(), zeros(), zeros(), zeros())

    def _moments(first, g, m0, v0, n0, pg):
        """Elementwise moment updates — shared by the per-leaf and flat
        forms (`adan.py:71-84`; buffers stay zero on step one)."""
        m = jnp.where(first, m0, m0 * (1 - b1) + g * b1)
        v = jnp.where(first, v0, v0 * (1 - b2) + (g - pg) * b2)
        n = jnp.where(first, n0, n0 * (1 - b3) + (g + (1 - b2) * (g - pg)) ** 2 * b3)
        return m, v, n

    def update_fn(grads, state, params):
        if params is None:
            raise ValueError("adan requires params (decay is multiplicative on weights)")
        first = state.count == 0  # buffers stay zero on step one (`adan.py:71-84`)
        count = state.count + 1
        cf = count.astype(jnp.float32)
        correct_m = 1.0 / (1.0 - (1.0 - b1) ** cf)
        correct_v = 1.0 / (1.0 - (1.0 - b2) ** cf)
        correct_n = 1.0 / (1.0 - (1.0 - b3) ** cf)
        denom = 1.0 + weight_decay * learning_rate

        def delta(p, m, v, n):
            step_size = learning_rate / (jnp.sqrt(n * correct_n) + eps)
            new_p = (p - step_size * (m * correct_m + (1 - b2) * v * correct_v)) / denom
            return new_p - p

        if fused and homogeneous_dtype(params):
            # one flat fused update; per-leaf state layout preserved via
            # slice-backs (optim/flatten.py)
            g = flat(grads)
            m, v, n = _moments(
                first, g, flat(state.m), flat(state.v), flat(state.n),
                flat(state.prev_grad),
            )
            updates = unflat_like(delta(flat(params), m, v, n), params)
            return updates, AdanState(
                count,
                unflat_like(m, params),
                unflat_like(v, params),
                unflat_like(n, params),
                grads,
            )

        # per-leaf fallback (mixed dtypes / opt-out)
        m = jax.tree.map(
            lambda g, m0: jnp.where(first, m0, m0 * (1 - b1) + g * b1), grads, state.m
        )
        v = jax.tree.map(
            lambda g, v0, pg: jnp.where(first, v0, v0 * (1 - b2) + (g - pg) * b2),
            grads, state.v, state.prev_grad,
        )
        n = jax.tree.map(
            lambda g, n0, pg: jnp.where(
                first, n0, n0 * (1 - b3) + (g + (1 - b2) * (g - pg)) ** 2 * b3
            ),
            grads, state.n, state.prev_grad,
        )
        updates = jax.tree.map(delta, params, m, v, n)
        return updates, AdanState(count, m, v, n, grads)

    return optax.GradientTransformation(init_fn, update_fn)
