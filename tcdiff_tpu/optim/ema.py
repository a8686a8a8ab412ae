"""Exponential moving average of a parameter pytree.

Matches the reference EMA (`/root/reference/model/diffusion.py:61-76`):
ma = old * beta + (1 - beta) * new, updated every `ema_interval` steps from
the already-synchronized parameters (`TCDiff.py:242-245`). Under pjit all
replicas hold identical params, so updating everywhere is equivalent to the
reference's main-process-only update.
"""

from __future__ import annotations

import jax


def ema_update(ema_params, params, beta: float = 0.9999):
    return jax.tree.map(lambda e, p: e * beta + (1.0 - beta) * p, ema_params, params)
