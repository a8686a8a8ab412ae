"""Device mesh and sharding helpers.

The reference's only parallelism is DDP data-parallel over NCCL via HF
Accelerate (`/root/reference/TCDiff.py:51-54,108-111,232`). Here the
equivalent is a `jax.sharding.Mesh` with a `dp` axis (batch-sharded) and a
`tp` axis reserved for tensor parallelism (size 1 by default — the 512-wide
net doesn't need TP, but the mesh carries the axis so it can be enabled
without restructuring). Gradients are all-reduced by XLA over ICI when the
batch is sharded and params are replicated; no hand-written collectives.

Multi-host: call `jax.distributed.initialize()` before `make_mesh` and the
same code spans slices (DCN), exactly like the single-host path.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int = -1, tp: int = 1, devices: Optional[Sequence] = None) -> Mesh:
    """Build a (dp, tp) mesh. dp=-1 means all remaining devices."""
    devices = list(jax.devices()) if devices is None else list(devices)
    n = len(devices)
    if dp == -1:
        if n % tp != 0:
            raise ValueError(f"{n} devices not divisible by tp={tp}")
        dp = n // tp
    if dp * tp < n:
        devices = devices[: dp * tp]  # use a prefix of the devices
        n = len(devices)
    if dp * tp != n:
        raise ValueError(f"dp*tp = {dp * tp} != {n} devices")
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim split over dp; everything else replicated."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a pytree of host arrays onto the mesh, batch dim over dp."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, sh), batch)


def shard_stacked_batch(batch, mesh: Mesh):
    """Place (K, batch, ...) stacks on the mesh: scan axis replicated,
    batch dim over dp — lax.scan slices along axis 0, so each per-step
    slice carries the same P("dp") layout shard_batch produces."""
    sh = NamedSharding(mesh, P(None, "dp"))
    return jax.tree.map(lambda a: jax.device_put(a, sh), batch)
