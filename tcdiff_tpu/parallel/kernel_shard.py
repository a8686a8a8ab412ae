"""Batch-dim `shard_map` wrapping for Pallas kernel call sites.

Why this exists (VERDICT r3 #4 / ROADMAP r3): a `pl.pallas_call` lowers to
an opaque custom call, and XLA's SPMD partitioner has no sharding rule for
it — under a dp-sharded train step (the analogue of the reference's DDP
all-reduce, `/root/reference/TCDiff.py:232`) GSPMD's legal fallback is to
ALL-GATHER the kernel's operands onto every device and replicate the
compute. The virtual-mesh tests could not see this because interpret-mode
Pallas is plain partitionable HLO (tests/test_train_kernels_sharded.py).

Fix: run the kernel inside `jax.shard_map` over the mesh's `dp` axis. The
batch-leading operands stay sharded (each device's kernel runs at its local
batch), replicated operands (weights, rotary tables) pass through, and
outputs that are batch REDUCTIONS (weight gradients accumulated across the
sequential Pallas grid) get an explicit `psum` over `dp` inside the mapped
body — the same collective the train step's gradient reduction already
implies, just issued where the partial sums live.

Under tp>1 the mesh's other axis is also mapped: every tp peer receives the
same batch shard and duplicates the kernel compute (weights arrive
replicated at the shard_map boundary). That matches what GSPMD's gather
fallback would do compute-wise while keeping dp sharded, and kernels+tp is
not a supported perf configuration (the kernels want whole-d weights).
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import jax
from jax.sharding import Mesh, PartitionSpec as P


def dp_kernel_mesh(mesh: Optional[Mesh], batch: int) -> Optional[Mesh]:
    """The mesh to shard a kernel's batch over, or None to run unwrapped.

    None unless `mesh` has a dp axis of size > 1 that divides `batch`
    (serving calls with batch 1 on a dp>1 mesh fall back to the unwrapped
    call rather than erroring). TCDIFF_KERNEL_SHARD_FORCE=1 also engages
    at dp == 1 — tools/aot_checks.py uses this to AOT-compile the Mosaic
    kernels inside shard_map's manual-SPMD context on the single real
    chip (the multi-chip lowering risk minus the ICI)."""
    import os

    if mesh is None:
        return None
    dp = mesh.shape.get("dp", 1)
    force = os.environ.get("TCDIFF_KERNEL_SHARD_FORCE", "0") == "1"
    if (dp <= 1 and not force) or batch % dp != 0:
        return None
    return mesh


def dp_shard(
    builder,
    mesh: Optional[Mesh],
    batch_in: Sequence[bool],
    batch_out: Union[bool, Sequence[bool]],
):
    """Wrap `builder(*arrays)` in shard_map over `mesh`'s dp axis.

    batch_in: per-positional-arg flags — True marks a leading-batch-dim
    operand (sharded P('dp')), False a replicated one (P()).
    batch_out: same for outputs (single bool for a single-array result).
    False OUTPUTS are treated as batch reductions and psum'd over dp
    inside the mapped body (Pallas weight-grad accumulators sum over the
    local grid only).

    `builder` must derive every shape it needs (pallas grid, BlockSpecs)
    from its argument shapes: inside shard_map it is retraced at the
    per-device local batch. With mesh=None this is the identity wrapper.
    """
    if mesh is None:
        return builder
    single = not isinstance(batch_out, (tuple, list))
    oflags = (batch_out,) if single else tuple(batch_out)

    def inner(*args):
        outs = builder(*args)
        t = (outs,) if single else tuple(outs)
        t = tuple(o if f else jax.lax.psum(o, "dp") for o, f in zip(t, oflags))
        return t[0] if single else t

    out_specs = P("dp") if (single and oflags[0]) else (
        P() if single else tuple(P("dp") if f else P() for f in oflags)
    )
    return jax.shard_map(
        inner,
        mesh=mesh,
        in_specs=tuple(P("dp") if f else P() for f in batch_in),
        out_specs=out_specs,
        check_vma=False,
    )
