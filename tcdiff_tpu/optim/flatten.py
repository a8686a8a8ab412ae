"""Flat-vector views of parameter pytrees for fused elementwise updates.

The train-step profile (BENCH_NOTES r3) showed the per-leaf Adan/EMA
updates compiling to ~100 small multi-output fusions that together burned
~69 ms of a 258 ms step (27%) at ~1% of HBM peak — the reference never
sees this cost because torch's foreach/fused optimizers batch the leaves
(`/root/reference/model/adan.py:85-123` runs under torch's per-tensor loop,
amortized by CUDA graphs on GPU). The TPU-native fix: ravel every leaf into
ONE flat vector, do the elementwise math once (a single bandwidth-bound XLA
fusion), and slice the results back into the per-leaf state layout — the
checkpoint structure is untouched.

Only valid when all leaves share a dtype (the math is elementwise-identical
to the per-leaf form); callers fall back to per-leaf otherwise. Under tp>1
the leaves are Megatron-sharded and the concatenation would force them to
be materialized as one replicated vector mid-step, so callers that know
the mesh gate the flat form off there (ADVICE r3; orchestrator passes
fused=False / flat_ema=False when tp > 1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def homogeneous_dtype(tree) -> bool:
    leaves = jax.tree.leaves(tree)
    return bool(leaves) and all(l.dtype == leaves[0].dtype for l in leaves)


def flat(tree) -> jnp.ndarray:
    """Concatenate all leaves, raveled, in tree-leaf order."""
    return jnp.concatenate([jnp.ravel(l) for l in jax.tree.leaves(tree)])


def unflat_like(vec, tree):
    """Slice `vec` back into a pytree shaped like `tree`."""
    leaves = jax.tree.leaves(tree)
    offs = np.cumsum([0] + [l.size for l in leaves])
    news = [
        jax.lax.slice_in_dim(vec, int(o), int(o + l.size)).reshape(l.shape)
        for o, l in zip(offs[:-1], leaves)
    ]
    return jax.tree.unflatten(jax.tree.structure(tree), news)
