"""Tensor-parallel parameter sharding over the mesh's `tp` axis.

The reference is DDP-only (SURVEY §2.4); the 512-wide net doesn't NEED
tensor parallelism, but the mesh carries a `tp` axis and these rules make
it real: dense kernels are sharded Megatron-style and XLA's SPMD
partitioner inserts the all-gather/reduce-scatter collectives over ICI.

Rule (applied per parameter):
  * 2-D kernels (in, out): shard the output dim of up/qkv-style projections
    and the input dim of down/out-style projections, when divisible by the
    tp size — so a matmul pair (up then down) becomes the classic
    column-then-row parallel pattern with ONE psum at the end.
  * biases/scales/tables: replicated (they're tiny).

`shard_train_state` applies the same specs to params, EMA, and the Adan
moment buffers (which are param-shaped pytrees).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# name fragments whose kernels shard on the INPUT (row-parallel / down-proj)
_ROW_PARALLEL = ("fc", "out_proj", "linear2", "final_layer", "mlp2", "proj", "decoder_3")


def _spec_for(path: str, shape, tp: int) -> P:
    if len(shape) != 2 or tp <= 1:
        return P()
    leaf = path.split("/")[-2] if "/" in path else path
    row = any(frag in leaf for frag in _ROW_PARALLEL)
    if row and shape[0] % tp == 0:
        return P("tp", None)
    if not row and shape[1] % tp == 0:
        return P(None, "tp")
    if shape[1] % tp == 0:
        return P(None, "tp")
    if shape[0] % tp == 0:
        return P("tp", None)
    return P()


def params_pspecs(params, tp: int):
    """Pytree of PartitionSpecs matching `params`."""

    def one(path, leaf):
        keys = "/".join(
            p.key if hasattr(p, "key") else str(p) for p in path
        )
        return _spec_for(keys, leaf.shape, tp)

    return jax.tree_util.tree_map_with_path(one, params)


def shard_params(params, mesh: Mesh):
    tp = mesh.shape.get("tp", 1)
    specs = params_pspecs(params, tp)
    return jax.tree.map(
        lambda leaf, spec: jax.device_put(leaf, NamedSharding(mesh, spec)), params, specs
    )


def shard_train_state(state, mesh: Mesh):
    """Shard params/EMA/optimizer moments identically; step stays replicated."""
    tp = mesh.shape.get("tp", 1)
    pspecs = params_pspecs(state.params, tp)

    def put(tree):
        return jax.tree.map(
            lambda leaf, spec: jax.device_put(leaf, NamedSharding(mesh, spec)),
            tree, pspecs,
        )

    new_params = put(state.params)
    new_ema = put(state.ema_params)

    # Adan state: (count, m, v, n, prev_grad) — all but count are param-shaped
    param_struct = jax.tree.structure(state.params)

    def place_opt_leaf_tree(subtree):
        if jax.tree.structure(subtree) == param_struct:
            return put(subtree)
        return jax.device_put(subtree, NamedSharding(mesh, P()))

    opt_state = state.opt_state
    if isinstance(opt_state, tuple) and not hasattr(opt_state, "_fields"):
        new_opt = tuple(place_opt_leaf_tree(s) for s in opt_state)
    elif hasattr(opt_state, "_fields"):  # NamedTuple
        new_opt = type(opt_state)(*(place_opt_leaf_tree(getattr(opt_state, f)) for f in opt_state._fields))
    else:
        new_opt = place_opt_leaf_tree(opt_state)

    return state.replace(
        step=jax.device_put(state.step, NamedSharding(mesh, P())),
        params=new_params,
        ema_params=new_ema,
        opt_state=new_opt,
    )
