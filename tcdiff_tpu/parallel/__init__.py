from tcdiff_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicated,
    shard_batch,
    shard_stacked_batch,
)
from tcdiff_tpu.parallel.sharding_rules import (
    params_pspecs,
    shard_params,
    shard_train_state,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "shard_stacked_batch",
    "params_pspecs",
    "shard_params",
    "shard_train_state",
]
