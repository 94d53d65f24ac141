from equiadapt_tpu.parallel.mesh import (
    data_parallel_jit,
    init_distributed,
    make_mesh,
    replicate,
    shard_batch,
)

from equiadapt_tpu.parallel.fsdp import (
    fsdp_sharding,
    shard_params_fsdp,
    shard_state_fsdp,
)

__all__ = [
    "data_parallel_jit",
    "init_distributed",
    "make_mesh",
    "replicate",
    "shard_batch",
    "fsdp_sharding",
    "shard_params_fsdp",
    "shard_state_fsdp",
]
