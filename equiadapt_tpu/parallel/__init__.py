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

from equiadapt_tpu.parallel.group_parallel import (
    group_sharded_inference,
    make_mesh_group,
    orbit_spec,
)

from equiadapt_tpu.parallel.pp import (
    make_mesh_stage,
    pipeline_apply,
    stack_layer_params,
    vit_pipeline_apply,
)

from equiadapt_tpu.parallel.tp import (
    check_tp_coverage,
    make_mesh_2d,
    sam_tp_spec,
    shard_params_tp,
    shard_state_tp,
    vit_tp_spec,
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
    "group_sharded_inference",
    "make_mesh_group",
    "orbit_spec",
    "make_mesh_stage",
    "pipeline_apply",
    "stack_layer_params",
    "vit_pipeline_apply",
    "make_mesh_2d",
    "sam_tp_spec",
    "check_tp_coverage",
    "shard_params_tp",
    "shard_state_tp",
    "vit_tp_spec",
]
