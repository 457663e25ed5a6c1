"""Device-mesh parallelism (new capability — the reference is strictly
single-GPU, SURVEY.md §2.7): DP, TP (Megatron specs + head-sharded
Pallas attention), PP (GPipe shard_map schedule), and SP (all-gather-KV
context parallelism with a rectangular Pallas kernel).

The "communication backend" is sharding annotations + XLA-compiled
collectives over ICI (no NCCL/MPI translation): pick a mesh, annotate
shardings, let GSPMD insert all-reduces.
"""

from .mesh import (
    batch_spec,
    fsdp_param_specs,
    init_multi_host,
    make_mesh,
    make_seq_mesh,
    mesh_from_config,
    param_specs,
    shard_batch,
    shard_params,
    shard_params_fsdp,
)
from .pipeline import (
    make_pipe_mesh,
    pack_pipeline_params,
    pipe_param_specs,
    pipeline_apply,
    stack_block_params,
    unpack_pipeline_params,
    unstack_block_params,
)

__all__ = ["init_multi_host", "make_mesh", "make_seq_mesh",
           "mesh_from_config", "batch_spec", "param_specs",
           "shard_batch", "shard_params", "fsdp_param_specs",
           "shard_params_fsdp", "make_pipe_mesh", "pipeline_apply",
           "pack_pipeline_params", "pipe_param_specs",
           "stack_block_params", "unpack_pipeline_params",
           "unstack_block_params"]
