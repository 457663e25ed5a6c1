"""Device-mesh parallelism (new capability — the reference is strictly
single-GPU, SURVEY.md §2.7).

The "communication backend" is sharding annotations + XLA-compiled
collectives over ICI (no NCCL/MPI translation): pick a mesh, annotate
shardings, let GSPMD insert all-reduces.
"""

from .mesh import (
    batch_spec,
    make_mesh,
    param_specs,
    shard_batch,
    shard_params,
)

__all__ = ["make_mesh", "batch_spec", "param_specs", "shard_batch",
           "shard_params"]
