"""Mesh construction and sharding rules.

Data parallelism is the load-bearing strategy for this 86M-param 224x224
classifier (SURVEY.md §2.7): batches shard over the ``data`` axis and
GSPMD compiles the gradient all-reduce onto ICI.  Tensor-parallel
partition specs for the ViT are provided as mesh capability (``model``
axis): fused QKV and MLP fc1 shard column-wise, attention proj and fc2
row-wise — the Megatron split expressed purely as PartitionSpecs.

Multi-host: call `jax.distributed.initialize()` before `make_mesh()`; the
same specs then span hosts, with per-host data feeding handled by the
data layer (each host feeds its local shard of the batch).
"""

from __future__ import annotations

import re

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
SEQ_AXIS = "seq"


def init_multi_host(**kwargs):
    """Initialize the JAX distributed runtime for multi-host DP.

    Call once per host before `make_mesh()`; afterwards `jax.devices()`
    spans the slice, the same partition specs apply globally, and the
    gradient psum crosses hosts over DCN transparently (SURVEY.md §5:
    the "backend" is sharding specs + compiled collectives — no custom
    transport).  Per-host input sharding is `data.loader.shard_for_host`.
    """
    import jax

    jax.distributed.initialize(**kwargs)
    return jax.process_index(), jax.process_count()


def make_mesh(data: int = -1, model: int = 1,
              devices=None) -> Mesh:
    """Build a (data, model) mesh.  data=-1 -> all remaining devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if data == -1:
        if n % model:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    return Mesh(devices.reshape(data, model), (DATA_AXIS, MODEL_AXIS))


def make_seq_mesh(seq: int, data: int = 1, devices=None) -> Mesh:
    """Build a (data, seq) mesh for sequence/context parallelism.

    The seq axis is minor so the attention KV all-gather
    (ops/attention.py::_sp_sharded) rides mesh-adjacent ICI links.
    Tokens shard over ``seq``; batches still shard over ``data``.
    ``data=-1`` -> all remaining devices (same convention as make_mesh)."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if data == -1:
        if n % seq:
            raise ValueError(f"{n} devices not divisible by seq={seq}")
        data = n // seq
    if data * seq != n:
        raise ValueError(f"mesh {data}x{seq} != {n} devices")
    return Mesh(devices.reshape(data, seq), (DATA_AXIS, SEQ_AXIS))


def mesh_from_config(sharding_cfg, devices=None) -> Mesh:
    """Build the training mesh a ``config.ShardingConfig`` describes.

    ``model_parallel > 1`` -> (data, model) mesh; ``seq_parallel > 1``
    -> (data, seq) mesh; ``pipeline_parallel > 1`` -> (data, pipe) or
    (data, pipe, model) mesh (GPipe stages, optionally with Megatron TP
    inside each stage — parallel/pipeline.py).  seq is exclusive with
    model/pipe (the attention dispatch keys on the axis names,
    ops/attention.py); otherwise all devices land on the data axis.
    ``data_parallel=-1`` means "all remaining devices" in every case.
    """
    model = int(getattr(sharding_cfg, "model_parallel", 1))
    seq = int(getattr(sharding_cfg, "seq_parallel", 1))
    pipe = int(getattr(sharding_cfg, "pipeline_parallel", 1))
    data = int(getattr(sharding_cfg, "data_parallel", -1))
    fsdp = bool(getattr(sharding_cfg, "fsdp", False))
    if seq > 1 and (model > 1 or pipe > 1):
        raise ValueError(
            f"seq_parallel={seq} is mutually exclusive with "
            f"model_parallel={model} / pipeline_parallel={pipe}")
    if fsdp and (model > 1 or seq > 1 or pipe > 1):
        # silently dropping fsdp would leave the user believing the ~1/n
        # optimizer-memory saving is active
        raise ValueError(
            "fsdp composes with pure data parallelism only (got "
            f"model_parallel={model}, seq_parallel={seq}, "
            f"pipeline_parallel={pipe})")
    if pipe > 1:
        from .pipeline import make_pipe_mesh
        return make_pipe_mesh(pipe, data=data, model=model,
                              devices=devices)
    if seq > 1:
        return make_seq_mesh(seq, data, devices)
    return make_mesh(data, model, devices)


def batch_spec() -> P:
    """Batches shard their leading dim over the data axis."""
    return P(DATA_AXIS)


# Tensor-parallel rules for the ViT/head/ResNet parameter tree.
# Matched against the '/'-joined flax param path; first hit wins.
# Column-split the up-projections (qkv, fc1), row-split the
# down-projections (proj, fc2) so each block needs exactly one
# all-reduce on the model axis — the Megatron pattern.
_TP_RULES = [
    (re.compile(r".*attn/qkv/kernel$"), P(None, MODEL_AXIS)),
    (re.compile(r".*attn/qkv/bias$"), P(MODEL_AXIS)),
    (re.compile(r".*attn/proj/kernel$"), P(MODEL_AXIS, None)),
    (re.compile(r".*mlp/fc1/kernel$"), P(None, MODEL_AXIS)),
    (re.compile(r".*mlp/fc1/bias$"), P(MODEL_AXIS)),
    (re.compile(r".*mlp/fc2/kernel$"), P(MODEL_AXIS, None)),
]


def _spec_for_path(path: str, leaf) -> P:
    for pat, spec in _TP_RULES:
        if pat.match(path):
            if len(spec) == leaf.ndim:
                return spec
            if len(spec) < leaf.ndim:
                # stacked/scanned layouts carry leading layer dims (e.g.
                # the pipeline's [L, D, 3D] blocks): anchor the 2-D rule
                # to the TRAILING dims — sharding dim 1 of a rank-3 qkv
                # kernel would split input rows, silently inverting the
                # Megatron column split
                return P(*([None] * (leaf.ndim - len(spec)) + list(spec)))
            return P()   # first name-match wins; rank too low: replicate
    return P()  # replicated


def param_specs(params) -> dict:
    """PartitionSpec pytree for a model parameter tree."""

    def path_str(kp):
        return "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                        for k in kp)

    return jax.tree_util.tree_map_with_path(
        lambda kp, leaf: _spec_for_path(path_str(kp), leaf), params)


def shard_params(params, mesh: Mesh):
    """Device-put a parameter tree with its TP/replication shardings."""
    specs = param_specs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, specs)


def fsdp_param_specs(params, n_data: int, min_size: int = 2 ** 16):
    """Fully-sharded-data-parallel (ZeRO-3-style) PartitionSpecs.

    Each leaf shards its LARGEST data-divisible axis over ``data``; tiny
    leaves (< ``min_size`` elements — biases, LN scales, cls token) stay
    replicated, where sharding would only add latency-bound all-gathers.
    Because optimizer state mirrors the param tree, initializing optax
    on params laid out this way shards the Adam moments identically —
    per-device parameter+optimizer memory drops ~1/n_data for the big
    leaves, and GSPMD inserts the use-site all-gathers / grad
    reduce-scatters (the scaling-book FSDP recipe: layout is policy,
    collectives are compiler-derived).  Capability beyond the reference
    (SURVEY.md §2.7 — the torch script replicates everything)."""

    def spec_for(leaf):
        if leaf.size < min_size:
            return P()
        dims = [(d, i) for i, d in enumerate(leaf.shape)
                if d % n_data == 0]
        if not dims:
            return P()
        _, axis = max(dims)
        return P(*(DATA_AXIS if i == axis else None
                   for i in range(leaf.ndim)))

    return jax.tree.map(spec_for, params)


def shard_params_fsdp(params, mesh: Mesh, min_size: int = 2 ** 16):
    """Device-put a parameter tree in the FSDP layout."""
    n_data = dict(zip(mesh.axis_names, mesh.devices.shape))[DATA_AXIS]
    specs = fsdp_param_specs(params, n_data, min_size)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, specs)


def shard_batch(batch, mesh: Mesh):
    """Device-put a host batch sharded over the data axis.

    Single-process: ``batch`` is the full batch.  Multi-process:
    ``batch`` is this host's LOCAL rows (the per-host pipelines built on
    ``data.loader.shard_for_host`` yield exactly that) and the rows
    assemble into one global array across the processes —
    ``device_put`` would instead demand the GLOBAL batch on every host,
    which per-host loading cannot provide (verified in a 2-process gloo
    run, tests/test_multihost.py)."""
    sharding = NamedSharding(mesh, batch_spec())
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)), batch)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
