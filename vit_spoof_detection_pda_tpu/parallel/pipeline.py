"""GPipe-style pipeline parallelism for the ViT encoder.

Scaling capability BEYOND the reference (SURVEY.md §2.7 lists PP as a
non-goal for this 86M-param model — the reference is a single-GPU torch
script): provided as mesh capability alongside DP/TP so the framework's
parallel layer covers dp x tp x pp meshes.

Design — the TPU-native SPMD pipeline (the scaling-book recipe), not a
multi-controller scheduler:

- The 12 encoder blocks' parameter pytrees are STACKED on a leading
  layer dim (`stack_block_params`) and sharded over the ``pipe`` mesh
  axis (a `with_sharding_constraint` pins the stacked intermediate to
  P("pipe"), so under pjit each device materializes its depth/S layer
  slice of the stack; place params with `pipe_param_specs` to avoid
  the replicated unstacked copy entirely).
- One `shard_map` program runs on every stage: `lax.scan` over
  M + S - 1 pipeline ticks; per tick each stage scans its local layers
  and hands its activation to the next stage with a single
  `lax.ppermute` ring hop (ICI neighbor traffic, no host scheduler).
  Stage 0 injects a fresh microbatch per tick; the last stage's outputs
  are collected in-loop and broadcast with one masked `psum`.
- Patch embedding, final LayerNorm, pooling, and the head run OUTSIDE
  the pipelined region as ordinary GSPMD ops (data-sharded over the
  ``data`` axis, replicated over ``pipe``) — they are <3% of FLOPs and
  this keeps the pipelined region a pure layer loop.
- DP x TP x PP: ``make_pipe_mesh(model=...)`` adds a tensor-parallel
  axis INSIDE each stage.  The shard_map manualizes only data+pipe
  (``axis_names``); the model axis stays AUTO, so GSPMD partitions each
  block's GEMMs Megatron-style from the stacked leaves' trailing-dim
  shardings (mesh._TP_RULES via ``stacked_pipe_specs``) and handles the
  gradient replication counting, while attention head-shards over the
  auto axis with a nested shard_map (ops/attention.py::
  _tp_head_sharded_nested) so the Pallas kernel survives the 3-axis
  mesh.  A partially-manual shard_map traces only under jit.
- The whole schedule is `jax.grad`-differentiable (scan + ppermute have
  exact transposes), giving GPipe semantics: full forward, then full
  backward, bubble fraction (S-1)/(M+S-1) in each direction.
- 1F1B / interleaved (Megatron) schedules are deliberate NON-goals in
  this formulation: their bubble win comes from interleaving forward
  and backward microbatches in time, and `jax.grad` of a scan runs the
  transposed (backward) scan strictly after the forward — round-robin
  virtual stages alone (forward-only) makes the bubble WORSE, not
  better ((SV-1)/(M+SV-1) idle chunk-slots vs GPipe's (S-1)/(M+S-1)).
  Expressing 1F1B would mean hand-scheduling the backward as explicit
  per-chunk VJPs inside the tick loop, forfeiting the
  one-jax.grad-of-one-program property this design is built on; raise
  ``microbatches`` instead (bubble ~ 1/M) and use ``remat`` to keep
  the activation footprint flat.

All block math reuses the flax modules functionally
(`EncoderBlock.apply` on a per-layer param slice), so there is exactly
one definition of the model's numerics; `tests/test_pipeline.py` pins
forward and gradient equivalence against the plain module on DP x PP
virtual meshes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P
import numpy as np

from .mesh import DATA_AXIS

PIPE_AXIS = "pipe"


def make_pipe_mesh(pipe: int, data: int = 1, model: int = 1,
                   devices=None) -> Mesh:
    """Build a (data, pipe[, model]) mesh.  ``model > 1`` adds a
    tensor-parallel axis INSIDE each pipeline stage (DPxTPxPP — see
    `_pipeline_encoder`); it is laid out minor-most so each stage's
    per-layer TP all-reduces ride mesh-adjacent devices, with the
    pipeline ring's single ppermute hop per tick taking the larger
    stride.  ``data=-1`` -> all remaining devices (same convention as
    make_mesh / make_seq_mesh)."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if data == -1:
        if n % (pipe * model):
            raise ValueError(f"{n} devices not divisible by "
                             f"pipe*model={pipe * model}")
        data = n // (pipe * model)
    if data * pipe * model != n:
        raise ValueError(f"mesh {data}x{pipe}x{model} != {n} devices")
    if model == 1:
        return Mesh(devices.reshape(data, pipe), (DATA_AXIS, PIPE_AXIS))
    from .mesh import MODEL_AXIS
    return Mesh(devices.reshape(data, pipe, model),
                (DATA_AXIS, PIPE_AXIS, MODEL_AXIS))


def _is_block_key(k: str) -> bool:
    return k.startswith("block") and k[5:].isdigit()


def stack_block_params(vit_params: dict, depth: int):
    """Split a ViT param dict into (stacked_blocks, rest).

    stacked_blocks: the ``block{i}`` pytrees stacked on a new leading
    layer dim (sharded over ``pipe``); rest: everything else (patch
    embed, cls/pos, final norm), untouched."""
    n_blocks = sum(1 for k in vit_params if _is_block_key(k))
    if n_blocks != depth:
        # pipe_param_specs validates this; the packer must too — taking
        # range(depth) of a deeper tree would silently run a TRUNCATED
        # model
        raise ValueError(f"param tree has {n_blocks} encoder blocks but "
                         f"depth={depth}")
    blocks = [vit_params[f"block{i}"] for i in range(depth)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    rest = {k: v for k, v in vit_params.items() if not _is_block_key(k)}
    return stacked, rest


def unstack_block_params(stacked) -> list:
    depth = jax.tree.leaves(stacked)[0].shape[0]
    return [jax.tree.map(lambda x: x[i], stacked) for i in range(depth)]


def pack_pipeline_params(variables, depth: int):
    """Repack module variables into the pipeline layout: the vit tree's
    ``block{i}`` subtrees become ONE stacked subtree under ``"blocks"``
    (leading layer dim — shard it over ``pipe`` with
    :func:`pipe_param_specs`); everything else is untouched.

    ``pipeline_apply`` accepts this layout directly, so a training setup
    can `jax.device_put(pack_pipeline_params(v, depth),
    pipe_param_specs(v, depth, mesh))` ONCE and never materialize the
    replicated unstacked copy on any device."""
    params = dict(variables["params"])
    stacked, rest = stack_block_params(params["vit"], depth)
    params["vit"] = {**rest, "blocks": stacked}
    return {**variables, "params": params}


def unpack_pipeline_params(variables):
    """Inverse of :func:`pack_pipeline_params`: the ``"blocks"`` stacked
    subtree unstacks back into ``block{i}`` subtrees (the plain module
    layout — for ``module.apply``, checkpoint export, and the torch
    interop converters).  Traceable, so it can run inside a jitted eval
    step over packed parameters; a no-op passthrough if the tree is
    already in the plain layout."""
    params = dict(variables["params"])
    vit = dict(params["vit"])
    if "blocks" not in vit:
        return variables
    stacked = vit.pop("blocks")
    for i, bp in enumerate(unstack_block_params(stacked)):
        vit[f"block{i}"] = bp
    params["vit"] = vit
    return {**variables, "params": params}


def _pipeline_encoder(x, stacked, block_fn, mesh: Mesh, microbatches: int,
                      remat: bool = False):
    """Run the stacked encoder over the (data, pipe) mesh.

    x: [B, T, D] activations (batch shardable over ``data``).
    stacked: block params with leading layer dim (sharded over ``pipe``).
    block_fn(params_i, x) -> x: one encoder block, pure function.
    remat: rematerialize each block in backward — GPipe stores every
    microbatch's per-layer residuals until its backward runs (activation
    memory scales with M x depth/S); remat keeps only the block
    BOUNDARY activations and recomputes the interior, the standard
    memory lever for deep pipelines.
    """
    if remat:
        block_fn = jax.checkpoint(block_fn)
    n_stages = mesh.shape[PIPE_AXIS]
    n_data = mesh.shape.get(DATA_AXIS, 1)
    b, t, d = x.shape
    m = microbatches
    if b % m:
        raise ValueError(f"batch {b} not divisible by microbatches={m}")
    if (b // m) % n_data:
        raise ValueError(f"microbatch size {b // m} not divisible by "
                         f"data={n_data}")
    depth = jax.tree.leaves(stacked)[0].shape[0]
    if depth % n_stages:
        raise ValueError(f"depth {depth} not divisible by pipe={n_stages}")
    xmb = x.reshape(m, b // m, t, d)

    def run_local(x, blocks):
        def body(x, bp):
            return block_fn(bp, x), None
        x, _ = jax.lax.scan(body, x, blocks)
        return x

    def shard_fn(xmb, blocks):
        stage = jax.lax.axis_index(PIPE_AXIS)
        state = jnp.zeros_like(xmb[0])
        outs = jnp.zeros_like(xmb)

        def tick(carry, i):
            state, outs = carry
            # stage 0 ingests microbatch i (bubble ticks re-read the
            # last one; their outputs never land in a valid slot)
            inject = jax.lax.dynamic_index_in_dim(
                xmb, jnp.clip(i, 0, m - 1), 0, keepdims=False)
            y = run_local(jnp.where(stage == 0, inject, state), blocks)
            # the last stage emits microbatch i-(S-1) at tick i; writes
            # for i < S-1 clip to slot 0 and are overwritten by the
            # first valid emission (slot index is nondecreasing)
            outs = jax.lax.dynamic_update_index_in_dim(
                outs, y, jnp.clip(i - (n_stages - 1), 0, m - 1), 0)
            # ring hop to the next stage (the wrap edge only carries
            # bubble values: stage S-1's tick-i output is consumed
            # nowhere — stage 0 always takes `inject`)
            state = jax.lax.ppermute(
                y, PIPE_AXIS,
                [(s, (s + 1) % n_stages) for s in range(n_stages)])
            return (state, outs), None

        (_, outs), _ = jax.lax.scan(
            tick, (state, outs), jnp.arange(m + n_stages - 1))
        # broadcast the last stage's collected outputs to every stage
        # keep the [m, mb] layout: the data axis shards the microbatch
        # dim (dim 1) — flattening must happen OUTSIDE the shard_map or
        # reassembly across data shards would interleave rows
        return jax.lax.psum(
            jnp.where(stage == n_stages - 1, outs, jnp.zeros_like(outs)),
            PIPE_AXIS)

    # pin the stacked tree's layout so GSPMD materializes each device's
    # layer slice, not a replicated full stack, before the shard_map
    # in_spec slices it.  With a model axis (DPxTPxPP) each leaf ALSO
    # carries its Megatron spec on the trailing dims (mesh._TP_RULES via
    # stacked_pipe_specs) — the pipe dim is manualized by the shard_map
    # below while the model-dim sharding stays AUTO and GSPMD partitions
    # the block GEMMs Megatron-style inside the manual region.
    from .mesh import MODEL_AXIS
    from jax.sharding import NamedSharding
    n_model = mesh.shape.get(MODEL_AXIS, 1)
    specs = stacked_pipe_specs(stacked, tp=n_model > 1)
    stacked = jax.tree.map(
        lambda a, s: jax.lax.with_sharding_constraint(
            a, NamedSharding(mesh, s)), stacked, specs)

    # blocks are applied INSIDE this shard_map: attention must dispatch
    # per-device (a nested shard_map against the training mesh in an
    # active attention_sharding context fails to trace).  Under DPxTPxPP
    # only data+pipe are manualized; dispatch_attention_qkv sees the
    # auto model axis and head-shards with a nested shard_map.  NOTE:
    # a partially-manual shard_map traces only under jit (eager raises
    # a spurious out_specs error) — pipeline_apply callers jit the step.
    manual_axes = (frozenset({DATA_AXIS, PIPE_AXIS}) if n_model > 1
                   else frozenset())
    from ..ops.attention import manual_attention
    with manual_attention():
        out = shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P(None, DATA_AXIS), P(PIPE_AXIS)),
            out_specs=P(None, DATA_AXIS),
            check_vma=False,
            **({"axis_names": manual_axes} if manual_axes else {}),
        )(xmb, stacked)
    return out.reshape(b, t, d)


def stacked_pipe_specs(stacked, *, tp: bool):
    """PartitionSpecs for a stacked block tree: leading layer dim over
    ``pipe``; with ``tp`` each leaf adds its Megatron model-axis spec on
    the trailing dims (mesh._TP_RULES — qkv/fc1 column-split, proj/fc2
    row-split, norms/odd biases replicated)."""
    if not tp:
        return jax.tree.map(lambda _: P(PIPE_AXIS), stacked)
    from .mesh import param_specs
    tails = param_specs(stacked)      # trailing-dim anchored, full rank

    def combine(leaf, tail):
        names = list(tail) + [None] * (leaf.ndim - len(tail))
        names[0] = PIPE_AXIS
        return P(*names)

    return jax.tree.map(combine, stacked, tails)


def pipeline_apply(module, variables, images, mesh: Mesh, *,
                   microbatches: int, train: bool = False, rngs=None,
                   remat: bool = False):
    """Forward the full ViTAntiSpoof with the encoder pipelined.

    Equivalent to ``module.apply(variables, images, train=train)`` (same
    flax submodules, applied functionally); the 12 encoder blocks run as
    a GPipe schedule over the mesh's ``pipe`` axis.  Differentiable —
    wrap in jax.value_and_grad for a PP training step.

    ``variables`` may be the plain module tree (block{i} subtrees —
    stacked here, which materializes a replicated copy before GSPMD
    re-lays it out) or the :func:`pack_pipeline_params` layout
    (``"blocks"`` stacked subtree, already sharded over ``pipe`` — no
    replicated copy ever exists)."""
    from ..models.vit import patchify

    params = variables["params"]
    vit_params = params["vit"]
    if "blocks" in vit_params:                 # pack_pipeline_params layout
        stacked = vit_params["blocks"]
        n_stacked = jax.tree.leaves(stacked)[0].shape[0]
        if n_stacked != module.depth:
            # mirror stack_block_params' guard: a mismatched stack would
            # silently run the wrong number of blocks
            raise ValueError(f"packed tree has {n_stacked} encoder "
                             f"blocks but module depth={module.depth}")
        rest = {k: v for k, v in vit_params.items() if k != "blocks"}
    else:
        stacked, rest = stack_block_params(vit_params, module.depth)
    dtype = module.dtype

    # --- embed (outside the pipe: data-sharded, replicated over pipe)
    b = images.shape[0]
    x = patchify(images, patch_size=module.patch_size, dtype=dtype)
    x = nn.Dense(module.embed_dim, dtype=dtype, name="patch_embed").apply(
        {"params": rest["patch_embed"]}, x)
    cls = jnp.broadcast_to(rest["cls_token"].astype(dtype),
                           (b, 1, module.embed_dim))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + rest["pos_embed"].astype(dtype)

    # --- pipelined encoder
    def block_fn(bp, xx):
        from ..models.vit import EncoderBlock
        return EncoderBlock(module.num_heads, module.mlp_ratio,
                            module.norm_eps, dtype=dtype,
                            gelu=module.gelu).apply({"params": bp}, xx)

    x = _pipeline_encoder(x, stacked, block_fn, mesh, microbatches,
                          remat=remat)

    # --- final norm + pool + head (outside the pipe)
    x = nn.LayerNorm(epsilon=module.norm_eps, dtype=dtype, name="norm").apply(
        {"params": rest["norm"]}, x)
    feats = x[:, 0]

    from ..models.vit import AntiSpoofHead
    return AntiSpoofHead(module.hidden, module.num_classes, module.dropout,
                         dtype=dtype).apply(
        {"params": params["head"]}, feats.astype(jnp.float32),
        train=train, rngs=rngs)


def pipe_param_specs(variables, depth: int, *, tp: bool = False):
    """PartitionSpecs for the :func:`pack_pipeline_params` layout: the
    ``"blocks"`` stacked subtree shards its leading layer dim over
    ``pipe``; every other leaf (embed/cls/pos/norm/head) is replicated.
    Returns a spec tree with the PACKED variables' structure, so

        packed = pack_pipeline_params(variables, depth)
        specs  = pipe_param_specs(variables, depth)
        packed = jax.tree.map(lambda x, s: jax.device_put(
            x, jax.sharding.NamedSharding(mesh, s)), packed, specs)
        pipeline_apply(module, packed, ...)

    places each device's layer slice directly (derived from tree
    STRUCTURE only — the blocks spec mirrors block0's pytree, so no
    stacked copy is materialized here)."""
    params = variables["params"]
    vit_params = params["vit"]
    n_blocks = sum(1 for k in vit_params if _is_block_key(k))
    if n_blocks != depth:
        raise ValueError(f"param tree has {n_blocks} encoder blocks, "
                         f"expected depth={depth}")
    vit_spec = {k: jax.tree.map(lambda _: P(), v)
                for k, v in vit_params.items() if not _is_block_key(k)}
    if tp:
        # ``tp=True``: the DPxTPxPP layout — each stacked leaf adds its
        # Megatron model-dim spec (same rules as stacked_pipe_specs;
        # computed on block0's UNstacked leaves, so the trailing anchor
        # shifts by the leading layer dim added here)
        from .mesh import param_specs
        tails = param_specs(vit_params["block0"])

        def with_pipe(leaf, tail):
            names = [PIPE_AXIS] + list(tail) + \
                [None] * (leaf.ndim - len(tail))
            return P(*names)

        vit_spec["blocks"] = jax.tree.map(with_pipe, vit_params["block0"],
                                          tails)
    else:
        vit_spec["blocks"] = jax.tree.map(lambda _: P(PIPE_AXIS),
                                          vit_params["block0"])
    params_spec = {k: (vit_spec if k == "vit"
                       else jax.tree.map(lambda _: P(), v))
                   for k, v in params.items()}
    return {**{k: jax.tree.map(lambda _: P(), v)
               for k, v in variables.items() if k != "params"},
            "params": params_spec}
