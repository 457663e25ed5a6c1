"""bf16 serving fast path: the flagship ViT forward as a pure function
over ``ViTAntiSpoof`` variables, with the whole pre-LN attention
sub-layer running as ONE Pallas program per layer
(``ops.attention.fused_attention_block``: LN1 + QKV GEMM + attention +
proj + residual, weights VMEM-resident).

Composition (identical math to models/vit.py, serving dtypes): the
residual stream is padded ONCE after the stem to the 8-sublane
granularity (197 -> 200 tokens) and stays padded across all layers —
no per-layer pad/slice copies, and the attention kernels compute
[200, 200] instead of a 128-lane round to [256, 256] (~22% fewer
attention FLOPs; BENCH_NOTES.md round 3):
  x <- pad(embed_patches(batch))        # once
  per layer:
    x <- fused_attention_block_padded(x)  # Pallas, no qkv/attn HBM trip
    x <- fused_mlp_block(x)               # Pallas, flat M-tiled [B*Tp, D]
  scores <- head(LN(x[:, :1]))          # CLS row only

``fuse_mlp=True`` (the default) runs the MLP half-layer as
``ops.attention.fused_mlp_block``: LN2+fc1+gelu+fc2+residual tiled over
the FLATTENED row space, so neither the [rows, hidden] activation nor
the 197->256 sequence padding ever exist (32.3 vs 33.2 ms/batch and a
smaller score drift than the XLA path, exp_r2_fastserve.py).
``fuse_mlp=False`` keeps the MLP in XLA (bf16 GEMMs at ~175 TFLOP/s,
within 3% — the fallback if a future shape change upsets VMEM).

Use with :func:`models.vit.fold_normalization`-transformed variables and
raw uint8 input for the fastest path (bench.py).  A parity test pins the
output to the module forward within bf16 tolerance
(tests/test_fastserve.py).

Serving-only: no gradients (training uses the flax module with the
fused_attention_qkv fwd/bwd kernel pair).

Multi-chip: GSPMD cannot partition a ``pallas_call``, so
:func:`serving_forward_sharded` wraps the whole forward in
``jax.shard_map`` over a mesh's data axis (weights replicated, batch
sharded) — each chip runs the identical single-chip program and no
collectives are needed for pure data-parallel inference.
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp

from ..ops.attention import (_round_up, fused_attention_block_padded,
                             fused_mlp_block)

log = logging.getLogger(__name__)


# THE patch-layout definition lives next to the module (models/vit.py);
# every serving path and the pipelined encoder share it.
from .vit import patchify as _patchify  # noqa: E402


def embed_patches(vit, batch, *, dtype, patch_size: int):
    """Shared ViT stem: patchify-as-GEMM + cls token + pos embed.

    Used by both the serving forward here and the fused-block training
    forward (models/fasttrain.py) so the two functional paths cannot
    drift."""
    b = batch.shape[0]
    x = _patchify(batch, patch_size=patch_size, dtype=dtype)
    pe = vit["patch_embed"]
    x = (jnp.dot(x, pe["kernel"].astype(dtype),
                 preferred_element_type=jnp.float32)
         + pe["bias"].astype(jnp.float32)).astype(dtype)
    cls = jnp.broadcast_to(vit["cls_token"].astype(dtype),
                           (b, 1, x.shape[-1]))
    x = jnp.concatenate([cls, x], axis=1)
    return x + vit["pos_embed"].astype(dtype)


def _layernorm(x, p, eps):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean((x32 - mu) ** 2, axis=-1, keepdims=True)
    xn = (x32 - mu) * jax.lax.rsqrt(var + eps)
    return (xn * p["scale"].astype(jnp.float32)
            + p["bias"].astype(jnp.float32)).astype(x.dtype)


def serving_forward(params, batch, *, num_heads: int = 12,
                    patch_size: int = 16, depth: int = 12,
                    norm_eps: float = 1e-6, dtype=jnp.bfloat16,
                    fuse_mlp: bool = True, interpret: bool = False):
    """uint8/raw-float [B, H, W, 3] -> P(live) scores [B].

    ``params``: ViTAntiSpoof param tree (apply
    :func:`..models.vit.fold_normalization` first so raw uint8 input is
    correct).  Matches ``ViTAntiSpoof(dtype=bf16, gelu="tanh")`` within
    bf16 resolution.
    """
    x, t = _encode_stream(params["vit"], batch, num_heads=num_heads,
                          patch_size=patch_size, depth=depth,
                          norm_eps=norm_eps, dtype=dtype,
                          fuse_mlp=fuse_mlp, interpret=interpret)
    return _cls_head_scores(params, x, norm_eps=norm_eps, dtype=dtype)


def _encode_stream(vit, batch, *, num_heads: int, patch_size: int,
                   depth: int, norm_eps: float, dtype, fuse_mlp: bool,
                   interpret: bool):
    """Shared fused-kernel ViT trunk: image batch -> [B, Tp, D]
    residual stream after the last block (8-sublane padded, pre
    final-LN) + the valid token count.  Used by every fastserve head
    (anti-spoof, linear classifier)."""
    x = embed_patches(vit, batch, dtype=dtype, patch_size=patch_size)

    # inter-layer stream stays padded to the 8-sublane granularity
    # (197 -> 200): the attention kernels compute [200, 200] instead of
    # [256, 256] (-22% attention FLOPs/VPU) and no pad/slice copies run
    # between layers (32.4 -> 27.7 ms/batch, BENCH_NOTES.md round 3).
    # Pad rows stay garbage-free (key columns masked at valid_len) and
    # are sliced off after the last layer; the flat-tiled MLP's row
    # space (B*200 = 25600 at B=128) matches its former padding exactly.
    t = x.shape[1]
    tp = _round_up(t, 8)
    x = jnp.pad(x, ((0, 0), (0, tp - t), (0, 0)))

    for i in range(depth):
        blk = vit[f"block{i}"]
        x = fused_attention_block_padded(
            x, blk["norm1"]["scale"], blk["norm1"]["bias"],
            blk["attn"]["qkv"]["kernel"].astype(dtype),
            blk["attn"]["qkv"]["bias"],
            blk["attn"]["proj"]["kernel"].astype(dtype),
            blk["attn"]["proj"]["bias"],
            num_heads, valid_len=t, eps=norm_eps, interpret=interpret)
        mlp = blk["mlp"]
        if fuse_mlp:
            x = fused_mlp_block(
                x, blk["norm2"]["scale"], blk["norm2"]["bias"],
                mlp["fc1"]["kernel"].astype(dtype), mlp["fc1"]["bias"],
                mlp["fc2"]["kernel"].astype(dtype), mlp["fc2"]["bias"],
                eps=norm_eps, interpret=interpret)
        else:
            y = _layernorm(x, blk["norm2"], norm_eps)
            hdn = (jnp.dot(y, mlp["fc1"]["kernel"].astype(dtype),
                           preferred_element_type=jnp.float32)
                   + mlp["fc1"]["bias"].astype(jnp.float32)).astype(dtype)
            hdn = jax.nn.gelu(hdn, approximate=True)
            out = (jnp.dot(hdn, mlp["fc2"]["kernel"].astype(dtype),
                           preferred_element_type=jnp.float32)
                   + mlp["fc2"]["bias"].astype(jnp.float32)).astype(dtype)
            x = x + out

    return x, t


def serving_forward_linear(params, batch, *, num_heads: int = 12,
                           patch_size: int = 16, depth: int = 12,
                           norm_eps: float = 1e-12, dtype=jnp.bfloat16,
                           fuse_mlp: bool = True,
                           interpret: bool = False):
    """uint8/raw-float [B, H, W, 3] -> softmax probabilities [B, C] for
    the linear-head ViT (models/vit.py::ViTLinearHead — the frozen
    Base_ViT_Pretrained ablation, reference
    evaluate_all_models.py:307-318).

    Same fused-kernel trunk as :func:`serving_forward`; the head is the
    module's: final LN (HF eps=1e-12) on the CLS row, then the f32
    classifier Dense.  Apply :func:`..models.vit.fold_normalization`
    first so raw uint8 input is correct.
    """
    x, _ = _encode_stream(params["vit"], batch, num_heads=num_heads,
                          patch_size=patch_size, depth=depth,
                          norm_eps=norm_eps, dtype=dtype,
                          fuse_mlp=fuse_mlp, interpret=interpret)
    feats = _layernorm(x[:, :1], params["vit"]["norm"], norm_eps)[:, 0]
    cls = params["classifier"]
    logits = (jnp.dot(feats.astype(jnp.float32),
                      cls["kernel"].astype(jnp.float32),
                      preferred_element_type=jnp.float32)
              + cls["bias"].astype(jnp.float32))
    return jax.nn.softmax(logits, axis=-1)


def _cls_head_scores(params, x, *, norm_eps: float, dtype):
    """Final LN on the CLS row + anti-spoof head -> P(live) scores [B]."""
    vit = params["vit"]
    # only the CLS row feeds the head; LN is row-local
    x = _layernorm(x[:, :1], vit["norm"], norm_eps)[:, 0]

    head = params["head"]
    f = _layernorm(x.astype(jnp.float32), head["norm"], 1e-5)
    f = jnp.dot(f, head["fc1"]["kernel"].astype(dtype),
                preferred_element_type=jnp.float32) \
        + head["fc1"]["bias"]
    f = jax.nn.gelu(f, approximate=False)   # head keeps erf (models/vit.py)
    logits = (jnp.dot(f.astype(dtype), head["fc2"]["kernel"].astype(dtype),
                      preferred_element_type=jnp.float32)
              + head["fc2"]["bias"])
    return jax.nn.sigmoid(logits[:, 1] - logits[:, 0])


def prepare_lowlat(params, *, depth: int = 12, dtype=jnp.bfloat16,
                   fold_ends: bool = True, batch_grid: bool = False,
                   per_item: bool = True, int8_weights: bool = False):
    """Pack a (normalization-folded) param tree for the single-kernel
    latency path.  Run ONCE outside the serving jit; the result feeds
    :func:`serving_forward_lowlat`.

    With ``fold_ends`` (default) the patch-embed stem and the anti-spoof
    head pack into one small VMEM-resident block so the WHOLE
    image->logits forward runs as a single pallas_call (ops/lowlat.py
    fold-ends mode); shapes that cannot ride the layout (patch_dim !=
    embed_dim) silently fall back to the encoder-only kernel with XLA
    ends.  ``batch_grid`` additionally packs the phase-walking layout
    for :func:`serving_forward_lowlat_batch` (the B~2-16 regime).
    ``per_item=False`` skips the per-item (and fold-ends) packs when
    only the batch-grid path will run — each pack is ~depth*12D² of
    device memory (~54 MB bf16 at ViT-B/16), so a batch-grid-only
    server should not hold both.

    ``int8_weights``: stream the encoder superblocks weight-only int8
    (half the B=1 HBM weight traffic — the regime's measured floor;
    ops/lowlat.py ``pack_encoder_weights``); the stem/head block and
    all activations stay ``dtype``.  Opt-in quantized numerics."""
    from ..ops.lowlat import (pack_encoder_weights,
                              pack_encoder_weights_batchgrid,
                              pack_end_weights)

    if not (per_item or batch_grid):
        raise ValueError("prepare_lowlat with per_item=False needs "
                         "batch_grid=True — nothing would be packed")
    if int8_weights and not per_item:
        raise ValueError("int8_weights quantizes the per-item stream; "
                         "the batch-grid pack stays full-precision "
                         "(weights already amortize per chunk there)")
    out = {"params": params}
    if per_item:
        w, s = pack_encoder_weights(
            params["vit"], depth=depth, dtype=dtype,
            weight_dtype=jnp.int8 if int8_weights else None)
        out.update(packed_w=w, packed_s=s)
    if batch_grid:
        bg_w, bg_s = pack_encoder_weights_batchgrid(
            params["vit"], depth=depth, dtype=dtype)
        out.update(bg_w=bg_w, bg_s=bg_s)
    if fold_ends and per_item:
        try:
            w_end, s_end, aux = pack_end_weights(params, dtype=dtype)
        except ValueError as e:
            log.warning("lowlat fold-ends unavailable (%s) — serving "
                        "with the encoder-only kernel + XLA ends", e)
            return out
        out.update(end_w=w_end, end_s=s_end, aux=aux)
    return out


def serving_forward_lowlat(prepared, batch, *, num_heads: int = 12,
                           patch_size: int = 16, norm_eps: float = 1e-6,
                           dtype=jnp.bfloat16, interpret: bool = False):
    """Small-batch latency path: the whole forward as ONE Pallas program
    (ops/lowlat.py — phase-gridded, weights double-buffered against the
    residual stream held in VMEM).  Same math/dtypes as
    :func:`serving_forward`; per-item weight re-streaming makes it the
    B<=8 choice — batch serving stays on :func:`serving_forward`.

    ``prepared``: output of :func:`prepare_lowlat`.  When it carries the
    fold-ends packs, patch extraction is the only op outside the kernel;
    otherwise the embed/head run in XLA around the encoder kernel.
    """
    from ..ops.lowlat import forward_lowlat_e2e

    params = prepared["params"]
    if "aux" in prepared:
        h, w = batch.shape[1], batch.shape[2]
        gh, gw = h // patch_size, w // patch_size
        t = params["vit"]["pos_embed"].shape[-2]
        if gh * gw + 1 != t:
            raise ValueError(
                f"batch {h}x{w} yields {gh * gw + 1} tokens but the "
                f"prepared fold-ends packs hold a {t}-token pos embed "
                "(prepare_lowlat and the batch must share the image size)")
        tp = prepared["aux"].shape[1]
        x = _patchify(batch, patch_size=patch_size, dtype=dtype)
        # row 0 = zero CLS slot (the kernel's aux carries cls + pos0);
        # tail rows = zero padding to the 8-sublane stream height
        x = jnp.pad(x, ((0, 0), (1, tp - 1 - gh * gw), (0, 0)))
        logits = forward_lowlat_e2e(
            x, prepared["packed_w"], prepared["packed_s"],
            prepared["end_w"], prepared["end_s"], prepared["aux"],
            num_heads=num_heads, eps=norm_eps,
            valid_len=gh * gw + 1, interpret=interpret)
        return jax.nn.sigmoid(logits[:, 1] - logits[:, 0])

    x = _lowlat_encode(prepared, batch, num_heads=num_heads,
                       patch_size=patch_size, norm_eps=norm_eps,
                       dtype=dtype, interpret=interpret)
    return _cls_head_scores(params, x, norm_eps=norm_eps, dtype=dtype)


def _lowlat_encode(prepared, batch, *, num_heads: int, patch_size: int,
                   norm_eps: float, dtype, interpret: bool):
    """XLA stem + the whole-encoder single-kernel pass (ops/lowlat.py)
    -> [B, Tp, D] stream.  Shared by the anti-spoof and linear-head
    lowlat tails."""
    from ..ops.lowlat import encoder_forward_lowlat

    x = embed_patches(prepared["params"]["vit"], batch, dtype=dtype,
                      patch_size=patch_size)
    t = x.shape[1]
    tp = _round_up(t, 8)
    x = jnp.pad(x, ((0, 0), (0, tp - t), (0, 0)))
    return encoder_forward_lowlat(
        x, prepared["packed_w"], prepared["packed_s"],
        num_heads=num_heads, valid_len=t, eps=norm_eps,
        interpret=interpret)


def serving_forward_lowlat_batch(prepared, batch, *, num_heads: int = 12,
                                 patch_size: int = 16,
                                 norm_eps: float = 1e-6,
                                 dtype=jnp.bfloat16,
                                 chunk_size: int = 2,
                                 interpret: bool = False):
    """Batch-grid latency path (B~2-16): the whole encoder is still ONE
    Pallas program per <=4-item chunk, but the grid walks phases only,
    so each weight superblock streams from HBM once per chunk instead
    of once per image (ops/lowlat.py::encoder_forward_lowlat_batchgrid).
    ``prepared``: :func:`prepare_lowlat` with ``batch_grid=True``.
    ``chunk_size`` (<=4) trades VMEM residency against weight
    re-streams; measured on v5e (BENCH_NOTES round 12,
    exp_r12_smallb): chunk 2 is the sweet spot — 0.248 ms/img at B=4
    vs 0.494 for chunk 4 (four resident streams evict the
    double-buffering margin) and 0.276 for per-item chunks.
    Same anti-spoof scores as :func:`serving_forward_lowlat` within
    f32-reassociation tolerance."""
    from ..ops.lowlat import encoder_forward_lowlat_batchgrid

    params = prepared["params"]
    x = embed_patches(params["vit"], batch, dtype=dtype,
                      patch_size=patch_size)
    b, t = x.shape[0], x.shape[1]
    tp = _round_up(t, 8)
    x = jnp.pad(x, ((0, 0), (0, tp - t), (0, 0)))
    chunk = min(b, chunk_size)
    bp = -(-b // chunk) * chunk       # pad so every chunk reuses ONE
    x = jnp.pad(x, ((0, bp - b), (0, 0), (0, 0)))   # compiled kernel
    outs = [encoder_forward_lowlat_batchgrid(
        x[c:c + chunk], prepared["bg_w"], prepared["bg_s"],
        num_heads=num_heads, valid_len=t, eps=norm_eps,
        interpret=interpret) for c in range(0, bp, chunk)]
    x = jnp.concatenate(outs, axis=0)[:b]
    return _cls_head_scores(params, x, norm_eps=norm_eps, dtype=dtype)


def serving_forward_lowlat_linear(prepared, batch, *, num_heads: int = 12,
                                  patch_size: int = 16,
                                  norm_eps: float = 1e-12,
                                  dtype=jnp.bfloat16,
                                  interpret: bool = False):
    """B<=8 latency path for the linear-head ViT (ViTLinearHead — the
    Base_ViT_Pretrained ablation): whole encoder as ONE Pallas program,
    with the tiny f32 classifier ends in XLA.  ``prepared``: output of
    :func:`prepare_lowlat` on the linear-head param tree (the fold-ends
    packs are anti-spoof-head-specific, so this model always uses the
    encoder-only kernel).  Returns softmax probabilities [B, C] like
    :func:`serving_forward_linear`."""
    x = _lowlat_encode(prepared, batch, num_heads=num_heads,
                       patch_size=patch_size, norm_eps=norm_eps,
                       dtype=dtype, interpret=interpret)
    params = prepared["params"]
    feats = _layernorm(x[:, :1], params["vit"]["norm"], norm_eps)[:, 0]
    cls = params["classifier"]
    logits = (jnp.dot(feats.astype(jnp.float32),
                      cls["kernel"].astype(jnp.float32),
                      preferred_element_type=jnp.float32)
              + cls["bias"].astype(jnp.float32))
    return jax.nn.softmax(logits, axis=-1)


def serving_forward_sharded(params, batch, mesh, *, fn=serving_forward,
                            **kwargs):
    """Data-parallel fastserve forward over ``mesh``'s data axis.

    Each device runs the single-chip fused-kernel program (``fn``:
    :func:`serving_forward` default, or
    :func:`serving_forward_linear`) on its batch shard (params
    replicated); GSPMD cannot partition ``pallas_call``, so the whole
    forward rides ``jax.shard_map``.  The global batch must split
    evenly over the data axis into per-device shards of even size (the
    attention kernel's block_b=2 batch blocking).
    """
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import DATA_AXIS

    ndata = dict(zip(mesh.axis_names, mesh.devices.shape))[DATA_AXIS]
    if batch.shape[0] % ndata:
        raise ValueError(
            f"batch {batch.shape[0]} not divisible by data axis {ndata}")
    f = jax.shard_map(
        lambda p, b: fn(p, b, **kwargs),
        mesh=mesh, in_specs=(P(), P(DATA_AXIS)), out_specs=P(DATA_AXIS),
        check_vma=False)
    return f(params, batch)


def serving_program(module, variables, *, mode: str,
                    dtype=jnp.bfloat16, int8_weights: bool = False):
    """Resolve a serving regime to ``(weights, raw_fn, kwargs)``: fold
    normalization into the patch-embed GEMM and pack the mode's weight
    layout.  The single source of truth for regime construction, shared
    by :func:`make_serving_fn` (live jit) and
    ``models/artifact.export_serving`` (frozen jax.export) so the
    exported program can never drift from the live one.

    ``int8_weights`` (``mode="lowlat"`` only): pack the encoder
    superblocks weight-only int8 — halves the HBM weight stream at the
    cost of an in-VMEM dequant pass.  Measured SLOWER than bf16 at B=1
    (0.467 vs 0.348-0.424 ms/img, BENCH_NOTES round 12); opt-in for
    memory-constrained deployments only.  Activations and the
    stem/head stay ``dtype``."""
    from .vit import ViTAntiSpoof, fold_normalization

    if not isinstance(module, ViTAntiSpoof):
        raise TypeError("serving programs pack the anti-spoof head; got "
                        f"{type(module).__name__} (use "
                        "eval.runner.make_fastserve_infer for the "
                        "linear-head models)")
    if int8_weights and mode != "lowlat":
        raise ValueError(
            "int8_weights quantizes the per-item lowlat weight stream; "
            f"mode={mode!r} amortizes weights across the batch and stays "
            "full-precision (pass mode='lowlat')")
    geom = dict(num_heads=module.num_heads, patch_size=module.patch_size,
                norm_eps=module.norm_eps)
    folded = fold_normalization(variables)["params"]
    if mode == "fastserve":
        return folded, serving_forward, dict(
            geom, depth=module.depth, dtype=dtype)
    if mode not in ("lowlat", "batch_grid"):
        raise ValueError(f"unknown serving mode {mode!r}")
    prepared = prepare_lowlat(folded, depth=module.depth, dtype=dtype,
                              batch_grid=(mode == "batch_grid"),
                              per_item=(mode == "lowlat"),
                              int8_weights=int8_weights)
    raw = (serving_forward_lowlat_batch if mode == "batch_grid"
           else serving_forward_lowlat)
    return prepared, raw, dict(geom, dtype=dtype)


def auto_serving_mode(batch_size: int) -> str:
    """The measured regime table (TPU v5e, BENCH_NOTES rounds 7-12):
    B=1 whole-encoder per-item kernel; 2..16 batch-grid (2-image weight
    chunks, 0.23-0.25 ms/img — still ahead of fastserve at B=16 by
    ~2%); >=17 per-layer fastserve (0.225 ms/img by B=32, 0.216 at
    B=128)."""
    if batch_size < 1:
        raise ValueError(f"batch_size must be >= 1, got {batch_size}")
    if batch_size == 1:
        return "lowlat"
    return "batch_grid" if batch_size <= 16 else "fastserve"


def make_serving_fn(module, variables, *, batch_size: int,
                    mode: str = "auto", dtype=jnp.bfloat16,
                    int8_weights: bool = False, interpret: bool = False):
    """Production serving factory: fold normalization, pack weights, and
    return a jitted ``uint8 [B,H,W,3] -> P(live) [B]`` function on the
    measured regime winner for ``batch_size`` (BENCH_NOTES rounds 7-12,
    TPU v5e):

    - ``B == 1``  -> ``lowlat`` (whole encoder as ONE Pallas program,
      ~0.28 ms/img; fold-ends image->logits single kernel available
      when patch_dim == embed_dim)
    - ``2..16``   -> ``batch_grid`` (same single-program encoder, weights
      stream once per 2-image chunk — the measured VMEM sweet spot:
      0.23-0.25 ms/img flat across B=2..32 vs 0.25-0.33 fastserve;
      BENCH_NOTES round 12, exp_r12/r13 interleaved repeats)
    - ``B >= 17`` -> ``fastserve`` (per-layer fused kernels — the
      throughput mode; crosses below batch-grid by B=32 at 0.225
      ms/img, 4,632 img/s/chip at B=128)

    ``mode`` overrides the map ("fastserve" | "lowlat" | "batch_grid").
    ``int8_weights`` (lowlat only): weight-only int8 encoder stream —
    halves HBM weight traffic but measured slower than bf16 at B=1;
    opt-in for memory-constrained deployments (see
    :func:`serving_program`).
    ``module``: the ``ViTAntiSpoof`` instance (geometry source);
    ``variables``: its UNFOLDED variables (folding happens here).
    Weights stay runtime arguments of the compiled program (closed over
    the returned callable), so XLA does not bake them into the
    executable.  Raises on a non-TPU backend unless ``interpret=True``
    (CPU debugging)."""
    if not interpret and jax.default_backend() != "tpu":
        raise RuntimeError(
            "make_serving_fn builds Pallas TPU programs; on the "
            f"'{jax.default_backend()}' backend pass interpret=True "
            "(debugging) or use the module path")
    if mode == "auto":
        mode = auto_serving_mode(batch_size)
    weights, raw, kw = serving_program(module, variables, mode=mode,
                                       dtype=dtype,
                                       int8_weights=int8_weights)
    fn = jax.jit(lambda p, b: raw(p, b, interpret=interpret, **kw))
    return lambda batch_u8: fn(weights, batch_u8)
