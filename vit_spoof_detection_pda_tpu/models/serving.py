"""int8 serving path for the flagship ViT — EXPERIMENTAL, measured
SLOWER than bf16 on this workload; bf16 is the serving default.

Why it stays demoted (round-1 and round-2 measurements, BENCH_NOTES.md):

- end-to-end int8 serving: 96 ms/batch (1,330 img/s) vs 51 ms bf16 —
  the standalone XLA quantize/dequantize passes cost more than the int8
  MXU rate saves on this dispatch/bandwidth-bound model;
- XLA-level dynamic per-tensor quant at the MLP GEMM shape: 0.98 ms vs
  0.87 ms plain bf16->f32 dot;
- a Pallas kernel with the dynamic per-row quantization FUSED in VMEM
  (no quant pass touches HBM; experiments/exp_r2_pallas_int8.py):
  1.01 ms vs 0.59 ms for XLA's plain bf16 dot — the bf16 MXU path
  already runs at ~202 TFLOP/s (~peak) at these shapes, and the Mosaic
  int8 dot does not realize the 2x int8 rate that would be needed
  to pay for the in-kernel quantization.

The module remains an opt-in capability and the place to iterate if a
future toolchain exposes the full int8 MXU rate.  It has NO registry
surface; training and metric-parity evaluation always use the float
path.  The reference has no quantization story at all (its deployment
path is torch fp16 autocast, additional_analysis.py:263-277).

Implementation: per-output-channel symmetric int8 weights (offline,
`quantize_vit_params`), dynamic per-token symmetric int8 activations,
fp32 accumulation (int32 matmul -> rescale), LayerNorm/softmax/attention
in bf16 via the Pallas fused-attention kernel.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..ops.attention import fused_attention


# --------------------------------------------------------------------------
# Quantization
# --------------------------------------------------------------------------


def quantize_dense(kernel, bias=None):
    """Per-output-channel symmetric int8: q = round(w / s), s = amax/127."""
    kernel = jnp.asarray(kernel, jnp.float32)
    scale = jnp.max(jnp.abs(kernel), axis=0) / 127.0
    scale = jnp.maximum(scale, 1e-8)
    q = jnp.clip(jnp.round(kernel / scale), -127, 127).astype(jnp.int8)
    out = {"q": q, "scale": scale}
    if bias is not None:
        out["bias"] = jnp.asarray(bias, jnp.float32)
    return out


def dense_int8(x, qw):
    """y = dequant(int8(x) @ q) + bias with dynamic per-row activation
    scales.  x: [..., in] float; returns float32 [..., out]."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    s = jnp.maximum(amax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, qw["q"], (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * s * qw["scale"]
    if "bias" in qw:
        y = y + qw["bias"]
    return y


def quantize_vit_params(params: Dict[str, Any], depth: int = 12) -> Dict:
    """ViTAntiSpoof float params -> int8 serving params.

    Quantized: patch_embed, per-block qkv/proj/fc1/fc2, head fc1/fc2.
    Kept float: LayerNorms, cls_token, pos_embed.
    """
    vit = params["vit"]
    out = {
        "patch_embed": quantize_dense(vit["patch_embed"]["kernel"],
                                      vit["patch_embed"]["bias"]),
        "cls_token": jnp.asarray(vit["cls_token"], jnp.float32),
        "pos_embed": jnp.asarray(vit["pos_embed"], jnp.float32),
        "norm": jax.tree.map(jnp.asarray, vit["norm"]),
        "blocks": [],
    }
    for i in range(depth):
        b = vit[f"block{i}"]
        out["blocks"].append({
            "norm1": jax.tree.map(jnp.asarray, b["norm1"]),
            "qkv": quantize_dense(b["attn"]["qkv"]["kernel"],
                                  b["attn"]["qkv"]["bias"]),
            "proj": quantize_dense(b["attn"]["proj"]["kernel"],
                                   b["attn"]["proj"]["bias"]),
            "norm2": jax.tree.map(jnp.asarray, b["norm2"]),
            "fc1": quantize_dense(b["mlp"]["fc1"]["kernel"],
                                  b["mlp"]["fc1"]["bias"]),
            "fc2": quantize_dense(b["mlp"]["fc2"]["kernel"],
                                  b["mlp"]["fc2"]["bias"]),
        })
    head = params["head"]
    out["head"] = {
        "norm": jax.tree.map(jnp.asarray, head["norm"]),
        "fc1": quantize_dense(head["fc1"]["kernel"], head["fc1"]["bias"]),
        "fc2": quantize_dense(head["fc2"]["kernel"], head["fc2"]["bias"]),
    }
    return out


# --------------------------------------------------------------------------
# Inference forward
# --------------------------------------------------------------------------


def _layernorm(x, p, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps)) * p["scale"] + p["bias"]


def vit_antispoof_int8_apply(qp: Dict, x, *, num_heads: int = 12,
                             patch_size: int = 16, norm_eps: float = 1e-6,
                             interpret: bool = False):
    """Quantized inference forward.  x: [B, H, W, 3] normalized floats.
    Returns float32 logits [B, num_classes]."""
    from .vit import patchify

    b = x.shape[0]
    x = patchify(x, patch_size=patch_size, dtype=jnp.float32)
    x = dense_int8(x, qp["patch_embed"])

    cls = jnp.broadcast_to(qp["cls_token"], (b, 1, x.shape[-1]))
    x = jnp.concatenate([cls, x], axis=1) + qp["pos_embed"]

    t = x.shape[1]
    d = x.shape[2]
    dh = d // num_heads
    for blk in qp["blocks"]:
        y = _layernorm(x, blk["norm1"], norm_eps)
        qkv = dense_int8(y, blk["qkv"]).reshape(b, t, 3, num_heads, dh)
        q, k, v = (qkv[:, :, 0].astype(jnp.bfloat16),
                   qkv[:, :, 1].astype(jnp.bfloat16),
                   qkv[:, :, 2].astype(jnp.bfloat16))
        if interpret or jax.default_backend() == "tpu":
            attn = fused_attention(q, k, v, interpret)
        else:
            from ..ops.attention import _dense_reference
            attn = _dense_reference(q, k, v)
        attn = attn.reshape(b, t, d)
        x = x + dense_int8(attn, blk["proj"])
        y = _layernorm(x, blk["norm2"], norm_eps)
        y = dense_int8(y, blk["fc1"])
        y = jax.nn.gelu(y, approximate=False)
        x = x + dense_int8(y, blk["fc2"])

    x = _layernorm(x, qp["norm"], norm_eps)
    feats = x[:, 0]
    y = _layernorm(feats, qp["head"]["norm"], 1e-5)
    y = jax.nn.gelu(dense_int8(y, qp["head"]["fc1"]), approximate=False)
    return dense_int8(y, qp["head"]["fc2"])
