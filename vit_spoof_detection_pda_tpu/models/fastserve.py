"""bf16 serving fast path: the flagship ViT forward as a pure function
over ``ViTAntiSpoof`` variables, with the whole pre-LN attention
sub-layer running as ONE Pallas program per layer
(``ops.attention.fused_attention_block``: LN1 + QKV GEMM + attention +
proj + residual, weights VMEM-resident).

Composition per layer (identical math to models/vit.py, serving dtypes):
  x <- fused_attention_block(x)          # Pallas, no qkv/attn HBM trip
  x <- x + fc2(gelu_tanh(fc1(LN2(x))))   # XLA (bf16 GEMMs run ~peak)

``fuse_mlp=True`` swaps the MLP half-layer for
``ops.attention.fused_mlp_block`` — measured SLOWER on v5e (36.2 vs
33.3 ms/batch: XLA's MLP GEMMs already run at ~202 TFLOP/s and the
kernel's per-program overhead + hidden-dim chunking cost more than the
saved activation round-trip), so it stays opt-in for future hardware.

Use with :func:`models.vit.fold_normalization`-transformed variables and
raw uint8 input for the fastest path (bench.py).  A parity test pins the
output to the module forward within bf16 tolerance
(tests/test_fastserve.py).

Serving-only: no gradients (training uses the flax module with the
fused_attention_qkv fwd/bwd kernel pair).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.attention import fused_attention_block, fused_mlp_block


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
                    fuse_mlp: bool = False, interpret: bool = False):
    """uint8/raw-float [B, H, W, 3] -> P(live) scores [B].

    ``params``: ViTAntiSpoof param tree (apply
    :func:`..models.vit.fold_normalization` first so raw uint8 input is
    correct).  Matches ``ViTAntiSpoof(dtype=bf16, gelu="tanh")`` within
    bf16 resolution.
    """
    vit = params["vit"]
    b, h, w, c = batch.shape
    p = patch_size
    gh, gw = h // p, w // p

    x = batch.astype(dtype)
    x = x.reshape(b, gh, p, gw, p, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, gh * gw, p * p * c)
    pe = vit["patch_embed"]
    x = (jnp.dot(x, pe["kernel"].astype(dtype),
                 preferred_element_type=jnp.float32)
         + pe["bias"].astype(jnp.float32)).astype(dtype)

    cls = jnp.broadcast_to(vit["cls_token"].astype(dtype),
                           (b, 1, x.shape[-1]))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + vit["pos_embed"].astype(dtype)

    for i in range(depth):
        blk = vit[f"block{i}"]
        x = fused_attention_block(
            x, blk["norm1"]["scale"], blk["norm1"]["bias"],
            blk["attn"]["qkv"]["kernel"].astype(dtype),
            blk["attn"]["qkv"]["bias"],
            blk["attn"]["proj"]["kernel"].astype(dtype),
            blk["attn"]["proj"]["bias"],
            num_heads, eps=norm_eps, interpret=interpret)
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

    x = _layernorm(x, vit["norm"], norm_eps)[:, 0]

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
