"""ViT-B/16 backbone + anti-spoofing head, TPU-first.

Functionally equivalent to the reference's timm ``vit_base_patch16_224``
with ``num_classes=0`` (pooled CLS features) plus the custom MLP head
(reference train_advanced.py:187-204: LayerNorm -> Dropout -> Linear(768,512)
-> GELU -> Dropout -> Linear(512,2)), but built for the MXU:

- **Fused QKV**: one [D, 3D] matmul per block instead of three — matches
  timm's fused layout, keeps the MXU busy with one large GEMM.
- **Patch embedding as reshape+matmul**: the 16x16/stride-16 conv is
  mathematically a [P*P*C, D] GEMM over non-overlapping patches; expressed
  that way XLA tiles it straight onto the MXU with no conv lowering.
- **bf16 compute policy** (`dtype`), float32 params and final logits —
  the TPU equivalent of the reference's CUDA AMP (train_advanced.py:326).
- Static shapes everywhere: 224x224 -> 196 patches + CLS = 197 tokens.
- Exact (erf) GELU by default to match torch `nn.GELU` / timm numerics;
  `gelu="tanh"` is the serving fast path (erf costs ~12 ms/batch of VPU
  transcendentals across the 12 MLPs at B=128 — 2574 vs 3193 img/s —
  while differing by ~one bf16 ulp at activation magnitudes).

Sequence length is 197, so attention is a dense [B, H, 197, 197] einsum —
flash/blockwise attention buys nothing at this size (SURVEY.md §2.7), but
the attention core is factored out (`dot_product_attention`) so a Pallas
blockwise kernel can be swapped in for longer sequences.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def dot_product_attention(q, k, v, *, dtype=jnp.float32,
                          use_fused=None):
    """Attention core: [B, T, H, Dh] inputs, softmax in float32.

    On TPU this dispatches to the Pallas fused kernel
    (ops/attention.py) which keeps the [T, T] softmax entirely in VMEM;
    elsewhere (or with use_fused=False) it falls back to the dense
    einsum path.
    """
    if use_fused is None:
        # single-chip only, like every other dispatch in the codebase:
        # GSPMD cannot partition a pallas_call, so the fused kernel under
        # multi-chip pjit would fail to compile or force replication
        # (multi-device uses ops/attention.py::attention_sharding)
        use_fused = (jax.default_backend() == "tpu"
                     and jax.device_count() == 1)
    if use_fused:
        from ..ops.attention import fused_attention
        return fused_attention(q, k, v)
    dh = q.shape[-1]
    scale = jnp.asarray(dh, jnp.float32) ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    weights = jax.nn.softmax(logits, axis=-1).astype(dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", weights, v)


class Attention(nn.Module):
    """Multi-head self-attention with fused QKV projection.

    Implementation choice is delegated to
    `ops.attention.dispatch_attention_qkv`: Pallas kernel on a single
    TPU, shard_map-wrapped Pallas under a multi-device data-parallel
    mesh (set via `ops.attention.attention_sharding`, which the Trainer
    enters), dense einsum everywhere else."""

    num_heads: int
    dtype: Dtype = jnp.float32
    # Opt-in explainability tap (analysis/attention_maps.py): forces the
    # dense einsum path and sows the float32 [B, H, T, T] softmax into
    # the "intermediates" collection.  Same parameter tree — construct a
    # capture variant of the module and apply the trained params.
    capture: bool = False

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        dh = d // self.num_heads
        qkv = nn.Dense(3 * d, dtype=self.dtype, name="qkv")(x)  # [B,T,3D]

        if self.capture:
            parts = qkv.reshape(x.shape[0], x.shape[1], 3,
                                self.num_heads, dh)
            q, k, v = parts[:, :, 0], parts[:, :, 1], parts[:, :, 2]
            scale = jnp.asarray(dh, jnp.float32) ** -0.5
            logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                                preferred_element_type=jnp.float32) * scale
            weights = jax.nn.softmax(logits, axis=-1)
            self.sow("intermediates", "attn_probs", weights)
            out = jnp.einsum("bhqk,bkhd->bqhd", weights.astype(self.dtype),
                             v).reshape(x.shape[0], x.shape[1], d)
            return nn.Dense(d, dtype=self.dtype, name="proj")(out)

        def dense(qkv):
            parts = qkv.reshape(x.shape[0], x.shape[1], 3,
                                self.num_heads, dh)
            q, k, v = parts[:, :, 0], parts[:, :, 1], parts[:, :, 2]
            out = dot_product_attention(q, k, v, dtype=self.dtype,
                                        use_fused=False)
            return out.reshape(x.shape[0], x.shape[1], d)

        from ..ops.attention import dispatch_attention_qkv
        out = dispatch_attention_qkv(qkv, self.num_heads, dense)
        return nn.Dense(d, dtype=self.dtype, name="proj")(out)


class MlpBlock(nn.Module):
    hidden_dim: int
    dtype: Dtype = jnp.float32
    gelu: str = "erf"

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        # "erf" = torch nn.GELU default (parity paths).  "tanh" = the
        # standard serving approximation: max |diff| ~5e-4 (one bf16 ulp
        # at activation magnitudes), but erf costs ~1 ms of VPU
        # transcendentals per [128,197,3072] pass on v5e — 12 ms/batch
        # across the ViT, 2574 -> 3193 img/s (BENCH_NOTES.md round 2).
        # gelu_lean: same values/gradients, but the VJP stores only the
        # pre-activation (~148 MB/layer less residual at B=128; BENCH_
        # NOTES round 20) — matters under autodiff on multi-chip meshes.
        from ..ops.gelu import gelu_lean
        x = gelu_lean(x, self.gelu == "tanh")
        x = nn.Dense(d, dtype=self.dtype, name="fc2")(x)
        return x


class EncoderBlock(nn.Module):
    """Pre-LN transformer block (timm ViT layout)."""

    num_heads: int
    mlp_ratio: float = 4.0
    norm_eps: float = 1e-6          # timm default; HF ViT uses 1e-12
    dtype: Dtype = jnp.float32
    gelu: str = "erf"
    capture_attention: bool = False

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        y = nn.LayerNorm(epsilon=self.norm_eps, dtype=self.dtype, name="norm1")(x)
        x = x + Attention(self.num_heads, dtype=self.dtype, name="attn",
                          capture=self.capture_attention)(y)
        y = nn.LayerNorm(epsilon=self.norm_eps, dtype=self.dtype, name="norm2")(x)
        x = x + MlpBlock(int(d * self.mlp_ratio), dtype=self.dtype,
                         gelu=self.gelu, name="mlp")(y)
        return x


def patchify(x, *, patch_size: int, dtype):
    """[B, H, W, C] image -> [B, gh*gw, p*p*C] patch rows (the ViT
    stem's im2row).  THE patch-layout definition: the module forward,
    the serving paths (models/fastserve.py), and the pipelined encoder
    (parallel/pipeline.py) all call this, so the layout cannot drift."""
    b, h, w, c = x.shape
    p = patch_size
    gh, gw = h // p, w // p
    x = x.astype(dtype)
    x = x.reshape(b, gh, p, gw, p, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, gh * gw, p * p * c)


class ViT(nn.Module):
    """ViT backbone; returns pooled features (timm ``num_classes=0`` mode:
    CLS token after the final LayerNorm)."""

    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    pool: str = "token"              # "token" (timm default) | "mean"
    norm_eps: float = 1e-6           # timm 1e-6; HF ViT 1e-12
    dtype: Dtype = jnp.float32
    gelu: str = "erf"                # "tanh": serving fast path
    capture_attention: bool = False  # sow per-layer softmax (analysis)

    @nn.compact
    def __call__(self, x):
        """x: [B, H, W, 3] float (already normalized). Returns [B, D]."""
        b = x.shape[0]
        gh, gw = x.shape[1] // self.patch_size, x.shape[2] // self.patch_size

        # Patch embed as one GEMM: [B, gh, p, gw, p, C] -> [B, N, p*p*C] @ W
        x = patchify(x, patch_size=self.patch_size, dtype=self.dtype)
        x = nn.Dense(self.embed_dim, dtype=self.dtype, name="patch_embed")(x)

        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, self.embed_dim))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(self.dtype), (b, 1, self.embed_dim)),
             x], axis=1)
        pos = self.param("pos_embed",
                         nn.initializers.normal(stddev=0.02),
                         (1, gh * gw + 1, self.embed_dim))
        x = x + pos.astype(self.dtype)

        for i in range(self.depth):
            x = EncoderBlock(self.num_heads, self.mlp_ratio, self.norm_eps,
                             dtype=self.dtype, gelu=self.gelu,
                             capture_attention=self.capture_attention,
                             name=f"block{i}")(x)
        x = nn.LayerNorm(epsilon=self.norm_eps, dtype=self.dtype, name="norm")(x)
        if self.pool == "token":
            return x[:, 0]
        return jnp.mean(x[:, 1:], axis=1)


class AntiSpoofHead(nn.Module):
    """LayerNorm -> Dropout -> Dense(512) -> GELU -> Dropout -> Dense(2)
    (reference train_advanced.py:193-200, nn.Sequential indices 0..5)."""

    hidden: int = 512
    num_classes: int = 2
    dropout: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, *, train: bool = False):
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(feats)  # torch default eps
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        # Final logits in float32 for stable loss/metrics under bf16 policy.
        return nn.Dense(self.num_classes, dtype=jnp.float32, name="fc2")(x)


class ViTAntiSpoof(nn.Module):
    """Flagship model: ViT-B/16 features + anti-spoofing MLP head
    (reference ViTFaceAntiSpoofing, train_advanced.py:187-204)."""

    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    hidden: int = 512
    num_classes: int = 2
    dropout: float = 0.1
    dtype: Dtype = jnp.float32

    norm_eps: float = 1e-6
    gelu: str = "erf"                # "tanh": serving fast path
    capture_attention: bool = False  # sow per-layer softmax (analysis)

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        feats = ViT(self.patch_size, self.embed_dim, self.depth,
                    self.num_heads, self.mlp_ratio, norm_eps=self.norm_eps,
                    dtype=self.dtype, gelu=self.gelu,
                    capture_attention=self.capture_attention,
                    name="vit")(x)
        return AntiSpoofHead(self.hidden, self.num_classes, self.dropout,
                             dtype=self.dtype, name="head")(
            feats.astype(jnp.float32), train=train)


def fold_normalization(variables, *, mean=None, std=None,
                       input_scale: float = 255.0):
    """Fold ToTensor(/255) + ImageNet normalization into the patch-embed
    GEMM weights, so the model consumes RAW uint8 (or [0,255] float)
    images with NO separate normalize pass over the full-resolution
    image (one less HBM sweep; the round-1 perf lever from
    BENCH_NOTES.md).

    For row i of the patch kernel (channel c = i % 3):
      y = sum_i ((u_i/s - m_c)/sd_c) k_i + b
        = sum_i u_i * k_i/(s*sd_c)  +  (b - sum_i (m_c/sd_c) k_i)

    Exact in f32; under the bf16 policy re-rounding the scaled kernel
    costs ~0.02 absolute on ViT-B logits (same order as the policy's own
    noise).  Applies to any of the ViT-family models in this module
    (params with a ``vit/patch_embed`` or top-level ``patch_embed``).
    """
    from ..ops.image import IMAGENET_MEAN, IMAGENET_STD
    mean = jnp.asarray(IMAGENET_MEAN if mean is None else mean, jnp.float32)
    std = jnp.asarray(IMAGENET_STD if std is None else std, jnp.float32)

    params = dict(variables["params"])
    inner = dict(params["vit"]) if "vit" in params else params
    pe = inner["patch_embed"]
    k = jnp.asarray(pe["kernel"], jnp.float32)          # [p*p*c, D]
    b = jnp.asarray(pe["bias"], jnp.float32)
    reps = k.shape[0] // mean.shape[0]                  # c is fastest
    scale = jnp.tile(1.0 / (input_scale * std), reps)
    shift = jnp.tile(mean / std, reps)
    folded = {"kernel": (k * scale[:, None]).astype(pe["kernel"].dtype),
              "bias": (b - shift @ k).astype(pe["bias"].dtype)}
    inner["patch_embed"] = folded
    if "vit" in params:
        params["vit"] = inner
    out = dict(variables)
    out["params"] = params
    return out


class ViTLinearHead(nn.Module):
    """ViT + bare linear head on CLS — the "frozen/base ViT" ablation
    (HF ViTForImageClassification with num_labels=2, random head, no
    fine-tune; reference evaluate_all_models.py:307-318)."""

    num_classes: int = 2
    dtype: Dtype = jnp.float32
    # HF google/vit-base-patch16-224 puts LayerNorm before the classifier
    # (ViTModel final layernorm), same as timm's `norm`.

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        feats = ViT(norm_eps=1e-12, dtype=self.dtype, name="vit")(x)
        return nn.Dense(self.num_classes, dtype=jnp.float32,
                        name="classifier")(feats.astype(jnp.float32))
