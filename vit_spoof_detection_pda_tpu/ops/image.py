"""Deterministic on-device image preprocessing.

Replaces the reference's CPU-side torchvision transform chains:

- eval:  Resize((S,S)) -> ToTensor -> Normalize(ImageNet)
  (reference train_advanced.py:179-183, test.py:157-163,
   evaluate_all_models.py:327-331)
- train resize stage: Resize(256) before RandomCrop(224)
  (reference train_advanced.py:167-168)

All ops take NHWC arrays (uint8 or float) and are jit-friendly with static
shapes.  The fused eval path (`preprocess_eval`) is one compiled program:
uint8 -> float -> antialiased bilinear resize -> normalize -> (optional
bf16 cast), executing on TPU instead of 28 DataLoader workers.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp

# ImageNet statistics (reference train_advanced.py:171-176, 181-182).
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def to_float(x):
    """uint8 [0,255] -> float32 [0,1] (torchvision ToTensor semantics,
    minus the CHW permute — we stay NHWC, the TPU-native layout)."""
    if x.dtype == jnp.uint8:
        return x.astype(jnp.float32) / 255.0
    return x.astype(jnp.float32)


def resize_bilinear(x, size: Sequence[int], *, antialias: bool = True):
    """Bilinear resize of NHWC (or HWC) images to (H, W) = size.

    torchvision's `Resize` on PIL images uses antialiased bilinear
    resampling; `jax.image.resize` with antialias=True matches it within
    interpolation tolerance.
    """
    h, w = size
    if x.ndim == 3:
        shape = (h, w, x.shape[-1])
    else:
        shape = (x.shape[0], h, w, x.shape[-1])
    return jax.image.resize(x, shape, method="bilinear", antialias=antialias)


def resize_shorter_side(x, target: int, *, antialias: bool = True):
    """torchvision `Resize(int)` semantics: scale shorter side to `target`,
    preserving aspect ratio (reference train transform Resize(256),
    train_advanced.py:167).  Static-shape variant: only valid under jit
    when input H, W are static."""
    if x.ndim == 3:
        h, w = x.shape[0], x.shape[1]
    else:
        h, w = x.shape[1], x.shape[2]
    # half-away-from-zero, matching the host decoders' grid convention
    # (data/loader.py / decoder.cpp lround) — Python round() is
    # banker's rounding and disagrees on exact .5 scales
    if h <= w:
        new_h, new_w = target, max(1, int(w * target / h + 0.5))
    else:
        new_h, new_w = max(1, int(h * target / w + 0.5)), target
    return resize_bilinear(x, (new_h, new_w), antialias=antialias)


def normalize(x, mean=IMAGENET_MEAN, std=IMAGENET_STD):
    """Per-channel normalization, NHWC."""
    mean = jnp.asarray(mean, x.dtype)
    std = jnp.asarray(std, x.dtype)
    return (x - mean) / std


def denormalize(x, mean=IMAGENET_MEAN, std=IMAGENET_STD):
    """Inverse of `normalize` (reference augment_data.py:164-167 does this
    on CPU before JPEG writeback; here it stays on device)."""
    mean = jnp.asarray(mean, x.dtype)
    std = jnp.asarray(std, x.dtype)
    return x * std + mean


def to_uint8(x):
    """clamp [0,1] -> round -> uint8 (reference augment_data.py:168-172)."""
    return jnp.clip(jnp.round(x * 255.0), 0, 255).astype(jnp.uint8)


@partial(jax.jit, static_argnames=("size", "out_dtype", "denoise"))
def preprocess_eval(batch_u8, size: int = 224, out_dtype=jnp.float32,
                    denoise: bool = False):
    """Fused eval preprocessing: the whole torchvision eval transform as one
    compiled device program (reference test.py:157-163), with the optional
    fast-NLM denoise stage the reference README claims (README.md:106) but
    never implements.

    Args:
      batch_u8: [N, H, W, 3] uint8 (or float in [0,1]).
    Returns:
      [N, size, size, 3] `out_dtype`, ImageNet-normalized.
    """
    x = to_float(batch_u8)
    if denoise:
        from . import nlm  # local import: optional stage
        x = nlm.fast_nlm_denoise(x)
    x = resize_bilinear(x, (size, size))
    x = normalize(x)
    return x.astype(out_dtype)


@partial(jax.jit, static_argnames=("dtype",))
def normalize_u8_fused(batch_u8, dtype=jnp.bfloat16):
    """uint8 -> normalized `dtype` in ONE elementwise pass.

    Folds ToTensor (/255) and ImageNet normalization into a single
    affine on the uint8 values: (u8 - 255*mean) * (1/(255*std)) — no
    float32 intermediate image ever hits HBM (the separate
    to_float+normalize spelling writes two full-size f32 tensors).
    The serving fast path; numerically identical in f32, within one
    bf16 ulp in bf16.
    """
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32) * 255.0
    inv_std = 1.0 / (jnp.asarray(IMAGENET_STD, jnp.float32) * 255.0)
    x = batch_u8.astype(jnp.float32)
    return ((x - mean) * inv_std).astype(dtype)


def center_crop(x, size: int):
    """Center crop NHWC/HWC to (size, size)."""
    hh, ww = (x.shape[0], x.shape[1]) if x.ndim == 3 else (x.shape[1],
                                                           x.shape[2])
    if size > hh or size > ww:
        # a negative slice start would WRAP and return a garbled sliver
        raise ValueError(f"center_crop size {size} exceeds input "
                         f"{hh}x{ww}")
    if x.ndim == 3:
        h, w = x.shape[0], x.shape[1]
        top, left = (h - size) // 2, (w - size) // 2
        return x[top:top + size, left:left + size, :]
    h, w = x.shape[1], x.shape[2]
    top, left = (h - size) // 2, (w - size) // 2
    return x[:, top:top + size, left:left + size, :]
