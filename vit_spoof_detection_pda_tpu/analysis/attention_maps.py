"""Attention-rollout saliency maps for failed-case explainability.

The reference's failed-case miner copies the worst-scored images
(additional_analysis.py:103-181) but offers nothing about WHY the model
scored them — a PAD operator looking at a false accept wants to see
which image regions drove the "live" call (moiré on a screen, paper
edges, specular patches).  This module adds the standard ViT
explanation: **attention rollout** (Abnar & Zuidema, "Quantifying
Attention Flow in Transformers", 2020) over the anti-spoof ViT —
per-layer [T, T] attention matrices averaged over heads, mixed with the
residual identity, multiplied through the stack; the CLS row restricted
to patch tokens is the per-patch relevance.

The capture path is opt-in on the model (``capture_attention=True``
constructs a variant with the SAME parameter tree that sows the f32
softmax per layer — models/vit.py::Attention.capture); the hot serving
and training paths are untouched.

CLI: ``analyze --attention-overlays <image-dir-or-csv>`` (needs
``eval.checkpoint_path``); library: ``generate_attention_overlays``.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Sequence

import numpy as np

log = logging.getLogger(__name__)


def attention_rollout(probs_per_layer: Sequence[np.ndarray],
                      residual: float = 0.5) -> np.ndarray:
    """Rollout relevance from per-layer attention softmaxes.

    ``probs_per_layer``: ``depth`` arrays of [B, H, T, T] (query axis
    before key axis, as sown by the capture path).  Each layer's
    head-mean is mixed with the identity — ``residual`` is the identity
    weight, 0.5 per the paper's (A + I)/2 — row-normalized, and the
    stack is multiplied first-layer-innermost.  Returns [B, T, T]; the
    caller usually takes ``[:, 0, 1:]`` (CLS -> patches).
    """
    if not probs_per_layer:
        raise ValueError("need at least one layer of attention probs")
    rollout = None
    for probs in probs_per_layer:
        a = np.asarray(probs, np.float64).mean(axis=1)      # [B, T, T]
        t = a.shape[-1]
        a = (1.0 - residual) * a + residual * np.eye(t)
        a = a / a.sum(axis=-1, keepdims=True)
        rollout = a if rollout is None else a @ rollout
    return rollout


def cls_patch_relevance(probs_per_layer, *, grid_hw=None,
                        residual: float = 0.5) -> np.ndarray:
    """[B, gh, gw] normalized (max=1 per image) CLS->patch relevance."""
    rollout = attention_rollout(probs_per_layer, residual=residual)
    cls = rollout[:, 0, 1:]                                 # [B, N]
    n = cls.shape[-1]
    if grid_hw is None:
        g = int(round(n ** 0.5))
        if g * g != n:
            raise ValueError(f"{n} patch tokens is not square; pass "
                             f"grid_hw")
        grid_hw = (g, g)
    cls = cls.reshape(cls.shape[0], *grid_hw)
    peak = cls.max(axis=(1, 2), keepdims=True)
    return cls / np.where(peak > 0, peak, 1.0)


def capture_attention_probs(module, variables, images) -> list:
    """Forward a batch through a capture variant of ``module`` and
    return the per-layer [B, H, T, T] attention softmaxes (f32 numpy,
    layer order).  ``images``: normalized float input, the module's
    usual eval contract (ops/image.py::preprocess_eval output)."""
    import jax

    try:
        capture = module.clone(capture_attention=True)
    except TypeError as e:
        raise ValueError(
            f"{type(module).__name__} has no capture_attention flag — "
            f"attention rollout is only wired for the ViT family") from e
    _, state = capture.apply(variables, images,
                             mutable=["intermediates"])
    inters = state["intermediates"]
    # paths: vit/block{i}/attn/attn_probs -> (array,)  (ViTAntiSpoof)
    #        block{i}/attn/attn_probs                  (bare ViT)
    flat = jax.tree_util.tree_flatten_with_path(inters)[0]
    by_layer = {}
    for path, leaf in flat:
        keys = [getattr(p, "key", getattr(p, "name", None)) for p in path]
        block = next((k for k in keys
                      if isinstance(k, str) and k.startswith("block")), None)
        if block is None or "attn_probs" not in keys:
            continue
        by_layer[int(block[len("block"):])] = np.asarray(leaf, np.float32)
    if not by_layer:
        raise ValueError(
            f"{type(module).__name__} sowed no attention — "
            f"capture_attention is only wired for the ViT family")
    return [by_layer[i] for i in sorted(by_layer)]


def cls_patch_relevance_device(module, variables, images, *,
                               residual: float = 0.5,
                               grid_hw=None) -> np.ndarray:
    """[B, gh, gw] CLS->patch rollout relevance with the capture forward
    AND the rollout in ONE jitted program.

    The eager path (:func:`capture_attention_probs` +
    :func:`cls_patch_relevance`) dispatches the forward op-by-op and
    fetches twelve [B, H, T, T] tensors to host — on a relay-attached
    TPU that is minutes of RTT + ~360 MB of fetch per 16-image batch
    (measured hang, round 28).  Here only the [B, N] CLS row crosses
    the wire; the rollout chain runs in f32 on device (the f64 host
    oracle agrees to ~1e-6 — row-stochastic matrices keep the product
    conditioned)."""
    import jax
    import jax.numpy as jnp

    try:
        capture = module.clone(capture_attention=True)
    except TypeError as e:
        raise ValueError(
            f"{type(module).__name__} has no capture_attention flag — "
            f"attention rollout is only wired for the ViT family") from e

    @jax.jit
    def run(v, x):
        _, state = capture.apply(v, x, mutable=["intermediates"])
        flat = jax.tree_util.tree_flatten_with_path(
            state["intermediates"])[0]
        by_layer = {}
        for path, leaf in flat:
            keys = [getattr(p, "key", getattr(p, "name", None))
                    for p in path]
            block = next((k for k in keys if isinstance(k, str)
                          and k.startswith("block")), None)
            if block is None or "attn_probs" not in keys:
                continue
            by_layer[int(block[len("block"):])] = leaf
        if not by_layer:
            raise ValueError(
                f"{type(module).__name__} sowed no attention — "
                f"capture_attention is only wired for the ViT family")
        rollout = None
        for i in sorted(by_layer):
            a = jnp.mean(by_layer[i].astype(jnp.float32), axis=1)
            t = a.shape[-1]
            a = ((1.0 - residual) * a
                 + residual * jnp.eye(t, dtype=jnp.float32))
            a = a / jnp.sum(a, axis=-1, keepdims=True)
            rollout = a if rollout is None else jnp.einsum(
                "bij,bjk->bik", a, rollout)
        return rollout[:, 0, 1:]                            # [B, N]

    cls = np.asarray(run(variables, images), np.float64)
    n = cls.shape[-1]
    if grid_hw is None:
        g = int(round(n ** 0.5))
        if g * g != n:
            raise ValueError(f"{n} patch tokens is not square; pass "
                             f"grid_hw")
        grid_hw = (g, g)
    cls = cls.reshape(cls.shape[0], *grid_hw)
    peak = cls.max(axis=(1, 2), keepdims=True)
    return cls / np.where(peak > 0, peak, 1.0)


def generate_attention_overlays(module, variables, image_paths,
                                out_dir: str, *, img_size: int = 224,
                                batch_size: int = 16,
                                scores=None) -> dict:
    """Write ``<out_dir>/<stem>_attn.png`` heat overlays for each image.

    Decodes with the eval pipeline's semantics (resize to the square
    eval size), runs attention rollout, bilinearly upsamples the patch
    grid onto the image, and renders image | overlay side by side.
    ``scores``: optional parallel P(live) floats for the title line.
    Returns {"out_dir", "files"}.
    """
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from ..data.loader import decode_image
    from ..ops.image import preprocess_eval

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    paths = [Path(p) for p in image_paths]
    files = []
    for start in range(0, len(paths), batch_size):
        chunk = paths[start:start + batch_size]
        frames = np.stack([decode_image(str(p), img_size) for p in chunk])
        # pad the tail chunk to the full batch shape: the jitted capture
        # program compiles once per shape, and a relay recompile costs
        # minutes
        padded = frames if len(chunk) == batch_size else np.concatenate(
            [frames, np.repeat(frames[-1:], batch_size - len(chunk), 0)])
        batch = np.asarray(preprocess_eval(padded, size=img_size))
        rel = cls_patch_relevance_device(
            module, variables, batch)[:len(chunk)]          # [b, gh, gw]
        for j, p in enumerate(chunk):
            heat = _upsample_bilinear(rel[j], img_size, img_size)
            fig, axes = plt.subplots(1, 2, figsize=(6.4, 3.4))
            axes[0].imshow(frames[j])
            axes[0].set_title(p.name, fontsize=8)
            axes[1].imshow(frames[j])
            axes[1].imshow(heat, cmap="jet", alpha=0.45,
                           interpolation="nearest")
            title = "attention rollout"
            if scores is not None:
                title += f"  P(live)={float(scores[start + j]):.3f}"
            axes[1].set_title(title, fontsize=8)
            for ax in axes:
                ax.axis("off")
            fname = out / f"{p.stem}_attn.png"
            fig.savefig(fname, dpi=120, bbox_inches="tight")
            plt.close(fig)
            files.append(str(fname))
    log.info("wrote %d attention overlays under %s", len(files), out)
    return {"out_dir": str(out), "files": files}


def _upsample_bilinear(grid: np.ndarray, h: int, w: int) -> np.ndarray:
    """[gh, gw] -> [h, w] bilinear (align_corners=False semantics, like
    the eval resize)."""
    gh, gw = grid.shape
    ys = (np.arange(h) + 0.5) * gh / h - 0.5
    xs = (np.arange(w) + 0.5) * gw / w - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, gh - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, gw - 1)
    y1 = np.clip(y0 + 1, 0, gh - 1)
    x1 = np.clip(x0 + 1, 0, gw - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[:, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, :]
    top = grid[y0[:, None], x0[None, :]] * (1 - wx) + \
        grid[y0[:, None], x1[None, :]] * wx
    bot = grid[y1[:, None], x0[None, :]] * (1 - wx) + \
        grid[y1[:, None], x1[None, :]] * wx
    return top * (1 - wy) + bot * wy
