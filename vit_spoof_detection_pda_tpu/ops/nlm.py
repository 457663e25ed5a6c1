"""Fast non-local-means denoise (optional preprocessing stage).

The reference README claims test images were "denoised using fast
non-local means" (reference README.md:106) but no code path implements it
(SURVEY.md §0); BASELINE.json's north star nonetheless asks for an
on-device fast-NLM kernel, so it is provided here as an opt-in stage of
`ops.image.preprocess_eval`.

Algorithm (classic fast NLM, Buades et al. with the box-filter trick):
for every offset (dy, dx) in a (2r+1)^2 search window, the patch distance
between each pixel and its shifted counterpart is a BOX FILTER of the
pointwise squared difference — so the whole computation is shifts +
separable box sums + elementwise exp, which XLA fuses into a tight
VPU-bound loop with NO gathers (TPU-friendly, unlike a naive
gather-per-neighbor formulation).  Weights: w = exp(-max(d2 - 2s^2, 0)/h^2),
the standard noise-compensated kernel.

`fast_nlm_denoise` handles NHWC or HWC float images in [0, 1].
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _box_filter(x, radius: int):
    """Separable (2r+1)^2 box SUM via cumulative sums, edge-padded."""
    k = 2 * radius + 1
    x = jnp.pad(x, ((radius, radius), (radius, radius), (0, 0)),
                mode="edge")
    c = jnp.cumsum(x, axis=0)
    c = jnp.concatenate([c[k - 1:k], c[k:] - c[:-k]], axis=0)
    c = jnp.cumsum(c, axis=1)
    c = jnp.concatenate([c[:, k - 1:k], c[:, k:] - c[:, :-k]], axis=1)
    return c


@partial(jax.jit, static_argnames=("search_radius", "patch_radius"))
def _nlm_hwc(img, h: float, sigma: float, search_radius: int,
             patch_radius: int):
    hh, ww, cc = img.shape
    patch_n = (2 * patch_radius + 1) ** 2
    inv_h2 = 1.0 / (h * h)
    two_sigma2 = 2.0 * sigma * sigma

    acc = jnp.zeros_like(img)
    wsum = jnp.zeros((hh, ww, 1), img.dtype)

    # edge-pad once; every shift is then a static slice (no wraparound,
    # borders use edge-clamped neighbors — the usual NLM border convention)
    r = search_radius
    padded = jnp.pad(img, ((r, r), (r, r), (0, 0)), mode="edge")

    # static Python loop over offsets: unrolled into one fused XLA program
    for dy in range(-search_radius, search_radius + 1):
        for dx in range(-search_radius, search_radius + 1):
            shifted = padded[r + dy:r + dy + hh, r + dx:r + dx + ww, :]
            diff2 = jnp.sum((img - shifted) ** 2, axis=-1, keepdims=True)
            d2 = _box_filter(diff2, patch_radius) / (patch_n * cc)
            w = jnp.exp(-jnp.maximum(d2 - two_sigma2, 0.0) * inv_h2)
            acc = acc + w * shifted
            wsum = wsum + w
    return acc / jnp.maximum(wsum, 1e-12)


def fast_nlm_denoise(img, *, h: float = 0.1, sigma: float = 0.04,
                     search_radius: int = 5, patch_radius: int = 1,
                     use_pallas=None, interpret: bool = False):
    """Denoise NHWC or HWC float [0,1] images.

    Defaults (11x11 search, 3x3 patches) balance quality against the
    O((2r+1)^2) cost; h and sigma are in [0,1] intensity units
    (h=0.1 ~ "h=25" in 8-bit conventions).

    On TPU the Pallas kernel runs the whole offset loop in VMEM (the XLA
    spelling streams ~(2r+1)^2 full-image intermediates through HBM);
    set use_pallas=False to force the XLA path.
    """
    hh, ww = (img.shape[0], img.shape[1]) if img.ndim == 3 else \
        (img.shape[1], img.shape[2])
    # VMEM gate: the kernel keeps image + padded copy + accumulators +
    # HxH/WxW band matrices resident (~6 image-sized f32 buffers + bands);
    # larger frames must take the HBM-streaming XLA path
    fits_vmem = (hh * ww * 3 * 4 * 6 + (hh * hh + ww * ww) * 4) < 8 * 2**20
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu" and fits_vmem
    if use_pallas or interpret:
        from .nlm_pallas import nlm_denoise_pallas
        return nlm_denoise_pallas(
            img, h=h, sigma=sigma, search_radius=search_radius,
            patch_radius=patch_radius, interpret=interpret)
    if img.ndim == 3:
        return _nlm_hwc(img, h, sigma, search_radius, patch_radius)
    return jax.vmap(
        lambda im: _nlm_hwc(im, h, sigma, search_radius, patch_radius)
    )(img)
