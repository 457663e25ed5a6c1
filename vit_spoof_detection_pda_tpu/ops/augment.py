"""Stochastic per-sample augmentation ops.

The TPU-native replacement for the reference's two augmentation stacks:

- the offline Kornia GPU pipelines (reference augment_data.py:51-107 —
  heavy/medium/light tiers of HFlip, Rotation, ColorJitter, GaussianBlur,
  GaussianNoise, Perspective, ElasticTransform, Sharpness), and
- the torchvision train transform (train_advanced.py:166-177 — Resize 256,
  RandomCrop 224, HFlip, ColorJitter, Rotation(10), Normalize,
  RandomErasing).

Design: every op is ``op(key, img, ...) -> img`` on a single HWC float
image in [0,1], applying its own per-sample Bernoulli gate (Kornia
semantics: each sample in a batch draws its own gate and parameters).
Batching is ``jax.vmap`` over split keys — the whole chain compiles to one
fused XLA program per batch; there is no per-image host work (the
reference round-trips every image through CPU PIL between Kornia and
JPEG, augment_data.py:201-207).

Random-parameter semantics follow torchvision/Kornia distributions
(not bitstreams): factors ~ U[max(0,1-b), 1+b], hue ~ U[-h, h], rotation
angle ~ U[-deg, deg], etc. (SURVEY.md §7 hard part #4).
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import warp

# --------------------------------------------------------------------------
# helpers
# --------------------------------------------------------------------------


def _gate(key, p, img, fn):
    """Apply `fn` with probability p (per-sample Bernoulli, lax.cond so the
    untaken branch costs nothing at trace level; both compile).

    The taken branch casts back to the input dtype: ops that compute
    pieces in f32 must not silently promote a bf16 chain (the cond
    branches would also fail to unify)."""
    gate_key, fn_key = jax.random.split(key)
    take = jax.random.bernoulli(gate_key, p)
    return jax.lax.cond(take,
                        lambda im: fn(fn_key, im).astype(im.dtype),
                        lambda im: im, img)


def rgb_to_grayscale(img):
    """ITU-R 601-2 luma (torchvision weights)."""
    w = jnp.asarray([0.2989, 0.587, 0.114], img.dtype)
    return jnp.sum(img * w, axis=-1, keepdims=True)


def _blend(a, b, factor):
    """torchvision blend: factor*a + (1-factor)*b, clamped to [0,1]."""
    return jnp.clip(factor * a + (1.0 - factor) * b, 0.0, 1.0)


# --------------------------------------------------------------------------
# geometric ops
# --------------------------------------------------------------------------


def random_hflip(key, img, p: float = 0.5):
    """K.RandomHorizontalFlip / transforms.RandomHorizontalFlip."""
    return _gate(key, p, img, lambda k, im: im[:, ::-1, :])


def random_rotation(key, img, degrees: float, p: float = 1.0):
    """Rotate by angle ~ U[-degrees, degrees] about the image center,
    bilinear, zero fill (K.RandomRotation / transforms.RandomRotation)."""

    def rot(k, im):
        angle = jax.random.uniform(k, (), minval=-degrees, maxval=degrees)
        h, w = im.shape[0], im.shape[1]
        m = warp.rotation_matrix(jnp.deg2rad(angle),
                                 (h - 1) / 2.0, (w - 1) / 2.0)
        return warp.affine_warp(im, m)

    return _gate(key, p, img, rot)


def random_crop(key, img, size: int):
    """Uniform-offset crop to (size, size) (transforms.RandomCrop,
    train_advanced.py:168)."""
    h, w = img.shape[0], img.shape[1]
    ky, kx = jax.random.split(key)
    top = jax.random.randint(ky, (), 0, h - size + 1)
    left = jax.random.randint(kx, (), 0, w - size + 1)
    return jax.lax.dynamic_slice(img, (top, left, 0),
                                 (size, size, img.shape[2]))


def _perspective_homography(k, h, w, distortion_scale):
    """Sample the Kornia-semantics dest->src homography: dst corners at
    the frame, src corners displaced inward by U[0, d*half].  THE corner
    geometry — random_perspective and composed_geometric both call this
    so their distributions cannot drift."""
    off = jax.random.uniform(k, (4, 2))
    dxm = distortion_scale * (w - 1) / 2.0
    dym = distortion_scale * (h - 1) / 2.0
    dst = jnp.asarray([[0.0, 0.0], [w - 1.0, 0.0],
                       [w - 1.0, h - 1.0], [0.0, h - 1.0]])
    inward = jnp.asarray([[1.0, 1.0], [-1.0, 1.0],
                          [-1.0, -1.0], [1.0, -1.0]])
    src = dst + off * jnp.asarray([dxm, dym]) * inward
    return warp.homography_from_points(src, dst)


def _elastic_fields(k, h, w, *, alpha, sigma, kernel_size, noise_dtype,
                    kern_dtype):
    """Sample the (dy, dx) smoothed displacement fields — shared by
    elastic_transform and composed_geometric (``noise_dtype`` differs:
    f32 standalone, the image's compute dtype in the fused chain so the
    63-tap blur honors the bf16 aug policy)."""
    kx, ky = jax.random.split(k)
    nx = jax.random.uniform(kx, (h, w), noise_dtype, -1.0, 1.0)
    ny = jax.random.uniform(ky, (h, w), noise_dtype, -1.0, 1.0)
    kern = _gaussian_kernel1d(kernel_size, sigma, kern_dtype)
    dx = _separable_blur2d(nx[..., None], kern)[..., 0] * alpha * (w / 2.0)
    dy = _separable_blur2d(ny[..., None], kern)[..., 0] * alpha * (h / 2.0)
    return dy, dx


def random_perspective(key, img, distortion_scale: float, p: float = 0.5):
    """Displace the 4 corners inward by U[0, d*half] and warp
    (K.RandomPerspective / transforms.RandomPerspective)."""

    def persp(k, im):
        h, w = im.shape[0], im.shape[1]
        hm = _perspective_homography(k, h, w, distortion_scale)
        return warp.perspective_warp(im, hm)

    return _gate(key, p, img, persp)


def elastic_transform(key, img, alpha: float = 1.0, sigma: float = 32.0,
                      kernel_size: int = 63, p: float = 1.0):
    """Smoothed random displacement field (K.RandomElasticTransform
    defaults: kernel 63, sigma 32, alpha 1; displacement is in normalized
    [-1,1] grid units, so alpha scales by half the image size in pixels)."""

    def elastic(k, im):
        h, w = im.shape[0], im.shape[1]
        dy, dx = _elastic_fields(k, h, w, alpha=alpha, sigma=sigma,
                                 kernel_size=kernel_size,
                                 noise_dtype=jnp.float32,
                                 kern_dtype=img.dtype)
        return warp.displacement_warp(im, dy, dx)

    return _gate(key, p, img, elastic)


# --------------------------------------------------------------------------
# photometric ops
# --------------------------------------------------------------------------


def adjust_brightness(img, factor):
    return jnp.clip(img * factor, 0.0, 1.0)


def adjust_contrast(img, factor):
    mean = jnp.mean(rgb_to_grayscale(img))
    return _blend(img, mean, factor)


def adjust_saturation(img, factor):
    return _blend(img, rgb_to_grayscale(img), factor)


# --- normalized-domain jitter equivalents ---------------------------------
# The reference's tiers jitter tensors that are ALREADY
# ImageNet-normalized (augment_data.py:226-231) and the writeback
# denormalizes (:164-172).  Each op below is the EXACT [0,1]-space image
# of the corresponding unit-style op applied in normalized space:
# brightness f*x_n -> f*x + (1-f)*mean; contrast/saturation blend toward
# the grayscale of the NORMALIZED tensor, which denormalizes to
# mean_c + std_c * gray_n.  No mid-chain clipping (normalized-space ops
# do not clip; the uint8 writeback clamps).  Hue on out-of-range
# normalized values has no sane [0,1] image — the tiers keep the unit
# hue (documented deviation, augment/policy.py design note).

def _grayscale_normdomain(img):
    """gray(normalize(img)) as a [H,W,1] map (still in normalized
    units)."""
    from .image import IMAGENET_MEAN, IMAGENET_STD
    w = jnp.asarray([0.2989, 0.587, 0.114], img.dtype)
    m = jnp.asarray(IMAGENET_MEAN, img.dtype)
    s = jnp.asarray(IMAGENET_STD, img.dtype)
    return jnp.sum((img - m) / s * w, axis=-1, keepdims=True)


def adjust_brightness_normdomain(img, factor):
    from .image import IMAGENET_MEAN
    m = jnp.asarray(IMAGENET_MEAN, img.dtype)
    return factor * img + (1.0 - factor) * m


def adjust_contrast_normdomain(img, factor):
    from .image import IMAGENET_MEAN, IMAGENET_STD
    m = jnp.asarray(IMAGENET_MEAN, img.dtype)
    s = jnp.asarray(IMAGENET_STD, img.dtype)
    g = jnp.mean(_grayscale_normdomain(img))
    return factor * img + (1.0 - factor) * (m + s * g)


def adjust_saturation_normdomain(img, factor):
    from .image import IMAGENET_MEAN, IMAGENET_STD
    m = jnp.asarray(IMAGENET_MEAN, img.dtype)
    s = jnp.asarray(IMAGENET_STD, img.dtype)
    g = _grayscale_normdomain(img)
    return factor * img + (1.0 - factor) * (m + s * g)


def adjust_hue(img, delta):
    """Shift hue by delta (fraction of a turn, torchvision range ±0.5)
    via RGB->HSV->RGB."""
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    maxc = jnp.max(img, axis=-1)
    minc = jnp.min(img, axis=-1)
    v = maxc
    c = maxc - minc
    s = jnp.where(maxc > 0, c / jnp.maximum(maxc, 1e-8), 0.0)
    safe_c = jnp.maximum(c, 1e-8)
    rc = (maxc - r) / safe_c
    gc = (maxc - g) / safe_c
    bc = (maxc - b) / safe_c
    hue = jnp.where(r == maxc, bc - gc,
                    jnp.where(g == maxc, 2.0 + rc - bc, 4.0 + gc - rc))
    hue = (hue / 6.0) % 1.0
    hue = jnp.where(c > 0, hue, 0.0)

    hue = (hue + delta) % 1.0

    i = jnp.floor(hue * 6.0)
    f = hue * 6.0 - i
    pp = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r2 = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                    [v, q, pp, pp, t, v])
    g2 = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                    [t, v, v, q, pp, pp])
    b2 = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                    [pp, pp, t, v, v, q])
    return jnp.stack([r2, g2, b2], axis=-1)


def color_jitter(key, img, brightness: float = 0.0, contrast: float = 0.0,
                 saturation: float = 0.0, hue: float = 0.0, p: float = 1.0,
                 order: str = "random", domain: str = "unit"):
    """ColorJitter: per-sample factors b,c,s ~ U[max(0,1-x), 1+x],
    hue ~ U[-h, h].

    ``order="random"`` permutes the four ops per sample (torchvision
    ColorJitter / Kornia ColorJiggle — the train transform's semantics,
    train_advanced.py:171).  ``order="fixed"`` applies
    brightness->contrast->saturation->hue deterministically — modern
    Kornia ``K.ColorJitter``'s documented behavior, i.e. the offline
    tiers' semantics (augment_data.py:63-83) — and is ~3x cheaper on
    TPU: under vmap a random-order switch evaluates every branch at
    every step (16 op evaluations, 4 of them the expensive HSV hue
    round-trip) while the fixed chain evaluates each op once.

    ``domain="normalized"`` replicates the reference tiers' EFFECTIVE
    on-disk jitter: its ops run on ImageNet-normalized tensors, so
    brightness/contrast/saturation pivot at the channel mean (see the
    *_normdomain ops above — exact equivalences); hue keeps the unit
    form (documented deviation).  The train-time chain runs pre-
    normalize in the reference and keeps ``domain="unit"``."""
    if domain not in ("unit", "normalized"):
        raise ValueError(f"unknown jitter domain {domain!r}")

    def jitter(k, im):
        kb, kc, ks, kh, korder = jax.random.split(k, 5)
        fb = jax.random.uniform(kb, (), minval=max(0.0, 1 - brightness),
                                maxval=1 + brightness)
        fc = jax.random.uniform(kc, (), minval=max(0.0, 1 - contrast),
                                maxval=1 + contrast)
        fs = jax.random.uniform(ks, (), minval=max(0.0, 1 - saturation),
                                maxval=1 + saturation)
        fh = jax.random.uniform(kh, (), minval=-hue, maxval=hue)

        adj_b, adj_c, adj_s = (
            (adjust_brightness, adjust_contrast, adjust_saturation)
            if domain == "unit" else
            (adjust_brightness_normdomain, adjust_contrast_normdomain,
             adjust_saturation_normdomain))
        # each branch casts back to the input dtype: factors are f32
        # scalars, and a bf16 chain (the tower sampler preserves bf16)
        # must not promote mid-loop (fori_loop carries require it)
        branches = [
            lambda im_: adj_b(im_, fb).astype(im_.dtype),
            lambda im_: adj_c(im_, fc).astype(im_.dtype),
            lambda im_: adj_s(im_, fs).astype(im_.dtype),
            lambda im_: adjust_hue(im_, fh).astype(im_.dtype),
        ]
        if order == "fixed":
            for fn in branches:
                im = fn(im)
            return im
        perm = jax.random.permutation(korder, 4)

        def body(i, im_):
            return jax.lax.switch(perm[i], branches, im_)

        return jax.lax.fori_loop(0, 4, body, im)

    return _gate(key, p, img, jitter)


def _gaussian_kernel1d(size: int, sigma, dtype=jnp.float32):
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return (k / jnp.sum(k)).astype(dtype)


def _separable_blur2d(img, kernel1d):
    """Depthwise separable blur on HWC with reflect padding (torchvision
    gaussian_blur / Kornia default border = reflect-101).  Two depthwise
    1D convs — the kernel is symmetric so correlation == convolution."""
    ksz = kernel1d.shape[0]
    pad = ksz // 2
    c = img.shape[-1]
    # conv requires matching dtypes; align the kernel to the (float)
    # image rather than promoting the image
    assert jnp.issubdtype(img.dtype, jnp.floating), img.dtype
    kernel1d = kernel1d.astype(img.dtype)
    x = jnp.pad(img, ((pad, pad), (pad, pad), (0, 0)), mode="reflect")
    x = x[None].transpose(0, 3, 1, 2)                       # NCHW
    kv = jnp.tile(kernel1d.reshape(1, 1, ksz, 1), (c, 1, 1, 1))
    kh = jnp.tile(kernel1d.reshape(1, 1, 1, ksz), (c, 1, 1, 1))
    x = jax.lax.conv_general_dilated(x, kv, (1, 1), "VALID",
                                     feature_group_count=c)
    x = jax.lax.conv_general_dilated(x, kh, (1, 1), "VALID",
                                     feature_group_count=c)
    return x[0].transpose(1, 2, 0)


_band_cache: dict = {}


def _reflect_band_matrices(size: int, ksz: int) -> np.ndarray:
    """E[t] with E[t][i, j] += 1 where j = reflect-101(i + t - pad) —
    so sum_t kern[t] * E[t] is the dense [size, size] operator of a
    1D correlation with reflect padding (np.pad mode="reflect")."""
    key = (size, ksz)
    if key not in _band_cache:
        pad = ksz // 2
        e = np.zeros((ksz, size, size), np.float32)
        for t in range(ksz):
            for i in range(size):
                j = i + t - pad
                if j < 0:
                    j = -j
                elif j >= size:
                    j = 2 * size - 2 - j
                e[t, i, j] += 1.0
        _band_cache[key] = e
    return _band_cache[key]


def _separable_blur2d_mm(img, kernel1d):
    """The same separable reflect-pad blur as two DENSE MATMULS on the
    MXU: Kb = sum_t kern[t] * E_t folds the per-sample 1D kernel into a
    [size, size] operator, then row pass Kb @ img and column pass on the
    transposed layout.  Under vmap this is a batched [224,224] x
    [224, W*C] bf16 matmul pair (~17 GFLOP/128-batch — noise floor for
    the MXU), where the grouped-conv lowering of `_separable_blur2d`
    runs as vmapped VPU window reductions."""
    ksz = kernel1d.shape[0]
    h, w, c = img.shape
    kern = kernel1d.astype(img.dtype)
    kv = jnp.einsum("t,tij->ij", kern,
                    jnp.asarray(_reflect_band_matrices(h, ksz), img.dtype))
    kh = kv if w == h else jnp.einsum(
        "t,tij->ij", kern,
        jnp.asarray(_reflect_band_matrices(w, ksz), img.dtype))
    x = kv @ img.reshape(h, w * c)                     # vertical pass
    x = x.reshape(h, w, c).transpose(1, 0, 2)          # [w, h, c]
    x = kh @ x.reshape(w, h * c)                       # horizontal pass
    return x.reshape(w, h, c).transpose(1, 0, 2)


def gaussian_blur(key, img, kernel_size: int, sigma_range: Tuple[float, float],
                  p: float = 1.0, method: str = "conv"):
    """Separable Gaussian blur with sigma ~ U[lo, hi]
    (K.RandomGaussianBlur).  ``method="matmul"`` routes through the
    banded-matmul formulation (MXU-friendly under vmap)."""
    if method not in ("conv", "matmul"):
        raise ValueError(f"method must be 'conv' or 'matmul', got "
                         f"{method!r}")

    def blur(k, im):
        sigma = jax.random.uniform(k, (), minval=sigma_range[0],
                                   maxval=sigma_range[1])
        kern = _gaussian_kernel1d(kernel_size, sigma, im.dtype)
        if method == "matmul":
            return _separable_blur2d_mm(im, kern)
        return _separable_blur2d(im, kern)

    return _gate(key, p, img, blur)


def gaussian_noise(key, img, std=0.05, mean: float = 0.0,
                   p: float = 1.0):
    """Additive Gaussian noise (K.RandomGaussianNoise — no clamp; the
    writeback/normalize stage clamps).  ``std`` may be a per-channel
    vector: the reference adds its noise in ImageNet-NORMALIZED space
    (augment_data.py:226-231), so the on-disk noise the store actually
    carries is ``std * imagenet_std_c`` per channel — the tier chains
    pass that scaled vector to reproduce the reference distribution in
    [0,1] space."""

    def noise(k, im):
        s = jnp.asarray(std, im.dtype)
        return im + mean + s * jax.random.normal(k, im.shape, im.dtype)

    return _gate(key, p, img, noise)


def random_sharpness(key, img, sharpness: float = 2.0, p: float = 1.0):
    """Blend with a fixed 3x3 smoothing kernel, factor ~ U[0, sharpness]
    (K.RandomSharpness; torchvision adjust_sharpness kernel
    [[1,1,1],[1,5,1],[1,1,1]]/13, border pixels kept from the input)."""

    def sharp(k, im):
        factor = jax.random.uniform(k, (), minval=0.0, maxval=sharpness)
        kern = jnp.asarray([[1.0, 1.0, 1.0], [1.0, 5.0, 1.0],
                            [1.0, 1.0, 1.0]], im.dtype) / 13.0
        x = jnp.pad(im, ((1, 1), (1, 1), (0, 0)), mode="edge")
        smoothed = jax.lax.conv_general_dilated(
            x[None].transpose(0, 3, 1, 2),
            jnp.tile(kern[None, None], (im.shape[2], 1, 1, 1)),
            window_strides=(1, 1), padding="VALID",
            feature_group_count=im.shape[2],
        )[0].transpose(1, 2, 0)
        out = _blend(im, smoothed, factor)
        # torchvision keeps the 1-pixel border unchanged
        h, w = im.shape[0], im.shape[1]
        ys = jnp.arange(h)[:, None, None]
        xs = jnp.arange(w)[None, :, None]
        border = (ys == 0) | (ys == h - 1) | (xs == 0) | (xs == w - 1)
        return jnp.where(border, im, out)

    return _gate(key, p, img, sharp)


def random_erasing(key, img, p: float = 0.25,
                   scale: Tuple[float, float] = (0.02, 0.33),
                   ratio: Tuple[float, float] = (0.3, 3.3),
                   value: float = 0.0):
    """Erase a random rectangle (transforms.RandomErasing,
    train_advanced.py:176).  Single-draw variant: area and aspect are
    sampled once and the rectangle is clamped to fit (torchvision retries
    up to 10x then gives up; distributionally close, never a no-op)."""

    def erase(k, im):
        h, w = im.shape[0], im.shape[1]
        ka, kr, ky, kx = jax.random.split(k, 4)
        area = h * w * jax.random.uniform(ka, (), minval=scale[0],
                                          maxval=scale[1])
        log_ratio = jax.random.uniform(
            kr, (), minval=math.log(ratio[0]), maxval=math.log(ratio[1]))
        r = jnp.exp(log_ratio)
        eh = jnp.clip(jnp.round(jnp.sqrt(area * r)), 1, h).astype(jnp.int32)
        ew = jnp.clip(jnp.round(jnp.sqrt(area / r)), 1, w).astype(jnp.int32)
        top = jax.random.randint(ky, (), 0, h)
        left = jax.random.randint(kx, (), 0, w)
        top = jnp.minimum(top, h - eh)
        left = jnp.minimum(left, w - ew)
        ys = jnp.arange(h)[:, None, None]
        xs = jnp.arange(w)[None, :, None]
        mask = ((ys >= top) & (ys < top + eh) &
                (xs >= left) & (xs < left + ew))
        return jnp.where(mask, value, im)

    return _gate(key, p, img, erase)


# --------------------------------------------------------------------------
# composed geometric warp — ONE resampling pass for the whole geometric
# sub-chain
# --------------------------------------------------------------------------


def _perspective_kmax(scale: float, size: int) -> int:
    """Static roll bound for a distortion-`scale` homography on a
    size^2 image: corner displacement is scale*(size-1)/2; interior
    shift-field magnitudes stay near it (measured ~21 px at scale 0.2 /
    224), with 35% + 2 px headroom.  Fields clamp to the bound anyway;
    tests sample homographies to confirm the clamp never engages."""
    return int(math.ceil(1.35 * scale * (size - 1) / 2.0)) + 2


def _elastic_kmax(alpha: float, sigma: float, ksize: int,
                  size: int) -> int:
    """Static roll bound for the elastic field: displacement is
    alpha*(size/2)*blur(U[-1,1]); std = alpha*(size/2)*sqrt(1/3)*sum(k^2)
    for the separable kernel, peak-over-50K-pixels ~ 4.5 std (measured
    max 5.5 px at the heavy tier's alpha=1/sigma=32).  Bound at 6.5 std
    + 2; the field clamps to it (P(clamp) ~ 1e-9 per image)."""
    x = np.arange(ksize, dtype=np.float64) - (ksize - 1) / 2.0
    k = np.exp(-0.5 * (x / sigma) ** 2)
    k /= k.sum()
    std = alpha * (size / 2.0) * math.sqrt(1.0 / 3.0) * float((k * k).sum())
    return max(4, int(math.ceil(6.5 * std)) + 2)


def composed_geometric(key, img, *,
                       hflip_p: float = 0.0,
                       rotation=None,        # (degrees, p)
                       perspective=None,     # (distortion_scale, p)
                       elastic=None,         # (alpha, sigma, ksize, p)
                       fill=0.0,             # OOB color (scalar or [C])
                       sampler: str = "tower"):
    """Flip + rotation + perspective + elastic as ONE bilinear resample.

    Sequential warps (the Kornia pipeline layout, augment_data.py:60-85)
    resample the image once per op — on TPU each resample is a gather,
    by far the most expensive primitive in the chain (measured 254 ms /
    128-batch vs <10 ms for any photometric op).  Coordinate transforms
    compose cheaply in coordinate space, so this op builds the chained
    dest->src map (elastic displacement -> inverse perspective -> inverse
    rotation -> flip) and samples the source image exactly once.
    Gated sub-ops contribute identity transforms.

    Distribution semantics match the sequential version; interpolation
    differs slightly (single resample = less compounded blur — strictly
    higher fidelity than Kornia's repeated resampling).

    AFFINE-ONLY FAST PATH: when neither perspective nor elastic is
    requested (the train-time chain and the light tier), the map is
    flip+rotation — expressible as a Paeth 3-shear whose gather-free
    masked-roll resamples run ~13x faster than the packed gather on TPU
    (254 -> 19 ms/128-batch, round-2 measurement; warp.rotate_3shear).

    ``fill``: out-of-bounds color.  The reference warps in
    ImageNet-NORMALIZED space where Kornia's zero fill denormalizes to
    the channel-mean gray (augment_data.py:226-231, 164-172) — the tier
    chains pass IMAGENET_MEAN so the on-disk corners match.  Implemented
    exactly via linearity: warp(x - f) + f == mean-fill with correct
    fractional edge blending (the resample is linear and zero-fills).
    """
    if np.any(np.asarray(fill) != 0):
        f = jnp.asarray(fill, img.dtype)
        return f + composed_geometric(
            key, img - f, hflip_p=hflip_p, rotation=rotation,
            perspective=perspective, elastic=elastic, fill=0.0,
            sampler=sampler)
    h, w = img.shape[0], img.shape[1]
    kf, kr_gate, kr, kp_gate, kp, ke_gate, ke = jax.random.split(key, 7)

    if perspective is None and elastic is None:
        out = img
        if hflip_p > 0.0:
            do_flip = jax.random.bernoulli(kf, hflip_p)
            out = jnp.where(do_flip, out[:, ::-1, :], out)
        if rotation is not None:
            degrees, p = rotation
            angle = jax.random.uniform(kr, (), minval=-degrees,
                                       maxval=degrees)
            angle = angle * jax.random.bernoulli(kr_gate, p)
            out = warp.rotate_3shear(out, jnp.deg2rad(angle), degrees)
        return out

    if sampler not in ("tower", "gather"):
        raise ValueError(f"unknown sampler {sampler!r} (tower | gather) — "
                         "a silent fallback would select the retired "
                         "100-300 ms/batch gather path")

    # --- sample all random parameters (IDENTICAL key layout for both
    # samplers, so distribution semantics do not depend on the path) ---
    elastic_fields = None
    if elastic is not None:
        alpha, sigma, ksize, p = elastic
        # noise fields in the image's compute dtype so the 63-tap blur
        # honors the bf16 aug policy (an f32 field would promote the
        # chain's most expensive conv)
        dy, dx = _elastic_fields(ke, h, w, alpha=alpha, sigma=sigma,
                                 kernel_size=ksize,
                                 noise_dtype=img.dtype,
                                 kern_dtype=img.dtype)
        gate = jax.random.bernoulli(ke_gate, p).astype(img.dtype)
        elastic_fields = (dy * gate, dx * gate)

    hm = None
    if perspective is not None:
        scale, p = perspective
        hm = _perspective_homography(kp, h, w, scale)
        eye = jnp.eye(3, dtype=hm.dtype)
        hm = jnp.where(jax.random.bernoulli(kp_gate, p), hm, eye)

    angle = None
    if rotation is not None:
        degrees, p = rotation
        angle = jax.random.uniform(kr, (), minval=-degrees, maxval=degrees)
        angle = angle * jax.random.bernoulli(kr_gate, p)

    do_flip = (jax.random.bernoulli(kf, hflip_p) if hflip_p > 0.0
               else None)

    if sampler == "tower":
        # Gather-free sequential tower — the reference's own warp
        # structure (Kornia applies rotation, perspective and elastic as
        # SEPARATE grid_samples, augment_data.py:60-85): flip ->
        # 3-shear rotation -> exact 2-pass perspective -> 2-pass
        # elastic, every pass masked static rolls.  TPU dynamic gathers
        # measured 100-300 ms/128-batch (exp_r4_augbreak*.py) vs pure
        # vector ops here.
        out = img
        if do_flip is not None:
            out = jnp.where(do_flip, out[:, ::-1, :], out)
        if angle is not None:
            out = warp.rotate_3shear(out, jnp.deg2rad(angle), degrees)
        if hm is not None:
            out = warp.perspective_warp_2pass(
                out, hm, kmax=_perspective_kmax(scale, max(h, w)))
        if elastic_fields is not None:
            e_kmax = _elastic_kmax(alpha, sigma, ksize, max(h, w))
            out = warp.displacement_warp_2pass(
                out, elastic_fields[0].astype(jnp.float32),
                elastic_fields[1].astype(jnp.float32), kmax=e_kmax)
        return out

    # Legacy packed single-gather sampler (ONE composed bilinear
    # resample; bf16 taps).  No production path selects it — it is kept
    # as the numerical oracle the tower tests compare against
    # (sampler="gather").
    ys, xs = warp._dest_grid(h, w)
    if elastic_fields is not None:
        ys = ys + elastic_fields[0]
        xs = xs + elastic_fields[1]
    if hm is not None:
        den = hm[2, 0] * xs + hm[2, 1] * ys + hm[2, 2]
        den = jnp.where(jnp.abs(den) < 1e-8, 1e-8, den)
        xs, ys = ((hm[0, 0] * xs + hm[0, 1] * ys + hm[0, 2]) / den,
                  (hm[1, 0] * xs + hm[1, 1] * ys + hm[1, 2]) / den)
    if angle is not None:
        m = warp.rotation_matrix(jnp.deg2rad(angle),
                                 (h - 1) / 2.0, (w - 1) / 2.0)
        xs, ys = (m[0, 0] * xs + m[0, 1] * ys + m[0, 2],
                  m[1, 0] * xs + m[1, 1] * ys + m[1, 2])
    if do_flip is not None:
        xs = jnp.where(do_flip, (w - 1.0) - xs, xs)
    return warp.bilinear_sample_packed(img, ys, xs,
                                       tap_dtype=jnp.bfloat16)


# --------------------------------------------------------------------------
# batching
# --------------------------------------------------------------------------


def apply_chain(key, batch, chain: Sequence):
    """Apply a list of per-sample closures fn(key, img) to a batch with
    independent per-sample, per-op keys; one compiled program."""
    n = batch.shape[0]

    def per_sample(k, img):
        for i, fn in enumerate(chain):
            img = fn(jax.random.fold_in(k, i), img)
        return img

    keys = jax.random.split(key, n)
    return jax.vmap(per_sample)(keys, batch)
