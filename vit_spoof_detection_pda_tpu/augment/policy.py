"""Severity-tier augmentation policies and the differential plan.

Op parameters transcribed from the reference's three Kornia pipelines
(augment_data.py:60-85):

heavy : HFlip(.5), Rot(20, p.7), CJ(.4,.4,.4,.2, p.8), Blur(5x5, s .1-2, p.5),
        Noise(std .05, p.3), Persp(.2, p.4), Elastic(p.3), Sharp(2.0, p.3)
medium: HFlip(.5), Rot(15, p.6), CJ(.3,.3,.3,.1, p.7), Blur(3x3, s .1-1.5, p.4),
        Noise(.03, p.2), Persp(.15, p.3)
light : HFlip(.5), Rot(10, p.5), CJ(.2,.2,.2,.05, p.5), Blur(3x3, s .1-1, p.3)

Severity schedule per copy index (augment_data.py:188-194): first third
heavy, middle third medium, rest light.  Differential multiplier: live x8,
spoof x2 (augment_data.py:33-34) — turning the 1:3.87 imbalance into
~1:0.97 (README.md:83-88).

Design note — normalized-domain equivalence: the reference feeds Kornia
tensors that are ALREADY ImageNet-normalized (augment_data.py:226-231)
and denormalizes on writeback (:164-172).  These chains operate in
[0,1], and where the two domains produce DIFFERENT on-disk outputs the
[0,1] parameters are adjusted to the reference's effective values:

- additive noise: N(0, s) in normalized space lands on disk as
  N(0, s * imagenet_std_c) per channel (~4.4x weaker than a naive
  [0,1] s) — tiers pass the scaled per-channel std;
- warp fill: Kornia's zero fill denormalizes to the channel-mean gray
  (0.485, 0.456, 0.406), not black — tiers pass fill=IMAGENET_MEAN
  (exact via warp linearity, ops/augment.py::composed_geometric);
- blur / sharpness commute with the affine normalize exactly
  (kernels sum to 1) — no adjustment needed.

- ColorJitter brightness/contrast/saturation: tiers pass
  domain="normalized" (ops/augment.py ``*_normdomain`` — exact [0,1]
  images of the normalized-space ops: channel-mean pivots, no
  mid-chain clip).

Remaining documented deviation: hue rotation — Kornia's HSV math on
out-of-range normalized values has no sane [0,1] image, so the tiers
keep the unit-domain hue (factors are small: 0.05-0.2 turns).
"""

from __future__ import annotations

from typing import Callable, List

import jax

from ..ops import augment as A
from ..ops.image import IMAGENET_MEAN, IMAGENET_STD

# the reference's effective on-disk noise std per channel: its N(0, s)
# is added in normalized space (see module design note)
_NOISE_SCALE = IMAGENET_STD

Chain = List[Callable]   # each fn: (key, img[H,W,C] in [0,1]) -> img


# All geometric sub-ops of a tier run through A.composed_geometric,
# which samples every warp parameter once and (by default) applies them
# as a GATHER-FREE sequential tower of masked-static-roll scanline
# passes — the reference's own warp structure (Kornia resamples per op)
# without TPU dynamic gathers, which probes measured at 100-300
# ms/128-batch (BENCH_NOTES.md round 4).  Photometric ops then run on
# the warped image; for isotropic kernels this is distributionally
# equivalent to the reference's interleaved order, and noise added
# post-warp stays white (arguably more correct than warping
# previously-added noise).
#
# ColorJitter order: the tiers use order="fixed"
# (brightness->contrast->saturation->hue) — modern Kornia K.ColorJitter's
# documented deterministic order, which the reference's unpinned kornia
# dependency resolves to; the torchvision train-time chain keeps the
# per-sample random order.  Fixed order is also ~3x cheaper on TPU.


def heavy_chain() -> Chain:
    return [
        lambda k, im: A.composed_geometric(
            k, im, hflip_p=0.5, rotation=(20.0, 0.7),
            perspective=(0.2, 0.4), elastic=(1.0, 32.0, 63, 0.3),
            fill=IMAGENET_MEAN),
        lambda k, im: A.color_jitter(k, im, 0.4, 0.4, 0.4, 0.2, p=0.8,
                             order="fixed", domain="normalized"),
        lambda k, im: A.gaussian_blur(k, im, 5, (0.1, 2.0), p=0.5),
        lambda k, im: A.gaussian_noise(
            k, im, std=tuple(0.05 * s for s in _NOISE_SCALE), p=0.3),
        lambda k, im: A.random_sharpness(k, im, 2.0, p=0.3),
    ]


def medium_chain() -> Chain:
    return [
        lambda k, im: A.composed_geometric(
            k, im, hflip_p=0.5, rotation=(15.0, 0.6),
            perspective=(0.15, 0.3), fill=IMAGENET_MEAN),
        lambda k, im: A.color_jitter(k, im, 0.3, 0.3, 0.3, 0.1, p=0.7,
                             order="fixed", domain="normalized"),
        lambda k, im: A.gaussian_blur(k, im, 3, (0.1, 1.5), p=0.4),
        lambda k, im: A.gaussian_noise(
            k, im, std=tuple(0.03 * s for s in _NOISE_SCALE), p=0.2),
    ]


def light_chain() -> Chain:
    return [
        lambda k, im: A.composed_geometric(
            k, im, hflip_p=0.5, rotation=(10.0, 0.5),
            fill=IMAGENET_MEAN),
        lambda k, im: A.color_jitter(k, im, 0.2, 0.2, 0.2, 0.05, p=0.5,
                             order="fixed", domain="normalized"),
        lambda k, im: A.gaussian_blur(k, im, 3, (0.1, 1.0), p=0.3),
    ]


CHAINS = {"heavy": heavy_chain, "medium": medium_chain, "light": light_chain}


def severity_for_copy(aug_idx: int, num_augmentations: int) -> str:
    """First third heavy, middle third medium, rest light
    (augment_data.py:188-194)."""
    if aug_idx < num_augmentations // 3:
        return "heavy"
    if aug_idx < 2 * num_augmentations // 3:
        return "medium"
    return "light"


def differential_plan(live_augmentations: int = 8,
                      spoof_augmentations: int = 2):
    """[(class_name, copy_index, severity), ...] for the full differential
    fan-out (live x8 / spoof x2, augment_data.py:33-34, 344-358)."""
    plan = []
    for cls, n in (("live", live_augmentations),
                   ("spoof", spoof_augmentations)):
        for i in range(n):
            plan.append((cls, i, severity_for_copy(i, n)))
    return plan


def train_time_chain(crop_size=224,
                     hflip_prob: float = 0.5,
                     color_jitter=(0.2, 0.2, 0.2, 0.1),
                     rotation_deg: float = 10.0,
                     random_erase_prob: float = 0.25) -> Chain:
    """Per-batch training augmentation (train_advanced.py:166-177):
    RandomCrop(224) <- input already resized to 256 by the data layer ->
    HFlip -> ColorJitter -> Rotation -> [normalize happens after] ->
    RandomErasing.

    Note: erasing runs here pre-normalization with value 0 (black); the
    reference erases post-normalization (zero in normalized space).  The
    erased patch differs by the channel mean — a documented deviation.
    """
    b, c, s, h = color_jitter
    chain = []
    if crop_size is not None:      # None: inputs already at target size
        chain.append(lambda k, im: A.random_crop(k, im, crop_size))
    chain += [
        # reference order: jitter sees the UN-rotated crop — rotating
        # first would feed the zero-filled corners into the contrast
        # op's gray-world mean and tint them toward it
        lambda k, im: A.random_hflip(k, im, p=hflip_prob),
        lambda k, im: A.color_jitter(k, im, b, c, s, h, p=1.0),
        lambda k, im: A.composed_geometric(
            k, im, rotation=(rotation_deg, 1.0)),
        lambda k, im: A.random_erasing(k, im, p=random_erase_prob),
    ]
    return chain


def make_batch_augmenter(level_or_chain, jit: bool = True):
    """Compile a chain into fn(key, batch[B,H,W,C]) -> batch."""
    chain = (CHAINS[level_or_chain]() if isinstance(level_or_chain, str)
             else level_or_chain)

    def run(key, batch):
        return A.apply_chain(key, batch, chain)

    return jax.jit(run) if jit else run
