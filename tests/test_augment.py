"""Augmentation ops vs independent oracles (cv2 / PIL / closed form),
plus policy/engine behavior (SURVEY.md §4: per-kernel golden tests)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vit_spoof_detection_pda_tpu.ops import augment as A
from vit_spoof_detection_pda_tpu.ops import image as I
from vit_spoof_detection_pda_tpu.ops import warp


def _img(seed=0, h=32, w=32):
    rng = np.random.default_rng(seed)
    return rng.random((h, w, 3)).astype(np.float32)


KEY = jax.random.PRNGKey(0)


# ---------------------------------------------------------------- gates ----


def test_gate_probability_zero_is_identity():
    img = _img()
    for op in [
        lambda k, im: A.random_hflip(k, im, p=0.0),
        lambda k, im: A.random_rotation(k, im, 20.0, p=0.0),
        lambda k, im: A.color_jitter(k, im, 0.4, 0.4, 0.4, 0.2, p=0.0),
        lambda k, im: A.gaussian_blur(k, im, 5, (0.1, 2.0), p=0.0),
        lambda k, im: A.gaussian_noise(k, im, p=0.0),
        lambda k, im: A.random_perspective(k, im, 0.2, p=0.0),
        lambda k, im: A.elastic_transform(k, im, p=0.0),
        lambda k, im: A.random_sharpness(k, im, p=0.0),
        lambda k, im: A.random_erasing(k, im, p=0.0),
    ]:
        np.testing.assert_array_equal(np.asarray(op(KEY, img)), img)


def test_determinism_and_key_sensitivity():
    img = _img()
    a = np.asarray(A.color_jitter(KEY, img, 0.4, 0.4, 0.4, 0.2, p=1.0))
    b = np.asarray(A.color_jitter(KEY, img, 0.4, 0.4, 0.4, 0.2, p=1.0))
    c = np.asarray(A.color_jitter(jax.random.PRNGKey(1), img,
                                  0.4, 0.4, 0.4, 0.2, p=1.0))
    np.testing.assert_array_equal(a, b)
    assert np.abs(a - c).max() > 1e-4


# ------------------------------------------------------------- geometric ---


def test_hflip():
    img = _img()
    out = np.asarray(A.random_hflip(KEY, img, p=1.0))
    np.testing.assert_array_equal(out, img[:, ::-1, :])


def test_rotation_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    img = _img(1, 48, 48)
    # fix the angle by driving the warp directly
    angle = 17.0
    m = warp.rotation_matrix(jnp.deg2rad(jnp.float32(angle)),
                             (48 - 1) / 2.0, (48 - 1) / 2.0)
    ours = np.asarray(warp.affine_warp(jnp.asarray(img), m))
    # cv2: positive angle is CCW; getRotationMatrix2D returns the forward
    # map, warpAffine inverts internally
    mcv = cv2.getRotationMatrix2D((23.5, 23.5), angle, 1.0)
    ref = cv2.warpAffine(img, mcv, (48, 48), flags=cv2.INTER_LINEAR,
                         borderMode=cv2.BORDER_CONSTANT)
    # compare interior (border handling differs at the frame)
    diff = np.abs(ours[4:-4, 4:-4] - ref[4:-4, 4:-4])
    assert diff.max() < 2e-2, diff.max()
    assert diff.mean() < 2e-3


def test_perspective_homography_roundtrip():
    """homography_from_points: mapping dst->src then warping the identity
    grid reproduces the corner correspondence."""
    src = jnp.asarray([[2.0, 3.0], [45.0, 1.0], [44.0, 46.0], [0.0, 47.0]])
    dst = jnp.asarray([[0.0, 0.0], [47.0, 0.0], [47.0, 47.0], [0.0, 47.0]])
    h = warp.homography_from_points(src, dst)
    for s, d in zip(np.asarray(src), np.asarray(dst)):
        x, y = d
        den = h[2, 0] * x + h[2, 1] * y + h[2, 2]
        sx = (h[0, 0] * x + h[0, 1] * y + h[0, 2]) / den
        sy = (h[1, 0] * x + h[1, 1] * y + h[1, 2]) / den
        np.testing.assert_allclose([sx, sy], s, atol=1e-4)


def test_perspective_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    img = _img(2, 48, 48)
    src = np.array([[2.0, 3.0], [45.0, 1.0], [44.0, 46.0], [0.0, 47.0]],
                   np.float32)
    dst = np.array([[0.0, 0.0], [47.0, 0.0], [47.0, 47.0], [0.0, 47.0]],
                   np.float32)
    h = warp.homography_from_points(jnp.asarray(src), jnp.asarray(dst))
    ours = np.asarray(warp.perspective_warp(jnp.asarray(img), h))
    mcv = cv2.getPerspectiveTransform(src, dst)   # src->dst forward
    ref = cv2.warpPerspective(img, mcv, (48, 48), flags=cv2.INTER_LINEAR)
    diff = np.abs(ours[4:-4, 4:-4] - ref[4:-4, 4:-4])
    assert diff.max() < 2e-2


def test_random_crop_bounds():
    img = _img(3, 64, 64)
    for seed in range(5):
        out = np.asarray(A.random_crop(jax.random.PRNGKey(seed), img, 32))
        assert out.shape == (32, 32, 3)
        # crop content must appear somewhere in the source
        assert out.min() >= img.min() and out.max() <= img.max()


def test_elastic_transform_displaces_but_preserves_range():
    img = _img(4, 64, 64)
    out = np.asarray(A.elastic_transform(KEY, img, alpha=1.0, p=1.0))
    assert out.shape == img.shape
    assert not np.array_equal(out, img)
    assert out.min() >= -1e-6 and out.max() <= 1 + 1e-6


# ------------------------------------------------------------ photometric --


def test_brightness_matches_pil():
    from PIL import Image, ImageEnhance
    u8 = (np.clip(_img(5), 0, 1) * 255).astype(np.uint8)
    for f in (0.6, 1.4):
        ref = np.asarray(ImageEnhance.Brightness(
            Image.fromarray(u8)).enhance(f)).astype(np.float32) / 255
        got = np.asarray(A.adjust_brightness(u8.astype(np.float32) / 255, f))
        np.testing.assert_allclose(got, ref, atol=1 / 255 + 1e-3)


def test_contrast_matches_pil():
    from PIL import Image, ImageEnhance
    u8 = (np.clip(_img(6), 0, 1) * 255).astype(np.uint8)
    for f in (0.5, 1.5):
        ref = np.asarray(ImageEnhance.Contrast(
            Image.fromarray(u8)).enhance(f)).astype(np.float32) / 255
        got = np.asarray(A.adjust_contrast(u8.astype(np.float32) / 255, f))
        # PIL computes the gray mean on uint8 (rounded) — 1-2 LSB slack
        np.testing.assert_allclose(got, ref, atol=3 / 255)


def test_saturation_matches_pil():
    from PIL import Image, ImageEnhance
    u8 = (np.clip(_img(7), 0, 1) * 255).astype(np.uint8)
    for f in (0.4, 1.6):
        ref = np.asarray(ImageEnhance.Color(
            Image.fromarray(u8)).enhance(f)).astype(np.float32) / 255
        got = np.asarray(A.adjust_saturation(u8.astype(np.float32) / 255, f))
        np.testing.assert_allclose(got, ref, atol=3 / 255)


def test_hue_roundtrip_and_colorsys():
    import colorsys
    img = _img(8, 8, 8)
    # delta 0 is identity
    np.testing.assert_allclose(
        np.asarray(A.adjust_hue(img, 0.0)), img, atol=1e-5)
    # matches colorsys per pixel
    delta = 0.13
    got = np.asarray(A.adjust_hue(img, delta))
    for y in range(0, 8, 3):
        for x in range(0, 8, 3):
            r, g, b = img[y, x]
            h, s, v = colorsys.rgb_to_hsv(r, g, b)
            want = colorsys.hsv_to_rgb((h + delta) % 1.0, s, v)
            np.testing.assert_allclose(got[y, x], want, atol=1e-4)


def test_gaussian_blur_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    img = _img(9, 32, 32)
    sigma = 1.3
    kern = np.asarray(A._gaussian_kernel1d(5, sigma))
    ref = cv2.sepFilter2D(img, -1, kern, kern,
                          borderType=cv2.BORDER_REFLECT_101)
    got = np.asarray(A._separable_blur2d(jnp.asarray(img), jnp.asarray(kern)))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_gaussian_blur_matmul_matches_conv():
    """The banded-matmul formulation (MXU path) is the same operator as
    the grouped conv, including reflect-101 edges and rectangular
    images."""
    for shape, ks, sigma in (((32, 32, 3), 5, 1.7), ((32, 32, 3), 3, 0.6),
                             ((16, 40, 3), 5, 1.2)):
        img = jnp.asarray(_img(3, *shape[:2]).reshape(shape))
        kern = A._gaussian_kernel1d(ks, sigma)
        np.testing.assert_allclose(
            np.asarray(A._separable_blur2d_mm(img, kern)),
            np.asarray(A._separable_blur2d(img, kern)), atol=1e-6)
    # the gated op agrees across methods under vmap (shared keys)
    keys = jax.random.split(KEY, 4)
    imgs = jnp.asarray(np.stack([_img(i, 24, 24) for i in range(4)]))
    conv = jax.vmap(lambda k, im: A.gaussian_blur(k, im, 5, (0.1, 2.0),
                                                  p=0.5))(keys, imgs)
    mm = jax.vmap(lambda k, im: A.gaussian_blur(k, im, 5, (0.1, 2.0),
                                                p=0.5, method="matmul"))(
        keys, imgs)
    np.testing.assert_allclose(np.asarray(mm), np.asarray(conv), atol=1e-6)


def test_gaussian_blur_rejects_unknown_method():
    with pytest.raises(ValueError, match="method"):
        A.gaussian_blur(KEY, jnp.zeros((8, 8, 3)), 5, (0.1, 2.0),
                        method="fft")


def test_gaussian_noise_statistics():
    img = np.full((64, 64, 3), 0.5, np.float32)
    out = np.asarray(A.gaussian_noise(KEY, img, std=0.05, p=1.0))
    noise = out - img
    assert abs(noise.mean()) < 5e-3
    assert abs(noise.std() - 0.05) < 5e-3


def test_sharpness_formula():
    img = _img(10, 16, 16)
    out = np.asarray(A.random_sharpness(KEY, img, sharpness=2.0, p=1.0))
    # border rows unchanged (torchvision semantics)
    np.testing.assert_array_equal(out[0], img[0])
    np.testing.assert_array_equal(out[-1], img[-1])
    np.testing.assert_array_equal(out[:, 0], img[:, 0])
    assert not np.array_equal(out[1:-1, 1:-1], img[1:-1, 1:-1])


def test_random_erasing_erases_rectangle():
    img = np.ones((32, 32, 3), np.float32)
    out = np.asarray(A.random_erasing(KEY, img, p=1.0))
    zeros = (out == 0).all(axis=-1)
    n = zeros.sum()
    assert 0 < n < 32 * 32
    # erased region is a filled rectangle
    ys, xs = np.where(zeros)
    assert n == (ys.max() - ys.min() + 1) * (xs.max() - xs.min() + 1)


# ----------------------------------------------------------- policy/engine -


def test_severity_schedule():
    from vit_spoof_detection_pda_tpu.augment import severity_for_copy
    # reference: 8 copies -> [h,h,m,m,m,l,l,l]; 2 copies -> [m,l]
    assert [severity_for_copy(i, 8) for i in range(8)] == [
        "heavy", "heavy", "medium", "medium", "medium",
        "light", "light", "light"]
    assert [severity_for_copy(i, 2) for i in range(2)] == ["medium", "light"]


def test_differential_plan():
    from vit_spoof_detection_pda_tpu.augment import differential_plan
    plan = differential_plan(8, 2)
    assert sum(1 for c, *_ in plan if c == "live") == 8
    assert sum(1 for c, *_ in plan if c == "spoof") == 2


def test_batch_augmenter_compiles_and_varies_per_sample():
    from vit_spoof_detection_pda_tpu.augment import make_batch_augmenter
    aug = make_batch_augmenter("light")
    batch = np.stack([_img(0)] * 8)     # identical images
    out = np.asarray(aug(KEY, jnp.asarray(batch)))
    assert out.shape == batch.shape
    # per-sample randomness: identical inputs must diverge
    assert np.abs(out[0] - out[1]).max() > 1e-4


@pytest.mark.slow
def test_engine_materialize_and_online(tmp_path):
    from vit_spoof_detection_pda_tpu.augment import AugmentEngine
    eng = AugmentEngine(live_augmentations=4, spoof_augmentations=2,
                        img_size=16)
    u8 = (np.random.default_rng(0).random((3, 16, 16, 3)) * 255
          ).astype(np.uint8)
    paths = [f"img{i}.png" for i in range(3)]
    saved = eng.materialize([(paths, u8)], str(tmp_path), "live",
                            copy_originals=True)
    # 3 originals + 3*4 augmented
    assert saved == 3 + 12
    files = sorted(p.name for p in (tmp_path / "live").glob("*.jpg"))
    assert "img0_orig.jpg" in files and "img0_aug3.jpg" in files

    # online mode: yields original + copies with labels preserved
    labels = np.array([1, 1, 0], np.int32)   # 1=live
    batches = list(eng.online_batches(
        [(u8, labels)], class_of_label=lambda l: "live" if l else "spoof"))
    # 1 original + 4 live copies + 2 spoof copies
    assert len(batches) == 7
    assert batches[0][0].shape == (3, 16, 16, 3)
    assert batches[1][1].tolist() == [1, 1]    # live subset


def test_composed_geometric_mean_fill():
    """fill=IMAGENET_MEAN paints out-of-bounds corners channel-mean gray
    (the reference's effective fill: Kornia zero fill in NORMALIZED
    space denormalizes to the mean, augment_data.py:226-231)."""
    from vit_spoof_detection_pda_tpu.ops.augment import composed_geometric
    from vit_spoof_detection_pda_tpu.ops.image import IMAGENET_MEAN

    img = jnp.ones((32, 32, 3), jnp.float32)
    # force a large rotation (p=1) so corners leave the frame
    key = jax.random.PRNGKey(3)
    out = None
    for seed in range(8):       # find a key with a big sampled angle
        k = jax.random.fold_in(key, seed)
        cand = np.asarray(composed_geometric(
            k, img, rotation=(45.0, 1.0), perspective=(0.0, 0.0),
            fill=IMAGENET_MEAN))
        if abs(cand[0, 0, 0] - 1.0) > 0.1:      # corner left the frame
            out = cand
            break
    assert out is not None, "no sampled angle moved the corner"
    np.testing.assert_allclose(out[0, 0], IMAGENET_MEAN, atol=0.02)
    np.testing.assert_allclose(out[-1, -1], IMAGENET_MEAN, atol=0.02)
    # interior stays the source value
    assert abs(out[16, 16, 0] - 1.0) < 0.02


def test_gaussian_noise_per_channel_std():
    from vit_spoof_detection_pda_tpu.ops.augment import gaussian_noise

    std = (0.2, 0.05, 0.01)
    img = jnp.zeros((64, 64, 3), jnp.float32)
    out = np.asarray(gaussian_noise(jax.random.PRNGKey(0), img,
                                    std=std, p=1.0))
    got = out.std(axis=(0, 1))
    np.testing.assert_allclose(got, std, rtol=0.15)


def test_tier_chains_use_reference_effective_noise_and_fill():
    """The tiers' noise is the normalized-domain effective std
    (s * imagenet_std_c) and their warps fill channel-mean gray — the
    module design note's equivalence, pinned."""
    import inspect

    from vit_spoof_detection_pda_tpu.augment import policy

    src = inspect.getsource(policy.heavy_chain)
    assert "_NOISE_SCALE" in src and "fill=IMAGENET_MEAN" in src
    src = inspect.getsource(policy.light_chain)
    assert "fill=IMAGENET_MEAN" in src


@pytest.mark.slow
def test_materialize_originals_native_resolution(tmp_path):
    """_orig.jpg keeps the SOURCE resolution (reference
    copy_original_images re-encodes unresized, augment_data.py:264-282)
    even though the pipeline batch is resized to img_size."""
    from PIL import Image

    from vit_spoof_detection_pda_tpu.augment import AugmentEngine

    src = tmp_path / "big0.png"
    rng = np.random.default_rng(1)
    Image.fromarray(rng.integers(0, 256, (64, 64, 3),
                                 dtype=np.uint8)).save(src)
    eng = AugmentEngine(live_augmentations=1, spoof_augmentations=1,
                        img_size=16)
    u8 = rng.integers(0, 256, (1, 16, 16, 3), dtype=np.uint8)
    eng.materialize([([str(src)], u8)], str(tmp_path / "out"), "live",
                    copy_originals=True)
    orig = Image.open(tmp_path / "out" / "live" / "big0_orig.jpg")
    assert orig.size == (64, 64)                 # native, not 16


def test_engine_rejects_mismatched_batch_size():
    from vit_spoof_detection_pda_tpu.augment import AugmentEngine

    eng = AugmentEngine(img_size=16)
    with pytest.raises(ValueError, match="img_size"):
        list(eng.augment_copies(jnp.zeros((2, 32, 32, 3)), "live"))


def test_normdomain_jitter_matches_normalized_space_oracle():
    """Each *_normdomain op == denormalize(unit_op(normalize(x))) with
    the unit op expressed in normalized space — the exact equivalence
    the tier chains rely on."""
    from vit_spoof_detection_pda_tpu.ops import augment as A
    from vit_spoof_detection_pda_tpu.ops.image import (denormalize,
                                                       normalize)

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.random((16, 16, 3)), jnp.float32)
    for f in (0.6, 1.0, 1.4):
        # brightness: f * x_n
        want = denormalize(normalize(x) * f)
        got = A.adjust_brightness_normdomain(x, f)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)
        # contrast: blend toward mean(gray(x_n))
        xn = normalize(x)
        w = jnp.asarray([0.2989, 0.587, 0.114])
        g = jnp.mean(jnp.sum(xn * w, axis=-1))
        want = denormalize(f * xn + (1 - f) * g)
        got = A.adjust_contrast_normdomain(x, f)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)
        # saturation: blend toward per-pixel gray(x_n)
        gpx = jnp.sum(xn * w, axis=-1, keepdims=True)
        want = denormalize(f * xn + (1 - f) * gpx)
        got = A.adjust_saturation_normdomain(x, f)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)
    # factor 1.0 is identity in every domain
    np.testing.assert_allclose(
        np.asarray(A.adjust_brightness_normdomain(x, 1.0)),
        np.asarray(x), atol=1e-6)
