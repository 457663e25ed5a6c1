"""Composed geometric warp vs the sequential per-op reference path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vit_spoof_detection_pda_tpu.ops import augment as A
from vit_spoof_detection_pda_tpu.ops import warp


def _img(seed=0, h=48, w=48):
    return np.random.default_rng(seed).random((h, w, 3)).astype(np.float32)


def test_identity_when_all_gated_off():
    img = _img()
    out = A.composed_geometric(
        jax.random.PRNGKey(0), img, hflip_p=0.0,
        rotation=(20.0, 0.0), perspective=(0.2, 0.0),
        elastic=(1.0, 32.0, 63, 0.0))
    # bf16 taps: identity up to the bf16 cast (~0.4% relative)
    np.testing.assert_allclose(np.asarray(out), img, atol=4e-3)


def test_flip_only_matches_reverse():
    img = _img(1)
    out = A.composed_geometric(jax.random.PRNGKey(3), img, hflip_p=1.0)
    # bernoulli(1.0) -> always flipped; exact integer coords reproduce the
    # mirror up to the bf16 tap cast
    np.testing.assert_allclose(np.asarray(out), img[:, ::-1], atol=4e-3)


def test_rotation_only_matches_sequential():
    """With only rotation active, the composed warp must equal the
    standalone rotation warp for the same angle."""
    img = _img(2)
    h, w = img.shape[:2]
    angle = 13.0
    m = warp.rotation_matrix(jnp.deg2rad(jnp.float32(angle)),
                             (h - 1) / 2, (w - 1) / 2)
    want = np.asarray(warp.affine_warp(jnp.asarray(img), m))

    # drive composed with a key whose uniform(-20,20) we bypass by using
    # the coordinate path directly: rotation=(angle, 1.0) with degenerate
    # range [angle, angle] is not expressible, so check statistically via
    # the same transform math instead:
    ys, xs = warp._dest_grid(h, w)
    xs2 = m[0, 0] * xs + m[0, 1] * ys + m[0, 2]
    ys2 = m[1, 0] * xs + m[1, 1] * ys + m[1, 2]
    got = np.asarray(warp.bilinear_sample(jnp.asarray(img), ys2, xs2))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_composed_distribution_changes_image():
    img = _img(3)
    out = np.asarray(A.composed_geometric(
        jax.random.PRNGKey(1), img, hflip_p=0.5, rotation=(20.0, 1.0),
        perspective=(0.2, 1.0), elastic=(1.0, 32.0, 63, 1.0)))
    assert out.shape == img.shape
    assert not np.allclose(out, img)
    assert out.min() >= -1e-5 and out.max() <= 1 + 1e-5


def test_composed_deterministic_per_key():
    img = _img(4)
    f = lambda k: np.asarray(A.composed_geometric(
        k, img, hflip_p=0.5, rotation=(15.0, 0.6), perspective=(0.15, 0.3)))
    np.testing.assert_array_equal(f(jax.random.PRNGKey(5)),
                                  f(jax.random.PRNGKey(5)))
    assert not np.array_equal(f(jax.random.PRNGKey(5)),
                              f(jax.random.PRNGKey(6)))


@pytest.mark.slow
def test_chains_still_batch_compile():
    from vit_spoof_detection_pda_tpu.augment import make_batch_augmenter
    batch = jnp.asarray(np.stack([_img(i, 32, 32) for i in range(4)]))
    for level in ("heavy", "medium", "light"):
        aug = make_batch_augmenter(level)
        out = np.asarray(aug(jax.random.PRNGKey(0), batch))
        assert out.shape == batch.shape
        assert np.isfinite(out).all()


def test_packed_sampler_never_extrapolates():
    """Border coords within 1px outside the frame must edge-clamp, not
    linearly extrapolate out of the value range (review finding)."""
    img = _img(9, 8, 8)
    ys, xs = warp._dest_grid(8, 8)
    out = np.asarray(warp.bilinear_sample_packed(
        jnp.asarray(img), ys + 0.7, xs + 0.7))   # pushes past last row/col
    assert out.min() >= -1e-6 and out.max() <= 1 + 1e-6
    out2 = np.asarray(warp.bilinear_sample_packed(
        jnp.asarray(img), ys - 0.7, xs - 0.7))
    assert out2.min() >= -1e-6 and out2.max() <= 1 + 1e-6


def test_shear_rotation_identity_at_zero():
    """theta = 0 through the 3-shear path is the exact identity."""
    img = _img(10)
    out = np.asarray(warp.rotate_3shear(jnp.asarray(img),
                                        jnp.float32(0.0), 10.0))
    np.testing.assert_array_equal(out, img)


def test_shear_rotation_matches_direct_warp_on_smooth_image():
    """On a smooth image the 3-shear rotation must agree with the direct
    bilinear affine warp (different resampling, same transform)."""
    h = w = 64
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.stack([ys / h, xs / w, (ys + xs) / (h + w)], -1)
    angle = np.float32(np.deg2rad(8.0))
    m = warp.rotation_matrix(jnp.asarray(angle), (h - 1) / 2, (w - 1) / 2)
    want = np.asarray(warp.affine_warp(jnp.asarray(img), m))
    got = np.asarray(warp.rotate_3shear(jnp.asarray(img),
                                        jnp.asarray(angle), 10.0))
    interior = (slice(12, -12), slice(12, -12))
    np.testing.assert_allclose(got[interior], want[interior], atol=0.02)
    # zero-fill corners match too (both pad with 0 outside the frame)
    assert got[0, 0].max() == 0.0 and want[0, 0].max() == 0.0


def _smooth_img(seed=0, h=96, w=96):
    """Low-frequency image (PSNR comparisons need content below the
    resampler Nyquist, like real faces)."""
    rng = np.random.default_rng(seed)
    base = rng.random((6, 6, 3)).astype(np.float32)
    ys = np.linspace(0, 5, h)
    xs = np.linspace(0, 5, w)
    i0 = np.clip(ys.astype(int), 0, 4)
    j0 = np.clip(xs.astype(int), 0, 4)
    fy = (ys - i0)[:, None, None]
    fx = (xs - j0)[None, :, None]
    a = base[i0][:, j0] * (1 - fy) * (1 - fx) + base[i0 + 1][:, j0] * fy * (1 - fx) \
        + base[i0][:, j0 + 1] * (1 - fy) * fx + base[i0 + 1][:, j0 + 1] * fy * fx
    return a.astype(np.float32)


def _psnr(a, b, crop):
    a = np.asarray(a, np.float32)[crop:-crop, crop:-crop]
    b = np.asarray(b, np.float32)[crop:-crop, crop:-crop]
    return 10 * np.log10(1.0 / max(np.mean((a - b) ** 2), 1e-12))


def test_perspective_2pass_matches_single_bilinear():
    """The exact two-pass decomposition agrees with the one-gather
    perspective warp to interpolation-order accuracy (>40 dB interior
    on a smooth image at the heavy tier's distortion)."""
    img = jnp.asarray(_smooth_img(1))
    h, w = img.shape[:2]
    rng = np.random.default_rng(2)
    for trial in range(3):
        off = rng.random((4, 2))
        dst = np.asarray([[0., 0.], [w - 1, 0.], [w - 1, h - 1],
                          [0., h - 1]])
        inward = np.asarray([[1., 1.], [-1., 1.], [-1., -1.], [1., -1.]])
        src = dst + off * np.asarray([0.2 * (w - 1) / 2,
                                      0.2 * (h - 1) / 2]) * inward
        hm = warp.homography_from_points(jnp.asarray(src),
                                         jnp.asarray(dst))
        want = warp.perspective_warp(img, hm)
        got = warp.perspective_warp_2pass(
            img, hm, kmax=A._perspective_kmax(0.2, max(h, w)))
        assert _psnr(got, want, crop=16) > 40, trial


def test_elastic_2pass_matches_displacement_warp():
    img = jnp.asarray(_smooth_img(3))
    h, w = img.shape[:2]
    kern = A._gaussian_kernel1d(33, 16.0, jnp.float32)
    nx = jax.random.uniform(jax.random.PRNGKey(4), (h, w), jnp.float32,
                            -1, 1)
    ny = jax.random.uniform(jax.random.PRNGKey(5), (h, w), jnp.float32,
                            -1, 1)
    dx = A._separable_blur2d(nx[..., None], kern)[..., 0] * (w / 2)
    dy = A._separable_blur2d(ny[..., None], kern)[..., 0] * (h / 2)
    want = warp.displacement_warp(img, dy, dx)
    got = warp.displacement_warp_2pass(
        img, dy, dx, kmax=A._elastic_kmax(1.0, 16.0, 33, max(h, w)))
    assert _psnr(got, want, crop=12) > 40


def test_perspective_kmax_bounds_shift_fields():
    """200 random heavy-tier homographies: unclamped shift fields stay
    under the static roll bound (the clamp must never engage)."""
    h = w = 224
    kmax = A._perspective_kmax(0.2, 224)
    rng = np.random.default_rng(6)
    dst = np.asarray([[0., 0.], [w - 1, 0.], [w - 1, h - 1], [0., h - 1]])
    inward = np.asarray([[1., 1.], [-1., 1.], [-1., -1.], [1., -1.]])

    @jax.jit
    def max_shift(off):
        src = (jnp.asarray(dst) + off
               * jnp.asarray([0.2 * (w - 1) / 2, 0.2 * (h - 1) / 2])
               * jnp.asarray(inward))
        hm = warp.homography_from_points(src, jnp.asarray(dst))
        fh, fv = warp.perspective_shift_fields(hm, h, w)
        return jnp.maximum(jnp.abs(fh).max(), jnp.abs(fv).max())

    worst = max(float(max_shift(jnp.asarray(rng.random((4, 2)))))
                for _ in range(200))
    assert worst < kmax - 1, (worst, kmax)


def test_tower_matches_gather_sampler_full_chain():
    """Same key -> same sampled warp parameters through both samplers;
    on a smooth image the gather-free tower must agree with the packed
    single-gather warp to interpolation tolerance."""
    img = _smooth_img(7)
    for seed in range(3):
        k = jax.random.PRNGKey(seed)
        kw = dict(hflip_p=0.5, rotation=(20.0, 0.7),
                  perspective=(0.2, 0.4), elastic=(1.0, 32.0, 63, 0.3))
        tower = A.composed_geometric(k, jnp.asarray(img),
                                     sampler="tower", **kw)
        gather = A.composed_geometric(k, jnp.asarray(img),
                                      sampler="gather", **kw)
        assert _psnr(tower, gather, crop=30) > 32, seed


def test_tower_identity_when_all_gated_off_exact():
    """Unlike the bf16-tap gather path, the tower's identity is EXACT
    (0-shift rolls select the untouched source)."""
    img = _img(12)
    out = A.composed_geometric(
        jax.random.PRNGKey(0), img, hflip_p=0.0,
        rotation=(20.0, 0.0), perspective=(0.2, 0.0),
        elastic=(1.0, 32.0, 63, 0.0))
    np.testing.assert_array_equal(np.asarray(out), img)


def test_tower_preserves_bf16_dtype():
    """The bf16 aug policy flows through the tower (the gather sampler
    promoted to f32, hiding bf16 bugs downstream)."""
    img = jnp.asarray(_img(13), jnp.bfloat16)
    out = A.composed_geometric(
        jax.random.PRNGKey(1), img, hflip_p=0.5, rotation=(15.0, 0.6),
        perspective=(0.15, 0.3))
    assert out.dtype == jnp.bfloat16


def test_affine_fast_path_flip_exact():
    """Flip through the affine-only fast path is an exact reverse (no
    resampling, no tap cast)."""
    img = _img(11)
    out = A.composed_geometric(jax.random.PRNGKey(3), img, hflip_p=1.0,
                               rotation=(10.0, 0.0))
    np.testing.assert_array_equal(np.asarray(out), img[:, ::-1])
