"""Pallas scanline resample (ops/warp_pallas.py) vs the XLA roll
reference — interpret mode on CPU pins the two implementations
together (on real TPU hardware they measured bit-identical,
exp_r4_rolltower.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vit_spoof_detection_pda_tpu.ops import warp as W
from vit_spoof_detection_pda_tpu.ops.warp_pallas import (
    resample_cols_field_pallas, resample_rows_field_pallas)


def _img(seed=0, h=32, w=32, c=3):
    return jnp.asarray(
        np.random.default_rng(seed).random((h, w, c)).astype(np.float32))


def _field(seed, h, w, lim):
    return jnp.asarray(
        (np.random.default_rng(seed).random((h, w)) * 2 - 1)
        .astype(np.float32) * lim)


@pytest.mark.parametrize("kmax,lim", [(4, 3.5), (8, 7.9)])
def test_rows_pass_matches_xla(kmax, lim):
    img = _img(1)
    f = _field(2, 32, 32, lim)
    want = np.asarray(W._resample_rows_field(img, f, kmax))
    got = np.asarray(resample_rows_field_pallas(img, f, kmax,
                                                interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_cols_pass_matches_xla():
    img = _img(3)
    f = _field(4, 32, 32, 5.0)
    want = np.asarray(W._resample_cols_field(img, f, 6))
    got = np.asarray(resample_cols_field_pallas(img, f, 6,
                                                interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_zero_fill_outside_frame():
    """Shifts pushing past the frame must zero-fill exactly like the
    XLA path's validity mask (the sentinel-marking trick)."""
    img = _img(5, 16, 16)
    f = jnp.full((16, 16), 9.0)      # every src column out of frame
    out = np.asarray(resample_rows_field_pallas(img, f, 12,
                                                interpret=True))
    # columns whose src = x+9 > 15 must be exactly zero
    assert np.all(out[:, 7:] == 0.0)
    want = np.asarray(W._resample_rows_field(img, f, 12))
    np.testing.assert_allclose(out, want, atol=1e-6)


def test_identity_exact():
    img = _img(6)
    f = jnp.zeros((32, 32))
    out = np.asarray(resample_rows_field_pallas(img, f, 4,
                                                interpret=True))
    np.testing.assert_array_equal(out, np.asarray(img))


def test_vmap_batches():
    imgs = jnp.stack([_img(i) for i in range(4)])
    fs = jnp.stack([_field(10 + i, 32, 32, 3.0) for i in range(4)])
    got = np.asarray(jax.vmap(
        lambda im, f: resample_rows_field_pallas(im, f, 4,
                                                 interpret=True))(imgs, fs))
    for i in range(4):
        want = np.asarray(W._resample_rows_field(imgs[i], fs[i], 4))
        np.testing.assert_allclose(got[i], want, atol=1e-6)


def test_odd_height_pads_and_matches_xla():
    """Odd dims must not fall back to whole-image tiles (VMEM limit at
    real scale) — rows pad to 16 and slice back; vertical passes
    transpose, so odd width hits the same path."""
    img = _img(9, 31, 29)
    f = _field(10, 31, 29, 3.0)
    want = np.asarray(W._resample_rows_field(img, f, 4))
    got = np.asarray(resample_rows_field_pallas(img, f, 4,
                                                interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-6)
    got_c = np.asarray(resample_cols_field_pallas(img, f, 4,
                                                  interpret=True))
    want_c = np.asarray(W._resample_cols_field(img, f, 4))
    np.testing.assert_allclose(got_c, want_c, atol=1e-6)


def test_bf16_image_roundtrip():
    """bf16 images compute through the f32 kernel and cast back."""
    img = _img(7).astype(jnp.bfloat16)
    f = _field(8, 32, 32, 3.0)
    out = resample_rows_field_pallas(img, f, 4, interpret=True)
    assert out.dtype == jnp.bfloat16
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())
