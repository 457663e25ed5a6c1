"""Fast-NLM denoise: formula check vs a naive O(N * S^2 * P^2) numpy
reference, and denoising efficacy (PSNR gain on noisy images)."""

import numpy as np
import pytest

import jax.numpy as jnp

from vit_spoof_detection_pda_tpu.ops.nlm import fast_nlm_denoise
from vit_spoof_detection_pda_tpu.ops.image import preprocess_eval


def _naive_nlm(img, h, sigma, r, f):
    """Direct per-pixel implementation of the same weighting."""
    H, W, C = img.shape
    patch_n = (2 * f + 1) ** 2
    pad = np.pad(img, ((f, f), (f, f), (0, 0)), mode="edge")

    def patch_d2(y0, x0, y1, x1):
        p0 = pad[y0:y0 + 2 * f + 1, x0:x0 + 2 * f + 1]
        p1 = pad[y1:y1 + 2 * f + 1, x1:x1 + 2 * f + 1]
        return ((p0 - p1) ** 2).sum() / (patch_n * C)

    out = np.zeros_like(img)
    for y in range(H):
        for x in range(W):
            acc = np.zeros(C)
            ws = 0.0
            for dy in range(-r, r + 1):
                for dx in range(-r, r + 1):
                    yy, xx = y + dy, x + dx
                    if not (0 <= yy < H and 0 <= xx < W):
                        continue
                    d2 = patch_d2(y, x, yy, xx)
                    w = np.exp(-max(d2 - 2 * sigma ** 2, 0.0) / h ** 2)
                    acc += w * img[yy, xx]
                    ws += w
            out[y, x] = acc / ws
    return out


def test_matches_naive_reference():
    rng = np.random.default_rng(0)
    img = rng.random((10, 12, 3)).astype(np.float32)
    got = np.asarray(fast_nlm_denoise(jnp.asarray(img), h=0.2, sigma=0.05,
                                      search_radius=2, patch_radius=1))
    want = _naive_nlm(img, 0.2, 0.05, 2, 1)
    # border conventions differ (edge-clamped neighbors vs skipped);
    # interior by search_radius + patch_radius must match exactly
    np.testing.assert_allclose(got[3:-3, 3:-3], want[3:-3, 3:-3],
                               atol=1e-4)


def test_denoises_noisy_image():
    rng = np.random.default_rng(1)
    # piecewise-constant clean image
    clean = np.zeros((32, 32, 3), np.float32)
    clean[:16] = 0.25
    clean[16:] = 0.75
    noisy = np.clip(clean + rng.normal(0, 0.08, clean.shape), 0, 1
                    ).astype(np.float32)
    den = np.asarray(fast_nlm_denoise(jnp.asarray(noisy), h=0.15,
                                      sigma=0.08))
    mse_before = ((noisy - clean) ** 2).mean()
    mse_after = ((den - clean) ** 2).mean()
    assert mse_after < mse_before * 0.35, (mse_before, mse_after)


def test_batched_and_preprocess_integration():
    rng = np.random.default_rng(2)
    batch = rng.random((2, 16, 16, 3)).astype(np.float32)
    out = np.asarray(fast_nlm_denoise(jnp.asarray(batch)))
    assert out.shape == batch.shape
    # the optional denoise stage of eval preprocessing runs
    u8 = (batch * 255).astype(np.uint8)
    pre = preprocess_eval(jnp.asarray(u8), size=16, denoise=True)
    assert pre.shape == (2, 16, 16, 3)
    assert np.isfinite(np.asarray(pre)).all()


def test_pallas_kernel_matches_xla(monkeypatch):
    """Pallas NLM (interpret mode) must match the XLA implementation."""
    from vit_spoof_detection_pda_tpu.ops.nlm_pallas import nlm_denoise_pallas
    rng = np.random.default_rng(3)
    img = rng.random((12, 14, 3)).astype(np.float32)
    want = np.asarray(fast_nlm_denoise(
        jnp.asarray(img), h=0.2, sigma=0.05, search_radius=2,
        patch_radius=1, use_pallas=False))
    got = np.asarray(nlm_denoise_pallas(
        jnp.asarray(img), h=0.2, sigma=0.05, search_radius=2,
        patch_radius=1, interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-4)
    # batched
    batch = rng.random((2, 12, 14, 3)).astype(np.float32)
    wantb = np.asarray(fast_nlm_denoise(
        jnp.asarray(batch), h=0.2, sigma=0.05, search_radius=2,
        patch_radius=1, use_pallas=False))
    gotb = np.asarray(nlm_denoise_pallas(
        jnp.asarray(batch), h=0.2, sigma=0.05, search_radius=2,
        patch_radius=1, interpret=True))
    np.testing.assert_allclose(gotb, wantb, atol=1e-4)
