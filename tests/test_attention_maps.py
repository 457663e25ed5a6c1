"""Attention-rollout explainability (analysis/attention_maps.py):
rollout math vs a hand-rolled oracle, the capture tap's parameter /
forward fidelity, overlay generation, and the CLI wiring."""

import json
import pathlib

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vit_spoof_detection_pda_tpu.analysis.attention_maps import (
    attention_rollout, capture_attention_probs, cls_patch_relevance,
    generate_attention_overlays)
from vit_spoof_detection_pda_tpu.models.vit import ViT, ViTAntiSpoof

SIZE = 32  # 32/16 -> 2x2 patch grid + CLS = 5 tokens


def _tiny(depth=3):
    m = ViTAntiSpoof(patch_size=16, embed_dim=64, depth=depth,
                     num_heads=2, hidden=16)
    variables = m.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, SIZE, SIZE, 3)))
    return m, variables


def _rand_probs(rng, b, h, t):
    """Random row-stochastic [b, h, t, t]."""
    a = rng.random((b, h, t, t))
    return a / a.sum(-1, keepdims=True)


def test_rollout_matches_hand_rolled_oracle():
    rng = np.random.default_rng(0)
    layers = [_rand_probs(rng, 2, 3, 5) for _ in range(4)]
    got = attention_rollout(layers)

    eye = np.eye(5)
    want = np.broadcast_to(eye, (2, 5, 5)).copy()
    for a in layers:                       # first layer innermost
        ah = a.mean(axis=1)
        ah = 0.5 * ah + 0.5 * eye
        ah = ah / ah.sum(-1, keepdims=True)
        want = ah @ want
    np.testing.assert_allclose(got, want, rtol=1e-12)
    # rollout rows stay stochastic (products of stochastic matrices)
    np.testing.assert_allclose(got.sum(-1), 1.0, rtol=1e-9)

    with pytest.raises(ValueError, match="at least one layer"):
        attention_rollout([])


def test_cls_patch_relevance_shape_and_normalization():
    rng = np.random.default_rng(1)
    layers = [_rand_probs(rng, 3, 2, 17) for _ in range(2)]  # 16 patches
    rel = cls_patch_relevance(layers)
    assert rel.shape == (3, 4, 4)
    np.testing.assert_allclose(rel.max(axis=(1, 2)), 1.0, rtol=1e-12)
    assert rel.min() >= 0

    with pytest.raises(ValueError, match="not square"):
        cls_patch_relevance([_rand_probs(rng, 1, 2, 7)])   # 6 patches


def test_capture_tap_preserves_params_and_forward():
    """The capture variant has the IDENTICAL parameter tree and (in f32)
    the same forward output — the tap only adds a sow."""
    m = ViTAntiSpoof(patch_size=16, embed_dim=64, depth=2, num_heads=2,
                     hidden=16, dtype=jnp.float32)
    variables = m.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, SIZE, SIZE, 3)))
    cap = m.clone(capture_attention=True)
    v2 = cap.init(jax.random.PRNGKey(0), jnp.zeros((1, SIZE, SIZE, 3)))
    assert (jax.tree_util.tree_structure(variables)
            == jax.tree_util.tree_structure(v2))

    x = jax.random.normal(jax.random.PRNGKey(3), (2, SIZE, SIZE, 3))
    plain = m.apply(variables, x)
    tapped, state = cap.apply(variables, x, mutable=["intermediates"])
    np.testing.assert_allclose(np.asarray(plain), np.asarray(tapped),
                               atol=1e-5)
    assert "intermediates" in state


def test_capture_attention_probs_layers_and_shapes():
    m, variables = _tiny(depth=3)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, SIZE, SIZE, 3))
    probs = capture_attention_probs(m, variables, x)
    assert len(probs) == 3
    for p in probs:
        assert p.shape == (2, 2, 5, 5)     # [B, H, T, T], T = 4 + CLS
        assert p.dtype == np.float32
        np.testing.assert_allclose(p.sum(-1), 1.0, atol=1e-5)

    # bare ViT works too (block{i} at the top level)
    vit = ViT(patch_size=16, embed_dim=64, depth=2, num_heads=2)
    vv = vit.init(jax.random.PRNGKey(0), jnp.zeros((1, SIZE, SIZE, 3)))
    probs2 = capture_attention_probs(vit, vv, x)
    assert len(probs2) == 2

    # a module without the flag raises the documented error
    class NoTap:
        def clone(self, **kw):
            raise TypeError("no field")
    with pytest.raises(ValueError, match="ViT family"):
        capture_attention_probs(NoTap(), {}, x)


def test_cls_patch_relevance_device_matches_host_path():
    """The jitted on-device rollout (one program, only the CLS row
    fetched — the relay-friendly path generate_attention_overlays now
    uses) must match the eager capture + f64 host rollout."""
    from vit_spoof_detection_pda_tpu.analysis.attention_maps import (
        cls_patch_relevance_device)

    m, variables = _tiny(depth=3)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, SIZE, SIZE, 3))
    probs = capture_attention_probs(m, variables, x)
    want = cls_patch_relevance(probs)
    got = cls_patch_relevance_device(m, variables, x)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_generate_attention_overlays_writes_pngs(tmp_path):
    from PIL import Image
    m, variables = _tiny(depth=2)
    rng = np.random.default_rng(5)
    paths = []
    for i in range(3):
        p = tmp_path / f"case{i}.png"
        Image.fromarray(rng.integers(0, 256, (40, 40, 3), np.uint8)
                        ).save(p)
        paths.append(p)
    out = generate_attention_overlays(
        m, variables, paths, str(tmp_path / "maps"), img_size=SIZE,
        batch_size=2, scores=[0.1, 0.5, 0.9])
    assert len(out["files"]) == 3
    for f in out["files"]:
        assert pathlib.Path(f).exists()
        assert f.endswith("_attn.png")


@pytest.mark.slow
def test_analyze_cli_attention_overlays(tmp_path):
    """CLI wiring: full-size registry ViT (random init), 2 images."""
    from PIL import Image

    from vit_spoof_detection_pda_tpu.cli.analyze import main

    img_dir = tmp_path / "failed"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        Image.fromarray(rng.integers(0, 256, (64, 64, 3), np.uint8)
                        ).save(img_dir / f"FP_{i}.jpg")
    results = tmp_path / "results"
    results.mkdir()
    main(["--results-dir", str(results),
          "--attention-overlays", str(img_dir)])
    maps = sorted((results / "attention_maps").glob("*_attn.png"))
    assert len(maps) == 2