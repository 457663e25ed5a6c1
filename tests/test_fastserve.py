"""Serving fast path (models/fastserve.py + fused_attention_block): must
reproduce the flax module forward."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vit_spoof_detection_pda_tpu.models.fastserve import serving_forward
from vit_spoof_detection_pda_tpu.models.vit import (ViTAntiSpoof,
                                                    fold_normalization)
from vit_spoof_detection_pda_tpu.ops import attention as att
from vit_spoof_detection_pda_tpu.ops import image as I


def test_fused_attention_block_matches_composed():
    """LN+qkv+attention+proj+residual kernel == the step-by-step jnp
    composition."""
    rng = np.random.default_rng(0)
    b, t, d, heads = 2, 33, 64, 4
    x = jnp.asarray(rng.standard_normal((b, t, d)), jnp.float32)
    lns = jnp.asarray(rng.standard_normal(d), jnp.float32) * 0.1 + 1.0
    lnb = jnp.asarray(rng.standard_normal(d), jnp.float32) * 0.1
    wqkv = jnp.asarray(rng.standard_normal((d, 3 * d)) * 0.05, jnp.float32)
    bqkv = jnp.asarray(rng.standard_normal(3 * d) * 0.05, jnp.float32)
    wproj = jnp.asarray(rng.standard_normal((d, d)) * 0.05, jnp.float32)
    bproj = jnp.asarray(rng.standard_normal(d) * 0.05, jnp.float32)

    got = np.asarray(att.fused_attention_block(
        x, lns, lnb, wqkv, bqkv, wproj, bproj, heads, interpret=True))

    x32 = np.asarray(x, np.float64)
    mu = x32.mean(-1, keepdims=True)
    var = ((x32 - mu) ** 2).mean(-1, keepdims=True)
    xn = (x32 - mu) / np.sqrt(var + 1e-6) * np.asarray(lns) + np.asarray(lnb)
    qkv = xn @ np.asarray(wqkv) + np.asarray(bqkv)
    dh = d // heads
    outs = np.zeros((b, t, d))
    for h in range(heads):
        q = qkv[:, :, h * dh:(h + 1) * dh]
        k = qkv[:, :, d + h * dh:d + (h + 1) * dh]
        v = qkv[:, :, 2 * d + h * dh:2 * d + (h + 1) * dh]
        logits = (q @ k.transpose(0, 2, 1)) * dh ** -0.5
        w = np.exp(logits - logits.max(-1, keepdims=True))
        w = w / w.sum(-1, keepdims=True)
        outs[:, :, h * dh:(h + 1) * dh] = w @ v
    want = x32 + outs @ np.asarray(wproj) + np.asarray(bproj)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_serving_forward_matches_module():
    """serving_forward == ViTAntiSpoof(gelu='tanh') forward on folded
    params + raw uint8 input (f32 for a tight bound)."""
    m = ViTAntiSpoof(patch_size=16, embed_dim=64, depth=2, num_heads=2,
                     hidden=16, gelu="tanh")
    variables = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    folded = fold_normalization(variables)
    u8 = jnp.asarray(np.random.default_rng(1).integers(
        0, 256, (4, 32, 32, 3), dtype=np.uint8))

    logits = m.apply(folded, u8.astype(jnp.float32))
    want = np.asarray(jax.nn.sigmoid(logits[:, 1] - logits[:, 0]))
    got = np.asarray(serving_forward(
        folded["params"], u8, num_heads=2, depth=2, dtype=jnp.float32,
        interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_serving_forward_scores_in_range():
    m = ViTAntiSpoof(patch_size=16, embed_dim=64, depth=1, num_heads=2,
                     hidden=16)
    variables = m.init(jax.random.PRNGKey(2), jnp.zeros((1, 32, 32, 3)))
    folded = fold_normalization(variables)
    u8 = jnp.asarray(np.random.default_rng(3).integers(
        0, 256, (2, 32, 32, 3), dtype=np.uint8))
    s = np.asarray(serving_forward(folded["params"], u8, num_heads=2,
                                   depth=1, dtype=jnp.bfloat16,
                                   interpret=True), np.float32)
    assert np.all((s >= 0) & (s <= 1))


def test_fused_mlp_block_matches_composed():
    rng = np.random.default_rng(5)
    b, t, d, hid = 2, 33, 64, 256
    x = jnp.asarray(rng.standard_normal((b, t, d)), jnp.float32)
    lns = jnp.asarray(rng.standard_normal(d) * 0.1 + 1.0, jnp.float32)
    lnb = jnp.asarray(rng.standard_normal(d) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((d, hid)) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(hid) * 0.05, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((hid, d)) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(d) * 0.05, jnp.float32)

    got = np.asarray(att.fused_mlp_block(x, lns, lnb, w1, b1, w2, b2,
                                         interpret=True))
    x32 = np.asarray(x, np.float64)
    mu = x32.mean(-1, keepdims=True)
    var = ((x32 - mu) ** 2).mean(-1, keepdims=True)
    xn = (x32 - mu) / np.sqrt(var + 1e-6) * np.asarray(lns) + np.asarray(lnb)
    import jax.nn as jnn
    hdn = np.asarray(jnn.gelu(jnp.asarray(xn @ np.asarray(w1)
                                          + np.asarray(b1)),
                              approximate=True))
    want = x32 + hdn @ np.asarray(w2) + np.asarray(b2)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_serving_forward_fuse_mlp_paths_agree():
    m = ViTAntiSpoof(patch_size=16, embed_dim=64, depth=2, num_heads=2,
                     hidden=16, gelu="tanh")
    variables = m.init(jax.random.PRNGKey(4), jnp.zeros((1, 32, 32, 3)))
    folded = fold_normalization(variables)
    u8 = jnp.asarray(np.random.default_rng(6).integers(
        0, 256, (4, 32, 32, 3), dtype=np.uint8))
    a = np.asarray(serving_forward(folded["params"], u8, num_heads=2,
                                   depth=2, dtype=jnp.float32,
                                   fuse_mlp=True, interpret=True))
    bfs = np.asarray(serving_forward(folded["params"], u8, num_heads=2,
                                     depth=2, dtype=jnp.float32,
                                     fuse_mlp=False, interpret=True))
    np.testing.assert_allclose(a, bfs, atol=2e-5, rtol=1e-5)


def test_fused_mlp_block_multi_tile_grid():
    """rows > m_tile exercises the flat kernel's multi-program grid and
    tail padding (rows=330, m_tile=128 -> grid 3 with 54 pad rows)."""
    rng = np.random.default_rng(7)
    b, t, d, hid = 10, 33, 64, 128
    x = jnp.asarray(rng.standard_normal((b, t, d)), jnp.float32)
    lns = jnp.asarray(rng.standard_normal(d) * 0.1 + 1.0, jnp.float32)
    lnb = jnp.asarray(rng.standard_normal(d) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((d, hid)) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(hid) * 0.05, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((hid, d)) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(d) * 0.05, jnp.float32)

    got = np.asarray(att.fused_mlp_block(x, lns, lnb, w1, b1, w2, b2,
                                         m_tile=128, interpret=True))
    want = np.asarray(att.fused_mlp_block(x, lns, lnb, w1, b1, w2, b2,
                                          m_tile=512, interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)
    assert got.shape == (b, t, d)


def test_serving_forward_sharded_matches_single():
    """shard_map DP serving == single-device serving on the virtual mesh."""
    from vit_spoof_detection_pda_tpu.models.fastserve import (
        serving_forward_sharded)
    from vit_spoof_detection_pda_tpu.parallel.mesh import make_mesh

    if jax.device_count() < 4:
        pytest.skip("needs >=4 virtual devices")
    m = ViTAntiSpoof(patch_size=16, embed_dim=64, depth=2, num_heads=2,
                     hidden=16, gelu="tanh")
    variables = m.init(jax.random.PRNGKey(8), jnp.zeros((1, 32, 32, 3)))
    folded = fold_normalization(variables)
    u8 = jnp.asarray(np.random.default_rng(9).integers(
        0, 256, (8, 32, 32, 3), dtype=np.uint8))
    mesh = make_mesh(data=4, model=1, devices=jax.devices()[:4])
    kw = dict(num_heads=2, depth=2, dtype=jnp.float32, interpret=True)
    got = np.asarray(serving_forward_sharded(folded["params"], u8, mesh,
                                             **kw))
    want = np.asarray(serving_forward(folded["params"], u8, **kw))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)

    with pytest.raises(ValueError):
        serving_forward_sharded(folded["params"], u8[:6], mesh, **kw)


class _TinyLinearViT:
    """ViTLinearHead's param-tree shape at test scale (the real module
    is pinned to ViT-B/16; serving_forward_linear takes the geometry
    explicitly so it can be oracle-tested small)."""

    def __new__(cls):
        import flax.linen as nn

        from vit_spoof_detection_pda_tpu.models.vit import ViT

        class M(nn.Module):
            @nn.compact
            def __call__(self, x):
                feats = ViT(patch_size=16, embed_dim=64, depth=2,
                            num_heads=2, norm_eps=1e-12, gelu="tanh",
                            name="vit")(x)
                return nn.Dense(2, dtype=jnp.float32,
                                name="classifier")(
                    feats.astype(jnp.float32))

        return M()


def test_serving_forward_linear_matches_module():
    """serving_forward_linear == linear-head module forward (softmax
    probs) on folded params + raw uint8 input (f32 tight bound)."""
    from vit_spoof_detection_pda_tpu.models.fastserve import (
        serving_forward_linear)

    m = _TinyLinearViT()
    variables = m.init(jax.random.PRNGKey(3), jnp.zeros((1, 32, 32, 3)))
    folded = fold_normalization(variables)
    u8 = jnp.asarray(np.random.default_rng(4).integers(
        0, 256, (4, 32, 32, 3), dtype=np.uint8))

    logits = m.apply(folded, u8.astype(jnp.float32))
    want = np.asarray(jax.nn.softmax(logits, axis=-1))
    got = np.asarray(serving_forward_linear(
        folded["params"], u8, num_heads=2, depth=2, dtype=jnp.float32,
        interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(got.sum(axis=-1), 1.0, atol=1e-6)


def test_serving_forward_linear_sharded_matches_single():
    """The generalized sharded dispatch runs the linear-head forward
    over the data axis unchanged."""
    from vit_spoof_detection_pda_tpu.models.fastserve import (
        serving_forward_linear, serving_forward_sharded)
    from vit_spoof_detection_pda_tpu.parallel.mesh import make_mesh

    if jax.device_count() < 4:
        pytest.skip("needs >=4 virtual devices")
    m = _TinyLinearViT()
    variables = m.init(jax.random.PRNGKey(5), jnp.zeros((1, 32, 32, 3)))
    folded = fold_normalization(variables)
    u8 = jnp.asarray(np.random.default_rng(6).integers(
        0, 256, (8, 32, 32, 3), dtype=np.uint8))
    mesh = make_mesh(data=4, model=1, devices=jax.devices()[:4])
    kw = dict(num_heads=2, depth=2, dtype=jnp.float32, interpret=True)
    got = np.asarray(serving_forward_sharded(
        folded["params"], u8, mesh, fn=serving_forward_linear, **kw))
    want = np.asarray(serving_forward_linear(folded["params"], u8, **kw))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


def test_make_fastserve_infer_model_routing():
    """ViTLinearHead is accepted (Base-ViT ablation rides the fused
    trunk); non-ViT models are rejected before any compile."""
    from vit_spoof_detection_pda_tpu.eval.runner import make_fastserve_infer
    from vit_spoof_detection_pda_tpu.models.resnet import ResNet50

    with pytest.raises(TypeError, match="ViTLinearHead"):
        make_fastserve_infer(ResNet50(), {"params": {}}, interpret=True)


def test_make_serving_fn_regime_map_and_parity():
    """The serving factory routes B=1 -> lowlat, 2..15 -> batch-grid,
    >=16 -> fastserve (the measured regime winners, BENCH_NOTES rounds
    7-9) and every route scores like serving_forward."""
    from vit_spoof_detection_pda_tpu.models.fastserve import (
        make_serving_fn, serving_forward)

    m = ViTAntiSpoof(patch_size=4, embed_dim=64, depth=2, num_heads=2,
                     hidden=16, gelu="tanh")
    variables = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    folded = fold_normalization(variables)
    rng = np.random.default_rng(0)

    from vit_spoof_detection_pda_tpu.models.fastserve import (
        auto_serving_mode)

    # the measured regime table itself (BENCH_NOTES round 12)
    assert auto_serving_mode(1) == "lowlat"
    assert auto_serving_mode(2) == "batch_grid"
    assert auto_serving_mode(16) == "batch_grid"
    assert auto_serving_mode(17) == "fastserve"
    assert auto_serving_mode(128) == "fastserve"
    with pytest.raises(ValueError, match="batch_size"):
        auto_serving_mode(0)

    for bs, want_mode in [(1, "lowlat"), (3, "batch_grid"),
                          (17, "fastserve")]:
        u8 = jnp.asarray(rng.integers(0, 256, (bs, 32, 32, 3),
                                      dtype=np.uint8))
        fn = make_serving_fn(m, variables, batch_size=bs,
                             dtype=jnp.float32, interpret=True)
        got = np.asarray(fn(u8))
        want = np.asarray(serving_forward(
            folded["params"], u8, num_heads=2, depth=2, patch_size=4,
            dtype=jnp.float32, interpret=True))
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4,
                                   err_msg=f"bs={bs} ({want_mode})")
        # explicit override takes the named path
        fn2 = make_serving_fn(m, variables, batch_size=bs,
                              mode=want_mode, dtype=jnp.float32,
                              interpret=True)
        np.testing.assert_allclose(np.asarray(fn2(u8)), want, atol=2e-4,
                                   rtol=1e-4)

    with pytest.raises(ValueError, match="unknown serving mode"):
        make_serving_fn(m, variables, batch_size=4, mode="nope",
                        interpret=True)
    from vit_spoof_detection_pda_tpu.models.vit import ViTLinearHead
    with pytest.raises(TypeError, match="anti-spoof"):
        make_serving_fn(ViTLinearHead(), variables, batch_size=4,
                        interpret=True)
    if jax.default_backend() != "tpu":
        with pytest.raises(RuntimeError, match="interpret"):
            make_serving_fn(m, variables, batch_size=4)


def test_make_serving_fn_int8_weights():
    """int8_weights rides the lowlat route only: quantized scores track
    the full-precision ones within the weight-quantization envelope, and
    the batch-amortized modes reject the flag before any packing."""
    from vit_spoof_detection_pda_tpu.models.fastserve import (
        make_serving_fn, serving_program)

    m = ViTAntiSpoof(patch_size=4, embed_dim=64, depth=2, num_heads=2,
                     hidden=16, gelu="tanh")
    variables = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    rng = np.random.default_rng(1)
    u8 = jnp.asarray(rng.integers(0, 256, (1, 32, 32, 3), dtype=np.uint8))

    base = make_serving_fn(m, variables, batch_size=1, dtype=jnp.float32,
                           interpret=True)
    quant = make_serving_fn(m, variables, batch_size=1, dtype=jnp.float32,
                            int8_weights=True, interpret=True)
    b, q = np.asarray(base(u8)), np.asarray(quant(u8))
    assert np.all((q >= 0) & (q <= 1))
    np.testing.assert_allclose(q, b, atol=0.05)   # quantization noise

    weights, _, _ = serving_program(m, variables, mode="lowlat",
                                    int8_weights=True)
    assert weights["packed_w"].dtype == jnp.int8

    for mode in ("batch_grid", "fastserve"):
        with pytest.raises(ValueError, match="int8_weights"):
            make_serving_fn(m, variables, batch_size=4, mode=mode,
                            int8_weights=True, interpret=True)
