"""Single-kernel latency serving path (ops/lowlat.py +
models/fastserve.py::serving_forward_lowlat): must reproduce
serving_forward (and therefore the flax module) — same math, one
pallas_call for the whole encoder."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vit_spoof_detection_pda_tpu.models.fastserve import (
    prepare_lowlat, serving_forward, serving_forward_lowlat)
from vit_spoof_detection_pda_tpu.models.vit import (ViTAntiSpoof,
                                                    fold_normalization)
from vit_spoof_detection_pda_tpu.ops.lowlat import (pack_encoder_weights,
                                                    pack_end_weights)


def _small(depth=2, heads=2):
    m = ViTAntiSpoof(patch_size=16, embed_dim=64, depth=depth,
                     num_heads=heads, hidden=16, gelu="tanh")
    variables = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    return m, fold_normalization(variables)


def _small_foldable(depth=2, heads=2):
    """patch_dim == embed_dim (4*4*3 == 48) so the fold-ends packs apply
    — the ViT-B/16 property (16*16*3 == 768) at test scale."""
    m = ViTAntiSpoof(patch_size=4, embed_dim=48, depth=depth,
                     num_heads=heads, hidden=16, gelu="tanh")
    variables = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
    return m, fold_normalization(variables)


def test_pack_encoder_weights_layout():
    _, folded = _small()
    vit = folded["params"]["vit"]
    w, s = pack_encoder_weights(vit, depth=2, dtype=jnp.float32)
    d, hidden = 64, 256
    assert w.shape == (6, d, hidden) and s.shape == (6, 4, hidden)
    blk = vit["block0"]
    np.testing.assert_array_equal(w[0, :, :3 * d],
                                  blk["attn"]["qkv"]["kernel"])
    np.testing.assert_array_equal(w[0, :, 3 * d:],
                                  blk["attn"]["proj"]["kernel"])
    np.testing.assert_array_equal(w[1], blk["mlp"]["fc1"]["kernel"])
    fc2 = np.asarray(blk["mlp"]["fc2"]["kernel"])
    for c in range(hidden // d):
        np.testing.assert_array_equal(w[2, :, c * d:(c + 1) * d],
                                      fc2[c * d:(c + 1) * d, :])
    np.testing.assert_array_equal(s[0, 2, :3 * d],
                                  blk["attn"]["qkv"]["bias"])
    np.testing.assert_array_equal(s[2, 0, :d], blk["mlp"]["fc2"]["bias"])


def test_pack_rejects_non_4x_mlp():
    _, folded = _small()
    vit = dict(folded["params"]["vit"])
    blk = jax.tree.map(lambda x: x, vit["block0"])
    blk["mlp"] = dict(blk["mlp"])
    blk["mlp"]["fc1"] = {"kernel": jnp.zeros((64, 128)),
                         "bias": jnp.zeros(128)}
    vit["block0"] = blk
    with pytest.raises(ValueError, match="4\\*embed"):
        pack_encoder_weights(vit, depth=2)


@pytest.mark.parametrize("batch", [1, 3])
def test_lowlat_matches_serving_forward_f32(batch):
    """f32 end-to-end: the single-kernel path equals the per-layer
    fastserve path to accumulation-order tolerance."""
    _, folded = _small(depth=2, heads=2)
    u8 = jnp.asarray(np.random.default_rng(1).integers(
        0, 256, (batch, 32, 32, 3), dtype=np.uint8))
    want = np.asarray(serving_forward(
        folded["params"], u8, num_heads=2, depth=2, dtype=jnp.float32,
        interpret=True))
    prepared = prepare_lowlat(folded["params"], depth=2,
                              dtype=jnp.float32)
    got = np.asarray(serving_forward_lowlat(
        prepared, u8, num_heads=2, dtype=jnp.float32, interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_pack_end_weights_layout():
    _, folded = _small_foldable()
    params = folded["params"]
    w, s, aux = pack_end_weights(params, dtype=jnp.float32)
    d, hidden, hh = 48, 192, 16
    assert w.shape == (1, d, d + hh) and s.shape == (1, 4, hidden)
    assert aux.shape == (1, 8, d)
    vit, head = params["vit"], params["head"]
    np.testing.assert_array_equal(w[0, :, :d],
                                  vit["patch_embed"]["kernel"])
    np.testing.assert_array_equal(w[0, :, d:d + hh],
                                  head["fc1"]["kernel"])
    np.testing.assert_array_equal(s[0, 0, :d], vit["norm"]["scale"])
    np.testing.assert_array_equal(s[0, 0, d:2 * d], head["norm"]["scale"])
    np.testing.assert_array_equal(s[0, 2, :hh], head["fc1"]["bias"])
    np.testing.assert_array_equal(s[0, 0, 2 * d:2 * d + hh],
                                  head["fc2"]["kernel"][:, 0])
    np.testing.assert_array_equal(s[0, 3, :2], head["fc2"]["bias"])
    pos = np.asarray(vit["pos_embed"], np.float32).reshape(-1, d)
    np.testing.assert_allclose(
        aux[0, 0], pos[0] + np.asarray(vit["cls_token"],
                                       np.float32).reshape(d), rtol=1e-6)
    np.testing.assert_allclose(
        aux[0, 1:5],
        pos[1:] + np.asarray(vit["patch_embed"]["bias"], np.float32),
        rtol=1e-6)
    np.testing.assert_array_equal(aux[0, 5:], 0.0)


def test_pack_end_weights_rejects_mismatched_patch_dim():
    _, folded = _small()   # patch_dim 768 != embed 64
    with pytest.raises(ValueError, match="patch_dim"):
        pack_end_weights(folded["params"])


def test_prepare_lowlat_fold_fallback():
    """Shapes that can't ride the superblock silently drop to the
    encoder-only kernel (no fold packs in the prepared dict)."""
    _, folded = _small()
    prepared = prepare_lowlat(folded["params"], depth=2)
    assert "aux" not in prepared
    assert prepared["packed_w"].shape[0] == 6


@pytest.mark.parametrize("batch", [1, 3])
def test_lowlat_e2e_matches_serving_forward_f32(batch):
    """fold-ends single-kernel image->score equals the per-layer
    fastserve path to accumulation-order tolerance (f32)."""
    _, folded = _small_foldable(depth=2, heads=2)
    u8 = jnp.asarray(np.random.default_rng(3).integers(
        0, 256, (batch, 8, 8, 3), dtype=np.uint8))
    want = np.asarray(serving_forward(
        folded["params"], u8, num_heads=2, patch_size=4, depth=2,
        dtype=jnp.float32, interpret=True))
    prepared = prepare_lowlat(folded["params"], depth=2,
                              dtype=jnp.float32)
    assert "aux" in prepared and "end_w" in prepared
    assert prepared["packed_w"].shape[0] == 6
    got = np.asarray(serving_forward_lowlat(
        prepared, u8, num_heads=2, patch_size=4, dtype=jnp.float32,
        interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_lowlat_e2e_matches_module_bf16():
    """bf16 fold-ends numerics stay within the fastserve drift envelope
    of the module forward."""
    m, folded = _small_foldable(depth=2, heads=2)
    u8 = jnp.asarray(np.random.default_rng(4).integers(
        0, 256, (2, 8, 8, 3), dtype=np.uint8))
    logits = m.apply(folded, u8.astype(jnp.float32))
    want = np.asarray(jax.nn.sigmoid(logits[:, 1] - logits[:, 0]))
    prepared = prepare_lowlat(folded["params"], depth=2)
    got = np.asarray(serving_forward_lowlat(
        prepared, u8, num_heads=2, patch_size=4, interpret=True),
        np.float32)
    np.testing.assert_allclose(got, want, atol=0.02)
    assert np.all((got >= 0) & (got <= 1))


def test_lowlat_e2e_rejects_wrong_image_size():
    """A batch whose patch grid disagrees with the prepared pos-embed
    must raise (not silently score with misaligned position rows)."""
    _, folded = _small_foldable(depth=2, heads=2)
    prepared = prepare_lowlat(folded["params"], depth=2,
                              dtype=jnp.float32)
    small = jnp.zeros((1, 4, 4, 3), jnp.uint8)   # 1+1 tokens != 5
    with pytest.raises(ValueError, match="tokens"):
        serving_forward_lowlat(prepared, small, num_heads=2,
                               patch_size=4, dtype=jnp.float32,
                               interpret=True)


def test_lowlat_e2e_under_jit():
    """The prepared dict must stay jit-safe as a pytree argument (no
    static config leaking in as traced leaves) — the deployment shape:
    ``jax.jit(lambda prep, batch: serving_forward_lowlat(prep, batch))``.
    """
    _, folded = _small_foldable(depth=2, heads=2)
    prepared = prepare_lowlat(folded["params"], depth=2,
                              dtype=jnp.float32)
    u8 = jnp.asarray(np.random.default_rng(5).integers(
        0, 256, (2, 8, 8, 3), dtype=np.uint8))
    fn = jax.jit(lambda prep, b: serving_forward_lowlat(
        prep, b, num_heads=2, patch_size=4, dtype=jnp.float32,
        interpret=True))
    got = np.asarray(fn(prepared, u8))
    want = np.asarray(serving_forward_lowlat(
        prepared, u8, num_heads=2, patch_size=4, dtype=jnp.float32,
        interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_lowlat_matches_module_bf16():
    """bf16 serving numerics stay within the fastserve drift envelope of
    the module forward."""
    m, folded = _small(depth=2, heads=2)
    u8 = jnp.asarray(np.random.default_rng(2).integers(
        0, 256, (2, 32, 32, 3), dtype=np.uint8))
    logits = m.apply(folded, u8.astype(jnp.float32))
    want = np.asarray(jax.nn.sigmoid(logits[:, 1] - logits[:, 0]))
    prepared = prepare_lowlat(folded["params"], depth=2)
    got = np.asarray(serving_forward_lowlat(
        prepared, u8, num_heads=2, interpret=True), np.float32)
    np.testing.assert_allclose(got, want, atol=0.02)
    assert np.all((got >= 0) & (got <= 1))


def test_lowlat_linear_matches_serving_forward_linear():
    """Linear-head lowlat (encoder kernel + XLA classifier ends) equals
    serving_forward_linear; prepare_lowlat falls back to encoder-only
    packs for the head-less tree."""
    import flax.linen as nn

    from vit_spoof_detection_pda_tpu.models.fastserve import (
        serving_forward_linear, serving_forward_lowlat_linear)
    from vit_spoof_detection_pda_tpu.models.vit import ViT

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            feats = ViT(patch_size=16, embed_dim=64, depth=2,
                        num_heads=2, norm_eps=1e-12, gelu="tanh",
                        name="vit")(x)
            return nn.Dense(2, dtype=jnp.float32, name="classifier")(
                feats.astype(jnp.float32))

    m = M()
    folded = fold_normalization(
        m.init(jax.random.PRNGKey(2), jnp.zeros((1, 32, 32, 3))))
    prepared = prepare_lowlat(folded["params"], depth=2,
                              dtype=jnp.float32)
    assert "aux" not in prepared     # head-less tree -> encoder-only
    u8 = jnp.asarray(np.random.default_rng(7).integers(
        0, 256, (2, 32, 32, 3), dtype=np.uint8))
    kw = dict(num_heads=2, norm_eps=1e-12, dtype=jnp.float32,
              interpret=True)
    got = np.asarray(serving_forward_lowlat_linear(prepared, u8, **kw))
    want = np.asarray(serving_forward_linear(
        folded["params"], u8, num_heads=2, depth=2, norm_eps=1e-12,
        dtype=jnp.float32, interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_lowlat_e2e_bf16_tracks_fastserve():
    """After the dtype-fidelity fixes the bf16 fold-ends path shares
    every rounding point with serving_forward except the in-kernel f32
    LayerNorm accumulations and the erf polynomial (1.5e-7) — pin the
    A/B much tighter than the module-drift envelope."""
    _, folded = _small_foldable(depth=2, heads=2)
    u8 = jnp.asarray(np.random.default_rng(11).integers(
        0, 256, (4, 8, 8, 3), dtype=np.uint8))
    want = np.asarray(serving_forward(
        folded["params"], u8, num_heads=2, patch_size=4, depth=2,
        interpret=True), np.float32)
    prepared = prepare_lowlat(folded["params"], depth=2)
    got = np.asarray(serving_forward_lowlat(
        prepared, u8, num_heads=2, patch_size=4, interpret=True),
        np.float32)
    np.testing.assert_allclose(got, want, atol=5e-3)


def test_pack_batchgrid_layout():
    from vit_spoof_detection_pda_tpu.ops.lowlat import (
        pack_encoder_weights_batchgrid)

    _, folded = _small()
    vit = folded["params"]["vit"]
    w, s = pack_encoder_weights_batchgrid(vit, depth=2, dtype=jnp.float32)
    d, hidden = 64, 256
    assert w.shape == (6, d, hidden) and s.shape == (6, 4, hidden)
    blk = vit["block0"]
    fc1 = np.asarray(blk["mlp"]["fc1"]["kernel"])
    fc2 = np.asarray(blk["mlp"]["fc2"]["kernel"])
    # attn step identical to the per-item pack
    np.testing.assert_array_equal(w[0, :, :3 * d],
                                  blk["attn"]["qkv"]["kernel"])
    # mlp halves: fc1 column half + the matching fc2 row chunks
    np.testing.assert_array_equal(w[1, :, :2 * d], fc1[:, :2 * d])
    np.testing.assert_array_equal(w[1, :, 2 * d:3 * d], fc2[:d, :])
    np.testing.assert_array_equal(w[1, :, 3 * d:], fc2[d:2 * d, :])
    np.testing.assert_array_equal(w[2, :, :2 * d], fc1[:, 2 * d:])
    np.testing.assert_array_equal(w[2, :, 2 * d:3 * d], fc2[2 * d:3 * d, :])
    np.testing.assert_array_equal(w[2, :, 3 * d:], fc2[3 * d:, :])
    np.testing.assert_array_equal(s[1, 2, :2 * d],
                                  blk["mlp"]["fc1"]["bias"][:2 * d])
    np.testing.assert_array_equal(s[2, 2, :2 * d],
                                  blk["mlp"]["fc1"]["bias"][2 * d:])
    np.testing.assert_array_equal(s[1, 3, :d], 0.0)
    np.testing.assert_array_equal(s[2, 3, :d], blk["mlp"]["fc2"]["bias"])


@pytest.mark.parametrize("batch", [1, 3, 4, 6])
def test_lowlat_batchgrid_matches_serving_forward_f32(batch):
    """The batch-grid flavor (weights streamed once per chunk, items
    unrolled in-kernel, split-MLP phases) equals the per-layer path —
    including the padded-tail chunking at b=6."""
    from vit_spoof_detection_pda_tpu.models.fastserve import (
        serving_forward_lowlat_batch)

    _, folded = _small(depth=2, heads=2)
    u8 = jnp.asarray(np.random.default_rng(12).integers(
        0, 256, (batch, 32, 32, 3), dtype=np.uint8))
    want = np.asarray(serving_forward(
        folded["params"], u8, num_heads=2, depth=2, dtype=jnp.float32,
        interpret=True))
    prepared = prepare_lowlat(folded["params"], depth=2,
                              dtype=jnp.float32, batch_grid=True)
    assert "bg_w" in prepared
    got = np.asarray(serving_forward_lowlat_batch(
        prepared, u8, num_heads=2, dtype=jnp.float32, interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_lowlat_batchgrid_bf16_tracks_fastserve():
    from vit_spoof_detection_pda_tpu.models.fastserve import (
        serving_forward_lowlat_batch)

    _, folded = _small(depth=2, heads=2)
    u8 = jnp.asarray(np.random.default_rng(13).integers(
        0, 256, (4, 32, 32, 3), dtype=np.uint8))
    want = np.asarray(serving_forward(
        folded["params"], u8, num_heads=2, depth=2, interpret=True),
        np.float32)
    prepared = prepare_lowlat(folded["params"], depth=2, batch_grid=True)
    got = np.asarray(serving_forward_lowlat_batch(
        prepared, u8, num_heads=2, interpret=True), np.float32)
    np.testing.assert_allclose(got, want, atol=5e-3)


def test_prepare_lowlat_pack_selection():
    """per_item=False (batch-grid-only serving) skips the per-item and
    fold-ends packs — neither should sit in device memory twice."""
    from vit_spoof_detection_pda_tpu.models.fastserve import prepare_lowlat

    _, folded = _small()
    p = prepare_lowlat(folded["params"], depth=2, batch_grid=True,
                       per_item=False)
    assert "bg_w" in p and "packed_w" not in p and "aux" not in p
    with pytest.raises(ValueError, match="nothing would be packed"):
        prepare_lowlat(folded["params"], depth=2, per_item=False)


def test_int8_weight_stream_tracks_bf16_path():
    """Weight-only int8 superblocks (pack_encoder_weights weight_dtype)
    reproduce the full-precision lowlat scores within the per-column
    quantization envelope — both the encoder-only and fold-ends
    flavors."""
    _, folded = _small(depth=2, heads=2)
    u8 = jnp.asarray(np.random.default_rng(21).integers(
        0, 256, (2, 32, 32, 3), dtype=np.uint8))
    ref = np.asarray(serving_forward_lowlat(
        prepare_lowlat(folded["params"], depth=2),
        u8, num_heads=2, interpret=True), np.float32)

    p8 = prepare_lowlat(folded["params"], depth=2, int8_weights=True)
    assert p8["packed_w"].dtype == jnp.int8
    assert p8["packed_s"].shape[1] == 5          # + scale row
    got = np.asarray(serving_forward_lowlat(
        p8, u8, num_heads=2, interpret=True), np.float32)
    # weight-only int8 per-column: scores move by quantization noise
    # only (~1e-2 on this tiny random model); pins the numerics contract
    np.testing.assert_allclose(got, ref, atol=5e-2)
    assert not np.allclose(got, ref, atol=1e-9)  # genuinely quantized

    # fold-ends flavor: int8 encoder stream + bf16 resident ends
    _, ff = _small_foldable(depth=2, heads=2)
    uf = jnp.asarray(np.random.default_rng(22).integers(
        0, 256, (2, 8, 8, 3), dtype=np.uint8))
    ref_f = np.asarray(serving_forward_lowlat(
        prepare_lowlat(ff["params"], depth=2),
        uf, num_heads=2, patch_size=4, interpret=True), np.float32)
    p8f = prepare_lowlat(ff["params"], depth=2, int8_weights=True)
    assert "aux" in p8f                          # fold-ends engaged
    got_f = np.asarray(serving_forward_lowlat(
        p8f, uf, num_heads=2, patch_size=4, interpret=True), np.float32)
    np.testing.assert_allclose(got_f, ref_f, atol=5e-2)


def test_int8_weight_stream_quantization_quality():
    """Per-column int8 dequantized blocks reconstruct the bf16 master
    within the 1/254 per-column relative bound."""
    _, folded = _small(depth=2, heads=2)
    w, s = pack_encoder_weights(folded["params"]["vit"], depth=2,
                                dtype=jnp.bfloat16)
    q, s5 = pack_encoder_weights(folded["params"]["vit"], depth=2,
                                 dtype=jnp.bfloat16,
                                 weight_dtype=jnp.int8)
    deq = np.asarray(q, np.float32) * np.asarray(s5)[:, 4, None, :]
    wf = np.asarray(w, np.float32)
    colmax = np.abs(wf).max(axis=1, keepdims=True)
    err = np.abs(deq - wf)
    assert np.all(err <= colmax / 254.0 + 1e-7)


def test_int8_rejects_batch_grid_only():
    _, folded = _small()
    with pytest.raises(ValueError, match="int8_weights"):
        prepare_lowlat(folded["params"], depth=2, per_item=False,
                       batch_grid=True, int8_weights=True)


def test_batchgrid_rejects_int8_pack():
    """The batch-grid kernel has no dequant path; an int8 pack must
    fail with an actionable error, not a Mosaic dtype crash."""
    from vit_spoof_detection_pda_tpu.ops.lowlat import (
        encoder_forward_lowlat_batchgrid)

    _, folded = _small(depth=2, heads=2)
    q, s5 = pack_encoder_weights(folded["params"]["vit"], depth=2,
                                 weight_dtype=jnp.int8)
    with pytest.raises(ValueError, match="full-precision"):
        encoder_forward_lowlat_batchgrid(
            jnp.zeros((2, 8, 64)), q, s5, num_heads=2, valid_len=5,
            interpret=True)
