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
from vit_spoof_detection_pda_tpu.ops.lowlat import pack_encoder_weights


def _small(depth=2, heads=2):
    m = ViTAntiSpoof(patch_size=16, embed_dim=64, depth=depth,
                     num_heads=heads, hidden=16, gelu="tanh")
    variables = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
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
