"""int8 serving path: quantization mechanics + closeness to the float
forward."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vit_spoof_detection_pda_tpu.models.serving import (
    dense_int8, quantize_dense, quantize_vit_params,
    vit_antispoof_int8_apply)
from vit_spoof_detection_pda_tpu.models.vit import ViTAntiSpoof


def test_quantize_dense_roundtrip():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((64, 32)).astype(np.float32)
    b = rng.standard_normal(32).astype(np.float32)
    qw = quantize_dense(w, b)
    assert qw["q"].dtype == jnp.int8
    # dequantized weights within one quantization step per channel
    deq = np.asarray(qw["q"], np.float32) * np.asarray(qw["scale"])
    step = np.asarray(qw["scale"])
    assert np.all(np.abs(deq - w) <= step / 2 + 1e-6)


def test_dense_int8_close_to_float():
    rng = np.random.default_rng(1)
    w = rng.standard_normal((128, 64)).astype(np.float32) * 0.05
    b = rng.standard_normal(64).astype(np.float32) * 0.01
    x = rng.standard_normal((32, 128)).astype(np.float32)
    want = x @ w + b
    got = np.asarray(dense_int8(jnp.asarray(x), quantize_dense(w, b)))
    rel = np.abs(got - want).max() / np.abs(want).std()
    assert rel < 0.08, rel


def test_int8_vit_close_to_float_forward():
    module = ViTAntiSpoof(patch_size=8, embed_dim=64, depth=2,
                          num_heads=2, hidden=32)
    variables = module.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 32, 32, 3)))
    rng = np.random.default_rng(2)
    x = rng.standard_normal((4, 32, 32, 3)).astype(np.float32)

    want = np.asarray(module.apply(variables, jnp.asarray(x)))
    qp = quantize_vit_params(variables["params"], depth=2)
    got = np.asarray(vit_antispoof_int8_apply(
        qp, jnp.asarray(x), num_heads=2, patch_size=8, interpret=True))
    # int8 + bf16 attention: logits track the float path closely
    denom = max(np.abs(want).std(), 1e-3)
    assert np.abs(got - want).max() / denom < 0.35, (
        np.abs(got - want).max(), denom)
    # argmax agreement (what inference consumers use)
    agree = (got.argmax(-1) == want.argmax(-1)).mean()
    assert agree >= 0.75, agree


def test_int8_vit_jits():
    module = ViTAntiSpoof(patch_size=8, embed_dim=64, depth=1,
                          num_heads=2, hidden=16)
    variables = module.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 16, 16, 3)))
    qp = quantize_vit_params(variables["params"], depth=1)
    f = jax.jit(lambda qp, x: vit_antispoof_int8_apply(
        qp, x, num_heads=2, patch_size=8, interpret=True))
    out = f(qp, jnp.zeros((2, 16, 16, 3)))
    assert out.shape == (2, 2)
    assert np.isfinite(np.asarray(out)).all()
