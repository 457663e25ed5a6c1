"""Pallas fused attention vs the dense reference (interpret mode on CPU),
forward and gradients."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vit_spoof_detection_pda_tpu.ops.attention import (
    _dense_reference, fused_attention)


def _qkv(seed=0, b=2, t=197, h=4, d=32, dtype=np.float32):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(
        rng.standard_normal((b, t, h, d)).astype(dtype))
    return mk(), mk(), mk()


def test_forward_matches_dense():
    q, k, v = _qkv()
    got = fused_attention(q, k, v, True)      # interpret mode
    want = _dense_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)


def test_forward_odd_lengths():
    for t in (5, 128, 197):
        q, k, v = _qkv(seed=t, b=1, t=t, h=2, d=16)
        got = fused_attention(q, k, v, True)
        want = _dense_reference(q, k, v)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=1e-5)


def test_gradients_match_dense():
    q, k, v = _qkv(seed=3, b=1, t=33, h=2, d=16)

    def loss_fused(q, k, v):
        return jnp.sum(fused_attention(q, k, v, True) ** 2)

    def loss_dense(q, k, v):
        return jnp.sum(_dense_reference(q, k, v) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-4, rtol=1e-4)


def test_vit_cpu_uses_dense_path():
    """On the CPU test backend the model must auto-select the dense path
    (no Pallas TPU lowering available)."""
    from vit_spoof_detection_pda_tpu.models.vit import ViT
    m = ViT(patch_size=16, embed_dim=64, depth=1, num_heads=2)
    variables = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    out = jax.jit(lambda v, x: m.apply(v, x))(
        variables, jnp.zeros((2, 32, 32, 3)))
    assert out.shape == (2, 64)


def test_fused_attention_qkv_matches_dense():
    from vit_spoof_detection_pda_tpu.ops.attention import (
        _qkv_dense_reference, fused_attention_qkv)
    rng = np.random.default_rng(7)
    qkv = jnp.asarray(rng.standard_normal((2, 197, 3 * 64)).astype(np.float32))
    got = fused_attention_qkv(qkv, 4, True)
    want = _qkv_dense_reference(qkv, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)


def test_fused_attention_qkv_grad_matches_dense():
    from vit_spoof_detection_pda_tpu.ops.attention import (
        _qkv_dense_reference, fused_attention_qkv)
    rng = np.random.default_rng(8)
    qkv = jnp.asarray(rng.standard_normal((1, 33, 3 * 32)).astype(np.float32))
    gf = jax.grad(lambda x: jnp.sum(fused_attention_qkv(x, 2, True) ** 2))(qkv)
    gd = jax.grad(lambda x: jnp.sum(_qkv_dense_reference(x, 2) ** 2))(qkv)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gd),
                               atol=1e-4, rtol=1e-4)


def test_fused_attention_qkv_grad_bf16_dots():
    """bf16 inputs route the backward's dots through the input dtype
    (the MXU-rate path); gradients must track a float32 dense oracle to
    bf16 rounding tolerance."""
    from vit_spoof_detection_pda_tpu.ops.attention import (
        _qkv_dense_reference, fused_attention_qkv)
    rng = np.random.default_rng(9)
    x32 = rng.standard_normal((2, 33, 3 * 32)).astype(np.float32)
    qkv16 = jnp.asarray(x32, jnp.bfloat16)
    qkv32 = jnp.asarray(np.asarray(qkv16, np.float32))
    gf = jax.grad(
        lambda x: jnp.sum(fused_attention_qkv(x, 2, True)
                          .astype(jnp.float32) ** 2))(qkv16)
    gd = jax.grad(lambda x: jnp.sum(_qkv_dense_reference(x, 2) ** 2))(qkv32)
    np.testing.assert_allclose(np.asarray(gf, np.float32), np.asarray(gd),
                               atol=0.02, rtol=0.02)


def test_sharded_attention_context_on_mesh():
    """Under a multi-device data mesh the Trainer enables the shard_map-
    wrapped Pallas path; outputs must match single-device dense."""
    from vit_spoof_detection_pda_tpu.ops import attention as att
    from vit_spoof_detection_pda_tpu.parallel import make_mesh, shard_batch
    from vit_spoof_detection_pda_tpu.models.vit import ViT

    m = ViT(patch_size=8, embed_dim=64, depth=1, num_heads=2)
    variables = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    x = np.random.default_rng(0).standard_normal(
        (16, 32, 32, 3)).astype(np.float32)
    want = np.asarray(m.apply(variables, jnp.asarray(x)))

    mesh = make_mesh()     # 8 x 1
    before = att._context["pallas_calls"]
    with mesh, att.attention_sharding(mesh=mesh, interpret=True):
        xb = shard_batch({"image": x}, mesh)["image"]
        got = np.asarray(jax.jit(
            lambda v, x: m.apply(v, x))(variables, xb))
    assert att._context["pallas_calls"] > before, "pallas path not taken"
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


def test_sharded_attention_tp_mesh_keeps_kernel():
    """TP meshes now run the head-sharded Pallas path (round-4); the
    dense fallback remains only for head counts the model axis cannot
    divide."""
    from vit_spoof_detection_pda_tpu.ops import attention as att
    from vit_spoof_detection_pda_tpu.parallel import make_mesh

    mesh = make_mesh(data=4, model=2)
    qkv = jnp.zeros((4, 8, 3 * 16))
    before = att._context["pallas_calls"]
    with att.attention_sharding(mesh=mesh, interpret=True):
        out = att.dispatch_attention_qkv(
            qkv, 2, lambda x: jnp.zeros((4, 8, 16)))
    assert out.shape == (4, 8, 16)
    assert att._context["pallas_calls"] == before + 1  # head-sharded

    # 3 heads over a 2-way model axis: dense fallback
    qkv3 = jnp.zeros((4, 8, 3 * 24))
    before = att._context["pallas_calls"]
    with att.attention_sharding(mesh=mesh, interpret=True):
        out = att.dispatch_attention_qkv(
            qkv3, 3, lambda x: jnp.zeros((4, 8, 24)))
    assert out.shape == (4, 8, 24)
    assert att._context["pallas_calls"] == before


def test_fused_attention_qkv_grad_matches_dense_even_batch():
    """Even batch exercises the block_b=2 kernel path (round-2 blocking)."""
    import jax
    from vit_spoof_detection_pda_tpu.ops import attention as att
    rng = np.random.default_rng(11)
    qkv = jnp.asarray(rng.standard_normal((4, 197, 3 * 64)).astype(np.float32))

    def loss_fused(x):
        return jnp.sum(att.fused_attention_qkv(x, 4, True) ** 2)

    def loss_dense(x):
        return jnp.sum(att._qkv_dense_reference(x, 4) ** 2)

    gf = jax.grad(loss_fused)(qkv)
    gd = jax.grad(loss_dense)(qkv)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gd),
                               atol=2e-4, rtol=1e-4)


def test_fold_normalization_matches_normalize_path():
    """fold_normalization(variables) on raw uint8 == normalize -> model,
    in f32 (the exactness claim in its docstring)."""
    import jax
    from vit_spoof_detection_pda_tpu.models.vit import (
        ViTAntiSpoof, fold_normalization)
    from vit_spoof_detection_pda_tpu.ops import image as I

    m = ViTAntiSpoof(patch_size=16, embed_dim=64, depth=2, num_heads=2,
                     hidden=16)
    variables = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    folded = fold_normalization(variables)
    u8 = jnp.asarray(np.random.default_rng(1).integers(
        0, 256, (2, 32, 32, 3), dtype=np.uint8))
    want = np.asarray(m.apply(variables, I.normalize(I.to_float(u8))))
    got = np.asarray(m.apply(folded, u8.astype(jnp.float32)))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)
    # original variables untouched
    assert not np.array_equal(
        np.asarray(folded["params"]["vit"]["patch_embed"]["kernel"]),
        np.asarray(variables["params"]["vit"]["patch_embed"]["kernel"]))


def test_indivisible_geometry_fails_loudly():
    """Per-head kernel slices would leave output columns UNWRITTEN
    (uninitialized VMEM) on indivisible geometry — the wrappers must
    raise instead."""
    from vit_spoof_detection_pda_tpu.ops.attention import (
        fused_attention_qkv, fused_attention_qkv_cp, fused_mlp_block)

    qkv_bad_heads = jnp.zeros((1, 8, 3 * 66))     # 66 % 4 != 0
    with pytest.raises(ValueError, match="num_heads"):
        fused_attention_qkv(qkv_bad_heads, 4, interpret=True)
    with pytest.raises(ValueError, match="divisible by 3"):
        fused_attention_qkv(jnp.zeros((1, 8, 200)), 2, interpret=True)
    with pytest.raises(ValueError, match="num_heads"):
        fused_attention_qkv_cp(jnp.zeros((1, 8, 66)),
                               jnp.zeros((1, 16, 132)), 4, 16,
                               interpret=True)
    with pytest.raises(ValueError, match="n_chunks"):
        fused_mlp_block(jnp.zeros((1, 8, 64)), jnp.ones(64),
                        jnp.zeros(64), jnp.zeros((64, 250)),
                        jnp.zeros(250), jnp.zeros((250, 64)),
                        jnp.zeros(64), n_chunks=4, interpret=True)


def test_backward_phased_variant_bit_identical():
    """The phase-split backward (BWD_PHASED probe kernel) must stay
    bit-identical to the baseline chain kernel in both dtypes — same
    dots, same dtypes, same per-element op order, different schedule."""
    from vit_spoof_detection_pda_tpu.ops import attention as A

    rng = np.random.default_rng(11)
    try:
        for dtype in (jnp.float32, jnp.bfloat16):
            qkv = jnp.asarray(rng.normal(0, 1, (4, 197, 3 * 192)), dtype)
            g = jnp.asarray(rng.normal(0, 1, (4, 197, 192)), dtype)
            A.BWD_PHASED = False
            base = np.asarray(A._backward_qkv(qkv, g, 4, interpret=True),
                              np.float32)
            A.BWD_PHASED = True
            got = np.asarray(A._backward_qkv(qkv, g, 4, interpret=True),
                             np.float32)
            np.testing.assert_array_equal(base, got)
    finally:
        A.BWD_PHASED = False


def test_dispatch_symbolic_batch_takes_dense():
    """jax.export shape-polymorphic tracing (module-mode serving
    artifacts) must route to the dense parity path on EVERY backend —
    pallas_call grids/cost estimates need concrete shapes, and module
    mode is documented as the no-Pallas portable path.  Regression: on
    a TPU host the dispatch previously picked the Pallas kernel and
    export-serving --mode module died in CostEstimate."""
    import jax
    import jax.numpy as jnp

    from vit_spoof_detection_pda_tpu.ops import attention as A

    calls = []

    def dense(qkv):
        calls.append("dense")
        return qkv[..., : qkv.shape[-1] // 3]

    (b,) = jax.export.symbolic_shape("b")

    def f(qkv):
        with A.attention_sharding(interpret=True):
            return A.dispatch_attention_qkv(qkv, 4, dense)

    out = jax.eval_shape(f, jax.ShapeDtypeStruct((b, 8, 192),
                                                 jnp.float32))
    assert calls == ["dense"]
    assert out.shape[1:] == (8, 64)
