"""Fused-block training forward (models/fasttrain.py): forward AND
gradient parity vs the flax module path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vit_spoof_detection_pda_tpu.models import fasttrain as FT
from vit_spoof_detection_pda_tpu.models.vit import ViTAntiSpoof
from vit_spoof_detection_pda_tpu.ops.attention import attention_sharding


def small_model(dtype=jnp.float32, depth=2):
    m = ViTAntiSpoof(patch_size=16, embed_dim=64, depth=depth,
                     num_heads=4, hidden=16, dtype=dtype)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    return m, v


def batch(b=2):
    return jnp.asarray(
        np.random.default_rng(0).standard_normal((b, 32, 32, 3)),
        jnp.float32)


def test_attn_block_train_forward_matches_xla():
    rng = np.random.default_rng(1)
    b, t, d, heads = 2, 33, 64, 4
    x = jnp.asarray(rng.standard_normal((b, t, d)), jnp.float32)
    args = (jnp.asarray(rng.standard_normal(d) * 0.1 + 1, jnp.float32),
            jnp.asarray(rng.standard_normal(d) * 0.1, jnp.float32),
            jnp.asarray(rng.standard_normal((d, 3 * d)) * 0.05, jnp.float32),
            jnp.asarray(rng.standard_normal(3 * d) * 0.05, jnp.float32),
            jnp.asarray(rng.standard_normal((d, d)) * 0.05, jnp.float32),
            jnp.asarray(rng.standard_normal(d) * 0.05, jnp.float32))
    got = np.asarray(FT.attn_block_train(x, *args, heads, 1e-6, True))
    want = np.asarray(FT._xla_attn_block(x, *args, heads, 1e-6))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_attn_block_train_grads_match_xla_autodiff():
    """custom-VJP backward == XLA autodiff of the same math, for the
    input AND every parameter."""
    rng = np.random.default_rng(2)
    b, t, d, heads = 2, 17, 64, 4
    x = jnp.asarray(rng.standard_normal((b, t, d)), jnp.float32)
    args = tuple(jnp.asarray(a, jnp.float32) for a in (
        rng.standard_normal(d) * 0.1 + 1,
        rng.standard_normal(d) * 0.1,
        rng.standard_normal((d, 3 * d)) * 0.05,
        rng.standard_normal(3 * d) * 0.05,
        rng.standard_normal((d, d)) * 0.05,
        rng.standard_normal(d) * 0.05))
    w = jnp.asarray(rng.standard_normal((b, t, d)), jnp.float32)

    def loss_fused(x, *a):
        return jnp.sum(FT.attn_block_train(x, *a, heads, 1e-6, True) * w)

    def loss_xla(x, *a):
        return jnp.sum(FT._xla_attn_block(x, *a, heads, 1e-6) * w)

    g_fused = jax.grad(loss_fused, argnums=tuple(range(7)))(x, *args)
    g_xla = jax.grad(loss_xla, argnums=tuple(range(7)))(x, *args)
    for a, b_, name in zip(g_fused, g_xla,
                           "x lns lnb wqkv bqkv wproj bproj".split()):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=5e-4, rtol=5e-4,
            err_msg=f"grad mismatch for {name}")


def test_train_forward_matches_module_f32():
    m, v = small_model()
    x = batch()
    want = np.asarray(m.apply(v, x))
    with attention_sharding(interpret=True):
        got = np.asarray(FT.make_apply(m)(v, x))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


@pytest.mark.parametrize("mlp_mode", ["autodiff", "xhat", "hidden",
                                      "fused"])
def test_train_forward_param_grads_match_module_f32(mlp_mode):
    """All four MLP VJPs (autodiff, store-only-xhat, stored-hidden with
    the Pallas LN tail, fully-fused Pallas forward) must produce
    module-path gradients."""
    m, v = small_model()
    x = batch()
    labels = jnp.asarray([0, 1], jnp.int32)

    def loss_mod(params):
        logits = m.apply({"params": params}, x)
        return jnp.mean(jax.nn.log_softmax(logits)[
            jnp.arange(2), labels]) * -1.0

    with attention_sharding(interpret=True):
        fast = FT.make_apply(m, mlp_mode=mlp_mode)

        def loss_fast(params):
            logits = fast({"params": params}, x)
            return jnp.mean(jax.nn.log_softmax(logits)[
                jnp.arange(2), labels]) * -1.0

        g_fast = jax.grad(loss_fast)(v["params"])
    g_mod = jax.grad(loss_mod)(v["params"])

    flat_f, _ = jax.tree_util.tree_flatten_with_path(g_fast)
    flat_m, _ = jax.tree_util.tree_flatten_with_path(g_mod)
    assert len(flat_f) == len(flat_m)
    for (pf, af), (pm, am) in zip(flat_f, flat_m):
        assert pf == pm
        np.testing.assert_allclose(
            np.asarray(af), np.asarray(am), atol=1e-4, rtol=2e-3,
            err_msg=f"param grad mismatch at {jax.tree_util.keystr(pf)}")


def test_train_forward_bf16_close_and_finite():
    m, v = small_model(dtype=jnp.bfloat16)
    x = batch()
    want = np.asarray(m.apply(v, x), np.float32)
    with attention_sharding(interpret=True):
        fast = FT.make_apply(m)
        got = np.asarray(fast(v, x), np.float32)

        def loss(params):
            return jnp.mean(fast({"params": params}, x) ** 2)

        g = jax.grad(loss)(v["params"])
    np.testing.assert_allclose(got, want, atol=0.05, rtol=0.05)
    for leaf in jax.tree.leaves(g):
        assert np.all(np.isfinite(np.asarray(leaf, np.float32)))


def test_dropout_active_in_train_mode():
    m, v = small_model()
    x = batch()
    with attention_sharding(interpret=True):
        fast = FT.make_apply(m)
        a = fast(v, x, train=True, rngs={"dropout": jax.random.PRNGKey(1)})
        b_ = fast(v, x, train=True, rngs={"dropout": jax.random.PRNGKey(2)})
        c = fast(v, x, train=False)
    assert not np.allclose(np.asarray(a), np.asarray(b_))
    np.testing.assert_allclose(
        np.asarray(c), np.asarray(m.apply(v, x)), atol=2e-4, rtol=1e-4)


def test_trainer_swaps_apply_fn_and_trains():
    """On a 1-device mesh under the interpret context the Trainer swaps
    in the fasttrain apply_fn and a step still decreases-ish loss."""
    from vit_spoof_detection_pda_tpu.config import Config
    from vit_spoof_detection_pda_tpu.parallel import make_mesh
    from vit_spoof_detection_pda_tpu.train.trainer import Trainer

    m, _ = small_model()
    cfg = Config().with_overrides({
        "optim.num_epochs": 1, "data.img_size": 32,
        "model.fused_train_forward": True,
        "telemetry.jsonl_path": None, "threshold.optimize": False})
    x = np.random.default_rng(0).standard_normal((4, 32, 32, 3))
    data = {"image": x.astype(np.float32),
            "label": np.asarray([0, 1, 0, 1], np.int32)}
    mesh1 = make_mesh(devices=jax.devices()[:1])
    with attention_sharding(interpret=True):
        tr = Trainer(cfg, m,
                     train_batches=lambda e: [data],
                     val_batches=lambda: [data],
                     steps_per_epoch=1, mesh=mesh1)
        # bound methods compare unequal on every access — check the
        # wrapper is NOT a bound method of the module
        assert getattr(tr.state.apply_fn, "__self__", None) is not m, (
            "fused_train_forward should swap apply_fn here")
        metrics = tr.train_epoch(0)
        assert np.isfinite(metrics["loss"])


def test_fast_apply_available_gating():
    m, _ = small_model()
    from vit_spoof_detection_pda_tpu.models.resnet import ResNet50
    assert not FT.fast_apply_available(ResNet50())
    # CPU backend without interpret context: unavailable
    assert not FT.fast_apply_available(m)
    with attention_sharding(interpret=True):
        assert FT.fast_apply_available(m)
    # multi-device mesh: module path keeps the shard_map dispatch
    from vit_spoof_detection_pda_tpu.parallel import make_mesh
    mesh = make_mesh()
    if mesh.devices.size > 1:
        with attention_sharding(mesh=mesh, interpret=True):
            assert not FT.fast_apply_available(m, mesh=mesh)


def test_gelu_lean_matches_plain_gelu():
    """gelu_lean (VJP stores only the pre-activation) must match
    jax.nn.gelu exactly in f32 forward AND gradient for both erf and
    tanh flavors — only the residual set differs (round-20 trace: the
    plain flavor saved 3 [B,T,4D] tensors per layer)."""
    import numpy as np

    from vit_spoof_detection_pda_tpu.models.fasttrain import gelu_lean

    x = jnp.asarray(np.random.default_rng(0).standard_normal((64, 33)),
                    jnp.float32)
    for approx in (False, True):
        ref = lambda t: jnp.sum(jax.nn.gelu(t, approximate=approx) ** 2)
        new = lambda t: jnp.sum(gelu_lean(t, approx) ** 2)
        np.testing.assert_allclose(np.asarray(new(x)), np.asarray(ref(x)),
                                   rtol=1e-7)
        np.testing.assert_array_equal(np.asarray(jax.grad(new)(x)),
                                      np.asarray(jax.grad(ref)(x)))
    # the lean backward recomputes the gate: the fwd+bwd jaxpr carries a
    # second erf while the plain one reuses the saved gate
    lean_jaxpr = str(jax.make_jaxpr(jax.grad(
        lambda t: jnp.sum(gelu_lean(t, False))))(x))
    plain_jaxpr = str(jax.make_jaxpr(jax.grad(
        lambda t: jnp.sum(jax.nn.gelu(t, approximate=False))))(x))
    assert lean_jaxpr.count("erf") == plain_jaxpr.count("erf") + 1


def test_ln_residual_bwd_kernel_matches_reference():
    """The fused LN/residual backward Pallas pass (ops/ln_bwd.py) must
    reproduce the pure-XLA chain it replaces: dx, dscale, dbias — and
    honor the padding contract (pad rows with dxn = g = 0 give dx = 0
    and no spurious parameter-grad contribution)."""
    from vit_spoof_detection_pda_tpu.ops.ln_bwd import (
        ln_residual_bwd, ln_residual_bwd_reference)

    rng = np.random.default_rng(3)
    b, t, tp, d = 4, 13, 16, 64
    x = rng.standard_normal((b, tp, d)).astype(np.float32)
    x32 = jnp.asarray(x)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean((x32 - mu) ** 2, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + 1e-6)
    xh = (x32 - mu) * inv
    # pad rows: dxn and g zero beyond t (the fasttrain contract)
    row_mask = (np.arange(tp) < t)[None, :, None]
    dxn = jnp.asarray(rng.standard_normal((b, tp, d)) * row_mask,
                      jnp.float32)
    g = jnp.asarray(rng.standard_normal((b, tp, d)) * row_mask,
                    jnp.float32)
    lns = jnp.asarray(rng.standard_normal(d) * 0.1 + 1, jnp.float32)

    dx, dlns, dlnb = ln_residual_bwd(xh, inv, dxn, g, lns,
                                     interpret=True)
    rdx, rdlns, rdlnb = ln_residual_bwd_reference(xh, inv, dxn, g, lns)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(rdx),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(dlns), np.asarray(rdlns),
                               atol=1e-4, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(dlnb), np.asarray(rdlnb),
                               atol=1e-4, rtol=1e-5)
    # padding contract: pad rows come out exactly zero
    np.testing.assert_array_equal(np.asarray(dx[:, t:]), 0.0)


def test_ln_residual_bwd_equals_autodiff_of_ln_residual():
    """End-to-end check against jax.grad of y = x + LN(x)*s + b (the
    exact sub-layer tail the kernel serves)."""
    from vit_spoof_detection_pda_tpu.ops.ln_bwd import ln_residual_bwd

    rng = np.random.default_rng(4)
    b, t, d = 2, 8, 64
    eps = 1e-6
    x = jnp.asarray(rng.standard_normal((b, t, d)), jnp.float32)
    lns = jnp.asarray(rng.standard_normal(d) * 0.1 + 1, jnp.float32)
    lnb = jnp.asarray(rng.standard_normal(d) * 0.1, jnp.float32)
    w = jnp.asarray(rng.standard_normal((b, t, d)), jnp.float32)

    def f(x, lns, lnb):
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
        xh = (x - mu) * jax.lax.rsqrt(var + eps)
        return jnp.sum((x + xh * lns + lnb) * w)

    gx, gs, gb = jax.grad(f, argnums=(0, 1, 2))(x, lns, lnb)

    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xh = (x - mu) * inv
    # dxn = w (cotangent into the affine LN output); g = w (residual)
    dx, dlns, dlnb = ln_residual_bwd(xh, inv, w, w, lns, interpret=True)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(gx),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(dlns), np.asarray(gs),
                               atol=1e-4, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(dlnb), np.asarray(gb),
                               atol=1e-4, rtol=1e-5)


def test_ln_residual_bwd_bf16_dxn_and_odd_batch():
    """The shipped training path feeds the LN kernel a COMPUTE-dtype
    (bf16) dxn (DXN_COMPACT); and odd batch counts take the block_b=1
    grid.  Both must stay close to the f32 oracle."""
    from vit_spoof_detection_pda_tpu.ops.ln_bwd import (
        ln_residual_bwd, ln_residual_bwd_reference)

    rng = np.random.default_rng(5)
    b, t, d = 3, 16, 64                      # odd b -> block_b = 1
    x32 = jnp.asarray(rng.standard_normal((b, t, d)), jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean((x32 - mu) ** 2, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + 1e-6)
    xh = ((x32 - mu) * inv).astype(jnp.bfloat16)
    dxn16 = jnp.asarray(rng.standard_normal((b, t, d)), jnp.bfloat16)
    g = jnp.asarray(rng.standard_normal((b, t, d)), jnp.bfloat16)
    lns = jnp.asarray(rng.standard_normal(d) * 0.1 + 1, jnp.float32)

    dx, dlns, dlnb = ln_residual_bwd(xh, inv, dxn16, g, lns,
                                     interpret=True)
    rdx, rdlns, rdlnb = ln_residual_bwd_reference(xh, inv, dxn16, g, lns)
    np.testing.assert_allclose(np.asarray(dx, np.float32),
                               np.asarray(rdx, np.float32),
                               atol=2e-2, rtol=2e-2)     # bf16 output
    np.testing.assert_allclose(np.asarray(dlns), np.asarray(rdlns),
                               atol=1e-3, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(dlnb), np.asarray(rdlnb),
                               atol=1e-3, rtol=1e-4)
