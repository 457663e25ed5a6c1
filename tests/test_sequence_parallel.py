"""Sequence parallelism (context parallelism): the rectangular CP
attention kernel vs its dense oracle, and full-model forward / train-step
equivalence on (data, seq) virtual meshes.

Capability beyond the reference (SURVEY.md §2.7 lists SP as a non-goal
for the single-GPU torch script); implemented as the all-gather-KV
flavor sized for T=197 (ops/attention.py::_sp_sharded)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vit_spoof_detection_pda_tpu.models.vit import ViTAntiSpoof
from vit_spoof_detection_pda_tpu.ops import losses
from vit_spoof_detection_pda_tpu.ops.attention import (
    _context, _cp_dense_reference, attention_sharding,
    fused_attention_qkv_cp)
from vit_spoof_detection_pda_tpu.parallel import (
    make_seq_mesh, shard_batch)
from vit_spoof_detection_pda_tpu.train import (
    create_train_state, make_optimizer, make_train_step)


def _qkv_pair(seed=0, b=2, tq=25, tk=104, heads=4, dh=16,
              valid=100):
    rng = np.random.default_rng(seed)
    d = heads * dh
    q = jnp.asarray(rng.standard_normal((b, tq, d)).astype(np.float32))
    kv = jnp.asarray(rng.standard_normal((b, tk, 2 * d)).astype(np.float32))
    return q, kv, valid


def test_cp_kernel_forward_matches_dense():
    q, kv, valid = _qkv_pair()
    got = fused_attention_qkv_cp(q, kv, 4, valid, True)
    want = _cp_dense_reference(q, kv, 4, valid)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)


def test_cp_kernel_odd_shapes():
    # non-8-multiple query AND key rows exercise both pads
    for tq, tk, valid in [(5, 13, 13), (33, 197, 197), (8, 200, 197)]:
        q, kv, _ = _qkv_pair(seed=tq, b=1, tq=tq, tk=tk, heads=2, dh=8,
                             valid=valid)
        got = fused_attention_qkv_cp(q, kv, 2, valid, True)
        want = _cp_dense_reference(q, kv, 2, valid)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=1e-5)


def test_cp_kernel_grad_matches_dense():
    q, kv, valid = _qkv_pair(seed=3, b=2, tq=16, tk=48, heads=2, dh=16,
                             valid=41)

    def loss_fused(q, kv):
        return jnp.sum(fused_attention_qkv_cp(q, kv, 2, valid, True) ** 2)

    def loss_dense(q, kv):
        return jnp.sum(_cp_dense_reference(q, kv, 2, valid) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1))(q, kv)
    gd = jax.grad(loss_dense, argnums=(0, 1))(q, kv)
    for a, b_ in zip(gf, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-4, rtol=1e-4)


def test_make_seq_mesh_shapes():
    m = make_seq_mesh(seq=4, data=2)
    assert m.devices.shape == (2, 4)
    assert m.axis_names == ("data", "seq")
    with pytest.raises(ValueError):
        make_seq_mesh(seq=3, data=2)


@pytest.mark.parametrize("dp,sp", [(2, 4), (4, 2), (1, 8)])
def test_sp_forward_matches_single_device(dp, sp):
    """Under attention_sharding with a (data, seq) mesh the dispatch
    routes to the sequence-parallel CP kernel (pallas_calls increments)
    and the forward matches the single-device module.  T = 17 tokens
    (4x4 patches + cls) is indivisible by every seq size -> the pad-and-
    mask path is exercised on each mesh."""
    module = ViTAntiSpoof(patch_size=8, embed_dim=64, depth=2,
                          num_heads=4, hidden=32)
    variables = module.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 32, 32, 3)))
    x = np.random.default_rng(1).standard_normal(
        (16, 32, 32, 3)).astype(np.float32)
    want = np.asarray(module.apply(variables, jnp.asarray(x)))

    mesh = make_seq_mesh(seq=sp, data=dp)
    calls = _context["pallas_calls"]
    with mesh, attention_sharding(mesh=mesh, interpret=True):
        xb = shard_batch({"image": x}, mesh)["image"]
        got = np.asarray(jax.jit(
            lambda v, im: module.apply(v, im))(variables, xb))
    assert _context["pallas_calls"] > calls, "SP fell back from the kernel"
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


def test_sp_train_step_matches_single_device():
    """Gradients flow through the all-gather + CP kernel: one focal-loss
    SGD step at DP(2)xSP(4) equals the single-device step (the KV
    cotangent reduce-scatters back through the all_gather transpose)."""
    import optax

    module = ViTAntiSpoof(patch_size=8, embed_dim=64, depth=2,
                          num_heads=4, hidden=32)
    rng = np.random.default_rng(4)
    batch_np = {
        "image": rng.standard_normal((16, 32, 32, 3)).astype(np.float32),
        "label": (rng.random(16) < 0.5).astype(np.int32),
    }

    def one_step(mesh):
        tx = optax.sgd(0.1)
        state = create_train_state(module, tx, jax.random.PRNGKey(0),
                                   input_shape=(1, 32, 32, 3))
        if mesh is not None:
            with mesh, attention_sharding(mesh=mesh, interpret=True):
                step = make_train_step(losses.make_loss_fn("focal"),
                                       mesh=mesh, donate=False)
                state, metrics = step(state, shard_batch(batch_np, mesh))
        else:
            step = make_train_step(losses.make_loss_fn("focal"),
                                   donate=False)
            state, metrics = step(state, {k: jnp.asarray(v)
                                          for k, v in batch_np.items()})
        return (jax.tree.map(np.asarray, state.params),
                float(metrics["loss"]))

    p_single, l_single = one_step(None)
    calls = _context["pallas_calls"]
    p_mesh, l_mesh = one_step(make_seq_mesh(seq=4, data=2))
    assert _context["pallas_calls"] > calls
    assert l_mesh == pytest.approx(l_single, abs=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=5e-5, rtol=1e-4),
        p_single, p_mesh)
