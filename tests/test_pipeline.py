"""Pipeline parallelism (parallel/pipeline.py): the GPipe shard_map
schedule computes exactly what the plain module computes — forward and
gradients — on DP x PP virtual meshes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_spoof_detection_pda_tpu.models.vit import ViTAntiSpoof
from vit_spoof_detection_pda_tpu.parallel.pipeline import (
    make_pipe_mesh, pipe_param_specs, pipeline_apply, stack_block_params,
    unstack_block_params)


def tiny_model(depth=4):
    return ViTAntiSpoof(patch_size=16, embed_dim=64, depth=depth,
                        num_heads=4, hidden=32, dropout=0.0)


def make_inputs(b=8, img=32):
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.standard_normal((b, img, img, 3)), jnp.float32)


@pytest.fixture(scope="module")
def setup():
    module = tiny_model()
    x = make_inputs()
    variables = module.init(jax.random.PRNGKey(0), x)
    ref = module.apply(variables, x)
    return module, variables, x, ref


def test_stack_roundtrip(setup):
    module, variables, _, _ = setup
    stacked, rest = stack_block_params(variables["params"]["vit"],
                                       module.depth)
    blocks = unstack_block_params(stacked)
    assert len(blocks) == module.depth
    orig0 = variables["params"]["vit"]["block0"]
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, b),
                 blocks[0], orig0)
    assert "patch_embed" in rest and "block0" not in rest


@pytest.mark.parametrize("data,pipe,micro", [(2, 4, 4), (1, 4, 8), (4, 2, 2)])
def test_forward_equivalence(setup, data, pipe, micro):
    module, variables, x, ref = setup
    mesh = make_pipe_mesh(pipe, data=data,
                          devices=jax.devices()[: data * pipe])
    got = jax.jit(lambda v, im: pipeline_apply(
        module, v, im, mesh, microbatches=micro))(variables, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_gradient_equivalence(setup):
    module, variables, x, ref = setup
    mesh = make_pipe_mesh(4, data=2)
    tgt = jnp.asarray(np.arange(x.shape[0]) % 2, jnp.int32)

    def loss_ref(params):
        logits = module.apply({"params": params}, x)
        return jnp.mean(
            -jax.nn.log_softmax(logits)[jnp.arange(tgt.size), tgt])

    def loss_pp(params):
        logits = pipeline_apply(module, {"params": params}, x, mesh,
                                microbatches=4)
        return jnp.mean(
            -jax.nn.log_softmax(logits)[jnp.arange(tgt.size), tgt])

    g_ref = jax.jit(jax.grad(loss_ref))(variables["params"])
    g_pp = jax.jit(jax.grad(loss_pp))(variables["params"])
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_pp = jax.tree.leaves(g_pp)
    assert len(flat_ref) == len(flat_pp)
    for (path, a), b in zip(flat_ref, flat_pp):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=2e-4,
            err_msg=jax.tree_util.keystr(path))


def test_gradient_equivalence_remat(setup):
    """pipeline_remat recomputes block interiors in backward — the
    gradients must be IDENTICAL to the stored-activation schedule (remat
    changes memory, not math)."""
    module, variables, x, _ = setup
    mesh = make_pipe_mesh(4, data=2)
    tgt = jnp.asarray(np.arange(x.shape[0]) % 2, jnp.int32)

    def loss(params, remat):
        logits = pipeline_apply(module, {"params": params}, x, mesh,
                                microbatches=4, remat=remat)
        return jnp.mean(
            -jax.nn.log_softmax(logits)[jnp.arange(tgt.size), tgt])

    g = jax.jit(jax.grad(lambda p: loss(p, False)))(variables["params"])
    g_remat = jax.jit(jax.grad(lambda p: loss(p, True)))(
        variables["params"])
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=1e-6), g, g_remat)


def test_pp_sgd_step_matches_single_device(setup):
    """One SGD step through the pipeline == one step through the plain
    module (the PP training contract, not just a single grad)."""
    module, variables, x, _ = setup
    mesh = make_pipe_mesh(4, data=2)
    tgt = jnp.asarray(np.arange(x.shape[0]) % 2, jnp.int32)

    def step(params, use_pp):
        def loss(p):
            if use_pp:
                logits = pipeline_apply(module, {"params": p}, x, mesh,
                                        microbatches=4)
            else:
                logits = module.apply({"params": p}, x)
            return jnp.mean(
                -jax.nn.log_softmax(logits)[jnp.arange(tgt.size), tgt])

        g = jax.grad(loss)(params)
        return jax.tree.map(lambda w, gw: w - 0.1 * gw, params, g)

    p_ref = jax.jit(lambda p: step(p, False))(variables["params"])
    p_pp = jax.jit(lambda p: step(p, True))(variables["params"])
    for (path, a), b in zip(jax.tree_util.tree_leaves_with_path(p_ref),
                            jax.tree.leaves(p_pp)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=2e-4,
            err_msg=jax.tree_util.keystr(path))


def test_validation_errors(setup):
    module, variables, x, _ = setup
    mesh = make_pipe_mesh(4, data=2)
    with pytest.raises(ValueError, match="microbatches"):
        pipeline_apply(module, variables, x, mesh, microbatches=3)
    mesh3 = make_pipe_mesh(8, data=1)   # depth 4 not divisible by 8
    with pytest.raises(ValueError, match="divisible by pipe"):
        pipeline_apply(module, variables, x, mesh3, microbatches=4)
    # b=8, m=8 -> microbatch size 1, not divisible by data=2
    with pytest.raises(ValueError, match="divisible by\\s+data"):
        pipeline_apply(module, variables, x, mesh, microbatches=8)
    # packed tree whose stacked depth mismatches the module must raise
    # like the unpacked path does (silent truncation guard)
    from vit_spoof_detection_pda_tpu.parallel.pipeline import (
        pack_pipeline_params)
    packed = pack_pipeline_params(variables, module.depth)
    deeper = tiny_model(depth=8)
    with pytest.raises(ValueError, match="packed tree has 4"):
        pipeline_apply(deeper, packed, x, make_pipe_mesh(4, data=2),
                       microbatches=4)


def test_pp_inside_attention_sharding(setup):
    """pipeline_apply traced while an outer attention_sharding context is
    active must NOT open a nested shard_map — manual_attention routes to
    the per-device kernel (Pallas in interpret mode) and the result still
    matches the plain module."""
    from vit_spoof_detection_pda_tpu.ops.attention import (
        _context, attention_sharding)
    from vit_spoof_detection_pda_tpu.parallel.mesh import make_mesh

    module, variables, x, ref = setup
    pp_mesh = make_pipe_mesh(4, data=2)
    dp_mesh = make_mesh(data=8)   # the context mesh a trainer would hold
    before = _context["pallas_calls"]
    with attention_sharding(mesh=dp_mesh, interpret=True):
        got = jax.jit(lambda v, im: pipeline_apply(
            module, v, im, pp_mesh, microbatches=4))(variables, x)
        got = np.asarray(got)
    assert _context["pallas_calls"] > before, \
        "manual dispatch did not take the Pallas path under interpret"
    np.testing.assert_allclose(got, np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_pipe_param_specs_and_packed_layout(setup):
    """pack_pipeline_params + pipe_param_specs place the stacked blocks
    over pipe with NO replicated unstacked copy, and pipeline_apply
    accepts the packed layout directly (same scores)."""
    module, variables, x, ref = setup
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vit_spoof_detection_pda_tpu.parallel.pipeline import (
        pack_pipeline_params)

    packed = pack_pipeline_params(variables, module.depth)
    specs = pipe_param_specs(variables, module.depth)
    assert jax.tree.structure(packed) == jax.tree.structure(specs)
    blocks_spec = specs["params"]["vit"]["blocks"]
    assert all(s == P("pipe") for s in jax.tree.leaves(blocks_spec))
    assert all(s == P() for s in jax.tree.leaves(
        specs["params"]["vit"]["norm"]))

    mesh = make_pipe_mesh(4, data=2)
    placed = jax.tree.map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)),
        packed, specs)
    leaf = jax.tree.leaves(placed["params"]["vit"]["blocks"])[0]
    assert not leaf.sharding.is_fully_replicated  # layer dim split
    got = jax.jit(lambda v, im: pipeline_apply(
        module, v, im, mesh, microbatches=4))(placed, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


# --------------------------------------------------------------------------
# DPxTPxPP: tensor parallelism INSIDE each pipeline stage (3-axis mesh,
# model axis left in AUTO/GSPMD mode inside the manual pipeline region;
# attention head-shards over it with a nested shard_map)
# --------------------------------------------------------------------------


@pytest.mark.parametrize("data,pipe,model,micro",
                         [(2, 2, 2, 2), (1, 2, 4, 4), (1, 4, 2, 4)])
def test_tp_pp_forward_equivalence(setup, data, pipe, model, micro):
    module, variables, x, ref = setup
    mesh = make_pipe_mesh(pipe, data=data, model=model)
    got = jax.jit(lambda v, im: pipeline_apply(
        module, v, im, mesh, microbatches=micro))(variables, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_tp_pp_sgd_step_matches_single_device(setup):
    """One SGD step at DPxTPxPP 2x2x2 == one step through the plain
    module — the full 3-axis training contract, through the nested
    Pallas attention kernel (interpret) and its custom VJP."""
    from vit_spoof_detection_pda_tpu.ops.attention import (_context,
                                                           manual_attention)

    module, variables, x, _ = setup
    mesh = make_pipe_mesh(2, data=2, model=2)
    tgt = jnp.asarray(np.arange(x.shape[0]) % 2, jnp.int32)

    def step(params, use_pp):
        def loss(p):
            if use_pp:
                logits = pipeline_apply(module, {"params": p}, x, mesh,
                                        microbatches=2)
            else:
                logits = module.apply({"params": p}, x)
            return jnp.mean(
                -jax.nn.log_softmax(logits)[jnp.arange(tgt.size), tgt])

        g = jax.grad(loss)(params)
        return jax.tree.map(lambda w, gw: w - 0.1 * gw, params, g)

    p_ref = jax.jit(lambda p: step(p, False))(variables["params"])
    before = _context["pallas_calls"]
    with manual_attention(interpret=True):
        p_pp = jax.jit(lambda p: step(p, True))(variables["params"])
        p_pp = jax.tree.map(np.asarray, p_pp)
    assert _context["pallas_calls"] > before, \
        "TP-in-pipeline did not take the nested Pallas path"
    for (path, a), b in zip(jax.tree_util.tree_leaves_with_path(p_ref),
                            jax.tree.leaves(p_pp)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=2e-4,
            err_msg=jax.tree_util.keystr(path))


@pytest.mark.parametrize("data,pipe,model", [(1, 2, 4), (1, 4, 2)])
def test_tp_pp_nested_pallas_equivalence(setup, data, pipe, model):
    """The NESTED Pallas path (interpret) at model=4 (h_loc=1) and the
    1x4x2 shape — the plain forward-equivalence params run these configs
    through the dense fallback only (no manual_attention context), so
    without this the nested kernel is never exercised beyond 2x2x2."""
    from vit_spoof_detection_pda_tpu.ops.attention import (_context,
                                                           manual_attention)

    module, variables, x, ref = setup
    mesh = make_pipe_mesh(pipe, data=data, model=model)
    before = _context["pallas_calls"]
    with manual_attention(interpret=True):
        got = jax.jit(lambda v, im: pipeline_apply(
            module, v, im, mesh, microbatches=4))(variables, x)
        got = np.asarray(got)
    assert _context["pallas_calls"] > before, \
        "nested Pallas path not taken"
    np.testing.assert_allclose(got, np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_tp_pp_indivisible_heads_dense_fallback():
    """num_heads % model != 0: attention drops to the dense einsum
    (GSPMD partitions it over the auto model axis) and the pipeline
    still matches the plain module."""
    module = ViTAntiSpoof(patch_size=16, embed_dim=66, depth=4,
                          num_heads=3, hidden=32, dropout=0.0)
    x = make_inputs()
    variables = module.init(jax.random.PRNGKey(2), x)
    ref = module.apply(variables, x)
    mesh = make_pipe_mesh(2, data=2, model=2)
    got = jax.jit(lambda v, im: pipeline_apply(
        module, v, im, mesh, microbatches=2))(variables, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_tp_pp_param_specs_megatron_layout(setup):
    """stacked_pipe_specs / pipe_param_specs(tp=True): qkv/fc1 column-
    split and proj/fc2 row-split over ``model`` on top of the ``pipe``
    layer split; norms replicated over model."""
    from jax.sharding import PartitionSpec as P

    from vit_spoof_detection_pda_tpu.parallel.pipeline import (
        pack_pipeline_params, stacked_pipe_specs)

    module, variables, _, _ = setup
    stacked, _ = stack_block_params(variables["params"]["vit"],
                                    module.depth)
    specs = stacked_pipe_specs(stacked, tp=True)
    assert specs["attn"]["qkv"]["kernel"] == P("pipe", None, "model")
    assert specs["attn"]["qkv"]["bias"] == P("pipe", "model")
    assert specs["attn"]["proj"]["kernel"] == P("pipe", "model", None)
    assert specs["attn"]["proj"]["bias"] == P("pipe", None)
    assert specs["mlp"]["fc1"]["kernel"] == P("pipe", None, "model")
    assert specs["mlp"]["fc2"]["kernel"] == P("pipe", "model", None)
    assert specs["norm1"]["scale"] == P("pipe", None)

    packed_specs = pipe_param_specs(variables, module.depth, tp=True)
    bs = packed_specs["params"]["vit"]["blocks"]
    assert bs["attn"]["qkv"]["kernel"] == P("pipe", None, "model")
    assert bs["mlp"]["fc2"]["kernel"] == P("pipe", "model", None)
    # the packed layout still applies end-to-end on the 3-axis mesh
    from jax.sharding import NamedSharding
    mesh = make_pipe_mesh(2, data=2, model=2)
    packed = pack_pipeline_params(variables, module.depth)
    placed = jax.tree.map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)),
        packed, packed_specs)
    x = make_inputs()
    ref = module.apply(variables, x)
    got = jax.jit(lambda v, im: pipeline_apply(
        module, v, im, mesh, microbatches=2))(placed, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_forward_equivalence_flagship_depth():
    """Production depth: 12 encoder layers over 4 stages (3 layers per
    stage-local scan) — the flagship ViT-B partitioning shape, tiny
    widths."""
    module = tiny_model(depth=12)
    x = make_inputs(b=8)
    variables = module.init(jax.random.PRNGKey(1), x)
    ref = module.apply(variables, x)
    mesh = make_pipe_mesh(4, data=2)
    got = jax.jit(lambda v, im: pipeline_apply(
        module, v, im, mesh, microbatches=4))(variables, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
