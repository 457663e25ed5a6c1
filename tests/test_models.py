"""Model layer tests: forward shapes, torch->flax weight-conversion parity.

Numeric parity strategy (timm/torchvision are not installed here):
- HF `transformers` torch ViTModel (random init) is the oracle for the
  backbone: convert its state dict and require logit agreement.
- The timm-layout converter is checked against the HF-layout converter by
  fusing HF q/k/v into a synthetic timm-style state dict.
- The anti-spoofing head and a hand-built torch ResNet50 (torchvision
  naming) check the remaining converters.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from vit_spoof_detection_pda_tpu.models import convert
from vit_spoof_detection_pda_tpu.models.resnet import ResNet50
from vit_spoof_detection_pda_tpu.models.vit import (
    AntiSpoofHead, ViT, ViTAntiSpoof, ViTLinearHead)


# --------------------------------------------------------------------------
# ViT backbone vs HF transformers
# --------------------------------------------------------------------------


def _small_hf_vit():
    from transformers import ViTConfig, ViTModel
    cfg = ViTConfig(
        hidden_size=128, num_hidden_layers=3, num_attention_heads=4,
        intermediate_size=512, image_size=64, patch_size=16,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    model = ViTModel(cfg, add_pooling_layer=False).eval()
    return model, cfg


@pytest.fixture(scope="module")
def hf_vit():
    return _small_hf_vit()


def test_vit_matches_hf_transformers(hf_vit):
    model, cfg = hf_vit
    sd = model.state_dict()
    params = convert.vit_backbone_from_hf(sd, depth=cfg.num_hidden_layers)

    ours = ViT(patch_size=16, embed_dim=128, depth=3, num_heads=4,
               norm_eps=1e-12)
    rng = np.random.default_rng(0)
    img = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)

    with torch.no_grad():
        # HF wants NCHW
        t_out = model(torch.from_numpy(img.transpose(0, 3, 1, 2))
                      ).last_hidden_state[:, 0].numpy()
    j_out = np.asarray(ours.apply({"params": params}, jnp.asarray(img)))
    np.testing.assert_allclose(j_out, t_out, atol=2e-4, rtol=1e-4)


def test_timm_converter_agrees_with_hf_converter(hf_vit):
    """Fuse HF q/k/v into a synthetic timm-layout state dict; both
    converters must produce identical flax params."""
    model, cfg = hf_vit
    sd = {k: v for k, v in model.state_dict().items()}
    timm_sd = {
        "patch_embed.proj.weight": sd["embeddings.patch_embeddings.projection.weight"],
        "patch_embed.proj.bias": sd["embeddings.patch_embeddings.projection.bias"],
        "cls_token": sd["embeddings.cls_token"],
        "pos_embed": sd["embeddings.position_embeddings"],
        "norm.weight": sd["layernorm.weight"],
        "norm.bias": sd["layernorm.bias"],
    }
    for i in range(cfg.num_hidden_layers):
        b = f"encoder.layer.{i}"
        timm_sd[f"blocks.{i}.norm1.weight"] = sd[f"{b}.layernorm_before.weight"]
        timm_sd[f"blocks.{i}.norm1.bias"] = sd[f"{b}.layernorm_before.bias"]
        timm_sd[f"blocks.{i}.attn.qkv.weight"] = torch.cat(
            [sd[f"{b}.attention.attention.{x}.weight"] for x in
             ("query", "key", "value")], dim=0)
        timm_sd[f"blocks.{i}.attn.qkv.bias"] = torch.cat(
            [sd[f"{b}.attention.attention.{x}.bias"] for x in
             ("query", "key", "value")], dim=0)
        timm_sd[f"blocks.{i}.attn.proj.weight"] = sd[f"{b}.attention.output.dense.weight"]
        timm_sd[f"blocks.{i}.attn.proj.bias"] = sd[f"{b}.attention.output.dense.bias"]
        timm_sd[f"blocks.{i}.norm2.weight"] = sd[f"{b}.layernorm_after.weight"]
        timm_sd[f"blocks.{i}.norm2.bias"] = sd[f"{b}.layernorm_after.bias"]
        timm_sd[f"blocks.{i}.mlp.fc1.weight"] = sd[f"{b}.intermediate.dense.weight"]
        timm_sd[f"blocks.{i}.mlp.fc1.bias"] = sd[f"{b}.intermediate.dense.bias"]
        timm_sd[f"blocks.{i}.mlp.fc2.weight"] = sd[f"{b}.output.dense.weight"]
        timm_sd[f"blocks.{i}.mlp.fc2.bias"] = sd[f"{b}.output.dense.bias"]

    p_timm = convert.vit_backbone_from_timm(timm_sd, depth=3)
    p_hf = convert.vit_backbone_from_hf(sd, depth=3)
    jax.tree.map(np.testing.assert_array_equal, p_timm, p_hf)


# --------------------------------------------------------------------------
# Anti-spoofing head vs torch Sequential
# --------------------------------------------------------------------------


def test_head_matches_torch_sequential():
    """Head spec from reference train_advanced.py:193-200."""
    torch.manual_seed(1)
    t_head = torch.nn.Sequential(
        torch.nn.LayerNorm(768), torch.nn.Dropout(0.1),
        torch.nn.Linear(768, 512), torch.nn.GELU(),
        torch.nn.Dropout(0.1), torch.nn.Linear(512, 2),
    ).eval()
    sd = {f"classifier.{k}": v for k, v in t_head.state_dict().items()}
    params = {
        "norm": convert._layernorm(sd, "classifier.0"),
        "fc1": convert._linear(sd, "classifier.2"),
        "fc2": convert._linear(sd, "classifier.5"),
    }
    feats = np.random.default_rng(2).standard_normal((4, 768)).astype(np.float32)
    with torch.no_grad():
        want = t_head(torch.from_numpy(feats)).numpy()
    got = np.asarray(AntiSpoofHead().apply(
        {"params": params}, jnp.asarray(feats)))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_full_antispoof_checkpoint_roundtrip(hf_vit, tmp_path):
    """A reference-format .pth (vit.* + classifier.{0,2,5}.*) loads through
    `load_torch_checkpoint` + `antispoof_from_torch` and runs."""
    model, cfg = hf_vit
    sd = model.state_dict()
    full = {}
    # synth timm naming under vit. prefix (reuse HF->timm fusion)
    for i in range(cfg.num_hidden_layers):
        b = f"encoder.layer.{i}"
        full[f"vit.blocks.{i}.norm1.weight"] = sd[f"{b}.layernorm_before.weight"]
        full[f"vit.blocks.{i}.norm1.bias"] = sd[f"{b}.layernorm_before.bias"]
        full[f"vit.blocks.{i}.attn.qkv.weight"] = torch.cat(
            [sd[f"{b}.attention.attention.{x}.weight"] for x in
             ("query", "key", "value")], dim=0)
        full[f"vit.blocks.{i}.attn.qkv.bias"] = torch.cat(
            [sd[f"{b}.attention.attention.{x}.bias"] for x in
             ("query", "key", "value")], dim=0)
        full[f"vit.blocks.{i}.attn.proj.weight"] = sd[f"{b}.attention.output.dense.weight"]
        full[f"vit.blocks.{i}.attn.proj.bias"] = sd[f"{b}.attention.output.dense.bias"]
        full[f"vit.blocks.{i}.norm2.weight"] = sd[f"{b}.layernorm_after.weight"]
        full[f"vit.blocks.{i}.norm2.bias"] = sd[f"{b}.layernorm_after.bias"]
        full[f"vit.blocks.{i}.mlp.fc1.weight"] = sd[f"{b}.intermediate.dense.weight"]
        full[f"vit.blocks.{i}.mlp.fc1.bias"] = sd[f"{b}.intermediate.dense.bias"]
        full[f"vit.blocks.{i}.mlp.fc2.weight"] = sd[f"{b}.output.dense.weight"]
        full[f"vit.blocks.{i}.mlp.fc2.bias"] = sd[f"{b}.output.dense.bias"]
    full["vit.patch_embed.proj.weight"] = sd["embeddings.patch_embeddings.projection.weight"]
    full["vit.patch_embed.proj.bias"] = sd["embeddings.patch_embeddings.projection.bias"]
    full["vit.cls_token"] = sd["embeddings.cls_token"]
    full["vit.pos_embed"] = sd["embeddings.position_embeddings"]
    full["vit.norm.weight"] = sd["layernorm.weight"]
    full["vit.norm.bias"] = sd["layernorm.bias"]
    torch.manual_seed(3)
    head = torch.nn.Sequential(
        torch.nn.LayerNorm(128), torch.nn.Dropout(0.1),
        torch.nn.Linear(128, 32), torch.nn.GELU(),
        torch.nn.Dropout(0.1), torch.nn.Linear(32, 2)).eval()
    for k, v in head.state_dict().items():
        full[f"classifier.{k}"] = v

    path = tmp_path / "ckpt.pth"
    torch.save({"epoch": 1, "model_state_dict": full, "metrics": {}}, path)

    sd2 = convert.load_torch_checkpoint(str(path))
    variables = convert.antispoof_from_torch(sd2, depth=3)
    ours = ViTAntiSpoof(patch_size=16, embed_dim=128, depth=3, num_heads=4,
                        hidden=32, norm_eps=1e-12)
    img = np.random.default_rng(4).standard_normal((2, 64, 64, 3)).astype(np.float32)
    got = np.asarray(ours.apply(variables, jnp.asarray(img)))

    with torch.no_grad():
        feats = model(torch.from_numpy(img.transpose(0, 3, 1, 2))
                      ).last_hidden_state[:, 0]
        want = head(feats).numpy()
    np.testing.assert_allclose(got, want, atol=3e-4, rtol=1e-4)


# --------------------------------------------------------------------------
# ResNet50 vs hand-built torch (torchvision naming)
# --------------------------------------------------------------------------


class _TorchBottleneck(torch.nn.Module):
    def __init__(self, inp, width, stride, project):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(inp, width, 1, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(width)
        self.conv2 = torch.nn.Conv2d(width, width, 3, stride, 1, bias=False)
        self.bn2 = torch.nn.BatchNorm2d(width)
        self.conv3 = torch.nn.Conv2d(width, width * 4, 1, bias=False)
        self.bn3 = torch.nn.BatchNorm2d(width * 4)
        self.relu = torch.nn.ReLU()
        self.downsample = None
        if project:
            self.downsample = torch.nn.Sequential(
                torch.nn.Conv2d(inp, width * 4, 1, stride, bias=False),
                torch.nn.BatchNorm2d(width * 4))

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return self.relu(y + idn)


class _TorchResNet50(torch.nn.Module):
    """torchvision-resnet50-shaped network (same module names)."""

    def __init__(self, num_classes=2, stages=(3, 4, 6, 3)):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(64)
        self.relu = torch.nn.ReLU()
        self.maxpool = torch.nn.MaxPool2d(3, 2, 1)
        inp, width = 64, 64
        for s, n in enumerate(stages):
            blocks = []
            for b in range(n):
                stride = 2 if s > 0 and b == 0 else 1
                blocks.append(_TorchBottleneck(inp, width, stride, b == 0))
                inp = width * 4
            setattr(self, f"layer{s + 1}", torch.nn.Sequential(*blocks))
            width *= 2
        self.fc = torch.nn.Linear(inp, num_classes)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for s in range(1, 5):
            x = getattr(self, f"layer{s}")(x)
        x = x.mean(dim=(2, 3))
        return self.fc(x)


def test_resnet50_matches_torch():
    torch.manual_seed(5)
    # small stage sizes for speed; same topology rules
    tm = _TorchResNet50(num_classes=2, stages=(1, 1, 1, 1)).eval()
    # randomize BN running stats so conversion is actually exercised
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)
    variables = convert.resnet50_from_torchvision(tm.state_dict(), stage_sizes=(1, 1, 1, 1))
    ours = ResNet50(num_classes=2, stage_sizes=(1, 1, 1, 1))

    img = np.random.default_rng(6).standard_normal((2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(img.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(ours.apply(variables, jnp.asarray(img)))
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)


# --------------------------------------------------------------------------
# Registry
# --------------------------------------------------------------------------


def test_registry_builds_all_random(caplog):
    from vit_spoof_detection_pda_tpu.models.registry import (
        MODEL_REGISTRY, build_model)
    assert list(MODEL_REGISTRY) == [
        "Custom_ViT_FineTuned", "Base_ViT_Pretrained",
        "ResNet50_Pretrained", "SigNet_F"]
    # SigNet placeholder builds with a warning and runs
    module, variables = build_model("SigNet_F")
    out = module.apply(variables, jnp.zeros((1, 224, 224, 3)))
    assert out.shape == (1, 2)


def test_vit_full_size_forward_shape():
    m = ViTAntiSpoof()
    variables = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)))
    out = jax.jit(lambda v, x: m.apply(v, x))(
        variables, jnp.zeros((2, 224, 224, 3)))
    assert out.shape == (2, 2)
    assert out.dtype == jnp.float32


def test_gelu_tanh_serving_mode_close_to_erf():
    """gelu='tanh' (serving fast path) must match the erf default within
    the bf16 policy's own noise — same params, tiny logit drift."""
    m_erf = ViTAntiSpoof(patch_size=16, embed_dim=64, depth=2, num_heads=2,
                         hidden=16)
    m_tanh = ViTAntiSpoof(patch_size=16, embed_dim=64, depth=2, num_heads=2,
                          hidden=16, gelu="tanh")
    variables = m_erf.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    x = jnp.asarray(np.random.default_rng(1).standard_normal(
        (4, 32, 32, 3)), jnp.float32)
    a = np.asarray(m_erf.apply(variables, x))
    b = np.asarray(m_tanh.apply(variables, x))
    np.testing.assert_allclose(a, b, atol=5e-3, rtol=1e-3)
    assert not np.array_equal(a, b)   # the approximation is actually used


def test_registry_drops_mismatched_checkpoint_tensors(tmp_path, caplog):
    """A stock upstream checkpoint with a 1000-way classifier must fall
    back to the module's random 2-way head (reference
    ignore_mismatched_sizes / fresh-fc semantics) instead of silently
    producing [B, 1000] logits scored as P(live)."""
    import logging

    import numpy as np

    import vit_spoof_detection_pda_tpu.models.registry as R

    entry = R.MODEL_REGISTRY["Base_ViT_Pretrained"]
    module = entry.build(dropout=0.1, dtype=jnp.float32)
    good = module.init(jax.random.PRNGKey(3),
                       jnp.zeros((1, 224, 224, 3), jnp.float32))

    def bad_converter(sd):
        p = jax.tree.map(lambda x: x, good)     # shallow copy
        cls = dict(p["params"]["classifier"])
        cls["kernel"] = jnp.zeros((768, 1000), jnp.float32)
        cls["bias"] = jnp.zeros((1000,), jnp.float32)
        params = dict(p["params"])
        params["classifier"] = cls
        return {"params": params}

    fake = R.ModelEntry(name="Base_ViT_Pretrained", build=entry.build,
                        weights="pretrained",
                        weight_converter=bad_converter)
    path = tmp_path / "w.npz"
    np.savez(path, dummy=np.zeros(1))
    old = R.MODEL_REGISTRY["Base_ViT_Pretrained"]
    R.MODEL_REGISTRY["Base_ViT_Pretrained"] = fake
    try:
        with caplog.at_level(logging.WARNING):
            _, variables = R.build_model("Base_ViT_Pretrained",
                                         pretrained_path=str(path))
    finally:
        R.MODEL_REGISTRY["Base_ViT_Pretrained"] = old
    assert variables["params"]["classifier"]["kernel"].shape == (768, 2)
    assert any("mismatched shapes" in r.message for r in caplog.records)


def test_variables_from_orbax_strict_roundtrip(tmp_path):
    """Every eval surface accepts a Trainer save_dir directly:
    variables_from_orbax restores the exact params and hard-rejects
    wrong architectures (our own format -> strict, never the
    reference's strict=False tolerance)."""
    import flax.linen as nn
    import numpy as np
    import pytest

    from vit_spoof_detection_pda_tpu.models.registry import (
        variables_from_orbax)
    from vit_spoof_detection_pda_tpu.train.state import (
        create_train_state, make_optimizer)
    from vit_spoof_detection_pda_tpu.utils.checkpoint import (
        CheckpointManager)

    class Tiny(nn.Module):
        width: int = 8

        @nn.compact
        def __call__(self, x, *, train: bool = False):
            x = nn.Conv(self.width, (3, 3), strides=(2, 2))(x)
            return nn.Dense(2)(jnp.mean(x, axis=(1, 2)))

    module = Tiny()
    state = create_train_state(module, make_optimizer(1e-3),
                               jax.random.PRNGKey(0),
                               input_shape=(1, 16, 16, 3))
    mgr = CheckpointManager(str(tmp_path / "ck"))
    mgr.save(3, state, force=True)
    mgr.close()

    variables, step = variables_from_orbax(module, str(tmp_path / "ck"),
                                           img_size=16)
    assert step == 3
    for a, b in zip(jax.tree.leaves(variables["params"]),
                    jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # wrong width -> shape mismatch must raise, not partially load
    with pytest.raises(ValueError, match="wrong architecture"):
        variables_from_orbax(Tiny(width=16), str(tmp_path / "ck"),
                             img_size=16)


def test_build_model_orbax_img_size_threading(tmp_path):
    """build_model(img_size=...) must validate an orbax checkpoint
    against the module at the RUN's resolution, not the hardcoded 224
    default — a img_size!=224 training run's save_dir has a different
    pos-embed geometry and used to be rejected as 'wrong architecture'
    by evaluate-all/benchmark while cli/test accepted it."""
    import flax.linen as nn

    from vit_spoof_detection_pda_tpu.models import registry as R
    from vit_spoof_detection_pda_tpu.train.state import (
        create_train_state, make_optimizer)
    from vit_spoof_detection_pda_tpu.utils.checkpoint import (
        CheckpointManager)

    class TinyPos(nn.Module):
        """Param geometry depends on input size (pos-embed-like)."""

        @nn.compact
        def __call__(self, x, *, train: bool = False):
            b, h, w, c = x.shape
            pos = self.param("pos", nn.initializers.zeros, (h * w, 4))
            x = nn.Dense(4)(x.reshape(b, h * w, c)) + pos
            return nn.Dense(2)(x.mean(axis=1))

    module = TinyPos()
    state = create_train_state(module, make_optimizer(1e-3),
                               jax.random.PRNGKey(0),
                               input_shape=(1, 16, 16, 3))
    mgr = CheckpointManager(str(tmp_path / "ck"))
    mgr.save(1, state, force=True)
    mgr.close()

    fake = R.ModelEntry(name="Custom_ViT_FineTuned",
                        build=lambda **kw: TinyPos(),
                        weights="checkpoint")
    old = R.MODEL_REGISTRY["Custom_ViT_FineTuned"]
    R.MODEL_REGISTRY["Custom_ViT_FineTuned"] = fake
    try:
        # at the run's img_size: loads
        _, variables = R.build_model("Custom_ViT_FineTuned",
                                     checkpoint_path=str(tmp_path / "ck"),
                                     img_size=16)
        assert variables["params"]["pos"].shape == (256, 4)
        # at the wrong img_size: strict rejection (not a silent load)
        import pytest
        with pytest.raises(ValueError, match="wrong architecture"):
            R.build_model("Custom_ViT_FineTuned",
                          checkpoint_path=str(tmp_path / "ck"),
                          img_size=24)
    finally:
        R.MODEL_REGISTRY["Custom_ViT_FineTuned"] = old
