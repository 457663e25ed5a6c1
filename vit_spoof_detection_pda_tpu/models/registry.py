"""Declarative model registry.

Replaces the reference harness's ordered ``models_to_evaluate`` list of
(name, loader_fn) closures (evaluate_all_models.py:458-463) with entries
declaring builder + weight source + preprocessing, so the cross-model
harness, latency benchmark and analysis suite all drive off one table.
"""

from __future__ import annotations

import dataclasses
import logging
import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from . import convert
from .resnet import ResNet50
from .vit import ViTAntiSpoof, ViTLinearHead

log = logging.getLogger(__name__)


@dataclasses.dataclass(frozen=True)
class ModelEntry:
    """One registry row.

    `weights`: how to obtain variables — "checkpoint" (torch .pth via the
    converter), "pretrained" (local pretrained file if present), or
    "random".  `placeholder`: the model knowingly stands in for an
    unavailable one (the reference's SigNet_F substitutes an *untrained*
    ResNet50 with a logged warning, evaluate_all_models.py:336-355 — which
    is why its published AUC is 0.399).
    """

    name: str
    build: Callable[..., object]            # kwargs -> flax Module
    weights: str = "random"
    weight_converter: Optional[Callable] = None
    placeholder: bool = False
    description: str = ""


def _build_vit_antispoof(dropout: float = 0.1, dtype=jnp.float32, **kw):
    return ViTAntiSpoof(dropout=dropout, dtype=dtype)


def build_vit_from_config(model_cfg, dtype=jnp.float32) -> ViTAntiSpoof:
    """One source of truth for mapping a ModelConfig onto ViTAntiSpoof
    (used by the train driver AND the eval CLIs — a new architecture
    field only needs wiring here)."""
    return ViTAntiSpoof(
        patch_size=model_cfg.patch_size, embed_dim=model_cfg.embed_dim,
        depth=model_cfg.depth, num_heads=model_cfg.num_heads,
        mlp_ratio=model_cfg.mlp_ratio, hidden=model_cfg.head_hidden,
        num_classes=model_cfg.num_classes, dropout=model_cfg.dropout,
        dtype=dtype, gelu=getattr(model_cfg, "gelu", "erf"))


def _build_vit_linear(dtype=jnp.float32, **kw):
    return ViTLinearHead(dtype=dtype)


def _build_resnet50(dtype=jnp.float32, **kw):
    return ResNet50(dtype=dtype)


MODEL_REGISTRY = {
    "Custom_ViT_FineTuned": ModelEntry(
        name="Custom_ViT_FineTuned",
        build=_build_vit_antispoof,
        weights="checkpoint",
        weight_converter=convert.antispoof_from_torch,
        description="ViT-B/16 + MLP head fine-tuned on CelebA-Spoof "
                    "(reference ViTFaceAntiSpoofing, published checkpoint "
                    "best_model_run_eif1jakb.pth)",
    ),
    "Base_ViT_Pretrained": ModelEntry(
        name="Base_ViT_Pretrained",
        build=_build_vit_linear,
        weights="pretrained",
        weight_converter=convert.vit_linear_from_hf,
        description="Frozen ImageNet ViT-B/16 + random 2-way head, no "
                    "fine-tune (ablation; reference "
                    "evaluate_all_models.py:307-318)",
    ),
    "ResNet50_Pretrained": ModelEntry(
        name="ResNet50_Pretrained",
        build=_build_resnet50,
        weights="pretrained",
        weight_converter=convert.resnet50_from_torchvision,
        description="ImageNet ResNet50, fc -> 2 "
                    "(reference evaluate_all_models.py:71-78)",
    ),
    "SigNet_F": ModelEntry(
        name="SigNet_F",
        build=_build_resnet50,
        weights="random",
        placeholder=True,
        description="SigNet-F is not public; untrained ResNet50 stands in "
                    "(reference evaluate_all_models.py:336-355)",
    ),
}


def build_model(name: str, *, checkpoint_path: Optional[str] = None,
                pretrained_path: Optional[str] = None, seed: int = 0,
                dtype=jnp.float32, dropout: float = 0.1,
                ema: bool = False, img_size: int = 224):
    """Build (module, variables) for a registry entry.

    Weight resolution: explicit checkpoint/pretrained path if provided and
    present, else random init (with a warning for non-placeholder models —
    mirrors the harness's strict=False tolerance,
    evaluate_all_models.py:300).  ``ema=True`` loads the Polyak shadow
    weights instead of the last iterate — Orbax checkpoint directories
    only (the shadow lives in the optimizer state; torch exports carry
    one weight set).
    """
    entry = MODEL_REGISTRY[name]
    module = entry.build(dropout=dropout, dtype=dtype)

    path = checkpoint_path if entry.weights == "checkpoint" else pretrained_path
    if ema and not (path and os.path.isdir(path)):
        raise ValueError(
            f"{name}: ema=True needs an Orbax checkpoint directory "
            f"(got {path!r}) — the EMA shadow lives in the optimizer "
            "state, which file-format checkpoints do not carry")
    if path and os.path.isdir(path):
        # Orbax checkpoint directory written by our own Trainer: native
        # format, no torch conversion — so every eval/export surface
        # (test, evaluate-all --checkpoint, benchmark) accepts a
        # training run's save_dir directly.  Strict: our own format for
        # this entry must match exactly; a mismatch is a wrong
        # architecture, never a silent partial load.
        variables, step = variables_from_orbax(module, path, ema=ema,
                                               img_size=img_size)
        log.info("loaded %s orbax checkpoint step %d from %s%s",
                 name, step, path, " (EMA shadow)" if ema else "")
        return module, variables
    if path and os.path.exists(path) and entry.weight_converter:
        sd = _load_state_dict(path)
        try:
            variables = entry.weight_converter(sd)
        except KeyError:
            # torch load_state_dict(strict=False) semantics, as the
            # reference uses for the published checkpoint
            # (evaluate_all_models.py:300): convert what is present, keep
            # init values for the rest, warn.
            init = module.init(jax.random.PRNGKey(seed),
                               jnp.zeros((1, img_size, img_size, 3),
                                         jnp.float32))
            variables, missing = convert.convert_partial(
                entry.weight_converter, sd, init)
            log.warning("%s: state dict at %s was incomplete; %d tensors "
                        "kept init values", name, path, len(missing))
        variables = jax.tree.map(jnp.asarray, variables)
        # reference semantics for stock upstream checkpoints: HF loads
        # with ignore_mismatched_sizes=True and torchvision's fc is
        # replaced by a fresh 2-way layer (evaluate_all_models.py:
        # 307-318, 327-331) — a 1000-way classifier tensor must fall
        # back to the module's random head, NOT flow through and score
        # P(ImageNet class 1) as P(live)
        variables, dropped = _drop_mismatched(variables, module, seed,
                                              img_size=img_size)
        if dropped:
            log.warning(
                "%s: %d tensors in %s have mismatched shapes %s — kept "
                "random init for them (reference "
                "ignore_mismatched_sizes / fresh-head semantics)",
                name, len(dropped), path, dropped[:4])
        log.info("loaded %s weights from %s", name, path)
    else:
        if entry.placeholder:
            log.warning("%s: placeholder model — using UNTRAINED weights "
                        "(expected; see registry description)", name)
        elif path:
            log.warning("%s: weight file %s missing — random init", name, path)
        else:
            # the docstring promises a warning for EVERY non-placeholder
            # random init — silently evaluating an untrained network
            # labeled "pretrained" writes garbage comparison artifacts
            log.warning(
                "%s: no %s weights supplied — RANDOM init (pass "
                "checkpoint_path/pretrained_path to load real weights)",
                name, entry.weights)
        rng = jax.random.PRNGKey(seed)
        dummy = jnp.zeros((1, img_size, img_size, 3), jnp.float32)
        variables = module.init(rng, dummy)
    return module, variables


def variables_from_orbax(module, directory: str, *, step=None,
                         ema: bool = False, img_size: int = 224):
    """Load an Orbax checkpoint directory as ``module``'s variables,
    validating tree structure AND every leaf shape against the module
    (jax.eval_shape — no real init).  Raises ValueError on any
    disagreement: this is the framework's own format for a known
    module, so a mismatch means the wrong architecture/entry, and the
    reference's strict=False tolerance must NOT apply."""
    from ..utils.checkpoint import load_checkpoint_bundle

    variables, step, _metrics = load_checkpoint_bundle(
        directory, step, ema=ema)
    want = jax.eval_shape(lambda: module.init(
        jax.random.PRNGKey(0), jnp.zeros((1, img_size, img_size, 3),
                                         jnp.float32)))
    structure_err, mismatched = geometry_mismatches(dict(want), variables)
    if structure_err:
        raise ValueError(
            f"orbax checkpoint at {directory} does not have this "
            f"module's parameter tree structure — wrong architecture "
            f"or registry entry ({structure_err})")
    if mismatched:
        raise ValueError(
            f"orbax checkpoint at {directory} mismatches the module's "
            f"shapes ({len(mismatched)} tensors, e.g. "
            f"{mismatched[:3]}) — wrong architecture for this entry")
    return jax.tree.map(jnp.asarray, variables), int(step)


def geometry_mismatches(want, got):
    """Compare two variable trees' geometry (structure + leaf shapes).

    Returns ``(structure_error, mismatched)``: ``structure_error`` is a
    string when the tree structures disagree (else None), ``mismatched``
    lists ``path: got_shape vs want_shape`` for shape disagreements.
    Shared by the orbax strict-load validation above and the train
    driver's pretrained-geometry check (one comparison, one behavior)."""
    mismatched = []

    def _chk(kp, g, w):
        if tuple(g.shape) != tuple(w.shape):
            mismatched.append("/".join(
                str(getattr(k, "key", k)) for k in kp)
                + f": {tuple(g.shape)} vs {tuple(w.shape)}")
    try:
        jax.tree_util.tree_map_with_path(_chk, got, want)
    except ValueError as e:
        return str(e), []
    return None, mismatched


def _drop_mismatched(variables, module, seed, img_size: int = 224):
    """Replace converted leaves whose shape disagrees with the module's
    tree by a freshly-initialized leaf.  Shape checking costs nothing
    (jax.eval_shape); the real init only runs when something actually
    mismatched.  Returns (variables, dropped_paths)."""
    def init_fn():
        return module.init(jax.random.PRNGKey(seed),
                           jnp.zeros((1, img_size, img_size, 3),
                                     jnp.float32))

    want = jax.eval_shape(init_fn)
    dropped = []
    n_leaves = [0]
    def _check(kp, got, w):
        n_leaves[0] += 1
        if got.shape != w.shape:
            dropped.append("/".join(
                str(getattr(k, "key", k)) for k in kp))
    jax.tree_util.tree_map_with_path(_check, variables, want)
    if not dropped:
        return variables, []
    if len(dropped) >= n_leaves[0]:
        # EVERY tensor mismatched: a wrong-architecture checkpoint whose
        # key names happen to line up (e.g. a ViT-L export fed to the
        # ViT-B registry entry) — the key-mismatch path raises, so the
        # shape-mismatch path must too, not return a 100% random model
        raise ValueError(
            f"checkpoint matched the expected key set but ALL "
            f"{n_leaves[0]} tensors mismatch the module's shapes — "
            "wrong architecture for this registry entry")
    init = init_fn()
    merged = jax.tree.map(
        lambda got, w, ini: ini if got.shape != w.shape else got,
        variables, want, init)
    return merged, dropped


def _load_state_dict(path: str):
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file
        return load_file(path)
    if path.endswith((".npz", ".npy")):
        import numpy as np
        obj = np.load(path, allow_pickle=True)
        if hasattr(obj, "files"):               # NpzFile is a Mapping
            return dict(obj)
        return obj.item()   # 0-d object array holding the state dict
    return convert.load_torch_checkpoint(path)
