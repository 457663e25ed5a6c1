"""Torch state-dict -> Flax parameter converters.

Covers every pretrained-weight path the reference uses (SURVEY.md §7
"hard parts" #1):

- timm ``vit_base_patch16_224`` encoders — the backbone inside the
  reference's ``ViTFaceAntiSpoofing`` (train_advanced.py:190: timm
  create_model, fused qkv layout),
- the published fine-tune checkpoint ``best_model_run_*.pth`` whose state
  dict is ``vit.*`` + ``classifier.{0,2,5}.*`` (nn.Sequential indices;
  reference train_advanced.py:193-200, loaded at test.py:167-188 /
  evaluate_all_models.py:282-304),
- HF ``ViTModel``/``ViTForImageClassification`` (separate q/k/v — the
  frozen "Base ViT" ablation, evaluate_all_models.py:307-318),
- torchvision ``resnet50`` (evaluate_all_models.py:71-78).

Pure numpy: accepts either torch tensors or numpy arrays, so the
converters work without torch at runtime (torch is only needed to
``load_torch_checkpoint`` a pickled ``.pth``).
"""

from __future__ import annotations

import logging
from typing import Callable, Mapping

import numpy as np

log = logging.getLogger(__name__)

# Sentinel leaf marking a tensor absent from the source state dict when
# converting in tolerant mode (torch load_state_dict(strict=False)
# semantics, reference evaluate_all_models.py:300).  Strict mode (the
# default) raises KeyError instead.
MISSING = "<missing>"


import threading


class _tolerant(threading.local):
    flag = False


_tolerant = _tolerant()


def _np(x) -> np.ndarray:
    """torch tensor | np array -> float32 numpy (detached, contiguous)."""
    if hasattr(x, "detach"):
        # .float() first: numpy() raises on torch bfloat16 tensors
        # (common in bf16 fine-tune checkpoints), and the target dtype
        # is float32 regardless
        x = x.detach().float().cpu().numpy()
    return np.ascontiguousarray(np.asarray(x), dtype=np.float32)


def _leaf(sd, key):
    try:
        return _np(sd[key])
    except KeyError:
        if _tolerant.flag:
            return MISSING
        raise


def _linear(sd, name):
    """torch Linear -> flax Dense: kernel is transposed weight."""
    w = _leaf(sd, f"{name}.weight")
    return {"kernel": w if w is MISSING else w.T,
            "bias": _leaf(sd, f"{name}.bias")}


def _layernorm(sd, name):
    return {"scale": _leaf(sd, f"{name}.weight"),
            "bias": _leaf(sd, f"{name}.bias")}


def _conv(sd, name):
    """torch Conv2d [O,I,kh,kw] -> flax Conv [kh,kw,I,O]."""
    w = _leaf(sd, f"{name}.weight")
    return {"kernel": w if w is MISSING else w.transpose(2, 3, 1, 0)}


def _bn(sd, name):
    return (
        {"scale": _leaf(sd, f"{name}.weight"),
         "bias": _leaf(sd, f"{name}.bias")},
        {"mean": _leaf(sd, f"{name}.running_mean"),
         "var": _leaf(sd, f"{name}.running_var")},
    )


def convert_partial(converter: Callable, sd: Mapping, init_variables,
                    **kwargs):
    """Run `converter` with ``load_state_dict(strict=False)`` semantics.

    Keys present in `sd` are converted; tensors the state dict lacks keep
    their values from `init_variables` (the module's own init); unexpected
    state-dict keys are ignored — exactly what the reference relies on
    when loading the published checkpoint (evaluate_all_models.py:300)
    and what `ignore_mismatched_sizes` papers over in its HF loader.

    Returns ``(variables, missing_paths)``; missing paths are logged.
    """
    _tolerant.flag = True
    try:
        converted = converter(sd, **kwargs)
    finally:
        _tolerant.flag = False
    conv_leaves = _leaves(converted)
    n_total = len(conv_leaves)
    if n_total and all(v is MISSING for v in conv_leaves):
        # NOTHING matched: this is the wrong checkpoint format (e.g. an
        # HF-layout dict fed to the timm converter), not a partial load —
        # silently returning 100% init weights would let an eval run
        # write garbage artifacts as if the checkpoint loaded.  Checked
        # BEFORE the merge: with a mismatched init tree the merge would
        # raise a per-leaf KeyError that masks this diagnosis.
        raise KeyError(
            f"state dict matched none of the {n_total} expected tensors "
            "— wrong checkpoint format for this converter")
    variables, missing = _merge_missing(converted, init_variables)
    if missing:
        log.warning("partial weight load: %d/%d tensors missing from "
                    "state dict kept their init values: %s", len(missing),
                    n_total,
                    ", ".join(missing[:8]) + ("..." if len(missing) > 8
                                              else ""))
    return variables, missing


def _leaves(tree):
    if isinstance(tree, dict):
        out = []
        for v in tree.values():
            out += _leaves(v)
        return out
    return [tree]


def _merge_missing(converted, init, path=""):
    if converted is MISSING:
        if init is None:
            raise KeyError(f"state dict missing {path} and no init value "
                           "available")
        return init, [path]
    if isinstance(converted, dict):
        out, missing = {}, []
        for k, v in converted.items():
            sub_init = init.get(k) if isinstance(init, Mapping) else None
            out[k], m = _merge_missing(v, sub_init, f"{path}/{k}" if path
                                       else str(k))
            missing += m
        return out, missing
    return converted, []


# --------------------------------------------------------------------------
# ViT backbones
# --------------------------------------------------------------------------


def vit_backbone_from_timm(sd: Mapping, prefix: str = "", depth: int = 12):
    """timm ViT-B/16 state dict -> params for :class:`..models.vit.ViT`.

    timm layout: fused ``blocks.i.attn.qkv`` [3D, D]; patch_embed is a
    16x16/stride-16 conv whose kernel flattens to our patch-GEMM kernel in
    (ph, pw, c) order — exactly the order `ViT.__call__` flattens patches.
    """
    p = prefix
    conv_w = _leaf(sd, f"{p}patch_embed.proj.weight")    # [D, C, ph, pw]
    patch_kernel = (conv_w if conv_w is MISSING else
                    conv_w.transpose(2, 3, 1, 0).reshape(-1, conv_w.shape[0]))

    params = {
        "patch_embed": {"kernel": patch_kernel,
                        "bias": _leaf(sd, f"{p}patch_embed.proj.bias")},
        "cls_token": _leaf(sd, f"{p}cls_token"),
        "pos_embed": _leaf(sd, f"{p}pos_embed"),
        "norm": _layernorm(sd, f"{p}norm"),
    }
    for i in range(depth):
        b = f"{p}blocks.{i}"
        params[f"block{i}"] = {
            "norm1": _layernorm(sd, f"{b}.norm1"),
            "attn": {"qkv": _linear(sd, f"{b}.attn.qkv"),
                     "proj": _linear(sd, f"{b}.attn.proj")},
            "norm2": _layernorm(sd, f"{b}.norm2"),
            "mlp": {"fc1": _linear(sd, f"{b}.mlp.fc1"),
                    "fc2": _linear(sd, f"{b}.mlp.fc2")},
        }
    return params


def vit_backbone_from_hf(sd: Mapping, prefix: str = "", depth: int = 12):
    """HF ViTModel state dict -> params for :class:`..models.vit.ViT`.

    HF stores separate query/key/value Linears; they fuse into our single
    qkv kernel by concatenation along the output dim (both sides reshape
    heads as (H, Dh) in the same order).
    """
    p = prefix
    conv_w = _leaf(sd, f"{p}embeddings.patch_embeddings.projection.weight")
    params = {
        "patch_embed": {
            "kernel": (conv_w if conv_w is MISSING else
                       conv_w.transpose(2, 3, 1, 0).reshape(
                           -1, conv_w.shape[0])),
            "bias": _leaf(sd,
                          f"{p}embeddings.patch_embeddings.projection.bias"),
        },
        "cls_token": _leaf(sd, f"{p}embeddings.cls_token"),
        "pos_embed": _leaf(sd, f"{p}embeddings.position_embeddings"),
        "norm": _layernorm(sd, f"{p}layernorm"),
    }
    for i in range(depth):
        b = f"{p}encoder.layer.{i}"
        wparts = [_leaf(sd, f"{b}.attention.attention.{x}.weight")
                  for x in ("query", "key", "value")]
        bparts = [_leaf(sd, f"{b}.attention.attention.{x}.bias")
                  for x in ("query", "key", "value")]
        # documented deviation from per-tensor strict=False: the fused
        # qkv kernel+bias fall back TOGETHER when any of the six HF
        # parts is absent — splicing loaded q/v columns into a random k
        # (or keeping a loaded bias against a random kernel) would
        # produce a silently-inconsistent projection
        qkv_missing = (any(w is MISSING for w in wparts)
                       or any(b_ is MISSING for b_ in bparts))
        params[f"block{i}"] = {
            "norm1": _layernorm(sd, f"{b}.layernorm_before"),
            "attn": {
                "qkv": {"kernel": (MISSING if qkv_missing else
                                   np.concatenate(wparts, axis=0).T),
                        "bias": (MISSING if qkv_missing else
                                 np.concatenate(bparts, axis=0))},
                "proj": _linear(sd, f"{b}.attention.output.dense"),
            },
            "norm2": _layernorm(sd, f"{b}.layernorm_after"),
            "mlp": {"fc1": _linear(sd, f"{b}.intermediate.dense"),
                    "fc2": _linear(sd, f"{b}.output.dense")},
        }
    return params


# --------------------------------------------------------------------------
# Full models
# --------------------------------------------------------------------------


def antispoof_from_torch(sd: Mapping, depth: int = 12):
    """Published fine-tune checkpoint -> ViTAntiSpoof variables.

    The reference state dict is ``vit.<timm names>`` plus the head as
    nn.Sequential indices: ``classifier.0`` LayerNorm, ``classifier.2``
    Linear(768,512), ``classifier.5`` Linear(512,2)
    (reference train_advanced.py:193-200).
    """
    params = {
        "vit": vit_backbone_from_timm(sd, prefix="vit.", depth=depth),
        "head": {
            "norm": _layernorm(sd, "classifier.0"),
            "fc1": _linear(sd, "classifier.2"),
            "fc2": _linear(sd, "classifier.5"),
        },
    }
    return {"params": params}


def vit_linear_from_hf(sd: Mapping, depth: int = 12):
    """HF ViTForImageClassification -> ViTLinearHead variables
    (``vit.*`` backbone + ``classifier`` Linear)."""
    params = {
        "vit": vit_backbone_from_hf(sd, prefix="vit.", depth=depth),
        "classifier": _linear(sd, "classifier"),
    }
    return {"params": params}


def resnet50_from_torchvision(sd: Mapping, stage_sizes=(3, 4, 6, 3)):
    """torchvision resnet50 state dict -> ResNet50 variables
    (params + batch_stats)."""
    params = {"conv1": _conv(sd, "conv1"), "fc": _linear(sd, "fc")}
    stats = {}
    params["bn1"], stats["bn1"] = _bn(sd, "bn1")
    for stage, n_blocks in enumerate(stage_sizes):
        for block in range(n_blocks):
            t = f"layer{stage + 1}.{block}"
            name = f"layer{stage + 1}_{block}"
            bp, bs = {}, {}
            for j in (1, 2, 3):
                bp[f"conv{j}"] = _conv(sd, f"{t}.conv{j}")
                bp[f"bn{j}"], bs[f"bn{j}"] = _bn(sd, f"{t}.bn{j}")
            if block == 0:
                # projection shortcuts exist on the FIRST block of every
                # stage structurally (torchvision resnet50) — resolved
                # through the standard lookup so an absent tensor raises
                # in strict mode / merges from init in tolerant mode,
                # instead of silently omitting the subtree and crashing
                # later on a tree-structure mismatch
                bp["downsample_conv"] = _conv(sd, f"{t}.downsample.0")
                bp["downsample_bn"], bs["downsample_bn"] = _bn(
                    sd, f"{t}.downsample.1")
            params[name] = bp
            stats[name] = bs
    return {"params": params, "batch_stats": stats}


# --------------------------------------------------------------------------
# Checkpoint IO
# --------------------------------------------------------------------------


def load_from_hf_hub(repo_id: str, filename: str) -> dict:
    """Download a published checkpoint from the HF hub and return its
    state dict (reference evaluate_all_models.py:282-304 pulls
    ``best_model_run_eif1jakb.pth`` from ``ArchitRastogi/vit-spoof-
    detection-pda``).  Gated: requires huggingface_hub + network; in an
    air-gapped run pass a local path to the converters instead."""
    from huggingface_hub import hf_hub_download

    path = hf_hub_download(repo_id=repo_id, filename=filename)
    return load_torch_checkpoint(path)


def load_torch_checkpoint(path: str) -> dict:
    """Load a torch ``.pth`` and return its flat state dict.

    Handles the reference's checkpoint dict format (epoch + state dicts +
    metrics + config, train_advanced.py:475-489) as well as bare state
    dicts; mirrors the ``weights_only=False`` load at test.py:174.
    """
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "model_state_dict" in obj:
        return obj["model_state_dict"]
    return obj


# --------------------------------------------------------------------------
# Export: framework params -> reference-format torch checkpoints
# --------------------------------------------------------------------------


def vit_backbone_to_timm(params, prefix: str = "", patch_size: int = 16,
                         channels: int = 3) -> dict:
    """Inverse of :func:`vit_backbone_from_timm`: ViT params -> flat
    timm-named numpy state dict (``{prefix}patch_embed.proj.weight`` etc.).
    """
    def lin(p):
        return {"weight": _np(p["kernel"]).T, "bias": _np(p["bias"])}

    def ln(p):
        return {"weight": _np(p["scale"]), "bias": _np(p["bias"])}

    sd = {}
    k = _np(params["patch_embed"]["kernel"])             # [p*p*c, D]
    d = k.shape[1]
    inferred = round((k.shape[0] / channels) ** 0.5)
    if inferred * inferred * channels == k.shape[0]:
        patch_size = inferred        # export any patch size, not just 16
    elif patch_size * patch_size * channels != k.shape[0]:
        raise ValueError(
            f"patch kernel rows {k.shape[0]} match neither the inferred "
            f"square patch nor patch_size={patch_size} x {channels}ch")
    sd[f"{prefix}patch_embed.proj.weight"] = k.reshape(
        patch_size, patch_size, channels, d).transpose(3, 2, 0, 1)
    sd[f"{prefix}patch_embed.proj.bias"] = _np(params["patch_embed"]["bias"])
    sd[f"{prefix}cls_token"] = _np(params["cls_token"])
    sd[f"{prefix}pos_embed"] = _np(params["pos_embed"])
    for key, val in ln(params["norm"]).items():
        sd[f"{prefix}norm.{key}"] = val
    i = 0
    while f"block{i}" in params:
        blk = params[f"block{i}"]
        flat = {
            f"blocks.{i}.norm1": ln(blk["norm1"]),
            f"blocks.{i}.attn.qkv": lin(blk["attn"]["qkv"]),
            f"blocks.{i}.attn.proj": lin(blk["attn"]["proj"]),
            f"blocks.{i}.norm2": ln(blk["norm2"]),
            f"blocks.{i}.mlp.fc1": lin(blk["mlp"]["fc1"]),
            f"blocks.{i}.mlp.fc2": lin(blk["mlp"]["fc2"]),
        }
        for mod, parts in flat.items():
            for key, val in parts.items():
                sd[f"{prefix}{mod}.{key}"] = val
        i += 1
    return sd


def antispoof_to_torch(variables) -> dict:
    """Inverse of :func:`antispoof_from_torch`: ViTAntiSpoof variables ->
    the published checkpoint's key set (``vit.<timm>`` backbone + head as
    nn.Sequential ``classifier.{0,2,5}``, train_advanced.py:193-200) so a
    user can hand a TPU-trained model back to the reference stack."""
    params = variables["params"] if "params" in variables else variables
    sd = vit_backbone_to_timm(params["vit"], prefix="vit.")
    head = params["head"]
    sd["classifier.0.weight"] = _np(head["norm"]["scale"])
    sd["classifier.0.bias"] = _np(head["norm"]["bias"])
    sd["classifier.2.weight"] = _np(head["fc1"]["kernel"]).T
    sd["classifier.2.bias"] = _np(head["fc1"]["bias"])
    sd["classifier.5.weight"] = _np(head["fc2"]["kernel"]).T
    sd["classifier.5.bias"] = _np(head["fc2"]["bias"])
    return sd


def save_torch_checkpoint(path: str, variables, *, epoch: int = 0,
                          metrics: dict | None = None,
                          config: dict | None = None) -> dict:
    """Write a reference-format ``.pth`` (the dict layout of
    train_advanced.py:475-489: epoch + model_state_dict + metrics +
    config) loadable by the reference's ``load_checkpoint``
    (test.py:167-188) and by :func:`load_torch_checkpoint`.  Returns the
    exported state dict."""
    import torch

    sd = {k: torch.from_numpy(np.ascontiguousarray(v.astype(np.float32)))
          for k, v in antispoof_to_torch(variables).items()}
    torch.save({"epoch": epoch, "model_state_dict": sd,
                "metrics": metrics or {}, "config": config or {}}, path)
    return sd
