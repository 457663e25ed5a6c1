"""Model layer (reference L2).

`vit.py`      — ViT-B/16 backbone + anti-spoofing MLP head, TPU-first
                (fused QKV matmuls, bf16 compute policy, static 197-token
                sequence) — replaces timm `vit_base_patch16_224` +
                `ViTFaceAntiSpoofing` (reference train_advanced.py:187-204).
`resnet.py`   — ResNet50 classifier (reference evaluate_all_models.py:71-78).
`convert.py`  — torch state-dict importers: timm/HF ViT encoders, the
                published `best_model_run_*.pth` fine-tune checkpoint
                (reference evaluate_all_models.py:282-304), torchvision
                ResNet50.
`registry.py` — declarative model registry driving the cross-model
                harness (reference evaluate_all_models.py:458-463).
`fastserve.py`— bf16 serving fast path: whole pre-LN sub-layers as
                single Pallas programs (the bench.py headline).
`fasttrain.py`— the same fused attention-block kernel as the TRAIN-step
                forward (custom VJP, recompute-free backward).
`artifact.py` — portable serving artifacts: jax.export StableHLO
                program + weights + descriptor (`export-serving` CLI).
"""

from .registry import MODEL_REGISTRY, build_model  # noqa: F401
from .vit import ViT, ViTAntiSpoof, AntiSpoofHead  # noqa: F401
from .resnet import ResNet50  # noqa: F401
