"""On-device image ops & losses.

`image.py`   — deterministic preprocessing: bilinear resize, ImageNet
               normalization, fused eval preprocess (replaces the
               reference's torchvision CPU transforms,
               train_advanced.py:179-183, test.py:157-163).
`warp.py`    — shared bilinear resampling core (affine / perspective /
               elastic displacement) used by the geometric augmentations.
`augment.py` — per-sample stochastic augmentation ops, vmapped over batch
               with threaded PRNG keys (replaces Kornia pipelines,
               reference augment_data.py:51-107, and torchvision train
               transforms, train_advanced.py:166-177).
`losses.py`  — focal / weighted-CE / label-smoothed CE (reference
               train_advanced.py:90-107, 299-312; simple/train.py:45).
`nlm.py`     — fast non-local-means denoise (README.md:106 claims it; the
               reference never implements it — provided here as an
               optional preprocessing stage, Pallas-accelerated on TPU).
"""

from . import augment, image, losses, warp  # noqa: F401
