"""TPU-native face presentation-attack detection (PAD) framework.

A from-scratch JAX / XLA / Pallas / pjit rebuild of the capabilities of the
PyTorch research stack ``ArchitRastogi20/vit-spoof-detection-pda``
(reference mounted read-only at /root/reference):

- differential data augmentation (8x live / 2x spoof; flip, rotation, color
  jitter, Gaussian blur/noise, perspective, elastic deform, sharpness) as
  on-device fused kernels (`ops/`, `augment/`),
- ViT-B/16 + ResNet50 anti-spoofing models (`models/`) trained with focal
  loss under a jit-compiled train step on a TPU device mesh (`train/`,
  `parallel/`),
- ISO/IEC 30107 PAD metrics (APCER / BPCER / EER / ROC-AUC, threshold
  tables) as device-side score reductions with an sklearn-exact parity
  path (`metrics/`),
- evaluation harnesses, artifact writers, and analysis/figure suites
  (`eval/`, `analysis/`).

Import as::

    import vit_spoof_detection_pda_tpu as pad
"""

__version__ = "0.1.0"
