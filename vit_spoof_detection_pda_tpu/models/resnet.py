"""ResNet50 classifier (reference baseline).

Replaces torchvision ``resnet50(pretrained=True)`` with the fc replaced by
a 2-way head (reference evaluate_all_models.py:71-78, also the untrained
"SigNet_F" placeholder, :336-355).  Standard bottleneck-v1 topology so
torchvision checkpoints convert 1:1 (`convert.resnet50_from_torchvision`).

TPU notes: NHWC layout, convs lowered by XLA onto the MXU; BatchNorm runs
in inference mode with folded running statistics by default (the reference
only ever evaluates this model — it never trains it).  `train=True`
enables batch-stat mode for completeness.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1 bottleneck with identity/projection shortcut."""

    features: int           # bottleneck width; output is 4*features
    strides: int = 1
    project: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), strides=(self.strides,) * 2,
                    padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features * 4, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv3")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn3")(y)
        if self.project:
            residual = nn.Conv(self.features * 4, (1, 1),
                               strides=(self.strides,) * 2, use_bias=False,
                               dtype=self.dtype, name="downsample_conv")(x)
            residual = nn.BatchNorm(use_running_average=not train,
                                    momentum=0.9, epsilon=1e-5,
                                    dtype=self.dtype,
                                    name="downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNet50(nn.Module):
    """ResNet50-v1 with a `num_classes`-way fc head."""

    num_classes: int = 2
    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        """x: [B, H, W, 3] normalized floats. Returns [B, num_classes]."""
        x = x.astype(self.dtype)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        features = 64
        for stage, n_blocks in enumerate(self.stage_sizes):
            for block in range(n_blocks):
                strides = 2 if stage > 0 and block == 0 else 1
                x = Bottleneck(
                    features, strides=strides, project=(block == 0),
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_{block}")(x, train=train)
            features *= 2

        x = jnp.mean(x, axis=(1, 2))          # global average pool
        return nn.Dense(self.num_classes, dtype=jnp.float32, name="fc")(
            x.astype(jnp.float32))
