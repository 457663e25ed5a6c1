"""Classification losses (reference L3).

- focal loss: alpha * (1-pt)^gamma * CE, the reference's default
  (train_advanced.py:90-107, alpha=0.25 gamma=2.0),
- weighted CE with per-class weights total/(2*count_c)
  (train_advanced.py:299-312, 522-529),
- label-smoothed CE (the simple baseline, simple/train.py:45).

All pure jnp on logits [B, C] + int labels [B]; stable log-softmax;
float32 accumulation regardless of compute dtype.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _log_softmax(logits):
    return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)


def cross_entropy(logits, labels, *, label_smoothing: float = 0.0,
                  class_weights: Optional[jnp.ndarray] = None,
                  reduction: str = "mean"):
    """CE with optional label smoothing and per-class weights.

    Matches torch.nn.functional.cross_entropy semantics: with class
    weights, the 'mean' reduction divides by the sum of sample weights
    (not the batch size); with smoothing, the target distribution is
    (1-s)*onehot + s/C.
    """
    if reduction not in ("mean", "sum", "none"):
        raise ValueError(f"invalid reduction {reduction!r} "
                         "(mean | sum | none)")     # torch raises too
    logp = _log_softmax(logits)
    c = logits.shape[-1]
    onehot = jax.nn.one_hot(labels, c, dtype=jnp.float32)
    if label_smoothing > 0.0:
        target = onehot * (1.0 - label_smoothing) + label_smoothing / c
    else:
        target = onehot
    if class_weights is not None:
        wc = jnp.asarray(class_weights, jnp.float32)
        # torch weights each CLASS TERM of the smoothed target by w_c
        # (not the whole per-sample loss by w[label]) and normalizes
        # the mean by sum(w[label]) — the two agree only without
        # smoothing
        per_sample = -jnp.sum(target * wc * logp, axis=-1)
        if reduction == "mean":
            return jnp.sum(per_sample) / jnp.sum(wc[labels])
    else:
        per_sample = -jnp.sum(target * logp, axis=-1)
    if reduction == "mean":
        return jnp.mean(per_sample)
    if reduction == "sum":
        return jnp.sum(per_sample)
    return per_sample


def focal_loss(logits, labels, *, alpha: float = 0.25, gamma: float = 2.0,
               reduction: str = "mean"):
    """alpha * (1 - pt)^gamma * CE_per_sample, pt = exp(-CE)
    (reference FocalLoss, train_advanced.py:90-107)."""
    ce = cross_entropy(logits, labels, reduction="none")
    pt = jnp.exp(-ce)
    fl = alpha * (1.0 - pt) ** gamma * ce
    if reduction == "mean":
        return jnp.mean(fl)
    if reduction == "sum":
        return jnp.sum(fl)
    return fl


def class_weights_from_counts(counts):
    """total / (num_classes * count_c) — the reference's balancing rule
    (train_advanced.py:522-529 with 2 classes)."""
    counts = jnp.asarray(counts, jnp.float32)
    total = jnp.sum(counts)
    return total / (counts.shape[0] * jnp.maximum(counts, 1.0))


def make_loss_fn(loss_type: str, *, focal_alpha: float = 0.25,
                 focal_gamma: float = 2.0, label_smoothing: float = 0.0,
                 class_weights=None):
    """Loss factory (reference get_loss_function, train_advanced.py:299-312:
    'focal' | 'weighted_ce' | 'ce')."""
    if loss_type == "focal":
        return lambda logits, labels: focal_loss(
            logits, labels, alpha=focal_alpha, gamma=focal_gamma)
    if loss_type == "weighted_ce":
        if class_weights is None:
            raise ValueError("weighted_ce requires class_weights")
        w = jnp.asarray(class_weights, jnp.float32)
        return lambda logits, labels: cross_entropy(
            logits, labels, class_weights=w)
    if loss_type == "ce":
        return lambda logits, labels: cross_entropy(
            logits, labels, label_smoothing=label_smoothing)
    raise ValueError(f"unknown loss_type: {loss_type!r}")
