"""Device-side (jnp) PAD metric reductions.

Everything here is shape-static and jit/pjit-friendly: metrics are computed
as masked reductions over fixed-size arrays so they can live inside a
compiled eval step on TPU.  The reference computes all of this on host CPU
with scikit-learn (test.py:223-280, evaluate_all_models.py:81-119); here the
score vector stays on device and only final scalars are fetched.

Conventions
-----------
``labels`` are int {0,1}; ``scores`` are P(label==1).  Which class is
"positive" is a caller decision — the train/test stack uses 1=live with
score=P(live) (reference test.py:117,217) and the cross-model harness uses
1=spoof with score=P(spoof) (reference evaluate_all_models.py:38-42,145).
The formulas below are convention-agnostic: APCER/BPCER are FAR/FRR of the
positive class exactly as written in evaluate_all_models.py:91-94.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


# --------------------------------------------------------------------------
# Confusion counts & derived binary metrics
# --------------------------------------------------------------------------


def confusion_at_thresholds(scores, labels, thresholds):
    """Vectorized confusion counts at each threshold.

    Predictions are ``score >= t`` (reference evaluate_all_models.py:82).
    Returns ``(tp, tn, fp, fn)`` each of shape ``thresholds.shape``.
    One pass over the data, broadcast over the threshold grid — the
    TPU-native replacement for the reference's per-threshold sklearn
    ``confusion_matrix`` loop (evaluate_all_models.py:162-163).
    """
    scores = jnp.asarray(scores)
    labels = jnp.asarray(labels)
    thresholds = jnp.asarray(thresholds)
    pred = scores[None, :] >= thresholds[..., None]          # [T, N]
    pos = (labels == 1)[None, :]
    tp = jnp.sum(pred & pos, axis=-1)
    fp = jnp.sum(pred & ~pos, axis=-1)
    # fn/tn follow from the per-class totals — two O(T*N) reductions
    # instead of four (exact integer counts either way)
    n_pos = jnp.sum(labels == 1)
    n_neg = labels.shape[0] - n_pos
    return tp, n_neg - fp, fp, n_pos - tp


def _safe_div(num, den):
    """num/den with zero_division=0 semantics (safe under jit: the divisor
    is replaced by 1 where den<=0 so no inf/nan ever forms)."""
    den = jnp.asarray(den, jnp.float32)
    return jnp.where(den > 0, num / jnp.where(den > 0, den, 1.0), 0.0)


def binary_metrics_from_counts(tp, tn, fp, fn):
    """Derived metrics from confusion counts (zero_division=0 semantics).

    Matches reference test.py:229-252 and evaluate_all_models.py:86-94:
    accuracy, precision(=ppv), recall, f1, specificity, npv,
    far(=apcer)=fp/(fp+tn), frr(=bpcer)=fn/(fn+tp).
    """
    tp = jnp.asarray(tp, jnp.float32)
    tn = jnp.asarray(tn, jnp.float32)
    fp = jnp.asarray(fp, jnp.float32)
    fn = jnp.asarray(fn, jnp.float32)
    total = tp + tn + fp + fn
    precision = _safe_div(tp, tp + fp)
    recall = _safe_div(tp, tp + fn)
    # sklearn's count form (2tp / (2tp+fp+fn)) — rounds like the oracle
    # where 2PR/(P+R) can differ in the last ulp (metrics/parity.py)
    f1 = _safe_div(2 * tp, 2 * tp + fp + fn)
    far = _safe_div(fp, fp + tn)
    frr = _safe_div(fn, fn + tp)
    return {
        "accuracy": _safe_div(tp + tn, total),
        "precision": precision,
        "recall": recall,
        "f1_score": f1,
        "specificity": _safe_div(tn, tn + fp),
        "npv": _safe_div(tn, tn + fn),
        "ppv": precision,
        "far": far,
        "frr": frr,
        "apcer": far,
        "bpcer": frr,
    }


def threshold_table(scores, labels, thresholds):
    """Full threshold-analysis table as a dict of arrays [T].

    Device-side equivalent of looping ``calculate_metrics_at_threshold``
    over the grid (reference evaluate_all_models.py:162-163); one compiled
    broadcast instead of T sklearn calls.
    """
    tp, tn, fp, fn = confusion_at_thresholds(scores, labels, thresholds)
    out = binary_metrics_from_counts(tp, tn, fp, fn)
    out.update(
        threshold=jnp.asarray(thresholds, jnp.float32),
        tp=tp, tn=tn, fp=fp, fn=fn,
    )
    return out


def optimal_threshold_f1(scores, labels, t_min=0.3, t_max=0.7, steps=41):
    """Max-F1 threshold sweep (reference train_advanced.py:239-278).

    Returns (best_threshold, best_f1, table) — the full sweep table is what
    the reference logs to W&B (train_advanced.py:267-275).
    """
    grid = jnp.linspace(t_min, t_max, steps)
    table = threshold_table(scores, labels, grid)
    idx = jnp.argmax(table["f1_score"])
    best_f1 = table["f1_score"][idx]
    # reference initializes best_threshold=0.5 and only updates on a
    # STRICTLY greater F1 (train_advanced.py:246-251) — when the whole
    # sweep is F1 == 0 it returns 0.5, not the grid's left edge
    best_t = jnp.where(best_f1 > 0, grid[idx], jnp.float32(0.5))
    return best_t, best_f1, table


# --------------------------------------------------------------------------
# ROC curve with static shapes + validity masks
# --------------------------------------------------------------------------


class MaskedRoc(NamedTuple):
    """Static-shape ROC curve of length N+1.

    Slot 0 is sklearn's synthetic ``(fpr=0, tpr=0, threshold=inf)`` point;
    slots 1..N align with descending-score order and are valid only at
    distinct-threshold boundaries (and, if ``drop_intermediate``, only at
    non-collinear corners — exactly sklearn's ``roc_curve`` point set).
    """

    fpr: jax.Array
    tpr: jax.Array
    thresholds: jax.Array
    valid: jax.Array


def masked_roc(scores, labels, *, drop_intermediate: bool = True) -> MaskedRoc:
    """sklearn-semantics ROC curve with static shapes.

    Mirrors sklearn.metrics.roc_curve (which the reference calls at
    test.py:254 and evaluate_all_models.py:114 with default
    drop_intermediate=True): stable descending sort, cumulative tp/fp at
    distinct thresholds, collinear-interior-point dropping via the
    second-difference test, and the prepended inf point.  Because XLA needs
    static shapes, dropped points are masked out rather than removed.
    """
    scores = jnp.asarray(scores, jnp.float32)
    labels = jnp.asarray(labels)
    n = scores.shape[0]

    # Stable descending sort (sklearn: mergesort ascending then reversed).
    order = jnp.argsort(-scores, stable=True)
    s = scores[order]
    y = (labels[order] == 1).astype(jnp.float32)

    tps = jnp.cumsum(y)                              # [N]
    idx1 = jnp.arange(1, n + 1, dtype=jnp.float32)
    fps = idx1 - tps

    # Distinct-threshold boundaries: last position of each tied group.
    is_last = jnp.concatenate([s[:-1] != s[1:], jnp.ones((1,), bool)])

    # drop_intermediate: keep boundary i unless both its fps and tps second
    # differences (over the *boundary subsequence*) vanish.  Neighbor
    # boundaries are found with exclusive cummax / reverse-cummin tricks so
    # shapes stay static.
    if drop_intermediate and n > 2:
        pos = jnp.arange(n)
        prev_seq = jnp.where(is_last, pos, -1)
        prev_idx = jnp.concatenate(
            [jnp.full((1,), -1, dtype=pos.dtype),
             jax.lax.cummax(prev_seq)[:-1]]
        )                                             # nearest boundary < i
        next_seq = jnp.where(is_last, pos, n)
        next_idx = jnp.concatenate(
            [jax.lax.cummin(next_seq[::-1])[::-1][1:],
             jnp.full((1,), n, dtype=pos.dtype)]
        )                                             # nearest boundary > i
        has_prev = prev_idx >= 0
        has_next = next_idx < n
        p = jnp.clip(prev_idx, 0, n - 1)
        nx = jnp.clip(next_idx, 0, n - 1)
        d2_fps = (fps[nx] - fps) - (fps - fps[p])
        d2_tps = (tps[nx] - tps) - (tps - tps[p])
        corner = (d2_fps != 0) | (d2_tps != 0)
        keep = is_last & (~has_prev | ~has_next | corner)
    else:
        keep = is_last

    n_pos = tps[-1]
    n_neg = fps[-1]
    # sklearn returns NaN rates when a class is absent (roc_curve warns
    # and divides by zero); zero_division-style 0s here would make the
    # downstream EER look like a confident 0.0 on single-class input,
    # where the host parity path correctly degrades to NaN
    nan = jnp.full((), jnp.nan, jnp.float32)
    # the NaN gate covers the prepended slot 0 too: sklearn divides the
    # WHOLE vector (including its synthetic leading 0) by the class
    # count, so single-class input NaNs every point — argmin over the
    # all-NaN gap then lands on index 0 exactly like np.argmin does in
    # the parity path, yielding (0.0, inf) / (nan, inf) instead of a
    # confident mid-curve EER (slot 0 hardcoded real was the bug)
    fpr = jnp.where(n_neg > 0,
                    jnp.concatenate([jnp.zeros((1,)),
                                     _safe_div(fps, n_neg)]), nan)
    tpr = jnp.where(n_pos > 0,
                    jnp.concatenate([jnp.zeros((1,)),
                                     _safe_div(tps, n_pos)]), nan)
    thr = jnp.concatenate([jnp.full((1,), jnp.inf, jnp.float32), s])
    valid = jnp.concatenate([jnp.ones((1,), bool), keep])
    return MaskedRoc(fpr, tpr, thr, valid)


# --------------------------------------------------------------------------
# AUC (rank statistic — exact under ties, no curve materialization)
# --------------------------------------------------------------------------


def auc(scores, labels):
    """ROC-AUC via the Mann-Whitney rank statistic with tie correction.

    Mathematically identical to trapezoidal area under the full ROC curve
    (what sklearn.roc_auc_score computes, called by reference test.py:235);
    computed as a single sort + two searchsorted passes, which maps onto
    TPU better than masked trapezoid gathers.
    """
    scores = jnp.asarray(scores, jnp.float32)
    pos = jnp.asarray(labels) == 1
    s_sorted = jnp.sort(scores)
    first = jnp.searchsorted(s_sorted, scores, side="left").astype(jnp.float32)
    last = jnp.searchsorted(s_sorted, scores, side="right").astype(jnp.float32)
    avg_rank = (first + last + 1.0) / 2.0            # 1-based average ranks
    n_pos = jnp.sum(pos.astype(jnp.float32))
    n_neg = scores.shape[0] - n_pos
    rank_sum = jnp.sum(jnp.where(pos, avg_rank, 0.0))
    u = rank_sum - n_pos * (n_pos + 1.0) / 2.0
    return jnp.where((n_pos > 0) & (n_neg > 0), u / (n_pos * n_neg), 0.0)


# --------------------------------------------------------------------------
# EER — both reference flavors
# --------------------------------------------------------------------------


def eer_mean(scores, labels):
    """EER as (fpr+fnr)/2 at argmin |fnr-fpr| (reference test.py:253-257)."""
    roc = masked_roc(scores, labels, drop_intermediate=True)
    fnr = 1.0 - roc.tpr
    gap = jnp.where(roc.valid, jnp.abs(fnr - roc.fpr), jnp.inf)
    i = jnp.argmin(gap)
    return (roc.fpr[i] + fnr[i]) / 2.0


def eer_harness(scores, labels):
    """(eer, threshold) with eer=fpr at the EER index
    (reference evaluate_all_models.py:113-119)."""
    roc = masked_roc(scores, labels, drop_intermediate=True)
    fnr = 1.0 - roc.tpr
    gap = jnp.where(roc.valid, jnp.abs(roc.fpr - fnr), jnp.inf)
    i = jnp.argmin(gap)
    return roc.fpr[i], roc.thresholds[i]
