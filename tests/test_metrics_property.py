"""Property-based parity: the float64 sklearn-replica metrics engine
(metrics/parity.py) against the REAL sklearn across adversarial inputs
hypothesis can shrink to — heavy score ties, duplicate thresholds, tiny
n, all-one-class predictions at a threshold.

The bit-parity north star (SURVEY.md §4: "sklearn is the oracle") is
already pinned on random vectors and the golden artifacts
(test_metrics_parity.py, test_golden_archived.py); these properties add
the tie/degenerate corners random draws rarely hit.  Reference call
sites: test.py:223-280, evaluate_all_models.py:81-119.
"""

import numpy as np
import sklearn.metrics as skm
from hypothesis import given, settings, strategies as st

from vit_spoof_detection_pda_tpu.metrics import parity as P

# score pools: a tiny discrete grid (forces ties / duplicate thresholds)
# and float32-quantized uniforms (the artifact CSV parse path)
_tied = st.sampled_from([0.0, 0.25, 0.5, 0.5, 0.75, 1.0])
_cont = st.floats(min_value=0.0, max_value=1.0, allow_nan=False,
                  width=32)
_score = st.one_of(_tied, _cont)


@st.composite
def labeled_scores(draw, min_size=2, max_size=64, both_classes=True):
    n = draw(st.integers(min_size, max_size))
    labels = draw(st.lists(st.integers(0, 1), min_size=n, max_size=n))
    if both_classes:
        # guarantee one of each without rejection-sampling waste
        labels[0] = 0
        labels[-1] = 1
    scores = draw(st.lists(_score, min_size=n, max_size=n))
    return (np.asarray(labels, np.int64),
            np.asarray(scores, np.float64))


@settings(max_examples=200, deadline=None)
@given(labeled_scores())
def test_roc_curve_bit_equal_sklearn(data):
    y, s = data
    for drop in (True, False):
        ours = P.np_roc_curve(y, s, drop_intermediate=drop)
        ref = skm.roc_curve(y, s, drop_intermediate=drop)
        for a, b, name in zip(ours, ref, ("fpr", "tpr", "thresholds")):
            np.testing.assert_array_equal(a, b, err_msg=name)


@settings(max_examples=200, deadline=None)
@given(labeled_scores())
def test_auc_bit_equal_sklearn(data):
    y, s = data
    assert P.np_roc_auc_score(y, s) == skm.roc_auc_score(y, s)


@settings(max_examples=150, deadline=None)
@given(labeled_scores(both_classes=False),
       st.floats(min_value=0.0, max_value=1.0, allow_nan=False))
def test_threshold_row_matches_sklearn(data, thr):
    """Threshold-table row (evaluate_all_models.py:81-110 semantics) vs
    sklearn confusion_matrix + zero_division=0 P/R/F1 — including
    single-class y_true and all-one-class predictions."""
    y, s = data
    row = P.calculate_metrics_at_threshold(y, s, thr)
    pred = (s >= thr).astype(int)
    tn, fp, fn, tp = skm.confusion_matrix(y, pred,
                                          labels=[0, 1]).ravel()
    assert (row["tn"], row["fp"], row["fn"], row["tp"]) == (
        tn, fp, fn, tp)
    assert row["accuracy"] == skm.accuracy_score(y, pred)
    pr, rc, f1, _ = skm.precision_recall_fscore_support(
        y, pred, labels=[1], average=None, zero_division=0)
    assert row["precision"] == pr[0]
    assert row["recall"] == rc[0]
    assert row["f1_score"] == f1[0]
    # APCER/BPCER from the raw counts (zero-denominator -> 0)
    assert row["apcer"] == (fp / (fp + tn) if fp + tn else 0)
    assert row["bpcer"] == (fn / (fn + tp) if fn + tp else 0)


@settings(max_examples=200, deadline=None)
@given(labeled_scores())
def test_eer_matches_sklearn_rederivation(data):
    """find_eer_threshold == the same argmin computed from sklearn's own
    roc_curve output (evaluate_all_models.py:113-119 formula)."""
    y, s = data
    eer, thr = P.find_eer_threshold(y, s)
    fpr, tpr, thresholds = skm.roc_curve(y, s)
    idx = np.argmin(np.abs(fpr - (1 - tpr)))
    assert eer == fpr[idx]
    assert thr == thresholds[idx]


@settings(max_examples=100, deadline=None)
@given(labeled_scores(both_classes=False))
def test_single_class_auc_is_nan_not_raise(data):
    """Reference behavior: AUC on a single-class vector falls back
    instead of propagating sklearn's ValueError (test.py:234-238)."""
    y, s = data
    if len(np.unique(y)) == 2:
        return
    assert np.isnan(P.np_roc_auc_score(y, s))
