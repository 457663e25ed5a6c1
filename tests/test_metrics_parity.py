"""Parity tests: our NumPy metric replicas vs actual scikit-learn, plus
golden replay of the reference's checked-in result artifacts."""

import csv
import json

import numpy as np
import pytest
import sklearn.metrics as skm

from vit_spoof_detection_pda_tpu.metrics import parity


def _random_case(rng, n, tie_frac=0.0, quantize=None):
    labels = (rng.random(n) < rng.uniform(0.2, 0.8)).astype(int)
    if labels.sum() == 0:
        labels[0] = 1
    if labels.sum() == n:
        labels[0] = 0
    scores = rng.random(n)
    if quantize:
        scores = np.round(scores, quantize)
    if tie_frac:
        k = int(n * tie_frac)
        scores[rng.choice(n, k, replace=False)] = 0.5
    return labels, scores.astype(np.float64)


CASES = [
    dict(n=10), dict(n=100), dict(n=1747),
    dict(n=500, tie_frac=0.3), dict(n=200, quantize=2),
    dict(n=50, tie_frac=0.9), dict(n=3),
]


@pytest.mark.parametrize("case", CASES)
def test_roc_curve_matches_sklearn(case):
    rng = np.random.default_rng(0)
    labels, scores = _random_case(rng, **case)
    for drop in (True, False):
        f1, t1, th1 = parity.np_roc_curve(labels, scores, drop_intermediate=drop)
        f2, t2, th2 = skm.roc_curve(labels, scores, drop_intermediate=drop)
        np.testing.assert_array_equal(f1, f2)
        np.testing.assert_array_equal(t1, t2)
        np.testing.assert_array_equal(th1, th2)


@pytest.mark.parametrize("case", CASES)
def test_roc_auc_matches_sklearn(case):
    rng = np.random.default_rng(1)
    labels, scores = _random_case(rng, **case)
    assert parity.np_roc_auc_score(labels, scores) == pytest.approx(
        skm.roc_auc_score(labels, scores), abs=0, rel=0
    )


@pytest.mark.parametrize("case", CASES)
def test_threshold_metrics_match_sklearn(case):
    rng = np.random.default_rng(2)
    labels, scores = _random_case(rng, **case)
    for t in [0.1, 0.5, 0.7, 0.9]:
        row = parity.calculate_metrics_at_threshold(labels, scores, t)
        pred = (scores >= t).astype(int)
        tn, fp, fn, tp = skm.confusion_matrix(labels, pred, labels=[0, 1]).ravel()
        assert (row["tn"], row["fp"], row["fn"], row["tp"]) == (tn, fp, fn, tp)
        assert row["accuracy"] == pytest.approx(skm.accuracy_score(labels, pred))
        assert row["precision"] == pytest.approx(
            skm.precision_score(labels, pred, zero_division=0))
        assert row["recall"] == pytest.approx(
            skm.recall_score(labels, pred, zero_division=0))
        assert row["f1_score"] == pytest.approx(
            skm.f1_score(labels, pred, zero_division=0))


def test_calculate_metrics_full_flavor():
    rng = np.random.default_rng(3)
    labels, scores = _random_case(rng, 400, tie_frac=0.1)
    pred = (scores >= 0.5).astype(int)
    m, cm = parity.calculate_metrics(labels, pred, scores)
    p, r, f1, _ = skm.precision_recall_fscore_support(
        labels, pred, average="binary", zero_division=0)
    assert m["precision"] == pytest.approx(p)
    assert m["recall"] == pytest.approx(r)
    assert m["f1_score"] == pytest.approx(f1)
    assert m["auc"] == pytest.approx(skm.roc_auc_score(labels, scores), rel=0, abs=0)
    np.testing.assert_array_equal(cm, skm.confusion_matrix(labels, pred))
    # EER replicates the reference formula exactly
    fpr, tpr, _ = skm.roc_curve(labels, scores)
    fnr = 1 - tpr
    i = np.nanargmin(np.abs(fnr - fpr))
    assert m["eer"] == pytest.approx((fpr[i] + fnr[i]) / 2, rel=0, abs=0)


# --------------------------------------------------------------------------
# Golden replay: reference results/* artifacts are regression oracles
# (SURVEY.md §4 — replay per_image_predictions.csv through our engine and
# require equality with evaluation_summary.json / model_comparison.json).
# --------------------------------------------------------------------------

MODELS = [
    "Custom_ViT_FineTuned",
    "Base_ViT_Pretrained",
    "ResNet50_Pretrained",
    "SigNet_F",
]


def _load_scores(reference_root, model):
    path = reference_root / "results" / model / "per_image_predictions.csv"
    labels, scores = [], []
    with open(path) as f:
        for row in csv.DictReader(f):
            labels.append(int(row["true_label"]))
            # scores were float32 in the reference run; the CSV stores the
            # float32 repr — reparse through float32 to recover bit-exact.
            scores.append(np.float32(row["spoof_score"]))
    return np.array(labels), np.array(scores, dtype=np.float64)


@pytest.mark.parametrize("model", MODELS)
def test_golden_replay_summary(reference_root, model):
    labels, scores = _load_scores(reference_root, model)
    with open(reference_root / "results" / model / "evaluation_summary.json") as f:
        summary = json.load(f)

    auc = parity.np_roc_auc_score(labels, scores)
    assert auc == pytest.approx(summary["roc_auc"], abs=1e-12)

    eer, eer_t = parity.find_eer_threshold(labels, scores)
    assert eer == pytest.approx(summary["eer"], abs=1e-12)
    assert eer_t == pytest.approx(summary["eer_threshold"], abs=1e-12)

    for key, t in [("threshold_0.5", 0.5), ("threshold_0.7", 0.7),
                   ("threshold_eer", eer_t)]:
        if key not in summary.get("operating_points", {}):
            continue
        want = summary["operating_points"][key]
        got = parity.calculate_metrics_at_threshold(labels, scores, t)
        for field in ("accuracy", "precision", "recall", "f1_score",
                      "apcer", "bpcer"):
            assert got[field] == pytest.approx(want[field], abs=1e-12), (
                model, key, field)


@pytest.mark.parametrize("model", MODELS)
def test_golden_replay_threshold_table(reference_root, model):
    labels, scores = _load_scores(reference_root, model)
    path = reference_root / "results" / model / "threshold_analysis.csv"
    with open(path) as f:
        rows = list(csv.DictReader(f))
    for row in rows:
        got = parity.calculate_metrics_at_threshold(
            labels, scores, float(row["threshold"]))
        for field in ("accuracy", "precision", "recall", "f1_score",
                      "apcer", "bpcer", "far", "frr"):
            assert got[field] == pytest.approx(float(row[field]), abs=1e-9), (
                model, row["threshold"], field)
        for field in ("tp", "tn", "fp", "fn"):
            assert got[field] == int(row[field])
