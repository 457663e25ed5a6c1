"""Golden replay of the reference's ARCHIVED test.py-flavor run (the
1=live convention, reference results/archived/*) and of the harness ROC
curve files — strict curve-level oracles on top of the summary-level
replays in test_eval.py."""

import csv

import numpy as np
import pytest

from vit_spoof_detection_pda_tpu.metrics import parity


def test_archived_test_run_replay(reference_root):
    """per_image_results.csv (probability_live, 1=live) replayed through
    calculate_metrics must reproduce the archived test_summary.txt and
    test_metrics.csv numbers."""
    path = reference_root / "results" / "archived" / "per_image_results.csv"
    y_true, y_pred, y_prob = [], [], []
    with open(path) as f:
        for row in csv.DictReader(f):
            y_true.append(1 if row["true_label"] == "live" else 0)
            y_pred.append(1 if row["predicted_label"] == "live" else 0)
            y_prob.append(float(row["probability_live"]))
    y_true = np.array(y_true)
    y_pred = np.array(y_pred)
    y_prob = np.array(y_prob)

    m, cm = parity.calculate_metrics(y_true, y_pred, y_prob)

    # archived test_metrics.csv holds the exact values
    with open(reference_root / "results" / "archived" /
              "test_metrics.csv") as f:
        want = next(csv.DictReader(f))
    for field in ("accuracy", "precision", "recall", "f1_score",
                  "specificity", "npv", "far", "frr"):
        assert m[field] == pytest.approx(float(want[field]), abs=1e-9), field
    # CSV probabilities are rounded to ~4 significant digits, which
    # perturbs rank-based quantities slightly
    assert m["auc"] == pytest.approx(float(want["auc"]), abs=2e-4)
    assert m["eer"] == pytest.approx(float(want["eer"]), abs=2e-3)
    assert (m["tp"], m["tn"], m["fp"], m["fn"]) == (
        int(want["tp"]), int(want["tn"]), int(want["fp"]), int(want["fn"]))
    # headline numbers from the archived summary report
    assert m["accuracy"] == pytest.approx(0.8329, abs=5e-5)
    assert m["f1_score"] == pytest.approx(0.8780, abs=5e-5)


@pytest.mark.parametrize("model", ["Custom_ViT_FineTuned", "SigNet_F"])
def test_roc_curve_file_replay(reference_root, model):
    """Our roc_curve must reproduce the checked-in roc_curve_data.csv
    point-for-point (same drop-intermediate point set)."""
    mdir = reference_root / "results" / model
    labels, scores = [], []
    with open(mdir / "per_image_predictions.csv") as f:
        for row in csv.DictReader(f):
            labels.append(int(row["true_label"]))
            scores.append(np.float32(row["spoof_score"]))
    fpr, tpr, thr = parity.np_roc_curve(
        np.array(labels), np.array(scores, dtype=np.float64))

    want_fpr, want_tpr, want_thr = [], [], []
    with open(mdir / "roc_curve_data.csv") as f:
        for row in csv.DictReader(f):
            want_fpr.append(float(row["fpr"]))
            want_tpr.append(float(row["tpr"]))
            want_thr.append(float(row["threshold"]))
    assert len(fpr) == len(want_fpr), (len(fpr), len(want_fpr))
    np.testing.assert_allclose(fpr, want_fpr, atol=1e-12)
    np.testing.assert_allclose(tpr, want_tpr, atol=1e-12)
    np.testing.assert_allclose(thr[1:], want_thr[1:], atol=1e-9)
    assert np.isinf(thr[0]) and np.isinf(want_thr[0])


def test_simple_baseline_counts_replay(reference_root):
    """The simple baseline's test_metrics.csv stores both raw confusion
    counts and derived metrics — our device-side derivations must
    reproduce the derived columns from the counts
    (reference simple/results/test_metrics.csv)."""
    import jax.numpy as jnp

    from vit_spoof_detection_pda_tpu.metrics.device import (
        binary_metrics_from_counts)

    with open(reference_root / "simple" / "results" /
              "test_metrics.csv") as f:
        want = next(csv.DictReader(f))
    got = binary_metrics_from_counts(
        jnp.asarray(int(want["tp"])), jnp.asarray(int(want["tn"])),
        jnp.asarray(int(want["fp"])), jnp.asarray(int(want["fn"])))
    for field in ("accuracy", "precision", "recall", "f1_score",
                  "specificity", "npv", "ppv", "far", "frr"):
        assert float(got[field]) == pytest.approx(
            float(want[field]), abs=2e-7), field
