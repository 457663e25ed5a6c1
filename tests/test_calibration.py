"""Calibration toolkit (analysis/calibration.py): sklearn parity of the
reliability curve, hand-oracle ECE, temperature recovery on synthetic
miscalibration, monotonicity, and the results-tree report + CLI."""

import json

import numpy as np
import pytest

from vit_spoof_detection_pda_tpu.analysis.calibration import (
    analyze_calibration, apply_temperature, calibration_errors,
    fit_temperature, plot_reliability_diagram, reliability_curve)


@pytest.fixture()
def results_tree(reference_root, tmp_path):
    """The reference's per-image prediction artifacts in a writable
    tree (the calibration report writes next to them)."""
    import shutil
    src = reference_root / "results"
    dst = tmp_path / "results"
    dst.mkdir()
    for mdir in src.iterdir():
        pred = mdir / "per_image_predictions.csv" if mdir.is_dir() else None
        if pred is None or not pred.exists():
            continue
        (dst / mdir.name).mkdir()
        shutil.copy2(pred, dst / mdir.name / pred.name)
    return dst


def _miscalibrated(n=4000, true_t=2.0, seed=0):
    """Labels drawn from sigmoid(z); reported scores sigmoid(z * true_t)
    — overconfident by exactly a temperature of true_t."""
    rng = np.random.default_rng(seed)
    z = rng.normal(0.0, 1.5, n)
    y = (rng.random(n) < 1 / (1 + np.exp(-z))).astype(np.int64)
    p = 1 / (1 + np.exp(-z * true_t))
    return p, y


@pytest.mark.parametrize("strategy", ["uniform", "quantile"])
def test_reliability_curve_matches_sklearn(strategy):
    sk = pytest.importorskip("sklearn.calibration")
    p, y = _miscalibrated()
    want_true, want_pred = sk.calibration_curve(
        y, p, n_bins=12, strategy=strategy)
    got_true, got_pred, counts = reliability_curve(
        p, y, n_bins=12, strategy=strategy)
    np.testing.assert_allclose(got_true, want_true, rtol=1e-12)
    np.testing.assert_allclose(got_pred, want_pred, rtol=1e-12)
    assert counts.sum() == len(p) and np.all(counts > 0)


def test_reliability_curve_validates():
    with pytest.raises(ValueError, match="strategy"):
        reliability_curve([0.5], [1], strategy="log")
    with pytest.raises(ValueError, match="empty"):
        reliability_curve([], [])
    with pytest.raises(ValueError, match="vs labels"):
        reliability_curve([0.5, 0.6], [1])


def test_calibration_errors_hand_oracle():
    """Two uniform bins, hand-computable: scores {0.2 x2, 0.8 x2},
    labels {0,1} in each bin -> both bins have acc 0.5."""
    p = np.array([0.2, 0.2, 0.8, 0.8])
    y = np.array([0, 1, 0, 1])
    e = calibration_errors(p, y, n_bins=2)
    assert e["ece"] == pytest.approx(0.3)          # |0.5-0.2|=|0.5-0.8|
    assert e["mce"] == pytest.approx(0.3)
    assert e["brier"] == pytest.approx(np.mean((p - y) ** 2))
    want_nll = -np.mean(y * np.log(p) + (1 - y) * np.log(1 - p))
    assert e["nll"] == pytest.approx(want_nll, rel=1e-9)


def test_fit_temperature_recovers_true_scale():
    p, y = _miscalibrated(true_t=2.0)
    t = fit_temperature(p, y)
    assert 1.7 <= t <= 2.3, t                       # sampling noise
    before = calibration_errors(p, y)
    after = calibration_errors(apply_temperature(p, t), y)
    assert after["nll"] < before["nll"]
    assert after["ece"] < before["ece"]

    # already-calibrated scores fit T ~ 1
    rng = np.random.default_rng(1)
    z = rng.normal(0, 1.5, 4000)
    pc = 1 / (1 + np.exp(-z))
    yc = (rng.random(4000) < pc).astype(np.int64)
    assert 0.9 <= fit_temperature(pc, yc) <= 1.1


def test_apply_temperature_is_monotone_and_validated():
    p = np.linspace(0.01, 0.99, 50)
    q = apply_temperature(p, 2.5)
    assert np.all(np.diff(q) > 0)                   # order preserved
    np.testing.assert_allclose(apply_temperature(p, 1.0), p, atol=1e-12)
    with pytest.raises(ValueError, match="temperature"):
        apply_temperature(p, 0.0)


def test_degenerate_scores_do_not_crash():
    # all-identical scores: hessian is 0 -> T stays 1
    assert fit_temperature([0.5] * 8, [0, 1] * 4) == pytest.approx(1.0)
    # perfect scores at the clip boundary
    t = fit_temperature([0.0, 0.0, 1.0, 1.0], [0, 0, 1, 1])
    assert t > 0


def test_analyze_calibration_over_reference_tree(results_tree):
    """The report runs over the reference's own checked-in results tree
    (golden-replay smoke) and temperature scaling never hurts NLL."""
    report = analyze_calibration(str(results_tree), n_bins=10)
    assert set(report) >= {"Custom_ViT_FineTuned", "ResNet50_Pretrained"}
    for name, row in report.items():
        assert row["after"]["nll"] <= row["before"]["nll"] + 1e-9, name
        assert row["temperature"] > 0
        assert (results_tree / name / "calibration_curve.csv").exists()
    on_disk = json.loads(
        (results_tree / "calibration_analysis.json").read_text())
    assert on_disk.keys() == report.keys()

    fig = plot_reliability_diagram(str(results_tree))
    assert fig is not None and fig.endswith(".png")


def test_analyze_cli_calibration_flag(results_tree):
    from vit_spoof_detection_pda_tpu.cli.analyze import main
    out = main(["--results-dir", str(results_tree), "--calibration",
                "--calibration-bins", "8"])
    assert "calibration" in out
    row = next(iter(out["calibration"].values()))
    assert row["n_bins"] == 8
    assert out["calibration_figure"].endswith(".png")
