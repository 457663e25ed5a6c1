"""Device (jnp) metric reductions vs the sklearn-exact parity module."""

import numpy as np
import pytest
import sklearn.metrics as skm

import jax
import jax.numpy as jnp

from vit_spoof_detection_pda_tpu.metrics import device as dm
from vit_spoof_detection_pda_tpu.metrics import parity


def _case(seed, n, tie_frac=0.0):
    rng = np.random.default_rng(seed)
    labels = (rng.random(n) < 0.4).astype(int)
    labels[0], labels[1] = 0, 1
    scores = rng.random(n).astype(np.float32)
    if tie_frac:
        k = int(n * tie_frac)
        scores[rng.choice(n, k, replace=False)] = np.float32(0.5)
    return labels, scores


@pytest.mark.parametrize("seed,n,ties", [(0, 64, 0), (1, 500, 0.3),
                                         (2, 1747, 0), (3, 33, 0.9)])
def test_auc_matches_sklearn(seed, n, ties):
    labels, scores = _case(seed, n, ties)
    got = float(dm.auc(scores, labels))
    want = skm.roc_auc_score(labels, scores.astype(np.float64))
    assert got == pytest.approx(want, abs=2e-6)


@pytest.mark.parametrize("seed,n,ties", [(0, 64, 0), (1, 500, 0.3), (3, 33, 0.9)])
def test_masked_roc_matches_sklearn_point_set(seed, n, ties):
    labels, scores = _case(seed, n, ties)
    for drop in (True, False):
        roc = dm.masked_roc(scores, labels, drop_intermediate=drop)
        valid = np.asarray(roc.valid)
        fpr = np.asarray(roc.fpr)[valid]
        tpr = np.asarray(roc.tpr)[valid]
        thr = np.asarray(roc.thresholds)[valid]
        f2, t2, th2 = skm.roc_curve(
            labels, scores.astype(np.float64), drop_intermediate=drop)
        assert fpr.shape == f2.shape
        np.testing.assert_allclose(fpr, f2, atol=1e-6)
        np.testing.assert_allclose(tpr, t2, atol=1e-6)
        np.testing.assert_allclose(thr[1:], th2[1:], atol=1e-6)
        assert np.isinf(thr[0])


@pytest.mark.parametrize("seed,n,ties", [(0, 64, 0), (1, 500, 0.3), (2, 1747, 0)])
def test_eer_flavors(seed, n, ties):
    labels, scores = _case(seed, n, ties)
    want_eer, want_t = parity.find_eer_threshold(
        labels, scores.astype(np.float64))
    got_eer, got_t = dm.eer_harness(scores, labels)
    assert float(got_eer) == pytest.approx(want_eer, abs=1e-6)
    assert float(got_t) == pytest.approx(want_t, abs=1e-6)

    m, _ = parity.calculate_metrics(
        labels, (scores >= 0.5).astype(int), scores.astype(np.float64))
    assert float(dm.eer_mean(scores, labels)) == pytest.approx(m["eer"], abs=1e-6)


def test_threshold_table_matches_parity():
    labels, scores = _case(5, 800, 0.2)
    # Literal grid like the reference harness (evaluate_all_models.py:162);
    # np.linspace would give 0.5000000000000001 at slot 4 which flips
    # float32-vs-float64 tie handling at exactly 0.5.
    grid = np.array([0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9])
    table = jax.jit(dm.threshold_table)(
        jnp.asarray(scores), jnp.asarray(labels), jnp.asarray(grid))
    for i, t in enumerate(grid):
        want = parity.calculate_metrics_at_threshold(
            labels, scores.astype(np.float64), float(t))
        for field in ("accuracy", "precision", "recall", "f1_score",
                      "apcer", "bpcer"):
            assert float(table[field][i]) == pytest.approx(
                want[field], abs=1e-6), (t, field)
        for field in ("tp", "tn", "fp", "fn"):
            assert int(table[field][i]) == want[field]


def test_optimal_threshold_f1_matches_reference_sweep():
    """Reference sweep: linspace(0.3, 0.7, 41), max F1
    (train_advanced.py:239-278)."""
    labels, scores = _case(6, 600)
    t, f1, _ = dm.optimal_threshold_f1(scores, labels)
    best = max(
        (skm.f1_score(labels, (scores >= tt).astype(int), zero_division=0), tt)
        for tt in np.linspace(0.3, 0.7, 41)
    )
    assert float(f1) == pytest.approx(best[0], abs=1e-6)
    assert float(t) == pytest.approx(best[1], abs=1e-6)


def test_device_metrics_jit_and_vectorized():
    """The whole table computation compiles as one XLA program."""
    labels, scores = _case(7, 256)
    fn = jax.jit(lambda s, l: dm.optimal_threshold_f1(s, l)[1])
    out = fn(jnp.asarray(scores), jnp.asarray(labels))
    assert np.isfinite(float(out))


def test_single_class_eer_matches_parity():
    """Single-class score vectors must degrade exactly like the host
    parity path (sklearn NaNs the whole rate vector, argmin lands on
    slot 0) — not return a confident mid-curve EER."""
    from vit_spoof_detection_pda_tpu.metrics import parity
    from vit_spoof_detection_pda_tpu.metrics.device import (eer_harness,
                                                            eer_mean)

    s = np.array([0.9, 0.8, 0.7, 0.2], np.float32)
    for labels in ([0, 0, 0, 0], [1, 1, 1, 1]):
        y = np.array(labels)
        want = parity.find_eer_threshold(y, s)
        got = tuple(float(x) for x in eer_harness(s, y))
        np.testing.assert_equal(got[1], want[1])            # inf
        if np.isnan(want[0]):
            assert np.isnan(got[0])
        else:
            assert got[0] == want[0]
        assert np.isnan(float(eer_mean(s, y)))


def test_optimal_threshold_f1_all_zero_falls_back_to_half():
    """Reference find_optimal_threshold initializes best_threshold=0.5
    and only updates on strictly greater F1 (train_advanced.py:246-251)
    — an all-zero sweep returns 0.5, not the grid edge."""
    from vit_spoof_detection_pda_tpu.metrics.device import (
        optimal_threshold_f1)

    t, f1, _ = optimal_threshold_f1(np.array([0.1, 0.2, 0.1], np.float32),
                                    np.array([0, 0, 0]))
    assert float(f1) == 0.0 and float(t) == 0.5
