"""Losses vs torch oracles (reference formulas, train_advanced.py:90-107,
299-312; simple/train.py:45)."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from vit_spoof_detection_pda_tpu.ops import losses


@pytest.fixture
def case():
    rng = np.random.default_rng(0)
    logits = rng.standard_normal((32, 2)).astype(np.float32) * 3
    labels = rng.integers(0, 2, 32)
    return logits, labels


def test_ce_matches_torch(case):
    logits, labels = case
    got = float(losses.cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
    want = float(F.cross_entropy(torch.from_numpy(logits),
                                 torch.from_numpy(labels)))
    assert got == pytest.approx(want, rel=1e-6)


def test_smoothed_ce_matches_torch(case):
    logits, labels = case
    got = float(losses.cross_entropy(
        jnp.asarray(logits), jnp.asarray(labels), label_smoothing=0.1))
    want = float(F.cross_entropy(torch.from_numpy(logits),
                                 torch.from_numpy(labels),
                                 label_smoothing=0.1))
    assert got == pytest.approx(want, rel=1e-6)


def test_weighted_ce_matches_torch(case):
    logits, labels = case
    w = np.array([0.7, 1.9], np.float32)
    got = float(losses.cross_entropy(
        jnp.asarray(logits), jnp.asarray(labels), class_weights=jnp.asarray(w)))
    want = float(F.cross_entropy(torch.from_numpy(logits),
                                 torch.from_numpy(labels),
                                 weight=torch.from_numpy(w)))
    assert got == pytest.approx(want, rel=1e-6)


def test_focal_matches_reference_formula(case):
    """alpha*(1-pt)^gamma * CE with pt = exp(-CE)."""
    logits, labels = case
    for alpha, gamma in [(0.25, 2.0), (0.35, 1.5)]:
        got = float(losses.focal_loss(
            jnp.asarray(logits), jnp.asarray(labels),
            alpha=alpha, gamma=gamma))
        ce = F.cross_entropy(torch.from_numpy(logits),
                             torch.from_numpy(labels), reduction="none")
        pt = torch.exp(-ce)
        want = float((alpha * (1 - pt) ** gamma * ce).mean())
        assert got == pytest.approx(want, rel=1e-5)


def test_class_weights_from_counts():
    """total/(2*count_c) rule (train_advanced.py:522-529)."""
    w = np.asarray(losses.class_weights_from_counts([100, 300]))
    assert w[0] == pytest.approx(400 / 200)
    assert w[1] == pytest.approx(400 / 600)


def test_loss_factory():
    fn = losses.make_loss_fn("focal", focal_alpha=0.25, focal_gamma=2.0)
    out = fn(jnp.zeros((4, 2)), jnp.zeros(4, jnp.int32))
    assert np.isfinite(float(out))
    with pytest.raises(ValueError):
        losses.make_loss_fn("weighted_ce")
    with pytest.raises(ValueError):
        losses.make_loss_fn("nope")


def test_cross_entropy_weights_plus_smoothing_matches_torch():
    """The combined class_weights + label_smoothing case: torch weights
    each class term of the smoothed target (not the whole per-sample
    loss) and normalizes the mean by sum(w[label])."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    logits = rng.standard_normal((5, 3)).astype(np.float32)
    labels = np.array([0, 1, 2, 1, 0])
    w = np.array([0.5, 2.0, 1.0], np.float32)
    for s in (0.0, 0.2):
        want = F.cross_entropy(torch.tensor(logits), torch.tensor(labels),
                               weight=torch.tensor(w),
                               label_smoothing=s).item()
        got = float(losses.cross_entropy(
            jnp.asarray(logits), jnp.asarray(labels),
            class_weights=w, label_smoothing=s))
        assert got == pytest.approx(want, rel=1e-6), (s, got, want)


def test_cross_entropy_rejects_bad_reduction():
    with pytest.raises(ValueError, match="reduction"):
        losses.cross_entropy(jnp.zeros((2, 2)), jnp.zeros(2, jnp.int32),
                             reduction="avg")
