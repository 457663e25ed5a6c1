"""PAD metrics engine (reference L4).

Two paths with one semantics:

- :mod:`.device` — pure-``jnp``, jit/pjit-friendly, static-shape reductions
  that run on TPU as part of eval steps (scores never leave the device until
  the final scalars are fetched).
- :mod:`.parity` — float64 NumPy re-implementations that are bit-exact
  against scikit-learn at the API level, mirroring BOTH reference flavors:
  ``calculate_metrics`` (reference test.py:223-280) and
  ``calculate_metrics_at_threshold`` / ``find_eer_threshold``
  (reference testing_set_analysis_src/evaluate_all_models.py:81-119).
"""

from .device import (
    auc,
    binary_metrics_from_counts,
    confusion_at_thresholds,
    eer_harness,
    eer_mean,
    masked_roc,
    optimal_threshold_f1,
    threshold_table,
)
from .parity import (
    calculate_metrics,
    calculate_metrics_at_threshold,
    find_eer_threshold,
    np_auc_trapezoid,
    np_roc_auc_score,
    np_roc_curve,
)

__all__ = [
    "auc",
    "binary_metrics_from_counts",
    "confusion_at_thresholds",
    "eer_harness",
    "eer_mean",
    "masked_roc",
    "optimal_threshold_f1",
    "threshold_table",
    "calculate_metrics",
    "calculate_metrics_at_threshold",
    "find_eer_threshold",
    "np_auc_trapezoid",
    "np_roc_auc_score",
    "np_roc_curve",
]
