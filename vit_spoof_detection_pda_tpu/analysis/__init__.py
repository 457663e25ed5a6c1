"""Analysis & reporting (reference L5).

File-contract compatible with the reference's
testing_set_analysis_src/additional_analysis.py outputs, so every
component also runs against the reference's own checked-in results/
directory:

`distributions.py` — score-distribution stats + Cohen's d / overlap.
`failed_cases.py`  — top-N false-positive / false-negative miner.
`latency.py`       — single-image latency protocol + batched throughput.
`summary.py`       — final_summary.json generator.
`figures.py`       — publication-figure suite (reference data_vis/).
`attention_maps.py` — attention-rollout saliency overlays (beyond the
reference: explains WHY a mined failed case scored as it did).
`calibration.py`   — reliability curves, ECE/MCE/Brier/NLL, temperature
scaling (beyond the reference: production deployments need calibrated
P(spoof), not just ranked scores).
"""

from .attention_maps import (attention_rollout, cls_patch_relevance,
                             generate_attention_overlays)
from .calibration import (analyze_calibration, apply_temperature,
                          calibration_errors, fit_temperature,
                          plot_reliability_diagram, reliability_curve)
from .distributions import analyze_score_distributions
from .failed_cases import extract_failed_cases
from .latency import benchmark_models, benchmark_single_image
from .summary import generate_summary_statistics

__all__ = [
    "analyze_score_distributions", "extract_failed_cases",
    "attention_rollout", "cls_patch_relevance",
    "generate_attention_overlays",
    "analyze_calibration", "apply_temperature", "calibration_errors",
    "fit_temperature", "plot_reliability_diagram", "reliability_curve",
    "benchmark_models", "benchmark_single_image",
    "generate_summary_statistics",
]
