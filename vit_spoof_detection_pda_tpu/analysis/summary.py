"""Final summary generator (reference additional_analysis.py:318-354):
best performers + performance ranges from model_comparison.csv into
``final_summary.json``."""

from __future__ import annotations

import json
import logging
from datetime import datetime
from pathlib import Path

log = logging.getLogger(__name__)


def generate_summary_statistics(results_dir: str) -> dict:
    import pandas as pd

    results = Path(results_dir)
    df = pd.read_csv(results / "model_comparison.csv")

    summary = {
        "evaluation_date": datetime.now().isoformat(),
        "total_models_evaluated": len(df),
        "best_performers": {
            "highest_auc": {
                "model": df.loc[df["roc_auc"].idxmax(), "model_name"],
                "value": float(df["roc_auc"].max()),
            },
            "lowest_eer": {
                "model": df.loc[df["eer"].idxmin(), "model_name"],
                "value": float(df["eer"].min()),
            },
            "highest_accuracy": {
                "model": df.loc[df["t0.5_accuracy"].idxmax(), "model_name"],
                "value": float(df["t0.5_accuracy"].max()),
            },
        },
        "performance_ranges": {
            "auc": {"min": float(df["roc_auc"].min()),
                    "max": float(df["roc_auc"].max())},
            "eer": {"min": float(df["eer"].min()),
                    "max": float(df["eer"].max())},
            "accuracy": {"min": float(df["t0.5_accuracy"].min()),
                         "max": float(df["t0.5_accuracy"].max())},
        },
    }
    with open(results / "final_summary.json", "w") as f:
        json.dump(summary, f, indent=2)
    return summary
