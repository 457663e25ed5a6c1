"""Failed-case miner: worst false positives / false negatives per model.

Reference contract (additional_analysis.py:103-181): top-N FPs = live
images with the highest spoof scores, top-N FNs = spoof images with the
lowest; images copied as ``FP_score{s:.4f}_{name}`` /
``FN_score{s:.4f}_{name}`` into
``results/failed_cases_analysis/<model>/{false_positives,false_negatives}``
with per-model CSVs and a root ``failed_cases_summary.json``.
"""

from __future__ import annotations

import json
import logging
import shutil
from pathlib import Path

import numpy as np

log = logging.getLogger(__name__)


def extract_failed_cases(results_dir: str, test_data_dir: str = "",
                         top_n: int = 20) -> dict:
    import pandas as pd

    results = Path(results_dir)
    failed_dir = results / "failed_cases_analysis"
    failed_dir.mkdir(exist_ok=True)
    all_failed = {}

    for model_dir in sorted(p for p in results.iterdir() if p.is_dir()):
        if model_dir.name == "failed_cases_analysis":
            continue
        pred_file = model_dir / "per_image_predictions.csv"
        if not pred_file.exists():
            continue
        df = pd.read_csv(pred_file)
        df["error"] = np.abs(df["true_label"] - df["spoof_score"])
        df["prediction_0.5"] = (df["spoof_score"] >= 0.5).astype(int)

        fps = df[(df["true_label"] == 0) & (df["prediction_0.5"] == 1)
                 ].nlargest(top_n, "spoof_score")
        fns = df[(df["true_label"] == 1) & (df["prediction_0.5"] == 0)
                 ].nsmallest(top_n, "spoof_score")

        mdir = failed_dir / model_dir.name
        fp_dir = mdir / "false_positives"
        fn_dir = mdir / "false_negatives"
        fp_dir.mkdir(parents=True, exist_ok=True)
        fn_dir.mkdir(parents=True, exist_ok=True)

        def collect(rows, out_dir, prefix, true_label):
            cases = []
            for _, row in rows.iterrows():
                src = Path(row["image_path"])
                if not src.is_absolute() and test_data_dir:
                    src = Path(test_data_dir) / src
                if not src.exists():
                    # reference records ONLY cases whose image file is
                    # reachable (additional_analysis.py:142-150); the
                    # total_* counts still reflect the full top-N frames
                    continue
                shutil.copy2(src, out_dir /
                             f"{prefix}_score{row['spoof_score']:.4f}_"
                             f"{src.name}")
                cases.append({
                    "image": Path(row["image_path"]).name,
                    "true_label": true_label,
                    "predicted_score": float(row["spoof_score"]),
                    "error_magnitude": float(row["error"]),
                })
            return cases

        fp_cases = collect(fps, fp_dir, "FP", "live")
        fn_cases = collect(fns, fn_dir, "FN", "spoof")
        all_failed[model_dir.name] = {
            "false_positives": fp_cases,
            "false_negatives": fn_cases,
            "total_fp": len(fps),
            "total_fn": len(fns),
        }
        pd.DataFrame(fp_cases).to_csv(mdir / "false_positives.csv",
                                      index=False)
        pd.DataFrame(fn_cases).to_csv(mdir / "false_negatives.csv",
                                      index=False)
        log.info("%s: %d FP / %d FN mined", model_dir.name,
                 len(fp_cases), len(fn_cases))

    with open(failed_dir / "failed_cases_summary.json", "w") as f:
        json.dump(all_failed, f, indent=2)
    return all_failed
