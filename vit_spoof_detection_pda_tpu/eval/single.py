"""Single-model evaluation with the test.py artifact contract.

Artifacts (reference test.py:319-451), timestamped into `output_dir`:
test_metrics_*.csv, per_image_results_*.csv, confusion_matrix_*.{csv,png},
roc_curve_*.png, per_subject_results_*.csv, test_summary_*.txt.

Convention: canonical 1=live, scores are P(live) (test.py:117, 217).
The per-image assembly is vectorized — the reference's O(n^2)
``np.where(indices == idx)`` loop (test.py:334-344, SURVEY.md §3.2) is not
reproduced.
"""

from __future__ import annotations

import logging
from datetime import datetime
from pathlib import Path
from typing import Sequence

import numpy as np

from ..data.manifest import Record
from ..metrics import parity
from .runner import run_inference

log = logging.getLogger(__name__)


def run_single_model_eval(module, variables, records: Sequence[Record], *,
                          output_dir: str, batch_size: int = 128,
                          img_size: int = 224, threshold: float = 0.5,
                          checkpoint_name: str = "",
                          write_plots: bool = True, mesh=None,
                          interpret: bool = False,
                          fastserve: bool = False):
    """Evaluate and write the full artifact set; returns (metrics, paths).

    ``fastserve=True``: score through the bench.py fused-kernel serving
    path (opt-in bf16 throughput mode, eval/runner.py)."""
    out = run_inference(module, variables, records, batch_size=batch_size,
                        img_size=img_size, mesh=mesh, interpret=interpret,
                        fastserve=fastserve)
    y_true = out["labels"]
    y_prob = out["prob1"]           # P(live)
    # decisions at the requested operating point (reference test.py uses
    # 0.5; out["pred"] is the same 0.5 cut, reused when default)
    y_pred = (out["pred"] if threshold == 0.5 else
              (np.asarray(y_prob) > threshold).astype(np.int32))

    metrics, cm = parity.calculate_metrics(y_true, y_pred, y_prob)
    paths = _save_results(metrics, cm, y_true, y_pred, y_prob, records,
                          Path(output_dir), checkpoint_name, write_plots)
    return metrics, paths


def _save_results(metrics, cm, y_true, y_pred, y_prob, records, output_dir,
                  checkpoint_name, write_plots):
    import pandas as pd

    output_dir.mkdir(parents=True, exist_ok=True)
    ts = datetime.now().strftime("%Y%m%d_%H%M%S")
    paths = {}

    paths["metrics"] = output_dir / f"test_metrics_{ts}.csv"
    pd.DataFrame([metrics]).to_csv(paths["metrics"], index=False)

    per_image = pd.DataFrame({
        "image_path": [r.path for r in records],
        "image_name": [r.name or Path(r.path).name for r in records],
        "subject_id": [r.subject or "" for r in records],
        "true_label": np.where(y_true == 1, "live", "spoof"),
        "predicted_label": np.where(y_pred == 1, "live", "spoof"),
        "probability_live": y_prob,
        "probability_spoof": 1.0 - y_prob,
        "correct": y_true == y_pred,
    })
    paths["per_image"] = output_dir / f"per_image_results_{ts}.csv"
    per_image.to_csv(paths["per_image"], index=False)

    # confusion matrix CSV (reference axis order: [spoof, live], its cm
    # comes from labels sorted ascending with 0=spoof)
    cm_df = pd.DataFrame(cm,
                         columns=["Predicted Spoof", "Predicted Live"],
                         index=["Actual Spoof", "Actual Live"])
    paths["cm_csv"] = output_dir / f"confusion_matrix_{ts}.csv"
    cm_df.to_csv(paths["cm_csv"])

    if write_plots:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        try:
            import seaborn as sns
            plt.figure(figsize=(10, 8))
            sns.heatmap(cm, annot=True, fmt="d", cmap="Blues",
                        xticklabels=["Spoof", "Live"],
                        yticklabels=["Spoof", "Live"])
            plt.title("Confusion Matrix", fontsize=16, fontweight="bold")
            plt.ylabel("True Label")
            plt.xlabel("Predicted Label")
            plt.tight_layout()
            paths["cm_png"] = output_dir / f"confusion_matrix_{ts}.png"
            plt.savefig(paths["cm_png"], dpi=300, bbox_inches="tight")
            plt.close()
        except Exception as e:                   # noqa: BLE001
            log.warning("confusion-matrix plot failed: %s", e)

        try:
            fpr, tpr, _ = parity.np_roc_curve(y_true, y_prob)
            plt.figure(figsize=(10, 8))
            plt.plot(fpr, tpr, color="darkorange", lw=2,
                     label=f"ROC curve (AUC = {metrics['auc']:.4f})")
            plt.plot([0, 1], [0, 1], color="navy", lw=2, linestyle="--",
                     label="Random")
            plt.xlim([0.0, 1.0])                # reference test.py:384-385
            plt.ylim([0.0, 1.05])
            plt.xlabel("False Positive Rate")
            plt.ylabel("True Positive Rate")
            plt.title("ROC Curve", fontsize=16, fontweight="bold")
            plt.legend(loc="lower right")
            plt.grid(alpha=0.3)
            plt.tight_layout()
            paths["roc_png"] = output_dir / f"roc_curve_{ts}.png"
            plt.savefig(paths["roc_png"], dpi=300, bbox_inches="tight")
            plt.close()
        except Exception as e:                   # noqa: BLE001
            log.warning("ROC plot failed: %s", e)

    subject = (per_image.groupby("subject_id")
               .agg(correct_predictions=("correct", "sum"),
                    total_images=("correct", "count"),
                    accuracy=("correct", "mean"))
               .round(4)
               .sort_values("accuracy"))
    paths["per_subject"] = output_dir / f"per_subject_results_{ts}.csv"
    subject.to_csv(paths["per_subject"])

    paths["summary"] = output_dir / f"test_summary_{ts}.txt"
    with open(paths["summary"], "w") as f:
        bar = "=" * 60
        sub = "-" * 60
        f.write(f"{bar}\nFACE ANTI-SPOOFING TEST REPORT\n{bar}\n\n")
        f.write(f"Checkpoint: {checkpoint_name}\n\n")
        f.write(f"OVERALL PERFORMANCE\n{sub}\n")
        f.write(f"Accuracy:        {metrics['accuracy']:.4f} "
                f"({metrics['accuracy'] * 100:.2f}%)\n")
        f.write(f"AUC-ROC:         {metrics['auc']:.4f}\n")
        f.write(f"F1-Score:        {metrics['f1_score']:.4f}\n\n")
        f.write(f"DETECTION METRICS\n{sub}\n")
        f.write(f"Precision (PPV): {metrics['precision']:.4f}\n")
        f.write(f"Recall (TPR):    {metrics['recall']:.4f}\n")
        f.write(f"Specificity:     {metrics['specificity']:.4f}\n")
        f.write(f"NPV:             {metrics['npv']:.4f}\n\n")
        f.write(f"ERROR RATES\n{sub}\n")
        f.write(f"FAR (FPR):       {metrics['far']:.4f} "
                f"({metrics['far'] * 100:.2f}%)\n")
        f.write(f"FRR (FNR):       {metrics['frr']:.4f} "
                f"({metrics['frr'] * 100:.2f}%)\n")
        f.write(f"EER:             {metrics['eer']:.4f} "
                f"({metrics['eer'] * 100:.2f}%)\n\n")
        f.write(f"CONFUSION MATRIX\n{sub}\n")
        f.write(f"True Negatives:  {metrics['tn']}\n")
        f.write(f"False Positives: {metrics['fp']}\n")
        f.write(f"False Negatives: {metrics['fn']}\n")
        f.write(f"True Positives:  {metrics['tp']}\n\n")
        f.write(f"DATASET INFO\n{sub}\n")
        f.write(f"Total Samples:   {metrics['total_samples']}\n")
        f.write(f"Live Samples:    {metrics['live_samples']}\n")
        f.write(f"Spoof Samples:   {metrics['spoof_samples']}\n")
    return paths
