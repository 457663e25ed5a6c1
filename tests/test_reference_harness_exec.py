"""Execute the REFERENCE's cross-model harness code against this
framework.

``evaluate_all_models.py``'s model loaders are network-gated (HF hub),
but its metric engine, inference loop, and artifact writers are not —
this file imports it UNMODIFIED (torchvision stubbed; transformers and
huggingface_hub import offline) and runs:

- its ``find_eer_threshold`` (:113-120) and
  ``calculate_metrics_at_threshold`` (:81-110) on the reference's own
  golden score vectors, against our float64 replica on identical
  inputs — THEIR code and OUR code must agree value-for-value;
- its ``evaluate_model_generic`` (:122-176) driving a real torch model,
  then its ``save_model_results`` (:179-279) writing the full artifact
  directory — byte/parse-compared against OUR
  ``eval.harness.save_model_results`` fed the identical vectors (the
  file contract proven in the EXECUTING direction, not just via golden
  replay).

Complements: test_reference_exec (test.py), test_reference_train_exec
(train_advanced.py), test_reference_simple_exec (simple/*),
test_reference_analysis_exec (analysis + figures).
"""

import importlib.util
import json
import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from test_reference_train_exec import _torchvision_stub

REF_HARNESS = ("/root/reference/testing_set_analysis_src/"
               "evaluate_all_models.py")
GOLDEN_ROOT = Path("/root/reference/results")


@pytest.fixture
def ref_harness(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    tv, tf = _torchvision_stub()
    # transformers (imported by the harness) probes torchvision via
    # importlib.util.find_spec, which requires __spec__ on the stub
    import importlib.machinery
    for mod, name in ((tv, "torchvision"),
                      (tf, "torchvision.transforms")):
        mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
    tv.models = __import__("types").ModuleType("torchvision.models")
    tv.models.__spec__ = importlib.machinery.ModuleSpec(
        "torchvision.models", None)
    monkeypatch.setitem(sys.modules, "torchvision", tv)
    monkeypatch.setitem(sys.modules, "torchvision.transforms", tf)
    monkeypatch.setitem(sys.modules, "torchvision.models", tv.models)
    spec = importlib.util.spec_from_file_location("reference_harness",
                                                  REF_HARNESS)
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)
    return ref


def _golden_vectors(max_models=2):
    import pandas as pd

    out = []
    for d in sorted(GOLDEN_ROOT.iterdir()):
        csv = d / "per_image_predictions.csv"
        if csv.exists():
            df = pd.read_csv(csv)
            y = df["true_label"].to_numpy()
            s = df["spoof_score"].to_numpy(np.float32).astype(np.float64)
            out.append((d.name, y, s))
        if len(out) == max_models:
            break
    return out


def test_reference_harness_metrics_on_golden_vectors(ref_harness):
    """THEIR find_eer_threshold + calculate_metrics_at_threshold vs OUR
    float64 replica on the reference's own checked-in score vectors."""
    from vit_spoof_detection_pda_tpu.metrics import parity

    vectors = _golden_vectors()
    assert vectors, "no golden per_image_predictions.csv found"
    for name, y, s in vectors:
        ref_eer, ref_thr = ref_harness.find_eer_threshold(y, s)
        our_eer, our_thr = parity.find_eer_threshold(y, s)
        np.testing.assert_allclose(our_eer, ref_eer, rtol=0, atol=1e-12,
                                   err_msg=name)
        np.testing.assert_allclose(our_thr, ref_thr, rtol=0, atol=1e-12,
                                   err_msg=name)
        for t in (0.1, 0.5, 0.9, float(ref_thr)):
            theirs = ref_harness.calculate_metrics_at_threshold(y, s, t)
            ours = parity.calculate_metrics_at_threshold(y, s, t)
            assert theirs.keys() == ours.keys(), (name, t)
            for k in theirs:
                np.testing.assert_allclose(
                    ours[k], theirs[k], rtol=0, atol=1e-12,
                    err_msg=f"{name} t={t} {k}")


def test_reference_harness_writers_match_ours(ref_harness, tmp_path):
    """THEIR evaluate_model_generic + save_model_results produce the
    same artifact directory as OUR evaluate_scores + save_model_results
    from identical vectors: CSVs byte-equal, JSONs parse-equal up to
    the timestamp, report equal up to the date line."""
    from vit_spoof_detection_pda_tpu.data.manifest import Record
    from vit_spoof_detection_pda_tpu.eval import harness

    # a real torch model through THEIR inference loop
    torch.manual_seed(0)
    model = torch.nn.Sequential(torch.nn.Flatten(),
                                torch.nn.Linear(3 * 8 * 8, 2))
    rng = np.random.default_rng(9)
    batches = []
    paths = []
    labels_all = []
    for b in range(3):
        x = rng.normal(0, 1, (8, 3, 8, 8)).astype(np.float32)
        y = rng.integers(0, 2, 8)
        p = tuple(f"s{b}/im{i}.png" for i in range(8))
        batches.append({"image": torch.from_numpy(x),
                        "label": torch.from_numpy(y), "path": p})
        paths.extend(p)
        labels_all.extend(y.tolist())
    ref_results = ref_harness.evaluate_model_generic(
        model, batches, "cpu", "TestModel", is_vit=False)

    ref_dir = tmp_path / "ref_out"
    ref_harness.save_model_results(ref_results, "TestModel", ref_dir)

    # OUR writers fed the identical label/score vectors
    y_spoof = np.asarray(labels_all)
    # float32, as the production eval path feeds the writer (summary
    # score_statistics are f32-computed in the reference too)
    scores = np.asarray(ref_results["scores"])
    assert scores.dtype == np.float32
    ev = harness.evaluate_scores(y_spoof, scores)
    np.testing.assert_allclose(ev["roc_auc"], ref_results["roc_auc"],
                               atol=1e-12)
    np.testing.assert_allclose(ev["eer"], ref_results["eer"], atol=1e-12)
    records = [Record(path=p, label=0) for p in paths]
    our_root = tmp_path / "our_out"
    harness.save_model_results("TestModel", records, y_spoof, scores, ev,
                               our_root)
    our_dir = our_root / "TestModel"

    for csv in ("per_image_predictions.csv", "roc_curve_data.csv",
                "threshold_analysis.csv"):
        assert (our_dir / csv).read_bytes() == (ref_dir / csv).read_bytes(), csv

    theirs = json.loads((ref_dir / "confusion_matrices.json").read_text())
    ours = json.loads((our_dir / "confusion_matrices.json").read_text())
    assert theirs == ours

    theirs = json.loads((ref_dir / "evaluation_summary.json").read_text())
    ours = json.loads((our_dir / "evaluation_summary.json").read_text())
    theirs.pop("evaluation_timestamp"), ours.pop("evaluation_timestamp")
    assert theirs == ours

    drop = lambda txt: [l for l in txt.splitlines()
                        if not l.startswith("Evaluation Date:")]
    assert drop((our_dir / "evaluation_report.txt").read_text()) == \
        drop((ref_dir / "evaluation_report.txt").read_text())
