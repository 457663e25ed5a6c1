"""Run the REFERENCE's analysis + figure scripts on OUR results tree.

The golden-replay tests (test_analysis.py) prove our analyzers replay
the reference's checked-in results tree bit-for-bit — the PRODUCING
direction.  This file proves the CONSUMING direction: the reference's
own ``additional_analysis.py`` (:16-181) and
``data_vis/generate_figures.py`` (:78-488) run UNMODIFIED on a results
tree that OUR harness writers generated, and their outputs equal our
analyzers' outputs on the same tree, byte-for-byte where the formats
are deterministic.

That closes the file-contract circle: anything our ``evaluate-all``
writes is a valid input to every downstream reference script, so a
reference user can keep their analysis pipeline and swap only the
evaluation engine.

No third-party shims are needed — torch / pandas / seaborn / matplotlib
/ PIL are all present; only the network-gated
``benchmark_inference_time`` (transformers + HF hub pulls,
additional_analysis.py:184-316) is out of scope here (covered by the
standing network-gate probe instead).
"""

import importlib.util
import json
import shutil
import sys

import numpy as np
import pytest

pd = pytest.importorskip("pandas")
from PIL import Image

from vit_spoof_detection_pda_tpu.data.manifest import Record
from vit_spoof_detection_pda_tpu.eval.harness import (
    create_comparison_reports, evaluate_scores, save_model_results)

REF_ANALYSIS = "/root/reference/testing_set_analysis_src/additional_analysis.py"
REF_FIGURES = "/root/reference/data_vis/generate_figures.py"

MODELS = ("Custom_ViT_FineTuned", "ResNet50_Pretrained",
          "Base_ViT_Pretrained")   # violin_plot.py:49-53 needs all three


def _import_file(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture
def our_results_tree(tmp_path):
    """A results tree written entirely by OUR harness writers
    (eval/harness.py::save_model_results + create_comparison_reports —
    the evaluate-all CLI's library path), over real (tiny) PNG test
    images so the reference's failed-case copier has files to copy."""
    img_dir = tmp_path / "test_inf"
    rng = np.random.default_rng(31)
    records = []
    for i in range(80):
        cls = "live" if i % 2 == 0 else "spoof"
        d = img_dir / cls
        d.mkdir(parents=True, exist_ok=True)
        p = d / f"{600000 + i}.png"
        Image.fromarray(
            rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)).save(p)
        records.append(Record(path=str(p), label=1 if cls == "live" else 0,
                              name=p.name))
    # harness convention: true_label 1 = spoof, scores = P(spoof)
    y_spoof = np.array([0 if r.label == 1 else 1 for r in records])

    out = tmp_path / "ours"
    out.mkdir()
    results = {}
    for k, name in enumerate(MODELS):
        scores = np.clip(y_spoof * 0.55 + rng.normal(0, 0.23 + 0.12 * k,
                                                     len(records)) + 0.22,
                         0, 1).astype(np.float64)
        ev = evaluate_scores(y_spoof, scores)
        results[name] = save_model_results(name, records, y_spoof, scores,
                                           ev, out)
    create_comparison_reports(results, out, len(records))
    return out, img_dir


def _strip_date(d):
    return {k: v for k, v in d.items() if k != "evaluation_date"}


@pytest.mark.slow
def test_reference_analysis_consumes_our_tree(our_results_tree, tmp_path):
    """additional_analysis.py's analyze_score_distributions /
    extract_failed_cases / generate_summary_statistics run on a COPY of
    our tree; our analyzers run on the original; every written artifact
    must match (JSON: exact parsed equality; CSV: byte equality)."""
    ours, img_dir = our_results_tree
    theirs = tmp_path / "ref_run"
    shutil.copytree(ours, theirs)

    ref = _import_file(REF_ANALYSIS, "reference_additional_analysis")
    ref_dists = ref.analyze_score_distributions(theirs)
    ref_failed = ref.extract_failed_cases(theirs, img_dir, top_n=20)
    ref_summary = ref.generate_summary_statistics(theirs)

    from vit_spoof_detection_pda_tpu.analysis.distributions import (
        analyze_score_distributions)
    from vit_spoof_detection_pda_tpu.analysis.failed_cases import (
        extract_failed_cases)
    from vit_spoof_detection_pda_tpu.analysis.summary import (
        generate_summary_statistics)

    our_dists = analyze_score_distributions(str(ours))
    our_failed = extract_failed_cases(str(ours), str(img_dir), top_n=20)
    our_summary = generate_summary_statistics(str(ours))

    # returned values agree exactly (same numpy ops on the same CSVs)
    assert our_dists == ref_dists
    assert our_failed == ref_failed
    assert _strip_date(our_summary) == _strip_date(ref_summary)

    # ... and so do the files each side wrote
    for rel in [
        "score_distribution_analysis.json",
        "failed_cases_analysis/failed_cases_summary.json",
    ]:
        got = json.loads((ours / rel).read_text())
        want = json.loads((theirs / rel).read_text())
        assert got == want, rel

    assert _strip_date(json.loads((ours / "final_summary.json")
                                  .read_text())) == \
        _strip_date(json.loads((theirs / "final_summary.json").read_text()))

    byte_files = ["score_separation_comparison.csv"]
    for m in MODELS:
        byte_files.append(f"{m}/score_distributions.csv")
        byte_files.append(f"failed_cases_analysis/{m}/false_positives.csv")
        byte_files.append(f"failed_cases_analysis/{m}/false_negatives.csv")
    for rel in byte_files:
        assert (ours / rel).read_bytes() == (theirs / rel).read_bytes(), rel

    # the copied failed-case crops carry identical score-stamped names
    for m in MODELS:
        for side in ("false_positives", "false_negatives"):
            got = sorted(p.name for p in
                         (ours / "failed_cases_analysis" / m / side)
                         .glob("*.png"))
            want = sorted(p.name for p in
                          (theirs / "failed_cases_analysis" / m / side)
                          .glob("*.png"))
            assert got == want, (m, side)
            assert got, (m, side)  # non-degenerate: cases actually exist


@pytest.mark.slow
def test_reference_figures_render_from_our_tree(our_results_tree, tmp_path,
                                                monkeypatch):
    """data_vis/generate_figures.py renders Fig4-12 from a tree in which
    every input file was written by OUR code (harness writers + our
    analyzers) — the reference's RESULTS_DIR is cwd-relative, so the
    test chdirs into a sandbox whose ``results`` is our tree."""
    ours, img_dir = our_results_tree

    # our analyzers supply the figure inputs the eval writers don't
    # (score_distributions.csv, failed-case crops)
    from vit_spoof_detection_pda_tpu.analysis.distributions import (
        analyze_score_distributions)
    from vit_spoof_detection_pda_tpu.analysis.failed_cases import (
        extract_failed_cases)
    analyze_score_distributions(str(ours))
    extract_failed_cases(str(ours), str(img_dir), top_n=20)

    sandbox = tmp_path / "figrun"
    sandbox.mkdir()
    (sandbox / "results").symlink_to(ours)
    monkeypatch.chdir(sandbox)

    ref = _import_file(REF_FIGURES, "reference_generate_figures")
    for fig in (ref.generate_figure4, ref.generate_figure5,
                ref.generate_figure6, ref.generate_figure7,
                ref.generate_figure8, ref.generate_figure9,
                ref.generate_figure10, ref.generate_figure11,
                ref.generate_figure12):
        fig()

    made = {p.name for p in (sandbox / "figures").glob("*.png")}
    for stem in ("roc_comparison", "apcer_bpcer_vit", "apcer_bpcer_resnet",
                 "score_distribution_vit", "score_distribution_resnet",
                 "confusion_matrix_vit", "confusion_matrix_resnet",
                 "misclassified_vit", "misclassified_resnet"):
        assert f"{stem}.png" in made, (stem, made)


def test_reference_small_figure_scripts_from_our_outputs(our_results_tree,
                                                         tmp_path,
                                                         monkeypatch):
    """The four small data_vis scripts run UNMODIFIED on outputs OUR
    code produced: violin_plot.py on our analyzers' distribution files,
    make_misclassified_2x2.py on our failed-case crops, and the two
    data-augmentation figures on images OUR augmentation engine
    generated (the consuming direction for every remaining offline
    figure script)."""
    ours, img_dir = our_results_tree

    from vit_spoof_detection_pda_tpu.analysis.distributions import (
        analyze_score_distributions)
    from vit_spoof_detection_pda_tpu.analysis.failed_cases import (
        extract_failed_cases)
    analyze_score_distributions(str(ours))
    extract_failed_cases(str(ours), str(img_dir), top_n=20)

    sandbox = tmp_path / "smallfigs"
    sandbox.mkdir()
    (sandbox / "results").symlink_to(ours)

    # sample_augmented_images/<s>/{spoof_original/original.jpg,
    # augmented/augmented.jpg} — the augmented half comes from OUR
    # augmentation chain (make_data_augmentation_figure.py:44-52)
    import jax
    import numpy as np
    from vit_spoof_detection_pda_tpu.augment.policy import (
        make_batch_augmenter)
    aug = make_batch_augmenter("heavy", jit=False)
    rng = np.random.default_rng(17)
    for s in range(4):
        d = sandbox / "sample_augmented_images" / f"sample{s}"
        (d / "spoof_original").mkdir(parents=True)
        (d / "augmented").mkdir()
        orig = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
        Image.fromarray(orig).save(d / "spoof_original" / "original.jpg")
        out = aug(jax.random.PRNGKey(s),
                  (orig[None].astype(np.float32) / 255.0))
        out_u8 = np.clip(np.asarray(out)[0] * 255.0, 0, 255).astype(
            np.uint8)
        Image.fromarray(out_u8).save(d / "augmented" / "augmented.jpg")

    monkeypatch.chdir(sandbox)
    violin = _import_file("/root/reference/data_vis/violin_plot.py",
                          "reference_violin")
    violin.generate_score_distribution_comparison()

    mis = _import_file(
        "/root/reference/data_vis/make_misclassified_2x2.py",
        "reference_mis2x2")
    mis.generate_misclassified_2x2(
        "Custom_ViT_FineTuned", "misclassified_vit",
        "Misclassified Samples – Custom ViT (Fine-tuned)")
    mis.generate_misclassified_2x2(
        "ResNet50_Pretrained", "misclassified_resnet",
        "Misclassified Samples – ResNet-50 (Pretrained)")

    augfig = _import_file(
        "/root/reference/data_vis/make_data_augmentation_figure.py",
        "reference_augfig")
    augfig.generate_data_augmentation_figure()
    aug2x2 = _import_file(
        "/root/reference/data_vis/make_data_augmentation_2x2.py",
        "reference_aug2x2")
    aug2x2.generate_data_augmentation_2x2()

    # generate_additional_figures.py (FigA-D) reads model_comparison.json
    # (our create_comparison_reports) + the distribution files
    addfigs = _import_file(
        "/root/reference/data_vis/generate_additional_figures.py",
        "reference_additional_figures")
    addfigs.generate_finetuning_impact()
    addfigs.generate_threshold_comparison_table()
    addfigs.generate_score_distribution_comparison()
    addfigs.generate_overlaid_histograms()

    made = {p.name for p in (sandbox / "figures").glob("*.png")}
    for stem in ("misclassified_vit", "misclassified_resnet",
                 "data_augmentation"):
        assert f"{stem}.png" in made, (stem, made)
    # violin_plot.py saves under its own figures_more/ (violin_plot.py:26)
    assert (sandbox / "figures_more"
            / "score_distribution_comparison.png").exists()
