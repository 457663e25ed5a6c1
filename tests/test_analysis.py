"""Analysis suite vs the reference's own checked-in results/ directory
(golden replay) plus smoke tests of latency benchmarking and figures."""

import json
import pathlib
import shutil

import numpy as np
import pytest

from vit_spoof_detection_pda_tpu.analysis import (
    analyze_score_distributions, extract_failed_cases,
    generate_summary_statistics)


@pytest.fixture()
def results_tree(reference_root, tmp_path):
    """Copy the reference's CSV/JSON result artifacts (not images) into a
    writable tree."""
    src = reference_root / "results"
    dst = tmp_path / "results"
    dst.mkdir()
    for mdir in src.iterdir():
        if not mdir.is_dir() or mdir.name in ("archived",
                                              "failed_cases_analysis"):
            continue
        (dst / mdir.name).mkdir()
        for f in mdir.glob("*.csv"):
            shutil.copy2(f, dst / mdir.name / f.name)
        for f in mdir.glob("*.json"):
            shutil.copy2(f, dst / mdir.name / f.name)
    shutil.copy2(src / "model_comparison.csv", dst / "model_comparison.csv")
    # the failed-case extractor records only cases whose image file is
    # reachable (reference semantics) — point the per-image paths at
    # dummy files so the golden case lists replay in full
    import pandas as pd
    img_root = tmp_path / "imgs"
    img_root.mkdir()
    for mdir in dst.iterdir():
        pred = mdir / "per_image_predictions.csv" if mdir.is_dir() else None
        if pred and pred.exists():
            df = pd.read_csv(pred)
            new_paths = []
            for ip in df["image_path"]:
                f = img_root / pathlib.Path(ip).name
                if not f.exists():
                    f.write_bytes(b"x")
                new_paths.append(str(f))
            df["image_path"] = new_paths
            df.to_csv(pred, index=False)
    return dst


def test_distributions_golden_replay(reference_root, results_tree):
    got = analyze_score_distributions(str(results_tree))
    want = json.load(open(
        reference_root / "results" / "score_distribution_analysis.json"))
    assert set(got) == set(want)
    for model in want:
        for cls in ("live_scores", "spoof_scores"):
            for k, v in want[model][cls].items():
                assert got[model][cls][k] == pytest.approx(v, abs=1e-6), (
                    model, cls, k)
        for k, v in want[model]["separation_metrics"].items():
            assert got[model]["separation_metrics"][k] == pytest.approx(
                v, abs=1e-5), (model, k)
    # artifacts written
    assert (results_tree / "score_distribution_analysis.json").exists()
    assert (results_tree / "score_separation_comparison.csv").exists()
    assert (results_tree / "Custom_ViT_FineTuned" /
            "score_distributions.csv").exists()


def test_failed_cases_golden_counts(reference_root, results_tree):
    got = extract_failed_cases(str(results_tree), top_n=20)
    want = json.load(open(reference_root / "results" /
                          "failed_cases_analysis" /
                          "failed_cases_summary.json"))
    for model in want:
        assert got[model]["total_fp"] == want[model]["total_fp"], model
        assert got[model]["total_fn"] == want[model]["total_fn"], model
        # same worst-case scores in the same order
        w_scores = [c["predicted_score"]
                    for c in want[model]["false_positives"]]
        g_scores = [c["predicted_score"]
                    for c in got[model]["false_positives"]]
        np.testing.assert_allclose(g_scores, w_scores, atol=1e-6)
    assert (results_tree / "failed_cases_analysis" /
            "failed_cases_summary.json").exists()


def test_summary_golden(reference_root, results_tree):
    got = generate_summary_statistics(str(results_tree))
    want = json.load(open(
        reference_root / "results" / "final_summary.json"))
    assert got["best_performers"]["highest_auc"]["model"] == \
        want["best_performers"]["highest_auc"]["model"]
    assert got["best_performers"]["highest_auc"]["value"] == pytest.approx(
        want["best_performers"]["highest_auc"]["value"], abs=1e-9)
    assert got["best_performers"]["lowest_eer"]["model"] == \
        want["best_performers"]["lowest_eer"]["model"]
    assert got["performance_ranges"]["auc"] == pytest.approx(
        want["performance_ranges"]["auc"], abs=1e-9)


def test_latency_single_image(tmp_path):
    from flax import linen as nn
    import jax.numpy as jnp

    from vit_spoof_detection_pda_tpu.analysis.latency import (
        benchmark_models, benchmark_throughput)
    from vit_spoof_detection_pda_tpu.data import scan_test
    from util_synthetic import make_subject_tree

    class Net(nn.Module):
        @nn.compact
        def __call__(self, x, *, train=False):
            return nn.Dense(2)(jnp.mean(x, axis=(1, 2)))

    make_subject_tree(tmp_path / "data", subjects=2, per_class=4, size=32)
    records = scan_test(str(tmp_path / "data"))
    import jax
    net = Net()
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))

    res = benchmark_models(
        {"TinyNet": lambda: (net, variables)}, records,
        output_dir=str(tmp_path / "out"), n_images=8, batch_size=8)
    r = res["TinyNet"]
    for key in ("mean_time_ms", "std_time_ms", "min_time_ms",
                "max_time_ms", "median_time_ms", "fps", "total_samples"):
        assert key in r
    assert r["total_samples"] == 8
    # the json artifact keeps EXACTLY the reference's stat keys; the
    # throughput extension lives in its own artifact
    assert "throughput" not in r
    import json as _json
    tj = _json.loads((tmp_path / "out" /
                      "throughput_benchmark.json").read_text())
    assert tj["TinyNet"]["images_per_second"] > 0
    bj = _json.loads((tmp_path / "out" /
                      "inference_time_benchmark.json").read_text())
    assert set(bj["TinyNet"]) == {
        "mean_time_ms", "std_time_ms", "min_time_ms", "max_time_ms",
        "median_time_ms", "fps", "total_samples"}
    assert (tmp_path / "out" / "inference_time_comparison.csv").exists()


@pytest.mark.slow
def test_figures_generate_from_reference_tree(results_tree, tmp_path):
    from vit_spoof_detection_pda_tpu.analysis.figures import (
        generate_all_figures)

    sample = np.random.default_rng(0).random((32, 32, 3)).astype(np.float32)
    figs = generate_all_figures(str(results_tree), str(tmp_path / "figs"),
                                sample_image=sample)
    made = [k for k, v in figs.items()
            if v is not None and not str(v).startswith("ERROR")]
    # everything except the misclassified grids (no images copied) renders
    for key in ("roc_comparison", "apcer_bpcer", "score_histograms",
                "confusion_matrices", "finetuning_impact",
                "threshold_table", "violin", "overlaid_histograms",
                "augmentation_grid", "augmentation_2x2"):
        assert key in made, (key, figs.get(key))
        assert (tmp_path / "figs").glob("*.png")


def test_benchmark_cli_smoke(tmp_path):
    """benchmark CLI runs end-to-end on a tiny placeholder model."""
    from vit_spoof_detection_pda_tpu.cli.benchmark import main
    out = main(["--model", "SigNet_F", "--batch-size", "4", "--iters", "2",
                "--set", "data.img_size=64"])
    assert out["images_per_second"] > 0
    assert out["batch_size"] == 4


def test_benchmark_train_step(tmp_path):
    """benchmark_train_step times the compiled fwd+bwd+AdamW program on
    a tiny module (library surface; the CLI mode builds the flagship)."""
    import jax.numpy as jnp

    from vit_spoof_detection_pda_tpu.analysis.latency import (
        benchmark_train_step)
    from vit_spoof_detection_pda_tpu.models.vit import ViTAntiSpoof

    module = ViTAntiSpoof(patch_size=8, embed_dim=32, depth=2,
                          num_heads=2, hidden=16, dtype=jnp.float32)
    out = benchmark_train_step(module, batch_size=4, img_size=16,
                               iters=2, fused=False)
    assert out["images_per_second"] > 0
    assert out["ms_per_step"] > 0
    assert out["fused_forward"] is False
    assert out["achieved_tflops"] >= 0


def test_vit_flops_per_image():
    """Analytic ViT FLOPs: the flagship B/16 @ 224 lands at the
    published 17.6 GMACs forward figure (x2 in FLOPs); non-ViT modules
    return None."""
    from vit_spoof_detection_pda_tpu.analysis.latency import (
        vit_flops_per_image)
    from vit_spoof_detection_pda_tpu.models.resnet import ResNet50
    from vit_spoof_detection_pda_tpu.models.vit import ViTAntiSpoof

    fl = vit_flops_per_image(ViTAntiSpoof(), 224)
    assert 34e9 < fl < 36.5e9, fl
    assert vit_flops_per_image(ResNet50(num_classes=2), 224) is None


def test_benchmark_cli_train_step_validation():
    """--train-step is its own mode and rejects inference-mode flags."""
    import pytest

    from vit_spoof_detection_pda_tpu.cli.benchmark import main
    with pytest.raises(SystemExit):
        main(["--train-step", "--device-latency"])
    with pytest.raises(SystemExit):
        main(["--train-step", "--fastserve"])
    with pytest.raises(SystemExit):
        main(["--train-step", "--model", "ResNet50_Pretrained"])
    with pytest.raises(SystemExit):
        main(["--no-fused-forward"])


def test_benchmark_cli_device_latency(tmp_path):
    """--device-latency runs the differenced per-exec protocol end-to-end
    (bs=1 is the reference's single-image headline protocol)."""
    from vit_spoof_detection_pda_tpu.cli.benchmark import main
    out = main(["--model", "SigNet_F", "--batch-size", "1",
                "--device-latency", "--n1", "3",
                "--set", "data.img_size=64"])
    assert out["batch_size"] == 1
    assert out["ms_per_image"] == out["ms_per_exec"]
    assert out["images_per_second"] > 0


def test_benchmark_cli_device_latency_loop_iters(tmp_path):
    """--loop-iters runs the dispatch-free protocol (N executions inside
    one compiled fori_loop program; BENCH_NOTES round 28): the result
    must be finite, flagged, and numerically sane on the tiny model."""
    from vit_spoof_detection_pda_tpu.cli.benchmark import main
    out = main(["--model", "SigNet_F", "--batch-size", "1",
                "--device-latency", "--n1", "4", "--loop-iters", "2",
                "--set", "data.img_size=64"])
    assert out["dispatch_free"] is True and out["loop_iters"] == 2
    assert out["ms_per_exec"] > 0 and out["images_per_second"] > 0


def test_benchmark_cli_lowlat_validation():
    """--lowlat composes only with --device-latency and fails fast on a
    non-TPU backend without --interpret (same contract as --fastserve,
    cli/common.py::validate_fastserve)."""
    import pytest

    from vit_spoof_detection_pda_tpu.cli.benchmark import main
    with pytest.raises(SystemExit):
        main(["--lowlat"])                      # needs --device-latency
    with pytest.raises(SystemExit, match="interpret"):
        main(["--lowlat", "--device-latency"])  # CPU backend, no escape
    # --fastserve --device-latency builds serving_forward directly (no
    # make_fastserve_infer): the same fail-fast must fire BEFORE the
    # model loads
    with pytest.raises(SystemExit, match="fastserve"):
        main(["--fastserve", "--device-latency"])


def test_benchmark_cli_lowlat_batch_grid(monkeypatch):
    """--lowlat-batch-grid routes the device-latency protocol through
    serving_forward_lowlat_batch (per-chunk weight streaming) and
    rejects the linear-head models (the pack needs the anti-spoof
    head)."""
    import jax
    import jax.numpy as jnp
    import pytest

    import vit_spoof_detection_pda_tpu.cli.benchmark as bench_cli
    from vit_spoof_detection_pda_tpu.models.vit import (ViTAntiSpoof,
                                                        ViTLinearHead)

    small = ViTAntiSpoof(patch_size=16, embed_dim=64, depth=1,
                         num_heads=2, hidden=16)
    sv = small.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    monkeypatch.setattr(bench_cli, "build_model",
                        lambda name, **kw: (small, sv))
    out = bench_cli.main(["--device-latency", "--lowlat",
                          "--lowlat-batch-grid", "--interpret",
                          "--n1", "2", "--batch-size", "2",
                          "--set", "data.img_size=32"])
    assert out["ms_per_image"] > 0

    monkeypatch.setattr(bench_cli, "build_model",
                        lambda name, **kw: (ViTLinearHead(), sv))
    with pytest.raises(SystemExit):       # parser.error -> exit code 2
        bench_cli.main(["--device-latency", "--lowlat",
                        "--lowlat-batch-grid", "--interpret",
                        "--n1", "2", "--batch-size", "2",
                        "--set", "data.img_size=32"])


def test_reference_quirk_figures_and_publication_style(results_tree,
                                                       tmp_path):
    """Fig5/6 replicas (frr-as-APCER quirk, generate_figures.py:158-161)
    render at publication dpi (rcParams, :36-44); misclassified grids
    default to the reference's exclusion lists (:14-32)."""
    from PIL import Image
    from vit_spoof_detection_pda_tpu.analysis import figures as F

    p = F.figure_apcer_bpcer_reference(
        str(results_tree), str(tmp_path), model="Custom_ViT_FineTuned")
    assert p is not None and p.name == "apcer_bpcer_Custom_ViT_FineTuned.png"
    dpi = Image.open(p).info.get("dpi", (0, 0))
    assert round(dpi[0]) == 300, dpi

    # quirk: the plotted x data is the frr column, not apcer
    import pandas as pd
    df = pd.read_csv(results_tree / "Custom_ViT_FineTuned" /
                     "threshold_analysis.csv")
    assert not np.allclose(df["frr"], df["apcer"])   # quirk is observable

    # exclusion defaults come from the reference's publication list
    assert "FP_score0.8125_513034.png" in F.EXCLUDED_IMAGES[
        "Custom_ViT_FineTuned"]["false_positives"]


def test_benchmark_cli_profile_trace(tmp_path):
    """--profile captures a TensorBoard trace of exactly the timed
    program (works in every mode; hardware-verified through the relay,
    exp_r19)."""
    from vit_spoof_detection_pda_tpu.cli.benchmark import main
    trace_dir = tmp_path / "trace"
    out = main(["--model", "SigNet_F", "--batch-size", "2", "--iters", "2",
                "--set", "data.img_size=64",
                "--profile", str(trace_dir)])
    assert out["images_per_second"] > 0
    files = [p for p in trace_dir.rglob("*") if p.is_file()]
    assert files, "profiler trace produced no files"


def test_analyze_xprof_cli(tmp_path):
    """analyze --xprof summarizes a jax.profiler trace (CPU captures
    carry no TPU device plane, so the table is empty but the plumbing —
    xplane discovery, plugin conversion, gviz parsing, CLI — runs end
    to end; the round-20 train-step anatomy used this exact path on a
    hardware trace)."""
    import pytest

    pytest.importorskip("tensorflow")
    import jax
    import jax.numpy as jnp

    trace = tmp_path / "trace"
    jax.profiler.start_trace(str(trace))
    x = jnp.ones((64, 64))
    float(jax.jit(lambda a: (a @ a).sum())(x))
    jax.profiler.stop_trace()

    from vit_spoof_detection_pda_tpu.cli.analyze import main
    out = main(["--xprof", str(trace), "--xprof-steps", "1"])
    s = out["xprof"]
    assert s["xplane_files"] and s["per_step"]
    assert isinstance(s["by_category"], list)
    assert isinstance(s["top_ops"], list)

    from vit_spoof_detection_pda_tpu.analysis.xprof import summarize_trace
    with pytest.raises(FileNotFoundError):
        summarize_trace(str(tmp_path / "nope"))
