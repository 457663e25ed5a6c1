"""`demo` command: the one-command lifecycle proof (VERDICT r3 item 8).

Runs the full synth -> augment -> train -> test -> evaluate-all ->
analyze -> export-serving -> describe -> predict -> export sequence
in-process on the CPU backend and checks every stage's artifact."""

import pytest


@pytest.mark.slow
def test_demo_full_lifecycle(tmp_path):
    from vit_spoof_detection_pda_tpu.cli.demo import main

    ws = tmp_path / "ws"
    report = main(["--out", str(ws)])

    # every stage ran and reported a duration
    for stage in ("data", "augment", "train", "test", "evaluate_all",
                  "analyze", "export_serving", "describe", "predict",
                  "export"):
        assert f"{stage}_s" in report, stage

    # learned the separable classes
    assert report["val_f1"] > 0.9
    assert report["test_auc"] > 0.9

    # stage artifacts on disk
    assert any((ws / "aug" / "live").glob("*.jpg"))
    assert any(p.name.isdigit() for p in (ws / "ckpts").iterdir())
    assert (ws / "results_test").is_dir()
    assert (ws / "results" / "model_comparison.json").exists()
    assert (ws / "results" / "score_distribution_analysis.json").exists()
    assert (ws / "artifact" / "meta.json").exists()
    assert (ws / "artifact" / "serving.stablehlo").exists()
    assert (ws / "predictions.csv").exists()
    assert (ws / "export.pth").exists()


def test_demo_command_registered():
    from vit_spoof_detection_pda_tpu.__main__ import COMMANDS
    assert "demo" in COMMANDS
