"""Full-pipeline integration (SURVEY.md §4): synthetic dataset ->
augment CLI -> train (tiny ViT) -> checkpoint -> test CLI -> evaluate-all
-> analyze, all through the CLI entry points on the CPU backend."""

import json
import sys

import numpy as np
import pytest

from util_synthetic import make_subject_tree


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("ws")
    make_subject_tree(root / "raw", subjects=2, per_class=4, size=64)
    make_subject_tree(root / "test", subjects=2, per_class=3, size=64)
    return root


def test_augment_cli(workspace):
    from vit_spoof_detection_pda_tpu.cli.augment import main
    total = main([
        "--set", f'augment.input_dir="{workspace / "raw"}"',
        "--set", f'augment.output_dir="{workspace / "aug"}"',
        "--set", "augment.live_augmentations=2",
        "--set", "augment.spoof_augmentations=1",
        "--set", "augment.batch_size=8",
        "--set", "augment.img_size=32",
    ])
    # live: 8 originals + 16 aug; spoof: 8 originals + 8 aug
    assert total == 24 + 16
    assert len(list((workspace / "aug" / "live").glob("*.jpg"))) == 24
    assert len(list((workspace / "aug" / "spoof").glob("*.jpg"))) == 16


@pytest.mark.slow
def test_train_cli_tiny(workspace):
    from vit_spoof_detection_pda_tpu.cli.train import main
    best = main([
        "--set", f'data.data_root="{workspace / "aug"}"',
        "--set", "data.batch_size=8",
        "--set", "data.eval_batch_size=8",
        "--set", "data.img_size=32",
        "--set", "data.num_workers=2",
        "--set", "train_aug.resize_to=40",
        "--set", "train_aug.crop_size=32",
        "--set", "model.embed_dim=64",
        "--set", "model.depth=1",
        "--set", "model.num_heads=2",
        "--set", "model.head_hidden=16",
        "--set", "model.patch_size=16",
        "--set", "optim.num_epochs=2",
        "--set", "optim.learning_rate=3e-3",
        "--set", f'checkpoint.save_dir="{workspace / "ckpts"}"',
        "--set", "telemetry.log_interval=100",
    ])
    assert best["val_f1"] >= 0.0
    steps = sorted(int(p.name) for p in (workspace / "ckpts").iterdir()
                   if p.name.isdigit())
    assert steps, "no checkpoint written"


@pytest.mark.slow
def test_train_cli_pipeline_parallel(workspace):
    """The train CLI under sharding.pipeline_parallel=2 — the full
    user-facing path (store scan -> Trainer builds the (data, pipe)
    mesh, packed param layout, GPipe schedule) with zero mesh code.
    depth=2 splits 1 block/stage; microbatches=2 keeps each microbatch
    divisible by the data axis (8/2=4 wide) at batch 8."""
    from vit_spoof_detection_pda_tpu.cli.train import main
    best = main([
        "--set", f'data.data_root="{workspace / "aug"}"',
        "--set", "data.batch_size=8",
        "--set", "data.eval_batch_size=8",
        "--set", "data.img_size=32",
        "--set", "data.num_workers=2",
        "--set", "train_aug.resize_to=40",
        "--set", "train_aug.crop_size=32",
        "--set", "model.embed_dim=64",
        "--set", "model.depth=2",
        "--set", "model.num_heads=2",
        "--set", "model.head_hidden=16",
        "--set", "model.patch_size=16",
        "--set", "optim.num_epochs=1",
        "--set", f'checkpoint.save_dir="{workspace / "ckpts_pp"}"',
        "--set", "sharding.pipeline_parallel=2",
        "--set", "sharding.pipeline_microbatches=2",
        "--set", "telemetry.log_interval=100",
    ])
    assert best["val_f1"] >= 0.0


def test_evaluate_all_cli(workspace):
    from vit_spoof_detection_pda_tpu.cli.evaluate_all import main
    results = main([
        "--set", f'data.test_root="{workspace / "test"}"',
        "--set", f'eval.output_dir="{workspace / "results"}"',
        "--set", "eval.batch_size=6",
        "--models", "SigNet_F",
    ])
    assert "SigNet_F" in results
    assert (workspace / "results" / "model_comparison.json").exists()


def test_analyze_cli(workspace):
    from vit_spoof_detection_pda_tpu.cli.analyze import main
    out = main([
        "--results-dir", str(workspace / "results"),
        "--figures",
    ])
    assert "SigNet_F" in out["distributions"]
    assert (workspace / "results" /
            "score_distribution_analysis.json").exists()
    figs = out["figures"]
    assert any(v and not str(v).startswith("ERROR")
               for v in figs.values()), figs


def test_dispatcher_help(capsys):
    from vit_spoof_detection_pda_tpu.__main__ import main as dispatch
    old = sys.argv
    try:
        sys.argv = ["prog"]
        assert dispatch() == 1
        sys.argv = ["prog", "bogus"]
        assert dispatch() == 1
    finally:
        sys.argv = old


@pytest.mark.slow  # consumes test_train_cli_tiny's checkpoint
def test_test_cli_loads_orbax_checkpoint(workspace):
    """The checkpoint written by the train CLI must load through the
    test CLI (Orbax dir -> eval artifacts)."""
    from vit_spoof_detection_pda_tpu.cli.test import main
    metrics = main([
        "--checkpoint", str(workspace / "ckpts"),
        "--set", f'data.test_root="{workspace / "test"}"',
        "--set", f'eval.output_dir="{workspace / "test_out"}"',
        "--set", "eval.batch_size=6",
        "--set", "data.img_size=32",
        "--set", "model.embed_dim=64",
        "--set", "model.depth=1",
        "--set", "model.num_heads=2",
        "--set", "model.head_hidden=16",
        "--no-plots",
    ])
    assert 0.0 <= metrics["accuracy"] <= 1.0
    assert any((workspace / "test_out").glob("test_metrics_*.csv"))


@pytest.mark.slow  # consumes test_train_cli_tiny's checkpoint
def test_export_cli_roundtrip(workspace):
    """Orbax checkpoint from the train CLI -> reference-format .pth via
    the export CLI -> torch strict-loadable state dict keyed like the
    published checkpoint (vit.* + classifier.*)."""
    torch = pytest.importorskip("torch")
    from vit_spoof_detection_pda_tpu.cli.export import main
    out = workspace / "exported.pth"
    main([str(workspace / "ckpts"), str(out)])
    obj = torch.load(str(out), map_location="cpu", weights_only=False)
    sd = obj["model_state_dict"]
    assert "vit.patch_embed.proj.weight" in sd
    assert "classifier.5.bias" in sd
    assert sd["classifier.5.bias"].shape == (2,)
    # epoch + metrics come from the orbax checkpoint's metrics record
    assert obj["epoch"] >= 0
    assert "val_f1" in obj["metrics"]


def test_benchmark_all_models_device_latency(monkeypatch):
    """--all-models loops the reference benchmark rows through the
    device-latency protocol and reports speedups vs the RTX numbers
    (registry swapped for a tiny model; protocol logic is the target)."""
    import jax
    import jax.numpy as jnp

    import vit_spoof_detection_pda_tpu.cli.benchmark as bench_cli
    from vit_spoof_detection_pda_tpu.models.vit import ViTAntiSpoof

    small = ViTAntiSpoof(patch_size=16, embed_dim=64, depth=1,
                         num_heads=2, hidden=16)
    sv = small.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    monkeypatch.setattr(bench_cli, "build_model",
                        lambda name, **kw: (small, sv))
    monkeypatch.setattr(bench_cli, "REF_B1_MS",
                        {"Custom_ViT_FineTuned": 5.43})
    out = bench_cli.main(["--device-latency", "--all-models", "--n1", "2",
                          "--batch-size", "1", "--set",
                          "data.img_size=32"])
    row = out["Custom_ViT_FineTuned"]
    assert row["ms_per_image"] > 0 and row["ref_ms_rtx_a4500"] == 5.43
    assert row["speedup_vs_ref"] == round(5.43 / row["ms_per_image"], 2)

    with pytest.raises(SystemExit):
        bench_cli.main(["--all-models"])           # needs --device-latency
    with pytest.raises(SystemExit):
        bench_cli.main(["--all-models", "--device-latency",
                        "--fastserve"])            # module-parity only


@pytest.mark.slow  # consumes test_train_cli_tiny's checkpoint
def test_export_serving_cli(workspace):
    """Orbax checkpoint -> portable serving artifact via the CLI; the
    loaded artifact scores a batch with no module/config on the consumer
    side (models/artifact.py)."""
    import jax.numpy as jnp

    from vit_spoof_detection_pda_tpu.cli.export_serving import main
    from vit_spoof_detection_pda_tpu.models.artifact import (
        load_serving_artifact)

    out = workspace / "serve_art"
    main([str(workspace / "ckpts"), str(out),
          "--set", "data.img_size=32",
          "--set", "model.embed_dim=64",
          "--set", "model.depth=1",
          "--set", "model.num_heads=2",
          "--set", "model.head_hidden=16"])
    art = load_serving_artifact(out)
    assert art.meta["batch_size"] is None          # symbolic default
    batch = jnp.asarray(np.random.default_rng(0).integers(
        0, 256, (2, 32, 32, 3), dtype=np.uint8))
    got = art(batch)
    assert got["prob1"].shape == (2,)
    assert np.all((np.asarray(got["prob1"]) >= 0)
                  & (np.asarray(got["prob1"]) <= 1))

    # --threshold optimal deploys the checkpoint's validated operating
    # point (persisted by Trainer._fit_epochs from the val sweep)
    out2 = workspace / "serve_art_opt"
    main([str(workspace / "ckpts"), str(out2),
          "--set", "data.img_size=32",
          "--set", "model.embed_dim=64",
          "--set", "model.depth=1",
          "--set", "model.num_heads=2",
          "--set", "model.head_hidden=16",
          "--threshold", "optimal"])
    art2 = load_serving_artifact(out2)
    assert 0.3 <= art2.threshold <= 0.7            # sweep grid bounds
    got2 = art2(batch)
    np.testing.assert_allclose(np.asarray(got2["prob1"]),
                               np.asarray(got["prob1"]), atol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(got2["pred"]),
        (np.asarray(got2["prob1"]) > art2.threshold).astype(np.int32))


@pytest.mark.slow  # consumes test_train_cli_tiny's checkpoint
def test_train_cli_resume(workspace):
    """--resume restores the full state from checkpoint.save_dir and
    continues the epoch horizon instead of retraining from scratch (the
    restart half of preemption-safe training)."""
    from vit_spoof_detection_pda_tpu.cli.train import main
    from vit_spoof_detection_pda_tpu.utils.checkpoint import (
        CheckpointManager)

    mgr = CheckpointManager(str(workspace / "ckpts"))
    step_before = mgr.latest_step()
    mgr.close()
    assert step_before is not None

    overrides = [
        "--set", f'data.data_root="{workspace / "aug"}"',
        "--set", "data.batch_size=8",
        "--set", "data.eval_batch_size=8",
        "--set", "data.img_size=32",
        "--set", "data.num_workers=2",
        "--set", "train_aug.resize_to=40",
        "--set", "train_aug.crop_size=32",
        "--set", "model.embed_dim=64",
        "--set", "model.depth=1",
        "--set", "model.num_heads=2",
        "--set", "model.head_hidden=16",
        "--set", "optim.num_epochs=3",
        "--set", "optim.learning_rate=3e-3",
        "--set", f'checkpoint.save_dir="{workspace / "ckpts"}"',
        "--set", "telemetry.log_interval=100",
    ]
    best = main(overrides + ["--resume"])
    assert best["val_f1"] >= 0.0
    mgr = CheckpointManager(str(workspace / "ckpts"))
    assert mgr.latest_step() > step_before      # continued, not restarted
    mgr.close()

    with pytest.raises(SystemExit):             # sweep + resume conflict
        main(overrides + ["--resume", "--sweep"])


def test_evaluate_all_ema_requires_orbax_dir(workspace, capsys):
    """--ema without an orbax checkpoint dir must fail fast at the CLI:
    inside the harness the per-model error isolation would swallow the
    ValueError and the run would exit 0 having scored nothing."""
    import pytest

    from vit_spoof_detection_pda_tpu.cli.evaluate_all import main
    with pytest.raises(SystemExit) as e:
        main([
            "--set", f'data.test_root="{workspace / "test"}"',
            "--set", f'eval.output_dir="{workspace / "results_ema"}"',
            "--models", "Custom_ViT_FineTuned",
            "--ema",
        ])
    assert e.value.code == 2
    assert "orbax checkpoint directory" in capsys.readouterr().err
