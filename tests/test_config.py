"""Config tree: presets, overrides, serialization."""

import json

from vit_spoof_detection_pda_tpu.config import Config


def test_presets_exist():
    for name in ("advanced-train", "simple-train", "test", "augment",
                 "evaluate-all"):
        cfg = Config.preset(name)
        assert cfg.seed == 42


def test_advanced_defaults_match_reference():
    """Reference train_advanced.py:26-86 defaults."""
    c = Config.preset("advanced-train")
    assert c.data.batch_size == 128
    assert c.optim.num_epochs == 50
    assert c.optim.learning_rate == 3e-4
    assert c.optim.weight_decay == 0.05
    assert c.loss.loss_type == "focal"
    assert c.loss.focal_alpha == 0.25
    assert c.loss.focal_gamma == 2.0
    assert c.threshold.t_min == 0.3 and c.threshold.steps == 41
    assert c.early_stop.patience == 10
    assert c.train_aug.random_erase_prob == 0.25


def test_simple_preset_differs():
    c = Config.preset("simple-train")
    assert c.loss.loss_type == "ce"
    assert c.loss.label_smoothing == 0.1
    assert c.train_aug.rotation_deg == 15.0


def test_dotted_overrides():
    c = Config().with_overrides(
        {"optim.learning_rate": 1e-5, "model.dropout": 0.2, "seed": 7})
    assert c.optim.learning_rate == 1e-5
    assert c.model.dropout == 0.2
    assert c.seed == 7
    # original untouched (frozen dataclasses)
    assert Config().optim.learning_rate == 3e-4


def test_json_roundtrip():
    c = Config.preset("simple-train").with_overrides({"optim.num_epochs": 3})
    rt = Config.from_dict(json.loads(c.to_json()))
    assert rt == c


def test_env_overrides(monkeypatch):
    monkeypatch.setenv("PAD_optim__num_epochs", "7")
    monkeypatch.setenv("PAD_data__data_root", "/tmp/x")
    c = Config().with_env_overrides()
    assert c.optim.num_epochs == 7
    assert c.data.data_root == "/tmp/x"


def test_config_cli_prints_resolved_tree(capsys, monkeypatch):
    """`config` command: full resolved JSON, and --diff shows exactly
    the file/--set/env deviations from the bare preset."""
    from vit_spoof_detection_pda_tpu.cli.config_cmd import main

    cfg = main(["--preset", "simple-train"])
    full = json.loads(capsys.readouterr().out)
    assert full["optim"]["num_epochs"] == cfg.optim.num_epochs

    monkeypatch.setenv("PAD_model__dropout", "0.3")
    diff = main(["--preset", "simple-train", "--diff",
                 "--set", "optim.learning_rate=1e-5"])
    printed = json.loads(capsys.readouterr().out)
    assert printed == diff
    assert diff == {"optim.learning_rate": 1e-5, "model.dropout": 0.3}
