"""wandb integration paths exercised WITHOUT wandb installed.

A fake ``wandb`` module (sweep/init/log/agent/finish with the real
package's call signatures) drives ``run_wandb_sweep`` and the
``MetricLogger`` wandb sink end-to-end: sweep-config assembly, agent_fn
config overrides, ``val/*`` key emission, sink routing and shutdown
(reference train_advanced.py:697-744 wandb sweep; :354-363 logging).
"""

import sys
import types

import pytest

from vit_spoof_detection_pda_tpu.config import Config
from vit_spoof_detection_pda_tpu.train.sweep import run_wandb_sweep
from vit_spoof_detection_pda_tpu.utils.telemetry import MetricLogger


class _FakeRun:
    def __init__(self, cfg_dict, wandb):
        self.id = f"fake_{len(wandb.runs)}"
        self.config = types.SimpleNamespace(**cfg_dict)
        self._wandb = wandb
        self.logged = []

    def log(self, record, step=None):
        self.logged.append((dict(record), step))

    def finish(self):
        self._wandb.finished.append(self.id)


def _sample(param, i):
    """Deterministic stand-in for wandb's sampler."""
    if "values" in param:
        return param["values"][i % len(param["values"])]
    return param["min"]


def _fake_wandb():
    wandb = types.ModuleType("wandb")
    wandb.sweeps = {}
    wandb.runs = []
    wandb.finished = []
    wandb.standalone_logs = []
    wandb._active_sweep = None

    def sweep(sweep_config, project=None):
        sid = f"sweep_{len(wandb.sweeps)}"
        wandb.sweeps[sid] = {"config": sweep_config, "project": project}
        return sid

    def init(project=None, entity=None, config=None):
        if wandb._active_sweep is not None:
            params = wandb.sweeps[wandb._active_sweep]["config"]["parameters"]
            cfg = {k: _sample(v, len(wandb.runs))
                   for k, v in params.items()}
        else:
            cfg = dict(config or {})
        run = _FakeRun(cfg, wandb)
        run.project, run.entity = project, entity
        wandb.runs.append(run)
        wandb._current = run
        return run

    def log(record, step=None):
        wandb.standalone_logs.append((dict(record), step))
        if getattr(wandb, "_current", None):
            wandb._current.log(record, step)

    def agent(sweep_id, function=None, count=1):
        wandb._active_sweep = sweep_id
        for _ in range(count):
            function()
        wandb._active_sweep = None

    def finish():
        if getattr(wandb, "_current", None):
            wandb._current.finish()

    wandb.sweep, wandb.init, wandb.log = sweep, init, log
    wandb.agent, wandb.finish = agent, finish
    return wandb


@pytest.fixture
def fake_wandb(monkeypatch):
    mod = _fake_wandb()
    monkeypatch.setitem(sys.modules, "wandb", mod)
    return mod


def test_run_wandb_sweep_end_to_end(fake_wandb):
    seen_cfgs = []

    def train_fn(cfg: Config):
        seen_cfgs.append(cfg)
        return {"optimal_f1": 0.5 + 0.01 * len(seen_cfgs)}

    sid = run_wandb_sweep(Config(), train_fn, count=3)

    # sweep config shape matches the reference's (train_advanced.py:700-717)
    sw = fake_wandb.sweeps[sid]["config"]
    assert sw["method"] == "bayes"
    assert sw["metric"] == {"name": "val/optimal_f1", "goal": "maximize"}
    assert set(sw["parameters"]) == {
        "learning_rate", "batch_size", "weight_decay", "dropout",
        "loss_type", "focal_alpha", "focal_gamma"}

    # agent ran `count` trials, each override applied onto the Config
    assert len(seen_cfgs) == 3 and len(fake_wandb.runs) == 3
    for cfg, run in zip(seen_cfgs, fake_wandb.runs):
        assert cfg.optim.learning_rate == run.config.learning_rate
        assert cfg.data.batch_size == run.config.batch_size
        assert cfg.model.dropout == run.config.dropout
        assert cfg.loss.loss_type == run.config.loss_type

    # each trial emitted the sweep metric under the reference's key name
    vals = [r for r, _ in fake_wandb.standalone_logs if "val/optimal_f1" in r]
    assert len(vals) == 3
    assert vals[-1]["val/optimal_f1"] == pytest.approx(0.53)


def test_metric_logger_wandb_sink(fake_wandb, tmp_path):
    jsonl = tmp_path / "m.jsonl"
    logger = MetricLogger(jsonl_path=str(jsonl), wandb_project="pad-tpu",
                          wandb_entity="team", config={"lr": 1e-4},
                          echo=False)
    # run id comes from the wandb run, not the local fallback
    assert logger.run_id == fake_wandb.runs[0].id
    assert fake_wandb.runs[0].project == "pad-tpu"
    assert fake_wandb.runs[0].entity == "team"

    logger.log({"train/loss": 0.25, "train/acc": 0.9}, step=7)
    logger.close()

    rec, step = fake_wandb.runs[0].logged[0]
    assert step == 7 and rec["train/loss"] == 0.25 and "ts" in rec
    assert fake_wandb.finished == [logger.run_id]
    # JSONL sink wrote the same record
    import json
    lines = [json.loads(l) for l in jsonl.read_text().splitlines()]
    assert lines[0]["train/acc"] == 0.9 and lines[0]["step"] == 7


def test_metric_logger_without_wandb(tmp_path):
    """wandb absent (the real state of this image): ImportError path
    falls back to JSONL + local run id without raising."""
    assert "wandb" not in sys.modules
    logger = MetricLogger(jsonl_path=str(tmp_path / "m.jsonl"),
                          wandb_project="pad-tpu", echo=False)
    assert logger.run_id.startswith("local_")
    logger.log({"val/f1": 1.0})
    logger.close()
    assert (tmp_path / "m.jsonl").read_text().strip()
