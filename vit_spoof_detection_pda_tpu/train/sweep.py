"""Hyperparameter sweep driver.

Reference: wandb Bayesian sweep, 12 runs, maximizing ``val/optimal_f1``
(train_advanced.py:697-744) with space: lr log-U[5e-5, 5e-4],
batch_size in {96,128,160}, wd log-U[0.01, 0.1], dropout {0,.1,.2},
loss type {focal, weighted_ce}, focal alpha {.15,.25,.35}, gamma
{1.5,2,2.5}; the simple variant runs 10 on val/auc (simple/train.py:490-531).

Built-in searcher: random exploration with exploit-around-best refinement
(a light stand-in for Bayes that needs no external service).  When wandb
IS installed, `run_wandb_sweep` drives the identical space through a real
wandb Bayesian sweep.
"""

from __future__ import annotations

import logging
import math
import random
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional

from ..config import Config

log = logging.getLogger(__name__)

# (dotted config path, sampler spec)
DEFAULT_SPACE = {
    "optim.learning_rate": ("log_uniform", 5e-5, 5e-4),
    "data.batch_size": ("choice", [96, 128, 160]),
    "optim.weight_decay": ("log_uniform", 0.01, 0.1),
    "model.dropout": ("choice", [0.0, 0.1, 0.2]),
    "loss.loss_type": ("choice", ["focal", "weighted_ce"]),
    "loss.focal_alpha": ("choice", [0.15, 0.25, 0.35]),
    "loss.focal_gamma": ("choice", [1.5, 2.0, 2.5]),
}


def _sample(spec, rng: random.Random):
    kind = spec[0]
    if kind == "log_uniform":
        lo, hi = spec[1], spec[2]
        return math.exp(rng.uniform(math.log(lo), math.log(hi)))
    if kind == "uniform":
        return rng.uniform(spec[1], spec[2])
    if kind == "choice":
        return rng.choice(spec[1])
    raise ValueError(f"unknown sampler {kind}")


def _perturb(spec, value, rng: random.Random):
    """Exploit step: jiggle a continuous param, resample a choice."""
    kind = spec[0]
    if kind == "log_uniform":
        lo, hi = spec[1], spec[2]
        jittered = value * math.exp(rng.uniform(-0.3, 0.3))
        return min(max(jittered, lo), hi)
    if kind == "uniform":
        lo, hi = spec[1], spec[2]
        return min(max(value + rng.uniform(-0.1, 0.1) * (hi - lo), lo), hi)
    return _sample(spec, rng)


@dataclass
class SweepResult:
    overrides: dict
    metric: float
    run_index: int
    all_metrics: dict = field(default_factory=dict)


def run_sweep(base_config: Config,
              train_fn: Callable[[Config], Dict[str, float]],
              *, metric: str = "optimal_f1", count: int = 12,
              space: Optional[dict] = None, seed: int = 0,
              explore_fraction: float = 0.5) -> List[SweepResult]:
    """Run `count` trials; first `explore_fraction` random, rest perturb
    the incumbent best (exploit).  Returns results sorted best-first."""
    space = space or DEFAULT_SPACE
    rng = random.Random(seed)
    results: List[SweepResult] = []
    n_explore = max(1, int(count * explore_fraction))

    for i in range(count):
        if i < n_explore or not results:
            overrides = {k: _sample(v, rng) for k, v in space.items()}
        else:
            best = max(results, key=lambda r: r.metric)
            overrides = {k: _perturb(space[k], best.overrides[k], rng)
                         for k in space}
        cfg = base_config.with_overrides(overrides)
        metrics = train_fn(cfg)
        score = float(metrics.get(metric, float("-inf")))
        results.append(SweepResult(overrides, score, i, dict(metrics)))
        log.info("sweep run %d/%d %s=%.5f %s", i + 1, count, metric, score,
                 overrides)

    results.sort(key=lambda r: r.metric, reverse=True)
    return results


def run_wandb_sweep(base_config: Config,
                    train_fn: Callable[[Config], Dict[str, float]],
                    *, metric: str = "optimal_f1", count: int = 12,
                    project: str = "face-antispoofing-tpu"):
    """Drive the same space through a wandb Bayesian sweep (only when
    wandb is installed; reference train_advanced.py:697-744)."""
    import wandb  # raises ImportError when absent — caller gates

    sweep_config = {
        "method": "bayes",
        "metric": {"name": f"val/{metric}", "goal": "maximize"},
        "parameters": {
            "learning_rate": {"distribution": "log_uniform_values",
                              "min": 5e-5, "max": 5e-4},
            "batch_size": {"values": [96, 128, 160]},
            "weight_decay": {"distribution": "log_uniform_values",
                             "min": 0.01, "max": 0.1},
            "dropout": {"values": [0.0, 0.1, 0.2]},
            "loss_type": {"values": ["focal", "weighted_ce"]},
            "focal_alpha": {"values": [0.15, 0.25, 0.35]},
            "focal_gamma": {"values": [1.5, 2.0, 2.5]},
        },
    }
    sweep_id = wandb.sweep(sweep_config, project=project)

    def agent_fn():
        run = wandb.init()
        w = run.config
        cfg = base_config.with_overrides({
            "optim.learning_rate": w.learning_rate,
            "data.batch_size": w.batch_size,
            "optim.weight_decay": w.weight_decay,
            "model.dropout": w.dropout,
            "loss.loss_type": w.loss_type,
            "loss.focal_alpha": w.focal_alpha,
            "loss.focal_gamma": w.focal_gamma,
        })
        metrics = train_fn(cfg)
        wandb.log({f"val/{metric}": metrics.get(metric)})

    wandb.agent(sweep_id, function=agent_fn, count=count)
    return sweep_id
