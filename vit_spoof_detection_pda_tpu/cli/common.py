"""Shared CLI plumbing: config resolution and logging setup."""

from __future__ import annotations

import argparse
import json
import logging

from ..config import Config


def add_config_args(parser: argparse.ArgumentParser):
    parser.add_argument("--preset", default="advanced-train",
                        help="config preset (advanced-train, simple-train, "
                             "test, augment, evaluate-all)")
    parser.add_argument("--config", default=None,
                        help="path to a JSON config file (overrides preset)")
    parser.add_argument("--set", action="append", default=[],
                        metavar="PATH=VALUE", dest="overrides",
                        help="dotted config override, repeatable "
                             "(e.g. --set optim.learning_rate=1e-5)")


def resolve_config(args) -> Config:
    cfg = (Config.from_json_file(args.config) if args.config
           else Config.preset(args.preset))
    overrides = {}
    for item in args.overrides:
        path, _, raw = item.partition("=")
        try:
            overrides[path] = json.loads(raw)
        except json.JSONDecodeError:
            overrides[path] = raw
    if overrides:
        cfg = cfg.with_overrides(overrides)
    return cfg.with_env_overrides()


def add_fastserve_args(parser: argparse.ArgumentParser):
    parser.add_argument("--fastserve", action="store_true",
                        help="score ViT-antispoof models through the "
                        "fused-kernel bf16 serving path (bench.py "
                        "numerics; ~1e-2 score drift)")
    parser.add_argument("--interpret", action="store_true",
                        help="run the fastserve Pallas kernels in "
                        "interpret mode (debugging off-TPU; slow)")


def validate_fastserve(args):
    """Fail BEFORE model/data loading when --fastserve can't run: the
    Pallas kernels need a TPU backend unless --interpret is given
    (make_fastserve_infer would otherwise raise only after the full
    checkpoint + dataset load)."""
    if getattr(args, "fastserve", False) and not getattr(
            args, "interpret", False):
        import jax
        if jax.default_backend() != "tpu":
            raise SystemExit(
                "--fastserve runs Pallas TPU kernels; on the "
                f"'{jax.default_backend()}' backend drop --fastserve or "
                "add --interpret (debugging mode)")


def setup_logging(level=logging.INFO):
    # Importing jax pulls in absl, which installs its own root handler
    # and leaves the root level at WARNING — a plain basicConfig is then
    # a silent no-op and every INFO line the CLIs rely on (epoch
    # summaries, resume position, augmentation stats) is dropped.
    # Remove ONLY absl's handler (its loggers still propagate to ours),
    # keeping any other pre-installed handlers (pytest's caplog, user
    # sinks) — force=True would wipe those too.
    root = logging.getLogger()
    try:
        import absl.logging as _absl_logging
        for h in list(root.handlers):
            if isinstance(h, _absl_logging.ABSLHandler):
                root.removeHandler(h)
    except ImportError:                        # pragma: no cover
        pass
    logging.basicConfig(
        level=level,
        format="%(asctime)s - %(name)s - %(levelname)s - %(message)s")
    root.setLevel(level)


def parse_threshold(parser: argparse.ArgumentParser, raw):
    """Shared --threshold plumbing (export-serving / serve): ``None``
    passes through (flag not given), ``"optimal"`` passes through as the
    resolve-from-checkpoint sentinel, anything else must parse to a
    float in (0, 1)."""
    if raw is None or raw == "optimal":
        return raw
    try:
        t = float(raw)
    except ValueError:
        parser.error(f"--threshold must be a float or 'optimal', "
                     f"got {raw!r}")
    if not 0.0 < t < 1.0:
        parser.error(f"--threshold must be in (0, 1), got {t}")
    return t


def optimal_threshold_from_metrics(metrics: dict, checkpoint: str) -> float:
    """The checkpoint's validated operating point, or a ValueError that
    names the fix (a plain exception on purpose: the serve daemon's
    /admin/reload handler converts it to a 500 — a SystemExit would
    escape its `except Exception` and silently kill the handler
    thread).  CLIs convert it to parser.error at startup."""
    if "optimal_threshold" not in metrics:
        raise ValueError(
            f"checkpoint at {checkpoint} carries no optimal_threshold "
            "metric — train with threshold.optimize on a Trainer new "
            "enough to persist it, or pass an explicit --threshold "
            "float")
    return float(metrics["optimal_threshold"])


def warn_ema_threshold_mismatch(metrics: dict, *, ema: bool,
                                optimal: bool):
    """An EMA-trained checkpoint validates (and persists) its operating
    point on the SHADOW weights — deploying the raw iterate at that
    threshold mixes weights and operating point from different models."""
    if optimal and metrics.get("ema_decay") is not None and not ema:
        logging.getLogger(__name__).warning(
            "this checkpoint trained with optim.ema_decay=%s: its "
            "optimal_threshold was validated on the EMA shadow weights "
            "— pass --ema to deploy the weights that threshold was "
            "measured for", metrics["ema_decay"])
