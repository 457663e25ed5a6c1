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


def setup_logging(level=logging.INFO):
    logging.basicConfig(
        level=level,
        format="%(asctime)s - %(name)s - %(levelname)s - %(message)s")
