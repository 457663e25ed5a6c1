"""`benchmark` command: compiled throughput + single-image latency of the
flagship model (the headline numbers; see also repo-root bench.py)."""

from __future__ import annotations

import argparse
import json

import jax.numpy as jnp

from ..analysis.latency import benchmark_throughput
from ..models.registry import build_model
from .common import add_config_args, resolve_config, setup_logging


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Throughput benchmark of the flagship ViT")
    add_config_args(parser)
    parser.add_argument("--batch-size", type=int, default=128)
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--model", default="Custom_ViT_FineTuned")
    parser.add_argument("--fastserve", action="store_true",
                        help="time the bf16 serving fast path (fused "
                             "attention-block kernels, tanh GELU, folded "
                             "normalization) — flagship ViT only")
    args = parser.parse_args(argv)
    setup_logging()
    cfg = resolve_config(args)

    module, variables = build_model(
        args.model, checkpoint_path=cfg.eval.checkpoint_path,
        dtype=jnp.bfloat16)
    out = benchmark_throughput(module, variables,
                               batch_size=args.batch_size,
                               img_size=cfg.data.img_size,
                               iters=args.iters,
                               fastserve=args.fastserve)
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
