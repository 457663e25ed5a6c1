"""`export` command: convert a TPU-trained checkpoint back to the
reference stack's ``.pth`` format (the hand-back direction of the
checkpoint-interop story; format from reference train_advanced.py:475-489,
loadable by its ``load_checkpoint``, test.py:167-188)."""

from __future__ import annotations

import argparse
import os

from .common import add_config_args, resolve_config, setup_logging


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Export a checkpoint to the reference .pth format")
    add_config_args(parser)
    parser.add_argument("checkpoint",
                        help="orbax checkpoint dir (Trainer output) or "
                        "torch/safetensors file loadable by the registry")
    parser.add_argument("output", help="destination .pth path")
    parser.add_argument("--ema", action="store_true",
                        help="export the Polyak/EMA shadow weights "
                        "(optim.ema_decay training) instead of the "
                        "last iterate (orbax checkpoints only)")
    args = parser.parse_args(argv)
    setup_logging()
    cfg = resolve_config(args)

    from ..models import convert

    # the registry's strict=False fallback (missing file -> random init +
    # warning) is the reference harness's behavior, but exporting a
    # partially- or fully-random model because of a typo'd or truncated
    # checkpoint must not happen: this path is STRICT end to end
    if not os.path.exists(args.checkpoint):
        parser.error(f"checkpoint not found: {args.checkpoint}")

    epoch, metrics = 0, {}
    if os.path.isdir(args.checkpoint):
        from ..utils.checkpoint import load_checkpoint_bundle
        variables, _step, metrics = load_checkpoint_bundle(
            args.checkpoint, ema=args.ema)
        epoch = int(metrics.get("epoch", 0))
    elif args.ema:
        parser.error("--ema needs an orbax checkpoint directory")
    else:
        # registry format dispatch (.pth/.safetensors/.npz) but STRICT
        # conversion (raises on any missing tensor) — deliberately NOT
        # the registry's tolerant partial load
        from ..models.registry import _load_state_dict
        sd = _load_state_dict(args.checkpoint)
        variables = convert.antispoof_from_torch(sd)
        epoch = 0
    sd_out = convert.save_torch_checkpoint(
        args.output, variables, epoch=epoch, metrics=metrics,
        config={"model_name": cfg.model.name})
    print(f"exported {len(sd_out)} tensors (epoch {epoch}) "
          f"-> {args.output}")
    return args.output


if __name__ == "__main__":
    main()
