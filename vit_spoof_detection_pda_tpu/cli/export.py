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
    args = parser.parse_args(argv)
    setup_logging()
    cfg = resolve_config(args)

    from ..models import convert

    # the registry's strict=False fallback (missing file -> random init +
    # warning) is the reference harness's behavior, but exporting a
    # random-init model because of a typo'd path must not happen
    if not os.path.exists(args.checkpoint):
        parser.error(f"checkpoint not found: {args.checkpoint}")

    step = 0
    if os.path.isdir(args.checkpoint):
        from ..utils.checkpoint import load_params_from_dir
        variables, step = load_params_from_dir(args.checkpoint)
    else:
        from ..models.registry import build_model
        _, variables = build_model("Custom_ViT_FineTuned",
                                   checkpoint_path=args.checkpoint,
                                   dropout=cfg.model.dropout)
    convert.save_torch_checkpoint(
        args.output, variables, epoch=int(step),
        config={"model_name": cfg.model.name})
    n = len(convert.antispoof_to_torch(variables))
    print(f"exported {n} tensors (step {step}) -> {args.output}")
    return args.output


if __name__ == "__main__":
    main()
