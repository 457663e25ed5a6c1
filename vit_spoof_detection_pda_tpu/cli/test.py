"""`test` command: single-model evaluation with the test.py artifact
contract (reference test.py main, :455-518)."""

from __future__ import annotations

import argparse

import jax.numpy as jnp

from ..data import scan_test
from ..eval import run_single_model_eval
from ..models.registry import build_model
from .common import (add_config_args, add_fastserve_args, resolve_config,
                     setup_logging, validate_fastserve)


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Evaluate a checkpoint on the test split")
    add_config_args(parser)
    parser.add_argument("--checkpoint", default=None,
                        help="torch .pth / safetensors / orbax checkpoint")
    parser.add_argument("--ema", action="store_true",
                        help="score the Polyak/EMA shadow weights "
                        "(orbax checkpoint dirs from optim.ema_decay "
                        "runs)")
    parser.add_argument("--no-plots", action="store_true")
    add_fastserve_args(parser)
    args = parser.parse_args(argv)
    setup_logging()
    validate_fastserve(args)
    cfg = resolve_config(args)

    import os

    ckpt = args.checkpoint or cfg.eval.checkpoint_path
    if ckpt and os.path.isdir(ckpt):
        # Orbax checkpoint directory written by our own Trainer —
        # respects the config tree's geometry (unlike the fixed
        # ViT-B/16 registry entry) and can score the EMA shadow
        from ..models.registry import (build_vit_from_config,
                                       variables_from_orbax)

        module = build_vit_from_config(cfg.model, jnp.bfloat16)
        variables, step = variables_from_orbax(
            module, str(ckpt), ema=args.ema, img_size=cfg.data.img_size)
        print(f"loaded orbax checkpoint step {step} from {ckpt}"
              + (" (EMA shadow)" if args.ema else ""))
    else:
        if args.ema:
            parser.error("--ema needs an orbax checkpoint directory "
                         "(the shadow lives in the optimizer state)")
        module, variables = build_model(
            "Custom_ViT_FineTuned", checkpoint_path=ckpt,
            dropout=cfg.model.dropout, dtype=jnp.bfloat16)

    records = scan_test(cfg.data.test_root)
    metrics, paths = run_single_model_eval(
        module, variables, records,
        output_dir=cfg.eval.output_dir,
        batch_size=cfg.eval.batch_size, img_size=cfg.data.img_size,
        checkpoint_name=str(ckpt), write_plots=not args.no_plots,
        fastserve=args.fastserve, interpret=args.interpret)
    print({k: round(v, 4) if isinstance(v, float) else v
           for k, v in metrics.items()})
    return metrics


if __name__ == "__main__":
    main()
