"""`benchmark` command: compiled throughput + single-image latency of the
flagship model (the headline numbers; see also repo-root bench.py)."""

from __future__ import annotations

import argparse
import json

import jax.numpy as jnp

from ..analysis.latency import benchmark_device_latency, benchmark_throughput
from ..models.registry import build_model
from .common import add_config_args, resolve_config, setup_logging

# the reference's per-model bs=1 benchmark rows
# (results/inference_time_benchmark.json, RTX A4500,
# additional_analysis.py:259-315) — the targets --all-models reports
# against; SigNet_F is excluded like the reference's own table.
REF_B1_MS = {"Custom_ViT_FineTuned": 5.43, "Base_ViT_Pretrained": 4.86,
             "ResNet50_Pretrained": 4.96}


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Throughput benchmark of the flagship ViT")
    add_config_args(parser)
    parser.add_argument("--batch-size", type=int, default=128)
    parser.add_argument("--iters", type=int, default=None,
                        help="timed iterations (throughput mode; default 20)")
    parser.add_argument("--model", default="Custom_ViT_FineTuned")
    parser.add_argument("--fastserve", action="store_true",
                        help="time the bf16 serving fast path (fused "
                             "attention-block kernels, tanh GELU, folded "
                             "normalization) — flagship ViT only")
    parser.add_argument("--device-latency", action="store_true",
                        help="per-execution device latency at --batch-size "
                             "(relay-differenced; bs=1 is the reference's "
                             "5.43 ms single-image protocol)")
    parser.add_argument("--lowlat", action="store_true",
                        help="with --device-latency: time the single-kernel "
                             "latency mode (ops/lowlat.py; image->logits as "
                             "ONE Pallas program when the shape allows "
                             "fold-ends, else whole-encoder with XLA ends) "
                             "— flagship ViT only")
    parser.add_argument("--lowlat-encoder-only", action="store_true",
                        help="with --lowlat: force the round-7 encoder-only "
                             "kernel (XLA stem/head) instead of fold-ends, "
                             "for A/B against archived numbers")
    parser.add_argument("--lowlat-batch-grid", action="store_true",
                        help="with --lowlat: the batch-grid kernel (weights "
                             "stream once per 2-image chunk instead of "
                             "once per image) — the B=2..15 regime; "
                             "anti-spoof head only")
    parser.add_argument("--lowlat-int8", action="store_true",
                        help="with --lowlat: stream the encoder weights "
                             "weight-only int8 (half the HBM weight "
                             "traffic, but measured slower than bf16 at "
                             "B=1 — memory-constrained deployments only) "
                             "— anti-spoof head only")
    parser.add_argument("--interpret", action="store_true",
                        help="run --lowlat's Pallas kernel in interpret "
                             "mode (debugging off-TPU; slow)")
    parser.add_argument("--n1", type=int, default=200,
                        help="differencing run length for --device-latency "
                             "(enqueues n1 then 3*n1 executions, 3 repeats)")
    parser.add_argument("--loop-iters", type=int, default=0,
                        help="with --device-latency: run this many "
                             "executions INSIDE one compiled fori_loop "
                             "program (dispatch-free device latency — "
                             "sub-ms kernels stay measurable on "
                             "dispatch-bound hosts/relays; "
                             "BENCH_NOTES round 28)")
    parser.add_argument("--artifact", default=None,
                        help="with --device-latency: time a FROZEN "
                             "serving artifact directory (export-serving) "
                             "through its deserialized program instead of "
                             "a live model; a fixed-batch artifact pins "
                             "the batch size itself")
    parser.add_argument("--train-step", action="store_true",
                        help="time the compiled TRAIN step (forward + "
                             "backward + clip + AdamW + metrics as one "
                             "program) at --batch-size on synthetic "
                             "batches — the trainer's hot loop; flagship "
                             "ViT only.  model.gelu / loss.loss_type "
                             "config overrides apply")
    parser.add_argument("--no-fused-forward", action="store_true",
                        help="with --train-step: force the plain module "
                             "forward instead of the fused-block Pallas "
                             "training forward (A/B)")
    parser.add_argument("--profile", default=None, metavar="DIR",
                        help="capture a jax.profiler (TensorBoard/XProf) "
                             "trace of the benchmarked program into DIR "
                             "— works in every mode, incl. through the "
                             "relay backend")
    parser.add_argument("--all-models", action="store_true",
                        help="with --device-latency: measure EVERY row of "
                             "the reference's per-model benchmark "
                             "(Custom ViT / Base ViT / ResNet50) on the "
                             "module-parity path and report speedups vs "
                             "its RTX A4500 numbers")
    args = parser.parse_args(argv)
    if args.train_step:
        if (args.device_latency or args.fastserve or args.lowlat
                or args.all_models or args.artifact):
            parser.error("--train-step is its own mode; drop the "
                         "inference-mode flags")
        if args.model != "Custom_ViT_FineTuned":
            parser.error("--train-step times the flagship ViT training "
                         "program; --model does not apply")
    if args.no_fused_forward and not args.train_step:
        parser.error("--no-fused-forward is a --train-step option")
    if args.all_models:
        if not args.device_latency:
            parser.error("--all-models is a --device-latency mode")
        if args.fastserve or args.lowlat:
            parser.error("--all-models times the module-parity path for "
                         "every model; use --model with "
                         "--fastserve/--lowlat for the fused flavors")
    if args.lowlat and not args.device_latency:
        parser.error("--lowlat is a latency mode; combine with "
                     "--device-latency (batched throughput stays on the "
                     "per-layer --fastserve path, which wins at B>=16)")
    if args.lowlat_batch_grid and not args.lowlat:
        parser.error("--lowlat-batch-grid is a --lowlat flavor; add "
                     "--lowlat (otherwise the module path would be "
                     "timed and reported as batch-grid numbers)")
    if args.lowlat_int8 and not args.lowlat:
        parser.error("--lowlat-int8 is a --lowlat flavor; add --lowlat")
    if args.lowlat_int8 and args.lowlat_batch_grid:
        parser.error("--lowlat-int8 quantizes the per-item stream; the "
                     "batch-grid pack stays full-precision")
    if args.lowlat_batch_grid and args.lowlat_encoder_only:
        parser.error("--lowlat-batch-grid and --lowlat-encoder-only "
                     "select different kernels; pick one")
    if ((args.lowlat and not args.interpret)
            or (args.fastserve and args.device_latency
                and not args.lowlat)):
        # fail BEFORE the model load, like validate_fastserve
        # (cli/common.py); throughput-mode --fastserve gets the same
        # check inside make_fastserve_infer, but the device-latency
        # path builds serving_forward directly
        import jax
        if jax.default_backend() != "tpu":
            flag = "--lowlat" if args.lowlat else "--fastserve"
            raise SystemExit(
                f"{flag} runs Pallas TPU kernels; on the "
                f"'{jax.default_backend()}' backend "
                + ("add --interpret (debugging mode) or " if args.lowlat
                   else "") + f"drop {flag}")
    if args.artifact:
        if not args.device_latency:
            parser.error("--artifact is a --device-latency mode")
        if args.fastserve or args.lowlat or args.all_models:
            parser.error("--artifact times the frozen program as "
                         "exported; drop the live-path flags (the mode "
                         "was chosen at export time)")
        if args.iters is not None:
            parser.error("--iters applies to throughput mode only; "
                         "--device-latency run length is --n1")
        if args.interpret:
            parser.error("--interpret cannot apply to a frozen program "
                         "(the mode was compiled at export time)")
    setup_logging()
    cfg = resolve_config(args)

    from ..utils.profiling import profile_trace
    with profile_trace(args.profile):
        return _dispatch(args, cfg, parser)


def _dispatch(args, cfg, parser):
    """Run the selected benchmark mode (split out so --profile wraps
    exactly the compiled+timed program, whatever the mode)."""
    if args.train_step:
        import jax.numpy as jnp2

        from ..analysis.latency import benchmark_train_step
        from ..models.vit import ViTAntiSpoof
        module = ViTAntiSpoof(dtype=jnp2.bfloat16, gelu=cfg.model.gelu)
        out = benchmark_train_step(
            module, batch_size=args.batch_size,
            img_size=cfg.data.img_size, iters=args.iters or 10,
            loss_type=cfg.loss.loss_type, gelu=cfg.model.gelu,
            fused=False if args.no_fused_forward else None)
        print(json.dumps(out))
        return out

    if args.artifact:
        from ..models.artifact import load_serving_artifact
        art = load_serving_artifact(args.artifact)
        bs = art.meta.get("batch_size") or args.batch_size
        out = benchmark_device_latency(
            lambda _w, batch: art(batch), None, batch_size=bs,
            img_size=art.meta.get("img_size", 224), n1=args.n1,
            loop_iters=args.loop_iters)
        out["artifact_mode"] = art.meta["mode"]
        print(json.dumps(out))
        return out

    if args.all_models:
        import jax

        from ..eval.runner import make_infer_fn
        out = {}
        for name, ref_ms in REF_B1_MS.items():
            module, variables = build_model(
                name, checkpoint_path=cfg.eval.checkpoint_path,
                dtype=jnp.bfloat16, img_size=cfg.data.img_size)
            infer = jax.jit(make_infer_fn(module))
            r = benchmark_device_latency(infer, variables,
                                         batch_size=args.batch_size,
                                         img_size=cfg.data.img_size,
                                         n1=args.n1,
                                         loop_iters=args.loop_iters)
            r["ref_ms_rtx_a4500"] = ref_ms
            r["speedup_vs_ref"] = round(ref_ms / r["ms_per_image"], 2)
            out[name] = r
            print(name, json.dumps(r))
        print(json.dumps(out))
        return out

    module, variables = build_model(
        args.model, checkpoint_path=cfg.eval.checkpoint_path,
        dtype=jnp.bfloat16, img_size=cfg.data.img_size)
    if args.device_latency:
        if args.iters is not None:
            parser.error("--iters applies to throughput mode only; "
                         "--device-latency run length is --n1")
        import jax

        from ..eval.runner import make_infer_fn
        if args.lowlat:
            from ..models.fastserve import (prepare_lowlat,
                                            serving_forward_lowlat,
                                            serving_forward_lowlat_batch,
                                            serving_forward_lowlat_linear)
            from ..models.vit import (ViTAntiSpoof, ViTLinearHead,
                                      fold_normalization)
            if not isinstance(module, (ViTAntiSpoof, ViTLinearHead)):
                parser.error("--lowlat supports the ViT-family models "
                             f"only; got {type(module).__name__}")
            if (args.lowlat_batch_grid
                    and not isinstance(module, ViTAntiSpoof)):
                parser.error("--lowlat-batch-grid packs the anti-spoof "
                             "head layout; use plain --lowlat for "
                             f"{type(module).__name__}")
            folded = fold_normalization(variables)
            if isinstance(module, ViTAntiSpoof):       # non-B/16 friendly
                geom = dict(num_heads=module.num_heads,
                            patch_size=module.patch_size,
                            norm_eps=module.norm_eps)
                depth = module.depth
            else:
                geom, depth = {}, 12          # ViTLinearHead is B/16-fixed
            if args.lowlat_int8 and not isinstance(module, ViTAntiSpoof):
                parser.error("--lowlat-int8 packs the anti-spoof "
                             "layout; use plain --lowlat for "
                             f"{type(module).__name__}")
            variables = prepare_lowlat(
                folded["params"], depth=depth,
                fold_ends=(isinstance(module, ViTAntiSpoof)
                           and not args.lowlat_encoder_only),
                batch_grid=args.lowlat_batch_grid,
                per_item=not args.lowlat_batch_grid,
                int8_weights=args.lowlat_int8)
            print("lowlat flavor:",
                  "batch-grid (per-chunk weight streaming)"
                  if args.lowlat_batch_grid else
                  "fold-ends (image->logits single kernel)"
                  if "aux" in variables else
                  "encoder-only (XLA stem/head)")
            if args.lowlat_batch_grid:
                @jax.jit
                def infer(prepared, batch_u8):
                    return {"prob1": serving_forward_lowlat_batch(
                        prepared, batch_u8, interpret=args.interpret,
                        **geom)}
            elif isinstance(module, ViTAntiSpoof):
                @jax.jit
                def infer(prepared, batch_u8):
                    return {"prob1": serving_forward_lowlat(
                        prepared, batch_u8, interpret=args.interpret,
                        **geom)}
            else:
                @jax.jit
                def infer(prepared, batch_u8):
                    return {"prob1": serving_forward_lowlat_linear(
                        prepared, batch_u8,
                        interpret=args.interpret)[:, 1]}
        elif args.fastserve:
            from ..models.fastserve import serving_forward
            from ..models.vit import fold_normalization
            variables = fold_normalization(variables)

            @jax.jit
            def infer(v, batch_u8):
                return {"prob1": serving_forward(v["params"], batch_u8)}
        else:
            infer = make_infer_fn(module)
        out = benchmark_device_latency(infer, variables,
                                       batch_size=args.batch_size,
                                       img_size=cfg.data.img_size,
                                       n1=args.n1,
                                       loop_iters=args.loop_iters)
    else:
        out = benchmark_throughput(module, variables,
                                   batch_size=args.batch_size,
                                   img_size=cfg.data.img_size,
                                   iters=args.iters or 20,
                                   fastserve=args.fastserve)
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
