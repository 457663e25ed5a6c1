"""The capstone: a SUSTAINED multi-epoch full-scale training run on
hardware (VERDICT r4 item 2) — the one operational proof the training
product still lacked.

Reference scale and behavior bar (train_advanced.py:626-681,
README.md:92-96): 115,125 images/epoch (live x9 / spoof x3 differential
fan-out of 27,203 originals, 1:3.87 imbalance), B=128, with per-epoch
validation, 41-point threshold optimization, EMA shadow, best-checkpoint
retention, and early-stop arbitration — run through the REAL
Trainer.fit lifecycle (driver composition: DevicePoolData + per-severity
fused aug+train steps + CheckpointManager), not a bespoke loop.  Then
evaluate-all + analyze + figures off the resulting checkpoint.

Synthetic data carries a class signal (live images get a brightened
center patch) so the val-metric stream is a real learning curve, not
noise.  No CelebA-Spoof exists in this environment (VERDICT: the honest
offline maximum).

Usage: PYTHONPATH=/root/.axon_site:/root/repo \
    python experiments/exp_r28_capstone.py [epochs]
Writes checkpoints/results under /tmp/pad_capstone/.
"""

import json
import os
import shutil
import subprocess
import sys
import time
from pathlib import Path

for p in ("/root/repo", "/root/.axon_site"):
    if p not in sys.path:
        sys.path.insert(0, p)

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

WORK = Path("/tmp/pad_capstone")
T0 = time.time()


def log(msg):
    print(f"[{time.time() - T0:7.1f}s] {msg}", flush=True)


# --- synthetic learnable dataset ------------------------------------------
L_LIVE, S_SPOOF = 5586, 21617          # 9L + 3S = 115,125 (reference scale)
B = 128
SIG_LO, SIG_HI = 64, 160               # the brightened live-class patch


def synth(rng, n, label):
    """u8 images with a label-dependent signal that survives the heavy
    augmentation tiers (a +28 mean shift on the center patch)."""
    out = np.empty((n, 224, 224, 3), np.uint8)
    chunk = 1024
    for i in range(0, n, chunk):
        m = min(chunk, n - i)
        img = rng.integers(0, 256, (m, 224, 224, 3), dtype=np.int16)
        if label == 1:
            img[:, SIG_LO:SIG_HI, SIG_LO:SIG_HI] += 28
        out[i:i + m] = np.clip(img, 0, 255).astype(np.uint8)
    return out


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    if WORK.exists():
        shutil.rmtree(WORK)
    (WORK / "ckpts").mkdir(parents=True)

    from vit_spoof_detection_pda_tpu.augment.policy import CHAINS
    from vit_spoof_detection_pda_tpu.config import Config
    from vit_spoof_detection_pda_tpu.models.registry import (
        build_vit_from_config)
    from vit_spoof_detection_pda_tpu.parallel import mesh_from_config
    from vit_spoof_detection_pda_tpu.train.driver import (_train_chain,
                                                          make_eval_prep_fn,
                                                          make_prep_fn)
    from vit_spoof_detection_pda_tpu.train.pool import DevicePoolData
    from vit_spoof_detection_pda_tpu.train.trainer import Trainer
    from vit_spoof_detection_pda_tpu.utils.checkpoint import (
        CheckpointManager)

    cfg = Config().with_overrides({
        "optim.num_epochs": epochs,
        "optim.ema_decay": 0.999,
        "early_stop.patience": max(5, epochs),   # arbitration runs; a
        # flat curve must not cut the sustained-rate measurement short
        "checkpoint.save_dir": str(WORK / "ckpts"),
        "checkpoint.save_every_epochs": 1,
        "checkpoint.max_to_keep": 3,
        "checkpoint.async_save": True,
        "data.batch_size": B,
        "data.eval_batch_size": B,
        "telemetry.jsonl_path": str(WORK / "telemetry.jsonl"),
    })

    # --- data: reference-scale pool + on-device val set -------------------
    t = time.time()
    rng = np.random.default_rng(42)
    pool = np.concatenate([synth(rng, L_LIVE, 1), synth(rng, S_SPOOF, 0)])
    labels = np.concatenate([np.ones(L_LIVE, np.int32),
                             np.zeros(S_SPOOF, np.int32)])
    log(f"pool synthesized: {len(pool)} originals "
        f"{pool.nbytes / 2**30:.2f} GB ({time.time() - t:.1f} s)")

    mesh = mesh_from_config(cfg.sharding)
    t = time.time()
    data = DevicePoolData(pool, labels,
                          live_mult=cfg.augment.live_augmentations,
                          spoof_mult=cfg.augment.spoof_augmentations,
                          batch_size=B, seed=cfg.seed, mesh=mesh)
    jax.block_until_ready(data.pool)
    log(f"HBM staging: {time.time() - t:.1f} s; steps/epoch = "
        f"{data.steps_per_epoch} ({data.steps_per_epoch * B} img)")

    # driver-composition per-severity fused aug+train preps
    orig_chain = _train_chain(cfg, crop=False)
    chains = {"orig": orig_chain}
    for g in ("heavy", "medium", "light"):
        chains[g] = CHAINS[g]() + orig_chain
    preps = {g: data.wrap_prep(make_prep_fn(cfg, c))
             for g, c in chains.items()}

    # val: 1,024 held-out images (1:3 mix), pre-staged PREPPED on device
    # once — per-epoch validation costs zero host->device image traffic
    n_val_live, n_val_spoof = 256, 768
    val_u8 = np.concatenate([synth(rng, n_val_live, 1),
                             synth(rng, n_val_spoof, 0)])
    val_lbl = np.concatenate([np.ones(n_val_live, np.int32),
                              np.zeros(n_val_spoof, np.int32)])
    perm = np.random.default_rng(7).permutation(len(val_u8))
    val_u8, val_lbl = val_u8[perm], val_lbl[perm]
    eval_prep = make_eval_prep_fn()
    staged = []
    for i in range(0, len(val_u8), B):
        img = eval_prep(jnp.asarray(val_u8[i:i + B]))
        jax.block_until_ready(img)
        staged.append({"image": img, "label": val_lbl[i:i + B]})
    log(f"val set staged on device: {len(val_u8)} images "
        f"in {len(staged)} batches")

    # --- the real lifecycle: Trainer.fit ----------------------------------
    counts = (int(np.sum(labels == 0)) * (1 + cfg.augment.spoof_augmentations),
              int(np.sum(labels == 1)) * (1 + cfg.augment.live_augmentations))
    module = build_vit_from_config(cfg.model, jnp.bfloat16)
    ckpt = CheckpointManager(cfg.checkpoint.save_dir,
                             max_to_keep=cfg.checkpoint.max_to_keep,
                             best_metric=cfg.checkpoint.keep_best_by,
                             save_every_epochs=1, async_save=True)
    trainer = Trainer(cfg, module,
                      train_batches=lambda e, skip=0: data.batches(e, skip=skip),
                      val_batches=lambda: iter(staged),
                      steps_per_epoch=data.steps_per_epoch,
                      class_counts=counts, mesh=mesh,
                      checkpoints=ckpt, batch_prep=preps)
    t_fit = time.time()
    best = trainer.fit()
    wall_fit = time.time() - t_fit
    n_img = data.steps_per_epoch * B
    log(f"fit done: {epochs} epochs x {n_img} img in {wall_fit:.1f} s "
        f"-> sustained {epochs * n_img / wall_fit:.0f} img/s incl. "
        f"validation+ckpt (best {best})")

    # per-epoch stream from telemetry
    stream = []
    with open(WORK / "telemetry.jsonl") as f:
        for line in f:
            rec = json.loads(line)
            if "epoch_time_s" in rec:
                stream.append({k: rec.get(k) for k in (
                    "epoch", "epoch_time_s", "train/loss", "val/loss",
                    "val/accuracy", "val/auc", "val/f1",
                    "val/optimal_threshold", "val/optimal_f1")})
    for row in stream:
        log("epoch stream: " + json.dumps(row))

    # --- evaluate-all + analyze + figures off the checkpoint --------------
    test_dir = WORK / "test_data"
    rng2 = np.random.default_rng(99)
    from PIL import Image
    for cls, lab, n in (("live", 1, 128), ("spoof", 0, 384)):
        d = test_dir / cls
        d.mkdir(parents=True)
        imgs = synth(rng2, n, lab)
        for i in range(n):
            Image.fromarray(imgs[i]).save(d / f"{i}.png")
    log("test set written: 512 images")

    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/.axon_site:/root/repo"
    results = WORK / "results"
    t = time.time()
    r = subprocess.run(
        [sys.executable, "-m", "vit_spoof_detection_pda_tpu",
         "evaluate-all", "--preset", "evaluate-all",
         "--models", "Custom_ViT_FineTuned",
         "--checkpoint", str(WORK / "ckpts"),
         "--set", f"data.test_root={test_dir}",
         "--set", f"eval.output_dir={results}",
         "--set", "eval.batch_size=128"],
        env=env, capture_output=True, text=True, timeout=1800)
    print(r.stdout[-2000:], r.stderr[-2000:] if r.returncode else "",
          flush=True)
    assert r.returncode == 0, "evaluate-all failed"
    log(f"evaluate-all done ({time.time() - t:.1f} s)")

    t = time.time()
    r = subprocess.run(
        [sys.executable, "-m", "vit_spoof_detection_pda_tpu",
         "analyze", "--results-dir", str(results), "--figures"],
        env=env, capture_output=True, text=True, timeout=1800)
    print(r.stdout[-2000:], r.stderr[-2000:] if r.returncode else "",
          flush=True)
    assert r.returncode == 0, "analyze failed"
    log(f"analyze+figures done ({time.time() - t:.1f} s)")

    # --- artifact-tree schema assertions ----------------------------------
    mdir = results / "Custom_ViT_FineTuned"
    import pandas as pd
    preds = pd.read_csv(mdir / "per_image_predictions.csv")
    assert list(preds.columns) == ["image_path", "true_label",
                                   "spoof_score", "predicted_label_0.5"]
    assert len(preds) == 512
    thr = pd.read_csv(mdir / "threshold_analysis.csv")
    assert {"threshold", "accuracy", "f1_score"} <= set(thr.columns)
    cms = json.load(open(mdir / "confusion_matrices.json"))
    assert any(k.startswith("threshold_") for k in cms)
    comp = json.load(open(results / "model_comparison.json"))
    assert "Custom_ViT_FineTuned" in comp["models_evaluated"]
    row = [r for r in comp["comparison_table"]
           if r["model_name"] == "Custom_ViT_FineTuned"][0]
    figs = list((results / "figures").glob("*.png"))
    auc = row["roc_auc"]
    log(f"artifact tree ok: {len(figs)} figures; held-out test AUC "
        f"(spoof-score convention) = {auc:.3f}")

    summary = {
        "epochs": epochs,
        "images_per_epoch": n_img,
        "wall_fit_s": round(wall_fit, 1),
        "sustained_img_per_s": round(epochs * n_img / wall_fit, 1),
        "best": {k: (float(v) if isinstance(v, (int, float)) else v)
                 for k, v in best.items()},
        "epoch_stream": stream,
        "test_auc": auc,
        "figures": len(figs),
    }
    with open(WORK / "summary.json", "w") as f:
        json.dump(summary, f, indent=2)
    log("CAPSTONE SUMMARY: " + json.dumps(summary))


if __name__ == "__main__":
    main()
