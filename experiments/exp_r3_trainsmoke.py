"""Full-scale training smoke on the real TPU: ViT-B/16, B=128, focal +
AdamW + cosine, Trainer lifecycle end-to-end (fit -> validate ->
checkpoint -> resume) on synthetic data.  The CPU test suite covers this
path on tiny shapes; this run validates it at production scale on
hardware and records steps/s.

Synthetic data is class-separable (live brighter than spoof) so the loss
must actually fall and val F1 must beat chance within 2 epochs.
"""
import os
import tempfile
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from vit_spoof_detection_pda_tpu.config import Config
from vit_spoof_detection_pda_tpu.models.vit import ViTAntiSpoof
from vit_spoof_detection_pda_tpu.parallel import make_mesh
from vit_spoof_detection_pda_tpu.train.trainer import Trainer
from vit_spoof_detection_pda_tpu.utils.checkpoint import CheckpointManager

B, STEPS = 128, 40
rng = np.random.default_rng(0)


def batches(epoch):
    r = np.random.default_rng(epoch)
    for _ in range(STEPS):
        lbl = r.integers(0, 2, B).astype(np.int32)
        base = np.where(lbl[:, None, None, None] == 1, 0.62, 0.38)
        img = np.clip(base + r.normal(0, 0.18, (B, 224, 224, 3)), 0, 1)
        yield {"image": img.astype(np.float32), "label": lbl}


def val_batches():
    r = np.random.default_rng(999)
    for _ in range(4):
        lbl = r.integers(0, 2, B).astype(np.int32)
        base = np.where(lbl[:, None, None, None] == 1, 0.62, 0.38)
        img = np.clip(base + r.normal(0, 0.18, (B, 224, 224, 3)), 0, 1)
        yield {"image": img.astype(np.float32), "label": lbl}


with tempfile.TemporaryDirectory() as ckdir:
    cfg = Config().with_overrides({
        "optim.num_epochs": 2, "optim.learning_rate": 3e-5,
        "telemetry.jsonl_path": None, "telemetry.log_interval": 20,
        "threshold.optimize": True,
        "checkpoint.save_dir": ckdir})
    module = ViTAntiSpoof(dtype=jnp.bfloat16)
    mesh = make_mesh()
    tr = Trainer(cfg, module, train_batches=batches,
                 val_batches=val_batches, steps_per_epoch=STEPS,
                 mesh=mesh,
                 checkpoints=CheckpointManager(ckdir))
    t0 = time.time()
    best = tr.fit()
    wall = time.time() - t0
    print(f"fit wall={wall:.0f}s best={best}", flush=True)
    imgs_per_s = 2 * STEPS * B / wall
    print(f"end-to-end (incl. host feed + val + ckpt): "
          f"{imgs_per_s:.0f} img/s", flush=True)

    # resume from the checkpoint written during fit
    tr2 = Trainer(cfg, module, train_batches=batches,
                  val_batches=val_batches, steps_per_epoch=STEPS,
                  mesh=mesh)
    mgr = CheckpointManager(ckdir)
    tr2.state = mgr.restore(tr2.state)
    print(f"resumed at step {int(tr2.state.step)}", flush=True)
    vm = tr2.validate()
    print(f"post-resume val f1={vm['f1']:.3f} auc={vm['auc']:.3f}",
          flush=True)
    assert vm["auc"] > 0.8, "model failed to learn the separable task"
    print("TRAINSMOKE OK", flush=True)
