"""REAL multi-process validation of the multi-host path (SURVEY §5
"Multi-host init"): two OS processes x 4 virtual CPU devices each,
gloo-backed collectives — not the single-process 8-device
approximation the rest of the suite uses.

Covers: ``init_multi_host`` (jax.distributed), a global (8,1) mesh
spanning both processes, ``shard_batch`` assembling per-host LOCAL rows
into the global batch (the shard_for_host data contract), the compiled
train step's gradient all-reduce crossing processes, and the Trainer's
validate() metric broadcast (multihost_utils.broadcast_one_to_all) that
keeps best-checkpoint/early-stop decisions in lockstep."""

import json
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

_WORKER = textwrap.dedent("""
    import os, sys, json
    pid = int(sys.argv[1]); port = sys.argv[2]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    import jax
    jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import jax.numpy as jnp
    from flax import linen as nn
    from vit_spoof_detection_pda_tpu.config import Config
    from vit_spoof_detection_pda_tpu.ops import losses
    from vit_spoof_detection_pda_tpu.parallel.mesh import (
        init_multi_host, make_mesh, shard_batch)
    from vit_spoof_detection_pda_tpu.train import (
        create_train_state, make_optimizer, make_train_step)

    idx, n = init_multi_host(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=2, process_id=pid)
    assert (idx, n) == (pid, 2) and jax.device_count() == 8
    mesh = make_mesh()

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, *, train=False):
            return nn.Dense(2)(jnp.mean(x, axis=(1, 2)))

    rng = np.random.default_rng(0)
    g_images = rng.random((8, 16, 16, 3)).astype(np.float32)
    g_labels = (np.arange(8) % 2).astype(np.int32)
    # the shard_for_host contract: each host holds ONLY its rows
    local = {"image": g_images[4 * pid:4 * pid + 4],
             "label": g_labels[4 * pid:4 * pid + 4]}
    batch = shard_batch(local, mesh)
    assert batch["image"].shape == (8, 16, 16, 3)   # global, assembled

    state = create_train_state(Tiny(), make_optimizer(1e-2),
                               jax.random.PRNGKey(0),
                               input_shape=(1, 16, 16, 3))
    step = make_train_step(losses.make_loss_fn("focal"), donate=False)
    losses_out = []
    for _ in range(3):
        state, m = step(state, batch)
        losses_out.append(float(m["loss"]))

    # device-pool mode across processes: the IDENTICAL pool stages
    # REPLICATED on every host (train/pool.py packed staging over the
    # global mesh) and each host slices its rows from the identical
    # global index stream (the Trainer._device_batch contract) — the
    # pool-fed loss must equal the direct-rows loss
    from vit_spoof_detection_pda_tpu.train.pool import DevicePoolData
    pool_imgs = np.random.default_rng(7).integers(
        0, 256, (10, 16, 16, 3), dtype=np.uint8)
    pool_lbls = (np.arange(10) % 2).astype(np.int32)
    pdata = DevicePoolData(pool_imgs, pool_lbls, live_mult=1,
                           spoof_mult=1, batch_size=8, seed=0, mesh=mesh)
    assert pdata.packed and pdata.pool.sharding.is_fully_replicated
    gidx = np.asarray([9, 1, 4, 7, 5, 0, 2, 6], np.int32)
    unpack = pdata.wrap_prep(lambda k, x: x.astype(jnp.float32) / 255.0)
    step_p = make_train_step(losses.make_loss_fn("focal"), donate=False,
                             mesh=mesh, batch_prep=unpack)
    per = len(gidx) // 2
    lo = pid * per
    small = shard_batch({"index": gidx[lo:lo + per],
                         "label": pool_lbls[gidx][lo:lo + per]}, mesh)
    s_p = create_train_state(Tiny(), make_optimizer(1e-2),
                             jax.random.PRNGKey(3),
                             input_shape=(1, 16, 16, 3))
    _, m_pool = step_p(s_p, {"image": pdata.pool, **small})
    loss_pool = float(m_pool["loss"])
    step_r = make_train_step(
        losses.make_loss_fn("focal"), donate=False, mesh=mesh,
        batch_prep=lambda k, x: x.astype(jnp.float32) / 255.0)
    rows = pool_imgs[gidx]
    _, m_rows = step_r(s_p, shard_batch(
        {"image": rows[lo:lo + per],
         "label": pool_lbls[gidx][lo:lo + per]}, mesh))
    loss_rows = float(m_rows["loss"])
    assert abs(loss_pool - loss_rows) < 1e-6, (loss_pool, loss_rows)

    # Trainer.validate: per-host val shards -> broadcast_one_to_all
    from vit_spoof_detection_pda_tpu.train.trainer import Trainer
    cfg = Config().with_overrides({
        "optim.num_epochs": 1, "optim.learning_rate": 1e-2,
        "data.img_size": 16,
        "telemetry.jsonl_path": f"/tmp/mh_metrics_{pid}.jsonl",
    })
    def train_batches(epoch):
        yield dict(local)
    def val_batches():
        yield dict(local)                 # per-host val shard
    trainer = Trainer(cfg, Tiny(), train_batches=train_batches,
                      val_batches=val_batches, steps_per_epoch=1,
                      mesh=mesh)
    val = trainer.validate()

    # distributed checkpoint: every process participates in the save
    # of the GLOBALLY-sharded state, then restores it (orbax uses the
    # jax.distributed KV store for cross-process coordination)
    from vit_spoof_detection_pda_tpu.utils.checkpoint import (
        CheckpointManager)
    ckpt_dir = sys.argv[3]
    mgr = CheckpointManager(ckpt_dir)
    assert mgr.save(1, state, metrics={"val_f1": float(val["f1"])})
    mgr.wait_until_finished()
    restored = mgr.restore(state, step=1)
    mgr.close()
    leaf0 = float(jax.tree.leaves(restored.params)[0].reshape(-1)[0])
    want0 = float(jax.tree.leaves(state.params)[0].reshape(-1)[0])
    assert leaf0 == want0, (leaf0, want0)

    print("RESULT " + json.dumps(
        {"pid": pid, "losses": losses_out, "val_f1": val["f1"],
         "val_auc": val["auc"], "ckpt_leaf0": leaf0}), flush=True)
""")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_train_step_and_validate(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    port = _free_port()
    import os
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        [p for p in (env.get("PYTHONPATH", ""),) if p]
        + [str(p) for p in sys.path if p])
    # the workers must NOT inherit this pytest process's 8-device flag
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    ckpt_dir = tmp_path / "mh_ckpt"
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(i), str(port), str(ckpt_dir)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]
    results = {}
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert line, out[-3000:]
        r = json.loads(line[-1][len("RESULT "):])
        results[r["pid"]] = r

    # both processes computed identical losses (one global program)
    np.testing.assert_array_equal(results[0]["losses"],
                                  results[1]["losses"])
    # validate()'s broadcast kept the metric decision in lockstep
    assert results[0]["val_f1"] == results[1]["val_f1"]
    assert results[0]["val_auc"] == results[1]["val_auc"]
    # the distributed checkpoint round-tripped on both processes
    assert results[0]["ckpt_leaf0"] == results[1]["ckpt_leaf0"]

    # and the 2-process run matches the single-process 8-device oracle
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from vit_spoof_detection_pda_tpu.ops import losses
    from vit_spoof_detection_pda_tpu.parallel.mesh import (make_mesh,
                                                           shard_batch)
    from vit_spoof_detection_pda_tpu.train import (create_train_state,
                                                   make_optimizer,
                                                   make_train_step)

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, *, train=False):
            return nn.Dense(2)(jnp.mean(x, axis=(1, 2)))

    rng = np.random.default_rng(0)
    batch = shard_batch(
        {"image": rng.random((8, 16, 16, 3)).astype(np.float32),
         "label": (np.arange(8) % 2).astype(np.int32)}, make_mesh())
    state = create_train_state(Tiny(), make_optimizer(1e-2),
                               jax.random.PRNGKey(0),
                               input_shape=(1, 16, 16, 3))
    step = make_train_step(losses.make_loss_fn("focal"), donate=False)
    want = []
    for _ in range(3):
        state, m = step(state, batch)
        want.append(float(m["loss"]))
    np.testing.assert_allclose(results[0]["losses"], want, rtol=1e-6)
