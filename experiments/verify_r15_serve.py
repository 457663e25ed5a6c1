"""End-to-end verify of the live-mode serve CLI (this session's diff).

Builds a tiny ViT config, saves a real Orbax checkpoint, launches the
`serve` CLI in live mode (--checkpoint, interpret) in a thread, POSTs a
JPEG and an x-pad-raw frame, and checks scores against a direct
module forward.  Also replays one golden metrics oracle.
"""
import os

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")

import io
import json
import tempfile
import threading
import urllib.request
from pathlib import Path

import jax.numpy as jnp
import numpy as np
from PIL import Image

from vit_spoof_detection_pda_tpu.config import Config
from vit_spoof_detection_pda_tpu.models.registry import build_vit_from_config
from vit_spoof_detection_pda_tpu.train.state import (create_train_state,
                                                     make_optimizer)
from vit_spoof_detection_pda_tpu.utils.checkpoint import CheckpointManager

SIZE = 32
tmp = Path(tempfile.mkdtemp())

cfg = Config.preset("test").with_overrides(
    {"model.patch_size": 8, "model.depth": 2, "model.embed_dim": 32,
     "model.num_heads": 4, "model.head_hidden": 16,
     "data.img_size": SIZE})
module = build_vit_from_config(cfg.model, jnp.bfloat16)
state = create_train_state(module, make_optimizer(1e-3),
                           jax.random.PRNGKey(0),
                           input_shape=(1, SIZE, SIZE, 3))
variables = {"params": state.params}
ckdir = tmp / "ckpt"
mgr = CheckpointManager(str(ckdir))
assert mgr.save(7, state, metrics={"val_f1": 1.0})
mgr.close()

# write the config so the CLI can rebuild the model
cfg_path = tmp / "cfg.json"
cfg_path.write_text(cfg.to_json())

# ---- launch the CLI live mode in a thread on an ephemeral port ----
from vit_spoof_detection_pda_tpu.serve.server import (build_programs_live,
                                                      make_server_from_programs)

programs, img_size, metas = build_programs_live(
    module, variables, shapes=(1, 2), img_size=SIZE, interpret=True)
server = make_server_from_programs(programs, img_size, metas,
                                   port=0, max_wait_ms=1.0)
port = server.server_address[1]
t = threading.Thread(target=server.serve_forever, daemon=True)
t.start()

# ---- reference score: direct forward through the same regime ----
frame = np.random.default_rng(0).integers(0, 256, (SIZE, SIZE, 3),
                                          dtype=np.uint8)
want = float(programs[1](frame[None])["prob1"][0])

# JPEG upload
buf = io.BytesIO()
Image.fromarray(frame).save(buf, format="PNG")  # PNG = lossless
req = urllib.request.Request(f"http://127.0.0.1:{port}/score",
                             data=buf.getvalue(), method="POST")
out = json.loads(urllib.request.urlopen(req, timeout=60).read())
assert abs(out["prob_live"] - want) < 1e-5, (out, want)
print("PNG upload score parity ok:", out["prob_live"], "vs", want)

# raw-frame upload
req = urllib.request.Request(
    f"http://127.0.0.1:{port}/score", data=frame.tobytes(), method="POST",
    headers={"Content-Type": "application/x-pad-raw"})
out2 = json.loads(urllib.request.urlopen(req, timeout=60).read())
assert abs(out2["prob_live"] - want) < 1e-5, (out2, want)
print("raw-frame upload score parity ok:", out2["prob_live"])

# wrong-length raw frame -> 400
bad = urllib.request.Request(
    f"http://127.0.0.1:{port}/score", data=b"xx", method="POST",
    headers={"Content-Type": "application/x-pad-raw"})
try:
    urllib.request.urlopen(bad, timeout=60)
    raise AssertionError("expected 400")
except urllib.error.HTTPError as e:
    assert e.code == 400, e.code
print("wrong-length raw frame -> 400 ok")

# batch endpoint: N frames in one request, ordered results
rng = np.random.default_rng(3)
frames = rng.integers(0, 256, (5, SIZE, SIZE, 3), dtype=np.uint8)
want_b = [float(programs[1](frames[i:i + 1])["prob1"][0])
          for i in range(5)]
req = urllib.request.Request(
    f"http://127.0.0.1:{port}/score-batch", data=frames.tobytes(),
    method="POST", headers={"Content-Type": "application/x-pad-raw"})
outb = json.loads(urllib.request.urlopen(req, timeout=120).read())
assert outb["count"] == 5
for got, w in zip(outb["prob_live"], want_b):
    assert abs(got - w) < 1e-4, (outb["prob_live"], want_b)
print("score-batch endpoint parity ok:", outb["prob_live"])

# stats endpoint alive
stats = json.loads(urllib.request.urlopen(
    f"http://127.0.0.1:{port}/stats", timeout=60).read())
assert stats["requests"] >= 2
server.shutdown(); server.server_close(); server.batcher.close()

# ---- CLI argument contract: live mode + artifacts is an error ----
from vit_spoof_detection_pda_tpu.cli.serve import main as serve_main
for argv in (["--checkpoint", str(ckdir), "somedir"], [],
             ["--checkpoint", str(ckdir), "--shapes", "0,2"]):
    try:
        serve_main(argv)
        raise AssertionError(f"expected SystemExit for {argv}")
    except SystemExit as e:
        assert e.code == 2, (argv, e.code)
print("CLI arg validation ok")

# ---- full CLI wiring: config -> checkpoint -> live server ----
import socket

s = socket.socket(); s.bind(("127.0.0.1", 0))
port2 = s.getsockname()[1]; s.close()
cli = threading.Thread(target=serve_main, daemon=True, args=(
    ["--checkpoint", str(ckdir), "--shapes", "1,2", "--config",
     str(cfg_path), "--port", str(port2), "--interpret", "--no-warmup"],))
cli.start()
import time
for _ in range(600):
    try:
        h = json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{port2}/healthz", timeout=5).read())
        break
    except Exception:
        time.sleep(0.2)
else:
    raise AssertionError("CLI live server never came up")
req = urllib.request.Request(
    f"http://127.0.0.1:{port2}/score", data=frame.tobytes(), method="POST",
    headers={"Content-Type": "application/x-pad-raw"})
out3 = json.loads(urllib.request.urlopen(req, timeout=120).read())
assert abs(out3["prob_live"] - want) < 1e-5, (out3, want)
h2 = json.loads(urllib.request.urlopen(
    f"http://127.0.0.1:{port2}/healthz", timeout=30).read())
assert h2["artifacts"][0]["checkpoint"]["step"] == 7, h2["artifacts"]
print("CLI live mode end-to-end ok:", out3["prob_live"])

# hot-reload: save a NEW checkpoint step, POST /admin/reload, and the
# server must swap to the new weights with the old score changing
state2 = create_train_state(module, make_optimizer(1e-3),
                            jax.random.PRNGKey(42),
                            input_shape=(1, SIZE, SIZE, 3))
mgr2 = CheckpointManager(str(ckdir))
assert mgr2.save(8, state2, metrics={"val_f1": 1.0})
mgr2.close()
req = urllib.request.Request(
    f"http://127.0.0.1:{port2}/admin/reload", data=b"", method="POST")
rel = json.loads(urllib.request.urlopen(req, timeout=300).read())
assert rel["reloaded"] is True
assert rel["artifacts"][0]["checkpoint"]["step"] == 8, rel["artifacts"]
req = urllib.request.Request(
    f"http://127.0.0.1:{port2}/score", data=frame.tobytes(),
    method="POST", headers={"Content-Type": "application/x-pad-raw"})
out4 = json.loads(urllib.request.urlopen(req, timeout=120).read())
assert abs(out4["prob_live"] - want) > 1e-6, "reload did not swap weights"
print("live hot-reload ok: step 7 score", want, "-> step 8 score",
      out4["prob_live"])

# ---- golden metrics oracle replay (regression canary) ----
import csv

from vit_spoof_detection_pda_tpu.metrics import parity as MP

ref = Path("/root/reference/results")
model_dirs = [d for d in ref.iterdir()
              if (d / "per_image_predictions.csv").exists()]
d = sorted(model_dirs)[0]
rows = list(csv.DictReader(open(d / "per_image_predictions.csv")))
scores = np.array([np.float32(r["spoof_score"]) for r in rows], np.float64)
labels = np.array([int(r["true_label"]) for r in rows])
auc = MP.np_roc_auc_score(labels, scores)
summary = json.loads((d / "evaluation_summary.json").read_text())
gold = summary.get("auc", summary.get("roc_auc"))
if gold is None:  # some flavors nest metrics
    gold = summary["metrics"]["auc"]
assert abs(auc - gold) < 1e-9, (auc, gold)
print(f"golden AUC replay ok ({d.name}): {auc} vs {gold}")
print("ALL VERIFY CHECKS PASSED")
