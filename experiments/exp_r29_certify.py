"""Final-round certification: reproduce EVERY headline number in one
session on a fresh relay (VERDICT r4 item 3), so README/docs quote a
single consistent measurement set.

Bands being re-certified (BENCH_NOTES):
  bench.py serving throughput   4,632-4,652 img/s (25.2x)
  train step (erf, fused)       120.0 ms after round 26 (was 123-126)
  B=1 lowlat device latency     0.265-0.30 ms/img official band
                                (round 25: dispatch-bound relay gave
                                0.77-0.79 — re-measure, don't infer)
  B=8 batch-grid                0.23-0.25 ms/img
  epoch end-to-end              876 img/s round 24 (capstone re-clocks)

Each stage is a subprocess running the PRODUCTION entrypoint (bench.py
/ python -m ... benchmark), serial, same session.  Results ->
experiments/out/r29_certify.json.

Usage: PYTHONPATH=/root/.axon_site:/root/repo \
    python experiments/exp_r29_certify.py
"""

import json
import os
import subprocess
import sys
import time
from pathlib import Path

OUT = Path("/root/repo/experiments/out")
OUT.mkdir(parents=True, exist_ok=True)
ENV = dict(os.environ)
ENV["PYTHONPATH"] = "/root/.axon_site:/root/repo"
T0 = time.time()
RES = {}


def log(msg):
    print(f"[{time.time() - T0:7.1f}s] {msg}", flush=True)


def run(args, timeout=1800):
    p = subprocess.run(list(map(str, args)), capture_output=True,
                       text=True, env=ENV, timeout=timeout,
                       cwd="/root/repo")
    if p.returncode != 0:
        print(p.stdout[-3000:], p.stderr[-3000:], flush=True)
        raise SystemExit(f"stage failed: {args}")
    return p.stdout


def last_json(out):
    for ln in reversed(out.strip().splitlines()):
        if ln.startswith("{"):
            return json.loads(ln)
    raise ValueError("no JSON line in output:\n" + out[-1000:])


PY = [sys.executable, "-m", "vit_spoof_detection_pda_tpu"]

# 1. headline bench (the driver's own artifact)
log("bench.py ...")
out = run([sys.executable, "bench.py"], timeout=1800)
line = [ln for ln in out.splitlines() if ln.startswith("{")][-1]
RES["bench"] = json.loads(line)
log(f"bench: {line}")

# 2. train step (erf parity default, fused forward + round-26 backward)
log("benchmark --train-step ...")
out = run(PY + ["benchmark", "--train-step", "--iters", "18"])
RES["train_step"] = last_json(out)
log(f"train step: {RES['train_step'].get('ms_per_step'):.1f} ms/step")

# 3. B=1 lowlat official protocol, 3 reps (report each)
RES["lowlat_b1_ms"] = []
for rep in range(3):
    out = run(PY + ["benchmark", "--device-latency", "--lowlat",
                    "--batch-size", "1"])
    j = last_json(out)
    RES["lowlat_b1_ms"].append(j.get("ms_per_image"))
    log(f"lowlat B=1 rep{rep}: {j.get('ms_per_image')} ms/img")

# 4. B=8 batch-grid
out = run(PY + ["benchmark", "--device-latency", "--lowlat",
                "--lowlat-batch-grid", "--batch-size", "8"])
RES["batchgrid_b8_ms"] = last_json(out).get("ms_per_image")
log(f"batch-grid B=8: {RES['batchgrid_b8_ms']} ms/img")

# 5. serving profile -> xprof roofline (VERDICT r4 item 5: re-pin the
#    serving MFU ceiling with current kernels)
trace = "/tmp/r29_serve_trace"
log("benchmark --fastserve --profile ...")
out = run(PY + ["benchmark", "--fastserve", "--batch-size", "128",
                "--profile", trace])
RES["fastserve_profiled_raw"] = out.strip().splitlines()[-4:]
log("\n".join(out.strip().splitlines()[-3:]))
out = run(PY + ["analyze", "--xprof", trace], timeout=1200)
RES["xprof_raw"] = out.strip().splitlines()[-40:]
print(out[-3000:], flush=True)

with open(OUT / "r29_certify.json", "w") as f:
    json.dump(RES, f, indent=2)
log("CERTIFY SUMMARY: " + json.dumps(
    {k: v for k, v in RES.items() if not k.endswith("_raw")}))
