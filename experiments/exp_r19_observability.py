"""Observability stack on the real TPU (axon relay):

1. `doctor` — full check table on the hardware backend (Mosaic
   lowering, memory stats, mesh, codec, cache).
2. `train/device_mem_gb` — does the axon PJRT client expose
   memory_stats, and does the Trainer's log record carry the key?
3. `jax.profiler.start_trace/stop_trace` — can a TensorBoard trace be
   captured through the relay at all?  (Never probed; BENCH_NOTES gets
   the verdict either way.)

Usage: PYTHONPATH=/root/.axon_site:/root/repo \
    python experiments/exp_r19_observability.py
(the script also self-repairs sys.path so a bare invocation works)
"""

import json
import os
import subprocess
import sys
import time

# CLAUDE.md platform gotcha: scripts importing the package need both the
# repo AND the axon plugin's sitecustomize dir importable
for p in ("/root/repo", "/root/.axon_site"):
    if p not in sys.path:
        sys.path.insert(0, p)

OUT = {}


def main():
    # ---- 1. doctor on the TPU backend
    t0 = time.time()
    p = subprocess.run([sys.executable, "-m", "vit_spoof_detection_pda_tpu",
                        "doctor", "--json"], capture_output=True,
                       text=True, timeout=1200, cwd="/root/repo")
    rows = [json.loads(l) for l in p.stdout.splitlines()
            if l.strip().startswith("{")]
    OUT["doctor"] = {r["check"]: r["status"] for r in rows}
    OUT["doctor_detail"] = rows
    print(f"doctor on TPU ({time.time()-t0:.0f}s):", OUT["doctor"],
          flush=True)

    # ---- 2. memory_stats via the library probe
    from vit_spoof_detection_pda_tpu.utils import profiling
    mem = profiling.device_memory_gb()
    OUT["device_memory_gb"] = mem
    print("device_memory_gb:", mem, flush=True)

    # ---- 3. profiler trace through the relay
    import jax
    import jax.numpy as jnp
    trace_dir = "/tmp/pad_profile_probe"
    verdict = "unknown"
    try:
        jax.profiler.start_trace(trace_dir)
        x = jnp.ones((256, 256), jnp.bfloat16)
        y = jax.jit(lambda a: (a @ a).sum())(x)
        float(y)
        jax.profiler.stop_trace()
        files = []
        for root, _, names in os.walk(trace_dir):
            files += [os.path.join(root, n) for n in names]
        nbytes = sum(os.path.getsize(f) for f in files)
        verdict = (f"trace written: {len(files)} files, {nbytes} B"
                   if files else "no trace files produced")
    except Exception as e:  # noqa: BLE001 - probe records the failure mode
        verdict = f"FAILED: {type(e).__name__}: {e}"
    OUT["profiler_trace"] = verdict
    print("profiler trace:", verdict, flush=True)

    print(json.dumps(OUT, default=str)[:2000])


if __name__ == "__main__":
    main()
