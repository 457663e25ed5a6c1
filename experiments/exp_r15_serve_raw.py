"""Round-15: serving daemon with the decode-free paths, on hardware.

The round-13 measurement (exp_r14_serve) pinned the JPEG path at
124 img/s e2e — host decode (~3-6 ms/img on one core) + per-request
HTTP.  This round measures the two amortization levers shipped since:

  phase A  32 concurrent clients, single RAW frame bodies
           (application/x-pad-raw) -> removes the decode tax only
  phase B  4 concurrent clients x /score-batch with 128-frame blocks
           -> removes decode AND per-request HTTP; device batches fill
           the fastserve-128 artifact
  phase C  1 client, one 1024-frame /score-batch -> bulk ceiling
  phase D  1 sequential raw client -> unloaded latency (vs 58 ms JPEG)

Artifacts: lowlat B=1 + batch-grid B=16 + fastserve B=128 (the full
measured regime table).  Expected ceilings through the tunneled relay:
each device dispatch pays ~50 ms synchronous result fetch, so B=16
tops out ~300 img/s and B=128 at ~1,600-2,300 img/s; on a real TPU VM
neither tax exists.

PYTHONPATH=/root/.axon_site:/root/repo python experiments/exp_r15_serve_raw.py
"""

import json
import tempfile
import threading
import time
import urllib.request
from concurrent.futures import ThreadPoolExecutor

import numpy as np


def _post(port, path, body, ctype):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=body, method="POST",
        headers={"Content-Type": ctype})
    with urllib.request.urlopen(req, timeout=300) as r:
        return json.loads(r.read())


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp

    from vit_spoof_detection_pda_tpu.models import artifact as A
    from vit_spoof_detection_pda_tpu.models.vit import ViTAntiSpoof
    from vit_spoof_detection_pda_tpu.serve import make_server
    from vit_spoof_detection_pda_tpu.utils.aot import cached_compile

    module = ViTAntiSpoof(dtype=jnp.bfloat16, gelu="tanh")
    init = cached_compile(
        module.init,
        (jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3), jnp.float32)),
        key="bench_vit_b16_init")
    variables = init(jax.random.PRNGKey(0),
                     jnp.zeros((1, 224, 224, 3), jnp.float32))

    d = tempfile.mkdtemp(prefix="pad_serve_r15_")
    for name, mode, bs in (("lowlat1", "lowlat", 1),
                           ("grid16", "batch_grid", 16),
                           ("fast128", "fastserve", 128)):
        t0 = time.time()
        A.save_serving_artifact(f"{d}/{name}", module, variables,
                                mode=mode, batch_size=bs)
        print(f"export {name}: {time.time()-t0:.1f}s", flush=True)

    srv = make_server([f"{d}/lowlat1", f"{d}/grid16", f"{d}/fast128"],
                      port=0, max_wait_ms=3.0)
    port = srv.server_address[1]
    b = srv.batcher
    for size in b.batch_sizes:
        t0 = time.time()
        b._programs[size](np.zeros((size, 224, 224, 3), np.uint8))
        print(f"warm shape {size}: {time.time()-t0:.1f}s", flush=True)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    print(f"serving on :{port}", flush=True)

    rng = np.random.default_rng(0)
    frame = rng.integers(0, 256, (224, 224, 3), np.uint8)
    raw = frame.tobytes()

    # --- phase A: concurrent single raw frames --------------------------
    n_req = 1024
    lat = []

    def one(_):
        t0 = time.monotonic()
        out = _post(port, "/score", raw, "application/x-pad-raw")
        lat.append((time.monotonic() - t0) * 1e3)
        return out["prob_live"]

    with ThreadPoolExecutor(32) as pool:   # warm the pool + program path
        list(pool.map(one, range(64)))
    lat.clear()
    t0 = time.monotonic()
    with ThreadPoolExecutor(32) as pool:
        probs = list(pool.map(one, range(n_req)))
    wall = time.monotonic() - t0
    lat_a = np.asarray(lat)
    print(json.dumps({
        "phase": "A_concurrent_raw", "clients": 32, "requests": n_req,
        "wall_s": round(wall, 2), "img_per_s": round(n_req / wall, 1),
        "lat_ms": {"p50": round(float(np.percentile(lat_a, 50)), 1),
                   "p95": round(float(np.percentile(lat_a, 95)), 1),
                   "p99": round(float(np.percentile(lat_a, 99)), 1)}}),
        flush=True)
    # same frame -> same score up to cross-regime bf16 drift (lowlat /
    # batch-grid / fastserve are different kernels; parity ~3e-3)
    assert max(probs) - min(probs) < 2e-2, (min(probs), max(probs))

    # --- phase B: concurrent 128-frame batch requests --------------------
    block = np.broadcast_to(frame, (128, 224, 224, 3)).copy()
    body = block.tobytes()

    def one_block(_):
        t0 = time.monotonic()
        out = _post(port, "/score-batch", body, "application/x-pad-raw")
        return (time.monotonic() - t0) * 1e3, out["count"]

    with ThreadPoolExecutor(4) as pool:
        list(pool.map(one_block, range(4)))    # warm
    t0 = time.monotonic()
    with ThreadPoolExecutor(4) as pool:
        res = list(pool.map(one_block, range(16)))
    wall = time.monotonic() - t0
    n_img = sum(c for _, c in res)
    print(json.dumps({
        "phase": "B_concurrent_batch128", "clients": 4, "blocks": 16,
        "images": n_img, "wall_s": round(wall, 2),
        "img_per_s": round(n_img / wall, 1),
        "block_ms_p50": round(float(np.percentile(
            [t for t, _ in res], 50)), 1)}), flush=True)

    # --- phase C: one 1024-frame block -----------------------------------
    big = np.broadcast_to(frame, (1024, 224, 224, 3)).copy().tobytes()
    _post(port, "/score-batch", big, "application/x-pad-raw")  # warm
    t0 = time.monotonic()
    out = _post(port, "/score-batch", big, "application/x-pad-raw")
    wall = time.monotonic() - t0
    print(json.dumps({
        "phase": "C_single_batch1024", "images": out["count"],
        "wall_s": round(wall, 2),
        "img_per_s": round(out["count"] / wall, 1)}), flush=True)

    # --- phase D: sequential raw latency ----------------------------------
    seq = []
    for _ in range(40):
        t0 = time.monotonic()
        _post(port, "/score", raw, "application/x-pad-raw")
        seq.append((time.monotonic() - t0) * 1e3)
    seq = np.asarray(seq[5:])
    print(json.dumps({
        "phase": "D_sequential_raw",
        "lat_ms": {"p50": round(float(np.percentile(seq, 50)), 2),
                   "p95": round(float(np.percentile(seq, 95)), 2),
                   "min": round(float(seq.min()), 2)}}), flush=True)

    print(json.dumps({"final_stats": b.stats()}), flush=True)
    srv.shutdown_clean()


if __name__ == "__main__":
    main()
