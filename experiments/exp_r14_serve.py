"""Round-14: the serving daemon measured end-to-end on the real chip.

Exports the measured-regime artifacts (lowlat B=1 + batch-grid B=16,
TPU Pallas programs cross-lowered on this host), starts the HTTP
service in-process, and drives it over loopback:

  phase A  32 concurrent clients, pre-encoded JPEG bodies -> e2e
           throughput + latency percentiles + batch fill
  phase B  1 sequential client -> unloaded e2e latency

Expectations going in: the device side costs ~0.25 ms/img at B=16, so
e2e is bound by (1) the single-core host's JPEG decode (~3-6 ms/img,
parallelized across handler threads only as far as 1 core allows) and
(2) the axon relay's synchronous result fetch per batch.  Both taxes
are environment, not design — record them explicitly.

PYTHONPATH=/root/.axon_site:/root/repo python experiments/exp_r14_serve.py
"""

import io
import json
import tempfile
import threading
import time
import urllib.request
from concurrent.futures import ThreadPoolExecutor

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp
    from PIL import Image

    from vit_spoof_detection_pda_tpu.models import artifact as A
    from vit_spoof_detection_pda_tpu.models.vit import ViTAntiSpoof
    from vit_spoof_detection_pda_tpu.serve import serve as _serve  # noqa
    from vit_spoof_detection_pda_tpu.serve import make_server
    from vit_spoof_detection_pda_tpu.utils.aot import cached_compile

    module = ViTAntiSpoof(dtype=jnp.bfloat16, gelu="tanh")
    init = cached_compile(
        module.init,
        (jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3), jnp.float32)),
        key="bench_vit_b16_init")
    variables = init(jax.random.PRNGKey(0),
                     jnp.zeros((1, 224, 224, 3), jnp.float32))

    d = tempfile.mkdtemp(prefix="pad_serve_")
    for name, mode, bs in (("lowlat1", "lowlat", 1),
                           ("grid16", "batch_grid", 16)):
        t0 = time.time()
        A.save_serving_artifact(f"{d}/{name}", module, variables,
                                mode=mode, batch_size=bs)
        print(f"export {name}: {time.time()-t0:.1f}s", flush=True)

    srv = make_server([f"{d}/lowlat1", f"{d}/grid16"], port=0,
                      max_batch=16, max_wait_ms=3.0)
    b = srv.batcher
    for size in b.batch_sizes:                      # warm = TPU compile
        t0 = time.time()
        b._programs[size](np.zeros((size, 224, 224, 3), np.uint8))
        print(f"warm shape {size}: {time.time()-t0:.1f}s", flush=True)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    port = srv.server_address[1]
    print(f"serving on :{port}", flush=True)

    rng = np.random.default_rng(0)
    bodies = []
    for i in range(64):
        buf = io.BytesIO()
        Image.fromarray(rng.integers(0, 256, (224, 224, 3),
                                     dtype=np.uint8)).save(
            buf, format="JPEG", quality=90)
        bodies.append(buf.getvalue())

    def post(i):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/score",
            data=bodies[i % len(bodies)], method="POST")
        t0 = time.monotonic()
        for attempt in (1, 2):                  # tolerate one RST burst
            try:
                out = json.loads(
                    urllib.request.urlopen(req, timeout=120).read())
                break
            except ConnectionResetError:
                if attempt == 2:
                    raise
        return (time.monotonic() - t0) * 1000.0, out

    # phase A: concurrent load
    n_req, n_clients = 1024, 32
    with ThreadPoolExecutor(n_clients) as pool:     # warmup burst
        list(pool.map(post, range(64)))
    stats0 = b.stats()
    t0 = time.monotonic()
    with ThreadPoolExecutor(n_clients) as pool:
        lats = [r[0] for r in pool.map(post, range(n_req))]
    dt = time.monotonic() - t0
    stats1 = b.stats()
    batches = stats1["batches"] - stats0["batches"]
    fill = (stats1["images"] - stats0["images"]) / max(batches, 1)
    lats = np.asarray(lats)
    print(json.dumps({
        "phase": "A_concurrent", "clients": n_clients, "requests": n_req,
        "wall_s": round(dt, 2), "img_per_s": round(n_req / dt, 1),
        "avg_batch_fill": round(fill, 2),
        "lat_ms": {"p50": round(float(np.percentile(lats, 50)), 1),
                   "p95": round(float(np.percentile(lats, 95)), 1),
                   "p99": round(float(np.percentile(lats, 99)), 1)},
    }), flush=True)

    # phase B: sequential unloaded latency
    seq = [post(i)[0] for i in range(100)]
    seq = np.asarray(seq[10:])
    print(json.dumps({
        "phase": "B_sequential",
        "lat_ms": {"p50": round(float(np.percentile(seq, 50)), 2),
                   "p95": round(float(np.percentile(seq, 95)), 2),
                   "min": round(float(seq.min()), 2)},
    }), flush=True)

    # phase C: raw pre-decoded frames (no host JPEG decode) — isolates
    # the relay round-trip + HTTP tax from the 1-core decode tax
    raws = [rng.integers(0, 256, 224 * 224 * 3, dtype=np.uint8).tobytes()
            for _ in range(16)]

    def post_raw(i):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/score",
            data=raws[i % len(raws)], method="POST",
            headers={"Content-Type": "application/x-pad-raw"})
        t0 = time.monotonic()
        for attempt in (1, 2):
            try:
                json.loads(
                    urllib.request.urlopen(req, timeout=120).read())
                break
            except ConnectionResetError:
                if attempt == 2:
                    raise
        return (time.monotonic() - t0) * 1000.0

    with ThreadPoolExecutor(n_clients) as pool:      # warm
        list(pool.map(post_raw, range(64)))
    s0 = b.stats()
    t0 = time.monotonic()
    with ThreadPoolExecutor(n_clients) as pool:
        lats_c = list(pool.map(post_raw, range(n_req)))
    dt_c = time.monotonic() - t0
    s1 = b.stats()
    fill_c = ((s1["images"] - s0["images"])
              / max(s1["batches"] - s0["batches"], 1))
    lats_c = np.asarray(lats_c)
    print(json.dumps({
        "phase": "C_concurrent_raw", "clients": n_clients,
        "requests": n_req, "wall_s": round(dt_c, 2),
        "img_per_s": round(n_req / dt_c, 1),
        "avg_batch_fill": round(fill_c, 2),
        "lat_ms": {"p50": round(float(np.percentile(lats_c, 50)), 1),
                   "p95": round(float(np.percentile(lats_c, 95)), 1)},
    }), flush=True)
    seq_c = np.asarray([post_raw(i) for i in range(60)][10:])
    print(json.dumps({
        "phase": "D_sequential_raw",
        "lat_ms": {"p50": round(float(np.percentile(seq_c, 50)), 2),
                   "min": round(float(seq_c.min()), 2)},
    }), flush=True)
    print(json.dumps({"final_stats": b.stats()}), flush=True)
    srv.shutdown_clean()


if __name__ == "__main__":
    main()
