"""HTTP load generator for the PAD scoring service (`serve-bench`).

Productizes the hardware-measurement methodology of
experiments/exp_r14_serve.py / exp_r15_serve_raw.py so any deployment
can be load-tested from any client host — no jax, no model code, just
stdlib HTTP against the daemon's endpoints:

- ``mode="raw"``: pre-decoded ``application/x-pad-raw`` frames on
  ``POST /score`` (isolates service + device cost from host decode),
- ``mode="jpeg"``: encoded bodies on ``POST /score`` (the full
  ingest path incl. server-side decode),
- ``batch=N``: N concatenated raw frames per ``POST /score-batch``
  request (bulk/video callers; amortizes per-request HTTP).

Reports wall-clock throughput, client-side latency percentiles, error
counts, and the server's own ``/stats`` delta (batch fill, queue).
"""

from __future__ import annotations

import io
import json
import time
import urllib.error
import urllib.request
from concurrent.futures import ThreadPoolExecutor

import numpy as np


def _post(url: str, path: str, body: bytes, ctype: str, timeout: float):
    req = urllib.request.Request(
        url.rstrip("/") + path, data=body, method="POST",
        headers={"Content-Type": ctype})
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


def _get(url: str, path: str, timeout: float):
    with urllib.request.urlopen(url.rstrip("/") + path,
                                timeout=timeout) as r:
        return json.loads(r.read())


def _make_body(mode: str, img_size: int, image_path, rng):
    if image_path is not None:
        return open(image_path, "rb").read(), "application/octet-stream"
    frame = rng.integers(0, 256, (img_size, img_size, 3), np.uint8)
    if mode == "raw":
        return frame.tobytes(), "application/x-pad-raw"
    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(frame).save(buf, format="JPEG", quality=90)
    return buf.getvalue(), "application/octet-stream"


def run_load(url: str, *, mode: str = "raw", clients: int = 8,
             requests: int = 256, img_size: int = 224, batch=None,
             image_path=None, warmup: int = 16,
             timeout: float = 300.0) -> dict:
    """Drive the service and return a stats dict (see module doc).

    ``batch=N`` switches to ``/score-batch`` with N raw frames per
    request (``mode``/``image_path`` are ignored for the body — the
    batch endpoint is raw-only by contract).
    """
    if mode not in ("raw", "jpeg"):
        raise ValueError(f"mode must be 'raw' or 'jpeg', got {mode!r}")
    if clients < 1 or requests < 1:
        raise ValueError("clients and requests must be >= 1")
    if not url.startswith(("http://", "https://")):
        raise ValueError(f"url needs a scheme (http://host:port), "
                         f"got {url!r}")
    rng = np.random.default_rng(0)
    if batch is not None:
        if batch < 1:
            raise ValueError(f"batch must be >= 1, got {batch}")
        frame = rng.integers(0, 256, (img_size, img_size, 3), np.uint8)
        body = np.broadcast_to(
            frame, (int(batch),) + frame.shape).tobytes()
        ctype, path = "application/x-pad-raw", "/score-batch"
        imgs_per_req = int(batch)
    else:
        body, ctype = _make_body(mode, img_size, image_path, rng)
        path, imgs_per_req = "/score", 1

    errors, latencies = [], []

    def one(_):
        t0 = time.monotonic()
        try:
            out = _post(url, path, body, ctype, timeout)
            n = out.get("count", 1)
        except (urllib.error.URLError, urllib.error.HTTPError,
                OSError, ValueError) as e:
            # ValueError covers malformed-URL urlopen failures AND
            # json decode errors (JSONDecodeError subclasses it)
            errors.append(repr(e))
            return 0
        latencies.append((time.monotonic() - t0) * 1e3)
        return n

    with ThreadPoolExecutor(clients) as pool:
        list(pool.map(one, range(min(warmup, requests))))
    latencies.clear()
    errors.clear()
    # sample /stats AFTER the warmup pool drains so the batch-fill
    # delta covers only the measured run
    try:
        stats_before = _get(url, "/stats", timeout)
    except Exception:
        stats_before = None
    t0 = time.monotonic()
    with ThreadPoolExecutor(clients) as pool:
        counts = list(pool.map(one, range(requests)))
    wall = time.monotonic() - t0
    n_img = int(sum(counts))

    if batch:
        eff_mode = f"batch{batch}"
    elif image_path is not None:
        # file bytes always take the server-side decode ingest path,
        # whatever `mode` asked for — label what was measured
        eff_mode = "file"
    else:
        eff_mode = mode
    lat = np.asarray(latencies)
    out = {
        "url": url, "endpoint": path,
        "mode": eff_mode,
        "clients": clients, "requests": requests, "images": n_img,
        "wall_s": round(wall, 3),
        "img_per_s": round(n_img / wall, 1) if wall > 0 else None,
        # None, not 0.0: an all-errors run must not read as 0 ms latency
        "latency_ms": None if not latencies else {
            "p50": round(float(np.percentile(lat, 50)), 1),
            "p95": round(float(np.percentile(lat, 95)), 1),
            "p99": round(float(np.percentile(lat, 99)), 1),
            "mean": round(float(lat.mean()), 1)},
        "errors": len(errors),
        "error_samples": errors[:3],
    }
    try:
        stats_after = _get(url, "/stats", timeout)
        out["server_stats"] = stats_after
        if stats_before:
            d_img = (stats_after.get("images", 0)
                     - stats_before.get("images", 0))
            d_disp = (stats_after.get("batches", 0)
                      - stats_before.get("batches", 0))
            if d_disp > 0:
                out["avg_batch_fill"] = round(d_img / d_disp, 2)
    except Exception:
        pass
    return out
