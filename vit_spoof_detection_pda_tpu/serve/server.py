"""Dependency-free HTTP front end over the MicroBatcher.

Endpoints (stdlib ``http.server``; one thread per connection, so host
decode parallelizes across clients while the single dispatcher thread
owns the device):

- ``POST /score`` — request body = image bytes (JPEG/PNG/anything PIL
  decodes).  Response: ``{"prob_live": p, "pred": 0|1,
  "label": "live"|"spoof", "latency_ms": t}`` (1 = live,
  data/conventions.py).  Undecodable bodies get HTTP 422.
- ``GET /healthz`` — liveness + artifact metadata.
- ``GET /stats`` — batcher counters and latency percentiles.

The server is fed by frozen serving artifacts (models/artifact.py): one
symbolic-batch module artifact serves every batch size, and/or several
fixed-batch Pallas artifacts (e.g. lowlat B=1 + batch-grid B=8/16)
each contribute their compiled shape — the dispatcher picks the
smallest shape that fits each window, which reproduces the measured
regime table (fastserve.auto_serving_mode) in deployment.
"""

from __future__ import annotations

import json
import logging
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Sequence

import numpy as np

from .batcher import MicroBatcher

log = logging.getLogger(__name__)

_MAX_BODY = 32 * 1024 * 1024          # 32 MB: generous for one image


def build_programs_from_artifacts(artifact_dirs: Sequence[str], *,
                                  max_batch: int = 16):
    """Load artifacts and assemble the MicroBatcher program table.

    Returns ``(programs, img_size, metas)``.  A fixed-batch artifact
    contributes exactly its compiled size; a symbolic-batch artifact
    fans across power-of-two buckets ``1, 2, 4, ... <= max_batch``
    (jax.export re-lowers per concrete shape on first use).  When two
    artifacts claim the same size the LAST one listed wins (so callers
    can layer a Pallas artifact over a module artifact's bucket).
    """
    from ..models.artifact import load_serving_artifact

    if not artifact_dirs:
        raise ValueError("need at least one artifact directory")
    programs, metas = {}, []
    img_size = None
    for d in artifact_dirs:
        art = load_serving_artifact(d)
        metas.append({"path": str(d), **art.meta})
        size = int(art.meta.get("img_size", 224))
        if img_size is None:
            img_size = size
        elif img_size != size:
            raise ValueError(
                f"artifact {d} has img_size {size}; earlier artifacts "
                f"use {img_size} — a server instance serves one size")

        def call(batch, art=art):
            out = art(batch)
            return {"prob1": np.asarray(out["prob1"]),
                    "pred": np.asarray(out["pred"])}

        fixed = art.meta.get("batch_size")
        if fixed is not None:
            programs[int(fixed)] = call
        else:
            b = 1
            while b <= max_batch:
                programs.setdefault(b, call)
                b *= 2
    return programs, img_size, metas


class _Handler(BaseHTTPRequestHandler):
    # the server instance carries .batcher / .metas / .started
    protocol_version = "HTTP/1.1"

    def log_message(self, fmt, *args):           # route through logging
        log.debug("%s %s", self.address_string(), fmt % args)

    def _send_json(self, code: int, payload: dict):
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):                            # noqa: N802 (stdlib API)
        srv = self.server
        if self.path == "/healthz":
            self._send_json(200, {
                "status": "ok",
                "uptime_s": round(time.monotonic() - srv.started, 1),
                "img_size": srv.batcher.img_size,
                "batch_sizes": list(srv.batcher.batch_sizes),
                "artifacts": srv.metas})
        elif self.path == "/stats":
            self._send_json(200, srv.batcher.stats())
        else:
            self._send_json(404, {"error": f"unknown path {self.path}"})

    def do_POST(self):                           # noqa: N802 (stdlib API)
        if self.path != "/score":
            self._send_json(404, {"error": f"unknown path {self.path}"})
            return
        srv = self.server
        try:
            length = int(self.headers.get("Content-Length", 0))
        except ValueError:
            length = 0
        if length <= 0:
            self._send_json(400, {"error": "empty body (send the image "
                                           "bytes as the request body)"})
            return
        if length > _MAX_BODY:
            self._send_json(413, {"error": f"body {length} B exceeds "
                                           f"{_MAX_BODY} B"})
            return
        data = self.rfile.read(length)

        from ..data.loader import decode_image_bytes
        t0 = time.monotonic()
        try:
            image = decode_image_bytes(data, srv.batcher.img_size)
        except ValueError as e:
            self._send_json(422, {"error": str(e)})
            return
        try:
            result = srv.batcher.submit(image).result(
                timeout=srv.request_timeout)
        except Exception as e:                   # noqa: BLE001
            self._send_json(500, {"error": f"inference failed: {e}"})
            return
        self._send_json(200, {
            "prob_live": result["prob1"],
            "pred": result["pred"],
            "label": "live" if result["pred"] == 1 else "spoof",
            "latency_ms": round((time.monotonic() - t0) * 1000.0, 3)})


class PADServer(ThreadingHTTPServer):
    daemon_threads = True

    def __init__(self, addr, batcher: MicroBatcher, metas,
                 request_timeout: float = 60.0):
        super().__init__(addr, _Handler)
        self.batcher = batcher
        self.metas = metas
        self.request_timeout = request_timeout
        self.started = time.monotonic()

    def shutdown_clean(self):
        """Stop the accept loop (if running on another thread), close
        the listening socket, and drain the batcher."""
        self.shutdown()
        self.server_close()
        self.batcher.close()


def make_server(artifact_dirs: Sequence[str], *, host: str = "127.0.0.1",
                port: int = 8417, max_batch: int = 16,
                max_wait_ms: float = 2.0,
                request_timeout: float = 60.0) -> PADServer:
    """Assemble programs + batcher + HTTP server (not yet serving).
    Callers drive ``serve_forever()`` / ``shutdown()`` themselves; the
    chosen port is ``server.server_address[1]`` (pass ``port=0`` for an
    ephemeral one)."""
    programs, img_size, metas = build_programs_from_artifacts(
        artifact_dirs, max_batch=max_batch)
    batcher = MicroBatcher(programs, img_size=img_size,
                           max_wait_ms=max_wait_ms)
    return PADServer((host, port), batcher, metas,
                     request_timeout=request_timeout)


def serve(artifact_dirs: Sequence[str], *, host: str = "127.0.0.1",
          port: int = 8417, max_batch: int = 16, max_wait_ms: float = 2.0,
          warmup: bool = True):
    """Blocking entry point (the ``serve`` CLI): load, warm every
    compiled shape with a zero batch (first-request latency stays flat),
    then serve until interrupted."""
    server = make_server(artifact_dirs, host=host, port=port,
                         max_batch=max_batch, max_wait_ms=max_wait_ms)
    b = server.batcher
    if warmup:
        for size in b.batch_sizes:
            t0 = time.monotonic()
            zeros = np.zeros((size, b.img_size, b.img_size, 3), np.uint8)
            b._programs[size](zeros)
            log.info("warmed batch shape %d in %.1fs", size,
                     time.monotonic() - t0)
    host_, port_ = server.server_address[:2]
    log.info("PAD serving on http://%s:%s (shapes %s, window %.1f ms)",
             host_, port_, list(b.batch_sizes), b._max_wait * 1000)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        log.info("interrupt — shutting down")
    finally:
        # serve_forever has already returned (shutdown() from inside
        # this thread would deadlock, and is only needed from others)
        server.server_close()
        server.batcher.close()
    return server
