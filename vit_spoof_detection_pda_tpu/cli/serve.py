"""`serve` command: run the HTTP scoring service over frozen serving
artifacts (export-serving output) with cross-request micro-batching.

    python -m vit_spoof_detection_pda_tpu serve ./artifact_lowlat \
        ./artifact_grid16 --port 8417 --max-wait-ms 2

Each artifact contributes its compiled batch shape (fixed-batch Pallas
artifacts) or power-of-two buckets (symbolic-batch module artifacts);
concurrent requests coalesce into the smallest shape that fits.  See
serve/server.py for the endpoints.
"""

from __future__ import annotations

import argparse

from .common import setup_logging


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="HTTP scoring service over frozen serving artifacts")
    parser.add_argument("artifacts", nargs="+",
                        help="artifact directories (export-serving); a "
                        "fixed-batch artifact adds its shape, a "
                        "symbolic-batch one fans across 1,2,4,... "
                        "buckets")
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8417,
                        help="0 picks an ephemeral port")
    parser.add_argument("--max-batch", type=int, default=16,
                        help="largest bucket for symbolic-batch "
                        "artifacts (fixed-batch artifacts always keep "
                        "their own shape)")
    parser.add_argument("--max-wait-ms", type=float, default=2.0,
                        help="batching window: how long the first "
                        "request of a batch waits for co-riders")
    parser.add_argument("--no-warmup", action="store_true",
                        help="skip compiling every batch shape at "
                        "startup (first requests pay compile latency)")
    args = parser.parse_args(argv)
    setup_logging()

    if args.max_batch < 1:
        parser.error("--max-batch must be >= 1")
    if args.max_wait_ms < 0:
        parser.error("--max-wait-ms must be >= 0")

    from ..serve import serve
    serve(args.artifacts, host=args.host, port=args.port,
          max_batch=args.max_batch, max_wait_ms=args.max_wait_ms,
          warmup=not args.no_warmup)


if __name__ == "__main__":
    main()
