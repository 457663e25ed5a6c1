"""Production serving runtime: cross-request micro-batching over the
compiled serving programs (frozen artifacts or live regimes) behind a
dependency-free HTTP front end.

The reference has no serving runtime — its 180-FPS headline is a bare
`model(input)` loop (additional_analysis.py:262-277).  This subsystem
is the deployment half that turns the framework's compiled programs
into a service: requests from concurrent clients coalesce into device
batches sized to the measured regime table (models/fastserve.py::
auto_serving_mode), so the chip runs at batched throughput while each
caller sees single-request latency plus a bounded batching window.
"""

from .batcher import MicroBatcher
from .loadgen import run_load
from .server import (build_programs_from_artifacts, build_programs_live,
                     make_server, make_server_from_programs, run_server,
                     serve)

__all__ = ["MicroBatcher", "build_programs_from_artifacts",
           "build_programs_live", "make_server",
           "make_server_from_programs", "run_load", "run_server",
           "serve"]
