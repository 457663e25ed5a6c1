"""Cross-cutting utilities: telemetry, checkpointing, determinism."""

from .telemetry import MetricLogger  # noqa: F401
from .checkpoint import CheckpointManager  # noqa: F401
