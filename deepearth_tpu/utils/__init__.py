"""Utilities: logging, profiling, embedding projection."""

from .logging import (
    JSONLMetricWriter,
    MultiWriter,
    TensorBoardMetricWriter,
    get_logger,
    setup_logging,
)
from .monitor import ResourceMonitor, resource_snapshot
from .profiling import StepTimer, benchmark_fn, trace
from .projection import EmbeddingProjector

__all__ = [
    "ResourceMonitor",
    "resource_snapshot",
    "JSONLMetricWriter",
    "MultiWriter",
    "TensorBoardMetricWriter",
    "get_logger",
    "setup_logging",
    "StepTimer",
    "benchmark_fn",
    "trace",
    "EmbeddingProjector",
]
