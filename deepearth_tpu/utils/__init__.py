"""Utilities: logging, profiling, embedding projection."""

from .logging import (
    JSONLMetricWriter,
    MultiWriter,
    TensorBoardMetricWriter,
    get_logger,
    setup_logging,
)
from .profiling import StepTimer, benchmark_fn, trace
from .projection import EmbeddingProjector

__all__ = [
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
