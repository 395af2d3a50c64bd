"""Utilities: logging, profiling, embedding projection."""

from .logging import (
    JSONLMetricWriter,
    MultiWriter,
    TensorBoardMetricWriter,
    get_logger,
    setup_logging,
)
# export lives at the package top level (deepearth_tpu/export.py); these
# re-exports keep the historical utils-path imports working.
from ..export import export_forward, export_model_forward, load_exported
from .monitor import ResourceMonitor, resource_snapshot
from .profiling import StepTimer, benchmark_fn, trace
from .projection import EmbeddingProjector

__all__ = [
    "export_forward",
    "export_model_forward",
    "load_exported",
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
from .wandb_sink import WandbSink  # noqa: E402,F401

__all__.append("WandbSink")
