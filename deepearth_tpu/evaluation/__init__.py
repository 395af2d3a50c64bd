"""Evaluation layer: linear probes and spatiotemporal metrics."""

from .probes import (
    DeepEarthEvaluator,
    ProbeResult,
    classification_metrics,
    regression_metrics,
)
from .spatiotemporal import (
    SpatiotemporalMetrics,
    binned_rmse,
    knn_weights,
    morans_i,
    temporal_consistency,
)

__all__ = [
    "DeepEarthEvaluator",
    "ProbeResult",
    "classification_metrics",
    "regression_metrics",
    "SpatiotemporalMetrics",
    "binned_rmse",
    "knn_weights",
    "morans_i",
    "temporal_consistency",
]
