"""Human-interpretable metrics and compact logging.

Mirrors the reference's reporting conventions: coordinate error in metres
(denormalized by the spatial scale), time error in hours, compact epoch lines
``E042 | L:0.123 S:0.02 ... | xyz_m:12.3 t_h:4.5``
(reference: SPECIFICATIONS.MD:1811-1927).
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional

import jax.numpy as jnp
import numpy as np


def coordinate_error_meters(
    pred_norm: jnp.ndarray, true_norm: jnp.ndarray, span_meters
) -> jnp.ndarray:
    """Mean Euclidean error in metres between normalized coordinate
    predictions, given the bounding-box span per axis (metres)."""
    span = jnp.asarray(span_meters, jnp.float32)
    diff = (pred_norm.astype(jnp.float32) - true_norm.astype(jnp.float32)) * span
    return jnp.mean(jnp.linalg.norm(diff, axis=-1))


def time_error_hours(
    pred_norm: jnp.ndarray, true_norm: jnp.ndarray, span_hours: float
) -> jnp.ndarray:
    return jnp.mean(
        jnp.abs(pred_norm.astype(jnp.float32) - true_norm.astype(jnp.float32))
    ) * span_hours


class MetricAccumulator:
    """Running means over a pass.

    update() only appends device scalars — no host sync, so it never blocks
    the training pipeline; conversion happens once in result().
    """

    def __init__(self):
        self._vals: Dict[str, list] = {}

    def update(self, metrics: Mapping[str, jnp.ndarray]) -> None:
        for k, v in metrics.items():
            self._vals.setdefault(k, []).append(v)

    def result(self) -> Dict[str, float]:
        return {
            k: float(np.mean([np.asarray(v) for v in vs]))
            for k, vs in self._vals.items()
        }

    def reset(self) -> None:
        self._vals.clear()


def format_epoch_line(
    epoch: int,
    metrics: Mapping[str, float],
    extra: Optional[Mapping[str, float]] = None,
) -> str:
    """Compact epoch log (reference: SPECIFICATIONS.MD:1918-1927)."""
    parts = [f"E{epoch:03d}"]
    short = {
        "loss/total": "L",
        "loss/spatial": "S",
        "loss/temporal": "T",
        "loss/contrastive": "C",
    }
    body = []
    for k, label in short.items():
        if k in metrics:
            body.append(f"{label}:{metrics[k]:.4f}")
    for k in sorted(metrics):
        if k.startswith("loss/") and k not in short:
            body.append(f"{k.split('/', 1)[1][:4]}:{metrics[k]:.4f}")
    parts.append(" ".join(body))
    if extra:
        parts.append(" ".join(f"{k}:{v:.1f}" for k, v in extra.items()))
    return " | ".join(parts)
