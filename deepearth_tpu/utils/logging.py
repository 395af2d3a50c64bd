"""Hierarchical logging + metric writers.

Mirrors the reference's observability conventions: hierarchical
``DeepEarth.<Component>`` loggers (reference: SPECIFICATIONS.MD:72-88),
wandb-style per-step metric streams (reference: train_deepearth.py:21,231)
written to tensorboard and/or JSONL since wandb isn't available here.
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time
from typing import Mapping


def get_logger(component: str) -> logging.Logger:
    """'DeepEarth.<Component>' logger (reference: SPECIFICATIONS.MD:72-88)."""
    return logging.getLogger(f"DeepEarth.{component}")


def setup_logging(level: int = logging.INFO, stream=None) -> None:
    root = logging.getLogger("DeepEarth")
    if root.handlers:
        return
    h = logging.StreamHandler(stream or sys.stderr)
    h.setFormatter(
        logging.Formatter("%(asctime)s %(name)s %(levelname)s %(message)s")
    )
    root.addHandler(h)
    root.setLevel(level)


class JSONLMetricWriter:
    """Append-only JSONL metric stream (wandb-log equivalent)."""

    def __init__(self, path: str):
        os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
        self._f = open(path, "a")

    def log(self, metrics: Mapping[str, float], step: int) -> None:
        rec = {"step": step, "time": time.time()}
        rec.update({k: float(v) for k, v in metrics.items()})
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()

    def close(self) -> None:
        self._f.close()


class TensorBoardMetricWriter:
    """Thin tensorboard wrapper (reference yaml option:
    training/configs/multimodal_config.yaml:38)."""

    def __init__(self, log_dir: str):
        from torch.utils.tensorboard import SummaryWriter  # baked-in torch

        self._w = SummaryWriter(log_dir)

    def log(self, metrics: Mapping[str, float], step: int) -> None:
        for k, v in metrics.items():
            self._w.add_scalar(k, float(v), step)

    def close(self) -> None:
        self._w.close()


class MultiWriter:
    def __init__(self, *writers):
        self.writers = [w for w in writers if w is not None]

    def log(self, metrics: Mapping[str, float], step: int) -> None:
        for w in self.writers:
            w.log(metrics, step)

    def close(self) -> None:
        for w in self.writers:
            w.close()
