"""Downstream-task evaluation via linear probes on frozen features
(reference: evaluation/downstream_tasks.py:17-371)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax


@dataclass
class ProbeResult:
    task: str
    kind: str  # 'regression' | 'classification'
    metrics: Dict[str, float]


def _train_linear_probe(
    feats: np.ndarray,
    targets: np.ndarray,
    kind: str,
    n_classes: int = 0,
    steps: int = 300,
    lr: float = 1e-2,
    seed: int = 0,
    holdout_frac: float = 0.2,
) -> Tuple[np.ndarray, np.ndarray]:
    """Fit W, b with adam on a train split of the frozen features; returns
    predictions and targets on the HELD-OUT split (metrics are generalization
    numbers, not training-set fit)."""
    rng = np.random.default_rng(seed)
    n = len(feats)
    perm = rng.permutation(n)
    n_test = max(1, int(round(n * holdout_frac)))
    test_idx, train_idx = perm[:n_test], perm[n_test:]
    if len(train_idx) == 0:
        train_idx = test_idx

    x_all = jnp.asarray(feats, jnp.float32)
    mu, sd = x_all[train_idx].mean(0), x_all[train_idx].std(0) + 1e-6
    x = (x_all[train_idx] - mu) / sd
    if kind == "classification":
        y_all = jnp.asarray(targets, jnp.int32)
        out_dim = n_classes
    else:
        y_all = jnp.asarray(targets, jnp.float32)
        if y_all.ndim == 1:
            y_all = y_all[:, None]
        out_dim = y_all.shape[-1]
    y = y_all[train_idx]

    key = jax.random.PRNGKey(seed)
    params = {
        "w": jax.random.normal(key, (x.shape[1], out_dim)) * 0.01,
        "b": jnp.zeros((out_dim,)),
    }
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    def loss_fn(p):
        pred = x @ p["w"] + p["b"]
        if kind == "classification":
            return optax.softmax_cross_entropy_with_integer_labels(pred, y).mean()
        return jnp.mean((pred - y) ** 2)

    @jax.jit
    def step(p, s):
        g = jax.grad(loss_fn)(p)
        updates, s = tx.update(g, s)
        return optax.apply_updates(p, updates), s

    for _ in range(steps):
        params, opt_state = step(params, opt_state)
    x_test = (x_all[test_idx] - mu) / sd
    pred = np.asarray(x_test @ params["w"] + params["b"])
    return pred, np.asarray(y_all[test_idx])


def regression_metrics(pred: np.ndarray, true: np.ndarray) -> Dict[str, float]:
    rmse = float(np.sqrt(np.mean((pred - true) ** 2)))
    ss_res = np.sum((true - pred) ** 2)
    ss_tot = np.sum((true - true.mean(0)) ** 2) + 1e-12
    return {"rmse": rmse, "r2": float(1.0 - ss_res / ss_tot)}


def classification_metrics(logits: np.ndarray, labels: np.ndarray) -> Dict[str, float]:
    pred = logits.argmax(-1)
    acc = float((pred == labels).mean())
    # macro F1
    f1s = []
    for c in np.unique(labels):
        tp = np.sum((pred == c) & (labels == c))
        fp = np.sum((pred == c) & (labels != c))
        fn = np.sum((pred != c) & (labels == c))
        prec = tp / max(tp + fp, 1)
        rec = tp / max(tp + fn, 1)
        f1s.append(2 * prec * rec / max(prec + rec, 1e-12))
    return {"accuracy": acc, "f1_macro": float(np.mean(f1s))}


class DeepEarthEvaluator:
    """Frozen-feature linear-probe evaluator
    (reference: evaluation/downstream_tasks.py:56-371).

    feature_fn maps a batch dict → (B, D) numpy features (any level: native /
    universal / fused).
    """

    def __init__(self, feature_fn: Callable[[Dict], np.ndarray]):
        self.feature_fn = feature_fn

    def extract(self, batches) -> np.ndarray:
        feats = [np.asarray(self.feature_fn(b)) for b in batches]
        return np.concatenate(feats, axis=0)

    def evaluate_regression(
        self, feats: np.ndarray, targets: np.ndarray, task: str = "regression",
        steps: int = 300,
    ) -> ProbeResult:
        pred, true = _train_linear_probe(feats, targets, "regression", steps=steps)
        return ProbeResult(task, "regression", regression_metrics(pred, true))

    def evaluate_classification(
        self, feats: np.ndarray, labels: np.ndarray, n_classes: int,
        task: str = "classification", steps: int = 300,
    ) -> ProbeResult:
        pred, true = _train_linear_probe(
            feats, labels, "classification", n_classes=n_classes, steps=steps
        )
        return ProbeResult(task, "classification", classification_metrics(pred, true))
