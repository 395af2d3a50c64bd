"""Model export via jax.export (StableHLO).

The TPU-native equivalent of the reference's TorchScript/ONNX export checks
(reference: tests/run_tests.py export tests): serialize a jitted forward to
portable StableHLO bytes, reload, and call without the original Python model.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax


def export_forward(
    fn: Callable, *example_args, platforms: Tuple[str, ...] = None
) -> bytes:
    """Serialize jit(fn) traced at example_args to StableHLO bytes."""
    exp = jax.export.export(
        jax.jit(fn),
        platforms=list(platforms) if platforms else None,
    )(*example_args)
    return exp.serialize()


def load_exported(blob: bytes):
    """Deserialize an exported function; returns a callable."""
    exp = jax.export.deserialize(blob)
    return exp.call


def export_model_forward(model, params, example_batch) -> bytes:
    """Convenience: export model.apply({'params': params}, batch) closed over
    the parameters (weights baked into the artifact)."""

    def fn(batch):
        out = model.apply({"params": params}, batch, deterministic=True)
        return out["fused_representation"], out["reconstructions"]

    return export_forward(fn, example_batch)
