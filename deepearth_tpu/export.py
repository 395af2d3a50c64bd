"""Model export via jax.export (StableHLO serialization).

TPU-native replacement for the reference validator's TorchScript/ONNX
export checks (reference: tests/run_tests.py:264-329 export section): the
portable artifact for a jitted JAX model is a serialized StableHLO module,
which reloads and executes without the Python model definition — the same
deployment role TorchScript served, with the compiler contract XLA already
uses.

The exported artifact is keyed to the input shapes/dtypes it was traced
with (static shapes are the TPU contract); export per served batch shape.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax


def export_fn(
    fn: Callable, *example_args, platforms: Optional[Sequence[str]] = None
) -> bytes:
    """Serialize ``jit(fn)`` traced at ``example_args`` to portable bytes."""
    from jax import export as jexport

    exp = jexport.export(
        jax.jit(fn), platforms=list(platforms) if platforms else None
    )(*example_args)
    return bytes(exp.serialize())


def load_exported(blob: bytes) -> Callable:
    """Deserialize an exported module; returns a callable running it."""
    from jax import export as jexport

    exp = jexport.deserialize(blob)
    return lambda *args: exp.call(*args)


def export_forward(model, params, example_batch) -> bytes:
    """Export a DeepEarthModel forward (params baked as an argument).

    The returned bytes reload with :func:`load_exported`; call the result
    as ``fn(params, batch)`` with the same pytree structure and shapes.
    """

    def fwd(p, batch):
        out = model.apply({"params": p}, batch, deterministic=True)
        return out["fused_representation"], out["reconstructions"]

    return export_fn(fwd, params, example_batch)


def export_model_forward(model, params, example_batch) -> bytes:
    """Like :func:`export_forward` but with the weights BAKED into the
    artifact (closed over, not an argument) — the deployment shape where the
    artifact is the whole model; call the reloaded fn as ``fn(batch)``."""

    def fwd(batch):
        out = model.apply({"params": params}, batch, deterministic=True)
        return out["fused_representation"], out["reconstructions"]

    return export_fn(fwd, example_batch)
