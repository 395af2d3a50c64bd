"""Int8-compressed host→device batch transfer.

The measured end-to-end bottleneck of the full-row input pipeline is the
host→device link, not the device (BENCH_E2E.json: 13 MB vision rows at
~38 MB/s over this tunnel = 4.7 s/step vs a 118 ms device step; on a real
TPU-VM host the same wall is PCIe). The float payload is embedding data —
pretrained-extractor features tolerate 8-bit row quantization — so the
TPU-native answer is to ship int8 over the wire and dequantize on device,
where HBM bandwidth is three orders of magnitude above the link:

* host side: symmetric per-row int8 (scale = max|row| / 127, fp16 scales)
  — 2× fewer bytes than the float16 default path, 4× fewer than float32;
* device side: a jitted upcast-and-scale into the model's compute dtype,
  fused by XLA into whatever consumes the batch.

This mirrors what the reference cannot do: its DataLoader ships float32
tensors through pinned memory (reference:
training/deepearth_multimodal_training.py:420-460). Opt-in via
``device_prefetch(..., compress_keys=("vision", "language"))`` or the
functions below.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# marker key: a compressed leaf is a dict {"q": int8, "scale": f16, "dtype": str}
_Q = "_int8_q"
_SCALE = "_int8_scale"


def quantize_rows(x: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Symmetric per-row int8 quantization over the LAST axis.

    Returns (int8 values, float16 scales with shape x.shape[:-1] + (1,)).
    Row scale = max|row|/127; zero rows get scale 1 (encode to zeros).
    """
    x = np.asarray(x)
    amax = np.abs(x).max(axis=-1, keepdims=True).astype(np.float32)
    scale = np.where(amax > 0, amax / 127.0, 1.0)
    q = np.clip(np.rint(x / scale), -127, 127).astype(np.int8)
    return q, scale.astype(np.float16)


def compress_batch(
    batch: Dict[str, Any], keys: Sequence[str]
) -> Dict[str, Any]:
    """Replace ``batch['modalities'][k]`` float arrays (k in keys) with
    int8 payload + scale leaves. Non-float and absent keys pass through."""
    out = dict(batch)
    mods = dict(batch.get("modalities", {}))
    for k in keys:
        v = mods.get(k)
        if v is None or not np.issubdtype(np.asarray(v).dtype, np.floating):
            continue
        q, scale = quantize_rows(v)
        mods[k] = {_Q: q, _SCALE: scale}
    out["modalities"] = mods
    return out


def _is_compressed(leaf) -> bool:
    return isinstance(leaf, dict) and _Q in leaf and _SCALE in leaf


def decompress_on_device(
    batch: Dict[str, Any], dtype=jnp.bfloat16
) -> Dict[str, Any]:
    """Dequantize compressed leaves on device (trace-safe: call inside the
    jitted train step, XLA fuses the upcast into the first consumer)."""
    out = dict(batch)
    mods = dict(batch.get("modalities", {}))
    for k, v in mods.items():
        if _is_compressed(v):
            mods[k] = v[_Q].astype(dtype) * v[_SCALE].astype(dtype)
    out["modalities"] = mods
    return out


def device_prefetch_compressed(
    iterator,
    keys: Sequence[str] = ("vision", "language"),
    size: int = 2,
    sharding: Optional[Any] = None,
    dtype=jnp.bfloat16,
):
    """Double-buffered prefetch that ships int8 over the host→device link
    and yields dequantized batches.

    The dequant runs in its own tiny jitted program per batch; when the
    consumer jits over the still-compressed tree instead (calling
    :func:`decompress_on_device` inside the step), use
    ``data.batches.device_prefetch`` over ``compress_batch`` output directly.
    """
    from .batches import device_prefetch

    dequant = jax.jit(lambda b: decompress_on_device(b, dtype=dtype))
    compressed = (compress_batch(b, keys) for b in iterator)
    for dev_batch in device_prefetch(compressed, size=size, sharding=sharding):
        yield dequant(dev_batch)


def compressed_bytes(batch: Dict[str, Any]) -> int:
    """Total payload bytes of a (possibly compressed) batch tree."""
    total = 0
    for leaf in jax.tree_util.tree_leaves(batch):
        total += np.asarray(leaf).nbytes
    return total
