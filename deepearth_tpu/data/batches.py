"""Batch assembly and double-buffered host→device prefetch.

TPU-idiomatic replacement for the reference's torch DataLoader workers
(reference call stack: training/deepearth_multimodal_training.py:420-460):
a plain Python producer assembles numpy batches (mmap-backed), and
:func:`device_prefetch` keeps one batch in flight on the device so the chip
never waits on the host.
"""

from __future__ import annotations

import collections
import os
import sys
import threading
import time
import queue as queue_mod
from typing import Any, Dict, Iterable, Iterator, Optional, Sequence

import jax
import numpy as np


def device_prefetch(
    iterator: Iterable[Dict[str, Any]],
    size: int = 2,
    sharding: Optional[Any] = None,
) -> Iterator[Dict[str, Any]]:
    """Double-buffered async device transfer.

    Eagerly pushes up to ``size`` batches onto the device (optionally with a
    NamedSharding for multi-chip data parallelism) while the previous step
    computes — the jax.device_put is async, so transfer overlaps compute.
    """
    buf = collections.deque()

    def put_once(batch):
        if sharding is not None:
            return jax.tree_util.tree_map(
                lambda x: jax.device_put(x, sharding), batch
            )
        return jax.tree_util.tree_map(jax.device_put, batch)

    def _is_transient(e: Exception) -> bool:
        # Only the observed transient failure retries: the axon TPU tunnel
        # rejecting a transfer with INVALID_ARGUMENT under concurrent
        # producer-thread IO (tools/bench_e2e_fullscale.py run).
        # Deterministic errors (dtype/shape mismatch, OOM) re-raise
        # immediately — retrying them only doubles failure latency.
        return (
            type(e).__name__ == "XlaRuntimeError"
            and "INVALID_ARGUMENT" in str(e)
        )

    def put(batch):
        try:
            return put_once(batch)
        except Exception as e:
            if not _is_transient(e):
                raise
            if os.environ.get("DEEPEARTH_PREFETCH_DEBUG"):
                # Per-leaf diagnostic sweep re-transfers a FULL extra batch
                # (~10 s over the 22-38 MB/s tunnel) — opt-in only.
                for path, leaf in jax.tree_util.tree_leaves_with_path(batch):
                    try:
                        jax.device_put(leaf)
                    except Exception as le:
                        print(
                            f"[device_prefetch] leaf "
                            f"{jax.tree_util.keystr(path)} "
                            f"{getattr(leaf, 'dtype', type(leaf))}"
                            f"{getattr(leaf, 'shape', '')}: "
                            f"{type(le).__name__}: {str(le)[:200]}",
                            file=sys.stderr, flush=True,
                        )
            print(
                f"[device_prefetch] retrying after {type(e).__name__}: "
                f"{str(e)[:200]}",
                file=sys.stderr, flush=True,
            )
            time.sleep(0.5)
            return put_once(batch)

    it = iter(iterator)
    try:
        for _ in range(size):
            buf.append(put(next(it)))
    except StopIteration:
        pass
    while buf:
        yield buf.popleft()
        try:
            buf.append(put(next(it)))
        except StopIteration:
            pass


def echo_on_device(
    iterator: Iterable[Dict[str, Any]],
    factor: int,
) -> Iterator[Dict[str, Any]]:
    """Data echoing (Choi et al. 2019): yield each already-on-device batch
    ``factor`` times so link-bound pipelines amortize one host→device
    transfer over several optimizer steps.

    The masked-reconstruction objective re-randomizes which targets are
    hidden every step (the train step takes a fresh rng), so echoed steps
    see different prediction problems over the same rows — the standard
    regime where echoing trades a small statistical-efficiency loss for a
    large wall-clock win when transfer ≫ compute (here: full 13 MB rows at
    tunnel/PCIe rates vs a ~100 ms device step, BENCH_E2E.json).

    Wrap AFTER :func:`device_prefetch` so the repeat reuses the device
    buffer (echoing before transfer would re-ship the same bytes).
    """
    if factor < 1:
        raise ValueError(f"echo factor must be >= 1, got {factor}")
    for batch in iterator:
        for _ in range(factor):
            yield batch


def threaded_producer(
    make_iterator, capacity: int = 4
) -> Iterator[Dict[str, Any]]:
    """Run batch assembly in a background thread (the host-side analogue of
    DataLoader workers) so mmap reads overlap device compute."""
    q: queue_mod.Queue = queue_mod.Queue(maxsize=capacity)
    _END = object()

    def worker():
        try:
            for item in make_iterator():
                q.put(item)
            q.put(_END)
        except BaseException as e:  # propagate to the consumer, don't swallow
            q.put(e)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            return
        if isinstance(item, BaseException):
            raise item
        yield item


def collate_observations(
    obs_list: Sequence[Dict[str, np.ndarray]],
    modalities: Sequence[str],
) -> Dict[str, Any]:
    """Stack per-observation dicts into one batch with the model schema
    (reference schema: dashboard/services/training_data.py:22-80)."""
    out: Dict[str, Any] = {
        "xyzt": np.stack([o["xyzt"] for o in obs_list]).astype(np.float32),
        "modalities": {},
    }
    for m in modalities:
        if m in obs_list[0]:
            out["modalities"][m] = np.stack([o[m] for o in obs_list])
    return out
