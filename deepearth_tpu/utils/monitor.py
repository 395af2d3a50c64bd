"""Resource monitoring during training
(reference: monitor_training.py:12-44, train_deepearth.py:119-142 —
GPU/CPU/RAM/net stats logged to wandb; here: psutil + jax device memory
stats, logged through the metric writers)."""

from __future__ import annotations

import threading
from typing import Callable, Dict, Optional

import psutil


def resource_snapshot() -> Dict[str, float]:
    """Instantaneous host + device resource metrics."""
    vm = psutil.virtual_memory()
    out = {
        "sys/cpu_percent": psutil.cpu_percent(interval=None),
        "sys/ram_used_gb": vm.used / 1e9,
        "sys/ram_percent": vm.percent,
    }
    try:
        net = psutil.net_io_counters()
        out["sys/net_sent_gb"] = net.bytes_sent / 1e9
        out["sys/net_recv_gb"] = net.bytes_recv / 1e9
    except Exception:
        pass
    try:
        import jax

        for i, d in enumerate(jax.local_devices()):
            stats = d.memory_stats()
            if stats:
                out[f"device{i}/bytes_in_use_gb"] = (
                    stats.get("bytes_in_use", 0) / 1e9
                )
                out[f"device{i}/peak_bytes_gb"] = (
                    stats.get("peak_bytes_in_use", 0) / 1e9
                )
    except Exception:
        pass
    return out


class ResourceMonitor:
    """Background thread sampling resources every ``interval`` seconds and
    forwarding them to a callback (e.g. a metric writer's log)."""

    def __init__(
        self,
        callback: Callable[[Dict[str, float]], None],
        interval: float = 30.0,
    ):
        self.callback = callback
        self.interval = interval
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None

    def start(self) -> "ResourceMonitor":
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        return self

    def _run(self):
        while not self._stop.wait(self.interval):
            try:
                self.callback(resource_snapshot())
            except Exception:
                pass

    def stop(self) -> None:
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=2)
