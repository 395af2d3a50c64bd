"""Live training-resource monitor (reference: monitor_training.py).

The reference polls GPUtil/psutil in a side terminal. TPU-native
equivalent: device HBM from ``Device.memory_stats()`` (per-chip allocated
vs capacity), host RAM/disk from /proc and os.statvfs (no psutil needed),
and the newest training metrics line from a JSONL log if one is given.

Run:  PYTHONPATH=/root/.axon_site:/root/repo python tools/monitor.py \
          [--log runs/metrics.jsonl] [--interval 5] [--once]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def device_lines():
    try:
        import jax

        out = []
        for d in jax.local_devices():
            stats = None
            try:
                stats = d.memory_stats()
            except Exception:
                pass
            if stats:
                used = stats.get("bytes_in_use", 0) / 1e9
                cap = stats.get("bytes_limit", stats.get("bytes_reservable_limit", 0)) / 1e9
                peak = stats.get("peak_bytes_in_use", 0) / 1e9
                pct = 100.0 * used / cap if cap else 0.0
                out.append(
                    f"  {d.device_kind} #{d.id}: {used:.2f} / {cap:.2f} GB "
                    f"({pct:.1f}%)  peak {peak:.2f} GB"
                )
            else:
                out.append(f"  {d.device_kind} #{d.id}: memory stats unavailable")
        return out
    except Exception as e:
        return [f"  jax devices unavailable: {e}"]


def host_lines():
    out = []
    try:
        info = {}
        with open("/proc/meminfo") as f:
            for line in f:
                k, v = line.split(":", 1)
                info[k] = int(v.strip().split()[0])  # kB
        total = info["MemTotal"] / 1e6
        avail = info.get("MemAvailable", info.get("MemFree", 0)) / 1e6
        out.append(
            f"  RAM: {total - avail:.1f} / {total:.1f} GB used "
            f"({100 * (1 - avail / total):.1f}%)"
        )
        cached = info.get("Cached", 0) / 1e6
        out.append(f"  page cache: {cached:.1f} GB")
    except OSError:
        pass
    try:
        st = os.statvfs("/")
        total = st.f_blocks * st.f_frsize / 1e9
        free = st.f_bavail * st.f_frsize / 1e9
        out.append(f"  disk /: {total - free:.0f} / {total:.0f} GB used")
    except OSError:
        pass
    try:
        with open("/proc/loadavg") as f:
            out.append(f"  loadavg: {f.read().split()[0]}")
    except OSError:
        pass
    return out


def latest_metrics(log_path):
    try:
        last = None
        with open(log_path) as f:
            for line in f:
                line = line.strip()
                if line:
                    last = line
        if last:
            rec = json.loads(last)
            keep = {
                k: (round(v, 4) if isinstance(v, float) else v)
                for k, v in rec.items()
                if isinstance(v, (int, float, str))
            }
            return [f"  {k}: {v}" for k, v in list(keep.items())[:10]]
    except (OSError, json.JSONDecodeError):
        pass
    return ["  (no metrics yet)"]


def snapshot(log_path=None) -> str:
    lines = [
        "=" * 60,
        f"DeepEarth-TPU monitor — {time.strftime('%Y-%m-%d %H:%M:%S')}",
        "=" * 60,
        "Device HBM:",
        *device_lines(),
        "Host:",
        *host_lines(),
    ]
    if log_path:
        lines += [f"Training metrics ({log_path}):", *latest_metrics(log_path)]
    return "\n".join(lines)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--log", help="training metrics JSONL (utils/logging.py)")
    ap.add_argument("--interval", type=float, default=5.0)
    ap.add_argument("--once", action="store_true")
    args = ap.parse_args()
    while True:
        print(snapshot(args.log), flush=True)
        if args.once:
            break
        time.sleep(args.interval)


if __name__ == "__main__":
    main()
