"""Round/date stamping for benchmark artifacts.

Every JSON artifact a tools/bench_* script writes carries
``measured_round`` (from the repo-root ROUND file, bumped once per build
round) and ``measured_at`` (UTC) so downstream aggregators — bench.py's
detail blob, the driver's BENCH_r{N}.json — can tell a fresh measurement
from a stale embed (round-4 verdict weak #3: BENCH_r04 silently embedded
bit-identical round-3 sections).
"""

from __future__ import annotations

import datetime
import os

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def current_round() -> int | None:
    try:
        with open(os.path.join(_REPO, "ROUND")) as f:
            return int(f.read().strip())
    except (OSError, ValueError):
        return None


def round_stamp() -> dict:
    """Fields to merge into an artifact dict at write time."""
    return {
        "measured_round": current_round(),
        "measured_at": datetime.datetime.now(datetime.timezone.utc)
        .strftime("%Y-%m-%dT%H:%M:%SZ"),
    }
