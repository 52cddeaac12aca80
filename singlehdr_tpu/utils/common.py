"""Small host-side utilities (the reference's utils.py surface, rebuilt).

Covers: string->bool argparse flags (utils.py:50-58), timestamped run
directories (utils.py:13-41), and a wall-clock timer for per-step reporting
(the reference's time.perf_counter prints, SURVEY.md §5 tracing).
"""

from __future__ import annotations

import argparse
import os
import time
from datetime import datetime

_TIMESTAMP = datetime.now().strftime("%Y-%m-%d-%H%M%S")


def timestamp() -> str:
    """Process-stable timestamp string used for run directory names."""
    return _TIMESTAMP


def str2bool(v) -> bool:
    """Argparse-friendly boolean ('true'/'false'/'1'/'0'/...)."""
    if isinstance(v, bool):
        return v
    s = str(v).lower()
    if s in ("yes", "true", "t", "y", "1"):
        return True
    if s in ("no", "false", "f", "n", "0"):
        return False
    raise argparse.ArgumentTypeError(f"boolean value expected, got {v!r}")


def create_run_dirs(root: str, name: str) -> dict:
    """Create tensorboard/ and outputImg/ run dirs for a module name."""
    out = {}
    for kind in ("tensorboard", "outputImg"):
        path = os.path.join(root, kind, name, timestamp())
        os.makedirs(path, exist_ok=True)
        out[kind] = path
    return out


class Timer:
    """Context/step timer."""

    def __init__(self):
        self._t0 = time.perf_counter()

    def lap(self) -> float:
        now = time.perf_counter()
        dt = now - self._t0
        self._t0 = now
        return dt
