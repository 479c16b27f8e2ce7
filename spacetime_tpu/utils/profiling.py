"""Per-phase wall-clock counters and machine-readable result records.

The reference printed per-rank timers to stdout (SURVEY.md §5); here runs
also append one JSON line per solve to a results file so the driver metrics
("time-to-1e-8 residual & PCG iters") are machine-readable.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict


class PhaseTimer:
    """Accumulating wall-clock timer: ``with timer("assembly"): ...``."""

    def __init__(self):
        self.seconds = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, phase: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.seconds[phase] += time.perf_counter() - t0
            self.counts[phase] += 1

    def summary(self) -> dict:
        return {k: round(v, 4) for k, v in sorted(self.seconds.items())}


def write_jsonl(path: str, record: dict) -> None:
    with open(path, "a") as f:
        f.write(json.dumps(record) + "\n")


def gdofs_per_second(num_dofs: int, seconds: float) -> float:
    return num_dofs / seconds / 1e9 if seconds > 0 else float("inf")
