"""Wall-clock timing + run statistics.

Reference analog: PerfTimer / SortStats / ReportStats
(benchmark/pkg/benchmark/util.go:23-86) and the C++ microsecond timers with
total/worker/shuffle breakdowns (localTest/benchmarks.cpp:17-36).  Extended
with named phases so distributed rounds can report per-phase cost stacks
(sort / scan / exchange / io) the way the reference's analysis notebook
reconstructs them from nvprof+cProfile.
"""

from __future__ import annotations

import contextlib
import json
import statistics
import time
from dataclasses import dataclass, field


@dataclass
class PerfTimer:
    """Accumulates repeated timings of one phase."""

    name: str = ""
    samples_s: list[float] = field(default_factory=list)

    @contextlib.contextmanager
    def record(self):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.samples_s.append(time.perf_counter() - t0)

    @property
    def total_s(self) -> float:
        return sum(self.samples_s)

    @property
    def mean_s(self) -> float:
        return statistics.fmean(self.samples_s) if self.samples_s else 0.0

    @property
    def stdev_s(self) -> float:
        return statistics.stdev(self.samples_s) if len(self.samples_s) > 1 else 0.0


@dataclass
class SortStats:
    """Per-run named phase timers (reference: util.go:23-62)."""

    timers: dict[str, PerfTimer] = field(default_factory=dict)
    counters: dict[str, float] = field(default_factory=dict)

    def timer(self, name: str) -> PerfTimer:
        if name not in self.timers:
            self.timers[name] = PerfTimer(name)
        return self.timers[name]

    def time(self, name: str):
        return self.timer(name).record()

    def add(self, name: str, value: float) -> None:
        self.counters[name] = self.counters.get(name, 0.0) + value

    def report(self) -> dict:
        out = {
            name: {
                "total_s": t.total_s,
                "mean_s": t.mean_s,
                "stdev_s": t.stdev_s,
                "n": len(t.samples_s),
            }
            for name, t in self.timers.items()
        }
        out.update({f"counter:{k}": v for k, v in self.counters.items()})
        return out

    def dumps(self) -> str:
        return json.dumps(self.report(), sort_keys=True)
