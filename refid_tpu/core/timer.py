"""Timers with global stats (parity: basicsr/utils/timer_util.py:6-57).

``Timer`` measures host wall-clock; ``DeviceTimer`` additionally blocks on
jax async dispatch so device work is included (the TPU answer to the
reference's CudaTimer / cuda events)."""

from __future__ import annotations

import atexit
import time
from collections import defaultdict
from typing import Dict, List

__all__ = ["Timer", "DeviceTimer", "timer_stats", "print_timer_stats"]

_cumulative: Dict[str, float] = defaultdict(float)
_counts: Dict[str, int] = defaultdict(int)


class Timer:
    def __init__(self, name: str = "timer", print_every: int = 0):
        self.name = name
        self.print_every = print_every

    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self.start
        _cumulative[self.name] += dt
        _counts[self.name] += 1
        if self.print_every and _counts[self.name] % self.print_every == 0:
            avg = _cumulative[self.name] / _counts[self.name]
            print(f"[{self.name}] avg {avg*1000:.2f} ms over "
                  f"{_counts[self.name]} calls")
        return False


class DeviceTimer(Timer):
    """Blocks on all outstanding device work before stopping the clock."""

    def __exit__(self, *exc):
        import jax
        (jax.device_put(0.0) + 0).block_until_ready()
        return super().__exit__(*exc)


def timer_stats() -> Dict[str, Dict[str, float]]:
    return {name: {"total_s": _cumulative[name], "count": _counts[name],
                   "avg_ms": 1000 * _cumulative[name] / max(_counts[name], 1)}
            for name in _cumulative}


def print_timer_stats():
    for name, s in sorted(timer_stats().items()):
        print(f"[{name}] total {s['total_s']:.2f}s count {s['count']} "
              f"avg {s['avg_ms']:.2f}ms")


def enable_atexit_dump():
    atexit.register(print_timer_stats)
