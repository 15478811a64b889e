"""Rate limiting for distributed fetch (SURVEY §2.10 T4).

The reference's limiter is a process-global token bucket (min-interval +
max-concurrent semaphore, src/engine/engine.py:38-93). Spark executors don't
share memory, so the idiomatic approximation is a per-partition bucket with
a rate budget of ``rate / num_partitions`` — aggregate throughput matches the
global budget, burst behavior differs slightly (documented divergence,
SURVEY §7 hard-part #4).
"""

from __future__ import annotations

import threading
import time


class TokenBucket:
    """Min-interval rate limiter with wait-time stats (thread-safe)."""

    def __init__(self, rate_per_sec: float):
        self.interval = 1.0 / rate_per_sec if rate_per_sec > 0 else 0.0
        self._lock = threading.Lock()
        self._next_free = 0.0
        self.total_wait = 0.0
        self.acquisitions = 0

    def acquire(self) -> float:
        """Block until a slot is free; returns seconds waited."""
        if self.interval == 0.0:
            with self._lock:
                self.acquisitions += 1
            return 0.0
        with self._lock:
            now = time.monotonic()
            wait = max(0.0, self._next_free - now)
            self._next_free = max(self._next_free, now) + self.interval
            self.total_wait += wait
            self.acquisitions += 1
        if wait > 0:  # sleep OUTSIDE the lock (reference engine.py:76-80)
            time.sleep(wait)
        return wait

    @property
    def avg_wait(self) -> float:
        return self.total_wait / self.acquisitions if self.acquisitions else 0.0


def partition_bucket(rate_per_sec: float, num_partitions: int) -> TokenBucket:
    """Bucket for one partition: the global budget split evenly."""
    if rate_per_sec <= 0:
        return TokenBucket(0)
    return TokenBucket(rate_per_sec / max(1, num_partitions))
