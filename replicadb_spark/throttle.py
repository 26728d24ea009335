"""Bandwidth throttling (SURVEY.md §2.5 F2).

The reference rate-limits fetch batches with a TimedSemaphore sized from
a sampled first-row width and a KB/s cap
(manager/util/BandwidthThrottling.java:30-74). Spark has no builtin; this
token bucket runs inside each partition iterator, so an N-partition job
is capped at N × kbps_per_partition — document the approximation instead
of pretending a global cap (a global cap would need a shared service).
"""

from __future__ import annotations

import time
from collections.abc import Iterable, Iterator


class TokenBucket:
    """Byte-budget token bucket; refills continuously at ``kbps`` KB/s."""

    def __init__(self, kbps: int, clock=time.monotonic, sleep=time.sleep):
        if kbps <= 0:
            raise ValueError("kbps must be positive")
        self.rate = kbps * 1024.0  # bytes/sec
        self.capacity = self.rate  # 1 second of burst
        self.tokens = self.capacity
        self.clock = clock
        self.sleep = sleep
        self.last = clock()

    def acquire(self, nbytes: int) -> None:
        """Debt model: take the bytes immediately, sleep off any deficit.

        (A wait-until-full loop would never terminate for a request larger
        than the bucket capacity — the balance is capped below the request;
        letting the balance go negative keeps the long-run rate exact for
        any request size.)
        """
        now = self.clock()
        self.tokens = min(self.capacity, self.tokens + (now - self.last) * self.rate)
        self.last = now
        self.tokens -= nbytes
        if self.tokens < 0:
            self.sleep(-self.tokens / self.rate)


def throttled(rows: Iterable, kbps: int, row_bytes: int = 256) -> Iterator:
    """Wrap a partition iterator with a per-partition KB/s cap.

    ``row_bytes`` plays the role of the reference's sampled first-row
    size (BandwidthThrottling.java:46-59); callers with real Row objects
    can pass a measured width.
    """
    bucket = TokenBucket(kbps)
    for row in rows:
        bucket.acquire(row_bytes)
        yield row


def throttled_arrow(df, kbps: int):
    """Rate-cap a DataFrame at ``kbps`` KB/s per partition via mapInArrow:
    batches pass through zero-copy and the bucket charges their REAL
    Arrow byte size — no per-row Python objects (the old rdd.mapPartitions
    formulation deserialized every row through pickle, a 100× tax that
    defeated the purpose of limiting I/O)."""

    def gen(batches):
        bucket = TokenBucket(kbps)
        for batch in batches:
            bucket.acquire(batch.nbytes)
            yield batch

    return df.mapInArrow(gen, df.schema)
