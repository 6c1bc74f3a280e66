"""Average-rate token bucket (SURVEY §2.4 ST5).

Port of the reference's shared throughput primitive
(``/root/reference/src/pyf/aggregator/ratelimit.py:7-36``): a
thread-safe limiter that bounds the AVERAGE rate without serializing
concurrency — bursts up to ``capacity`` (= max(1, rate)) pass
immediately, sustained traffic is paced to ``rate_per_sec``, and a rate
of 0 (or less) disables limiting entirely.

In this batch engine nothing fetches over a network, so nothing NEEDS
pacing — Ray Data's backpressure bounds in-flight work instead (that is
why the SURVEY marks ST5 N/A for the core pipelines). The primitive
exists as the pacing seam a LIVE source stage would use (an actor's
``__init__`` holds one bucket per external endpoint; ``__call__``
acquires per request — the reference pattern of one bucket shared by
all fetch threads). Clock and sleep are injectable so the semantics are
testable deterministically."""

from __future__ import annotations

import threading
import time
from collections.abc import Callable


class TokenBucket:
    """Thread-safe average-rate limiter that does not serialize
    concurrency. Semantics identical to the reference's TokenBucket."""

    def __init__(
        self,
        rate_per_sec: float,
        clock: Callable[[], float] = time.monotonic,
        sleep: Callable[[float], None] = time.sleep,
    ):
        self._rate = float(rate_per_sec)
        self._capacity = max(1.0, self._rate)
        self._tokens = self._capacity
        self._clock = clock
        self._sleep = sleep
        self._last = clock()
        self._lock = threading.Lock()

    def acquire(self) -> None:
        """Block until a token is available (immediately while burst
        capacity lasts); a no-op when the rate is disabled."""
        if self._rate <= 0:
            return
        while True:
            with self._lock:
                now = self._clock()
                self._tokens = min(
                    self._capacity,
                    self._tokens + (now - self._last) * self._rate,
                )
                self._last = now
                if self._tokens >= 1.0:
                    self._tokens -= 1.0
                    return
                wait = (1.0 - self._tokens) / self._rate
            self._sleep(wait)
