"""TokenBucket semantics, ported from the reference rate-limit suite
(/root/reference/tests/test_fetcher.py:621-676 and ratelimit.py:7-36),
driven by a deterministic fake clock."""

import threading

from pyf_aggregator_ray.functions.ratelimit import TokenBucket


class FakeClock:
    def __init__(self):
        self.t = 0.0
        self.sleeps: list[float] = []

    def now(self) -> float:
        return self.t

    def sleep(self, dt: float) -> None:
        self.sleeps.append(dt)
        # a real clock advances even for sub-ns sleeps; without this
        # floor, float drift in the refill arithmetic can converge the
        # requested waits to 0 and livelock the fake
        self.t += max(dt, 1e-9)


def _bucket(rate: float) -> tuple[TokenBucket, FakeClock]:
    clk = FakeClock()
    return TokenBucket(rate, clock=clk.now, sleep=clk.sleep), clk


def test_disabled_by_default_no_throttle():
    """Rate 0 (the reference default, PYPI_MAX_RPS=0) never sleeps."""
    bucket, clk = _bucket(0)
    for _ in range(1000):
        bucket.acquire()
    assert clk.sleeps == []
    assert clk.t == 0.0


def test_burst_up_to_capacity_is_instant():
    """Capacity = max(1, rate): the first `rate` acquisitions pass with
    no wait — a token bucket does not serialize concurrency."""
    bucket, clk = _bucket(10)
    for _ in range(10):
        bucket.acquire()
    assert clk.sleeps == []


def test_paces_requests_beyond_capacity():
    """Sustained traffic beyond the burst is paced to the average rate:
    60 acquisitions at 10/s cost ~5 s of waiting (50 paced tokens)."""
    bucket, clk = _bucket(10)
    for _ in range(60):
        bucket.acquire()
    assert clk.sleeps  # throttled
    assert abs(clk.t - 5.0) < 0.2
    # the long-run average rate is the configured one
    assert 60 / max(clk.t, 1e-9) <= 10 * 1.25


def test_tokens_refill_with_time():
    bucket, clk = _bucket(2)  # capacity 2
    bucket.acquire()
    bucket.acquire()
    clk.t += 1.0  # 1 second -> 2 tokens refill
    before = list(clk.sleeps)
    bucket.acquire()
    bucket.acquire()
    assert clk.sleeps == before  # no new sleeps


def test_low_rate_capacity_floor_is_one():
    """rate < 1 still allows one immediate acquisition (capacity floor
    1.0), then paces at 1/rate seconds per token."""
    bucket, clk = _bucket(0.5)
    bucket.acquire()
    assert clk.sleeps == []
    bucket.acquire()
    assert abs(clk.t - 2.0) < 1e-6


def test_thread_safety_under_real_clock():
    """Many threads acquiring concurrently never exceed the token
    budget (burst + refill) — the reference's one-bucket-per-endpoint
    usage across 50 fetch threads."""
    import time as _time

    bucket = TokenBucket(1000)  # fast enough to finish instantly
    n_ok = []
    t0 = _time.monotonic()

    def worker():
        for _ in range(50):
            bucket.acquire()
            n_ok.append(1)

    threads = [threading.Thread(target=worker) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    elapsed = _time.monotonic() - t0
    assert len(n_ok) == 400
    # 400 acquisitions at 1000/s with burst 1000: no meaningful wait
    assert elapsed < 5.0
