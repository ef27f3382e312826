"""Tests for the bounded background batch prefetcher (data/prefetch.py) — the
host-side analogue of DALI's prefetch_queue_depth, wrapped around every stage
driver's batch loop."""

import threading
import time

import pytest

from ted_spad_tpu.data.prefetch import prefetch


def test_order_and_completeness():
    with prefetch(iter(range(57)), depth=3) as it:
        assert list(it) == list(range(57))


def test_exception_propagates_at_consumer():
    def gen():
        yield 1
        yield 2
        raise RuntimeError("decode failed")

    with prefetch(gen()) as it:
        assert next(it) == 1
        assert next(it) == 2
        with pytest.raises(RuntimeError, match="decode failed"):
            next(it)
        # Exhausted afterwards, not raising again.
        with pytest.raises(StopIteration):
            next(it)


def test_early_close_stops_producer_and_closes_source():
    state = {"produced": 0, "closed": False}

    def gen():
        try:
            for i in range(10_000):
                state["produced"] = i + 1
                yield i
        finally:
            state["closed"] = True

    it = prefetch(gen(), depth=2)
    assert next(it) == 0
    it.close()
    assert state["closed"], "source generator finalizer must run on close"
    # Bounded lookahead: the producer was at most depth + 1 items ahead of the
    # single consumed item (one buffered in the blocked put).
    assert state["produced"] <= 1 + 2 + 1, state["produced"]
    with pytest.raises(StopIteration):
        next(it)


def test_bounded_lookahead_while_consumer_is_slow():
    produced = []

    def gen():
        for i in range(100):
            produced.append(i)
            yield i

    with prefetch(gen(), depth=2) as it:
        first = next(it)
        assert first == 0
        time.sleep(0.3)  # let the producer run as far as it can
        # depth queued + 1 in the blocked put (+ the consumed one).
        assert len(produced) <= 1 + 2 + 1, len(produced)
        assert list(it) == list(range(1, 100))
    assert len(produced) == 100


def test_producer_actually_overlaps_consumer():
    """The producer thread works while the consumer is busy: a slow source +
    slow consumer finish in ~max (overlapped), not ~sum (serialized)."""
    n, dt = 8, 0.05

    def gen():
        for i in range(n):
            time.sleep(dt)
            yield i

    t0 = time.perf_counter()
    with prefetch(gen(), depth=2) as it:
        for _ in it:
            time.sleep(dt)  # "device step"
    elapsed = time.perf_counter() - t0
    serialized = 2 * n * dt
    assert elapsed < serialized * 0.8, (elapsed, serialized)


def test_consumer_thread_identity():
    """Items are produced on a different thread than the consumer (the overlap
    contract) and close() joins it."""
    seen = []

    def gen():
        seen.append(threading.current_thread())
        yield 1

    it = prefetch(gen())
    assert next(it) == 1
    assert seen[0] is not threading.current_thread()
    it.close()
    assert not it._thread.is_alive()
