"""Bounded background prefetch for host-side batch producers.

The training loaders assemble each batch with a blocking worker-pool gather
(`pool.map` over B decodes) — the slowest decode of batch N+1 sits on the host
thread's critical path between device dispatches. JAX's async dispatch already
overlaps ONE batch of host work with device compute, but only after the host
returns from the previous step call; a producer thread running the generator
``depth`` batches ahead takes the decode straggler tail (and PIL/np collation)
off the dispatch path entirely. This is the host-side analogue of DALI's
prefetch_queue_depth (the reference's pipelines prefetched on GPU by
construction, dali_extraction.py:53-81).

Semantics preserved from plain iteration: item order, exception propagation
(an exception raised by the source surfaces at the consumer's ``next()``), and
early termination (``close()``/context-manager exit stops the producer and
closes the source generator).
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Iterable, Iterator

_DONE = object()


class PrefetchIterator:
    """Iterate ``source`` on a daemon thread, at most ``depth`` items ahead."""

    def __init__(self, source: Iterable[Any], depth: int = 2):
        if depth < 1:
            raise ValueError(f"depth must be >= 1, got {depth}")
        self._source = source
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._error: BaseException | None = None
        self._thread = threading.Thread(target=self._produce, daemon=True)
        self._thread.start()

    def _produce(self) -> None:
        it = iter(self._source)
        try:
            for item in it:
                # Bounded put that stays responsive to close(): never block forever
                # on a consumer that went away.
                while not self._stop.is_set():
                    try:
                        self._q.put(item, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if self._stop.is_set():
                    break
        except BaseException as e:  # noqa: BLE001 — re-raised at the consumer
            self._error = e
        finally:
            close = getattr(it, "close", None)
            if close is not None:  # release generator finalizers (pools, files)
                try:
                    close()
                except BaseException:  # noqa: BLE001
                    pass
            while not self._stop.is_set():
                try:
                    self._q.put(_DONE, timeout=0.1)
                    break
                except queue.Full:
                    continue

    def __iter__(self) -> Iterator[Any]:
        return self

    def __next__(self) -> Any:
        if self._stop.is_set():
            raise StopIteration
        item = self._q.get()
        if item is _DONE:
            self._stop.set()
            if self._error is not None:
                err, self._error = self._error, None
                raise err
            raise StopIteration
        return item

    def close(self) -> None:
        """Stop the producer (idempotent). Safe mid-iteration — the source
        generator's ``close()`` runs on the producer thread. The join waits long
        enough for an in-flight source step (e.g. a pool.map decode straggler) to
        finish; a producer still alive after that is stuck inside the source — warn,
        since it may briefly contend with a successor over the dataset's pool."""
        self._stop.set()
        # Unblock a producer waiting on a full queue.
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=30.0)
        if self._thread.is_alive():
            import sys

            print(
                "PrefetchIterator.close(): producer still inside the source after 30s; "
                "it will exit after its current item (daemon thread).",
                file=sys.stderr,
            )

    def __enter__(self) -> "PrefetchIterator":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    def __del__(self):
        try:
            self._stop.set()
        except BaseException:  # noqa: BLE001
            pass


def prefetch(source: Iterable[Any], depth: int = 2) -> PrefetchIterator:
    """Wrap a batch generator so it produces ``depth`` items ahead on a
    background thread. Use as an iterator; ``close()`` (or the context manager)
    stops early without leaking the thread."""
    return PrefetchIterator(source, depth=depth)
