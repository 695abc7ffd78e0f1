"""Generic micro-batching service loop.

One batcher thread owns all downstream dispatch: callers enqueue items and block on a
per-item event; the thread collects items that arrive within ``max_wait_ms`` (up to
``max_batch``) and serves each batch with ONE call to the subclass's ``_serve``. Two
serving surfaces share this loop — the offline HTTP request batcher
(`serving_http.DynamicBatcher`) and the streaming window batcher
(`serving_streaming.StreamingFrameBatcher`) — so the shutdown/error/deadline semantics
are defined once:

* ``_serve`` failures fan out to every waiter in the batch (a compile error or OOM must
  never leave a submitter blocked);
* ``stop()`` drains the queue and fails abandoned items with `BatcherStopped` — callers
  blocked in ``submit`` wake with an error instead of waiting forever, and submits after
  stop fail fast;
* a lone item still forms a batch of one, so an idle service adds no latency beyond
  ``max_wait_ms`` of its own arrival.

The reference has no serving runtime at all (its interactive path is
`/root/reference/main.py:239-253`, one microphone utterance at a time); this is fleet
infrastructure the TPU deployment needs because every dispatch on a network-attached
chip pays a fixed round-trip.
"""
import queue
import threading
import time
from typing import Any, List, Optional

_LATENCY_WINDOW = 512  # rolling window for the p50/p95 metrics


class BatcherStopped(RuntimeError):
    """The batcher was stopped before (or while) this item could be served."""


class PendingItem:
    __slots__ = ("payload", "done", "result", "error", "enqueued_at")

    def __init__(self, payload: Any):
        self.payload = payload
        self.done = threading.Event()
        self.result: Any = None
        self.error: Optional[BaseException] = None
        self.enqueued_at = time.time()


class MicroBatcher:
    """Base class: subclasses implement ``_serve(batch)``, setting ``item.result`` for
    every `PendingItem` in the batch (exceptions fan out to all unresolved waiters)."""

    item_noun = "items"  # metrics key for the item counter ("requests", "windows", ...)

    def __init__(self, max_batch: int = 16, max_wait_ms: float = 10.0,
                 name: str = "micro-batcher"):
        self.max_batch = max_batch
        self.max_wait_ms = max_wait_ms
        self._queue: "queue.Queue[Optional[PendingItem]]" = queue.Queue()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True, name=name)
        self._lock = threading.Lock()
        self.items = 0
        self.batches = 0
        self.errors = 0
        self._latencies: List[float] = []

    def start(self) -> None:
        self._thread.start()

    @property
    def started(self) -> bool:
        return self._thread.ident is not None

    def stop(self) -> None:
        self._stop.set()
        self._queue.put(None)  # wake the loop
        if self._thread.ident is not None:  # join() on a never-started thread raises
            self._thread.join(timeout=30)
        self._fail_pending()  # anything the loop never took must not block its waiter

    def submit(self, payload: Any) -> Any:
        """Enqueue one item and block until its batch is served."""
        if self._stop.is_set():
            raise BatcherStopped("batcher is stopped")
        item = PendingItem(payload)
        self._queue.put(item)
        if self._stop.is_set():
            # stop() may have drained the queue before this put landed; drain again so
            # this item cannot wait on a loop that already exited.
            self._fail_pending()
        item.done.wait()
        if item.error is not None:
            raise item.error
        return item.result

    def metrics(self) -> dict:
        with self._lock:
            latencies = sorted(self._latencies)
            out = {
                self.item_noun: self.items,
                "batches": self.batches,
                "errors": self.errors,
                "mean_batch_size": self.items / self.batches if self.batches else 0.0,
                "queue_depth": self._queue.qsize(),
            }
            if latencies:
                out["latency_p50_s"] = latencies[len(latencies) // 2]
                out["latency_p95_s"] = latencies[min(len(latencies) - 1,
                                                     int(len(latencies) * 0.95))]
            return out

    def _serve(self, batch: List[PendingItem]) -> None:
        raise NotImplementedError

    def _fail_pending(self) -> None:
        while True:
            try:
                item = self._queue.get_nowait()
            except queue.Empty:
                return
            if item is None:
                continue
            item.error = BatcherStopped("batcher stopped before serving this item")
            item.done.set()

    def _loop(self) -> None:
        while not self._stop.is_set():
            try:
                first = self._queue.get(timeout=0.25)
            except queue.Empty:
                continue
            if first is None:
                continue
            batch = [first]
            deadline = time.time() + self.max_wait_ms / 1000.0
            while len(batch) < self.max_batch:
                remaining = deadline - time.time()
                if remaining <= 0:
                    break
                try:
                    item = self._queue.get(timeout=remaining)
                except queue.Empty:
                    break
                if item is None:
                    break
                batch.append(item)
            try:
                self._serve(batch)
            except BaseException as error:  # surface compile/OOM to every waiter
                for item in batch:
                    if item.error is None:
                        item.error = error
            finally:
                now = time.time()
                failed = sum(1 for item in batch if item.error is not None)
                with self._lock:
                    self.items += len(batch)
                    self.batches += 1
                    self.errors += failed
                    self._latencies.extend(now - item.enqueued_at for item in batch)
                    del self._latencies[:-_LATENCY_WINDOW]
                for item in batch:
                    item.done.set()
        self._fail_pending()
