"""Host decode pool with a per-image watchdog.

The reference wraps every image load in a per-attempt timeout that nulls the
handlers and retries via another creator (utils/canvas.js:68-81); its prepare
loop additionally isolates per-image failures (pages/index/index.js:1133-1149).
The TPU framework decodes on a thread pool instead of serially, so the
watchdog works against in-flight jobs: a decode that blocks forever (FIFO,
dead NFS mount, adversarial stream) must not hang the whole job — or the
interpreter at exit.

Python cannot kill a blocked thread, so an expired decode is *isolated*: a
``TimeoutError`` is reported for that image, the stuck worker is abandoned
(threads are daemonic, so process exit never blocks on it) and a replacement
worker is spawned so queued images behind the stuck one still run — the
"retry via another creator" ladder, minus the retry.
"""

from __future__ import annotations

import queue
import threading
import time
from typing import Any, Callable, Iterator, Optional, Sequence, Tuple

# (index, value, error): exactly one of value/error is meaningful
DecodeResult = Tuple[int, Any, Optional[Exception]]


def iter_decoded(jobs: Sequence[Callable[[], Any]], workers: int,
                 timeout_s: Optional[float] = None) -> Iterator[DecodeResult]:
    """Run ``jobs`` on daemon worker threads, yielding in completion order.

    Yields ``(index, value, None)`` for successes and ``(index, None, exc)``
    for failures — including ``TimeoutError`` for decodes still running
    ``timeout_s`` seconds after they started (queued jobs never time out;
    each timeout spawns a replacement worker so they still get a turn).
    The caller decides raise-vs-skip; closing the generator early stops
    workers from picking up further jobs.
    """
    n = len(jobs)
    if n == 0:
        return
    jobq: "queue.SimpleQueue" = queue.SimpleQueue()
    resq: "queue.SimpleQueue" = queue.SimpleQueue()
    for i, fn in enumerate(jobs):
        jobq.put((i, fn))
    cancelled = threading.Event()
    started: dict = {}

    def _worker() -> None:
        while not cancelled.is_set():
            try:
                i, fn = jobq.get_nowait()
            except queue.Empty:
                return
            started[i] = time.monotonic()
            try:
                resq.put((i, fn(), None))
            except BaseException as e:  # noqa: BLE001 — isolation boundary
                resq.put((i, None, e))

    def _spawn() -> None:
        t = threading.Thread(target=_worker, daemon=True,
                             name="stitch-decode")
        t.start()

    for _ in range(min(max(1, workers), n)):
        _spawn()

    reported: set = set()
    try:
        while len(reported) < n:
            item = None
            if timeout_s is None:
                item = resq.get()
            else:
                now = time.monotonic()
                deadlines = [t0 + timeout_s for i, t0 in list(started.items())
                             if i not in reported]
                wait_s = (max(0.01, min(deadlines) - now) if deadlines
                          else 0.05)
                try:
                    item = resq.get(timeout=wait_s)
                except queue.Empty:
                    pass
            if item is not None:
                i, v, e = item
                if i not in reported:   # drop late results of timed-out jobs
                    reported.add(i)
                    yield i, v, e
            if timeout_s is not None:
                now = time.monotonic()
                for i, t0 in list(started.items()):
                    if i not in reported and now - t0 > timeout_s:
                        reported.add(i)
                        _spawn()        # stuck worker's replacement
                        yield i, None, TimeoutError(
                            f"decode of image {i} exceeded {timeout_s}s "
                            "(watchdog; utils/canvas.js:68-81 analog)")
    finally:
        cancelled.set()
