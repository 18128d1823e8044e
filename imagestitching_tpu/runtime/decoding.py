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

The timeout budget is *per core-share*, not raw wall clock: when more
decodes run concurrently than the host has cores, each one's deadline is
stretched by the oversubscription factor — otherwise N slow-but-progressing
decodes on a small host would all "time out" at once despite making steady
progress.
"""

from __future__ import annotations

import os
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
    for failures — including ``TimeoutError`` for decodes still running past
    their deadline (queued jobs never time out; each timeout spawns a
    replacement worker so they still get a turn).  The caller decides
    raise-vs-skip; closing the generator early stops workers from picking up
    further jobs.  ``BaseException``s that are not ``Exception`` (e.g.
    KeyboardInterrupt in a worker) are re-raised in the consumer regardless
    of any skip policy.
    """
    n = len(jobs)
    if n == 0:
        return
    workers = min(max(1, workers), n)
    # core-share stretch: 8 threads on 1 core legitimately take ~8x longer
    oversub = max(1.0, workers / max(1, os.cpu_count() or 1))
    budget = None if timeout_s is None else timeout_s * oversub

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
            except Exception as e:  # noqa: BLE001 — isolation boundary
                resq.put((i, None, e))
            except BaseException as e:
                resq.put((i, None, e))
                raise

    def _spawn() -> None:
        t = threading.Thread(target=_worker, daemon=True,
                             name="stitch-decode")
        t.start()

    for _ in range(workers):
        _spawn()

    reported: set = set()

    def _drain_ready() -> list:
        out = []
        while True:
            try:
                out.append(resq.get_nowait())
            except queue.Empty:
                return out

    try:
        while len(reported) < n:
            items = _drain_ready()
            if not items:
                if budget is None:
                    items = [resq.get()]
                else:
                    now = time.monotonic()
                    deadlines = [t0 + budget for i, t0
                                 in list(started.items())
                                 if i not in reported]
                    wait_s = (max(0.01, min(deadlines) - now) if deadlines
                              else 0.05)
                    try:
                        items = [resq.get(timeout=wait_s)]
                    except queue.Empty:
                        items = []
            # completed results ALWAYS beat the deadline scan — a decode
            # that finished moments before its deadline must not be
            # misreported as a timeout
            items.extend(_drain_ready())
            for i, v, e in items:
                if i not in reported:   # drop late results of timed-out jobs
                    reported.add(i)
                    yield i, v, e
            if budget is not None:
                now = time.monotonic()
                for i, t0 in list(started.items()):
                    if i not in reported and now - t0 > budget:
                        reported.add(i)
                        _spawn()        # stuck worker's replacement
                        yield i, None, TimeoutError(
                            f"decode of image {i} exceeded {timeout_s}s "
                            f"(x{oversub:.0f} core-share stretch; watchdog, "
                            "utils/canvas.js:68-81 analog)")
    finally:
        cancelled.set()
