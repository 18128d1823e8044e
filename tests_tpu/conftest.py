"""Real-chip test ledger: record when tests_tpu last ran and how it went.

VERDICT r3 weak #6: nothing in the repo recorded when the real-TPU tests
last passed, so chip-test staleness was invisible (a round with the
backend down cannot have run them).  Every session appends one line to
``tests_tpu/LEDGER.md`` — timestamp, backend, pass/fail counts — the same
discipline as the soak ledger in CLAUDE.md.
"""

import datetime
import os

_LEDGER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "LEDGER.md")


def pytest_sessionfinish(session, exitstatus):
    try:
        # the test module's bounded probe already ran at collection; reuse
        # its answer rather than touching a possibly-wedged backend again
        from test_tpu_smoke import _BACKEND as backend
    except Exception as e:  # noqa: BLE001 — a dead backend is still a fact
        backend = f"init-failed ({type(e).__name__})"
    ts = datetime.datetime.now(datetime.timezone.utc)
    counts = getattr(session, "testscollected", "?")
    failed = getattr(session, "testsfailed", "?")
    line = (f"- {ts:%Y-%m-%d %H:%M}Z backend={backend} "
            f"collected={counts} failed={failed} exit={exitstatus}\n")
    try:
        fresh = not os.path.exists(_LEDGER)
        with open(_LEDGER, "a") as f:
            if fresh:
                f.write("# tests_tpu run ledger (appended by conftest)\n\n")
            f.write(line)
    except OSError:
        pass
