"""Query deadline enforcement (reference parity: the Athena poll loop's
completion budget).

The reference bounds every query at poll_interval x max_attempts
(default 60 s) and raises on expiry (``AbstractAthenaQuery.java:108-142``,
defaults ``FirehoseEventStoreProviderFactory.java:73-74``). Spark has no
per-query timeout, but it has cancellable job groups — this wrapper is
the thin engine-side equivalent SURVEY §4 calls for: run the action in
a job group on a side thread, cancel the group on deadline, surface a
timeout error. Cancellation interrupts running tasks (interruptOnCancel)
so executor slots free immediately, not at stage end.
"""

from __future__ import annotations

import os
import threading

from pyspark import InheritableThread
from pyspark.sql import DataFrame

_SEQ = [0]
_LOCK = threading.Lock()


class QueryDeadlineExceeded(TimeoutError):
    """Raised when a bounded action outlives its deadline (the analogue
    of the reference's 'Query did not complete' IllegalStateException)."""


def collect_with_deadline(df: DataFrame, timeout_s: float) -> list:
    """Collect with a hard deadline: on expiry the job group is
    cancelled (tasks interrupted) and QueryDeadlineExceeded raised."""
    sc = df.sparkSession.sparkContext
    with _LOCK:
        _SEQ[0] += 1
        group = f"deadline_{os.getpid()}_{_SEQ[0]}"
    box: dict = {}

    def run() -> None:
        sc.setJobGroup(group, f"deadline={timeout_s}s", interruptOnCancel=True)
        try:
            box["rows"] = df.collect()
        except Exception as exc:  # cancelled jobs surface here
            box["error"] = exc

    t = InheritableThread(target=run, daemon=True)
    t.start()
    t.join(timeout_s)
    if t.is_alive():
        sc.cancelJobGroup(group)
        t.join(10)
        raise QueryDeadlineExceeded(
            f"query exceeded {timeout_s}s deadline; job group {group} cancelled"
        )
    if "error" in box:
        raise box["error"]
    return box["rows"]
