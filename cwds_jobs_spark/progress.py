"""Throughput / ETA reporting (SURVEY.md §2.11 C4).

Reference analogs: the wall-clock job report (jobs-common/.../
timereport/JobTimeReport.java:14-20) and the linear ETA estimator —
``time_left = (total - done) × elapsed_ms_per_item``
(jobs-common/.../timereport/TimeLeftEstimationProvider.java:24-45),
fed by the entities-written counter (util/ConsumerCounter.java:5-27).

Spark-native surfaces:

- :class:`ProgressReporter` — driver-side counter with the same linear
  estimator; the batch runner / multisource loop call ``update`` per
  window.
- :func:`attach_streaming_progress` — a ``StreamingQueryListener``
  that feeds the reporter from Structured Streaming's own
  per-micro-batch progress events (numInputRows), so the streaming
  driver gets rows/sec + ETA for free, no extra job.
"""

from __future__ import annotations

import time
from typing import Callable


class ProgressReporter:
    """Linear-rate progress estimator (events/sec + ETA).

    ``clock`` is injectable for tests; defaults to ``time.monotonic``.
    """

    def __init__(
        self,
        total_expected: int | None = None,
        clock: Callable[[], float] = time.monotonic,
    ):
        self._clock = clock
        self.start = clock()
        self.total_expected = total_expected
        self.events = 0
        self.batches = 0

    def update(self, events: int) -> None:
        self.events += int(events)
        self.batches += 1

    def snapshot(self) -> dict:
        elapsed = max(self._clock() - self.start, 1e-9)
        rate = self.events / elapsed
        eta = None
        if self.total_expected is not None and self.events > 0:
            # reference estimator: remaining × elapsed-per-item
            # (TimeLeftEstimationProvider.java:35-41)
            eta = (self.total_expected - self.events) * (elapsed / self.events)
        return {
            "events": self.events,
            "batches": self.batches,
            "elapsed_sec": round(elapsed, 3),
            "events_per_sec": round(rate, 1),
            "eta_sec": None if eta is None else round(max(eta, 0.0), 3),
            "pct_done": (
                None
                if not self.total_expected
                else round(100.0 * self.events / self.total_expected, 2)
            ),
        }


def attach_streaming_progress(spark, reporter: ProgressReporter):
    """Wire the reporter to Structured Streaming progress events.

    Returns the listener (pass to ``spark.streams.removeListener`` to
    detach).  Uses only public StreamingQueryListener API.
    """
    from pyspark.sql.streaming import StreamingQueryListener

    class _L(StreamingQueryListener):
        def __init__(self):
            # max batchId seen per runId: progress batchIds are
            # monotonic, so this dedups re-delivered events in O(runs)
            # memory — an unbounded (runId, batchId) set is a slow
            # driver leak on exactly the long tails this targets
            self._max_batch: dict = {}

        def onQueryStarted(self, event):
            pass

        def onQueryProgress(self, event):
            try:
                p = event.progress
                run, b = str(p.runId), int(p.batchId)
                if b <= self._max_batch.get(run, -1):
                    return  # progress events can be re-delivered
                self._max_batch[run] = b
                reporter.update(int(p.numInputRows))
            except Exception:
                pass  # progress reporting must never fail the query

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            pass

    listener = _L()
    spark.streams.addListener(listener)
    return listener
