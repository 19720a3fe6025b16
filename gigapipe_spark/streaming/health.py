"""Writer watchdog analog (ref: writer/watchdog/watchdog.go:19-63).

The reference pings every insert service on a 5s ticker and kills the
process on the first failure so the orchestrator restarts it. The Spark
equivalent of "insert services" is the set of active Structured
Streaming queries (the fan-out/rollup/ruler sinks); the equivalent of a
failed ping is a query that terminated with an exception. `check`
performs one sweep; `Watchdog` wraps it in the reference's periodic
loop with the same fail-fast contract (raise, don't limp).
"""

from __future__ import annotations

import threading

from pyspark.sql import SparkSession


class WatchdogError(RuntimeError):
    """A monitored streaming query is no longer healthy (the analog of
    the reference's `[WD001] FATAL ERROR` exit)."""


def check(spark: SparkSession, expected: list[str] | None = None) -> list[str]:
    """One watchdog sweep (ref: watchdog.go:53-63 Check).

    Raises WatchdogError if any active query has died with an exception,
    or if any `expected` query name is not currently running. Returns
    the names of the healthy active queries.
    """
    active = {q.name or q.id: q for q in spark.streams.active}
    for name, q in active.items():
        exc = q.exception()
        if exc is not None:
            raise WatchdogError(f"streaming query {name!r} failed: {exc}")
    if expected:
        missing = [n for n in expected if n not in active]
        if missing:
            raise WatchdogError(f"streaming queries not running: {missing}")
    return sorted(active)


class Watchdog:
    """Periodic checker (ref: watchdog.go:19-41 Init/Stop): run `check`
    every `interval_s` seconds on a daemon timer; the first failure
    stores the error and stops the loop (the reference os.Exit(1)s —
    a library raises instead, surfaced via `error`)."""

    def __init__(
        self,
        spark: SparkSession,
        expected: list[str] | None = None,
        interval_s: float = 5.0,
    ):
        self._spark = spark
        self._expected = expected
        self._interval = interval_s
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self.error: WatchdogError | None = None
        self.checks = 0

    def start(self) -> "Watchdog":
        def loop() -> None:
            while not self._stop.wait(self._interval):
                try:
                    check(self._spark, self._expected)
                    self.checks += 1
                except WatchdogError as e:  # fail-fast, stop the loop
                    self.error = e
                    return

        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None
