"""Per-request query deadline + client-disconnect cancellation.

The reference bounds every PromQL evaluation at 30 seconds — its engine
is built with ``Timeout: time.Second * 30`` (ref: reader/router/
prometheus_query_range.go:32) — and threads Go context cancellation
through every planner step (ref: reader/logql/logql_transpiler/shared/
types.go:26-90 PlannerContext carries ctx; a disconnected client's ctx
cancels the ClickHouse round-trips). Without an equivalent, a
pathological query on a shared cluster runs to completion holding
executors, and a client that gave up keeps paying for an answer nobody
reads.

Spark-first analog: each gateway request runs under a unique **job
group** (``SparkContext.setJobGroup(id, desc, interruptOnCancel=True)``
— per-thread under PySpark's pinned thread mode, the default in Spark
4, so concurrent gateway requests don't share groups). A daemon
watchdog polls two triggers:

* **deadline** — wall clock past ``timeout_s`` (default 30, matching
  the reference), and
* **disconnect** — a zero-byte ``MSG_PEEK`` read on the client socket
  (TCP FIN arrived; nobody is waiting for the response),

and on either fires ``cancelJobGroup`` — Spark kills every stage of
every job in the group (interruptOnCancel also interrupts running task
threads, so long scans die mid-flight), and the handler thread's
pending ``collect()`` raises. Job groups over tags because the Python
``StatusTracker`` exposes ``getJobIdsForGroup`` — tests and operators
can PROVE no straggler stages survive a cancel. The guard remembers why
it fired so the gateway can map the resulting exception to the
reference's error envelope (HTTP 503 ``errorType: timeout``, exactly
the Prometheus API contract for engine timeouts) instead of a generic
500.

Scope note (same contract as the reference): the deadline bounds
CLUSTER work, not Python-side response shaping — Go's ctx likewise only
interrupts its DB calls, not the envelope building that follows.
Driver-side formatting of an already-collected result is not
cancellable, and doesn't need to be: the expensive part at 100 TB is
always the Spark job.
"""

from __future__ import annotations

import itertools
import socket
import threading
import time

__all__ = ["RequestGuard", "cancelled_by_guard"]

_SEQ = itertools.count()


def _client_gone(sock) -> bool:
    """True when the peer sent FIN: a non-blocking MSG_PEEK read
    returning b'' means the read side is closed. Pending request bytes
    (pipelining, WebSocket frames) peek as data → still connected.
    EAGAIN → still connected, nothing buffered.

    Known limitation (ADVICE r10, adjudicated): a client that
    half-closes its write side (shutdown(SHUT_WR)) after sending the
    request also peeks b'' and gets its query cancelled. This MATCHES
    the reference's behavior — Go's net/http cancels the request
    Context as soon as the connection reads EOF, half-close included —
    so it is pinned as the contract rather than worked around; clients
    that want the response must keep the write side open, exactly as
    against the reference. Transient OSErrors are NOT trusted on a
    single poll: the watchdog requires two consecutive positive checks
    before cancelling (see _watch)."""
    try:
        return sock.recv(1, socket.MSG_PEEK | socket.MSG_DONTWAIT) == b""
    except (BlockingIOError, InterruptedError):
        return False
    except OSError:
        return True  # socket already torn down


class RequestGuard:
    """Context manager: group all Spark jobs submitted by this thread,
    cancel the group on deadline or client disconnect.

    Usage::

        guard = RequestGuard(spark, timeout_s=30, sock=conn, desc=path)
        try:
            with guard:
                ... plan + collect ...
        except Exception as ex:
            if guard.reason == "timeout":    ... 503 envelope ...
            elif guard.reason == "disconnect": ... drop connection ...
            else: raise / 500

    ``timeout_s=None`` disables the deadline (live tail); ``sock=None``
    disables disconnect polling (embedded/test use).
    """

    def __init__(
        self,
        spark,
        timeout_s: float | None = 30.0,
        sock=None,
        desc: str = "",
        poll_s: float = 0.25,
    ):
        self.spark = spark
        self.timeout_s = timeout_s
        self.sock = sock
        self.desc = desc
        self.poll_s = poll_s
        self.group_id = f"req-{next(_SEQ)}-{threading.get_ident()}"
        self.reason: str | None = None  # "timeout" | "disconnect"
        self._stop = threading.Event()
        self._watchdog: threading.Thread | None = None

    # ------------------------------------------------------------------
    def __enter__(self) -> "RequestGuard":
        sc = self.spark.sparkContext
        sc.setJobGroup(self.group_id, self.desc or self.group_id, True)
        if self.timeout_s is not None or self.sock is not None:
            self._watchdog = threading.Thread(
                target=self._watch,
                name=f"guard-{self.group_id}",
                daemon=True,
            )
            self._watchdog.start()
        return self

    def __exit__(self, *exc) -> None:
        self._stop.set()
        if self._watchdog is not None:
            self._watchdog.join(timeout=2)
        try:
            # leave no stale group on the (reused) connection thread
            self.spark.sparkContext.setLocalProperty(
                "spark.jobGroup.id", None
            )
            self.spark.sparkContext.setLocalProperty(
                "spark.job.interruptOnCancel", None
            )
        except Exception:
            pass  # session torn down under us — nothing left to clear
        return None

    # ------------------------------------------------------------------
    def _watch(self) -> None:
        deadline = (
            time.monotonic() + self.timeout_s
            if self.timeout_s is not None
            else None
        )
        gone_polls = 0
        while not self._stop.wait(self.poll_s):
            if deadline is not None and time.monotonic() >= deadline:
                self.reason = "timeout"
                break
            if self.sock is not None and _client_gone(self.sock):
                # two consecutive positive polls before cancelling — a
                # one-off OSError blip must not kill a live query
                gone_polls += 1
                if gone_polls >= 2:
                    self.reason = "disconnect"
                    break
            else:
                gone_polls = 0
        # Re-cancel until the handler thread leaves the guard:
        # cancelJobGroup only kills jobs ALREADY submitted — if the
        # trigger fires while the driver is still planning (analysis,
        # UDF pickling), a single cancel is a no-op and the job would
        # start afterwards unbounded. Looping closes that race.
        while self.reason is not None and not self._stop.is_set():
            try:
                self.spark.sparkContext.cancelJobGroup(self.group_id)
            except Exception:
                return  # session gone — nothing left to cancel
            self._stop.wait(self.poll_s)


def cancelled_by_guard(ex: BaseException) -> bool:
    """Heuristic: does this exception look like a Spark job
    cancellation (vs a genuine query error)? Used only to pick the
    error envelope; the guard's ``reason`` is the authority on WHY."""
    msg = str(ex)
    return "cancelled" in msg or "canceled" in msg or "SparkJobCancelled" in msg
