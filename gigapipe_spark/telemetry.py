"""Writer/reader self-telemetry in Prometheus exposition format.

Mirrors the reference's metric registry (ref: writer/metric/variabels.go
— json_parse_errors_count, sent_rows{service}, sent_bytes{service},
tx_close_time_ms histogram; exposed by promhttp on /metrics,
ref: writer/router/*.go). Spark-first mechanics:

- Row/byte counts ride the WRITE jobs via ``DataFrame.observe`` +
  ``pyspark.sql.Observation`` — observed aggregates are computed by the
  same job that writes the data, so counting adds no extra pass (the
  reference's insert services count rows as they serialize them for the
  same reason).
- Decode-error counts use Spark ACCUMULATORS: the per-payload error
  isolation inside mapInPandas decoders increments a counter that the
  driver aggregates across tasks on job completion — the distributed
  analog of promauto counters in request handlers.

Counters are process-local and monotonic, like an in-process Prometheus
registry; ``render()`` emits the text exposition format `/metrics`
serves.
"""

from __future__ import annotations

import threading
import time
from collections import defaultdict

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.observation import Observation

# ref: writer/metric/variabels.go TxCloseTime buckets
TX_CLOSE_BUCKETS = [100.0, 200.0, 500.0, 1000.0, 5000.0, 10000.0]


class Telemetry:
    """A tiny in-process metric registry (counters + one histogram)."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._counters: dict[tuple[str, tuple], float] = defaultdict(float)
        self._tx_buckets = [0] * (len(TX_CLOSE_BUCKETS) + 1)  # +inf
        self._tx_sum = 0.0
        self._tx_count = 0
        self._accumulators: dict[int, object] = {}

    # -- counters ----------------------------------------------------
    def inc(self, name: str, labels: dict | None = None, v: float = 1.0) -> None:
        key = (name, tuple(sorted((labels or {}).items())))
        with self._lock:
            self._counters[key] += v

    def observe_tx_ms(self, ms: float) -> None:
        with self._lock:
            for i, ub in enumerate(TX_CLOSE_BUCKETS):
                if ms <= ub:
                    self._tx_buckets[i] += 1
                    break
            else:
                self._tx_buckets[-1] += 1
            self._tx_sum += ms
            self._tx_count += 1

    # -- decode-error accumulator ------------------------------------
    def decode_error_acc(self, spark):
        """One LongAccumulator per SparkContext, lazily created. Decoders
        capture it in their mapInPandas closure; ``sync_decode_errors``
        folds the accumulated value into json_parse_errors_count."""
        sc = spark.sparkContext
        key = id(sc)
        with self._lock:
            if key not in self._accumulators:
                self._accumulators[key] = sc.accumulator(0)
            return self._accumulators[key]

    def sync_decode_errors(self, spark) -> int:
        """Snapshot the accumulator into the counter (idempotent: the
        counter is set to the accumulator's monotonic total)."""
        sc = spark.sparkContext
        acc = self._accumulators.get(id(sc))
        total = int(acc.value) if acc is not None else 0
        with self._lock:
            self._counters[("json_parse_errors_count", ())] = float(total)
        return total

    # -- rendering ---------------------------------------------------
    def render(self) -> str:
        """Prometheus text exposition format (the /metrics payload)."""
        out = []
        with self._lock:
            names = sorted({n for n, _ in self._counters})
            for n in names:
                out.append(f"# TYPE {n} counter")
                for (name, lbls), val in sorted(self._counters.items()):
                    if name != n:
                        continue
                    lab = (
                        "{" + ",".join(f'{k}="{v}"' for k, v in lbls) + "}"
                        if lbls
                        else ""
                    )
                    fval = int(val) if float(val).is_integer() else val
                    out.append(f"{n}{lab} {fval}")
            out.append("# TYPE tx_close_time_ms histogram")
            cum = 0
            for i, ub in enumerate(TX_CLOSE_BUCKETS):
                cum += self._tx_buckets[i]
                out.append(f'tx_close_time_ms_bucket{{le="{ub:g}"}} {cum}')
            cum += self._tx_buckets[-1]
            out.append(f'tx_close_time_ms_bucket{{le="+Inf"}} {cum}')
            out.append(f"tx_close_time_ms_sum {self._tx_sum:g}")
            out.append(f"tx_close_time_ms_count {self._tx_count}")
        return "\n".join(out) + "\n"


# the process-wide registry, like promauto's default registerer
TELEMETRY = Telemetry()


def observed_write(df: DataFrame, service: str, write_fn, bytes_col: str | None):
    """Run ``write_fn(observed_df)`` and account sent_rows / sent_bytes /
    tx_close_time_ms for ``service`` from the SAME job via Observation."""
    aggs = [F.count(F.lit(1)).alias("rows")]
    if bytes_col is not None:
        aggs.append(
            F.coalesce(F.sum(F.length(F.col(bytes_col))), F.lit(0)).alias("bytes")
        )
    obs = Observation()
    t0 = time.monotonic()
    write_fn(df.observe(obs, *aggs))
    # crash injection for the fan-out consistency tests
    # (tests/test_crash_fanout.py): SIGKILL this process the moment the
    # named table's append commits — the exact between-appends window
    # the batch journal exists to heal
    import os as _os

    if _os.environ.get("GIGAPIPE_CRASH_AFTER_WRITE") == service:
        import signal as _signal

        _os.kill(_os.getpid(), _signal.SIGKILL)
    got = obs.get
    TELEMETRY.observe_tx_ms((time.monotonic() - t0) * 1000.0)
    TELEMETRY.inc("sent_rows", {"service": service}, float(got["rows"]))
    if bytes_col is not None:
        TELEMETRY.inc("sent_bytes", {"service": service}, float(got["bytes"]))
    return got
