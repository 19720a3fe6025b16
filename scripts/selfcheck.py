"""Self-run replica of the driver's correctness gate.

Runs every queries() entry against its oracle_sql() on /root/testdata/sf0.01
and prints per-query PASS/FAIL (rows-only for entries without an oracle).
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

from oracle_utils import compare  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    only = sys.argv[1:]
    import __spark_entry__ as e

    if os.environ.get("SELFCHECK_TUNED"):
        from gigapipe_spark.session import get_spark

        spark = get_spark("selfcheck")
    else:
        # Mimic the correctness driver: a VANILLA session with none of our
        # tuned confs, so conf-dependence (e.g. nanosAsLong) shows up here
        # instead of in CORRECTNESS_r{N}.json.
        from pyspark.sql import SparkSession

        builder = (
            SparkSession.builder.master("local[32]")
            .appName("selfcheck-vanilla")
            .config("spark.sql.session.timeZone", "UTC")
            .config("spark.ui.enabled", "false")
        )
        # the heap preflight's remediation knob: SQL confs stay vanilla
        # (that's what the driver-mimicry is FOR), only the JVM heap
        # grows — correctness semantics never depend on heap size
        if os.environ.get("SELFCHECK_DRIVER_MEM"):
            builder = builder.config(
                "spark.driver.memory", os.environ["SELFCHECK_DRIVER_MEM"]
            )
        spark = builder.getOrCreate()
    qs, os_ = e.queries(), e.oracle_sql()

    # Vanilla-session heap preflight (VERDICT r12 task 3, measured):
    # a stock 1 GiB driver running local[32] has ~12 MB of unified
    # memory per concurrent task — the sf0.1 sweep kills the JVM with
    # a raw OutOfMemoryError (first in the fact-cache build, and after
    # the cache-if-fits gate shaved that, in plain 32-wide execution).
    # Fail FAST with the remediation instead of dying 40 minutes in.
    # The driver-gate shape (sf0.01, ~2 MB of parquet) passes untouched.
    try:
        heap = (
            spark.sparkContext._jvm.java.lang.Runtime.getRuntime()
            .maxMemory()
        )
        sf_bytes = sum(
            os.path.getsize(os.path.join(sf_dir, f))
            for f in os.listdir(sf_dir)
            if f.endswith(".parquet")
        )
    except Exception:
        heap, sf_bytes = None, 0
    if (
        heap is not None
        and heap < 4 * 1024**3
        and sf_bytes > 8 * 1024**2
        and not os.environ.get("SELFCHECK_FORCE")
    ):
        print(
            f"PREFLIGHT: driver heap {heap / 1024**3:.1f} GiB is below the"
            f" 4 GiB floor for a {sf_bytes / 1024**2:.0f} MB dataset sweep"
            " (local-mode execution and caches share one heap; measured:"
            " OutOfMemoryError at sf0.1 under 1 GiB x local[32])."
            " Re-run with SELFCHECK_TUNED=1 (16 GiB tuned session), set"
            " spark.driver.memory >= 4g, or SELFCHECK_FORCE=1 to attempt"
            " anyway.",
            flush=True,
        )
        sys.exit(2)

    # Untimed session warm-up so per-entry timings measure the ENTRY,
    # not first-use session costs (JVM JIT, Janino codegen, Python
    # worker spawn for Arrow stages, parquet writer init). Recorded as
    # warmup_sec in the JSON — visible, never hidden in an entry.
    t0 = time.monotonic()
    try:
        import shutil
        import tempfile

        from pyspark.sql import functions as F

        from gigapipe_spark.sources.ingest import loki_push
        from gigapipe_spark.storage.writer import Catalog, ingest_fanout

        wroot = os.path.join(tempfile.gettempdir(), "selfcheck_warmup")
        shutil.rmtree(wroot, ignore_errors=True)
        payload = (
            '{"streams":[{"stream":{"app":"w"},'
            '"values":[["1700000000000000000","x"]]}]}'
        )
        ingest_fanout(
            loki_push(spark.createDataFrame([(payload,)], "payload string")),
            Catalog(wroot),
        )
        spark.createDataFrame([(1,)], "a long").select(
            F.pandas_udf(lambda s: s, "long")("a")
        ).collect()
        shutil.rmtree(wroot, ignore_errors=True)
        # Derived observability views model STORED tables (a deployment
        # reads them from parquet; deriving them from the star schema is
        # fixture plumbing) — build them untimed, same policy as
        # bench.py's warmup. Runs at the TARGET sf so the caches the
        # entries share are actually warm.
        from gigapipe_spark.sources import views

        views.time_series_gin(spark, sf_dir).count()
        views.spans(spark, sf_dir).count()
        views.span_attrs(spark, sf_dir).count()
        views.span_ancestors(spark, sf_dir).count()
        views.span_attr_map(spark, sf_dir).count()
        views.rollup_15s(spark, sf_dir).count()
        # The shared rule-entry base store is a push FIXTURE (see
        # registry._rule_base_store) — build it untimed so the two
        # store_roundtrip rule entries time their actual work (rule
        # evaluation + writeback + read), not the shared fixture push.
        from gigapipe_spark import registry as _registry

        _registry._rule_base_store(spark)
        # JIT/codegen warm for the historically slow cold entries: one
        # run at the smallest SF (computes nothing reusable at sf_dir —
        # the view caches are keyed per sf directory; store entries are
        # warmed only through code paths already exercised above)
        warm_sf = "/root/testdata/sf0.001"
        if os.path.isdir(warm_sf) and warm_sf != sf_dir:
            for wname in (
                "curate_corpus",
                "traceql_ancestor",
                "sim_ann_pq",
                "traceql_metrics_exemplars",
                "promql_vector_matching_ratio",
            ):
                if wname in qs:
                    try:
                        qs[wname](spark, warm_sf).count()
                    except Exception:
                        traceback.print_exc(limit=1)
    except Exception:
        traceback.print_exc(limit=2)
    warmup_sec = round(time.monotonic() - t0, 2)
    print(f"warmup {warmup_sec}s", flush=True)

    fails = []
    results = {}
    for name in sorted(qs):
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            df = qs[name](spark, sf_dir)
            if name in os_:
                ok, msg = compare(df, os_[name], sf_dir)
            else:
                n = df.count()
                ok, msg = n >= 0, f"rows-only ({n} rows)"
        except Exception:
            ok, msg = False, traceback.format_exc(limit=3).replace("\n", " | ")
        dt = round(time.monotonic() - t0, 2)
        status = "PASS" if ok else "FAIL"
        results[name] = {"ok": ok, "oracle": name in os_, "sec": dt, "msg": msg}
        print(f"{status} {name} [{dt}s] {msg}", flush=True)
        if not ok:
            fails.append(name)
    out_path = os.environ.get("SELFCHECK_JSON")
    if out_path:
        import json

        with open(out_path, "w") as f:
            json.dump(
                {"sf_dir": sf_dir, "total": len(results),
                 "warmup_sec": warmup_sec,
                 "failures": fails, "results": results},
                f, indent=1,
            )
    print(f"\n{len(fails)} failures: {fails}")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
