"""Storage-memory instrumentation for the in-bench datapipe regression
(VERDICT r15 task 1): replays bench.py's exact query sequence (same
warmups, same cold-then-3-warm methodology) and, after every entry,
records the JVM block-manager state — number of cached RDDs, cached
bytes in memory/disk, and the storage pool's remaining memory — via
SparkContext.getRDDStorageInfo / getExecutorMemoryStatus.

Run it twice for the A/B:
  python scripts/cacheprobe.py                      # arm A: stock
  GIGAPIPE_NO_METRIC_SAMPLES_CACHE=1 \
  python scripts/cacheprobe.py                      # arm B: no samples cache

If the r14 regression mechanism were storage-memory eviction, arm A
would show the datapipe entries' persisted subtrees being dropped
(cached-bytes shrinking between their runs) and arm B would restore
the r13 timings. bench.py itself is untouched — this is a probe.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _storage(spark) -> dict:
    jsc = spark.sparkContext._jsc.sc()
    infos = jsc.getRDDStorageInfo()
    mem = sum(i.memSize() for i in infos)
    disk = sum(i.diskSize() for i in infos)
    n = len(infos)
    # local mode: single block manager; remaining storage memory
    stat = jsc.getExecutorMemoryStatus()
    it = stat.iterator()
    max_mem = rem = 0
    while it.hasNext():
        kv = it.next()
        max_mem += kv._2()._1()
        rem += kv._2()._2()
    return {
        "cached_rdds": n,
        "cached_mem_mb": round(mem / 1048576, 1),
        "cached_disk_mb": round(disk / 1048576, 1),
        "storage_max_mb": round(max_mem / 1048576, 1),
        "storage_free_mb": round(rem / 1048576, 1),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from gigapipe_spark.session import get_spark
    from gigapipe_spark import registry
    from gigapipe_spark.sources import views
    from bench import BENCH_QUERIES

    spark = get_spark("cacheprobe")
    spark.read.parquet(f"{sf_dir}/events.parquet").count()
    views.time_series_gin(spark, sf_dir).count()
    views.spans(spark, sf_dir).count()
    views.span_attrs(spark, sf_dir).count()
    views.span_ancestors(spark, sf_dir).count()
    views.span_attr_map(spark, sf_dir).count()
    views.attr_stats(spark, sf_dir)
    views.rollup_15s(spark, sf_dir).count()
    qs = registry.queries()
    warm_dir = os.environ.get("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    if os.path.isdir(warm_dir) and warm_dir != sf_dir:
        for name in BENCH_QUERIES:
            if name in qs:
                try:
                    qs[name](spark, warm_dir).count()
                except Exception:
                    pass
    mixed_warm = "/root/testdata/sf0.01"
    if os.path.isdir(mixed_warm) and mixed_warm != sf_dir:
        try:
            qs["patterns_mine"](spark, mixed_warm).count()
        except Exception:
            pass

    arm = "B:no-samples-cache" if os.environ.get(
        "GIGAPIPE_NO_METRIC_SAMPLES_CACHE"
    ) else "A:stock"
    out = {"arm": arm, "entries": {}}
    for name in BENCH_QUERIES:
        if name not in qs:
            continue
        t0 = time.monotonic()
        qs[name](spark, sf_dir).count()
        cold = round(time.monotonic() - t0, 3)
        runs = []
        for _ in range(3):
            t0 = time.monotonic()
            qs[name](spark, sf_dir).count()
            runs.append(time.monotonic() - t0)
        runs.sort()
        st = _storage(spark)
        out["entries"][name] = {
            "cold": cold,
            "warm_p50": round(runs[1], 3),
            "warm_min": round(runs[0], 3),
            **st,
        }
        print(
            f"# {name}: cold {cold} warm_p50 {runs[1]:.3f} "
            f"cached {st['cached_rdds']} rdds "
            f"{st['cached_mem_mb']}MB mem / {st['cached_disk_mb']}MB disk, "
            f"storage free {st['storage_free_mb']}/{st['storage_max_mb']}MB",
            file=sys.stderr,
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
