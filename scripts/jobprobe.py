"""Per-job decomposition of one registry entry's warm execution.

Usage:
  python scripts/jobprobe.py <query> [reps]

Runs the entry cold once (untimed), then `reps` warm executions, and
prints every Spark job the warm runs submitted — duration, stage count,
task count, description — via the local UI's REST API (guide §1/§7.1:
decide whether an entry is compute-bound or job-count-bound before
touching it). No timing methodology change: this is a development
probe, bench.py is untouched.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _api(base: str, path: str):
    with urllib.request.urlopen(base + path) as r:
        return json.load(r)


def main() -> None:
    name = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from gigapipe_spark.session import get_spark
    from gigapipe_spark import registry
    from pyspark.sql import SparkSession

    # the engine session runs UI-less; the probe needs the REST API
    SparkSession.builder.config("spark.ui.enabled", "true")
    spark = get_spark("jobprobe")
    if spark.sparkContext.uiWebUrl is None:
        spark.stop()
        spark = (
            SparkSession.builder.master(
                f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
            )
            .config("spark.ui.enabled", "true")
            .config("spark.driver.memory", "16g")
            .config("spark.sql.legacy.parquet.nanosAsLong", "true")
            .config("spark.sql.session.timeZone", "UTC")
            .getOrCreate()
        )
        from gigapipe_spark.session import ensure_engine_confs

        ensure_engine_confs(spark)
    qs = registry.queries()
    fn = qs[name]

    # cold (untimed)
    fn(spark, sf_dir).count()

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    base = f"{ui}/api/v1/applications/{app_id}"

    first_job_after = max(
        (j["jobId"] for j in _api(base, "/jobs")), default=-1
    )
    t0 = time.monotonic()
    for _ in range(reps):
        spark.sparkContext.setJobDescription(f"jobprobe:{name}")
        fn(spark, sf_dir).count()
    wall = time.monotonic() - t0
    print(f"# {name}: {reps} warm runs, wall {wall:.3f}s "
          f"({wall / reps:.3f}s/run)")

    jobs = [j for j in _api(base, "/jobs") if j["jobId"] > first_job_after]
    jobs.sort(key=lambda j: j["jobId"])
    total_ms = 0.0
    for j in jobs:
        from datetime import datetime

        fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
        sub = datetime.strptime(j["submissionTime"], fmt)
        comp = datetime.strptime(j["completionTime"], fmt)
        dur = (comp - sub).total_seconds() * 1000
        total_ms += dur
        names = []
        for sid in sorted(j["stageIds"]):
            try:
                st = _api(base, f"/stages/{sid}")
                names.append(
                    st[0]["name"].split("\n")[0][:46]
                    + f"[{st[0]['numTasks']}t,{st[0].get('executorRunTime', 0)}ms]"
                )
            except Exception:
                names.append(f"stage{sid}")
        print(
            f"job {j['jobId']:4d}  {dur:8.0f}ms  stages={len(j['stageIds'])}"
            f" tasks={j['numTasks']:4d}  {' | '.join(names)}"
        )
    print(f"# {len(jobs)} jobs, {len(jobs) / reps:.1f}/run, "
          f"sum job time {total_ms / 1000:.3f}s "
          f"(gap/overhead {wall - total_ms / 1000:.3f}s)")


if __name__ == "__main__":
    main()
