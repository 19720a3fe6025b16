"""Per-query profiling helper for optimization rounds.

Usage:
  python scripts/profile_query.py <query> [reps] [--plan] [--noop]

Times N warm executions of one registry entry at $SPARK_GRAFT_SF_DIR
(default sf0.1) after one untimed cold run, printing each rep and the
min/p50. --plan dumps .explain('formatted'). --noop times a noop-sink
write instead of .count() (guide §1.4) so column pruning can't shrink
the measured work.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = {a for a in sys.argv[1:] if a.startswith("--")}
    name = args[0]
    reps = int(args[1]) if len(args) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from gigapipe_spark.session import get_spark
    from gigapipe_spark import registry

    spark = get_spark("profile_query")
    qs = registry.queries()
    fn = qs[name]

    if "--plan" in flags:
        df = fn(spark, sf_dir)
        print(df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        ))
        return

    def run_once() -> float:
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.monotonic()
        df = fn(spark, sf_dir)
        if "--noop" in flags:
            df.write.format("noop").mode("overwrite").save()
        else:
            df.count()
        return time.monotonic() - t0

    cold = run_once()
    print(f"# {name} cold: {cold:.3f}s", file=sys.stderr)
    runs = sorted(run_once() for _ in range(reps))
    print(
        f"{name}: min {runs[0]:.3f}  p50 {runs[len(runs) // 2]:.3f}  "
        f"reps {[round(r, 3) for r in runs]}"
    )


if __name__ == "__main__":
    main()
