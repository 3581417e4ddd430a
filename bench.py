#!/usr/bin/env python
"""Benchmark harness — the driver's per-round feedback loop.

Runs every ``bench=True`` query from the registry at
``$SPARK_GRAFT_SF_DIR`` (default ``/root/testdata/sf0.1``) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": 0.1}

Each query is timed end-to-end: plan construction + execution to a
driver-side count via ``df.write.format("noop")`` — a full materialization
of every row (like the reference writing its output file, CWS:215-216)
without paying local-disk write costs that wouldn't exist on a cluster.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from hadoop_word_score_spark.plans.queries import REGISTRY  # noqa: E402
from hadoop_word_score_spark.session import get_spark  # noqa: E402
from hadoop_word_score_spark.sources.registry import TABLES, load_table  # noqa: E402


def sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.removeprefix("sf"))
    except ValueError:
        return 0.0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench")

    names = [n for n, s in REGISTRY.items() if s.bench]
    timings: dict[str, float] = {}

    # Warm the JVM, parquet footer caches, and the Python worker pool once so
    # per-query numbers measure the operators, not session cold-start (the
    # worker pool alone is ~3s and is paid once per executor lifetime).
    REGISTRY[names[0]].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    spark.range(8).select(
        F.pandas_udf(lambda s: s + 1, "long")(F.col("id"))
    ).write.format("noop").mode("overwrite").save()
    # One cheap scan per table: parquet footers + OS page cache are per-file
    # one-time costs (a long-lived cluster pays them once, not per query);
    # without this the first query to touch each table absorbs them all.
    for t in sorted(TABLES):
        load_table(spark, sf_dir, t).write.format("noop").mode("overwrite").save()

    # Three passes per query, report the min. The first execution of any plan
    # pays one-time costs — Catalyst planning, whole-stage-codegen janino
    # compilation, Arrow-worker stage spin-up — measured at ~2-3s/query
    # against ~1s steady-state on this dataset. Those are per-plan-lifetime
    # costs a real cluster amortizes over the job; the min isolates the
    # operator's steady-state execution, the quantity that scales with data.
    # The cold total is still reported for transparency.
    #
    # Noise robustness (round-3 lesson: min-of-2 on a busy box published a
    # phantom 22% regression): min-of-3 baseline, then a targeted re-run for
    # any query whose warm passes disagree by >1.5x — a contamination signal
    # that fires equally for fast and slow queries. Deliberately NOT
    # re-running on "slower than last round" (r4 advice): that trigger
    # granted extra min draws only to regressed-looking queries, letting a
    # real regression min-shop itself away. Regressions vs the previous
    # round are instead REPORTED (vs_prev_regressions) and the warm median
    # is published beside the min, so a lucky minimum can't hide a shifted
    # steady state. Re-run counts are reported so a noisy run is visible in
    # the artifact instead of silently shaping the totals.
    def run_once(name: str) -> float:
        t0 = time.perf_counter()
        REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    cold: dict[str, float] = {}
    trials: dict[str, list[float]] = {n: [] for n in names}
    for pass_no in range(3):
        for name in names:
            dt = run_once(name)
            if pass_no == 0:
                cold[name] = dt
            trials[name].append(dt)
    timings = {n: min(ts) for n, ts in trials.items()}

    reruns: dict[str, int] = {}
    for name in names:
        for _ in range(2):  # at most 2 extra trials per suspicious query
            # Spread over the TWO FASTEST warm trials: one contaminated
            # outlier doesn't poison the signal forever (max/min over all
            # trials is monotonically non-decreasing, so re-runs could
            # never clear it) — two independent fast runs agreeing is the
            # "steady state reached" witness.
            w1, w2 = sorted(trials[name][1:])[:2]
            if not (w1 > 0 and w2 / w1 > 1.5):
                break
            dt = run_once(name)
            trials[name].append(dt)
            reruns[name] = reruns.get(name, 0) + 1
            timings[name] = min(timings[name], dt)

    # Streaming smoke (one row): a watermarked tumbling-window drain through
    # the REAL streaming path — file source → state store → noop sink,
    # Trigger.AvailableNow. The batch bench can never see a regression in
    # the streaming state machinery; this row does. Two drains with fresh
    # checkpoints, min reported (same steady-state rationale as above).
    timings["streaming_tumbling_drain"] = _streaming_smoke(spark, sf_dir)
    trials["streaming_tumbling_drain"] = [timings["streaming_tumbling_drain"]]
    names.append("streaming_tumbling_drain")

    # Dedup-on-ingest (one row): the sf documents corpus arriving in two
    # batches through streaming/ingest.py's foreachBatch body — batch 1
    # signs only itself and probes batch 0 through its PERSISTED band index
    # (the corpus-never-re-signed path), so this row times the real
    # incremental-ingest cost, not a batch re-cluster.
    timings["streaming_ingest_drain"] = _ingest_smoke(spark, sf_dir)
    trials["streaming_ingest_drain"] = [timings["streaming_ingest_drain"]]
    names.append("streaming_ingest_drain")

    import statistics

    warm_median = {
        n: round(statistics.median(ts[1:] or ts), 3) for n, ts in trials.items()
    }
    prev = _previous_round_timings(sf_of(sf_dir))
    regressions = {
        n: round(timings[n] / prev[n], 2)
        for n in names
        if prev.get(n, 0) > 0 and timings[n] > 1.5 * prev[n]
    }

    # Membership fingerprint (r5 advice): the headline total is only
    # comparable across rounds when the bench SET is unchanged; recording
    # the sorted membership + a short hash lets any cross-round comparison
    # detect that the denominator moved instead of misreading a grown set
    # as a regression (r5's total grew 5.2s purely from 3 added rows).
    import hashlib

    member_hash = hashlib.md5("|".join(sorted(names)).encode()).hexdigest()[:12]

    out = {
        "metric": "bench_total_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "warm_median_queries": warm_median,
        "warm_median_total_sec": round(sum(warm_median.values()), 3),
        "cold_total_sec": round(sum(cold.values()), 3),
        "bench_set": sorted(names),
        "bench_set_hash": member_hash,
        "sf": sf_of(sf_dir),
    }
    if reruns:
        out["noise_reruns"] = reruns
    if regressions:
        out["vs_prev_regressions"] = regressions
    print(json.dumps(out))
    spark.stop()


def _streaming_smoke(spark, sf_dir: str) -> float:
    """Min-of-2 wall time to drain the sf events through the streaming path.

    Each drain uses a FRESH checkpoint dir — a reused one would make the
    second run an incremental no-op and time nothing. The events table is
    re-encoded to µs once (the streaming file source can't read
    TIMESTAMP(NANOS) legacy testdata, mirroring tests/test_streaming.py).
    """
    import shutil

    from hadoop_word_score_spark.streaming.windows import (
        read_events_stream,
        tumbling_counts_stream,
    )

    scratch = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".scratch", "bench_stream"
    )
    src = os.path.join(scratch, "events_us")
    shutil.rmtree(scratch, ignore_errors=True)
    load_table(spark, sf_dir, "events").write.mode("overwrite").parquet(src)
    # Stateful streams pay per state-store instance (one per shuffle
    # partition): at this state size the batch default of 64 spends 3.5s on
    # store commits for a 1s drain (measured 64→16→8: 3.52/1.39/1.06s).
    # Sizing state partitions to state volume — not scan width — is the
    # production guidance for streaming jobs; 16 keeps headroom for the
    # window-key cardinality at larger SFs.
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    try:
        best = None
        for i in range(2):
            ckpt = os.path.join(scratch, f"ckpt{i}")
            t0 = time.perf_counter()
            q = (
                tumbling_counts_stream(read_events_stream(spark, src))
                .writeStream.format("noop")
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            dt = round(time.perf_counter() - t0, 3)
            best = dt if best is None else min(best, dt)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        shutil.rmtree(scratch, ignore_errors=True)
    return best


def _ingest_smoke(spark, sf_dir: str) -> float:
    """Min-of-2 wall time to ingest the sf documents in two arrival batches
    through the dedup-on-ingest sink. Fresh target per trial — a reused one
    would replay-skip both batches and time nothing. Timed per trial:
    2 × (sign batch + within-batch LSH pairs) + 1 × (persisted-index probe
    + verify join) + 2 snapshot commits."""
    import shutil

    from hadoop_word_score_spark.streaming.ingest import dedup_ingest_sink

    scratch = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".scratch", "bench_ingest"
    )
    shutil.rmtree(scratch, ignore_errors=True)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    mid = docs.count() // 2  # testdata doc_ids are contiguous from 0
    b0 = docs.filter(F.col("doc_id") < mid)
    b1 = docs.filter(F.col("doc_id") >= mid)
    try:
        best = None
        for i in range(2):
            target = os.path.join(scratch, f"t{i}")
            t0 = time.perf_counter()
            sink = dedup_ingest_sink(target)
            sink(b0, 0)
            sink(b1, 1)
            dt = round(time.perf_counter() - t0, 3)
            best = dt if best is None else min(best, dt)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    return best


def _previous_round_timings(sf: float) -> dict[str, float]:
    """Per-query timings from the latest BENCH_r*.json at the SAME scale
    factor (else {} — comparing across SFs would mislabel every query as a
    regression or mask real ones)."""
    import glob

    here = os.path.dirname(os.path.abspath(__file__))
    files = sorted(glob.glob(os.path.join(here, "BENCH_r*.json")))
    if not files:
        return {}
    try:
        with open(files[-1]) as f:
            rec = json.load(f)
        # The driver's artifact wraps bench's own JSON line under "parsed";
        # unwrap it (and stay compatible with a raw bench.py capture).
        rec = rec.get("parsed", rec) or {}
        if rec.get("sf") != sf:
            return {}
        return {k: float(v) for k, v in rec.get("queries", {}).items()}
    except Exception:
        return {}


if __name__ == "__main__":
    main()
