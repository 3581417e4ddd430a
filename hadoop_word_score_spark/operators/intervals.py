"""Interval analytics: sweep-line concurrency profiling.

"How many sessions/jobs/streams were active at once, per hour?" is the
classic interval question, and the classic serial answer — sort all
boundary events, running-sum +1/-1 — hides a global prefix sum. The
distributed decomposition used here is the textbook two-level scan:

  - FINE: bucket boundary events by time bucket; within each bucket the
    running sum is a bucket-partitioned window (parallel across buckets,
    no global order anywhere near the data);
  - COARSE: per-bucket net deltas form a relation whose cardinality is
    bounded by the TIME RANGE, not the data (8,760 hourly buckets per
    year) — its cumulative sum (the carry-in each bucket inherits) runs
    on that bounded relation, the same bounded-small-state class as the
    k×d centroid collect in clustering.py.

  max concurrency in a bucket = max(carry_in, carry_in + max running).

Boundary semantics are END-EXCLUSIVE: an interval [s, e) stops counting
at e, so at a timestamp where one interval ends and another starts they
do NOT overlap — encoded by ordering ends (-1) before starts (+1) at
equal timestamps. Ties beyond (ts, delta) need no break: within a run of
equal (ts, delta) rows every delta is identical, so the set of prefix
values — and therefore the max — is order-invariant.

Reference scope: hadoop-word-score has no time semantics at all; EXT
coverage for the events surface (capacity planning / concurrency SLO
reporting over the same sessionization the funnel queries use).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def concurrency_profile(
    intervals: DataFrame,
    start_col: str = "start_s",
    end_col: str = "end_s",
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Per-bucket max concurrency over end-exclusive integer-second
    intervals. Returns (bucket_start_s, n_starts, n_ends,
    max_concurrency) ordered by bucket, one row per bucket containing at
    least one interval boundary (a bucket fully inside a long interval
    emits no row; its concurrency is the surrounding carry level —
    densify against a bucket axis downstream if a gapless series is
    needed, the events_gapfill_hourly pattern).
    """
    deltas = intervals.select(
        F.col(start_col).cast("long").alias("ts"), F.lit(1).alias("delta")
    ).unionAll(
        intervals.select(
            F.col(end_col).cast("long").alias("ts"), F.lit(-1).alias("delta")
        )
    )
    # floor-division bucketing: ts - ts % b is NOT a floor for negative
    # timestamps (Spark % keeps the dividend sign, so pre-1970 boundaries
    # would land one bucket late); floor(ts / b) * b is correct on both
    # sides of zero and exact for |ts| < 2^53
    b = F.lit(bucket_seconds)
    deltas = deltas.withColumn(
        "bucket", (F.floor(F.col("ts") / b) * b).cast("long")
    )
    fine = Window.partitionBy("bucket").orderBy("ts", "delta").rowsBetween(
        Window.unboundedPreceding, 0
    )
    per_row = deltas.withColumn("run", F.sum("delta").over(fine))
    per_bucket = per_row.groupBy("bucket").agg(
        F.sum("delta").alias("tot"),
        F.max("run").alias("mx_rel"),
        F.sum(F.when(F.col("delta") == 1, 1).otherwise(0)).alias("n_starts"),
        F.sum(F.when(F.col("delta") == -1, 1).otherwise(0)).alias("n_ends"),
    )
    # COARSE cumulative over the bounded bucket relation (module docstring)
    coarse = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    return (
        per_bucket.withColumn(
            "carry_in", F.coalesce(F.sum("tot").over(coarse), F.lit(0))
        )
        .select(
            F.col("bucket").alias("bucket_start_s"),
            F.col("n_starts").cast("long").alias("n_starts"),
            F.col("n_ends").cast("long").alias("n_ends"),
            F.greatest(
                F.col("carry_in"), F.col("carry_in") + F.col("mx_rel")
            )
            .cast("long")
            .alias("max_concurrency"),
        )
        .orderBy("bucket_start_s")
    )
