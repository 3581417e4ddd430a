"""Streaming drift monitor: PSI over an events stream, exactly once.

The batch `events_psi_drift` query splits into an additive counting pass
and a bounded report (operators/drift.py). This module runs the counting
pass per micro-batch and folds it into the standing counts table through
`aggregating_sink` — the same batchId-replay-guarded, atomic-snapshot
machinery as every other sink here — so the monitor's state after any
drain equals the batch-built counts bit for bit, replays are no-ops, and
the PSI report can be served at ANY time from the standing table without
touching the event history. The per-batch work is one map-side-combined
aggregation over the batch plus a (types × 2 × 10)-sized merge; state
never grows with events, only with the bounded key space.

Reference scope: EXT (the reference is batch-only); parity with the batch
query is pinned in tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.drift import psi_binned_counts, psi_report
from .sinks import aggregating_sink, read_table

PSI_KEYS = ["event_type", "phase", "bucket"]


def psi_monitor_sink(target: str):
    """``foreachBatch`` body: bin + count the batch, merge additively into
    the standing counts table at ``target``."""
    merge = aggregating_sink(target, PSI_KEYS, ["c"])

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        merge(psi_binned_counts(batch_df), batch_id)

    return write_batch


def psi_report_from_store(spark: SparkSession, target: str) -> DataFrame | None:
    """The PSI report served from the monitor's standing counts table —
    or None before the first commit. Runs entirely on the bounded
    (types × 2 × 10) relation; the event history is never re-read."""
    counts = read_table(spark, target)
    if counts is None:
        return None
    return psi_report(counts.select(*PSI_KEYS, "c"))


# --- streamed OHLC bars ------------------------------------------------------

OHLC_KEYS = ["event_type", "bucket_hour"]


def _ohlc_order_key():
    # the batch query's exact tie-safe composite (unix_micros * 1e10 +
    # event_id as decimal(38,0)) — streamed argmin/argmax must break ties
    # identically or the parity pin below would flap on tied timestamps
    from pyspark.sql import functions as F

    return (
        F.unix_micros(F.col("ts")).cast("decimal(38,0)")
        * F.lit(10_000_000_000).cast("decimal(38,0)")
        + F.col("event_id")
    )


def ohlc_partials(events: DataFrame) -> DataFrame:
    """Per-batch mergeable OHLC partials: open/close travel as
    (order_key, value) structs whose lexicographic min/max IS
    min_by/max_by, so per-batch partials fold exactly under
    ``mergeable_sink`` regardless of how arrival slices the data."""
    from pyspark.sql import functions as F

    k = _ohlc_order_key()
    return events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("bucket_hour")
    ).agg(
        F.min(F.struct(k.alias("k"), F.col("value").alias("v"))).alias("open_s"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(F.struct(k.alias("k"), F.col("value").alias("v"))).alias("close_s"),
        F.count(F.lit(1)).alias("n_events"),
    )


def ohlc_monitor_sink(target: str):
    """``foreachBatch`` body: fold the batch's OHLC partials into the
    standing bars table — min/max/struct-argmin merges, exactly once."""
    from .sinks import mergeable_sink

    merge = mergeable_sink(
        target,
        OHLC_KEYS,
        {"open_s": "min", "high": "max", "low": "min",
         "close_s": "max", "n_events": "sum"},
    )

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        merge(ohlc_partials(batch_df), batch_id)

    return write_batch


def ohlc_report_from_store(spark: SparkSession, target: str) -> DataFrame | None:
    """The OHLC bars served from the monitor's standing table (or None
    before the first commit) — same shape and ordering as the batch
    ``events_ohlc_hourly`` registry query."""
    from pyspark.sql import functions as F

    from .sinks import read_table

    bars = read_table(spark, target)
    if bars is None:
        return None
    return bars.select(
        "event_type",
        "bucket_hour",
        F.col("open_s.v").alias("open"),
        "high",
        "low",
        F.col("close_s.v").alias("close"),
        "n_events",
    ).orderBy("event_type", "bucket_hour")


# --- streamed heavy hitters --------------------------------------------------

# Misra-Gries summaries are MERGEABLE (Agarwal, Cormode, Huang, Phillips,
# Wei, Yi — "Mergeable Summaries", PODS 2012): merging two capacity-c
# summaries by summing counts and re-pruning preserves the N/(c+1) error
# bound for the COMBINED stream. That makes streamed vocabulary statistics
# possible without ever storing the vocabulary: per micro-batch one bounded
# summary pass, then a driver-side merge into the standing <= capacity-row
# summary — state never grows with tokens OR with distinct terms. The prune
# step (subtract the (capacity+1)-th largest, drop non-positives) is not a
# commutative column-wise fold, so this sink cannot ride mergeable_sink; it
# carries the same pointer/commit exactly-once protocol directly.


def heavy_hitters_monitor_sink(
    target: str, term_col: str = "term", capacity: int = 512
):
    """``foreachBatch`` body maintaining a streamed Misra-Gries summary.

    Per batch: one bounded summary pass over the batch's tokens
    (``operators/frequent.py``'s mapInPandas phase — output and collect
    are <= partitions x (capacity+1) rows by construction), then the
    mergeable-summaries fold into the standing summary on the driver.
    The standing table after ANY drain certifies, for N_total tokens seen:
    every term with true count > N_total/(capacity+1) is present, and
    every present term's count is an underestimate by at most
    N_total/(capacity+1). Exactly-once via the shared batchId replay
    guard + snapshot-then-pointer-swap commit.
    """
    import json as _json

    import pandas as _pd
    from pyspark.sql import functions as F

    from ..operators.frequent import _mg_prune, _mg_summarize
    from .sinks import _commit, _read_pointer, _validate_local_target

    target = _validate_local_target(target, "heavy_hitters_monitor_sink")
    if capacity < 1:
        raise ValueError(
            f"heavy_hitters_monitor_sink: capacity must be >= 1, got {capacity}"
        )

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        import os as _os

        spark = batch_df.sparkSession
        version, last_batch = _read_pointer(target)
        if batch_id <= last_batch:
            return  # replayed batch — already committed
        rows = (
            batch_df.select(F.col(term_col).alias("term"))
            .mapInPandas(
                _mg_summarize("term", capacity),
                schema="term string, mg_count long",
            )
            .collect()
        )  # bounded: <= partitions x (capacity + 1) rows
        counts: dict[str, int] = {}
        meta = {"capacity": capacity, "n_total": 0}
        if version > 0:
            with open(
                _os.path.join(target, f"_hh_meta.v{version}.json"),
                encoding="utf-8",
            ) as f:
                meta = _json.load(f)
            if meta["capacity"] != capacity:
                # a capacity change silently rescales the error bound the
                # standing counts were pruned under — refuse, like the
                # bucket-count and PQ-shape guards
                raise ValueError(
                    f"heavy_hitters_monitor_sink: table at {target!r} was "
                    f"built with capacity={meta['capacity']}, sink "
                    f"configured with {capacity}; rebuild or match it"
                )
            standing = spark.read.parquet(
                _os.path.join(target, f"v={version}")
            ).collect()  # <= capacity rows
            counts = {r.term: r.mg_count for r in standing}
        n_batch = 0
        n_terms = 0
        for r in rows:
            if r.term is None:
                n_batch += r.mg_count  # the phase-1 sentinel: raw token count
            else:
                n_terms += 1
                counts[r.term] = counts.get(r.term, 0) + r.mg_count
        if n_batch == 0 and n_terms == 0:
            # empty batch: advance the replay guard on the SAME version —
            # no new snapshot, no new meta (the _bucketed_batch_write rule;
            # review r12: an idle source with periodic triggers would
            # otherwise accumulate identical version dirs without bound)
            _commit(target, version, batch_id)
            return
        counts = _mg_prune(counts, capacity)
        meta["n_total"] = int(meta["n_total"]) + int(n_batch)
        new_version = version + 1
        pdf = _pd.DataFrame(
            {"term": list(counts.keys()),
             "mg_count": _pd.Series(list(counts.values()), dtype="int64")}
        )
        spark.createDataFrame(
            pdf, schema="term string, mg_count long"
        ).coalesce(1).write.mode("overwrite").parquet(
            _os.path.join(target, f"v={new_version}")
        )
        with open(
            _os.path.join(target, f"_hh_meta.v{new_version}.json"),
            "w",
            encoding="utf-8",
        ) as f:
            _json.dump(meta, f)
        _commit(target, new_version, batch_id)

    return write_batch


def heavy_hitters_report_from_store(
    spark: SparkSession, target: str, k: int | None = None
) -> DataFrame | None:
    """The streamed summary served from the standing table (or None before
    the first commit): (term, mg_count, n_total, err_bound) ordered by
    mg_count desc, term asc. The certificate: true count is in
    [mg_count, mg_count + err_bound], and every term whose true count
    exceeds err_bound appears."""
    import json as _json
    import os as _os

    from pyspark.sql import functions as F

    from .sinks import _read_pointer

    version, _ = _read_pointer(target)
    if version == 0:
        return None
    with open(
        _os.path.join(target, f"_hh_meta.v{version}.json"), encoding="utf-8"
    ) as f:
        meta = _json.load(f)
    err = int(meta["n_total"]) // (int(meta["capacity"]) + 1)
    out = (
        spark.read.parquet(_os.path.join(target, f"v={version}"))
        .select(
            "term",
            "mg_count",
            F.lit(int(meta["n_total"])).alias("n_total"),
            F.lit(err).alias("err_bound"),
        )
        .orderBy(F.desc("mg_count"), F.asc("term"))
    )
    return out.limit(k) if k is not None else out
