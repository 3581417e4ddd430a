"""Streaming-mode tests (SURVEY §2.9 T4-T5): batch/stream parity + stateful dedup.

DuckDB can't oracle a stream; the check is Spark-vs-Spark — the streaming
plan drained with Trigger.AvailableNow must equal the batch plan over the same
files (they share the window expressions by construction).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def events_stream_dir(spark, tmp_path_factory):
    # Re-encode the nanos parquet as microsecond timestamps into repo-local
    # scratch: the streaming file source chokes on TIMESTAMP(NANOS) too.
    from hadoop_word_score_spark.sources.registry import load_table
    from tests.conftest import SCRATCH

    out = os.path.join(SCRATCH, "events_us")
    os.makedirs(SCRATCH, exist_ok=True)
    load_table(spark, SF_SMOKE, "events").write.mode("overwrite").parquet(out)
    return out


def test_tumbling_stream_equals_batch(spark, events_stream_dir, scratch_dir):
    from hadoop_word_score_spark.streaming.windows import (
        read_events_stream,
        run_available_now,
        tumbling_counts_stream,
    )

    stream = tumbling_counts_stream(read_events_stream(spark, events_stream_dir))
    got = run_available_now(
        stream, os.path.join(scratch_dir, "ckpt_tumble"), "tumble_out"
    )
    batch = (
        spark.read.parquet(events_stream_dir)
        .groupBy(F.window("ts", "10 minutes"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("window.start").alias("w_start"),
            F.col("window.end").alias("w_end"),
            "event_type", "n_events", "sum_value",
        )
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, batch.collect()))


def test_session_stream_runs(spark, events_stream_dir, scratch_dir):
    from hadoop_word_score_spark.streaming.windows import (
        read_events_stream,
        run_available_now,
        session_stream,
    )

    got = run_available_now(
        session_stream(read_events_stream(spark, events_stream_dir)),
        os.path.join(scratch_dir, "ckpt_sess"),
        "sess_out",
    )
    batch_sessions = (
        spark.read.parquet(events_stream_dir)
        .groupBy("user_id", F.session_window("ts", "5 minutes"))
        .count()
        .count()
    )
    assert got.count() == batch_sessions


def test_dedup_stream_bounded_state(spark, events_stream_dir, scratch_dir):
    from hadoop_word_score_spark.streaming.windows import (
        dedup_stream,
        read_events_stream,
        run_available_now,
    )

    got = run_available_now(
        dedup_stream(read_events_stream(spark, events_stream_dir)),
        os.path.join(scratch_dir, "ckpt_dedup"),
        "dedup_out",
    )
    # within-watermark dedup keeps ≥ the global-distinct count (state eviction
    # can re-admit keys), ≤ the raw count
    raw = spark.read.parquet(events_stream_dir)
    n_raw = raw.count()
    n_global = raw.select("user_id", "event_type").distinct().count()
    n = got.count()
    assert n_global <= n <= n_raw


def test_stateful_running_totals(spark, events_stream_dir, scratch_dir):
    from hadoop_word_score_spark.streaming.stateful import running_user_totals
    from hadoop_word_score_spark.streaming.windows import (
        read_events_stream,
        run_available_now,
    )

    got = run_available_now(
        running_user_totals(read_events_stream(spark, events_stream_dir)),
        os.path.join(scratch_dir, "ckpt_state"),
        "state_out",
    )
    # last emission per user (max n_events) must equal the batch aggregate
    final = (
        got.groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"))
        .collect()
    )
    batch = {
        r.user_id: r.n
        for r in spark.read.parquet(events_stream_dir)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert {r.user_id: r.n_events for r in final} == batch


def test_sliding_stream_equals_batch(spark, events_stream_dir, scratch_dir):
    from hadoop_word_score_spark.streaming.windows import (
        read_events_stream,
        run_available_now,
        sliding_counts_stream,
    )

    got = run_available_now(
        sliding_counts_stream(read_events_stream(spark, events_stream_dir)),
        os.path.join(scratch_dir, "ckpt_slide"),
        "slide_out",
    )
    batch = (
        spark.read.parquet(events_stream_dir)
        .groupBy(F.window("ts", "10 minutes", "5 minutes"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("window.start").alias("w_start"), "event_type", "n_events")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, batch.collect()))
