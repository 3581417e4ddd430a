"""foreachBatch upsert sink: exactly-once MERGE from a stream to a table.

Structured Streaming's file sinks are append-only; pipelines that maintain a
keyed TABLE from a stream (latest state per user, running aggregates) need a
MERGE per micro-batch. ``foreachBatch`` is the sanctioned hook — but it runs
with AT-LEAST-ONCE semantics (a batch can be re-delivered after a failure
between sink write and checkpoint commit), so exactly-once must come from an
IDEMPOTENT sink. Spark's own docs give the recipe: use ``batchId`` for
replay deduplication and make the write transactional.

Without a transactional table format in the container, the sink here is a
minimal versioned snapshot store providing both halves:

  target/
    v=<n>/part-*.parquet   immutable snapshot versions
    _latest                one-line pointer "<version> <last_batch_id>"

  - replay guard: a re-delivered ``batch_id <= last_batch_id`` is a no-op;
  - atomicity: a new snapshot directory is fully written BEFORE the pointer
    is swapped (os.replace, atomic on POSIX); a crash mid-write leaves the
    pointer — and therefore the table — on the previous good version.

The MERGE itself is operators/merge.py's full-outer-join upsert; at scale
the micro-batch side is small, so AQE broadcasts it. A lakehouse format
(Delta/Iceberg) replaces the snapshot store 1:1 — the foreachBatch body and
replay guard stay identical.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def _read_pointer(target: str) -> tuple[int, int]:
    """(version, last_batch_id), (0, -1) for an empty table."""
    try:
        with open(os.path.join(target, "_latest"), encoding="utf-8") as f:
            v, b = f.read().split()
            return int(v), int(b)
    except FileNotFoundError:
        return 0, -1


def read_table(spark: SparkSession, target: str) -> DataFrame | None:
    """Current snapshot of the sink table, or None before the first commit."""
    version, _ = _read_pointer(target)
    if version == 0:
        return None
    return spark.read.parquet(os.path.join(target, f"v={version}"))


def upsert_sink(target: str, key: str):
    """A ``foreachBatch`` function MERGE-upserting each micro-batch into
    ``target`` keyed by ``key``, idempotent under batch replay.

    ``target`` must be a driver-visible LOCAL filesystem path: the replay
    guard and pointer swap use POSIX open/os.replace, whose atomicity (and
    the single-writer assumption) silently break on object stores or
    non-driver-visible paths (r6 advice). A URI scheme is rejected at sink
    CONSTRUCTION — before any stream starts — not at first batch. The
    documented lakehouse seam (Delta/Iceberg MERGE) is the multi-writer /
    object-store path.

    Usage::

        stream.writeStream.foreachBatch(upsert_sink(path, "user_id")) ...
    """
    scheme, sep, rest = target.partition("://")
    if sep and scheme not in ("file",):
        raise ValueError(
            f"upsert_sink target must be a local filesystem path "
            f"(driver-side POSIX pointer swap); got scheme {scheme!r} in "
            f"{target!r}. Use a transactional table format for object-store "
            f"targets."
        )
    if sep:
        target = rest  # normalize file:// to a plain driver path

    from ..operators.merge import merge_upsert

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        version, last_batch = _read_pointer(target)
        if batch_id <= last_batch:  # replayed batch: already committed
            return
        if version == 0:
            merged = batch_df
        else:
            current = spark.read.parquet(os.path.join(target, f"v={version}"))
            merged = merge_upsert(current, batch_df, key)
        new_version = version + 1
        merged.write.mode("overwrite").parquet(
            os.path.join(target, f"v={new_version}")
        )
        tmp = os.path.join(target, "_latest.tmp")
        with open(tmp, "w", encoding="utf-8") as f:
            f.write(f"{new_version} {batch_id}")
        os.replace(tmp, os.path.join(target, "_latest"))

    return write_batch
