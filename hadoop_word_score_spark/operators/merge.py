"""MERGE INTO / upsert as a batch operator (EXT; SURVEY §2.10).

The reference recomputes its whole output every run (two fresh MapReduce
jobs, ComputeWordScore.java:165-218); an incremental 100 TB pipeline instead
folds a (much smaller) change set into the standing corpus. Spark's DataFrame
API has no MERGE primitive without a table format (Delta/Iceberg), but the
relational core is exactly one full-outer join on the key:

    matched        -> take source row   (WHEN MATCHED THEN UPDATE SET *)
    source-only    -> insert source row (WHEN NOT MATCHED THEN INSERT *)
    target-only    -> keep target row
    matched+delete -> drop the row      (WHEN MATCHED AND <cond> THEN DELETE)

Scale: one shuffle of each side on the key — and the source side is the
change set, typically orders of magnitude smaller, so AQE turns its side of
the join into a broadcast. Rewriting only touched partitions (the other half
of a real MERGE) is the table format's job; partitioned-parquet overwrite by
partition column composes with sources/sinks.write_partitioned_parquet.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    key: str,
    delete_when: Column | None = None,
) -> DataFrame:
    """Upsert ``source`` into ``target`` on ``key`` (same schemas).

    ``delete_when`` is evaluated against matched *source* rows; matches are
    dropped from the result (MERGE's WHEN MATCHED ... THEN DELETE arm).
    """
    if target.columns != source.columns:
        raise ValueError(
            f"schema mismatch: target {target.columns} vs source {source.columns}"
        )
    t = target.alias("t")
    s = source.alias("s")
    joined = t.join(s, F.col(f"t.{key}") == F.col(f"s.{key}"), "full_outer")
    matched = F.col(f"s.{key}").isNotNull()
    out_cols = [
        F.when(matched, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
        for c in target.columns
    ]
    if delete_when is not None:
        keep = ~(matched & F.col(f"t.{key}").isNotNull() & delete_when)
        joined = joined.filter(keep)
    return joined.select(*out_cols)
