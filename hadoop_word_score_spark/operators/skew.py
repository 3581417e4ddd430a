"""Skew mitigation (SURVEY §7 scale pass): salted joins and two-phase aggs.

AQE's skew-join splitting (on by default in session.py) handles sort-merge
skew at runtime; these explicit operators cover the cases AQE can't:
broadcast-ineligible dims with a handful of pathologically hot keys, and
per-key state that must stay bounded (running collect-style aggregation).

Salting trades a bounded dim-side blow-up (×`salts` rows, still tiny) for an
even spread of the hot fact keys across `salts` reducers — the standard cure
when one key holds 1% of 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salts: int = 8,
    salt_src: Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the fact side's hot keys spread over ``salts`` buckets.

    The dim side is replicated ``salts`` times (explode over a literal
    sequence — no shuffle, tiny blow-up); the fact side gets a deterministic
    salt from ``salt_src`` (default: hash of the whole row's key column plus
    a uniformly-distributed companion — pass an id column for stability).
    Output is identical to ``fact.join(dim, key, how)`` (asserted in tests);
    only the partitioning of the shuffle changes.

    Only ``inner`` and ``left`` are supported: in right/full outer modes the
    ×``salts`` replicated dim side would emit each *unmatched* dim row once
    per salt — not equivalent to the plain join. (Skew salting targets hot
    FACT keys; for a right/full join swap the sides or de-dup separately.)
    """
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(
            f"salted_join supports how='inner'|'left' only, got {how!r}: "
            "outer dim rows would be duplicated once per salt"
        )
    if salt_src is None:
        salt_src = F.spark_partition_id() * F.lit(2654435761) + F.monotonically_increasing_id()
    fact_s = fact.withColumn("_salt", F.pmod(F.xxhash64(salt_src), F.lit(salts)))
    dim_s = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("long"))
    out = fact_s.join(dim_s, [key, "_salt"], how)
    return out.drop("_salt")


def salted_sum_count(
    df: DataFrame, keys: list[str], value_col: str, salts: int = 16
) -> DataFrame:
    """Two-phase salted aggregation: SUM + COUNT per key.

    Phase 1 groups on (keys, salt) — hot keys split across ``salts``
    reducers; phase 2 merges the ≤``salts`` partials per key. Note Spark's
    HashAggregate already does map-side partial aggregation; explicit salting
    only pays off when the *reduce* side of a single key exceeds one task
    (billions of rows per key, or memory-heavy aggs like collect_list).
    Results equal the unsalted aggregate exactly for algebraic aggregates.
    """
    salt = F.pmod(F.xxhash64(*[F.col(k) for k in keys], F.col(value_col)), F.lit(salts))
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(F.sum(value_col).alias("_psum"), F.count(F.lit(1)).alias("_pcnt"))
    )
    return partial.groupBy(*keys).agg(
        F.sum("_psum").alias(f"sum_{value_col}"),
        F.sum("_pcnt").alias("n_rows"),
    )
