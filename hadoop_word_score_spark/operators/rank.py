"""Distributed global rank — the primitive behind every "position in the
globally sorted order" operator (sorted-neighbourhood linkage, equi-depth
histograms, exact quantile assignment).

``Window.orderBy`` WITHOUT a partitionBy collapses to a single task — the
canonical Spark scale trap. The distributed recipe instead:

  1. range-partition on the order columns (the same Exchange a global
     ORDER BY plans, so each partition holds a contiguous key range);
  2. collect per-partition row COUNTS — bounded driver state, one row per
     partition (the PageRank/BPE bounded-collect pattern), and turn them
     into cumulative offsets;
  3. global rank = per-partition row_number (a partition-local window,
     no data movement beyond step 1's exchange) + the partition's offset,
     broadcast back as a literal map.

Total cost: one range exchange + one partition-count agg; rank values are
unique and dense (1..N) provided the order columns form a total order —
callers append a unique id as the final tiebreaker.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def global_rank(
    df: DataFrame,
    order_cols: Sequence[str],
    rank_col: str = "grank",
) -> DataFrame:
    """Append dense global rank (1..N) by ``order_cols`` — distributed,
    never a one-partition window. ``order_cols`` must totally order the
    rows (append a unique id as the last column) or ties rank
    nondeterministically."""
    cols = list(order_cols)
    n_parts = max(df.sparkSession.sparkContext.defaultParallelism, 1)
    ranged = (
        df.repartitionByRange(n_parts, *cols)
        .withColumn("_rank_pid", F.spark_partition_id())
        # materialize: the offset collect and the rank pass must observe
        # the SAME partitioning (range boundaries come from a sampling job)
        .localCheckpoint()
    )
    sizes = sorted(
        (r._rank_pid, r.n)
        for r in ranged.groupBy("_rank_pid")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    offsets: list = []
    acc = 0
    for pid, n in sizes:
        offsets.extend((F.lit(pid), F.lit(acc)))
        acc += n
    # empty input: no partitions observed -> argless create_map() would be
    # map<void,void> and fail analysis; the offset is irrelevant on zero rows
    offset_expr = (
        F.create_map(*offsets)[F.col("_rank_pid")] if offsets else F.lit(0)
    )
    rn = F.row_number().over(Window.partitionBy("_rank_pid").orderBy(*cols))
    return ranged.withColumn(
        rank_col, (rn + offset_expr).cast("long")
    ).drop("_rank_pid")
