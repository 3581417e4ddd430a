"""A/B measurement protocol: dedup_components with vs without the
post-repartition localCheckpoint, at 1x (~200k) and 10x (~2M) synthetic
directed edges (chains of length 5 -> components of 5 ids).

Calls the REAL operators/dedup.py:dedup_components, flipping its
``checkpoint_partitioned`` measurement seam — no inlined algorithm copy, so
the harness cannot drift from the shipped code.

Variant A (checkpoint_partitioned=False): every label-propagation round
re-computes the union + repartition exchange from the raw checkpoint blocks
(Spark SQL does not reuse exchanges across actions — each round's
convergence count is its own action).
Variant B (True, the shipped default): materialize the repartitioned edges
once.

Recorded result (local[32], min of 2 warm runs per cell, measured through
the real dedup_components — an earlier inline-copy protocol read 37.9s vs
20.0s for the 10x cells; the shipped-code numbers below supersede it):

    1x  A-old:  7.68s   B-new:  5.86s
    10x A-old: 19.98s   B-new: 14.49s   (1.4x)

Run: python tools/components_ab.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F  # noqa: E402

from hadoop_word_score_spark.operators.dedup import dedup_components  # noqa: E402
from hadoop_word_score_spark.session import get_spark  # noqa: E402


def synth_pairs(spark, n_edges):
    # chains of length 5: edges (i, i+1) with a gap every 4 -> components of 5
    return (
        spark.range(n_edges)
        .select(
            (F.col("id") + (F.col("id") / 4).cast("long")).alias("id_a"),
            (F.col("id") + (F.col("id") / 4).cast("long") + 1).alias("id_b"),
        )
    )


def main() -> None:
    spark = get_spark("components-ab")
    spark.sparkContext.setLogLevel("ERROR")
    for scale, n_edges in (("1x", 200_000), ("10x", 2_000_000)):
        pairs = synth_pairs(spark, n_edges).localCheckpoint()
        for variant, ck in (("A-old", False), ("B-new", True)):
            best = None
            ncl = None
            for _ in range(2):
                t0 = time.perf_counter()
                clusters = dedup_components(pairs, checkpoint_partitioned=ck)
                ncl = clusters.select("cluster").distinct().count()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            print(f"{scale} {variant}: {best:.2f}s clusters={ncl}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
