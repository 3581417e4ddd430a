"""A/B measurement protocol: dedup_components with vs without the
post-repartition localCheckpoint, at 1x (~200k) and 10x (~2M) synthetic
directed edges (chains of length 5 -> components of 5 ids).

Variant A = no checkpoint after the sized repartition: every
label-propagation round re-computes the union + repartition exchange from
the raw checkpoint blocks (Spark SQL does not reuse exchanges across
actions — each round's convergence count is its own action).
Variant B = shipped code: localCheckpoint the repartitioned edges once.

Recorded result (local[32], min of 2 warm runs per cell):

    1x  A-old:  8.90s   B-new:  7.85s
    10x A-old: 37.91s   B-new: 19.99s   (1.9x)

Run: python tools/components_ab.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F  # noqa: E402

from hadoop_word_score_spark.session import get_spark  # noqa: E402


def components(pairs, checkpoint_partitioned):
    # Inlined copy of operators/dedup.py:dedup_components with the
    # post-repartition checkpoint made switchable — kept in sync by eye;
    # this is a measurement harness, not a second implementation.
    fwd = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    edges = fwd.union(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()
    n_parts = max(2, min(64, int(edges.count()) // 50_000 + 2))
    edges = edges.repartition(n_parts, "dst")
    if checkpoint_partitioned:
        edges = edges.localCheckpoint()
    labels = (
        edges.select(F.col("src").alias("id")).distinct()
        .withColumn("label", F.col("id"))
        .repartition(n_parts, "id").localCheckpoint()
    )
    rounds = 0
    for _ in range(25):
        nbr_min = (
            edges.join(labels, edges["dst"] == labels["id"])
            .groupBy("src").agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(nbr_min, labels["id"] == nbr_min["src"], "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce("nbr_label", "label")
                ).alias("label"),
                (F.coalesce("nbr_label", "label") < F.col("label"))
                .cast("int").alias("chg"),
            ).localCheckpoint()
        )
        changed = new_labels.agg(F.sum("chg")).first()[0] or 0
        labels = new_labels.select("id", "label")
        rounds += 1
        if changed == 0:
            break
    return rounds, labels.select("label").distinct().count()


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
            for _ in range(2):
                t0 = time.perf_counter()
                rounds, ncl = components(pairs, ck)
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            print(
                f"{scale} {variant}: {best:.2f}s rounds={rounds} clusters={ncl}",
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
