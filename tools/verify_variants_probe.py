"""A/B probe for the minhash candidate-verification stage.

Variant A (current): explode pair → single join on shingles → groupBy pair.
Variant B: two joins (id_a, id_b) against one shingle relation — planner's
ReuseExchange should evaluate the shingle subtree once.

    python tools/verify_variants_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from hadoop_word_score_spark.functions.hashing import (  # noqa: E402
    band_hashes,
    shingles_expr,
    text_minhash_udf,
)
from hadoop_word_score_spark.session import get_spark  # noqa: E402

BASE = "/root/testdata/sf0.1/documents.parquet"
SCALED = "/root/repo/.scratch/scale10/documents.parquet"
COPIES = 10


def build(spark):
    if os.path.exists(SCALED):
        return
    df = spark.read.parquet(BASE)
    n = df.count()
    copies = []
    for k in range(COPIES):
        c = df.withColumn("doc_id", F.col("doc_id") + F.lit(k * (n + 1)))
        c = c.withColumn("text", F.concat(F.col("text"), F.lit(f" copy{k}")))
        copies.append(c)
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    out.write.mode("overwrite").parquet(SCALED)


def stages(docs, n=3, num_hashes=32, bands=16):
    rows = num_hashes // bands
    sh = docs.select(
        F.col("doc_id").alias("id"),
        F.expr(shingles_expr("text", n)).alias("shingles"),
    )
    sig_fn = text_minhash_udf(num_hashes, n)
    sig = docs.select(
        F.col("doc_id").alias("id"), sig_fn(F.col("text")).alias("sig")
    ).filter(F.col("sig").isNotNull())
    banded = sig.select(
        "id",
        F.posexplode_outer(band_hashes("sig", bands, rows)).alias(
            "band_idx", "band_hash"
        ),
    ).filter(F.col("band_hash").isNotNull())
    candidates = (
        banded.groupBy("band_idx", "band_hash")
        .agg(F.collect_list("id").alias("ids"))
        .filter(F.size("ids") > 1)
        .select(F.explode("ids").alias("id_a"), "ids")
        .select("id_a", F.explode("ids").alias("id_b"))
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    return sh, candidates


def finish(verified, threshold=0.5):
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        verified.withColumn("n_common", inter.cast("long"))
        .withColumn("jaccard", F.round(F.col("n_common") / union, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "n_common", "jaccard")
    )


def variant_a(docs):
    sh, candidates = stages(docs)
    sides = candidates.select(
        "id_a", "id_b", F.explode(F.array("id_a", "id_b")).alias("id")
    )
    side_of = lambda c: F.first(  # noqa: E731
        F.when(F.col("id") == F.col(c), F.col("shingles")), ignorenulls=True
    )
    verified = (
        sides.join(sh, "id")
        .groupBy("id_a", "id_b")
        .agg(side_of("id_a").alias("sh_a"), side_of("id_b").alias("sh_b"))
    )
    return finish(verified)


def variant_b(docs):
    sh, candidates = stages(docs)
    verified = candidates.join(
        sh.select(F.col("id").alias("id_a"), F.col("shingles").alias("sh_a")), "id_a"
    ).join(
        sh.select(F.col("id").alias("id_b"), F.col("shingles").alias("sh_b")), "id_b"
    )
    return finish(verified)


def main():
    spark = get_spark()
    build(spark)
    docs1 = spark.read.parquet(BASE)
    docs10 = spark.read.parquet(SCALED)
    for label, fn in [("A:explode+groupBy", variant_a), ("B:two-join", variant_b)]:
        for sf, docs in [("1x", docs1), ("10x", docs10)]:
            t0 = time.time()
            n = fn(docs).count()
            print(f"{label} {sf}: {time.time() - t0:.2f}s  pairs={n}", flush=True)
    plan = variant_b(docs10)._jdf.queryExecution().executedPlan().toString()
    print("B ReusedExchange:", plan.count("ReusedExchange"))


if __name__ == "__main__":
    main()


def variant_c(docs, n=3):
    """Join raw text, tokenize after the join: only candidate docs shingle."""
    sh, candidates = stages(docs)
    txt = docs.select(F.col("doc_id"), F.col("text"))
    verified = (
        candidates.join(
            txt.select(F.col("doc_id").alias("id_a"), F.col("text").alias("t_a")),
            "id_a",
        )
        .join(
            txt.select(F.col("doc_id").alias("id_b"), F.col("text").alias("t_b")),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            F.expr(shingles_expr("t_a", n)).alias("sh_a"),
            F.expr(shingles_expr("t_b", n)).alias("sh_b"),
        )
    )
    return finish(verified)


def main_c():
    spark = get_spark()
    docs1 = spark.read.parquet(BASE)
    docs10 = spark.read.parquet(SCALED)
    for sf, docs in [("1x", docs1), ("10x", docs10)]:
        t0 = time.time()
        n = variant_c(docs).count()
        print(f"C:text-join-then-shingle {sf}: {time.time() - t0:.2f}s  pairs={n}", flush=True)
    plan = variant_c(docs10)._jdf.queryExecution().optimizedPlan().toString()
    joins = [i for i, l in enumerate(plan.splitlines()) if "Join" in l]
    hofs = [i for i, l in enumerate(plan.splitlines()) if "transform(array(array_remove" in l]
    print("join lines:", joins, "shingle-HOF lines:", hofs)


def variant_d(docs):
    """Semi-join prefilter: persist candidates, shingle ONLY docs appearing
    in a candidate pair. NEGATIVE RESULT, kept as a receipt: measured 2x
    slower than B on the 10x dup-heavy corpus (persist + distinct + semi
    join overhead > shingle work saved when candidates aren't a vanishing
    corpus fraction) and within noise of B at 1x. B remains the operator."""
    sh, candidates = stages(docs)
    candidates = candidates.persist()
    need = candidates.select(F.explode(F.array("id_a", "id_b")).alias("id")).distinct()
    sh_need = sh.join(need, "id", "left_semi")
    verified = candidates.join(
        sh_need.select(F.col("id").alias("id_a"), F.col("shingles").alias("sh_a")), "id_a"
    ).join(
        sh_need.select(F.col("id").alias("id_b"), F.col("shingles").alias("sh_b")), "id_b"
    )
    return finish(verified)


def main_d():
    spark = get_spark()
    build(spark)
    docs1 = spark.read.parquet(BASE)
    docs10 = spark.read.parquet(SCALED)
    for label, fn in [("B:two-join", variant_b), ("D:semi-prefilter", variant_d)]:
        for sf, docs in [("1x", docs1), ("10x", docs10)]:
            t0 = time.time()
            n = fn(docs).count()
            print(f"{label} {sf}: {time.time() - t0:.2f}s  pairs={n}", flush=True)
