"""Deduplication operators (SURVEY §2.10 L1/L2): exact, MinHash-LSH, SimHash,
n-gram Jaccard.

Scale notes (the whole point of these designs):
  - Exact dedup shuffles a 128-bit content hash, never the document bodies.
  - MinHash-LSH is the linear-time near-dup path: per-doc signature (one scan),
    explode to b band-buckets (b ≈ 8-16 rows/doc, tiny), self-join *within
    buckets only*. No all-pairs anything. Candidate verification re-joins the
    shingle sets for exact Jaccard — only for candidate pairs.
  - The exact n-gram Jaccard operator (quadratic within shingle-buckets) is
    the oracle-of-record at test SF, not the scale path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import band_hashes, minhash_signature, shingles_expr


def exact_dedup(df: DataFrame, content_cols: list[str], id_col: str) -> DataFrame:
    """Keep the min-id row per distinct content (deterministic survivor).

    Returns (content hash, surviving id, dup count). Shuffles only
    (hash, id) pairs — at 100 TB the md5 is computed scan-side and the
    shuffle is ~48 bytes/row regardless of document size.
    """
    h = F.md5(F.concat_ws("\x00", *[F.col(c) for c in content_cols]))
    return (
        df.select(h.alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact all-pairs n-gram Jaccard ≥ threshold (the dedup oracle-of-record).

    Distinct shingles → explode → self-join on shingle → |A∩B| per pair →
    Jaccard from set sizes. Work is Σ_shingle (docs-per-shingle)² — fine when
    shingles are selective; use minhash_lsh_pairs when they aren't.
    """
    sh = docs.select(
        F.col(id_col), F.expr(shingles_expr(text_col, n)).alias("shingles")
    ).withColumn("sh_size", F.size("shingles"))
    exploded = sh.select(id_col, "sh_size", F.explode("shingles").alias("shingle"))

    a = exploded.select(
        F.col(id_col).alias("id_a"), F.col("sh_size").alias("size_a"), "shingle"
    )
    b = exploded.select(
        F.col(id_col).alias("id_b"), F.col("sh_size").alias("size_b"), "shingle"
    )
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "size_a", "size_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    jac = F.col("n_common") / (F.col("size_a") + F.col("size_b") - F.col("n_common"))
    return (
        inter.withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "n_common", "jaccard")
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 16,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-dup pairs via banded MinHash, verified with exact Jaccard.

    bands=16 × rows=2 → P(candidate) ≈ 1-(1-j²)¹⁶: >99.9% at j=0.5 — recall
    against the exact operator is asserted in tests. Output schema matches
    ngram_jaccard_pairs so the two are interchangeable.
    """
    rows = num_hashes // bands
    sh = (
        docs.select(F.col(id_col), F.expr(shingles_expr(text_col, n)).alias("shingles"))
        .withColumn("sig", minhash_signature("shingles", num_hashes))
        .filter(F.col("sig").isNotNull())
    )
    banded = sh.select(
        id_col,
        "shingles",
        F.posexplode(band_hashes("sig", bands, rows)).alias("band_idx", "band_hash"),
    )
    a = banded.select(
        F.col(id_col).alias("id_a"), F.col("shingles").alias("sh_a"),
        "band_idx", "band_hash",
    )
    b = banded.select(
        F.col(id_col).alias("id_b"), F.col("shingles").alias("sh_b"),
        "band_idx", "band_hash",
    )
    candidates = (
        a.join(b, ["band_idx", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .dropDuplicates(["id_a", "id_b"])  # a pair may collide in many bands
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        candidates.withColumn("n_common", inter.cast("long"))
        .withColumn("jaccard", F.round(F.col("n_common") / union, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "n_common", "jaccard")
    )


def simhash_near_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    chunks: int = 4,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ max_hamming.

    Pigeonhole banding: split the 64-bit hash into ``chunks`` 16-bit pieces —
    any pair within distance ≤ chunks-1 must agree on ≥1 piece, so the
    bucket-join finds all of them without an all-pairs pass.
    """
    from ..functions.hashing import simhash64

    h = docs.select(F.col(id_col), simhash64(text_col).alias("simhash"))
    width = 64 // chunks
    pieces = h.select(
        id_col,
        "simhash",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {chunks - 1}), "
                f"c -> (simhash >> (c * {width})) & {(1 << width) - 1})"
            )
        ).alias("chunk_idx", "chunk_val"),
    )
    a = pieces.select(
        F.col(id_col).alias("id_a"), F.col("simhash").alias("sim_a"),
        "chunk_idx", "chunk_val",
    )
    b = pieces.select(
        F.col(id_col).alias("id_b"), F.col("simhash").alias("sim_b"),
        "chunk_idx", "chunk_val",
    )
    ham = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (
        a.join(b, ["chunk_idx", "chunk_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("hamming", ham.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
