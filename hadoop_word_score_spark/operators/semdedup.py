"""SemDeDup-style semantic deduplication over an embedding column.

Composes the two exact primitives the repo already ships — deterministic
Lloyd's k-means (operators/clustering.py) and exact rounded cosine
(functions/vectors.py, the dedup_near_embedding contract) — into the
published SemDeDup shape (Abbas et al., 2023, arXiv:2303.09540): cluster
the corpus, then prune near-duplicates WITHIN each cluster only, accepting
that a near-dup pair split across a cluster boundary survives (that miss
rate is the price of never running the O(N²) all-pairs cosine).

Scale story (the reason this operator exists next to the exact
``embedding_cosine_pairs``): the candidate-pair space drops from N² to
Σ sᵢ² over cluster sizes sᵢ. k grows with the corpus (k ≈ N/target_size
keeps sᵢ bounded), so at 100 TB the per-cluster prune is embarrassingly
parallel over a layout partitioned by cluster — the same
partitionBy(cell) layout the persisted IVF index (operators/similarity.py)
already writes; assignment itself is one narrow scan with the k×d
centroid matrix inlined as a codegen literal (no shuffle, no join).

Determinism contract (both halves independently driver-hash-green):
cluster labels follow the quantized-centroid k-means recipe
(clustering.py — 4-dp centroids each round, left-to-right distance folds,
argmin ties to the lowest seed slot); the drop rule compares cosine
ROUNDED to 6 dp against the threshold, exactly as dedup_near_embedding
does, so a boundary cosine lands on the same side in Spark and DuckDB.

Reference scope: hadoop-word-score (ComputeWordScore.java) has no
embedding surface at all — this is EXT coverage for the LLM-data-pipeline
mandate (near-dup dedup over ``embeddings.parquet``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.vectors import cosine_similarity
from .clustering import kmeans_assign, kmeans_fit


def _assigned_and_pairs(
    vecs: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    iterations: int,
    threshold: float,
    centroid_decimals: int,
) -> tuple[DataFrame, DataFrame]:
    """(assignment, within-cluster dup pairs) — the shared fit half.

    Raises on an empty corpus (kmeans_fit fails fast rather than NaN-ing).
    """
    cents = kmeans_fit(
        vecs, vec_col, id_col, k=k, iterations=iterations,
        centroid_decimals=centroid_decimals,
    )
    # Narrow assignment pass; checkpointed because up to three consumers
    # read it (both self-join sides + the summary's sizes agg) — each would
    # otherwise replay the scan + k×d distance fold. At 100 TB the
    # equivalent move is one write partitionBy(cluster), after which the
    # per-cluster prune is partition-local (see module docstring).
    asg = (
        kmeans_assign(vecs, vec_col, cents)
        .select(F.col(id_col).alias("vid"), "cluster", F.col(vec_col).alias("v"))
        .localCheckpoint()
    )
    a = asg.select(
        F.col("vid").alias("id_a"), "cluster", F.col("v").alias("va")
    )
    b = asg.select(
        F.col("vid").alias("id_b"), F.col("cluster").alias("cl_b"),
        F.col("v").alias("vb"),
    )
    # One cluster-keyed shuffle per side; the id inequality rides along as
    # a join filter. Pairs generated inside each cluster only.
    pairs = (
        a.join(b, (F.col("cluster") == F.col("cl_b"))
               & (F.col("id_a") < F.col("id_b")))
        .withColumn("cosine_sim", F.round(cosine_similarity("va", "vb"), 6))
        .filter(F.col("cosine_sim") >= threshold)
    )
    return asg, pairs


def semantic_dup_pairs(
    vecs: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iterations: int = 2,
    threshold: float = 0.4,
    centroid_decimals: int = 4,
) -> DataFrame:
    """Within-cluster near-dup pairs: (cluster, id_a, id_b, cosine_sim).

    ``id_a < id_b`` and ``round(cos, 6) >= threshold``; both ids sit in the
    same fitted cluster. A vector is "dropped" downstream iff it appears as
    ``id_b`` in at least one pair — an order-free rule (b is pruned when ANY
    lower-id in-cluster neighbour clears the threshold, whether or not that
    neighbour itself survives), so the survivor set needs no iteration and
    no chain-following, unlike connected-components dedup.
    """
    _, pairs = _assigned_and_pairs(
        vecs, id_col, vec_col, k, iterations, threshold, centroid_decimals
    )
    return pairs.select("cluster", "id_a", "id_b", "cosine_sim")


def semantic_dedup_summary(
    vecs: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iterations: int = 2,
    threshold: float = 0.4,
    centroid_decimals: int = 4,
) -> DataFrame:
    """Per-cluster prune report: (cluster, n_vectors, n_dup_pairs,
    n_dropped, n_kept), one row per fitted cluster (zero-pair clusters
    included), ordered by cluster id."""
    asg, pairs = _assigned_and_pairs(
        vecs, id_col, vec_col, k, iterations, threshold, centroid_decimals
    )
    pair_stats = pairs.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_dup_pairs"),
        F.countDistinct("id_b").alias("n_dropped"),
    )
    sizes = asg.groupBy("cluster").agg(F.count(F.lit(1)).alias("n_vectors"))
    return (
        sizes.join(pair_stats, "cluster", "left")
        .fillna(0, subset=["n_dup_pairs", "n_dropped"])
        .select(
            "cluster",
            "n_vectors",
            "n_dup_pairs",
            "n_dropped",
            (F.col("n_vectors") - F.col("n_dropped")).alias("n_kept"),
        )
        .orderBy("cluster")
    )
