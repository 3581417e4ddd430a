"""Record linkage: blocked fuzzy candidate-pair generation.

Entity resolution's first (and at scale, only expensive) stage: generate
candidate duplicate pairs by comparing records WITHIN blocks instead of
all-pairs. The blocking key turns O(N^2) comparisons into
sum(block_size^2) — the universal linkage trade (Fellegi-Sunter /
Christen's "Data Matching", public literature): recall is capped by the
blocking scheme (true matches split across blocks are missed), and
production systems run several cheap blocking passes (prefix, phonetic,
sorted-neighbourhood) and union the candidates.

Scale story at 100 TB:
  - one block-keyed self-join; nothing else touches the corpus. The
    shuffle key is the block tuple, so skew = a hot block — detect with
    operators/skew.py::join_key_skew and either refine the key (append
    another column) or salt, exactly as for any hot join key;
  - the in-block comparison uses Spark's THRESHOLDED ``levenshtein(l, r,
    k)`` (banded DP, early exit, JVM codegen): a clear non-match costs
    O(k * len), not O(len^2), and no Python runs anywhere;
  - output is candidate pairs; downstream survivorship (pick canonical,
    apply) reuses the dedup surfaces (operators/dedup.py).

Reference scope: hadoop-word-score has no linkage surface; EXT coverage
for the LLM-data-pipeline mandate (near-dup over structured metadata,
complementing the text/embedding dedup family).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def blocked_fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_cols: Sequence[str],
    max_distance: int = 1,
) -> DataFrame:
    """Candidate pairs (id_a, id_b, name_a, name_b, distance) with
    ``levenshtein(text_a, text_b) <= max_distance`` inside each block;
    ``id_a < id_b``, ordered by (id_a, id_b).

    ``distance`` is the exact unit-cost edit distance (BIGINT — integer
    determinism, no float contract needed). Records with a NULL block
    column never pair (SQL join semantics), matching the oracle.
    """
    blocks = list(block_cols)
    a = df.select(
        F.col(id_col).alias("id_a"),
        F.col(text_col).alias("name_a"),
        *[F.col(c) for c in blocks],
    )
    b = df.select(
        F.col(id_col).alias("id_b"),
        F.col(text_col).alias("name_b"),
        *[F.col(c) for c in blocks],
    )
    # thresholded levenshtein returns -1 once the band exceeds k: keep
    # 0 <= d <= k without ever running the full DP on a clear non-match
    d = F.levenshtein(F.col("name_a"), F.col("name_b"), max_distance)
    return (
        a.join(b, blocks)
        .where(F.col("id_a") < F.col("id_b"))
        .where(d >= 0)
        .select(
            "id_a",
            "id_b",
            "name_a",
            "name_b",
            d.cast("long").alias("distance"),
        )
        .orderBy("id_a", "id_b")
    )


def sorted_neighbourhood_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    sort_key,
    window: int = 2,
    max_distance: int = 1,
) -> DataFrame:
    """Sorted-neighbourhood candidate pairs (Hernandez & Stolfo SIGMOD'95,
    public): sort records by ``sort_key``, slide a window of size
    ``window`` and compare each record only to its next ``window``
    neighbours in sort order. Returns the same shape as
    ``blocked_fuzzy_pairs`` — (id_a, id_b, name_a, name_b, distance) with
    ``distance <= max_distance`` — but with a COMPLEMENTARY miss profile:
    blocking misses matches whose block key disagrees; sorted
    neighbourhood misses matches that sort far apart. Production linkage
    unions several passes.

    Plan shape — the global sort is DISTRIBUTED, never a one-partition
    window (``Window.orderBy`` without a partitionBy collapses to a single
    task — the exact anti-pattern this operator exists to avoid):
      1. range-partition on (sort_key, id) — Spark's ORDER BY machinery,
         so each partition holds a contiguous key range;
      2. global rank = per-partition row_number + the partition's
         cumulative offset (offsets are a bounded partition-count collect,
         broadcast back as a literal map — the PageRank/BPE bounded-
         driver-state pattern);
      3. each record explodes into ``window`` (rank + i) probes and
         equality-joins the rank relation — unique integer keys, so the
         shuffle join is skew-free by construction.
    Candidate count is exactly ``window*N - window*(window+1)/2`` (each
    rank probes ``window`` successors; the last ``window`` ranks probe
    past the end) — linear in N by construction, the strongest candidate
    bound of any linkage pass (blocking is quadratic within a block). Sort ties break by id so the neighbourhood
    enumeration is engine-deterministic.
    """
    from .rank import global_rank

    key = F.col(sort_key) if isinstance(sort_key, str) else sort_key
    g = global_rank(
        df.select(
            F.col(id_col).alias("rid"),
            F.col(text_col).alias("rname"),
            key.alias("sn_key"),
        ),
        ["sn_key", "rid"],
    ).select("rid", "rname", "grank")
    probes = g.select(
        F.col("rid").alias("id_a"),
        F.col("rname").alias("name_a"),
        F.explode(
            F.array(*[F.lit(i) for i in range(1, window + 1)])
        ).alias("step"),
        "grank",
    ).select(
        "id_a", "name_a", (F.col("grank") + F.col("step")).alias("grank")
    )
    nbrs = g.select(
        F.col("rid").alias("id_b"), F.col("rname").alias("name_b"), "grank"
    )
    d = F.levenshtein(F.col("name_a"), F.col("name_b"), max_distance)
    return (
        probes.join(nbrs, "grank")
        .where(d >= 0)
        .select(
            # neighbours are emitted in sort order; normalize to id order
            # so the output contract matches blocked_fuzzy_pairs
            F.least("id_a", "id_b").alias("oid_a"),
            F.greatest("id_a", "id_b").alias("oid_b"),
            F.when(F.col("id_a") < F.col("id_b"), F.col("name_a"))
            .otherwise(F.col("name_b"))
            .alias("name_a"),
            F.when(F.col("id_a") < F.col("id_b"), F.col("name_b"))
            .otherwise(F.col("name_a"))
            .alias("name_b"),
            d.cast("long").alias("distance"),
        )
        # no distinct needed: each unordered pair is generated exactly once,
        # from its lower-rank member's probe side
        .withColumnsRenamed({"oid_a": "id_a", "oid_b": "id_b"})
        .orderBy("id_a", "id_b")
    )
