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
