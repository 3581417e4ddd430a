"""Frequent-items (heavy hitters) over unbounded term domains.

The naive top-k — ``groupBy(term).count().orderBy(...).limit(k)`` — shuffles
one row per DISTINCT term. At 100 TB the distinct-term domain is billions
(typos, hashes, code identifiers), so the shuffle and the final-stage hash
tables scale with vocabulary, not with k. The two-phase plan here bounds
that by summary capacity instead:

  Phase 1  per-partition mergeable Misra-Gries summaries (mapInPandas,
           Arrow-batched; memory and emitted rows <= capacity per task).
           The merge rule is the mergeable-summaries form (Agarwal,
           Cormode, Huang, Phillips, Wei, Yi — "Mergeable Summaries",
           PODS 2012): combine counts, then subtract the (capacity+1)-th
           largest value and drop non-positives. Guarantee: any term with
           true partition count > n_partition/(capacity+1) survives with an
           underestimate off by at most n_partition/(capacity+1).
  Phase 2  the union of summary terms (<= partitions x capacity rows —
           KBs, not the vocabulary) is a guaranteed superset of every term
           with global frequency > N/(capacity+1); broadcast-semi-join it
           back against the token stream and recount EXACTLY, so the
           output is the true top-k whenever the k-th frequency clears
           that threshold (asserted by the caller's choice of capacity;
           property-tested against the full groupBy at test SF).

Cost shape at scale: two scans of the token stream (the second filtered to
candidates scan-side), shuffles of O(partitions x capacity) and
O(candidates) rows — never O(distinct terms).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_prune(counts: dict, capacity: int) -> dict:
    """The Misra-Gries decrement step (the error-bound-bearing move of the
    algorithm): subtract the (capacity+1)-th largest count from everyone
    and drop the non-positive — ONE shared definition for the batch
    operator and the streaming monitor (review r12: two verbatim copies
    could drift and silently break one side's certificate)."""
    if len(counts) <= capacity:
        return counts
    vals = sorted(counts.values(), reverse=True)
    sub = vals[capacity]
    return {t: c - sub for t, c in counts.items() if c > sub}


def _mg_summarize(term_col: str, capacity: int):
    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: dict[str, int] = {}
        n_part = 0
        for pdf in batches:
            # batch-level merge: add the batch's exact value_counts, then
            # apply the mergeable-summaries prune once per batch (not per
            # token) — the bound telescopes across merges.
            n_part += len(pdf)
            for term, c in pdf[term_col].value_counts().items():
                counts[term] = counts.get(term, 0) + int(c)
            counts = _mg_prune(counts, capacity)
        # sentinel row (term NULL): this partition's RAW token total — the
        # N in the exactness threshold N/(capacity+1) rides along with the
        # summary instead of costing a third scan of the stream.
        yield pd.DataFrame(
            {
                "term": list(counts.keys()) + [None],
                "mg_count": list(counts.values()) + [n_part],
            }
        )

    return summarize


def heavy_hitters_topk(
    tokens: DataFrame, term_col: str, k: int, capacity: int = 512
) -> DataFrame:
    """Exact top-k most frequent terms, bounded-memory two-phase plan.

    ``tokens`` is one row per token occurrence. Output columns:
    (term, n, exact) ordered by n desc, term asc — deterministic under
    ties. The plan is exact whenever the k-th true frequency clears
    N_tokens/(capacity+1); ``exact`` CHECKS that precondition at runtime
    (r6 advice: an undersized capacity previously produced plausible wrong
    answers with only a docstring note guarding it) — both N and the k-th
    recount already exist in the plan, so the flag costs one window over
    the k output rows. capacity=512 covers a stopword-headed distribution
    four orders of magnitude past test SF.
    """
    from pyspark.sql import Window

    summaries = tokens.select(F.col(term_col).alias("term")).mapInPandas(
        _mg_summarize("term", capacity), schema="term string, mg_count long"
    ).localCheckpoint()  # <= partitions x (capacity+1) rows; read twice below
    candidates = summaries.filter(F.col("term").isNotNull()).select("term").distinct()
    total = summaries.filter(F.col("term").isNull()).agg(
        F.sum("mg_count").alias("n_total")
    )
    topk = (
        tokens.join(
            F.broadcast(candidates),
            tokens[term_col] == candidates["term"],
            "left_semi",
        )
        .groupBy(F.col(term_col).alias("term"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("term"))
        .limit(k)
    )
    whole = Window.partitionBy(F.lit(1))
    return (
        topk.crossJoin(F.broadcast(total))
        .withColumn(
            "exact",
            F.min("n").over(whole) > F.col("n_total") / F.lit(capacity + 1),
        )
        .select("term", "n", "exact")
        .orderBy(F.desc("n"), F.asc("term"))
    )


# ---------------------------------------------------------------------------
# Count-min sketch: the mergeable frequency-ESTIMATE sketch (vs Misra-Gries'
# candidate summary above). Deterministic seeded hashes make the whole
# sketch — not just its error bound — reproducible and oracle-checkable.
# ---------------------------------------------------------------------------


def _cms_bucket(i, term, width: int):
    """Row-i column for a term: first 8 md5 hex digits of "i:term" mod
    width — byte-identical in Spark and DuckDB (same lowercase-hex md5 of
    the same UTF-8 key), so an oracle can rebuild the exact sketch."""
    key = F.concat(i.cast("string"), F.lit(":"), term)
    return (
        F.conv(F.substring(F.md5(key.cast("binary")), 1, 8), 16, 10).cast("long")
        % width
    )


def cms_cells(
    tokens: DataFrame, term_col: str = "term", depth: int = 4, width: int = 1024
) -> DataFrame:
    """The sketch itself as rows (i, b, c): token stream -> depth hash rows
    -> bucket counts.

    Scale shape: the explode emits depth rows per token, but the hash
    aggregation's map-side combine collapses each partition to at most
    depth x width cells before anything shuffles — the sketch is the
    mergeable fixed-size state (elementwise sums), same family as the
    covariance partials. The full sketch is depth x width rows (~KBs) no
    matter the corpus."""
    rows = tokens.select(
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("i"),
        F.col(term_col).alias("term"),
    )
    return (
        rows.select("i", _cms_bucket(F.col("i"), F.col("term"), width).alias("b"))
        .groupBy("i", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_estimates(
    tokens: DataFrame,
    terms: DataFrame,
    term_col: str = "term",
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-query the sketch for each row of ``terms``: (term, n_cms).

    n_cms = min over the depth rows of the probed cell — ALWAYS >=
    the true count (every occurrence landed in every probed cell; callers
    assert the overestimate invariant). The sketch is bounded (depth x
    width rows) so it broadcasts to the probe join."""
    cells = cms_cells(tokens, term_col, depth, width)
    probes = terms.select(
        F.col(term_col).alias("term"),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("i"),
    ).withColumn("b", _cms_bucket(F.col("i"), F.col("term"), width))
    return (
        probes.join(F.broadcast(cells), ["i", "b"], "left")
        .groupBy("term")
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("n_cms"))
    )
