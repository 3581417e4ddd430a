"""Data-selection importance weights (DSIR-style) for corpus curation.

DSIR — Data Selection with Importance Resampling (Xie, Santurkar, Ma,
Liang; NeurIPS'23, public literature) — scores every raw document by the
log-likelihood ratio of a TARGET domain model vs a RAW corpus model over
hashed n-gram features, then resamples raw data toward the target
distribution. This module implements the scoring pass with hashed UNIGRAM
buckets and add-one smoothing: the production shape of "make 100 TB of
crawl look like curated text" without training anything.

Spark-first plan (no Python anywhere):
  - one explode of the token stream; each token's feature bucket is the
    first 8 hex chars of md5 — cross-engine deterministic, so the DuckDB
    oracle reproduces every bucket bit-for-bit;
  - ONE map-side-combined aggregation builds BOTH distributions
    (conditional sums on the target predicate) — the corpus is scanned
    once per consumer, never once per class;
  - the per-bucket log-ratio table is bounded at `buckets` rows, broadcast
    to the scoring join; totals attach as a 1-row broadcast cross join
    (the scalar-attach house pattern);
  - per-doc score = mean token log-ratio, ROUND(6) for cross-engine float
    determinism (house convention: the ~1e-10 summation-order error is 4
    orders below the rounding grain).

Reference scope: hadoop-word-score has no curation surface; EXT coverage
for the LLM-data-pipeline mandate (sampling/mixing family).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import DELIM_CLASS


def dsir_logratio_scores(
    docs: DataFrame,
    target: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 1024,
) -> DataFrame:
    """Per-document DSIR importance score for every NON-target document.

    Returns (id, n_tokens, dsir_score) where ``dsir_score`` is the mean
    over the doc's tokens of ``ln p_target(bucket) - ln p_raw(bucket)``,
    both add-one-smoothed over ``buckets`` hashed unigram features;
    positive = looks more like the target domain. Ordered by id.

    ``target`` is a boolean Column evaluated per document (e.g.
    ``F.col("source") == "src0"``); the two distributions are built from
    the same single aggregation via conditional sums, and scoring covers
    the complement.
    """
    # NULL-predicate rows count as RAW (coalesce to false): under SQL 3VL a
    # bare boolean column would silently drop such rows from BOTH
    # distributions while still being excluded from scoring — the engine
    # and oracle must agree on one rule, and "unknown provenance is not
    # the curated target" is the conservative one (review r10).
    tok = docs.select(
        F.col(id_col).alias("id"),
        F.coalesce(target.cast("boolean"), F.lit(False)).alias("is_target"),
        F.explode(F.split(F.col(text_col), DELIM_CLASS)).alias("w"),
    ).filter(F.col("w") != "")
    bucket = (
        F.conv(F.substring(F.md5(F.col("w").cast("binary")), 1, 8), 16, 10)
        .cast("long") % buckets
    )
    tokb = tok.select("id", "is_target", bucket.alias("bucket"))

    one = F.count(F.lit(1))
    bstats = tokb.groupBy("bucket").agg(
        F.sum(F.when(F.col("is_target"), 1).otherwise(0)).alias("ct"),
        F.sum(F.when(~F.col("is_target"), 1).otherwise(0)).alias("cr"),
    )
    tots = bstats.agg(
        F.sum("ct").alias("tt"), F.sum("cr").alias("tr")
    )  # 1 row, from the bounded bucket table — never a second corpus scan
    lw = F.log((F.col("ct") + 1) / (F.col("tt") + F.lit(float(buckets)))) - F.log(
        (F.col("cr") + 1) / (F.col("tr") + F.lit(float(buckets)))
    )
    wtab = bstats.crossJoin(F.broadcast(tots)).select("bucket", lw.alias("lw"))
    return (
        tokb.filter(~F.col("is_target"))
        .join(F.broadcast(wtab), "bucket")
        .groupBy("id")
        .agg(
            one.alias("n_tokens"),
            F.round(F.sum("lw") / one, 6).alias("dsir_score"),
        )
        .orderBy("id")
    )
