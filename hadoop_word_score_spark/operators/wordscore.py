"""The flagship operator: word-score (SURVEY §2.12), parameterized (L5).

Semantics (from the reference, ComputeWordScore.java:33-56): for every
whitespace token in any review's text, sum a per-review modifier derived from
the review's star rating; emit (score, word) sorted descending by score.

Spark plan shape (one DAG, two exchanges — vs the reference's two MapReduce
jobs + SequenceFile handoff):

    Scan → Project(modifier, split) → Generate(explode) →
    HashAggregate(partial) → Exchange(hash word) → HashAggregate(final) →
    [Exchange(range score desc) → Sort]        # only when sort=True

The partial/final HashAggregate split IS the reference's combiner
(ComputeWordScore.java:180-181), applied automatically. At 100 TB the
aggregation shuffles only (word, partial-sum) pairs — the token explosion
never crosses the wire.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import DELIM_CLASS, SCORE_MODIFIERS


def word_score(
    reviews: DataFrame,
    stars_col: str = "stars",
    text_col: str = "text",
    weights: Mapping[int, int] = SCORE_MODIFIERS,
    sort: bool = True,
    strict_int_parity: bool = False,
) -> DataFrame:
    """(score, word) per distinct token, score = Σ modifier over occurrences.

    ``weights`` generalizes the 5★→+2 … 1★→−2 table into a reusable
    text-scoring operator (SURVEY §2.10 L5). ``strict_int_parity`` narrows the
    sum to 32-bit int to match the reference's IntWritable accumulator
    (ComputeWordScore.java:70-72); default keeps Spark's natural long (safe at
    100 TB).
    """
    pairs: list[Column] = []
    for k, v in weights.items():
        pairs += [F.lit(int(k)), F.lit(int(v))]
    modifier = F.element_at(F.create_map(*pairs), F.col(stars_col).cast("int"))

    out = (
        reviews
        .select(
            modifier.alias("modifier"),
            F.explode(F.split(F.col(text_col), DELIM_CLASS)).alias("word"),
        )
        .filter(F.col("word") != "")  # leading-delimiter artifact (tokenizer parity)
        .groupBy("word")
        .agg(F.sum("modifier").alias("score"))
    )
    if strict_int_parity:
        out = out.withColumn("score", F.col("score").cast("int"))
    out = out.select("score", "word")  # reference emits `score \t word` (CWS:215-216)
    if sort:
        out = out.orderBy(F.desc("score"))  # ties arbitrary per spec (CWS:56)
    return out


def write_word_scores(df: DataFrame, path: str, single_file: bool = True) -> None:
    """REF sink S5: tab-delimited text, one file when ``single_file``.

    ``coalesce(1)`` serializes the final write exactly like the reference's
    forced single reducer (ComputeWordScore.java:208-213) — only use for
    human-consumable output; at scale leave ``single_file=False`` for a
    partitioned write.
    """
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("sep", "\t").csv(path)
