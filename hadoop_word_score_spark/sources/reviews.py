"""The reference-native input: JSON-lines Yelp-style reviews.

The reference reads line-oriented JSON text and plucks ``stars`` (JSON double,
narrowed to int) and ``text`` (ComputeWordScore.java:99-120). Two forms here:

- ``read_reviews_jsonl``   : the real source — schema-first JSONL scan.
- ``reviews_from_documents``: the test materialization (FIXTURES.md §1) — the
  driver's ``documents`` table with a deterministic synthetic ``stars`` column
  so the flagship pipeline is DuckDB-oracle-checkable on shared parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Only the two fields the pipeline consumes are declared: Catalyst prunes the
# JSON parser to these keys (the reference parsed entire objects per line and
# discarded the rest, ComputeWordScore.java:112).
REVIEWS_SCHEMA = T.StructType([
    T.StructField("stars", T.DoubleType(), True),
    T.StructField("text", T.StringType(), True),
])


def read_reviews_jsonl(spark: SparkSession, path: str, fail_fast: bool = False) -> DataFrame:
    """JSONL review scan (SURVEY §2.1 S1+S2).

    Default is PERMISSIVE (bad records → nulls, sane at 100 TB); the
    reference's behaviour — die on the first malformed line
    (ComputeWordScore.java:102-108) — is ``fail_fast=True``.
    """
    mode = "FAILFAST" if fail_fast else "PERMISSIVE"
    return spark.read.schema(REVIEWS_SCHEMA).option("mode", mode).json(path)


# Deterministic synthetic stars: 1.0–5.0 cycling by doc_id (FIXTURES.md §1).
SYNTH_STARS_SQL = "CAST(1 + doc_id % 5 AS DOUBLE)"


def reviews_from_documents(documents: DataFrame) -> DataFrame:
    return documents.select(
        F.expr(SYNTH_STARS_SQL).alias("stars"),
        F.col("text"),
    )
