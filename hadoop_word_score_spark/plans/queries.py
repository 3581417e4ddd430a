"""The named-query registry — SURVEY.md §2's operator inventory, executable.

Every operator the engine claims is registered here as a QuerySpec:
  - ``fn(spark, sf_dir) -> DataFrame``  (the Spark-first implementation)
  - ``oracle``: equivalent ANSI SQL for DuckDB over the same parquet views,
    or None for genuinely non-SQL-expressible ops (driver then records a
    weaker rows-only check).

Conventions that make the driver's order-insensitive value-hash comparison
deterministic (see __spark_entry__.py docstring):
  - every computed/aggregate column is aliased identically on both sides;
  - integer SUMs are CAST to BIGINT in DuckDB (its SUM(int) is HUGEINT);
  - floating aggregates that depend on summation order are ROUND'ed the same
    on both sides;
  - top-k queries always carry a unique-key tiebreaker in the ORDER BY.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import DELIM_CLASS
from ..operators.wordscore import word_score
from ..sources.registry import load_table
from ..sources.reviews import SYNTH_STARS_SQL, reviews_from_documents

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None
    tags: tuple[str, ...] = ()
    bench: bool = False  # include in bench.py's headline set


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str, oracle: str | None = None, tags: tuple[str, ...] = (), bench: bool = False
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name, fn, oracle, tags, bench)
        return fn
    return deco


def queries() -> dict[str, QueryFn]:
    return {n: s.fn for n, s in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {n: s.oracle for n, s in REGISTRY.items() if s.oracle is not None}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# REF: the flagship word-score pipeline (SURVEY §2.12; operators S1-S5, P1-P4,
# A1-A2, O1). Runs on the reviews materialization of `documents` (FIXTURES §1).
# ---------------------------------------------------------------------------

_WORDSCORE_ORACLE = f"""
SELECT CAST(SUM(modifier) AS BIGINT) AS score, word
FROM (
    SELECT CASE CAST(stars AS INT)
             WHEN 5 THEN 2 WHEN 4 THEN 1 WHEN 3 THEN 0
             WHEN 2 THEN -1 WHEN 1 THEN -2 END AS modifier,
           unnest(string_split_regex(text, '[ \t\n\r\f]+')) AS word
    FROM (SELECT {SYNTH_STARS_SQL} AS stars, text FROM documents)
)
WHERE word <> ''
GROUP BY word
ORDER BY score DESC
"""


@register("wordscore", oracle=_WORDSCORE_ORACLE, tags=("ref", "flagship"), bench=True)
def q_wordscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    return word_score(reviews_from_documents(_t(spark, sf_dir, "documents")))


@register(
    "wordscore_top10",
    oracle=f"""
    SELECT score, word FROM (
        {_WORDSCORE_ORACLE.replace("ORDER BY score DESC", "")}
    ) ORDER BY score DESC, word ASC LIMIT 10
    """,
    tags=("ref", "topk"),
)
def q_wordscore_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    # O2: ORDER BY + LIMIT → TakeOrderedAndProject (no global sort). Word is
    # the unique tiebreaker, making the top-k deterministic across engines.
    ws = word_score(reviews_from_documents(_t(spark, sf_dir, "documents")), sort=False)
    return ws.orderBy(F.desc("score"), F.asc("word")).limit(10)


# ---------------------------------------------------------------------------
# EXT relational breadth over the star schema (SURVEY §2.2-2.7)
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2)                                    AS sum_qty,
           ROUND(SUM(l_extendedprice), 2)                               AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)            AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           ROUND(AVG(l_quantity), 4)                                    AS avg_qty,
           ROUND(AVG(l_extendedprice), 4)                               AS avg_price,
           ROUND(AVG(l_discount), 4)                                    AS avg_disc,
           COUNT(*)                                                     AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg",),
    bench=True,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q1 shape: full-scan groupBy-agg. Partial aggregation (the
    # reference's combiner, X1) is automatic; only (flag,status) groups shuffle.
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))), 2
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "filter_project",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice * (1 - l_discount), 4) AS net_price,
           l_quantity
    FROM lineitem
    WHERE l_quantity BETWEEN 5 AND 10
      AND l_discount > 0.05
      AND l_returnflag IN ('A', 'R')
    """,
    tags=("scan",),
)
def q_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    # P5/P6: predicates push to the parquet scan (PushedFilters), projection
    # prunes to 6 of 11 columns (ReadSchema) — verified in tests/test_plans.py.
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            F.col("l_quantity").between(5, 10)
            & (F.col("l_discount") > 0.05)
            & F.col("l_returnflag").isin("A", "R")
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("net_price"),
            "l_quantity",
        )
    )


@register(
    "agg_stats",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*)                            AS n_orders,
           COUNT(DISTINCT o_custkey)           AS n_customers,
           ROUND(SUM(o_totalprice), 2)         AS sum_price,
           ROUND(AVG(o_totalprice), 4)         AS avg_price,
           ROUND(MIN(o_totalprice), 2)         AS min_price,
           ROUND(MAX(o_totalprice), 2)         AS max_price
    FROM orders
    GROUP BY o_orderstatus
    """,
    tags=("agg",),
)
def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A3: standard aggregate battery incl. count-distinct (expand+2-phase agg).
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.count_distinct("o_custkey").alias("n_customers"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
    )
