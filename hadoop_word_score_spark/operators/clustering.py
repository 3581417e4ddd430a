"""Distributed k-means (Lloyd's) over an embedding column.

The missing piece between the similarity family's persisted IVF index
(hash/projection cells) and PCA: LEARNED centroids. The reference engine
has no clustering at all; this is EXT surface for the training-data
pipeline (corpus clustering for dedup/mixture decisions, IVF cell
learning, semantic sharding).

Scale design — what does and does not shuffle per iteration:

- assignment is a NARROW map: the k x d centroid matrix (bounded: k<=256,
  d<=4096 -> a few MB) is collected and inlined as a literal expression, so
  "nearest centroid" is one whole-stage-codegen pass over the corpus — no
  crossJoin row expansion (n x k rows) and no per-vector shuffle at all.
- the centroid update shuffles ONLY (cluster, dim) partial sums: k x d
  keys, map-side combined — bytes are O(k x d x partitions), never corpus-
  sized.
- per-iteration driver state is the k x d centroid list (the same bounded-
  collect pattern as BPE's 1-row argmax and PageRank's rank checkpoint).

Determinism / oracle story (the reason this is hash-checkable at all):
initial centroids are the k lowest-vec_id vectors; every updated centroid
coordinate is quantized to ``centroid_decimals`` (rounding through a
decimal kills the last-ulp noise from engines summing partials in
different orders, so both engines feed BIT-IDENTICAL centroids into the
next assignment round); distance folds are left-to-right (Spark
``aggregate`` starts at 0.0 + e1 — exactly DuckDB's ``list_reduce`` first
element), and argmin ties break toward the lowest cluster id. The DuckDB
mirror unrolls the same iterations as CTEs (plans/queries.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_VEC = "transform({col}, x -> cast(x AS double))"


def _sqdist(v_expr: str, c_expr: str) -> str:
    # left-to-right fold from 0.0: 0.0 + e1 == e1 bit-exactly, so this
    # matches DuckDB's list_reduce((a,b) -> a+b) element order
    return (
        f"aggregate(zip_with({v_expr}, {c_expr}, (x, y) -> (x - y) * (x - y)), "
        f"0D, (acc, e) -> acc + e)"
    )


def _centroid_literal(cents: list[tuple[int, list[float]]]) -> str:
    # repr() is shortest-round-trip, so the parsed literal is the SAME
    # double the quantized centroid aggregation produced
    rows = ", ".join(
        "array(" + ", ".join(repr(float(x)) + "D" for x in vec) + ")"
        for _, vec in cents
    )
    return f"array({rows})"


def _assign_expr(cents: list[tuple[int, list[float]]], vec_col: str) -> Column:
    """0-based index into ``cents`` (ordered by cluster id) of the nearest
    centroid; ties take the first (= lowest cluster id). Pure codegen."""
    v = _VEC.format(col=vec_col)
    dists = f"transform({_centroid_literal(cents)}, c -> {_sqdist(v, 'c')})"
    return F.expr(f"array_position({dists}, array_min({dists}))").cast("int") - 1


def kmeans_fit(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int,
    iterations: int,
    centroid_decimals: int = 4,
) -> list[tuple[int, list[float]]]:
    """Lloyd's iterations; returns [(cluster_id, centroid)] ordered by
    cluster_id (cluster ids are the k initial seed row ids). An empty
    cluster keeps its previous centroid (deterministic, mirrors the
    oracle's left join)."""
    if k < 1 or iterations < 0:
        raise ValueError(f"kmeans_fit: need k >= 1, iterations >= 0")
    seed_rows = (
        df.select(id_col, F.expr(_VEC.format(col=vec_col)).alias("v"))
        .orderBy(id_col)
        .limit(k)
        .collect()
    )  # bounded: k rows
    cents = [(r[id_col], list(r.v)) for r in seed_rows]
    for _ in range(iterations):
        assign = _assign_expr(cents, vec_col)
        upd = (
            df.select(
                assign.alias("slot"),
                F.posexplode(F.expr(_VEC.format(col=vec_col))).alias("pos", "val"),
            )
            .groupBy("slot", "pos")  # k x d keys, map-side combined
            .agg(F.round(F.avg("val"), centroid_decimals).alias("c"))
            .collect()
        )  # bounded: k x d rows
        by_slot: dict[int, dict[int, float]] = {}
        for r in upd:
            by_slot.setdefault(r.slot, {})[r.pos] = r.c
        cents = [
            (cid, [by_slot[i][p] for p in range(len(vec))])
            if i in by_slot else (cid, vec)  # empty cluster: keep previous
            for i, (cid, vec) in enumerate(cents)
        ]
    return cents


def kmeans_assign(
    df: DataFrame,
    vec_col: str,
    cents: list[tuple[int, list[float]]],
) -> DataFrame:
    """``df`` + (cluster, sqdist) under the fitted centroids — one narrow
    codegen pass (the APPLY half; same fit/apply split as PCA/IVF/BPE)."""
    slot = _assign_expr(cents, vec_col)
    cid_lit = F.array(*[F.lit(int(cid)) for cid, _ in cents])
    v = _VEC.format(col=vec_col)
    dists = f"transform({_centroid_literal(cents)}, c -> {_sqdist(v, 'c')})"
    return df.withColumn("cluster", F.element_at(cid_lit, slot + 1)).withColumn(
        "sqdist", F.expr(f"array_min({dists})")
    )
