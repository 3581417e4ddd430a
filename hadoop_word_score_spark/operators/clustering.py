"""Distributed k-means (Lloyd's) over an embedding column.

The general-purpose clustering surface next to PCA and the IVF index
(similarity.py's coarse quantizer is an internal spherical k-means tuned
for cosine cells; this one is user-facing Euclidean k-means with a full
fit/apply API and a value-hash oracle). The reference engine has no
clustering at all; this is EXT surface for the training-data pipeline
(corpus clustering for dedup/mixture decisions, semantic sharding).

Scale design — what does and does not shuffle per iteration:

- assignment is a NARROW map: the k x d centroid matrix (bounded: k<=256,
  d<=4096 -> a few MB) is collected and inlined as a literal expression, so
  "nearest centroid" is one scan-side pass over the corpus (interpreted
  HOF, let-bound so the k x d fold runs once per row) — no crossJoin row
  expansion (n x k rows) and no per-vector shuffle at all.
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

from pyspark.sql import DataFrame
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


def _dists_expr(cents: list[tuple[int, list[float]]], vec_col: str) -> str:
    """k per-centroid squared distances for one row. HOFs are interpreted
    (no codegen CSE), so the cast vector and the distance list are each
    let-bound to evaluate ONCE per row — inlining the distance list into
    both argmin operands would re-run the k x d fold per operand (and see
    kmeans_fit for the worse explode-adjacency trap: 14.2s -> 1.7s total
    on the sf0.1 fit from the two fixes)."""
    v = _VEC.format(col=vec_col)
    from ..functions.hashing import let1

    return let1(
        v, "vv", f"transform({_centroid_literal(cents)}, c -> {_sqdist('vv', 'c')})"
    )


def kmeans_fit(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int,
    iterations: int,
    centroid_decimals: int = 4,
) -> list[tuple[int, list[float]]]:
    """Lloyd's iterations; returns [(cluster_id, centroid)] ordered by
    cluster_id (cluster ids are the k initial seed row ids). A corpus with
    fewer than ``k`` rows fits min(k, n) clusters — the same truncation an
    unrolled oracle's ``LIMIT k`` seed CTE performs, so both sides agree.
    An empty cluster keeps its previous centroid (deterministic)."""
    if k < 1 or iterations < 0:
        raise ValueError(
            f"kmeans_fit: need k >= 1, iterations >= 0 (got {k}, {iterations})"
        )
    seed_rows = (
        df.select(id_col, F.expr(_VEC.format(col=vec_col)).alias("v"))
        .orderBy(id_col)
        .limit(k)
        .collect()
    )  # bounded: k rows
    if not seed_rows:
        raise ValueError("kmeans_fit: empty corpus (fail fast beats NaNs)")
    cents = [(r[id_col], list(r.v)) for r in seed_rows]
    from ..functions.hashing import let1

    for _ in range(iterations):
        # slot + per-dim explode fused into ONE let-bound generator: a slot
        # column projected NEXT TO posexplode gets collapsed into the
        # Generate's child and re-evaluated per EXPLODED row — d x the k x d
        # fold (measured 7.3s -> 0.9s for the sf0.1 update pass). Here the
        # fold runs once per row, then the cheap per-element struct build
        # replicates its bound result.
        v = _VEC.format(col=vec_col)
        gen = let1(
            v,
            "vv",
            let1(
                f"transform({_centroid_literal(cents)}, c -> {_sqdist('vv', 'c')})",
                "ds",
                "transform(vv, (x, i) -> named_struct("
                "'slot', array_position(ds, array_min(ds)) - 1, 'pos', i, 'val', x))",
            ),
        )
        upd = (
            df.select(F.explode(F.expr(gen)).alias("e"))
            .select("e.slot", "e.pos", "e.val")
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
    pass (the APPLY half; same fit/apply split as PCA/IVF/BPE). The k
    distances are computed ONCE per row into a struct both outputs read."""
    from ..functions.hashing import let1

    cid_lit = F.array(*[F.lit(int(cid)) for cid, _ in cents])
    both = let1(
        _dists_expr(cents, vec_col),
        "ds",
        "struct(array_position(ds, array_min(ds)) AS slot, array_min(ds) AS d)",
    )
    return (
        df.withColumn("_km", F.expr(both))
        .withColumn("cluster", F.element_at(cid_lit, F.col("_km.slot").cast("int")))
        .withColumn("sqdist", F.col("_km.d"))
        .drop("_km")
    )
