"""Distributed linear algebra over embedding columns: covariance + PCA.

The pattern every "fit a small model over a huge corpus" job uses: the
corpus-sized pass reduces to FIXED-SIZE sufficient statistics (here the
d-vector of sums and the d x d matrix of cross-product sums, one partial
per partition via Arrow batches), the tiny dense solve (eigendecomposition
of a 64 x 64 matrix) runs on the driver, and the result broadcasts back for
a scan-side projection. Nothing corpus-sized ever shuffles: the only
aggregation is over n_partitions rows of (1 + d + d^2) doubles, and the
projection is a narrow mapInPandas matmul.

Driver-side boundary is the sufficient-statistics collect — bounded by
partition count, not data (same policy class as similarity.py's centroid
pull). At 100 TB with 64-dim vectors the partials total
n_partitions x 33 KB.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def _partials_fn(vec_col: str, d: int):
    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        sx = np.zeros(d)
        sxy = np.zeros((d, d))
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            n += m.shape[0]
            sx += m.sum(axis=0)
            sxy += m.T @ m
        yield pd.DataFrame(
            {"n": [n], "sx": [sx.tolist()], "sxy": [sxy.ravel().tolist()]}
        )

    return partials


def covariance_partials(df: DataFrame, vec_col: str, d: int) -> DataFrame:
    """One row per partition: (n, sx[d], sxy[d*d]) in float64."""
    return df.select(vec_col).mapInPandas(
        _partials_fn(vec_col, d),
        schema="n long, sx array<double>, sxy array<double>",
    )


def covariance_upper_rounded(
    df: DataFrame, vec_col: str, d: int, decimals: int = 3
) -> DataFrame:
    """Upper-triangle population covariance as rows (i, j, cov), all-Spark.

    The distributed sibling of :func:`covariance_matrix`: partials stay in
    DataFrames end to end (no driver collect), aggregated with F.sum over
    the posexploded (1 + d + d^2)-double partial rows. Output is rounded to
    ``decimals`` — callers comparing against a differently-ordered fp
    accumulation (a SQL oracle, another partitioning) need the boundary far
    from summation noise; 3 dp is ~1000x clear of it where 6 dp flaked
    (CORRECTNESS_r06 postmortem).
    """
    from pyspark.sql import functions as F

    p = covariance_partials(df, vec_col, d).localCheckpoint()
    xy = (
        p.select(F.posexplode("sxy").alias("pos", "v"))
        .groupBy("pos")
        .agg(F.sum("v").alias("sxy"))
    )
    x = (
        p.select(F.posexplode("sx").alias("i", "v"))
        .groupBy("i")
        .agg(F.sum("v").alias("sx"))
    )
    n = p.agg(F.sum("n").alias("n"))
    return (
        xy.select(
            (F.col("pos") / d).cast("int").alias("i"),
            (F.col("pos") % d).cast("int").alias("j"),
            "sxy",
        )
        .join(F.broadcast(x), "i")
        .join(F.broadcast(x.select(F.col("i").alias("j"), F.col("sx").alias("sy"))), "j")
        .crossJoin(F.broadcast(n))
        # n == 0 (empty corpus): non-ANSI division yields NULL covariances
        # for every (i, j) — emit ZERO rows instead, matching both the SQL
        # oracle (GROUP BY over nothing) and covariance_matrix's fail-fast
        # spirit (r8 review)
        .filter(F.col("n") > 0)
        .filter(F.col("i") <= F.col("j"))
        .select(
            "i",
            "j",
            # +0.0 normalizes IEEE signed zero after rounding: a tiny
            # negative covariance rounds to -0.0 under DuckDB's ROUND but
            # +0.0 under F.round, and sign-strict hash comparisons (the
            # driver's) treat them as different values (r7 postmortem).
            (
                F.round(
                    F.col("sxy") / F.col("n")
                    - (F.col("sx") / F.col("n")) * (F.col("sy") / F.col("n")),
                    decimals,
                )
                + F.lit(0.0)
            ).alias("cov"),
        )
        .orderBy("i", "j")
    )


def covariance_matrix(df: DataFrame, vec_col: str, d: int) -> tuple[np.ndarray, np.ndarray, int]:
    """(cov[d,d], mean[d], n) — population covariance, one corpus pass."""
    rows = covariance_partials(df, vec_col, d).collect()  # n_partitions rows
    n = sum(r.n for r in rows)
    if n == 0:
        raise ValueError("covariance_matrix: empty corpus (fail fast beats NaNs)")
    sx = np.sum([r.sx for r in rows], axis=0)
    sxy = np.sum([np.asarray(r.sxy).reshape(d, d) for r in rows], axis=0)
    mean = sx / n
    cov = sxy / n - np.outer(mean, mean)
    return cov, mean, n


def pca_fit(cov: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Top-k eigenpairs of a symmetric covariance: (eigvals desc, components
    [k, d]). The dense solve is O(d^3) driver work — microseconds at d=64."""
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:k]
    return w[order], v[:, order].T


def pca_project(
    df: DataFrame, vec_col: str, components: np.ndarray, mean: np.ndarray
) -> DataFrame:
    """Scan-side projection: (df columns minus vec_col) + proj array<double>.

    ``components`` [k, d] and ``mean`` [d] ride into the workers as numpy
    captures of the Arrow UDF closure — KBs, the broadcast-small-model half
    of the fit/apply split.
    """
    comp = np.asarray(components, dtype=np.float64)
    mu = np.asarray(mean, dtype=np.float64)
    out_cols = [c for c in df.columns if c != vec_col]
    # join-then-append breaks when vec_col is the ONLY column (a natural
    # trim before projecting): ", proj ..." is invalid DDL (r8 review)
    parts = [
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.schema.fields
        if f.name != vec_col
    ] + ["proj array<double>"]
    out_schema = ", ".join(parts)

    def project(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            p = (m - mu) @ comp.T
            out = pdf[out_cols].copy()
            out["proj"] = list(p)
            yield out

    return df.mapInPandas(project, schema=out_schema)


def jl_sign_matrix(d: int, k: int) -> list[list[int]]:
    """Deterministic ±1 Johnson-Lindenstrauss projection matrix (Achlioptas
    2003, public: a Rademacher sign matrix satisfies the JL lemma with the
    same guarantees as Gaussian). Entry (j, i) is +1 when the first hex
    digit of md5(f"{j}:{i}") is 0-7, else -1 — reproducible anywhere, and
    embedded as LITERALS in both the Spark expression and the SQL oracle,
    so no runtime hash needs to agree across engines."""
    import hashlib

    return [
        [
            1 if int(hashlib.md5(f"{j}:{i}".encode()).hexdigest()[0], 16) < 8 else -1
            for i in range(d)
        ]
        for j in range(k)
    ]


def random_projection_cols(vec_col: str, d: int, k: int) -> list:
    """One output Column per projected dimension: p_j = <x, s_j> / sqrt(k),
    ROUND(6). Pure codegen — the fold over the literal sign row is a
    sequential left-to-right `aggregate`, matching DuckDB's list_reduce
    order ELEMENT FOR ELEMENT, and sqrt(k) is exact for power-of-4 k — so
    the two engines agree bit-for-bit even before rounding. At 100 TB this
    is a narrow scan-side map: no shuffle, no Python, no state."""
    from pyspark.sql import functions as F

    signs = jl_sign_matrix(d, k)
    scale = float(k) ** 0.5
    cols = []
    for j, row in enumerate(signs):
        lits = ",".join(f"{s}D" for s in row)
        cols.append(
            F.expr(
                f"round(aggregate(zip_with(cast({vec_col} as array<double>),"
                f" array({lits}), (x, y) -> x * y), 0D, (a, b) -> a + b)"
                f" / {scale!r}, 6)"
            ).alias(f"p{j}")
        )
    return cols


def random_projection_oracle_exprs(vec_col: str, d: int, k: int) -> list[str]:
    """The DuckDB mirror of :func:`random_projection_cols`, one SQL
    expression string per output dimension (same literals, same fold
    order, same rounding)."""
    signs = jl_sign_matrix(d, k)
    scale = float(k) ** 0.5
    exprs = []
    for j, row in enumerate(signs):
        lits = ",".join(str(s) for s in row)
        exprs.append(
            # "+ 0.0" = the signed-zero normalizing wrap (the projection is
            # mixed-sign, so a tiny negative CAN round to DuckDB's -0.0)
            f"ROUND(list_reduce(list_transform(range(1, {d + 1}),"
            f" i -> CAST({vec_col}[i] AS DOUBLE) * ([{lits}])[i]),"
            f" (a, b) -> a + b) / {scale!r}, 6) + 0.0 AS p{j}"
        )
    return exprs
