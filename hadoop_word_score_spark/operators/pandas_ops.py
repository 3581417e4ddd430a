"""Grouped pandas-UDF operators (SURVEY §2.11): the sanctioned Python path.

Policy: built-in expressions first (whole-stage codegen); these exist for
semantics that genuinely need per-group imperative code — and to keep the
plumbing (Arrow batching, group iteration, schema contracts) exercised and
tested. Both operators here are *deliberately* SQL-expressible so the DuckDB
oracle can verify the UDF machinery end-to-end; real users substitute the
model-scoring / featurization logic that isn't.

Scale: applyInPandas shuffles each group to one task — groups must fit in
executor memory (fine for per-entity groups; wrong for one giant group —
salt first, see operators/skew.py). Grouped-agg pandas UDFs get no partial
aggregation: unlike built-in sum/avg there is no map-side combine, so prefer
built-ins for algebraic aggregates at 100 TB.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def zscore_per_group(
    df: DataFrame, group_col: str, id_col: str, value_col: str
) -> DataFrame:
    """Grouped-map applyInPandas: z-score of ``value_col`` within each group.

    Population stddev (ddof=0); zero-variance groups yield null (matches the
    SQL NULLIF oracle). Output: (group, id, value, zscore).
    """
    schema = T.StructType([
        T.StructField(group_col, df.schema[group_col].dataType),
        T.StructField(id_col, df.schema[id_col].dataType),
        T.StructField(value_col, T.DoubleType()),
        T.StructField("zscore", T.DoubleType()),
    ])

    def norm(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[value_col].astype("float64")
        sd = v.std(ddof=0)
        z = (v - v.mean()) / sd if sd > 0 else pd.Series([None] * len(v), dtype="float64")
        return pd.DataFrame(
            {
                group_col: pdf[group_col],
                id_col: pdf[id_col],
                value_col: v,
                # quant6 doctrine (operators/multimodal.py): floor over
                # IDENTICAL double ops is bit-identical in any engine,
                # while pandas .round is half-EVEN and SQL ROUND half-away
                # — they disagree on exact dyadic 6-dp ties (e.g.
                # 0.1015625 -> 0.101562 vs 0.101563, r8 review). + 0.0
                # keeps the IEEE sign normalization.
                "zscore": np.floor(z * 1e6 + 0.5) / 1e6 + 0.0,
            }
        )

    from ..session import default_parallelism

    return (
        df.select(group_col, id_col, value_col)
        # explicit group-key exchange width: grouped-Python cost is per
        # group, not per byte — AQE's size-based coalescing would fold the
        # stage onto 1-2 cores at small-shuffle sizes (see events_ewma_value)
        .repartition(default_parallelism(), group_col)
        .groupBy(group_col)
        .applyInPandas(norm, schema=schema)
    )


def weighted_avg_udf():
    """Grouped-agg pandas UDF: Σ(v·w)/Σ(w) over the group, as double."""

    @F.pandas_udf("double")
    def wavg(v: pd.Series, w: pd.Series) -> float:
        denom = w.sum()
        return float((v * w).sum() / denom) if denom else None

    return wavg


def nfc_normalize_udf():
    """Arrow-vectorized Unicode NFC normalization (string -> string).

    Canonical normalization is the text stack's stage-1.5 (decomposed
    sequences like 'e' + U+0301 must compare, hash, dedup and tokenize
    identically to their composed forms — every downstream exact-dedup
    hash and vocab key silently fragments otherwise). Spark has no
    built-in normalizer, so this is one of the engine's few sanctioned
    pandas UDFs (policy: built-ins first; normalization genuinely lacks
    one). pandas' ``Series.str.normalize`` applies unicodedata.normalize
    over each Arrow batch; nulls pass through.
    """

    @F.pandas_udf("string")
    def nfc(s: pd.Series) -> pd.Series:
        return s.str.normalize("NFC")

    return nfc
