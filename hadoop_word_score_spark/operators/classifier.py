"""Hashed linear text classifier inference (SURVEY §2.10 L4).

The model-based quality-filtering stage of modern curation pipelines
(fastText-style classifiers in DCLM / FineWeb-Edu): features are hashed
unigrams + adjacent bigrams, the model is a flat weight table indexed by
feature bucket, the decision is a threshold on the mean feature weight.

Scale shape: inference is ONE scan-side aggregate fold per row — the weight
table rides along as a constant-folded literal map (for a table of hundreds
to a few thousand weights, a lookup literal beats broadcasting a join side),
so the most-executed filter of a 100 TB pipeline adds zero shuffles and
stays inside the scan's projection.

Exactness contract: weights are INTEGERS (caller scales a float model by
``weight_scale``), per-document sums are exact int64, and the margin is one
double division — bit-identical across engines, so registry oracles need no
ROUND. Thresholding the margin is equivalent to thresholding
sigmoid(margin) (monotone); no libm exp() enters the comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hashed_linear_score(
    df: DataFrame,
    weights: list[int],
    text_col: str = "text",
    weight_scale: int = 1000,
) -> DataFrame:
    """Append (n_features, margin) under a hashed unigram+bigram model.

    ``weights``: the learned table as integers, length = bucket count;
    real weight of bucket b is ``weights[b] / weight_scale``. Buckets are
    md5-derived (first 8 hex digits mod len(weights)) so an oracle can
    rebuild the identical assignment. Rows with zero tokens are dropped
    (no features to average — the caller decides their fate upstream).
    """
    if not weights:
        raise ValueError("hashed_linear_score: weights must be non-empty")
    if not all(isinstance(w, int) for w in weights):
        raise ValueError(
            "hashed_linear_score: weights must be integers (scale a float "
            "model by weight_scale to keep per-document sums exact)"
        )
    from ..functions.hashing import let1, tokens_expr
    from ..functions.text import DELIM_CLASS

    buckets = len(weights)
    wmap = F.create_map(
        *[F.lit(v) for b, w in enumerate(weights) for v in (b, w)]
    )

    def bucket(x):
        return (
            F.conv(F.substring(F.md5(x.cast("binary")), 1, 8), 16, 10)
            .cast("long") % buckets
        ).cast("int")

    # ONE let1-bound fold tokenizes, builds bigrams, and folds weights in a
    # single evaluation; n_features is size arithmetic over its own
    # tokenization (HOFs have no CSE — see let1's docstring).
    feats_expr = let1(
        tokens_expr(text_col),
        "w",
        "concat(w, CASE WHEN size(w) >= 2 THEN "
        "transform(sequence(1, size(w) - 1), "
        "i -> concat_ws(' ', slice(w, i, 2))) "
        "ELSE cast(array() as array<string>) END)",
    )
    wsum = F.aggregate(
        F.expr(feats_expr),
        F.lit(0).cast("long"),
        lambda acc, x: acc + F.element_at(wmap, bucket(x)),
    )
    ntok = F.size(
        F.filter(F.split(F.col(text_col), DELIM_CLASS), lambda x: x != "")
    ).cast("long")
    return (
        df.select(
            "*",
            F.when(ntok >= 2, 2 * ntok - 1).otherwise(ntok).alias("n_features"),
            wsum.alias("_wsum"),
        )
        .filter(F.col("n_features") >= 1)
        .select(
            *df.columns,
            "n_features",
            (
                F.col("_wsum") / (F.col("n_features") * F.lit(float(weight_scale)))
            ).alias("margin"),
        )
    )
