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


def _feats_sql(text_col: str) -> str:
    """SQL expr: hashed-model feature list (unigrams + adjacent bigrams)."""
    from ..functions.hashing import let1, tokens_expr

    return let1(
        tokens_expr(text_col),
        "w",
        "concat(w, CASE WHEN size(w) >= 2 THEN "
        "transform(sequence(1, size(w) - 1), "
        "i -> concat_ws(' ', slice(w, i, 2))) "
        "ELSE cast(array() as array<string>) END)",
    )


def train_hashed_logreg(
    df: DataFrame,
    label_col: str,
    text_col: str = "text",
    buckets: int = 256,
    iters: int = 20,
    lr: float = 2.0,
    l2: float = 0.0,
) -> tuple[list[float], float, list[float]]:
    """Fit the hashed linear quality classifier by logistic regression.

    The fit side of ``hashed_linear_score`` (the kmeans_fit pattern:
    driver-bounded model state, corpus-sized work stays scan-side). Labels
    are 0/1 (``label_col``); features are mean-pooled hashed unigram+bigram
    counts (x_b = cnt_b / n_features), matching the serving operator's
    margin definition exactly.

    Per iteration, ONE Spark action: the current weights ride into the
    scan as a literal array, the per-document residual (sigmoid(margin +
    bias) - y) is computed scan-side, and the gradient arrives as a
    ``buckets``-cardinality aggregation of (bucket, resid * x) partials —
    map-side combined, so shuffle bytes are O(buckets x partitions)
    regardless of corpus size. The bias gradient, the log-loss, AND the
    document-count normalizer need no extra pass: mean-pooled features sum
    to 1 per document, so spreading resid/n, loss/n, and 1/n over a
    document's feature rows makes their global sums equal sum(resid),
    sum(loss), and N. Gradients are means over N (lr is corpus-size-
    invariant).

    Returns (weights, bias, per-iteration loss history). Serving export:
    mean-pooled features summing to 1 also means the bias FOLDS EXACTLY
    into the weight table — ``export_weights`` hands
    ``hashed_linear_score`` a table whose margin sign reproduces the
    trained decision boundary (up to integer quantization).
    """
    w = [0.0] * buckets
    bias = 0.0
    history: list[float] = []
    feats = F.expr(_feats_sql(text_col))
    docs = df.select(
        F.col(label_col).cast("double").alias("y"), feats.alias("fs")
    ).filter(F.size("fs") >= 1)

    def bucket(x):
        return (
            F.conv(F.substring(F.md5(x.cast("binary")), 1, 8), 16, 10)
            .cast("long") % buckets
        ).cast("int")

    for _ in range(iters):
        # repr() round-trips exactly, so the literal the scan folds over is
        # the SAME float64 the driver holds (the kmeans literal contract)
        w_lit = F.expr("array(" + ",".join(f"{x!r}D" for x in w) + ")")
        margin = F.aggregate(
            F.col("fs"),
            F.lit(0.0),
            lambda acc, x: acc + F.element_at(w_lit, bucket(x) + 1),
        ) / F.size("fs")
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-(margin + F.lit(bias))))
        scored = docs.select(
            "fs",
            (p - F.col("y")).alias("resid"),
            # per-doc log-loss, clamped away from log(0)
            (
                -(
                    F.col("y") * F.log(F.greatest(p, F.lit(1e-12)))
                    + (1 - F.col("y"))
                    * F.log(F.greatest(1 - p, F.lit(1e-12)))
                )
            ).alias("loss"),
            F.size("fs").cast("double").alias("nf"),
        )
        parts = (
            scored.select(
                F.explode("fs").alias("f"), "resid", "loss", "nf"
            )
            .groupBy(bucket(F.col("f")).alias("b"))
            .agg(
                F.sum(F.col("resid") / F.col("nf")).alias("g"),
                F.sum(F.col("loss") / F.col("nf")).alias("ls"),
                # one occurrence contributes 1/nf, so this sums to the
                # document count — the gradient normalizer rides along
                F.sum(F.lit(1.0) / F.col("nf")).alias("n"),
            )
            .collect()
        )
        n_docs = sum(r["n"] for r in parts)
        if n_docs == 0:
            break  # empty corpus: nothing to fit
        grad = [0.0] * buckets
        grad_b = 0.0
        loss = 0.0
        for r in parts:
            grad[r["b"]] = r["g"] / n_docs
            grad_b += r["g"] / n_docs
            loss += r["ls"] / n_docs
        w = [wi - lr * (gi + l2 * wi) for wi, gi in zip(w, grad)]
        bias -= lr * grad_b
        history.append(loss)
    return w, bias, history


def export_weights(
    weights: list[float], bias: float, weight_scale: int = 1000
) -> list[int]:
    """Quantize a trained (weights, bias) pair into the integer table
    ``hashed_linear_score`` serves: because mean-pooled features sum to 1,
    margin + bias == mean of (w_b + bias), so the bias folds into every
    entry exactly and the served sign(margin) reproduces the trained
    decision boundary up to the 1/weight_scale quantization grid."""
    return [round((x + bias) * weight_scale) for x in weights]
