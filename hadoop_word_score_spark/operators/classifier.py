"""Hashed linear text classifier: training and inference (SURVEY §2.10 L4).

The model-based quality-filtering stage of modern curation pipelines
(fastText-style classifiers in DCLM / FineWeb-Edu): features are hashed
unigrams + adjacent bigrams (`functions/hashing.unigram_bigram_feats_expr`
— one source of truth shared by training, serving, and the registry
oracle), the model is a flat weight table indexed by feature bucket, the
decision is a threshold on the mean feature weight.

Scale shape: inference is ONE scan-side aggregate fold per row — the weight
table rides along as a constant-folded literal map (for a table of hundreds
to a few thousand weights, a lookup literal beats broadcasting a join side),
so the most-executed filter of a 100 TB pipeline adds zero shuffles and
stays inside the scan's projection. Training (``train_hashed_logreg``)
keeps corpus-sized work scan-side and shuffles only bucket-cardinality
gradient partials per iteration.

Exactness contract: serving weights are INTEGERS (callers scale a float
model by ``weight_scale``), per-document sums are exact int64, and the
margin is one double division — bit-identical across engines, so registry
oracles need no ROUND. Thresholding the margin is equivalent to
thresholding sigmoid(margin) (monotone); no libm exp() enters the
comparison.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(x: Column, buckets: int) -> Column:
    """md5-derived feature bucket (first 8 hex digits mod ``buckets``) —
    the recipe an oracle can rebuild; shared by training and serving."""
    return (
        F.conv(F.substring(F.md5(x.cast("binary")), 1, 8), 16, 10)
        .cast("long") % buckets
    ).cast("int")


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
    from ..functions.hashing import unigram_bigram_feats_expr
    from ..functions.text import DELIM_CLASS

    buckets = len(weights)
    wmap = F.create_map(
        *[F.lit(v) for b, w in enumerate(weights) for v in (b, w)]
    )
    # ONE let1-bound fold tokenizes, builds bigrams, and folds weights in a
    # single evaluation; n_features is size arithmetic over its own
    # tokenization (HOFs have no CSE — see let1's docstring).
    wsum = F.aggregate(
        F.expr(unigram_bigram_feats_expr(text_col)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + F.element_at(wmap, _bucket(x, buckets)),
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
    are strictly 0/1 (``label_col`` — anything else fails fast in-plan);
    features are mean-pooled hashed unigram+bigram counts
    (x_b = cnt_b / n_features), matching the serving operator's margin
    definition exactly.

    Per iteration, ONE Spark action AND one margin-fold evaluation per
    document: the current weights ride into the scan as a literal array,
    the per-document residual (sigmoid(margin + bias) - y) is computed
    scan-side, and everything downstream derives from the materialized
    residual attribute below the explode — including the log-loss, which
    for y in {0,1} is -log(1 - |resid|), so the fold is never re-evaluated
    (HOFs have no CSE). The gradient arrives as a ``buckets``-cardinality
    aggregation of (bucket, resid * x) partials — map-side combined, so
    shuffle bytes are O(buckets x partitions) regardless of corpus size.
    The bias gradient, the loss, and the document-count normalizer need no
    extra pass: mean-pooled features sum to 1 per document, so spreading
    resid/n, loss/n, and 1/n over a document's feature rows makes their
    global sums equal sum(resid), sum(loss), and N. Gradients are means
    over N (lr is corpus-size-invariant).

    Returns (weights, bias, per-iteration loss history). Serving export:
    mean-pooled features summing to 1 also means the bias FOLDS EXACTLY
    into the weight table — ``export_weights`` hands
    ``hashed_linear_score`` a table whose margin sign reproduces the
    trained decision boundary (up to integer quantization).
    """
    from ..functions.hashing import unigram_bigram_feats_expr

    w = [0.0] * buckets
    bias = 0.0
    history: list[float] = []
    feats = F.expr(unigram_bigram_feats_expr(text_col))
    label_guard = F.assert_true(
        (F.col("y") == 0.0) | (F.col("y") == 1.0),
        F.concat(
            F.lit("train_hashed_logreg: labels must be 0/1, got "),
            F.col("y").cast("string"),
        ),
    )
    docs = df.select(
        F.col(label_col).cast("double").alias("y"), feats.alias("fs")
    ).filter(F.size("fs") >= 1)

    for _ in range(iters):
        # repr() round-trips exactly, so the literal the scan folds over is
        # the SAME float64 the driver holds (the kmeans literal contract)
        w_lit = F.expr("array(" + ",".join(f"{x!r}D" for x in w) + ")")
        margin = F.aggregate(
            F.col("fs"),
            F.lit(0.0),
            lambda acc, x: acc + F.element_at(w_lit, _bucket(x, buckets) + 1),
        ) / F.size("fs")
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-(margin + F.lit(bias))))
        scored = docs.select(
            "fs",
            F.when(label_guard.isNull(), p - F.col("y")).alias("resid"),
            F.size("fs").cast("double").alias("nf"),
        )
        # loss derives from the RESIDUAL attribute (for y in {0,1} the
        # correct-class probability is 1 - |resid|), evaluated above the
        # Generate where resid is already materialized — never a second
        # run of the O(n_features) fold (review r12).
        loss_term = -F.log(
            F.greatest(1 - F.abs(F.col("resid")), F.lit(1e-12))
        )
        parts = (
            scored.select(F.explode("fs").alias("f"), "resid", "nf")
            .groupBy(_bucket(F.col("f"), buckets).alias("b"))
            .agg(
                F.sum(F.col("resid") / F.col("nf")).alias("g"),
                F.sum(loss_term / F.col("nf")).alias("ls"),
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
