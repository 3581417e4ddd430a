"""Vector (array<float>) column functions for similarity search (SURVEY §2.10 L3).

All built on Spark's higher-order array functions (``zip_with`` /
``aggregate``) — JVM-evaluated, no Python round-trips. Elements are cast to
double *before* arithmetic and summed strictly left-to-right, which makes the
results bit-reproducible against any oracle that does the same (our DuckDB
oracles sum ``range(...)``-indexed products in the same order).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x: Column | str) -> Column:
    return F.col(x) if isinstance(x, str) else x


def dot(a: Column | str, b: Column | str) -> Column:
    """Σ aᵢ·bᵢ as double (sequential sum)."""
    prods = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """cos(a,b) in double; null/zero-norm propagates to null via nullif."""
    return dot(a, b) / F.nullif(l2_norm(a) * l2_norm(b), F.lit(0.0))
