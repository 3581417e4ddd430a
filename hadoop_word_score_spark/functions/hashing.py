"""Hash-family column functions: shingles, MinHash signatures, SimHash.

All pure Spark SQL expressions (xxhash64 is a JVM built-in — evaluated inside
whole-stage codegen, shuffled nowhere until the explicit groupBy). These back
the near-dup operators in operators/dedup.py (SURVEY §2.10 L2).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .text import DELIM_CLASS_SQL


def tokens_expr(text_col: str) -> str:
    """SQL expr: whitespace tokens with empties dropped (tokenizer parity).

    Uses the SQL-escaped delimiter class: inside a Spark SQL string literal,
    single backslashes are consumed by the *literal* parser first ('\\f' has no
    SQL escape → literal 'f' would become a delimiter and mangle every
    f-word). DELIM_CLASS is for the PySpark column API only.
    """
    return f"array_remove(split({text_col}, '{DELIM_CLASS_SQL}'), '')"


def shingles_expr(text_col: str, n: int = 3) -> str:
    """SQL expr: distinct word n-gram shingles of ``text_col``.

    Short docs (< n tokens) yield an empty array — the CASE guard matters
    because Spark's sequence(1, 0) counts *down* rather than returning empty.
    """
    toks = tokens_expr(text_col)
    return (
        f"CASE WHEN size({toks}) >= {n} THEN "
        f"array_distinct(transform(sequence(1, size({toks}) - {n - 1}), "
        f"i -> concat_ws(' ', slice({toks}, i, {n})))) "
        f"ELSE array() END"
    )


def shingles(text_col: str, n: int = 3) -> Column:
    return F.expr(shingles_expr(text_col, n))


def minhash_signature(shingle_col: str, num_hashes: int = 32) -> Column:
    """MinHash signature: array of ``num_hashes`` 64-bit minima.

    Hash family h_s(x) = xxhash64(s, x) — one seed per signature slot, all
    computed in a single pass over the shingle array (no per-hash shuffle).
    Empty shingle set → null signature (caller filters).
    """
    return F.expr(
        f"CASE WHEN size({shingle_col}) > 0 THEN "
        f"transform(sequence(0, {num_hashes - 1}), "
        f"s -> array_min(transform({shingle_col}, sh -> xxhash64(s, sh)))) "
        f"ELSE NULL END"
    )


def band_hashes(signature_col: str, bands: int, rows: int) -> Column:
    """LSH banding: hash each of ``bands`` contiguous ``rows``-slices.

    Docs agreeing on any band land in the same bucket — the standard
    (b, r) S-curve tradeoff: P(candidate) = 1 - (1 - j^r)^b for Jaccard j.
    """
    return F.expr(
        f"transform(sequence(0, {bands - 1}), "
        f"b -> xxhash64(b, concat_ws(',', slice({signature_col}, b * {rows} + 1, {rows}))))"
    )


def simhash64(text_col: str) -> Column:
    """64-bit SimHash over whitespace tokens — one expression, no shuffle.

    For each bit j: sum ±1 over tokens (sign of token-hash bit j), then set
    bit j if the sum is positive. Token multiplicity counts (classic SimHash).
    """
    toks = tokens_expr(text_col)
    return F.expr(
        f"aggregate(sequence(0, 63), 0L, (acc, j) -> acc + CASE WHEN "
        f"aggregate({toks}, 0L, (s, t) -> s + CASE WHEN ((xxhash64(t) >> j) & 1) = 1 "
        f"THEN 1 ELSE -1 END) > 0 THEN shiftleft(1L, j) ELSE 0L END)"
    )
