"""Broadcast-Bloom set membership — the 100 TB decontamination path (L4).

The broadcast-join decontamination in plans/queries.py (decontaminate_ngrams)
ships the eval side's raw shingles to every training-side task. That is the
right shape while the eval set is small, but a production held-out suite can
reach 1e9+ distinct n-grams — at which point the thing to broadcast is a
*Bloom filter* of the eval shingles, not the shingles themselves: a 2^30-bit
filter is 128 MB regardless of how many n-grams went in, membership is O(k)
bit probes per shingle, and Bloom's one-sided error means NO false negatives —
every truly contaminated document is flagged; false positives only ever
over-flag, and their rate is a measurable (k·n/m)^k knob.

Build is distributed end-to-end except the final bitmap OR: hashes map to k
bit positions (vectorized Arrow batches), positions are DISTINCT'd — bounded
by m, the bitmap's own bit-size, no matter the input cardinality — and the
driver packs at most m ints into the bitmap it was going to broadcast anyway.
Probe ships the packed bitmap once per executor via SparkContext.broadcast
and tests each document's shingle hashes in one numpy pass per Arrow batch.

Reference scope: hopper19/hadoop-word-score has no dedup/decontamination
operators (ComputeWordScore.java:1-224 is a word-score pipeline); this is
part of the mandated LLM-training-pipeline extension surface.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_SPLITMIX_C1 = np.uint64(0xBF58476D1CE4E5B9)
_SPLITMIX_C2 = np.uint64(0x94D049BB133111EB)
_SPLITMIX_INC = np.uint64(0x9E3779B97F4A7C15)


def _bit_positions(hashes: np.ndarray, m: int, k: int) -> np.ndarray:
    """(len(hashes), k) Bloom bit positions, Kirsch–Mitzenmacher double hashing.

    g_i(x) = h1(x) + i·h2(x) mod m with h1 the raw 64-bit value and h2 a
    splitmix64 finalizer of it (so the two are independent); h2 is forced
    ODD — m is a power of two, so an odd step is coprime with m and the k
    probes land on k distinct bits (an even h2, worst case m/2, would
    collapse them and push the FP rate above (k·n/m)^k). Pure uint64 numpy —
    wrapping multiplies are the hash mix, and the identical function runs on
    both the build and probe side, which is the whole correctness contract.
    """
    x = hashes.astype(np.uint64)
    z = x + _SPLITMIX_INC
    z = (z ^ (z >> np.uint64(30))) * _SPLITMIX_C1
    z = (z ^ (z >> np.uint64(27))) * _SPLITMIX_C2
    z = z ^ (z >> np.uint64(31))
    h1 = x % np.uint64(m)
    h2 = (z % np.uint64(m)) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m)).astype(np.int64)


def _positions_udf(m: int, k: int):
    @pandas_udf("array<long>")
    def pos(hashes: pd.Series) -> pd.Series:
        p = _bit_positions(hashes.to_numpy(dtype=np.int64), m, k)
        return pd.Series(list(p))

    return pos


def build_bloom_bitmap(
    hashes: DataFrame, hash_col: str, m: int = 1 << 22, k: int = 5
) -> np.ndarray:
    """Packed uint8 bitmap (m bits) over a DataFrame of 64-bit hash values.

    hash → k positions runs distributed (Arrow batches); DISTINCT bounds the
    driver collect by m — the size of the bitmap object itself — so the
    collect can never exceed the broadcast this filter exists to replace.
    Eager by necessity (like brute_force_topk's query-side collect): the
    bitmap must exist before the probe plan can close over it.
    """
    if m & (m - 1):
        raise ValueError(f"m must be a power of two (got {m}): the odd-h2 "
                         "double-hashing scheme relies on gcd(h2, m) == 1")
    # explode_OUTER (r16, guide §4.4): the plain generator infers a
    # size()>0 filter below the Generate, and a filter on a UDF column
    # evaluates the positions UDF twice per hash. Position arrays are
    # always length k for a non-null hash, so the outer variant emits the
    # same rows (the null-row case never occurs; the isNotNull filter on
    # the POST-explode column is defensive and cannot duplicate the UDF).
    pos = (
        hashes.select(
            F.explode_outer(_positions_udf(m, k)(F.col(hash_col))).alias("p")
        )
        .filter(F.col("p").isNotNull())
        .distinct()
    )
    idx = pos.toPandas()["p"].to_numpy(dtype=np.int64)
    bitmap = np.zeros(m >> 3, dtype=np.uint8)
    if idx.size:
        np.bitwise_or.at(
            bitmap, idx >> 3, np.uint8(1) << (idx & 7).astype(np.uint8)
        )
    return bitmap


def _hits_udf(bc_bitmap, m: int, k: int):
    """Per-doc count of hash-array members present in the Bloom filter."""

    @pandas_udf("int")
    def hits(hash_arrays: pd.Series) -> pd.Series:
        bitmap = bc_bitmap.value
        arrs = [
            np.asarray(a, dtype=np.int64) if a is not None else np.empty(0, np.int64)
            for a in hash_arrays
        ]
        lens = np.fromiter((len(a) for a in arrs), dtype=np.int64, count=len(arrs))
        out = np.zeros(len(arrs), dtype=np.int32)
        nz = np.flatnonzero(lens)
        if nz.size:
            flat = np.concatenate(arrs)
            p = _bit_positions(flat, m, k)
            member = (
                ((bitmap[p >> 3] >> (p & 7).astype(np.uint8)) & 1).all(axis=1)
            ).astype(np.int64)
            out[nz] = np.add.reduceat(member, (np.cumsum(lens) - lens)[nz])
        return pd.Series(out)

    return hits


def bloom_decontaminate(
    train: DataFrame,
    eval_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    m: int = 1 << 22,
    k: int = 5,
) -> DataFrame:
    """Per-training-doc count of n-gram shingles present in the eval Bloom.

    Returns every training row as (id, n_bloom_hits); n_bloom_hits > 0 means
    "quarantine". Guarantees: n_bloom_hits ≥ the true shared-shingle count
    (no false negatives — a shared shingle hashes identically on both sides,
    so its k bits are necessarily set); per-shingle false-positive rate
    ≈ (k·n_eval_shingles/m)^k, so m is sized to the eval corpus, never to
    the 100 TB training side.
    """
    from ..functions.hashing import text_shingle_hashes_udf

    sh_fn = text_shingle_hashes_udf(n)
    ev_hashes = (
        eval_docs.select(F.explode_outer(sh_fn(F.col(text_col))).alias("h"))
        .filter(F.col("h").isNotNull())
        .distinct()
    )
    bitmap = build_bloom_bitmap(ev_hashes, "h", m, k)
    bc = train.sparkSession.sparkContext.broadcast(bitmap)
    hits = _hits_udf(bc, m, k)
    # Single projection — no filter on the UDF column here (Catalyst would
    # evaluate the UDF once under the Filter and again for the Project).
    return train.select(
        F.col(id_col), hits(sh_fn(F.col(text_col))).alias("n_bloom_hits")
    )
