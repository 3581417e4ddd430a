"""Property-based tests (SURVEY §5.2 #3) via hypothesis.

Each property pins an algebraic invariant of an operator against a tiny
pure-Python reference model, over adversarial generated inputs — the cases
golden fixtures don't think to write (delimiter runs, unicode, empty docs,
duplicate rows).
"""

from __future__ import annotations

import re

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from hadoop_word_score_spark.operators.wordscore import word_score

# StringTokenizer's default delimiter set (CWS:116-120) — NOT \s (which would
# also eat \x0b vertical tab,  , etc.)
DELIMS = " \t\n\r\f"

# text over words + delimiter runs + some non-delimiter whitespace lookalikes
_token_alphabet = st.sampled_from(list("abXY.,!\x0b "))
_texts = st.lists(
    st.one_of(
        st.text(_token_alphabet, min_size=1, max_size=4),
        st.sampled_from([" ", "\t", "\n", "\r", "\f", "  ", " \t\n"]),
    ),
    max_size=12,
).map("".join)


def ref_tokenize(text: str) -> list[str]:
    """Pure-Python model of java.util.StringTokenizer's default behavior."""
    return [t for t in re.split(f"[{DELIMS}]+", text) if t != ""]


@settings(max_examples=25, deadline=None)
@given(st.lists(st.tuples(st.integers(1, 5), _texts), min_size=1, max_size=6))
def test_wordscore_matches_reference_model(spark, rows):
    reviews = spark.createDataFrame(
        [(float(s), t) for s, t in rows], "stars double, text string"
    )
    got = {r.word: r.score for r in word_score(reviews).collect()}
    mod = {1: -2, 2: -1, 3: 0, 4: 1, 5: 2}
    want: dict[str, int] = {}
    for s, t in rows:
        for tok in ref_tokenize(t):
            want[tok] = want.get(tok, 0) + mod[s]
    assert got == want


@settings(max_examples=15, deadline=None)
@given(st.lists(st.tuples(st.integers(1, 5), _texts), min_size=1, max_size=6))
def test_wordscore_conservation(spark, rows):
    # Σ per-word scores == Σ modifier × token-count over all reviews
    reviews = spark.createDataFrame(
        [(float(s), t) for s, t in rows], "stars double, text string"
    )
    total = word_score(reviews).agg(F.sum("score")).collect()[0][0] or 0
    mod = {1: -2, 2: -1, 3: 0, 4: 1, 5: 2}
    want = sum(mod[s] * len(ref_tokenize(t)) for s, t in rows)
    assert total == want


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 4), st.sampled_from(["x", "y", "z"])),
        min_size=1,
        max_size=12,
    )
)
def test_exact_dedup_idempotent_and_partitions_input(spark, rows):
    from hadoop_word_score_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame(
        [(i, f"content-{c}") for i, (_, c) in enumerate(rows)], "id long, body string"
    )
    once = exact_dedup(df, ["body"], "id")
    got = {r.content_hash: (r.keep_id, r.n_copies) for r in once.collect()}
    # survivors partition the input: copies sum to input size, one survivor
    # per distinct content, survivor is the min id of its group
    assert sum(n for _, n in got.values()) == len(rows)
    bodies = {}
    for i, (_, c) in enumerate(rows):
        bodies.setdefault(f"content-{c}", []).append(i)
    assert len(got) == len(bodies)
    assert sorted(k for k, _ in got.values()) == sorted(min(v) for v in bodies.values())
    # idempotence: dedup of survivors is a no-op
    survivors = df.join(
        once.select(F.col("keep_id").alias("id")), "id", "left_semi"
    )
    again = exact_dedup(survivors, ["body"], "id")
    assert {r.keep_id for r in again.collect()} == {k for k, _ in got.values()}
    assert all(r.n_copies == 1 for r in again.collect())


@settings(max_examples=20, deadline=None)
@given(st.lists(_texts, min_size=1, max_size=8))
def test_python_tokenizer_matches_sql_tokenizer(spark, texts):
    # the fused minhash UDF re-implements tokenization in Python; it must
    # agree with the engine's SQL tokens_expr on every input
    from hadoop_word_score_spark.functions.hashing import tokens_expr
    from pyspark.sql import functions as FF

    df = spark.createDataFrame([(t,) for t in texts], "text string")
    sql_tokens = [
        r.toks for r in df.select(FF.expr(tokens_expr("text")).alias("toks")).collect()
    ]
    assert sql_tokens == [ref_tokenize(t) for t in texts]


@settings(max_examples=10, deadline=None)
@given(st.lists(st.integers(-1000, 1000), min_size=1, max_size=30))
def test_global_sort_is_permutation_invariant(spark, xs):
    df = spark.createDataFrame([(x,) for x in xs], "v long")
    got = [r.v for r in df.orderBy(F.desc("v")).collect()]
    assert got == sorted(xs, reverse=True)


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.one_of(st.none(), st.text(max_size=12)),
            st.one_of(st.none(), st.text(max_size=12)),
        ),
        min_size=1,
        max_size=8,
        unique=True,
    )
)
def test_content_hash_injective_and_matches_sql(spark, rows):
    # Distinct (t1, t2) tuples — including NULLs in any position and values
    # containing the encoding's own marker characters — must get distinct
    # hashes, and the DuckDB rendering must agree byte-for-byte.
    import duckdb

    from hadoop_word_score_spark.operators.dedup import (
        content_hash_col,
        content_hash_sql,
    )

    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(rows)],
        "doc_id long, t1 string, t2 string",
    )
    got = {
        r.doc_id: r.h
        for r in df.select(
            "doc_id", content_hash_col(["t1", "t2"]).alias("h")
        ).collect()
    }
    assert len(set(got.values())) == len(rows)  # injective on distinct inputs
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t (doc_id BIGINT, t1 VARCHAR, t2 VARCHAR)"
    )
    con.executemany(
        "INSERT INTO t VALUES (?, ?, ?)",
        [(i, a, b) for i, (a, b) in enumerate(rows)],
    )
    want = dict(
        con.execute(
            f"SELECT doc_id, {content_hash_sql(['t1', 't2'])} FROM t"
        ).fetchall()
    )
    assert got == want


@settings(max_examples=50, deadline=None)
@given(
    st.integers(1, 40),
    st.integers(1, 40),
    st.integers(0, 2**32 - 1),
    st.sampled_from(["ppm", "pgm", "bmp"]),
)
def test_codec_roundtrip_property(w, h, seed, fmt):
    # decode(encode(x)) == x for arbitrary dims/content in every built-in
    # format — including the BMP row-padding edge cases (w % 4 != 0) that a
    # single golden fixture can't sweep
    import numpy as np

    from hadoop_word_score_spark.functions import codecs

    rng = np.random.default_rng(seed)
    if fmt == "pgm":
        gray = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        back = codecs.decode_rgb(codecs.encode_pgm(gray))
        assert back.shape == (h, w, 3)
        assert np.array_equal(back[:, :, 0], gray)
        assert np.array_equal(back[:, :, 2], gray)
    else:
        rgb = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        enc = codecs.encode_ppm(rgb) if fmt == "ppm" else codecs.encode_bmp24(rgb)
        assert np.array_equal(codecs.decode_rgb(enc), rgb)


@settings(max_examples=30, deadline=None)
@given(st.integers(1, 60), st.integers(1, 60), st.integers(1, 16), st.integers(1, 16))
def test_resize_nearest_property(w, h, tw, th):
    # nearest-neighbour resample: every output pixel is SOME input pixel,
    # dims are exact, and identity-resize is a no-op
    import numpy as np

    from hadoop_word_score_spark.functions import codecs

    img = np.arange(w * h, dtype=np.uint64).reshape(h, w) % 251
    out = codecs.resize_nearest(img, tw, th)
    assert out.shape == (th, tw)
    assert np.isin(out, img).all()
    assert np.array_equal(codecs.resize_nearest(img, w, h), img)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.sampled_from("abcdefgh"), min_size=1, max_size=400),
    st.integers(2, 12),
)
def test_misra_gries_summary_guarantee(tokens, capacity):
    # Mergeable-summaries invariants (pure pandas path of
    # operators/frequent.py): (1) any term with true count > N/(capacity+1)
    # survives; (2) every reported count underestimates by at most
    # N/(capacity+1); (3) the summary never exceeds capacity after pruning.
    from collections import Counter

    import pandas as pd

    from hadoop_word_score_spark.operators.frequent import _mg_summarize

    # feed as several batches to exercise the cross-batch merge rule
    batches = [
        pd.DataFrame({"term": tokens[i : i + 64]}) for i in range(0, len(tokens), 64)
    ]
    [summary] = list(_mg_summarize("term", capacity)(iter(batches)))
    got = dict(zip(summary["term"], summary["mg_count"]))
    true = Counter(tokens)
    n = len(tokens)
    # the sentinel row (term None) must carry the partition's exact raw
    # token total — it feeds the N/(capacity+1) exactness threshold
    assert got.pop(None) == n
    err = n / (capacity + 1)
    for term, c in true.items():
        if c > err:
            assert term in got, (term, c, err, got)
    for term, c in got.items():
        assert c <= true[term]
        assert true[term] - c <= err, (term, c, true[term], err)


def _ref_bpe_merge(tokens: list[str], pair: tuple[str, str], joiner: str) -> list[str]:
    """Reference left-to-right non-overlapping pair merge on a token list."""
    out, i = [], 0
    while i < len(tokens):
        if i + 1 < len(tokens) and (tokens[i], tokens[i + 1]) == pair:
            out.append(tokens[i] + joiner + tokens[i + 1])
            i += 2
        else:
            out.append(tokens[i])
            i += 1
    return out


def test_bpe_merge_expr_matches_reference_fold(spark):
    # operators/bpe.py merges with an aggregate-HOF fold over the token
    # array; prove it equals the token-list fold BPE is defined by
    # (Sennrich et al. 2016) on the adversarial shapes: odd/even runs of
    # the pair ("a a a" -> "(aa) a", "a a a a" -> "(aa) (aa)" — the case a
    # space-delimited string replace gets wrong), the pair as a token
    # SUFFIX ("xa a" must not merge), self-pairs, and empties. One Spark
    # job evaluates every case.
    import itertools
    import random

    from hadoop_word_score_spark.operators.bpe import (
        JOINER,
        merge_pair_expr,
    )

    rng = random.Random(6)
    cases = [
        [], ["a"], ["a", "a"], ["a", "a", "a"], ["a", "a", "a", "a"],
        ["a", "a", "a", "a", "a"], ["a", "a", "a", "a", "a", "a"],
        ["xa", "a"], ["a", "ax"], ["b", "a", "a", "b"],
        ["a", "b", "a", "b", "a"], [f"a{JOINER}b", "a", "b"],
    ] + [
        [rng.choice(["a", "b", "xa"]) for _ in range(rng.randint(2, 12))]
        for _ in range(40)
    ]
    pairs = [("a", "a"), ("a", "b"), ("b", "a")]
    rows = [
        (i, " ".join(toks))
        for i, (toks, _) in enumerate(itertools.product(cases, pairs))
    ]
    df = spark.createDataFrame(rows, "case_id long, txt string")
    sel = [F.col("case_id")]
    for j, (pa, pb) in enumerate(pairs):
        sel.append(merge_pair_expr(F.col("txt"), pa, pb).alias(f"m{j}"))
    got = {r.case_id: r for r in df.select(sel).collect()}
    for i, (toks, _) in enumerate(itertools.product(cases, pairs)):
        for j, pair in enumerate(pairs):
            want = " ".join(_ref_bpe_merge(toks, pair, JOINER))
            assert got[i][f"m{j}"] == want, (toks, pair, got[i][f"m{j}"], want)


def test_jvm_round_never_emits_negative_zero(spark):
    # The signed-zero invariant tools/signed_zero_audit.py relies on: Spark's
    # F.round goes through BigDecimal (which has no -0) so a tiny negative
    # rounding to zero yields +0.0 — only DuckDB's ROUND keeps the IEEE sign,
    # hence oracles wrap exposed sites with "+ 0.0" (VERDICT r7 item 1).
    import math

    from pyspark.sql import functions as F

    row = spark.range(1).select(
        F.round(F.lit(-1e-9), 6).alias("a"),
        F.round(F.lit(-4.9e-7), 6).alias("b"),
        F.round(F.lit(-0.0), 2).alias("c"),
    ).collect()[0]
    for v in row:
        assert v == 0.0 and math.copysign(1.0, v) > 0


def test_signed_zero_audit_is_clean():
    # Every ROUND site in every oracle is either "+ 0.0"-wrapped or carries a
    # written non-negativity proof in the audit's allowlist.
    import importlib.util
    from pathlib import Path

    path = Path(__file__).resolve().parent.parent / "tools" / "signed_zero_audit.py"
    spec = importlib.util.spec_from_file_location("signed_zero_audit", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert mod.audit() == []


def test_numpy_pandas_round_sites_normalize_negative_zero():
    # np.round/pandas .round PRESERVE -0.0 — the two pandas-rounded operators
    # must "+ 0.0" after rounding (similarity scoring, grouped z-score).
    import math

    import numpy as np
    import pandas as pd

    assert math.copysign(1.0, float(np.round(-1e-9, 6))) < 0  # the hazard
    assert math.copysign(1.0, float(np.round(-1e-9, 6) + 0.0)) > 0  # the fix
    z = pd.Series([-1e-9]).round(6) + 0.0
    assert math.copysign(1.0, float(z.iloc[0])) > 0


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.lists(
            st.floats(-8, 8, allow_nan=False, allow_infinity=False, width=32),
            min_size=3, max_size=3,
        ),
        min_size=2, max_size=12, unique_by=tuple,
    )
)
def test_kmeans_assignment_matches_numpy_argmin(spark, vectors):
    # The JVM assignment expression (let-bound interpreted HOF fold) must
    # agree with a numpy reference argmin on arbitrary float32-ish inputs —
    # including ties, where both take the lowest slot (np.argmin returns
    # the first minimum; the expr uses array_position of array_min).
    import numpy as np

    from hadoop_word_score_spark.operators.clustering import kmeans_assign

    cents_list = vectors[: min(4, len(vectors))]
    cents = [(i * 10, [float(x) for x in v]) for i, v in enumerate(cents_list)]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vectors)],
        "id long, vec array<double>",
    )
    got = {
        r.id: (r.cluster, r.sqdist)
        for r in kmeans_assign(df, "vec", cents).collect()
    }
    C = np.array([c for _, c in cents], dtype=np.float64)
    for i, v in enumerate(vectors):
        d = ((np.array(v, dtype=np.float64)[None, :] - C) ** 2).sum(axis=1)
        slot = int(np.argmin(d))
        assert got[i][0] == cents[slot][0], (i, v, got[i], d.tolist())
        assert abs(got[i][1] - float(d[slot])) <= 1e-9 * max(1.0, float(d[slot]))


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.integers(0, 20),  # heavy ties in the sort key — the id tiebreak
        min_size=0,
        max_size=60,
    )
)
def test_global_rank_matches_python_sort_with_ties(spark, keys):
    from hadoop_word_score_spark.operators.rank import global_rank

    rows = [(i, k) for i, k in enumerate(keys)]
    df = spark.createDataFrame(rows, "id int, k int") if rows else (
        spark.createDataFrame([], "id int, k int")
    )
    out = global_rank(df.repartition(5), ["k", "id"]).collect()
    got = [(r.k, r.id) for r in sorted(out, key=lambda r: r.grank)]
    assert got == sorted((k, i) for i, k in enumerate(keys))
    assert sorted(r.grank for r in out) == list(range(1, len(keys) + 1))


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 400), st.integers(1, 80)),  # (start, length)
        min_size=0,
        max_size=40,
    )
)
def test_concurrency_profile_matches_serial_sweep(spark, spans):
    from hadoop_word_score_spark.operators.intervals import (
        concurrency_profile,
    )

    iv = [(s, s + d) for s, d in spans]
    events = sorted(
        [(s, 1) for s, e in iv] + [(e, -1) for s, e in iv],
        key=lambda x: (x[0], x[1]),
    )
    level = 0
    expected: dict[int, int] = {}
    for ts, dlt in events:
        b = ts - ts % 60
        expected.setdefault(b, level)
        level += dlt
        expected[b] = max(expected[b], level)
    df = (
        spark.createDataFrame(iv, "start_s int, end_s int")
        if iv
        else spark.createDataFrame([], "start_s int, end_s int")
    )
    got = {
        r.bucket_start_s: r.max_concurrency
        for r in concurrency_profile(df, bucket_seconds=60).collect()
    }
    assert got == expected


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.lists(
            st.sampled_from("alpha beta gamma delta eps zeta eta theta".split()),
            min_size=3,
            max_size=12,
        ),
        min_size=2,
        max_size=8,
    ),
    st.sampled_from([0.3, 0.5, 0.8]),
)
def test_jaccard_prefix_equals_yardstick_property(spark, word_lists, threshold):
    # randomized exactness: the prefix lemma + ratio filter + PPJoin
    # positional filter must lose NO pair and admit NO extra pair at any
    # threshold, on tiny-vocab corpora engineered for heavy overlap (the
    # regime where a wrong bound would actually bite)
    from hadoop_word_score_spark.operators.dedup import (
        jaccard_prefix_filter_pairs,
        ngram_jaccard_pairs,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(word_lists)],
        "doc_id long, text string",
    )
    exact = {
        (r.id_a, r.id_b): r.n_common
        for r in ngram_jaccard_pairs(docs, threshold=threshold).collect()
    }
    pref = {
        (r.id_a, r.id_b): r.n_common
        for r in jaccard_prefix_filter_pairs(docs, threshold=threshold).collect()
    }
    assert pref == exact


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 25), st.integers(0, 25)),
        min_size=5,
        max_size=60,
    ),
    st.integers(2, 4),
)
def test_kcore_equals_serial_peel_property(spark, edges, k):
    # randomized peel-equality: the distributed bounded-round peel must hit
    # the same fixpoint as a serial reference on arbitrary small graphs
    # (self-loops and duplicate/reversed edges included by construction)
    import collections

    from hadoop_word_score_spark.operators.graph import kcore_nodes

    adj = collections.defaultdict(set)
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    while True:
        kill = [u for u, vs in adj.items() if len(vs) < k]
        if not kill:
            break
        for u in kill:
            for v in adj[u]:
                adj[v].discard(u)
            del adj[u]
    want = {u: len(vs) for u, vs in adj.items() if len(vs) > 0}
    e = spark.createDataFrame(edges, "src int, dst int")
    got = {r.node: r.core_degree
           for r in kcore_nodes(e, k=k, max_rounds=30).collect()}
    assert got == want


@settings(max_examples=20, deadline=None)
@given(
    st.dictionaries(
        st.sampled_from(["s1", "s2", "s3", "s4", "s5"]),
        st.tuples(st.integers(1, 10**12), st.integers(1, 12), st.integers(1, 12)),
        min_size=1,
        max_size=5,
    )
)
def test_mixture_waterfill_matches_exact_fraction_model(spark, spec):
    # r10 verdict #6: arbitrary RATIONAL weights via lcm scaling, with the
    # keep-token math integer end to end. The reference model computes the
    # true water-fill keep_s = floor(min_s'(n_s' * w_s / w_s')) with exact
    # Fractions — one floor, no float anywhere — and the operator must hit
    # it for every generated (token count, num/den weight) combination.
    from fractions import Fraction

    from hadoop_word_score_spark.operators.mixture import mixture_waterfill

    tokens = {s: n for s, (n, _, _) in spec.items()}
    weights = {s: Fraction(p, q) for s, (_, p, q) in spec.items()}
    t_star_units = min(Fraction(tokens[s2]) / weights[s2] for s2 in spec)
    want = {s: int(weights[s] * t_star_units) for s in spec}  # floor, exact

    tc = spark.createDataFrame(list(tokens.items()), "source string, n_tokens long")
    out = mixture_waterfill(tc, weights=weights).collect()
    got = {r.source: r.keep_tokens for r in out}
    assert got == want
    # the binding source keeps exactly everything it has
    binding = min(spec, key=lambda s: Fraction(tokens[s]) / weights[s])
    assert got[binding] == tokens[binding]
    # budgets never exceed availability and the long dtype survived
    for r in out:
        assert 0 <= r.keep_tokens <= r.n_tokens
        assert isinstance(r.keep_tokens, int)


def test_mixture_waterfill_rejects_floats_and_overflow(spark):
    import pytest as _pytest

    from hadoop_word_score_spark.operators.mixture import (
        mixture_waterfill,
        scaled_integer_weights,
    )

    with _pytest.raises(TypeError, match="float"):
        scaled_integer_weights({"a": 0.1})
    with _pytest.raises(ValueError, match="> 0"):
        scaled_integer_weights({"a": 0})
    # review r11: a source literally named "" must keep its EXPLICIT weight
    # (an in-dict sentinel key used to silently replace it with the default)
    ints, default_w, k = scaled_integer_weights({"": (1, 2), "b": 1}, 1)
    assert ints == {"": 1, "b": 2} and default_w == 2 and k == 2
    # n_tokens * K over int64 must fail fast inside the plan, not wrap
    tc = spark.createDataFrame(
        [("a", (1 << 62)), ("b", 10)], "source string, n_tokens long"
    )
    plan = mixture_waterfill(tc, weights={"a": 1, "b": (1, 7)})  # K = 7
    with _pytest.raises(Exception, match="overflows int64"):
        plan.collect()
