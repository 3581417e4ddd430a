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
  merge   one ``replace`` expression over the corpus column — pure JVM
          string op, no shuffle at all

So N rounds cost N scans + N vocab-shuffles and nothing quadratic; corpus
state between rounds is one string column. The merge uses left-to-right
non-overlapping replacement — exactly BPE's convention ("a a a" + rule
(a,a) → "(aa) a") — and both engines' ``replace`` implement it, which is
what makes the chained-CTE DuckDB oracle bit-exact.

Determinism: ties on count break by pair text ascending; the merged pair is
joined with U+001F (unit separator) so a merged token can never re-create
the space-delimited search pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

JOINER = "\x1f"


def learn_merge_rules(docs: DataFrame, text_col: str, n_rules: int) -> list[tuple]:
    """Run ``n_rules`` BPE rounds; returns [(step, pair, n_occurrences)].

    ``docs[text_col]`` must be canonical single-space-joined tokens. The
    corpus column is re-derived per round from the immutable input plus the
    rules learned so far (re-applying k cheap replaces per scan) — no
    growing lineage, no cache pinning a 100 TB corpus in memory.
    """
    rules: list[tuple] = []
    for step in range(1, n_rules + 1):
        w = F.concat(F.lit(" "), F.col(text_col), F.lit(" "))
        for _, pair, _ in rules:
            w = F.replace(
                w,
                F.lit(f" {pair} "),
                F.lit(" " + pair.replace(" ", JOINER) + " "),
            )
        toks = F.split(F.trim(w), " ")
        pairs = F.expr(
            "transform(sequence(1, size(_toks) - 1),"
            " i -> concat(element_at(_toks, i), ' ', element_at(_toks, i + 1)))"
        )
        top = (
            docs.select(toks.alias("_toks"))
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
        rules.append((step, top[0].pair, top[0].n))
    return rules
