"""Python UDTF surface (SURVEY §2.11): true table functions.

Spark 4's `@udtf` is the third leg of the UDF surface next to scalar
pandas UDFs and grouped-map applyInPandas: a function RETURNING A TABLE,
callable from SQL with LATERAL — the shape users reach for when a single
input row expands into a variable number of typed rows.

Performance positioning (deliberate): Python UDTFs evaluate row-at-a-time
through pickle, so the engine's PRODUCTION chunker stays the pure-HOF
`doc_chunks` plan (sequence + explode + slice — JVM codegen end to end);
this module exists for API-surface parity and is oracle-checked to produce
byte-identical rows to that HOF plan, so a user can prototype with the
UDTF and swap to the vectorized path without a semantic diff. Measured
(SCALE_PROBE.md, sf0.1, min of 2 warm runs): the UDTF path costs 2.1x the
HOF plan on the identical chunking job.
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf

# the engine's tokenizer delimiter class (functions/text.py parity)
_DELIMS = re.compile(r"[ \t\n\r\f]+")


@udtf(returnType="chunk_idx bigint, chunk_start bigint, chunk_tokens bigint, chunk_text string")
class ChunkTextUDTF:
    """Overlapping token-window chunking (64-token windows, stride 48) —
    the same semantics as the `doc_chunks` HOF plan, as a table function.

    Empty / all-delimiter text yields no rows (matching the HOF plan's
    `size(toks) > 0` filter)."""

    def eval(self, text: str):  # noqa: D102 — contract in class docstring
        toks = [t for t in _DELIMS.split(text or "") if t]
        for s in range(0, len(toks), 48):
            chunk = toks[s : s + 64]
            yield s // 48, s, len(chunk), " ".join(chunk)


def register_udtfs(spark) -> None:
    """Make the engine's table functions callable from SQL."""
    spark.udtf.register("chunk_text", ChunkTextUDTF)
