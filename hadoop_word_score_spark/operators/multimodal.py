"""Multimodal column plumbing (SURVEY §2.10 L6).

Images/audio/video are opaque ``binary`` columns + typed metadata structs.
The Spark-side machinery here is real and tested — schema, Arrow batching,
``mapInPandas`` signature, partition behaviour. The *decode* itself is a
deterministic fake behind ``FAKE_DECODE`` (the real image/audio libraries are
not in this container): it derives (width, height, mean_luma) from an md5 of
the payload bytes, so tests are reproducible and the plumbing is exercised
end-to-end. Swapping in a real decoder is a one-function change.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Output schema of the decode stage: original id + typed image metadata.
DECODE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("byte_len", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("mean_luma", T.DoubleType()),
])

FAKE_DECODE = True  # no codec libs in this container — see module docstring


def _decode_one(payload: bytes) -> tuple[int, int, float]:
    """(width, height, mean_luma) for one blob. Deterministic fake."""
    if not FAKE_DECODE:  # pragma: no cover — real decoder goes here
        raise NotImplementedError("real image decode requires PIL/libvips")
    d = hashlib.md5(payload).digest()
    width = 16 + d[0] % 240
    height = 16 + d[1] % 240
    mean_luma = round(int.from_bytes(d[2:4], "big") / 65535.0, 6)
    return width, height, mean_luma


def decode_image_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: Arrow batches in, metadata batches out.

    Runs once per Arrow batch per partition — the shape a real decoder needs
    (amortized library init, vectorized output assembly, bounded memory).
    """
    for pdf in batches:
        meta = [_decode_one(p) for p in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "byte_len": pdf["payload"].map(len).astype("int64"),
                "width": [m[0] for m in meta],
                "height": [m[1] for m in meta],
                "mean_luma": [m[2] for m in meta],
            }
        )


def with_binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Materialize an opaque binary column (stand-in for image/audio bytes)."""
    return docs.withColumn("payload", F.encode(F.col(text_col), "utf-8"))


def extract_image_metadata(docs_with_payload: DataFrame) -> DataFrame:
    """The decode pipeline: binary column → typed metadata via Arrow batches.

    Partitioning note for 100 TB: mapInPandas is a narrow transformation — no
    shuffle; each scan task decodes its own files. Memory is bounded by
    spark.sql.execution.arrow.maxRecordsPerBatch (blobs are large: lower it
    for real media).
    """
    return (
        docs_with_payload.select("doc_id", "payload")
        .mapInPandas(decode_image_batch, schema=DECODE_SCHEMA)
    )
