"""Multimodal plumbing tests (SURVEY §2.10 L6): schema, Arrow batching,
determinism, binary round-trip."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_decode_schema_and_determinism(spark):
    from hadoop_word_score_spark.operators.multimodal import (
        extract_image_metadata,
        with_binary_payload,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    d = with_binary_payload(docs)
    out1 = extract_image_metadata(d)
    assert out1.schema.simpleString() == (
        "struct<doc_id:bigint,byte_len:bigint,width:int,height:int,mean_luma:double>"
    )
    rows1 = sorted(map(tuple, out1.collect()))
    rows2 = sorted(map(tuple, extract_image_metadata(d).collect()))
    assert rows1 == rows2
    assert len(rows1) == docs.count()
    for _, byte_len, width, height, luma in rows1:
        assert byte_len >= 0
        assert 16 <= width < 256 and 16 <= height < 256
        assert 0.0 <= luma <= 1.0


def test_payload_bytelen_matches_octet_length(spark):
    from hadoop_word_score_spark.operators.multimodal import (
        extract_image_metadata,
        with_binary_payload,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    d = with_binary_payload(docs)
    meta = extract_image_metadata(d)
    joined = d.select("doc_id", F.octet_length("payload").alias("olen")).join(meta, "doc_id")
    assert joined.filter(F.col("olen") != F.col("byte_len")).count() == 0


def test_binary_parquet_roundtrip(spark, scratch_dir):
    # BinaryType + ArrayType(Float) survive a parquet write/read cycle (L6).
    from hadoop_word_score_spark.operators.multimodal import with_binary_payload

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(20)
    em = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").limit(20)
    d = with_binary_payload(docs).join(
        em.withColumnRenamed("vec_id", "doc_id"), "doc_id"
    )
    path = os.path.join(scratch_dir, "mm_roundtrip")
    d.write.mode("overwrite").parquet(path)
    back = spark.read.parquet(path)
    assert dict(back.dtypes)["payload"] == "binary"
    assert dict(back.dtypes)["embedding"] == "array<float>"
    a = sorted((r.doc_id, bytes(r.payload)) for r in d.select("doc_id", "payload").collect())
    b = sorted((r.doc_id, bytes(r.payload)) for r in back.select("doc_id", "payload").collect())
    assert a == b


def test_resize_deterministic_dims(spark):
    from hadoop_word_score_spark.operators.multimodal import (
        resize_images,
        with_binary_payload,
    )

    d = with_binary_payload(spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(20))
    r1 = {r.doc_id: bytes(r.thumb) for r in resize_images(d, 8, 8).collect()}
    r2 = {r.doc_id: bytes(r.thumb) for r in resize_images(d, 8, 8).collect()}
    assert r1 == r2  # deterministic across runs
    assert all(len(t) == 64 for t in r1.values())


def test_frame_sampling_fanout(spark):
    from hadoop_word_score_spark.operators.multimodal import (
        sample_frames,
        with_binary_payload,
    )

    d = with_binary_payload(spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(10))
    frames = sample_frames(d, n_frames=4)
    rows = frames.collect()
    assert len(rows) == 40  # 10 docs x 4 frames
    offs = sorted((r.doc_id, r.frame_idx, r.frame_offset) for r in rows)
    assert all(o[2] >= 0 for o in offs)
    # offsets monotonically non-decreasing per doc
    for did in {o[0] for o in offs}:
        seq = [o[2] for o in offs if o[0] == did]
        assert seq == sorted(seq)
    # narrow op: no exchange in the plan (on unlimited input — limit() above
    # adds its own single-partition exchange unrelated to the operator)
    full = sample_frames(
        with_binary_payload(spark.read.parquet(f"{SF_SMOKE}/documents.parquet"))
    )
    plan = full._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_real_pil_decode_path_when_available(spark):
    # The real-decoder seam: with Pillow importable, actual image bytes must
    # come back with their TRUE dimensions (not the md5 fake); non-image
    # payloads still take the deterministic fallback. Skipped in codec-less
    # containers — the seam itself (import resolution, fallback) is what the
    # other tests cover there.
    import pytest

    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    from hadoop_word_score_spark.operators.multimodal import (
        extract_image_metadata,
        resize_images,
    )

    buf = io.BytesIO()
    PIL_Image.new("L", (37, 21), color=128).save(buf, format="PNG")
    png = buf.getvalue()
    d = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(b"not an image"))],
        "doc_id long, payload binary",
    )
    meta = {r.doc_id: r for r in extract_image_metadata(d).collect()}
    assert (meta[1].width, meta[1].height) == (37, 21)
    assert abs(meta[1].mean_luma - 128 / 255) < 0.01
    assert meta[2].width != 0  # fallback still produces metadata
    thumbs = {r.doc_id: bytes(r.thumb) for r in resize_images(d, 8, 8).collect()}
    assert len(thumbs[1]) == 64 and len(thumbs[2]) == 64


def test_fake_decode_flag_reflects_environment():
    import importlib.util

    from hadoop_word_score_spark.operators import multimodal

    assert multimodal.FAKE_DECODE == (importlib.util.find_spec("PIL") is None)
