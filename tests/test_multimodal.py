"""Multimodal plumbing tests (SURVEY §2.10 L6): schema, Arrow batching,
determinism, binary round-trip."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE, SF_SMOKE


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


def test_real_decode_path_runs_everywhere(spark):
    # The real-decoder guarantee without Pillow: actual image bytes (PPM, PGM,
    # BMP — generated in-process from their public specs) come back through
    # the distributed decode stage with their TRUE dimensions and luma, not
    # the md5 fake; unrecognized payloads still take the deterministic
    # fallback. This test never skips — the pure-Python codecs are built in.
    import numpy as np

    from hadoop_word_score_spark.functions import codecs
    from hadoop_word_score_spark.operators.multimodal import (
        extract_image_metadata,
        resize_images,
    )

    rgb = np.zeros((21, 37, 3), dtype=np.uint8)
    rgb[:, :, :] = 128  # uniform gray → luma 128/255 in every backend
    gradient = np.tile(np.arange(40, dtype=np.uint8) * 6, (10, 1))  # 10x40 PGM
    d = spark.createDataFrame(
        [
            (1, bytearray(codecs.encode_ppm(rgb))),
            (2, bytearray(codecs.encode_bmp24(rgb))),
            (3, bytearray(codecs.encode_pgm(gradient))),
            (4, bytearray(b"not an image")),
        ],
        "doc_id long, payload binary",
    )
    meta = {r.doc_id: r for r in extract_image_metadata(d).collect()}
    for did in (1, 2):
        assert (meta[did].width, meta[did].height) == (37, 21)
        assert abs(meta[did].mean_luma - 128 / 255) < 0.01
    assert (meta[3].width, meta[3].height) == (40, 10)
    assert abs(meta[3].mean_luma - float(gradient.mean()) / 255) < 0.01
    assert meta[4].width != 0  # fallback still produces metadata
    # true-content thumbnails: uniform-gray images resize to uniform bytes,
    # and PPM and BMP encodings of the SAME pixels produce the SAME thumb
    thumbs = {r.doc_id: bytes(r.thumb) for r in resize_images(d, 8, 8).collect()}
    assert all(len(t) == 64 for t in thumbs.values())
    assert thumbs[1] == thumbs[2]
    if len(set(thumbs[1])) == 1:  # pure-codec path: exact luma of gray 128
        assert set(thumbs[1]) == {128}


def test_pgm_payload_decodes_through_real_codec(spark):
    # with_pgm_payload renders text bytes as genuine PGM rasters; the decode
    # stage must return the TRUE raster geometry (16-wide, ceil(len/16)
    # rows) and the exact byte mean as luma — values only a real decode can
    # produce (the md5 fake depends on the whole payload hash, not content).
    from hadoop_word_score_spark.operators.multimodal import (
        extract_image_metadata,
        with_pgm_payload,
    )

    d = spark.createDataFrame(
        [(1, "A" * 40), (2, ""), (3, "z")], "doc_id long, text string"
    )
    meta = {r.doc_id: r for r in extract_image_metadata(with_pgm_payload(d)).collect()}
    assert (meta[1].width, meta[1].height) == (16, 3)  # ceil(40/16) = 3 rows
    pad = 16 * 3 - 40
    want = (40 * ord("A") + pad * 32) / (16 * 3) / 255.0
    assert abs(meta[1].mean_luma - want) < 1e-6
    assert (meta[2].width, meta[2].height) == (16, 1)  # empty → 1 blank row
    assert abs(meta[2].mean_luma - 32 / 255.0) < 1e-6
    assert (meta[3].width, meta[3].height) == (16, 1)


def test_codec_roundtrip_and_corruption_detection():
    # decode(encode(x)) == x for all three formats; truncated rasters raise
    # (corruption is distinguishable from "not an image" → None)
    import numpy as np
    import pytest

    from hadoop_word_score_spark.functions import codecs

    rng = np.random.default_rng(7)
    rgb = rng.integers(0, 256, size=(13, 17, 3), dtype=np.uint8)
    assert np.array_equal(codecs.decode_rgb(codecs.encode_ppm(rgb)), rgb)
    assert np.array_equal(codecs.decode_rgb(codecs.encode_bmp24(rgb)), rgb)
    gray = rng.integers(0, 256, size=(9, 11), dtype=np.uint8)
    back = codecs.decode_rgb(codecs.encode_pgm(gray))
    assert np.array_equal(back[:, :, 0], gray)
    assert np.array_equal(back[:, :, 1], gray)
    assert codecs.decode_rgb(b"GIF89a...") is None  # unrecognized → None
    with pytest.raises(ValueError):
        codecs.decode_rgb(codecs.encode_ppm(rgb)[:-10])  # truncated → raise
    with pytest.raises(ValueError):
        codecs.decode_rgb(codecs.encode_bmp24(rgb)[:-10])


def test_corpus_preconditions_for_multimodal_oracles(spark):
    # The fake-path multimodal oracles (plans/queries.py) are valid ONLY if
    # (a) every corpus payload actually takes the md5 fake path and (b) the
    # corpus is pure printable ASCII (DuckDB ord() yields codepoints; the
    # byte-level oracles need codepoint == byte). (a) is asserted as the
    # ACTUAL invariant, not a magic-prefix allowlist: the divert condition
    # is "any backend recognizes the payload" — with Pillow installed that
    # includes plain netpbm P1-P4, GIF8, XBM, etc., which no prefix list
    # tracks (r4 advice). Run each payload through the decode chain itself
    # and require it to equal the fake. Covers BOTH the pytest SF and the
    # driver's correctness SF, so a testdata regen that violates the
    # invariant fails here before it fails in CORRECTNESS. Fix the oracles,
    # not this test.
    from hadoop_word_score_spark.operators.multimodal import (
        _decode_one,
        _fake_decode,
    )

    for sf in (SF_SMOKE, SF_ORACLE):
        docs = spark.read.parquet(f"{sf}/documents.parquet")
        payloads = [r.text.encode("utf-8") for r in docs.select("text").collect()]
        diverted = [
            p[:24] for p in payloads if _decode_one(p) != _fake_decode(p)
        ]
        assert not diverted, (
            f"{sf}: {len(diverted)} payloads decode via a real backend — the "
            f"fake-path multimodal oracles are no longer valid for them; "
            f"first prefixes: {diverted[:3]}"
        )
        non_ascii = docs.filter(
            F.col("text").rlike("[^\\x20-\\x7e]")
            | (F.octet_length("text") != F.length("text"))
        ).count()
        assert non_ascii == 0, (
            f"{sf}: {non_ascii} non-printable-ASCII docs — byte-level oracle "
            "arithmetic (codepoint == byte) breaks for them"
        )


def test_fake_decode_flag_reflects_environment():
    import importlib.util

    from hadoop_word_score_spark.operators import multimodal

    assert multimodal.FAKE_DECODE == (importlib.util.find_spec("PIL") is None)


def test_wav_codec_roundtrips_and_matches_stdlib_wave():
    # The pure-Python RIFF encoder must produce blobs the stdlib wave
    # module reads identically, and the decoder must round-trip them.
    import io
    import wave

    import numpy as np

    from hadoop_word_score_spark.functions.codecs import (
        decode_wav_pcm16,
        encode_wav_pcm16,
    )

    s = (np.arange(200) % 13 * 900 - 5000).astype(np.int16)
    blob = encode_wav_pcm16(s, 16000)
    with wave.open(io.BytesIO(blob)) as w:
        assert (w.getnchannels(), w.getsampwidth(), w.getframerate(), w.getnframes()) \
            == (1, 2, 16000, 200)
        assert np.array_equal(np.frombuffer(w.readframes(200), dtype="<i2"), s)
    samples, rate, n_ch = decode_wav_pcm16(blob)
    assert np.array_equal(samples, s) and (rate, n_ch) == (16000, 1)


def test_wav_decoder_contract_non_wav_and_unsupported():
    import struct

    import pytest as _pytest

    from hadoop_word_score_spark.functions.codecs import decode_wav_pcm16

    assert decode_wav_pcm16(b"not audio at all") is None  # -> md5 fake tier
    # recognized RIFF/WAVE but IEEE-float fmt (3): refuse, don't mis-decode
    float_fmt = (
        b"RIFF" + struct.pack("<I", 36) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 3, 1, 8000, 32000, 4, 32)
        + b"data" + struct.pack("<I", 0)
    )
    with _pytest.raises(ValueError, match="unsupported"):
        decode_wav_pcm16(float_fmt)


def test_audio_decode_handles_stereo_and_zero_data():
    import numpy as np

    from hadoop_word_score_spark.functions.codecs import decode_wav_pcm16
    from hadoop_word_score_spark.operators.multimodal import _decode_audio_one

    # stereo: interleaved samples survive; frames = len/2
    import struct
    pcm = np.array([100, -100, 200, -200, 300, -300], dtype="<i2").tobytes()
    stereo = (
        b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, 44100, 44100 * 4, 4, 16)
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    samples, rate, n_ch = decode_wav_pcm16(stereo)
    assert (rate, n_ch, len(samples)) == (44100, 2, 6)
    meta = _decode_audio_one(stereo)
    assert meta[0] == 44100 and meta[1] == 3  # frames, not raw samples
    # zero_crossings is per-channel (deinterleaved): ch0 = [100,200,300],
    # ch1 = [-100,-200,-300] — zero crossings in neither channel. The raw
    # interleaved array would count 5 meaningless L/R sign flips.
    assert meta[4] == 0

    empty = (
        b"RIFF" + struct.pack("<I", 36) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
        + b"data" + struct.pack("<I", 0)
    )
    assert _decode_audio_one(empty) == (8000, 0, 0.0, 0.0, 0)


def test_audio_query_real_path_not_fake(spark):
    # The rendered WAV payloads must take the REAL decode path: their
    # metadata matches the closed forms, which the md5 fake cannot produce.
    from pyspark.sql import functions as F

    from hadoop_word_score_spark.operators.multimodal import (
        extract_audio_metadata,
        with_wav_payload,
    )
    from hadoop_word_score_spark.sources.registry import load_table
    from tests.conftest import SF_SMOKE

    d = load_table(spark, SF_SMOKE, "documents").limit(25)
    rows = extract_audio_metadata(with_wav_payload(d)).collect()
    assert len(rows) == 25
    for r in rows:
        half, n = 2 + r.doc_id % 7, 800 + r.doc_id % 50
        assert r.byte_len == 44 + 2 * n
        assert r.sample_rate == 8000 and r.n_samples == n
        assert r.zero_crossings == (n - 1) // half


def test_video_demux_and_decode_real_path(spark):
    # Concatenated-PGM container: the demuxer must find every frame at its
    # true offset and the per-frame decode must match decoding the frames
    # individually. Trailing garbage ends the walk; it never mis-decodes.
    import numpy as np

    from hadoop_word_score_spark.functions.codecs import encode_pgm
    from hadoop_word_score_spark.operators.multimodal import (
        _decode_one,
        _iter_pgm_frames,
        extract_video_frame_metadata,
        with_pgm_video_payload,
    )
    from hadoop_word_score_spark.sources.registry import load_table
    from tests.conftest import SF_SMOKE

    f1 = encode_pgm(np.full((3, 16), 65, np.uint8))
    f2 = encode_pgm((np.arange(32) % 256).reshape(2, 16).astype(np.uint8))
    frames = list(_iter_pgm_frames(f1 + f2 + b"\x00trailing"))
    assert [(o, b) for o, b in frames] == [(0, f1), (len(f1), f2)]
    w, h, luma = _decode_one(f1)
    assert (w, h) == (16, 3) and abs(luma - 65 / 255) < 1e-6

    d = load_table(spark, SF_SMOKE, "documents").limit(10)
    rows = extract_video_frame_metadata(with_pgm_video_payload(d)).collect()
    assert len(rows) == 40  # 4 frames per doc
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for frs in by_doc.values():
        frs.sort(key=lambda r: r.frame_idx)
        assert frs[0].frame_offset == 0
        # offsets are cumulative real frame byte-lengths: strictly increasing
        assert all(a.frame_offset < b.frame_offset for a, b in zip(frs, frs[1:]))
        assert all(r.width == 16 and r.height >= 1 for r in frs)


def test_null_payload_takes_fallback_tier(spark):
    # r8 review: NULL text -> NULL payload crashed every decode stage with
    # TypeError; a null payload must take the deterministic fallback (b"")
    from pyspark.sql import functions as F

    from hadoop_word_score_spark.operators.multimodal import (
        extract_audio_metadata,
        extract_image_metadata,
        resize_images,
        with_binary_payload,
    )

    d = spark.createDataFrame(
        [(1, "real text"), (2, None)], "doc_id long, text string"
    )
    p = with_binary_payload(d)
    assert p.filter(F.col("payload").isNull()).count() == 1
    meta = {r.doc_id: r for r in extract_image_metadata(p).collect()}
    assert meta[2].byte_len == 0 and meta[2].width > 0  # md5 fake of b""
    thumbs = {r.doc_id: r.thumb for r in resize_images(p).collect()}
    assert len(thumbs[2]) == 32 * 32
    audio = {r.doc_id: r for r in extract_audio_metadata(p).collect()}
    assert audio[2].byte_len == 0


def test_wav_corruption_raises_not_truncates():
    import struct

    import pytest

    from hadoop_word_score_spark.functions.codecs import decode_wav_pcm16

    def wav(rate, data_sz, data):
        return (
            b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
            + b"data" + struct.pack("<I", data_sz) + data
        )

    # declared data size overruns the payload: corruption, not partial audio
    with pytest.raises(ValueError, match="truncated WAV chunk"):
        decode_wav_pcm16(wav(8000, 1600, b"\x00\x01\x02\x03"))
    # rate=0 is an unsupported variant, not a ZeroDivisionError downstream
    with pytest.raises(ValueError, match="rate"):
        decode_wav_pcm16(wav(0, 4, b"\x00\x01\x02\x03"))
    # and the fallback tier engages cleanly in the pipeline wrapper
    from hadoop_word_score_spark.operators.multimodal import _decode_audio_one

    meta = _decode_audio_one(wav(0, 4, b"\x00\x01\x02\x03"))
    assert len(meta) == 5  # md5 fake, no crash


def test_truncated_bmp_header_is_corruption_not_unknown():
    import pytest

    from hadoop_word_score_spark.functions.codecs import decode_rgb

    with pytest.raises(ValueError, match="truncated BMP header"):
        decode_rgb(b"BM" + b"\x00" * 40)
    assert decode_rgb(b"XX" + b"\x00" * 40) is None  # genuinely not an image


def test_zero_dim_pgm_header_is_not_a_frame():
    from hadoop_word_score_spark.operators.multimodal import _iter_pgm_frames

    assert list(_iter_pgm_frames(b"P5 0 0 255\n")) == []
    assert len(list(_iter_pgm_frames(b"P5 2 2 255\n" + b"\x01" * 4))) == 1


def test_audio_stereo_crossings_are_per_channel_summed():
    # Channels with DIFFERENT nonzero crossing counts: the contract
    # (multimodal.py::_decode_audio_one docstring) is sign changes counted
    # down each deinterleaved channel, then SUMMED — not interleaved-order
    # flips, and not a per-channel max/mean. ch0 alternates every frame
    # (3 crossings over 4 frames), ch1 flips once (1 crossing): total 4.
    # rms is order-independent, so it must equal the all-samples rms
    # whether or not the decoder deinterleaves first.
    import struct

    import numpy as np

    from hadoop_word_score_spark.operators.multimodal import _decode_audio_one

    ch0 = [1000, -1000, 1000, -1000]   # 3 sign changes
    ch1 = [2000, 2000, -2000, -2000]   # 1 sign change
    interleaved = []
    for a, b in zip(ch0, ch1):
        interleaved += [a, b]
    pcm = np.array(interleaved, dtype="<i2").tobytes()
    wav = (
        b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, 8000, 8000 * 4, 4, 16)
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    rate, n_frames, duration, rms, zc = _decode_audio_one(wav)
    assert (rate, n_frames) == (8000, 4)
    assert zc == 3 + 1
    x = np.array(interleaved, dtype=np.float64) / 32768.0
    assert rms == round(float(np.sqrt((x * x).mean())), 6)
