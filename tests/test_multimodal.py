"""Multimodal column plumbing tests — deterministic fake payloads, real
Spark-side schemas/batching (north-star extension; decode itself is
stubbed per environment constraints)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from pyspark_datacol_diff_spark.operators import multimodal as MM


@pytest.fixture()
def media_df(spark):
    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "abc"), (3, "hello world"), (4, "")],
        ["doc_id", "text"],
    )
    return MM.attach_fake_payload(docs, "doc_id", "text")


def test_attach_fake_payload_schema_and_bytes(media_df):
    assert [f.name for f in media_df.schema.fields] == ["doc_id", "payload", "meta"]
    assert media_df.schema["payload"].dataType.typeName() == "binary"
    assert (
        media_df.schema["meta"].dataType.simpleString()
        == MM.MEDIA_META_TYPE.simpleString()
    )
    row = media_df.filter(F.col("doc_id") == 1).collect()[0]
    assert bytes(row["payload"]) == b"hello world"
    assert row["meta"]["media_type"] == "image/fake"
    assert row["meta"]["width"] == len("hello world") % 640 + 1


def test_payload_stats_md5_matches_hashlib(media_df):
    rows = {
        r["doc_id"]: r
        for r in MM.payload_stats(media_df).collect()
    }
    assert rows[1]["payload_len"] == 11
    assert rows[1]["payload_md5"] == hashlib.md5(b"hello world").hexdigest()
    assert rows[4]["payload_len"] == 0


def test_dedup_payloads_exact(media_df):
    kept = MM.dedup_payloads(media_df, "doc_id")
    ids = sorted(r["doc_id"] for r in kept.collect())
    # docs 1 and 3 share bytes; lowest id survives
    assert ids == [1, 2, 4]


def test_validate_payloads(spark):
    df = spark.createDataFrame(
        [
            (1, b"ok", {"media_type": "image/png"}),
            (2, None, {"media_type": "image/png"}),
            (3, b"", {"media_type": "image/png"}),
            (4, b"ok", None),
        ],
        "doc_id long, payload binary, meta struct<media_type:string>",
    )
    got = {
        r["doc_id"]: (r["valid"], r["reject_reason"])
        for r in MM.validate_payloads(df).collect()
    }
    assert got == {
        1: (True, None),
        2: (False, "null_payload"),
        3: (False, "empty_payload"),
        4: (False, "missing_media_type"),
    }


def test_extract_features_deterministic(media_df, spark):
    out = MM.extract_features(media_df, dim=4).collect()
    by_id = {r["doc_id"]: r for r in out}
    # doc 2 = b"abc" -> bytes 97,98,99 -> mod 4 = 1,2,3 -> hist [0,1/3,1/3,1/3]
    feats = by_id[2]["features"]
    assert by_id[2]["n_samples"] == 3
    assert feats[0] == 0.0
    assert abs(feats[1] - 1 / 3) < 1e-6
    # identical payloads -> identical features
    assert by_id[1]["features"] == by_id[3]["features"]
    # empty payload -> zero vector, not NaN
    assert by_id[4]["features"] == [0.0, 0.0, 0.0, 0.0]


def test_unavailable_decode_raises(media_df):
    with pytest.raises(Exception) as ei:
        MM.extract_features(media_df, decode_fn=MM.unavailable_decode).collect()
    assert "NotImplementedError" in str(ei.value) or "media decoding" in str(ei.value)


def test_resize_stub_shapes(media_df):
    out = MM.resize_stub(media_df, target_w=4, target_h=2).collect()
    for r in out:
        assert len(bytes(r["payload"])) == 8
        assert r["meta"]["width"] == 4 and r["meta"]["height"] == 2
    long_doc = [r for r in out if r["doc_id"] == 1][0]
    assert bytes(long_doc["payload"]) == b"hello wo"  # truncated
    short_doc = [r for r in out if r["doc_id"] == 2][0]
    assert bytes(short_doc["payload"]) == b"abc" + b"\x00" * 5  # padded


def test_sample_frames(spark):
    df = spark.createDataFrame([(1, bytes(range(40)))], "doc_id long, payload binary")
    out = MM.sample_frames(df, frame_bytes=8, every_nth=2).collect()
    # 5 full frames (0..4), keep 0,2,4
    assert sorted(r["frame_no"] for r in out) == [0, 2, 4]
    f2 = [r for r in out if r["frame_no"] == 2][0]
    assert bytes(f2["frame"]) == bytes(range(16, 24))
    # payload shorter than one frame -> no rows
    tiny = spark.createDataFrame([(2, b"xy")], "doc_id long, payload binary")
    assert MM.sample_frames(tiny, frame_bytes=8).count() == 0


def test_sniff_and_parse_real_header_bytes(spark):
    import struct

    from pyspark_datacol_diff_spark.operators import multimodal as MM

    # spec-exact PNG header for a 641x123 image, byte-for-byte
    png = (
        bytes.fromhex("89504E470D0A1A0A")
        + struct.pack(">I", 13)
        + b"IHDR"
        + struct.pack(">II", 641, 123)
    )
    # canonical PCM WAV header, 22050 Hz stereo (asymmetric bytes so a
    # wrong endianness cannot pass)
    wav = (
        b"RIFF" + struct.pack("<I", 36) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + struct.pack("<HH", 1, 2)
        + struct.pack("<I", 22050)
    )
    jpeg = bytes.fromhex("FFD8FF") + b"rest"
    gif = b"GIF89a" + b"x"
    rows = [(1, png), (2, wav), (3, jpeg), (4, gif), (5, b"plain bytes")]
    df = spark.createDataFrame(rows, ["id", "payload"])
    out = {
        r["id"]: r
        for r in df.select(
            "id",
            MM.sniff_media_type("payload").alias("media"),
            MM.png_dims("payload").alias("dims"),
            MM.wav_fmt("payload").alias("fmt"),
        ).collect()
    }
    assert out[1]["media"] == "image/png"
    assert (out[1]["dims"]["width"], out[1]["dims"]["height"]) == (641, 123)
    assert out[2]["media"] == "audio/wav"
    assert (out[2]["fmt"]["n_channels"], out[2]["fmt"]["sample_rate"]) == (2, 22050)
    assert out[3]["media"] == "image/jpeg"
    assert out[4]["media"] == "image/gif"
    assert out[5]["media"] is None
    assert out[5]["dims"]["width"] is None and out[5]["fmt"]["sample_rate"] is None


def test_synth_headers_match_struct_pack(spark):
    import struct

    from pyspark.sql import functions as F

    from pyspark_datacol_diff_spark.operators import multimodal as MM

    df = spark.range(1).select(
        MM.synth_png(F.lit(641), F.lit(123)).alias("png"),
        MM.synth_wav(F.lit(22050), F.lit(2)).alias("wav"),
    )
    r = df.collect()[0]
    assert bytes(r["png"]) == (
        bytes.fromhex("89504E470D0A1A0A")
        + struct.pack(">I", 13) + b"IHDR" + struct.pack(">II", 641, 123)
    )
    assert bytes(r["wav"]) == (
        b"RIFF" + struct.pack("<I", 36) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16)
        + struct.pack("<HH", 1, 2) + struct.pack("<I", 22050)
    )


class TestPngCodec:
    """Round-6: stdlib PNG codec — the real in-container decode path."""

    def test_roundtrip_all_filters_and_color_types(self):
        import numpy as np

        from pyspark_datacol_diff_spark.operators.multimodal import (
            encode_png,
            png_decode,
        )

        rng = np.random.default_rng(7)
        for ch in (1, 2, 3, 4):
            shape = (13, 17) if ch == 1 else (13, 17, ch)
            pix = rng.integers(0, 256, shape, dtype=np.uint8)
            for ft in range(5):
                dec = png_decode(encode_png(pix, filter_type=ft))
                assert dec.shape == pix.shape, (ch, ft)
                assert (dec == pix).all(), (ch, ft)

    def test_crc_corruption_and_header_only_raise(self, spark):
        import numpy as np

        from pyspark_datacol_diff_spark.operators import multimodal as MM

        pix = np.arange(48, dtype=np.uint8).reshape(6, 8)
        good = MM.encode_png(pix)
        bad = bytearray(good)
        bad[-18] ^= 0xFF  # flip a byte inside IDAT
        with pytest.raises(ValueError, match="CRC"):
            MM.png_decode(bytes(bad))
        with pytest.raises(ValueError, match="magic"):
            MM.png_decode(b"JUNK" * 8)
        # synth_png emits magic+IHDR only: parses under png_dims but is
        # NOT a decodable image — the decoder must say so, not crash
        row = (
            spark.range(1)
            .select(
                MM.synth_png(F.lit(320), F.lit(200)).alias("p")
            )
            .head()
        )
        # (synth_png stops mid-IHDR-chunk — 24 spec-exact bytes, no
        # CRC trailer — so the decoder reports the truncation)
        with pytest.raises(ValueError, match="truncated|IDAT"):
            MM.png_decode(row["p"])

    def test_extract_features_end_to_end_on_real_pngs(self, spark):
        """attach_png_payload -> extract_features(decode_fn=png_decode):
        the decode slot runs against real encoded bytes and the
        feature histogram matches an exact local recomputation."""
        import numpy as np

        from pyspark_datacol_diff_spark.operators import multimodal as MM

        ids = spark.range(10).select(F.col("id").alias("doc_id"))
        pay = MM.attach_png_payload(ids, "doc_id", width=16, height=12)
        # Column-side header parser agrees with the codec's bytes
        dims = pay.select(
            "doc_id", MM.png_dims("payload").alias("d")
        ).collect()
        assert all(
            r["d"]["width"] == 16 and r["d"]["height"] == 12 for r in dims
        )
        feats = {
            r["doc_id"]: (r["features"], r["n_samples"])
            for r in MM.extract_features(
                pay, dim=8, decode_fn=MM.png_decode
            ).collect()
        }
        yx = (
            np.arange(12)[:, None] * 16 * 7 + np.arange(16)[None, :] * 11
        ).astype(np.int64)
        for i in range(10):
            pix = ((yx + i * 31) % 256).astype(np.uint8)
            arr = pix.astype(np.float32).ravel()
            hist = np.zeros(8)
            np.add.at(hist, arr.astype(np.int64) % 8, 1.0)
            hist /= arr.size
            got, n = feats[i]
            assert n == 192
            assert np.allclose(got, hist.astype(np.float32))


class TestPcmAudio:
    """Round-6: full-payload PCM WAV synthesis + in-plan decode +
    exact-integer feature extraction (the audio data plane, all native
    Column expressions)."""

    def _pay(self, spark, n_rows=6):
        return spark.range(n_rows).select(
            F.col("id"),
            MM.synth_pcm_wav(
                F.col("id"),
                F.lit(30) + F.col("id") * 7,
                (F.lit(8000) + F.col("id") * 8000).cast("long"),
            ).alias("payload"),
        )

    def test_container_opens_in_stdlib_wave(self, spark):
        """The synthesized payload is a REAL WAV: python's wave module
        (an independent RIFF parser) reads back the exact header fields
        and sample values."""
        import io
        import struct
        import wave

        for r in self._pay(spark).collect():
            i = r["id"]
            w = wave.open(io.BytesIO(bytes(r["payload"])))
            n = 30 + i * 7
            assert w.getnchannels() == 1
            assert w.getsampwidth() == 2
            assert w.getframerate() == 8000 + i * 8000
            assert w.getnframes() == n
            got = struct.unpack(f"<{n}h", w.readframes(n))
            expect = tuple(
                ((i * 31 + j * 1031) % 4096) - 2048 for j in range(n)
            )
            assert got == expect

    def test_features_match_pure_python(self, spark):
        feats = {
            r["id"]: r["f"]
            for r in self._pay(spark)
            .select("id", MM.pcm_features("payload").alias("f"))
            .collect()
        }
        any_cross = False
        for i, f in feats.items():
            n = 30 + i * 7
            s = [((i * 31 + j * 1031) % 4096) - 2048 for j in range(n)]
            assert f["sample_rate"] == 8000 + i * 8000
            assert f["n_samples"] == n
            assert f["energy"] == sum(x * x for x in s)
            assert f["peak_abs"] == max(abs(x) for x in s)
            zc = sum(1 for a, b in zip(s, s[1:]) if a * b < 0)
            assert f["zero_cross"] == zc
            any_cross = any_cross or zc > 0
        assert any_cross  # the formula must actually exercise sign flips

    def test_non_wav_payload_yields_null_struct(self, spark):
        df = spark.createDataFrame(
            [(1, bytearray(b"not a wav at all, just bytes"))],
            "id long, payload binary",
        )
        row = df.select(MM.pcm_features("payload").alias("f")).collect()[0]
        assert row["f"] is None

    def test_truncated_payload_yields_null_struct(self, spark):
        """A data-chunk size the payload doesn't contain (cut-off file)
        must produce the NULL struct, never NULL-poisoned features."""
        full = self._pay(spark, n_rows=1).collect()[0]["payload"]
        cut = bytes(full)[: len(full) - 10]
        df = spark.createDataFrame(
            [(1, bytearray(cut)), (2, bytearray(bytes(full)))],
            "id long, payload binary",
        )
        rows = {
            r["id"]: r["f"]
            for r in df.select(
                "id", MM.pcm_features("payload").alias("f")
            ).collect()
        }
        assert rows[1] is None
        assert rows[2] is not None and rows[2]["energy"] is not None


class TestPcmDecimation:
    """Round-7: strided sample read (integer decimation) on real bytes."""

    def test_stride_matches_python_decimation(self, spark):
        from pyspark.sql import functions as F

        from pyspark_datacol_diff_spark.operators import multimodal as MM

        n, seed, rate, stride = 37, 5, 8000, 4
        df = spark.createDataFrame([(seed,)], "seed long").select(
            "seed",
            MM.synth_pcm_wav(
                F.col("seed"), F.lit(n).cast("long"), F.lit(rate)
            ).alias("payload"),
        )
        f = df.select(
            MM.pcm_features("payload", stride=stride).alias("f")
        ).collect()[0]["f"]
        s = [
            ((seed * 31 + j * 1031) % 4096) - 2048
            for j in range(0, n, stride)
        ]
        assert f["n_samples"] == len(s) == (n + stride - 1) // stride
        assert f["energy"] == sum(x * x for x in s)
        assert f["peak_abs"] == max(abs(x) for x in s)
        assert f["zero_cross"] == sum(
            1 for a, b in zip(s, s[1:]) if a * b < 0
        )

    def test_stride_one_is_identity(self, spark):
        from pyspark.sql import functions as F

        from pyspark_datacol_diff_spark.operators import multimodal as MM

        df = spark.createDataFrame([(3,)], "seed long").select(
            MM.synth_pcm_wav(
                F.col("seed"), F.lit(20).cast("long"), F.lit(8000)
            ).alias("payload"),
        )
        a = df.select(MM.pcm_features("payload").alias("f")).collect()[0]
        b = df.select(
            MM.pcm_features("payload", stride=1).alias("f")
        ).collect()[0]
        assert a == b

    def test_bad_stride_raises(self, spark):
        from pyspark_datacol_diff_spark.operators import multimodal as MM

        with pytest.raises(ValueError, match="stride"):
            MM.pcm_features("payload", stride=0)
