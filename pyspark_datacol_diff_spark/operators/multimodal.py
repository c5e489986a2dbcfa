"""Multimodal (image/audio/video) column conventions + operators.

Extension surface per the north star (BASELINE.json): media rides through
the engine as an opaque ``binary`` payload column plus a typed metadata
struct. Everything metadata/byte-level (length, hashing, validation,
group-stats) is native Column expressions; decode / feature-extract /
resize / frame-sample are Arrow-batched ``mapInPandas`` stages because
codec work is inherently per-buffer Python/native-lib territory.

Decode itself is STUBBED: the image/audio libraries are not in this
container, so ``decode_fn`` is pluggable — production passes a real
decoder (PIL/torchaudio/ffmpeg), tests pass the deterministic fake
(``fake_decode``). The Spark-side plumbing — schema contract, Arrow batch
iteration, partition behavior, output shapes — is real and tested.

Scale notes (100 TB of media):

- Keep payloads OUT of shuffle keys; hash them once (``xxhash64``/``md5``)
  and shuffle the 8-32-byte digest.
- ``mapInPandas`` streams Arrow record batches; cap
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` so a batch of payloads
  fits executor memory (e.g. 64 rows x 16 MB images = 1 GB — too big;
  set ~32).
- Decode-then-reduce pipelines should project away the payload column in
  the SAME mapInPandas stage that consumes it — never let decoded pixels
  AND raw bytes co-exist in a shuffled row.
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# schema contract
# ---------------------------------------------------------------------------

#: metadata struct carried next to every media payload column.
MEDIA_META_TYPE = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image/jpeg, audio/wav, ...
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

#: output schema of feature extraction: fixed-size float vector + shape.
FEATURES_TYPE = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def media_meta(
    media_type: Column | str,
    *,
    width: Column | None = None,
    height: Column | None = None,
    n_channels: Column | None = None,
    sample_rate: Column | None = None,
    duration_ms: Column | None = None,
) -> Column:
    """Build the canonical media metadata struct from loose columns."""
    def _or_null(c: Column | None, dt: str) -> Column:
        return c.cast(dt) if c is not None else F.lit(None).cast(dt)

    mt = F.lit(media_type) if isinstance(media_type, str) else media_type
    return F.struct(
        mt.alias("media_type"),
        _or_null(width, "int").alias("width"),
        _or_null(height, "int").alias("height"),
        _or_null(n_channels, "int").alias("n_channels"),
        _or_null(sample_rate, "int").alias("sample_rate"),
        _or_null(duration_ms, "long").alias("duration_ms"),
    )


def attach_fake_payload(
    df: DataFrame, id_col: str, text_col: str, *, media_type: str = "image/fake"
) -> DataFrame:
    """Deterministic binary payload + metadata derived from a text column —
    the container has no media files, so tests synthesize payloads whose
    bytes are the UTF-8 encoding of the text (DuckDB can reproduce
    ``md5``/``octet_length`` of the same bytes, giving a real oracle for
    the byte-level operators). Fake 'dimensions' derive from the length.
    """
    payload = F.encode(F.col(text_col), "UTF-8")
    plen = F.octet_length(payload)
    return df.select(
        F.col(id_col).alias("doc_id"),
        payload.alias("payload"),
        media_meta(
            media_type,
            width=(plen % 640 + 1),
            height=(plen % 480 + 1),
            n_channels=F.lit(3),
        ).alias("meta"),
    )


# ---------------------------------------------------------------------------
# byte-level operators — native Column expressions (no Python)
# ---------------------------------------------------------------------------

def payload_stats(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Per-row byte-level facts: length, md5 (cross-engine), xxhash64
    (Spark-fast path). Adds columns; no shuffle."""
    p = F.col(payload_col)
    return df.withColumns(
        {
            "payload_len": F.octet_length(p),
            "payload_md5": F.md5(p),
            "payload_xxh": F.xxhash64(p),
        }
    )


def dedup_payloads(df: DataFrame, id_col: str, payload_col: str = "payload") -> DataFrame:
    """Exact media dedup on content digest — the digest (not the payload)
    is the shuffle key, so 100 TB of bytes shuffles as ~1 GB of hashes."""
    from .dedup import drop_exact_dups

    return drop_exact_dups(df, F.xxhash64(F.col(payload_col)), id_col)


def validate_payloads(
    df: DataFrame,
    payload_col: str = "payload",
    meta_col: str = "meta",
    *,
    max_bytes: int = 64 << 20,
) -> DataFrame:
    """Flag structurally-invalid media rows (null/empty/oversize payload,
    missing media_type) without decoding. Adds ``valid`` + ``reject_reason``."""
    p, m = F.col(payload_col), F.col(meta_col)
    reason = (
        F.when(p.isNull(), "null_payload")
        .when(F.octet_length(p) == 0, "empty_payload")
        .when(F.octet_length(p) > max_bytes, "oversize")
        .when(m.isNull() | m["media_type"].isNull(), "missing_media_type")
    )
    return df.withColumns(
        {"reject_reason": reason, "valid": reason.isNull()}
    )


# ---------------------------------------------------------------------------
# decode / feature-extract / resize / frame-sample — mapInPandas stages
# ---------------------------------------------------------------------------

DecodeFn = Callable[[bytes], "object"]


def fake_decode(payload: bytes) -> "object":
    """Deterministic stand-in for a real image decoder: 'pixels' are the
    payload bytes as a numpy row vector. Real deployments inject
    PIL.Image.open / torchaudio.load here."""
    import numpy as np

    return np.frombuffer(payload, dtype=np.uint8).astype(np.float32)


def unavailable_decode(payload: bytes) -> "object":
    """The production decode slot — media codecs are not installed in this
    container."""
    raise NotImplementedError(
        "media decoding requires an image/audio library (PIL/torchaudio/"
        "ffmpeg) not present in this environment; inject decode_fn="
        "fake_decode for plumbing tests"
    )


def extract_features(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    dim: int = 8,
    decode_fn: DecodeFn = fake_decode,
) -> DataFrame:
    """Decode each payload and emit a fixed-``dim`` float feature vector
    (bucketed byte-histogram of the decoded buffer — deterministic, so
    tests can assert exact values). Arrow-batched ``mapInPandas``:
    one Python roundtrip per record batch, not per row.
    """
    import numpy as np

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("features", T.ArrayType(T.FloatType())),
            T.StructField("n_samples", T.IntegerType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, feats, counts = [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                decoded = decode_fn(bytes(payload))
                arr = np.asarray(decoded, dtype=np.float32).ravel()
                hist = np.zeros(dim, dtype=np.float64)
                if arr.size:
                    np.add.at(hist, (arr.astype(np.int64) % dim), 1.0)
                    hist /= arr.size
                ids.append(doc_id)
                feats.append(hist.astype(np.float32).tolist())
                counts.append(int(arr.size))
            yield pd.DataFrame(
                {"doc_id": ids, "features": feats, "n_samples": counts}
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema)


def resize_stub(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    target_w: int = 224,
    target_h: int = 224,
) -> DataFrame:
    """Resize stage contract: (payload) -> (payload', meta'). The resample
    kernel needs a codec, so this stub truncates/pads bytes to
    ``target_w*target_h`` — shape-correct plumbing, clearly fake values."""
    n = target_w * target_h

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("meta", MEDIA_META_TYPE),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_pl, out_meta = [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)[:n].ljust(n, b"\x00")
                out_ids.append(doc_id)
                out_pl.append(b)
                out_meta.append(
                    {
                        "media_type": "image/fake",
                        "width": target_w,
                        "height": target_h,
                        "n_channels": 1,
                        "sample_rate": None,
                        "duration_ms": None,
                    }
                )
            yield pd.DataFrame(
                {"doc_id": out_ids, "payload": out_pl, "meta": out_meta}
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema)


def sample_frames(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    frame_bytes: int = 16,
    every_nth: int = 4,
) -> DataFrame:
    """Frame-sampling contract for video-ish payloads: chop the byte
    stream into fixed-size 'frames', keep every ``every_nth``-th, emit one
    row per kept frame (fan-out stage). Real codecs slot in the same
    shape. Native-Column implementation — no Python: sequence over frame
    offsets + explode, entirely codegen'd."""
    p = F.col(payload_col)
    nframes = F.floor(F.octet_length(p) / F.lit(frame_bytes)).cast("int")
    idxs = F.when(
        nframes > 0, F.sequence(F.lit(0), nframes - 1, F.lit(every_nth))
    ).otherwise(F.array().cast("array<int>"))
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            p.alias("__p"),
            F.explode(idxs).alias("frame_no"),
        )
        .select(
            "doc_id",
            "frame_no",
            F.substring(
                F.col("__p"), F.col("frame_no") * frame_bytes + 1, frame_bytes
            ).alias("frame"),
        )
    )
