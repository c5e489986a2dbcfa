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


# ---------------------------------------------------------------------------
# container-header parsing — native Column expressions (no codec, no UDF)
# ---------------------------------------------------------------------------
# Magic prefixes (public container formats). Byte-level header fields are
# extractable with substring+hex+conv alone, so format sniffing and
# fixed-offset metadata (PNG IHDR dims, WAV fmt-chunk rate/channels) run
# fully codegen'd inside the scan stage. JPEG dimensions are NOT parsed:
# SOF markers float at variable offsets (entropy-coded segments between),
# which needs a scan loop — that belongs in the pluggable decode_fn, not
# in a Column expression.

PNG_MAGIC_HEX = "89504E470D0A1A0A"
JPEG_MAGIC_HEX = "FFD8FF"
GIF_MAGIC_HEX = "474946383961"  # GIF89a
RIFF_MAGIC_HEX = "52494646"     # "RIFF"
WAVE_TAG_HEX = "57415645"       # "WAVE" at offset 8


def _be_uint(p: Column, pos: int, nbytes: int) -> Column:
    """Big-endian unsigned int read at 1-based byte offset ``pos``."""
    return F.conv(F.hex(F.substring(p, pos, nbytes)), 16, 10).cast("long")


def _le_uint(p: Column, pos: int, nbytes: int) -> Column:
    """Little-endian unsigned int at 1-based ``pos``: hex the slice, then
    reassemble the byte pairs in reverse — stays a pure string expression."""
    h = F.hex(F.substring(p, pos, nbytes))
    rev = F.concat(
        *[F.substring(h, 2 * i + 1, 2) for i in reversed(range(nbytes))]
    )
    return F.conv(rev, 16, 10).cast("long")


def sniff_media_type(payload: Column | str) -> Column:
    """Container format from magic bytes: 'image/png', 'image/jpeg',
    'image/gif', 'audio/wav', else NULL. Binary-prefix equality only —
    one projection, no Python."""
    p = F.col(payload) if isinstance(payload, str) else payload
    return (
        F.when(F.substring(p, 1, 8) == F.unhex(F.lit(PNG_MAGIC_HEX)), "image/png")
        .when(F.substring(p, 1, 3) == F.unhex(F.lit(JPEG_MAGIC_HEX)), "image/jpeg")
        .when(F.substring(p, 1, 6) == F.unhex(F.lit(GIF_MAGIC_HEX)), "image/gif")
        .when(
            (F.substring(p, 1, 4) == F.unhex(F.lit(RIFF_MAGIC_HEX)))
            & (F.substring(p, 9, 4) == F.unhex(F.lit(WAVE_TAG_HEX))),
            "audio/wav",
        )
        .otherwise(F.lit(None).cast("string"))
    )


def png_dims(payload: Column | str) -> Column:
    """struct(width, height) from the PNG IHDR chunk (big-endian uint32s
    at fixed offsets 16/20 — IHDR is required to be first by the spec).
    NULLs when the payload is not a PNG."""
    p = F.col(payload) if isinstance(payload, str) else payload
    is_png = F.substring(p, 1, 8) == F.unhex(F.lit(PNG_MAGIC_HEX))
    return F.struct(
        F.when(is_png, _be_uint(p, 17, 4)).cast("int").alias("width"),
        F.when(is_png, _be_uint(p, 21, 4)).cast("int").alias("height"),
    )


def wav_fmt(payload: Column | str) -> Column:
    """struct(n_channels, sample_rate) from the canonical WAV fmt chunk
    (little-endian, channels at offset 22, rate at 24; layout is fixed
    when fmt directly follows RIFF/WAVE, the overwhelmingly common
    encoding). NULLs for non-WAV payloads."""
    p = F.col(payload) if isinstance(payload, str) else payload
    is_wav = (F.substring(p, 1, 4) == F.unhex(F.lit(RIFF_MAGIC_HEX))) & (
        F.substring(p, 9, 4) == F.unhex(F.lit(WAVE_TAG_HEX))
    )
    return F.struct(
        F.when(is_wav, _le_uint(p, 23, 2)).cast("int").alias("n_channels"),
        F.when(is_wav, _le_uint(p, 25, 4)).cast("int").alias("sample_rate"),
    )


def synth_png(width: Column, height: Column) -> Column:
    """Construct a minimal-but-valid PNG header (magic + IHDR length/tag +
    dims) as binary — the deterministic test double for header parsing in
    a codec-free container. Not a renderable image; the first 24 bytes
    are spec-exact."""
    be32 = lambda c: F.unhex(F.lpad(F.hex(c.cast("long")), 8, "0"))
    return F.concat(
        F.unhex(F.lit(PNG_MAGIC_HEX)),
        F.unhex(F.lit("0000000D")),  # IHDR length 13
        F.unhex(F.lit("49484452")),  # "IHDR"
        be32(width),
        be32(height),
    )


def synth_wav(sample_rate: Column, n_channels: Column) -> Column:
    """Minimal canonical WAV header (RIFF/WAVE/fmt , PCM) as binary."""
    def le(c: Column, nbytes: int) -> Column:
        h = F.lpad(F.hex(c.cast("long")), 2 * nbytes, "0")
        return F.unhex(
            F.concat(
                *[F.substring(h, 2 * i + 1, 2) for i in reversed(range(nbytes))]
            )
        )

    return F.concat(
        F.unhex(F.lit(RIFF_MAGIC_HEX)),
        F.unhex(F.lit("24000000")),  # riff size (placeholder, LE 36)
        F.unhex(F.lit(WAVE_TAG_HEX)),
        F.unhex(F.lit("666D7420")),  # "fmt "
        F.unhex(F.lit("10000000")),  # fmt chunk size 16
        F.unhex(F.lit("0100")),      # PCM
        le(n_channels, 2),
        le(sample_rate, 4),
    )


# ---------------------------------------------------------------------------
# stdlib PNG codec — the in-container REAL decode path (round-6)
#
# The container ships no media libraries, but PNG needs only zlib (stdlib)
# plus the per-byte unfilter pass — so the ``decode_fn`` slot of
# :func:`extract_features` is exercisable end-to-end against real encoded
# bytes instead of the ``fake_decode`` stand-in. Spec: PNG (ISO/IEC
# 15948) 8-bit, color types 0/2/4/6, non-interlaced, filters 0-4.
# ---------------------------------------------------------------------------

#: PNG color type -> channel count (8-bit, the subset this codec handles)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (PNG spec 9.4): nearest of left/up/upleft to
    the linear estimate, ties broken left, up, upleft."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def encode_png(pixels, *, filter_type: int = 0) -> bytes:
    """Encode a uint8 pixel array as a complete, spec-valid PNG using
    only stdlib zlib — grayscale ``(h, w)`` or ``(h, w, ch)`` with
    ch in {1: gray, 2: gray+alpha, 3: RGB, 4: RGBA}. ``filter_type``
    (0-4) is applied to EVERY row, so tests can exercise each
    unfilter path of :func:`png_decode` in isolation. Filtering is
    vectorized (predictors read RAW neighbor bytes, which the encoder
    already has); only the decoder's sub/avg/paeth must be
    sequential."""
    import struct
    import zlib

    import numpy as np

    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.ndim != 3 or arr.shape[2] not in (1, 2, 3, 4):
        raise ValueError(f"expected (h, w[, 1|2|3|4]) uint8, got {arr.shape}")
    if not 0 <= filter_type <= 4:
        raise ValueError(f"filter_type must be 0-4, got {filter_type}")
    h, w, ch = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    rows = arr.reshape(h, w * ch).astype(np.int32)
    # byte-offset neighbors on RAW rows (encoder side is vectorizable)
    left = np.zeros_like(rows)
    left[:, ch:] = rows[:, :-ch]
    up = np.zeros_like(rows)
    up[1:] = rows[:-1]
    upleft = np.zeros_like(rows)
    upleft[1:, ch:] = rows[:-1, :-ch]
    if filter_type == 0:
        filt = rows
    elif filter_type == 1:
        filt = rows - left
    elif filter_type == 2:
        filt = rows - up
    elif filter_type == 3:
        filt = rows - (left + up) // 2
    else:  # Paeth
        p = left + up - upleft
        pa = np.abs(p - left)
        pb = np.abs(p - up)
        pc = np.abs(p - upleft)
        pred = np.where(
            (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, upleft)
        )
        filt = rows - pred
    scan = bytearray()
    for y in range(h):
        scan.append(filter_type)
        scan.extend((filt[y] & 0xFF).astype(np.uint8).tobytes())

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        bytes.fromhex(PNG_MAGIC_HEX)
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(scan)))
        + chunk(b"IEND", b"")
    )


def png_decode(payload: bytes):
    """Stdlib-only PNG decoder (zlib inflate + per-row unfilter) — a
    REAL ``decode_fn`` for :func:`extract_features` in this codec-free
    container. Supports the common still-image subset: 8-bit depth,
    color types 0 (gray) / 2 (RGB) / 4 (gray+alpha) / 6 (RGBA),
    non-interlaced, all five scanline filters, CRC-verified chunks.
    Returns a uint8 array ``(h, w)`` for grayscale, else
    ``(h, w, ch)``.

    Header-only payloads (the :func:`synth_png` Column builder emits
    magic+IHDR with no IDAT) raise ``ValueError`` — they parse under
    :func:`png_dims` but are not decodable images. The unfilter loop
    is per-byte Python for sub/avg/paeth (reconstruction is a serial
    recurrence by spec); this is a test/driver-grade decoder — at
    fleet scale the pluggable slot takes a native codec."""
    import struct
    import zlib

    import numpy as np

    b = bytes(payload)
    magic = bytes.fromhex(PNG_MAGIC_HEX)
    if b[:8] != magic:
        raise ValueError("not a PNG (bad magic)")
    pos = 8
    ihdr = None
    idat = bytearray()
    while pos + 12 <= len(b):
        (length,) = struct.unpack(">I", b[pos : pos + 4])
        tag = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + length]
        if len(data) < length or pos + 12 + length > len(b):
            raise ValueError(f"truncated {tag!r} chunk")
        (crc,) = struct.unpack(
            ">I", b[pos + 8 + length : pos + 12 + length]
        )
        if zlib.crc32(tag + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {tag!r} chunk")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif tag == b"IDAT":
            idat.extend(data)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("missing IHDR")
    w, h, depth, color_type, comp, filter_method, interlace = ihdr
    if depth != 8:
        raise ValueError(f"unsupported bit depth {depth} (8 only)")
    if color_type not in _PNG_CHANNELS:
        raise ValueError(f"unsupported color type {color_type}")
    if comp != 0 or filter_method != 0:
        raise ValueError("unsupported compression/filter method")
    if interlace != 0:
        raise ValueError("interlaced PNG not supported")
    if not idat:
        raise ValueError(
            "no IDAT data — header-only payload (synth_png emits "
            "magic+IHDR for header-parsing tests; it is not a "
            "decodable image)"
        )
    ch = _PNG_CHANNELS[color_type]
    stride = w * ch
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError(
            f"scanline data is {len(raw)} bytes, expected "
            f"{h * (stride + 1)}"
        )
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        ft = raw[y * (stride + 1)]
        row = bytearray(
            raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)]
        )
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.uint8)
        if ft == 0:
            pass
        elif ft == 1:
            for x in range(ch, stride):
                row[x] = (row[x] + row[x - ch]) & 0xFF
        elif ft == 2:
            row = bytearray(
                (np.frombuffer(bytes(row), dtype=np.uint8) + prev).astype(
                    np.uint8
                ).tobytes()
            )
        elif ft == 3:
            for x in range(stride):
                left = row[x - ch] if x >= ch else 0
                row[x] = (row[x] + (left + int(prev[x])) // 2) & 0xFF
        elif ft == 4:
            for x in range(stride):
                left = row[x - ch] if x >= ch else 0
                ul = int(prev[x - ch]) if x >= ch else 0
                row[x] = (row[x] + _paeth(left, int(prev[x]), ul)) & 0xFF
        else:
            raise ValueError(f"bad filter type {ft} on row {y}")
        out[y] = np.frombuffer(bytes(row), dtype=np.uint8)
    out = out.reshape(h, w, ch)
    return out[:, :, 0] if ch == 1 else out


def attach_png_payload(
    df: DataFrame,
    id_col: str,
    *,
    width: int = 16,
    height: int = 12,
) -> DataFrame:
    """Deterministic REAL PNG payloads derived from an id column — the
    in-container analogue of :func:`attach_fake_payload` whose bytes
    are complete, decodable images (pixels are a fixed function of the
    id; the scanline filter cycles over all five types by id, so any
    corpus slice exercises every unfilter path of :func:`png_decode`).
    Arrow-batched ``mapInPandas`` — encoding is per-buffer Python by
    nature, one roundtrip per record batch. Output schema matches
    attach_fake_payload: ``(doc_id, payload, meta)``."""
    import numpy as np

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("meta", MEDIA_META_TYPE),
        ]
    )
    w, h = width, height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        yx = (
            np.arange(h)[:, None] * w * 7 + np.arange(w)[None, :] * 11
        ).astype(np.int64)
        for pdf in batches:
            ids, payloads, metas = [], [], []
            for doc_id in pdf[id_col]:
                i = int(doc_id)
                pix = ((yx + i * 31) % 256).astype(np.uint8)
                payloads.append(encode_png(pix, filter_type=i % 5))
                ids.append(i)
                metas.append(
                    {
                        "media_type": "image/png",
                        "width": w,
                        "height": h,
                        "n_channels": 1,
                        "sample_rate": None,
                        "duration_ms": None,
                    }
                )
            yield pd.DataFrame(
                {"doc_id": ids, "payload": payloads, "meta": metas}
            )

    return df.select(id_col).mapInPandas(run, schema)


# ---------------------------------------------------------------------------
# PCM audio: full-payload synthesis + in-plan decode + feature extraction
#
# The image modality got its real in-container decode via the stdlib PNG
# codec above; this is the AUDIO counterpart — and unlike image decode
# (zlib inflate, inherently per-buffer Python), 16-bit PCM "decode" is
# just fixed-stride byte arithmetic, so the ENTIRE path (WAV container
# synthesis, sample extraction, feature math) stays in native Column
# expressions: one projection, zero UDFs, zero shuffle. Reference scope
# note: the reference library has no media handling of any kind
# (SURVEY.md §2.7); this is north-star extension surface.
# ---------------------------------------------------------------------------


def _le_hex(c: Column, nbytes: int) -> Column:
    """Little-endian fixed-width hex rendering of a non-negative long —
    the string building block for LE binary constructs (unhex once at
    the end, not per field)."""
    h = F.lpad(F.hex(c.cast("long")), 2 * nbytes, "0")
    return F.concat(
        *[F.substring(h, 2 * i + 1, 2) for i in reversed(range(nbytes))]
    )


def _le_int16_at(p: Column, pos: Column) -> Column:
    """Signed little-endian int16 read at DYNAMIC 1-based byte offset
    ``pos`` (``_le_uint`` handles static offsets): hex the 2-byte slice,
    swap the byte pairs, parse, then two's-complement fold."""
    h = F.hex(F.substring(p, pos, F.lit(2)))
    u = F.conv(
        F.concat(F.substring(h, 3, 2), F.substring(h, 1, 2)), 16, 10
    ).cast("long")
    return F.when(u >= 32768, u - 65536).otherwise(u)


def pcm_sample(seed: Column, i: Column) -> Column:
    """The deterministic sample formula shared by synthesis and oracles:
    ``((seed * 31 + i * 1031) % 4096) - 2048`` — full int16-safe swing
    with a fast-oscillating step (1031 is odd, coprime with 4096) so
    short clips still show sign flips; exact in any 64-bit engine."""
    return (seed * 31 + i * 1031) % 4096 - 2048


def synth_pcm_wav(
    seed: Column, n_samples: Column, sample_rate: Column
) -> Column:
    """A COMPLETE spec-exact mono 16-bit PCM WAV as binary: canonical
    44-byte RIFF/WAVE/fmt/data header plus a data chunk whose samples
    follow :func:`pcm_sample` (seed, i). Every size field is real
    (riff_size = 36 + 2n, byte_rate = 2 * rate, block_align = 2,
    data_size = 2n), so the payload opens in any WAV reader — the unit
    test round-trips it through the stdlib ``wave`` module. Built as
    one hex-string fold + a single ``unhex``: a pure projection.
    """
    n = n_samples.cast("long")
    # transform + array_join, not an aggregate fold: the fold's
    # accumulator re-concats a growing string per element (O(n^2)
    # copies per row); building the n pieces then joining once is
    # linear
    data_hex = F.array_join(
        F.transform(
            F.sequence(F.lit(0).cast("long"), n - 1),
            lambda i: _le_hex(
                F.when(
                    pcm_sample(seed, i) < 0, pcm_sample(seed, i) + 65536
                ).otherwise(pcm_sample(seed, i)),
                2,
            ),
        ),
        "",
    )
    return F.concat(
        F.unhex(F.lit(RIFF_MAGIC_HEX)),
        F.unhex(_le_hex(F.lit(36).cast("long") + n * 2, 4)),
        F.unhex(F.lit(WAVE_TAG_HEX)),
        F.unhex(F.lit("666D7420")),  # "fmt "
        F.unhex(F.lit("10000000")),  # fmt chunk size 16
        F.unhex(F.lit("0100")),      # PCM
        F.unhex(F.lit("0100")),      # mono
        F.unhex(_le_hex(sample_rate, 4)),
        F.unhex(_le_hex(sample_rate.cast("long") * 2, 4)),  # byte rate
        F.unhex(F.lit("0200")),      # block align
        F.unhex(F.lit("1000")),      # 16 bits
        F.unhex(F.lit("64617461")),  # "data"
        F.unhex(_le_hex(n * 2, 4)),
        F.unhex(data_hex),
    )


def pcm_features(payload: Column | str, *, stride: int = 1) -> Column:
    """Decode a canonical mono 16-bit PCM WAV and extract exact-integer
    audio features, all in one Column expression — the REAL audio
    decode path (fixed-stride byte arithmetic needs no codec):

    - ``sample_rate``, ``n_samples`` from the header (LE fields);
    - ``energy``     = sum(s_i^2)           (int64-exact: n * 2048^2);
    - ``peak_abs``   = max(|s_i|);
    - ``zero_cross`` = #{i : s_{i-1} * s_i < 0} (strict sign flips).

    NULL struct for anything that is not a canonical mono/16-bit PCM
    WAV (wrong magic, wrong layout, compressed) — the caller's schema
    stays total. A spec-valid but EMPTY data chunk (data_size=0) is
    likewise non-feature-bearing and yields the NULL struct: the
    predicate requires n >= 1, and the sample sequence length is
    clamped to >= 1 so a zero-sample row can never abort the job
    (the pre-r11 slice formulation used to raise
    INVALID_PARAMETER_VALUE.LENGTH via slice(samples, 1, -1)).
    Scale shape: a pure projection over bounded-length
    payloads; features shuffle as 4 longs, the payload never does.

    ``stride > 1`` DECIMATES the signal before feature extraction —
    only samples at indices 0, stride, 2*stride, ... are read
    (``n_samples`` reports the decimated count), the cheap integer
    downsampling a feature pipeline runs before an expensive model
    stage. No low-pass filter is applied (plain decimation, aliasing
    and all) — the point is exact, engine-replayable arithmetic, and
    the oracle replays the strided index set closed-form.
    """
    if stride < 1:
        raise ValueError(f"stride must be >= 1, got {stride}")
    p = F.col(payload) if isinstance(payload, str) else payload
    is_pcm16_mono = (
        (F.substring(p, 1, 4) == F.unhex(F.lit(RIFF_MAGIC_HEX)))
        & (F.substring(p, 9, 4) == F.unhex(F.lit(WAVE_TAG_HEX)))
        & (F.substring(p, 13, 4) == F.unhex(F.lit("666D7420")))
        & (_le_uint(p, 21, 2) == 1)   # PCM
        & (_le_uint(p, 23, 2) == 1)   # mono
        & (_le_uint(p, 35, 2) == 16)  # 16-bit
        & (F.substring(p, 37, 4) == F.unhex(F.lit("64617461")))
        # a data chunk the payload doesn't actually contain (truncated
        # file) must yield the NULL struct, not NULL-poisoned features
        & (F.octet_length(p) >= F.lit(44) + _le_uint(p, 41, 4))
        # data_size=0 is spec-valid but carries no samples: NULL struct
        & (_le_uint(p, 41, 4) >= 2)
    )
    n_raw = (_le_uint(p, 41, 4) / 2).cast("long")
    # decimated sample count: ceil(n_raw / stride) — the number of
    # indices 0, stride, 2*stride, ... below n_raw
    n = ((n_raw + (stride - 1)) / stride).cast("long")
    samples = F.transform(
        F.sequence(F.lit(0).cast("long"), F.greatest(n - 1, F.lit(0).cast("long"))),
        lambda i: _le_int16_at(
            p, (F.lit(45) + i * (2 * stride)).cast("int")
        ),
    )
    # ONE fold computes all three signal features (r11): the previous
    # shape referenced `samples` four times (energy fold, peak
    # transform, two zero-cross slices) and HOF subtrees are not
    # common-subexpression-eliminated, so the byte decode ran 4x per
    # row — measured 3.7 -> 1.7 s at sf0.1 for the fused single
    # traversal. The accumulator carries (prev, energy, peak, zc);
    # zero-cross seeds prev=NULL (NULL * s < 0 is NULL -> otherwise 0,
    # the same "first element never counts" semantics as the slice
    # pairing), and the finish lambda assembles the full output struct
    # so the aggregate itself is referenced exactly once.
    acc0 = F.struct(
        F.lit(None).cast("long").alias("prev"),
        F.lit(0).cast("long").alias("energy"),
        F.lit(0).cast("long").alias("peak"),
        F.lit(0).cast("long").alias("zc"),
    )

    def _step(acc: Column, s: Column) -> Column:
        return F.struct(
            s.alias("prev"),
            (acc["energy"] + s * s).alias("energy"),
            F.greatest(acc["peak"], F.abs(s)).alias("peak"),
            (
                acc["zc"]
                + F.when(acc["prev"] * s < 0, F.lit(1).cast("long"))
                .otherwise(F.lit(0).cast("long"))
            ).alias("zc"),
        )

    def _finish(acc: Column) -> Column:
        return F.struct(
            _le_uint(p, 25, 4).cast("int").alias("sample_rate"),
            n.alias("n_samples"),
            acc["energy"].alias("energy"),
            acc["peak"].alias("peak_abs"),
            acc["zc"].alias("zero_cross"),
        )

    feats = F.aggregate(samples, acc0, _step, _finish)
    null_t = "struct<sample_rate:int,n_samples:bigint,energy:bigint,peak_abs:bigint,zero_cross:bigint>"
    return F.when(is_pcm16_mono, feats).otherwise(F.lit(None).cast(null_t))
