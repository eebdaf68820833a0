"""Multimodal column plumbing: binary payloads with typed metadata.

Images/audio/video ride through the engine as opaque `binary` columns plus a
typed metadata struct. The Spark-side plumbing — schemas, Arrow batch shapes,
mapInPandas iteration, partition sizing — is real and tested. Two decoders
ship: `image_header_decoder` is REAL — it parses PNG/JPEG/GIF/BMP/WebP
container headers for width/height/format with no external deps (the
production shape for a metadata pass over a binary column: O(header) bytes
read per blob) — and `deterministic_fake_decoder` remains the stand-in for
full pixel/audio decode paths whose libraries (PIL/ffmpeg) are not in this
container; either drops into `decoder=` without touching the plan. Passing
`decoder=None` raises NotImplementedError at plan-build time, making a
missing codec explicit rather than silent.
"""

from __future__ import annotations

import numbers
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (BinaryType, IntegerType, LongType, StringType,
                               StructField, StructType)

MEDIA_SCHEMA = StructType([
    StructField("doc_id", LongType(), False),
    StructField("kind", StringType(), False),
    StructField("payload", BinaryType(), True),
    StructField("n_bytes", LongType(), True),
    StructField("sha256", StringType(), True),
])

DECODED_SCHEMA = StructType([
    StructField("doc_id", LongType(), False),
    StructField("kind", StringType(), False),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("format", StringType(), True),
    StructField("n_bytes", LongType(), True),
])

FRAME_SCHEMA = StructType([
    StructField("doc_id", LongType(), False),
    StructField("frame_id", IntegerType(), False),
    StructField("offset", LongType(), False),
    StructField("frame_bytes", BinaryType(), True),
])


def attach_binary(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", kind: str = "image") -> DataFrame:
    """Materialize an opaque binary payload column + typed metadata.
    (In production the payload comes from the lake; here it is the utf-8
    bytes of the text column so the plumbing is fully exercised.)"""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.lit(kind).alias("kind"),
        payload.alias("payload"),
        F.length(payload).cast("long").alias("n_bytes"),
        F.sha2(payload, 256).alias("sha256"))


def deterministic_fake_decoder(payload: bytes) -> dict:
    """STUB codec: stable pseudo width/height/format from the bytes.
    Replace with PIL/ffmpeg in an environment that has them."""
    if payload is None:
        return {"width": None, "height": None, "format": None}
    h = 0
    for b in payload[:64]:
        h = (h * 131 + b) % (1 << 31)
    return {"width": 64 + h % 1024, "height": 64 + (h // 1024) % 1024,
            "format": ["png", "jpeg", "webp"][h % 3]}


def image_header_decoder(payload: bytes) -> dict:
    """REAL decoder for image dimensions, no external deps: parses the
    container headers of PNG / JPEG / GIF / BMP / WebP (VP8, VP8L, VP8X)
    from the first bytes of the payload — the same information PIL's
    `Image.open(...).size` reads, without decoding pixel data. This is
    the production shape for a metadata-extraction pass over a 100 TB
    binary column: O(header) bytes examined per blob, contract-validated
    like every decoder. Unknown/truncated/corrupt payloads return the
    all-None row rather than raising (bad blobs are data, not bugs;
    filter on `format IS NULL` downstream)."""
    none = {"width": None, "height": None, "format": None}
    if not payload:
        return none
    b = payload
    try:
        # PNG: 8-byte signature, IHDR must be the first chunk; width and
        # height are big-endian uint32 at offsets 16 and 20
        if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24:
            if b[12:16] == b"IHDR":
                return {"width": int.from_bytes(b[16:20], "big"),
                        "height": int.from_bytes(b[20:24], "big"),
                        "format": "png"}
            return none
        # JPEG: SOI then marker segments; dimensions live in the first
        # SOFn frame header (C0-CF minus the non-frame C4/C8/CC)
        if b[:2] == b"\xff\xd8":
            i = 2
            while i + 4 <= len(b):
                if b[i] != 0xFF:        # not a marker — corrupt stream
                    return none
                marker = b[i + 1]
                if marker == 0xFF:      # fill byte
                    i += 1
                    continue
                if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                    i += 2              # standalone markers, no length
                    continue
                seg_len = int.from_bytes(b[i + 2:i + 4], "big")
                if seg_len < 2:
                    return none
                if (0xC0 <= marker <= 0xCF
                        and marker not in (0xC4, 0xC8, 0xCC)):
                    if i + 9 > len(b):
                        return none
                    return {"width": int.from_bytes(b[i + 7:i + 9], "big"),
                            "height": int.from_bytes(b[i + 5:i + 7], "big"),
                            "format": "jpeg"}
                i += 2 + seg_len
            return none
        # GIF: 6-byte version, then little-endian uint16 logical screen
        if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
            return {"width": int.from_bytes(b[6:8], "little"),
                    "height": int.from_bytes(b[8:10], "little"),
                    "format": "gif"}
        # BMP: 'BM', signed little-endian int32 at 18/22 (height may be
        # negative for top-down rows — report the magnitude)
        if b[:2] == b"BM" and len(b) >= 26:
            return {"width": int.from_bytes(b[18:22], "little",
                                            signed=True),
                    "height": abs(int.from_bytes(b[22:26], "little",
                                                 signed=True)),
                    "format": "bmp"}
        # WebP: RIFF container, three encodings (per-branch length
        # guards: VP8 reads through byte 30, VP8L through 25, VP8X 30)
        if b[:4] == b"RIFF" and b[8:12] == b"WEBP" and len(b) >= 25:
            chunk = b[12:16]
            if chunk == b"VP8 ":       # lossy: dims after the frame tag
                if len(b) < 30 or b[23:26] != b"\x9d\x01\x2a":
                    return none
                return {"width": int.from_bytes(b[26:28], "little")
                        & 0x3FFF,
                        "height": int.from_bytes(b[28:30], "little")
                        & 0x3FFF,
                        "format": "webp"}
            if chunk == b"VP8L":       # lossless: 14-bit dims minus one
                if b[20] != 0x2F:
                    return none
                bits = int.from_bytes(b[21:25], "little")
                return {"width": (bits & 0x3FFF) + 1,
                        "height": ((bits >> 14) & 0x3FFF) + 1,
                        "format": "webp"}
            if chunk == b"VP8X":       # extended: 24-bit canvas minus one
                if len(b) < 30:
                    return none
                return {"width": int.from_bytes(b[24:27], "little") + 1,
                        "height": int.from_bytes(b[27:30], "little") + 1,
                        "format": "webp"}
            return none
        return none
    except (IndexError, ValueError):
        return none


#: keys a decoder callable must return; values: width/height int or
#: None, format str or None. Validated PER ROW inside the Arrow kernel so
#: a misbehaving user decoder fails with the contract spelled out instead
#: of a KeyError / Arrow cast error buried in an executor traceback.
DECODER_CONTRACT_KEYS = ("width", "height", "format")


def _validated_meta(m, decoder_name: str) -> dict:
    if not isinstance(m, dict) or any(k not in m
                                      for k in DECODER_CONTRACT_KEYS):
        raise TypeError(
            f"decoder {decoder_name!r} violated the contract: must return "
            f"a dict with keys {DECODER_CONTRACT_KEYS}, got {m!r}")
    for k in ("width", "height"):
        v = m[k]
        if v is not None and (isinstance(v, bool)
                              or not isinstance(v, numbers.Integral)):
            raise TypeError(
                f"decoder {decoder_name!r} violated the contract: "
                f"{k} must be an int or None, got {type(v).__name__}")
    if m["format"] is not None and not isinstance(m["format"], str):
        raise TypeError(
            f"decoder {decoder_name!r} violated the contract: format "
            f"must be a str or None, got {type(m['format']).__name__}")
    return m


def decode_media(df: DataFrame,
                 decoder: Callable[[bytes], dict] | None = deterministic_fake_decoder,
                 batch_hint: int = 256) -> DataFrame:
    """mapInPandas decode: Arrow batches of binary payloads → metadata rows.
    This is where a real image decode / resize / feature-extract kernel
    plugs in; the iteration shape (streamed batches, no collect) is the
    production shape. Each decoder return value is validated against
    DECODER_CONTRACT_KEYS (width/height int|None, format str|None) so a
    non-conforming user decoder fails loudly with the contract named."""
    if decoder is None:
        raise NotImplementedError(
            "no media codec available in this environment; pass a decoder "
            "callable (e.g. PIL-based) or use deterministic_fake_decoder")
    decoder_name = getattr(decoder, "__name__", repr(decoder))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [_validated_meta(
                        decoder(bytes(p) if p is not None else None),
                        decoder_name)
                    for p in pdf["payload"]]
            out = pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "kind": pdf["kind"],
                "width": [m["width"] for m in meta],
                "height": [m["height"] for m in meta],
                "format": [m["format"] for m in meta],
                "n_bytes": pdf["n_bytes"],
            })
            yield out

    return df.mapInPandas(run, schema=DECODED_SCHEMA)


def sample_frames(df: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame sampling plumbing: split each payload into n equal-offset
    chunks (the stand-in for video frame extraction); pure column algebra."""
    idx = F.explode(F.sequence(F.lit(0), F.lit(n_frames - 1))).alias("frame_id")
    step = F.greatest((F.col("n_bytes") / n_frames).cast("long"), F.lit(1))
    return (df.select("doc_id", "payload", "n_bytes", idx)
            .withColumn("offset", F.col("frame_id") * step)
            .select("doc_id", "frame_id", "offset",
                    F.expr("substring(payload, offset + 1, "
                           "greatest(int(n_bytes / {n}), 1))".format(n=n_frames))
                    .alias("frame_bytes")))
