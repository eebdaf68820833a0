"""Multimodal column plumbing: binary payloads with typed metadata.

Images/audio/video ride through the engine as opaque `binary` columns plus a
typed metadata struct. The Spark-side plumbing — schemas, Arrow batch shapes,
mapInPandas iteration, partition sizing — is real and tested; the actual
codec step is stubbed (the image/audio libraries are not in this container)
behind `decoder=` hooks: the default `deterministic_fake_decoder` derives
stable pseudo-metadata from the payload bytes so pipelines are testable
end-to-end, and a real decoder (PIL/ffmpeg) drops in without touching the
plan. Passing `decoder=None` raises NotImplementedError at plan-build time,
making the stub explicit rather than silent.
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
