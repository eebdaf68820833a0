"""Corpus ingestion readers: JSONL / CSV / text-lines / whole-text files
via Spark's native sources, plus a WARC reader (the web-crawl archive
format, ISO 28500 — the standard input of web-scale training pipelines).

All readers return raw DataFrames; chain `normalize_corpus` to project
onto the engine's canonical (doc_id, repo, path, commit, lang, content)
shape.

WARC scale model: one task per WARC segment file (`binaryFile` — Common
Crawl segments are ~1 GB gzipped, the unit every WARC pipeline
processes per-worker), parsed by a pure-Python generator inside
`mapInPandas` so record bytes stream out in Arrow batches instead of
materializing one giant row. Multi-member gzip (one member per record,
the Common Crawl layout) is handled by GzipFile's native concatenated-
member support.
"""

from __future__ import annotations

import io
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession


def read_jsonl(spark: SparkSession, path: str, **options) -> DataFrame:
    """JSON-lines corpus (one document object per line) — the common
    interchange format for text datasets. Spark's native json source:
    schema inference is one extra pass; pass schema=... to skip it."""
    return spark.read.options(**options).json(path)


def read_csv_corpus(spark: SparkSession, path: str, **options) -> DataFrame:
    """CSV corpus with a header row by default."""
    opts = {"header": "true", "multiLine": "true", "escape": '"'}
    opts.update(options)
    return spark.read.options(**opts).csv(path)


def read_text_lines(spark: SparkSession, path: str) -> DataFrame:
    """One document per line: (doc_id, text) with a deterministic id
    (xxhash64 of the line — duplicate lines share an id, which exact
    dedup then collapses; use read_whole_files for path-keyed ids)."""
    from pyspark.sql import functions as F

    return (spark.read.text(path)
            .select(F.xxhash64("value").alias("doc_id"),
                    F.col("value").alias("text")))


def read_whole_files(spark: SparkSession, path: str) -> DataFrame:
    """One document per FILE: (path, text) via Spark's wholetext reader;
    doc_id = xxhash64(path)."""
    from pyspark.sql import functions as F

    return (spark.read.text(path, wholetext=True)
            .select(F.input_file_name().alias("path"),
                    F.col("value").alias("text"))
            .withColumn("doc_id", F.xxhash64("path")))


# --------------------------------------------------------------- WARC

WARC_SCHEMA = ("segment string, record_id string, warc_type string, "
               "target_uri string, content_type string, "
               "content_length long, payload binary")


def parse_warc_bytes(data: bytes, segment: str = "") -> Iterator[tuple]:
    """Pure-Python WARC record parser (ISO 28500 / WARC 1.0-1.1): yields
    (segment, record_id, warc_type, target_uri, content_type,
    content_length, payload) per record. Driver-testable without Spark.

    Spec structure: `WARC/1.x\\r\\n` version line, header lines until a
    blank line, exactly Content-Length payload bytes, then `\\r\\n\\r\\n`
    before the next record. Tolerates \\n-only line endings. Raises on a
    malformed header block rather than silently resyncing (a truncated
    segment should fail the task loudly, not drop records)."""
    pos, n = 0, len(data)
    while pos < n:
        # skip inter-record blank lines
        while pos < n and data[pos:pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n:
            return
        if not data.startswith(b"WARC/", pos):
            raise ValueError(
                f"malformed WARC at byte {pos} of {segment or '<bytes>'}: "
                f"expected version line, got {data[pos:pos + 20]!r}")
        hdr_end = data.find(b"\r\n\r\n", pos)
        hdr_sep = 4
        nl_end = data.find(b"\n\n", pos)
        if hdr_end == -1 or (nl_end != -1 and nl_end < hdr_end):
            hdr_end, hdr_sep = nl_end, 2
        if hdr_end == -1:
            raise ValueError(f"unterminated WARC header block at {pos}")
        headers = {}
        for line in data[pos:hdr_end].decode("utf-8", "replace") \
                                     .splitlines()[1:]:
            if ":" in line:
                k, v = line.split(":", 1)
                headers[k.strip().lower()] = v.strip()
        if "content-length" not in headers:
            raise ValueError(
                f"WARC record at byte {pos} of {segment or '<bytes>'} has "
                "no Content-Length header (spec-mandatory) — refusing to "
                "guess the payload extent")
        length = int(headers["content-length"])
        body_start = hdr_end + hdr_sep
        payload = data[body_start:body_start + length]
        if len(payload) < length:
            raise ValueError(
                f"truncated WARC payload at byte {body_start} of "
                f"{segment or '<bytes>'}: declared {length} bytes, "
                f"{len(payload)} present")
        yield (segment,
               headers.get("warc-record-id", ""),
               headers.get("warc-type", ""),
               headers.get("warc-target-uri", ""),
               headers.get("content-type", ""),
               length,
               payload)
        pos = body_start + length


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC segment files → one row per record. `.gz` segments are
    decompressed in-task (GzipFile reads the concatenated per-record
    members Common Crawl writes). Records stream out via mapInPandas in
    bounded Arrow batches — the segment's bytes are held once per task,
    never one row per segment."""
    import gzip

    import pandas as pd

    files = spark.read.format("binaryFile").load(path) \
        .select("path", "content")

    def gen(batches):
        for pdf in batches:
            for seg_path, blob in zip(pdf["path"], pdf["content"]):
                data = bytes(blob)
                if seg_path.endswith(".gz"):
                    with gzip.GzipFile(fileobj=io.BytesIO(data)) as fh:
                        data = fh.read()
                rows = []
                for rec in parse_warc_bytes(data, seg_path):
                    rows.append(rec)
                    if len(rows) >= 256:
                        yield pd.DataFrame(rows, columns=[
                            "segment", "record_id", "warc_type",
                            "target_uri", "content_type",
                            "content_length", "payload"])
                        rows = []
                if rows:
                    yield pd.DataFrame(rows, columns=[
                        "segment", "record_id", "warc_type", "target_uri",
                        "content_type", "content_length", "payload"])

    return files.mapInPandas(gen, schema=WARC_SCHEMA)


def warc_text_documents(warc_df: DataFrame) -> DataFrame:
    """(doc_id, path, text) with doc_id = xxhash64(record_id) and a
    lossy UTF-8 decode (wild-web bytes). Two record shapes, column
    algebra only:

    - `conversion` records (WET files): the WARC Content-Type is the
      text's own type — keep text/*; the payload IS the text.
    - `response` records (raw crawl WARCs): the WARC Content-Type is
      `application/http; msgtype=response` and the payload is an HTTP
      message — keep those whose HTTP headers declare a text/* body,
      and strip the header block (everything before the first blank
      line) so `text` is the body only."""
    from pyspark.sql import functions as F

    decoded = F.decode(F.col("payload"), "UTF-8")
    is_http = (F.col("warc_type") == "response") & \
        F.col("content_type").startswith("application/http")
    # HTTP header block = prefix before the first blank line; tolerate
    # bare-\n header endings the same way the WARC parser does — pick
    # whichever separator occurs EARLIER (a body containing \r\n\r\n
    # after \n\n-terminated headers must not be truncated to its tail)
    crlf = F.instr(decoded, "\r\n\r\n")
    lf = F.instr(decoded, "\n\n")
    sep_pos = F.when((crlf > 0) & ((lf == 0) | (crlf <= lf)), crlf + 3) \
        .otherwise(lf + 1)
    http_headers = F.lower(F.substring(decoded, F.lit(1), sep_pos))
    http_is_text = http_headers.contains("content-type: text/")
    body = F.substring(decoded, sep_pos + 1, F.length(decoded))

    plain_text = (F.col("warc_type") == "conversion") & \
        F.col("content_type").startswith("text/")
    return (warc_df
            .where(plain_text | (is_http & http_is_text))
            .select(F.xxhash64("record_id").alias("doc_id"),
                    F.col("target_uri").alias("path"),
                    F.when(is_http, body).otherwise(decoded)
                    .alias("text")))
