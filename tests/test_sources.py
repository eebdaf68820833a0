"""Corpus ingestion readers: JSONL/CSV/text wiring and the WARC parser
(spec-shaped fixtures built in-test, plain and gzipped)."""

import gzip
import io

import pytest
from pyspark.sql import functions as F

from pg_ts_semantic_headline_spark.sources import (
    normalize_corpus,
    parse_warc_bytes,
    read_jsonl,
    read_text_lines,
    read_warc,
    read_whole_files,
    warc_text_documents,
)


def _warc_record(rid, uri, body, wtype="response",
                 ctype="text/html"):
    payload = body.encode()
    hdr = (f"WARC/1.0\r\n"
           f"WARC-Type: {wtype}\r\n"
           f"WARC-Record-ID: {rid}\r\n"
           f"WARC-Target-URI: {uri}\r\n"
           f"Content-Type: {ctype}\r\n"
           f"Content-Length: {len(payload)}\r\n"
           f"\r\n").encode()
    return hdr + payload + b"\r\n\r\n"


HTTP_BODY = "hello warc world"
HTTP_MSG = ("HTTP/1.1 200 OK\r\n"
            "Content-Type: text/html; charset=utf-8\r\n"
            f"Content-Length: {len(HTTP_BODY)}\r\n"
            "\r\n" + HTTP_BODY)
RECORDS = [
    # realistic raw-crawl response: WARC Content-Type is application/http
    # and the payload is a full HTTP message (headers + body)
    ("<urn:uuid:r1>", "http://a.example/x", HTTP_MSG, "response",
     "application/http; msgtype=response"),
    ("<urn:uuid:r2>", "http://b.example/y", "second document body",
     "conversion", "text/plain"),
    ("<urn:uuid:r3>", "", "warcinfo payload", "warcinfo",
     "application/warc-fields"),
    # http response with a NON-text body: must be filtered out
    ("<urn:uuid:r4>", "http://c.example/z",
     "HTTP/1.1 200 OK\r\nContent-Type: image/png\r\n\r\nPNGBYTES",
     "response", "application/http; msgtype=response"),
]


def _warc_bytes():
    return b"".join(_warc_record(*r[:3], wtype=r[3], ctype=r[4])
                    for r in RECORDS)


def test_parse_warc_bytes_driver():
    recs = list(parse_warc_bytes(_warc_bytes(), "seg"))
    assert [r[1] for r in recs] == [r[0] for r in RECORDS]
    assert recs[0][3] == "http://a.example/x"
    assert recs[0][6] == HTTP_MSG.encode()
    assert recs[2][2] == "warcinfo"
    # malformed input raises loudly instead of silently dropping records
    with pytest.raises(ValueError, match="malformed WARC"):
        list(parse_warc_bytes(b"NOT A WARC", "seg"))
    # spec-mandatory Content-Length missing -> loud failure
    bad = (b"WARC/1.0\r\nWARC-Type: response\r\n\r\nbody\r\n\r\n")
    with pytest.raises(ValueError, match="no Content-Length"):
        list(parse_warc_bytes(bad, "seg"))
    # truncated payload -> loud failure
    trunc = _warc_record("<urn:uuid:t>", "u", "x" * 100)[:-20]
    with pytest.raises(ValueError, match="truncated"):
        list(parse_warc_bytes(trunc, "seg"))


def test_read_warc_plain_and_gzip(spark, tmp_path):
    plain = tmp_path / "seg1.warc"
    plain.write_bytes(_warc_bytes())
    # Common Crawl layout: one gzip member per record, concatenated
    gz = tmp_path / "seg2.warc.gz"
    buf = io.BytesIO()
    for r in RECORDS:
        member = io.BytesIO()
        with gzip.GzipFile(fileobj=member, mode="wb") as fh:
            fh.write(_warc_record(*r[:3], wtype=r[3], ctype=r[4]))
        buf.write(member.getvalue())
    gz.write_bytes(buf.getvalue())

    df = read_warc(spark, str(tmp_path))
    rows = df.collect()
    assert len(rows) == 8  # 4 records per segment
    assert {r["warc_type"] for r in rows} == {"response", "conversion",
                                              "warcinfo"}
    docs = warc_text_documents(df).collect()
    # warcinfo + non-text http response filtered out; the http response's
    # HTTP header block is STRIPPED so text is the body only
    assert sorted(r["text"] for r in docs) == sorted(
        ["hello warc world", "second document body"] * 2)
    # ids deterministic per record_id
    assert len({r["doc_id"] for r in docs}) == 2


def test_jsonl_and_text_readers(spark, tmp_path):
    j = tmp_path / "docs.jsonl"
    j.write_text('{"id": 1, "text": "alpha beta"}\n'
                 '{"id": 2, "text": "gamma delta"}\n')
    got = read_jsonl(spark, str(j)).orderBy("id").collect()
    assert [r["text"] for r in got] == ["alpha beta", "gamma delta"]

    t = tmp_path / "lines.txt"
    t.write_text("first doc line\nsecond doc line\n")
    lines = read_text_lines(spark, str(t)).collect()
    assert {r["text"] for r in lines} == {"first doc line",
                                          "second doc line"}
    whole = read_whole_files(spark, str(t)).collect()
    assert len(whole) == 1 and "second doc line" in whole[0]["text"]

    # normalize onto the canonical corpus shape
    norm = normalize_corpus(read_jsonl(spark, str(j)),
                            content_col="text", doc_id_col="id")
    assert set(norm.columns) >= {"doc_id", "content"}
    assert norm.count() == 2


def test_write_corpus_layout(spark, tmp_path):
    """maxRecordsPerFile bounds file sizes; partitioning + in-file doc_id
    ordering survive a round-trip."""
    import glob
    from pg_ts_semantic_headline_spark.sources import write_corpus

    df = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "de", f"doc number {i}")
         for i in range(100)], "doc_id long, lang string, text string")
    out = str(tmp_path / "corpus")
    write_corpus(df.repartition(1), out, partition_by="lang",
                 max_records_per_file=10)
    back = spark.read.parquet(out)
    assert back.count() == 100
    assert sorted(r["lang"] for r in back.select("lang").distinct()
                  .collect()) == ["de", "en"]
    files = glob.glob(f"{out}/lang=*/*.parquet")
    assert len(files) >= 10  # 100 rows / 10-per-file bound
    import pyarrow.parquet as pq
    for f in files:
        assert pq.ParquetFile(f).metadata.num_rows <= 10


def test_write_jsonl_roundtrip(spark, tmp_path):
    from pg_ts_semantic_headline_spark.sources import (read_jsonl,
                                                       write_jsonl)
    df = spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "doc_id long, text string")
    out = str(tmp_path / "jl")
    write_jsonl(df, out)
    back = read_jsonl(spark, out)
    assert sorted((r["doc_id"], r["text"]) for r in back.collect()) == \
        [(1, "alpha"), (2, "beta")]


def test_write_stream_corpus(spark, tmp_path):
    from pg_ts_semantic_headline_spark.sources import write_stream_corpus
    src = str(tmp_path / "src")
    spark.createDataFrame([(i, f"t{i}") for i in range(20)],
                          "doc_id long, text string").write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = write_stream_corpus(stream, str(tmp_path / "out"),
                            str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    assert spark.read.parquet(str(tmp_path / "out")).count() == 20
