"""Incremental index maintenance: foreachBatch merge + a real stream run."""

import pytest
from pyspark.sql import functions as F

from pg_ts_semantic_headline_spark.plans.index_build import build_index, load_index
from pg_ts_semantic_headline_spark.plans.query_compiler import phraseto_tspquery
from pg_ts_semantic_headline_spark.plans.search import bm25_topk, phrase_match_docs
from pg_ts_semantic_headline_spark.streaming import (
    attach_incremental_indexer, merge_batch)

CONFIG = "simple"
BASE = [(i, f"alpha beta gamma doc{i} common words here") for i in range(20)]
NEW = [(100, "alpha beta fresh needle phrase target arrives"),
       (101, "another fresh document beta gamma")]


@pytest.fixture()
def index_dir(spark, tmp_path):
    out = str(tmp_path / "idx")
    df = spark.createDataFrame(BASE, ["doc_id", "content"])
    build_index(spark, df, out, config=CONFIG, n_buckets=4,
                block_span=8, build_packed=False)
    return out


def test_merge_batch_updates_index(spark, index_dir):
    before = load_index(spark, index_dir)
    assert before.n_docs == 20
    batch = spark.createDataFrame(NEW, ["doc_id", "content"])
    merge_batch(spark, index_dir, batch, config=CONFIG)

    after = load_index(spark, index_dir)
    assert after.n_docs == 22
    # new docs searchable
    q = phraseto_tspquery(CONFIG, "needle phrase target")
    assert {r["doc_id"] for r in phrase_match_docs(after, q).collect()} == {100}
    top = bm25_topk(after, ["fresh"], k=5).collect()
    assert {r["doc_id"] for r in top} == {100, 101}
    # idf shifted: dictionary was re-aggregated over the union
    df_beta = after.terms.where(F.col("term") == "beta").first()["df"]
    assert df_beta == 22


def test_merge_invalidates_packed_blocks(spark, tmp_path):
    """A merge must not leave stale block-max metadata behind: merged docs
    are absent from packed meta (never block-max candidates) and stored
    bounds bake the pre-merge avgdl. After a merge, packed is gone —
    blockmax refuses, exact sees the new docs; a resume build repacks."""
    out = str(tmp_path / "idx_packed")
    df = spark.createDataFrame(BASE, ["doc_id", "content"])
    build_index(spark, df, out, config=CONFIG, n_buckets=4,
                block_span=8, build_packed=True)
    assert load_index(spark, out).packed is not None

    batch = spark.createDataFrame(NEW, ["doc_id", "content"])
    merge_batch(spark, out, batch, config=CONFIG)

    after = load_index(spark, out)
    assert after.packed is None
    with pytest.raises(ValueError, match="packed"):
        bm25_topk(after, ["fresh"], k=5, mode="blockmax")
    top = bm25_topk(after, ["fresh"], k=5, mode="exact").collect()
    assert {r["doc_id"] for r in top} == {100, 101}
    # default (lean) layout: packed was the only positional copy, so a
    # positional query after the merge must direct to compaction instead
    # of silently returning partial results
    q = phraseto_tspquery(CONFIG, "needle phrase target")
    with pytest.raises(ValueError, match="positions"):
        phrase_match_docs(after, q).collect()


def test_windowed_term_counts_stream(spark, tmp_path):
    """Watermarked windowed term counts over a real (availableNow) stream
    must equal the batch aggregation of the same rows."""
    import datetime as dt

    from pg_ts_semantic_headline_spark.streaming import windowed_term_counts

    src = str(tmp_path / "stream_src")
    base = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        (base, "alpha beta alpha"),
        (base + dt.timedelta(seconds=30), "beta gamma"),
        (base + dt.timedelta(minutes=1, seconds=10), "alpha alpha"),
    ]
    spark.createDataFrame(rows, "event_time timestamp, content string") \
        .write.parquet(src)

    stream = (spark.readStream
              .schema("event_time timestamp, content string").parquet(src))
    counts = windowed_term_counts(stream, config="simple",
                                  window="1 minute", watermark="2 minutes")
    # complete mode: append-mode windows only flush once the watermark
    # passes them, which a finite availableNow run never reaches
    q = (counts.writeStream.format("memory").queryName("wtc")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = {(r["window"]["start"].minute, r["term"]):
           (r["n_docs"], r["n_occurrences"])
           for r in spark.sql("SELECT * FROM wtc").collect()}
    assert got[(0, "alpha")] == (1, 2)
    assert got[(0, "beta")] == (2, 2)
    assert got[(0, "gamma")] == (1, 1)
    assert got[(1, "alpha")] == (1, 2)

    from pg_ts_semantic_headline_spark.streaming import doc_arrival_rates
    stream2 = (spark.readStream
               .schema("event_time timestamp, content string").parquet(src))
    rates = doc_arrival_rates(stream2, window="1 minute")
    q2 = (rates.writeStream.format("memory").queryName("dar")
          .outputMode("complete").trigger(availableNow=True).start())
    q2.awaitTermination(120)
    r = {row["window"]["start"].minute: (row["n_docs"], row["total_bytes"])
         for row in spark.sql("SELECT * FROM dar").collect()}
    assert r[0][0] == 2 and r[1][0] == 1
    assert r[0][1] == len("alpha beta alpha") + len("beta gamma")


def test_streaming_foreachbatch(spark, index_dir, tmp_path):
    src = str(tmp_path / "incoming")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(NEW, ["doc_id", "content"]).write.parquet(src)
    stream = (spark.readStream.schema("doc_id long, content string")
              .parquet(src))
    q = attach_incremental_indexer(stream, index_dir, ckpt, config=CONFIG)
    q.awaitTermination(120)
    after = load_index(spark, index_dir)
    assert after.n_docs == 22
