"""Eval-set decontamination: report counts vs a brute-force n-gram
oracle, drop semantics, short-doc edges, and the broadcast-join shape."""

import pytest
from pyspark.sql import functions as F

from pg_ts_semantic_headline_spark.operators import (
    contamination_report,
    decontaminate,
    ngram_hash_df,
)

TRAIN = [
    (1, "the quick brown fox jumps over the lazy dog today"),
    (2, "completely unrelated training text about spark plans"),
    (3, "the quick brown fox jumps over something else entirely"),
    (4, None),
    (5, "short doc"),
    (6, ""),
]
EVAL = [
    (100, "benchmark: the quick brown fox jumps over the lazy dog"),
    (101, "another benchmark with no training overlap whatsoever"),
]


def py_ngrams(text, n):
    toks = text.split(" ") if text else []
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


@pytest.fixture(scope="module")
def frames(spark):
    return (spark.createDataFrame(TRAIN, "doc_id long, text string"),
            spark.createDataFrame(EVAL, "doc_id long, text string"))


def test_report_matches_bruteforce(spark, frames):
    train, ev = frames
    for n in (3, 5):
        got = {(r["train_id"], r["eval_id"]): r["n_shared"]
               for r in contamination_report(train, ev, n=n).collect()}
        want = {}
        for tid, ttxt in TRAIN:
            for eid, etxt in EVAL:
                shared = py_ngrams(ttxt, n) & py_ngrams(etxt, n)
                if shared:
                    want[(tid, eid)] = len(shared)
        assert got == want, n


def test_decontaminate_drops_any_hit(spark, frames):
    train, ev = frames
    clean = sorted(r["doc_id"]
                   for r in decontaminate(train, ev, n=5).collect())
    # docs 1 and 3 share >=1 five-gram with eval doc 100; all else kept
    assert clean == [2, 4, 5, 6]
    # min_shared raises the tolerance: doc 3 shares only 2 five-grams
    clean3 = sorted(r["doc_id"]
                    for r in decontaminate(train, ev, n=5,
                                           min_shared=3).collect())
    assert clean3 == [2, 3, 4, 5, 6]


def test_short_and_null_docs_emit_nothing(spark):
    df = spark.createDataFrame(
        [(1, "two words"), (2, ""), (3, None), (4, "one")],
        "doc_id long, text string")
    assert ngram_hash_df(df, n=3).collect() == []


def test_eval_side_broadcasts(spark, frames):
    train, ev = frames
    plan = (contamination_report(train, ev, n=5)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan, plan


def test_hashes_are_distinct_per_doc(spark):
    # a doc repeating the same n-gram must count it once
    df = spark.createDataFrame(
        [(1, "a b c a b c a b c")], "doc_id long, text string")
    rows = ngram_hash_df(df, n=3).collect()
    assert len(rows) == len({r["h"] for r in rows}) == 3  # abc, bca, cab


def test_streaming_decontamination(spark, frames, tmp_path):
    """An availableNow stream of training docs filtered per micro-batch:
    the appended clean set equals the batch decontaminate result."""
    from pg_ts_semantic_headline_spark.operators import (
        attach_decontaminator)
    train, ev = frames
    src = str(tmp_path / "src")
    train.write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    out = str(tmp_path / "clean")
    q = attach_decontaminator(stream, ev, out, str(tmp_path / "ckpt"), n=5)
    q.awaitTermination(120)
    got = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    want = sorted(r["doc_id"] for r in decontaminate(train, ev, n=5).collect())
    assert got == want == [2, 4, 5, 6]
