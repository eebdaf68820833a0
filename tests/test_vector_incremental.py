"""Incremental add/delete/compact for the persisted vector indexes
(LSH-ANN, IVF, IVF-PQ): append-equals-rebuild, delete visibility, the
delete-then-re-add replace flow, and compaction folding."""

import random

import pytest
from pyspark.sql import functions as F

from pg_ts_semantic_headline_spark.operators.similarity import (
    ann_add_vectors,
    build_ann_index,
    build_ivf_index,
    build_ivfpq_index,
    compact_vector_index,
    cosine_topk,
    delete_vectors,
    ivf_add_vectors,
    ivfpq_add_vectors,
    load_ann_index,
    load_ivf_index,
    load_ivfpq_index,
)


def _rows(n, dim=16, seed=7):
    rng = random.Random(seed)
    return [(i, [rng.gauss(0, 1) for _ in range(dim)]) for i in range(n)]


@pytest.fixture(scope="module")
def vec_rows():
    return _rows(60)


@pytest.fixture(scope="module")
def vec_df(spark, vec_rows):
    return spark.createDataFrame(vec_rows, ["vec_id", "embedding"])


def topk(index, qv, k=10, **kw):
    return [(r["vec_id"], round(r["cosine"], 9))
            for r in index.query(qv, k=k, **kw).collect()]


def test_ann_add_equals_rebuild(spark, vec_df, vec_rows, tmp_path):
    """Building on half then appending the rest must answer identically
    to a one-shot build: the planes are fixed at build, so assignment is
    deterministic and order-independent."""
    full, incr = str(tmp_path / "full"), str(tmp_path / "incr")
    first = vec_df.where(F.col("vec_id") < 30)
    rest = vec_df.where(F.col("vec_id") >= 30)
    build_ann_index(vec_df, full, n_planes=6, seed=42)
    build_ann_index(first, incr, n_planes=6, seed=42)
    h = load_ann_index(spark, incr)
    ann_add_vectors(h, rest)
    h2 = load_ann_index(spark, incr)
    assert h2.max_gen == 1
    qv = vec_rows[3][1]
    assert topk(h2, qv) == topk(load_ann_index(spark, full), qv)


def test_ann_delete_and_replace(spark, vec_df, vec_rows, tmp_path):
    out = str(tmp_path / "ann")
    build_ann_index(vec_df, out, n_planes=4, seed=42)
    h = load_ann_index(spark, out)
    qv = vec_rows[5][1]
    before = [i for i, _ in topk(h, qv, k=5)]
    assert before[0] == 5
    delete_vectors(h, [5, before[1]])
    h = load_ann_index(spark, out)
    after = [i for i, _ in topk(h, qv, k=5)]
    assert 5 not in after and before[1] not in after
    # replace: re-add vec 5 with a DIFFERENT vector — only the new one
    # is visible (generation supersedes the tombstone)
    new_vec = [float(x) for x in vec_rows[7][1]]
    repl = spark.createDataFrame([(5, new_vec)], ["vec_id", "embedding"])
    ann_add_vectors(h, repl)
    h = load_ann_index(spark, out)
    got = topk(h, new_vec, k=3)
    assert got[0][0] in (5, 7) and abs(got[0][1] - 1.0) < 1e-9
    ids = [i for i, _ in got]
    assert 5 in ids and 7 in ids  # both exact matches of the query
    # compaction folds tombstones in without losing the re-added vector
    compact_vector_index(spark, out)
    h2 = load_ann_index(spark, out)
    assert h2.tombstones is None
    # gens are PRESERVED by compaction (crash-safety: leftover tombstones
    # must never shadow live rows), so max_gen stays advanced
    assert h2.max_gen == 1
    assert topk(h2, new_vec, k=3) == got
    assert before[1] not in [i for i, _ in topk(h2, qv, k=10)]


def test_ivf_incremental_bruteforce_parity(spark, vec_df, vec_rows,
                                           tmp_path):
    """With nprobe=n_lists the IVF path is exact, so after add+delete the
    results must equal brute-force cosine over the live vector set."""
    out = str(tmp_path / "ivf")
    first = vec_df.where(F.col("vec_id") < 40)
    rest = vec_df.where(F.col("vec_id") >= 40)
    build_ivf_index(first, out, n_lists=4, seed=1)
    h = load_ivf_index(spark, out)
    ivf_add_vectors(h, rest)
    delete_vectors(h, [0, 1, 2])
    h = load_ivf_index(spark, out)
    qv = vec_rows[9][1]
    got = topk(h, qv, nprobe=4)
    live = vec_df.where(~F.col("vec_id").isin([0, 1, 2]))
    want = [(r["vec_id"], round(r["cosine"], 9))
            for r in cosine_topk(live, qv, k=10).collect()]
    assert got == want
    compact_vector_index(spark, out)
    h2 = load_ivf_index(spark, out)
    assert h2.tombstones is None
    assert topk(h2, qv, nprobe=4) == want


def test_ivfpq_incremental_bruteforce_parity(spark, vec_df, vec_rows,
                                             tmp_path):
    """rerank=None + nprobe=n_lists is the IVF-PQ exactness mode; it must
    hold across adds and deletes (codes and vectors stay consistent)."""
    out = str(tmp_path / "pq")
    first = vec_df.where(F.col("vec_id") < 40)
    rest = vec_df.where(F.col("vec_id") >= 40)
    build_ivfpq_index(first, out, n_lists=4, m=4, nbits=4, seed=1)
    h = load_ivfpq_index(spark, out)
    ivfpq_add_vectors(h, rest)
    delete_vectors(h, [41, 9])
    h = load_ivfpq_index(spark, out)
    qv = vec_rows[41][1]
    got = topk(h, qv, nprobe=4, rerank=None)
    live = vec_df.where(~F.col("vec_id").isin([41, 9]))
    want = [(r["vec_id"], round(r["cosine"], 9))
            for r in cosine_topk(live, qv, k=10).collect()]
    assert got == want
    # the ADC shortlist path must also exclude deleted ids
    short = [i for i, _ in topk(h, qv, nprobe=4, rerank=20)]
    assert 41 not in short and 9 not in short
    compact_vector_index(spark, out)
    h2 = load_ivfpq_index(spark, out)
    assert h2.tombstones is None
    assert topk(h2, qv, nprobe=4, rerank=None) == want


def test_adhoc_handles_are_readonly(spark, vec_df):
    from pg_ts_semantic_headline_spark.operators.similarity import AnnIndex
    h = AnnIndex(vec_df, None)
    with pytest.raises(ValueError, match="read-only"):
        delete_vectors(h, [1])


def test_streaming_vector_ingest(spark, vec_df, vec_rows, tmp_path):
    """A real (availableNow) stream of vectors appended via foreachBatch:
    after the run the index answers identically to a one-shot build over
    base + streamed rows."""
    from pg_ts_semantic_headline_spark.streaming import (
        attach_vector_indexer)

    out, full = str(tmp_path / "s_ann"), str(tmp_path / "s_full")
    base = vec_df.where(F.col("vec_id") < 30)
    extra_rows = [(r[0], r[1]) for r in _rows(60)[30:]]
    build_ann_index(base, out, n_planes=6, seed=42)
    build_ann_index(vec_df, full, n_planes=6, seed=42)

    src = str(tmp_path / "src")
    spark.createDataFrame(extra_rows, ["vec_id", "embedding"]) \
        .write.parquet(src)
    stream = (spark.readStream.schema("vec_id long, embedding array<double>")
              .parquet(src))
    q = attach_vector_indexer(stream, out, str(tmp_path / "ckpt"),
                              kind="ann")
    q.awaitTermination(120)
    qv = vec_rows[3][1]
    got = topk(load_ann_index(spark, out), qv)
    assert got == topk(load_ann_index(spark, full), qv)
    assert load_ann_index(spark, out).max_gen >= 1

    with pytest.raises(ValueError, match="unknown vector index kind"):
        attach_vector_indexer(stream, out, str(tmp_path / "ckpt2"),
                              kind="flat")


def test_ivf_knn_join_bruteforce_parity(spark, vec_df, vec_rows, tmp_path):
    """nprobe=n_lists makes the kNN join exactly the brute-force kNN
    join: for every query, results equal per-query brute-force cosine."""
    from pg_ts_semantic_headline_spark.operators.similarity import (
        ivf_knn_join)
    out = str(tmp_path / "knn_ivf")
    build_ivf_index(vec_df, out, n_lists=4, seed=1)
    h = load_ivf_index(spark, out)
    queries = vec_df.where(F.col("vec_id") < 5) \
        .select(F.col("vec_id").alias("query_id"), "embedding")
    got = {}
    for r in ivf_knn_join(h, queries, k=5, nprobe=4).collect():
        got.setdefault(r["query_id"], []).append(
            (r["vec_id"], round(r["cosine"], 9)))
    for qid in range(5):
        got[qid].sort(key=lambda t: (-t[1], t[0]))
        want = [(r["vec_id"], round(r["cosine"], 9))
                for r in cosine_topk(vec_df, vec_rows[qid][1], k=5).collect()]
        assert got[qid] == want, qid
    # deletes are honored in the join too
    delete_vectors(h, [0])
    h = load_ivf_index(spark, out)
    joined = ivf_knn_join(h, queries, k=5, nprobe=4).collect()
    assert all(r["vec_id"] != 0 for r in joined)
    # skew salting: per-chunk top-k is a superset of global winners, so
    # salted results are identical to unsalted
    h2 = load_ivf_index(spark, out)
    salted = sorted((r["query_id"], r["vec_id"], round(r["cosine"], 9))
                    for r in ivf_knn_join(h2, queries, k=5, nprobe=4,
                                          salt=4).collect())
    unsalted = sorted((r["query_id"], r["vec_id"], round(r["cosine"], 9))
                      for r in joined)
    assert salted == unsalted


def test_ivf_knn_join_boundary_ties_deterministic(spark, tmp_path):
    """k exact-duplicate vectors straddling the shortlist boundary must
    resolve by ascending vec_id, not argpartition's arbitrary pick."""
    from pg_ts_semantic_headline_spark.operators.similarity import (
        ivf_knn_join)
    base = [1.0] + [0.0] * 7
    rows = [(i, base) for i in range(20)]          # 20 identical vectors
    rows += [(100, [0.0] * 7 + [1.0])]             # one orthogonal vector
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = str(tmp_path / "ties")
    build_ivf_index(df, out, n_lists=2, seed=3)
    h = load_ivf_index(spark, out)
    q = spark.createDataFrame([(0, base)], ["query_id", "embedding"])
    got = [r["vec_id"]
           for r in ivf_knn_join(h, q, k=5, nprobe=2).collect()]
    assert sorted(got) == [0, 1, 2, 3, 4]  # lowest ids among the 20 ties


def test_ann_knn_join_matches_per_query_handle(spark, vec_df, vec_rows,
                                               tmp_path):
    """The LSH batch join must return exactly what per-query
    AnnIndex.query returns (same buckets probed, same scoring), and
    salting must not change results."""
    from pg_ts_semantic_headline_spark.operators.similarity import (
        ann_knn_join)
    out = str(tmp_path / "annknn")
    build_ann_index(vec_df, out, n_planes=5, seed=42)
    h = load_ann_index(spark, out)
    queries = vec_df.where(F.col("vec_id") < 5) \
        .select(F.col("vec_id").alias("query_id"), "embedding")
    got = {}
    for r in ann_knn_join(h, queries, k=5).collect():
        got.setdefault(r["query_id"], []).append(
            (r["vec_id"], round(r["cosine"], 9)))
    for qid in range(5):
        got[qid].sort(key=lambda t: (-t[1], t[0]))
        want = topk(h, vec_rows[qid][1], k=5)
        assert got[qid] == want, qid
    salted = {(r["query_id"], r["vec_id"]) for r in
              ann_knn_join(h, queries, k=5, salt=3).collect()}
    assert salted == {(q, v) for q, lst in got.items() for v, _ in lst}


def test_streaming_fielded_ingest(spark, tmp_path):
    """availableNow stream appended into a fielded BM25F index equals a
    one-shot build over the same rows."""
    from pg_ts_semantic_headline_spark.plans.fielded import (
        bm25f_topk, build_fielded_index, load_fielded_index)
    from pg_ts_semantic_headline_spark.streaming import (
        attach_fielded_indexer)

    rows = [(i, f"title{i % 3} spark", f"body words window doc{i}")
            for i in range(30)]
    base, extra = rows[:10], rows[10:]
    idx = str(tmp_path / "fidx")
    build_fielded_index(
        spark, spark.createDataFrame(base, ["doc_id", "title", "body"]),
        idx, ["title", "body"], config="simple", n_buckets=4)
    src = str(tmp_path / "src")
    spark.createDataFrame(extra, ["doc_id", "title", "body"]) \
        .coalesce(2).write.parquet(src)
    stream = spark.readStream.schema(
        "doc_id long, title string, body string").parquet(src)
    q = attach_fielded_indexer(stream, idx, str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    reb = str(tmp_path / "reb")
    build_fielded_index(
        spark, spark.createDataFrame(rows, ["doc_id", "title", "body"]),
        reb, ["title", "body"], config="simple", n_buckets=4)
    w = {"title": 2.0, "body": 1.0}
    got = [(r["doc_id"], r["score"]) for r in
           bm25f_topk(load_fielded_index(spark, idx), w,
                      ["spark", "window"], k=50).collect()]
    want = [(r["doc_id"], r["score"]) for r in
            bm25f_topk(load_fielded_index(spark, reb), w,
                       ["spark", "window"], k=50).collect()]
    assert got == want and len(got) == 30
