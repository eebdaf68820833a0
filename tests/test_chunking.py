"""Chunking + token-budget sampling: window math, coverage invariants,
budget expectation, exact-prefix semantics, determinism."""

import pytest
from pyspark.sql import functions as F

from pg_ts_semantic_headline_spark.operators.chunking import (
    chunk_documents,
    sample_token_budget,
    sample_token_budget_exact,
)

DOCS = [
    (0, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9", "en"),       # 10 tokens
    (1, "a b c", "en"),                                # 3 tokens (< chunk)
    (2, "", "de"),                                     # empty -> no chunks
    (3, None, "de"),                                   # null  -> no chunks
    (4, " ".join(f"w{i}" for i in range(25)), "de"),   # 25 tokens
    (5, "solo", "fr"),                                 # 1 token
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string, lang string")


def test_chunk_windows_and_truncation(spark, docs):
    rows = {(r["doc_id"], r["chunk_id"]): r
            for r in chunk_documents(docs, chunk_tokens=8,
                                     overlap=4).collect()}
    # doc 0: 10 tokens, stride 4, starts 0 and 4 (8 >= 10-4 dropped)
    assert {(d, c) for d, c in rows if d == 0} == {(0, 0), (0, 1)}
    assert rows[(0, 0)]["chunk_text"] == "t0 t1 t2 t3 t4 t5 t6 t7"
    assert rows[(0, 1)]["chunk_text"] == "t4 t5 t6 t7 t8 t9"
    assert rows[(0, 1)]["start_token"] == 4
    assert rows[(0, 1)]["n_tokens"] == 6
    # short doc: one whole-doc chunk
    assert rows[(1, 0)]["chunk_text"] == "a b c"
    assert rows[(1, 0)]["n_tokens"] == 3
    # empty/null docs emit nothing
    assert not any(d in (2, 3) for d, _ in rows)
    # 25 tokens, stride 4: starts 0,4,8,12,16,20 (24 >= 25-4 dropped)
    assert sorted(c for d, c in rows if d == 4) == list(range(6))


def test_chunk_coverage_invariant(spark, docs):
    # every token index is covered by at least one chunk, and consecutive
    # chunks overlap by exactly `overlap` (except the truncated last one)
    for chunk_tokens, overlap in [(8, 4), (8, 0), (5, 2), (32, 8)]:
        chunks = chunk_documents(docs, chunk_tokens, overlap).collect()
        by_doc = {}
        for r in chunks:
            by_doc.setdefault(r["doc_id"], []).append(r)
        for doc_id, text, _lang in DOCS:
            n = len(text.split()) if text else 0
            got = sorted(by_doc.get(doc_id, []),
                         key=lambda r: r["start_token"])
            if n == 0:
                assert got == []
                continue
            covered = set()
            for r in got:
                covered |= set(range(r["start_token"],
                                     r["start_token"] + r["n_tokens"]))
                assert r["n_tokens"] <= chunk_tokens
            assert covered == set(range(n)), (doc_id, chunk_tokens, overlap)


def test_chunk_rejects_bad_overlap(spark, docs):
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=8, overlap=8)


def test_sample_budget_expectation_and_determinism(spark, docs):
    s1 = sorted(r["doc_id"] for r in
                sample_token_budget(docs, 10 ** 9,
                                    stratify_by="lang").collect())
    # budget >= total tokens -> keep probability 1 -> everything kept
    assert s1 == [0, 1, 2, 4, 5]  # null-text doc 3 drops (no token count)
    s2 = sample_token_budget(docs, 20, stratify_by="lang").collect()
    s3 = sample_token_budget(docs, 20, stratify_by="lang").collect()
    assert sorted(r["doc_id"] for r in s2) == sorted(
        r["doc_id"] for r in s3)  # same hash draw every run
    for r in s2:
        assert r["n_tokens"] == len(
            (dict((d, t) for d, t, _l in DOCS)[r["doc_id"]] or "x").split())


def test_sample_budget_unstratified(spark, docs):
    kept = sample_token_budget(docs, 10 ** 9).collect()
    assert sorted(r["doc_id"] for r in kept) == [0, 1, 2, 4, 5]


def test_sample_exact_prefix(spark, docs):
    # en stratum: docs 0 (10 tok) and 1 (3 tok); md5 order decides prefix
    kept = sample_token_budget_exact(docs, 11, stratify_by="lang").collect()
    en = sorted(r["doc_id"] for r in kept if r["lang"] == "en")
    # budget 11 fits exactly one of the two en docs, whichever hashes first
    assert len(en) == 1
    # a huge budget keeps both
    kept_all = sample_token_budget_exact(docs, 10 ** 9,
                                         stratify_by="lang").collect()
    assert sorted(r["doc_id"] for r in kept_all
                  if r["lang"] == "en") == [0, 1]
    # first row of a stratum survives even under an impossible budget
    kept_min = sample_token_budget_exact(docs, 1, stratify_by="lang").collect()
    assert {r["lang"] for r in kept_min} >= {"en", "fr"}


def test_sample_exact_cumsum_respects_budget(spark, docs):
    kept = sample_token_budget_exact(docs, 12, stratify_by="lang").collect()
    by_lang = {}
    for r in kept:
        by_lang.setdefault(r["lang"], []).append(r["n_tokens"])
    for lang, toks in by_lang.items():
        assert sum(toks) <= 12 or len(toks) == 1, (lang, toks)


def test_source_mix_weights(spark):
    """Weights sum to 1, follow tokens^alpha, and flatten as alpha->0."""
    from pg_ts_semantic_headline_spark.operators.chunking import (
        source_mix_weights)
    rows = [(i, "s_big" if i < 90 else "s_small",
             "tok " * 50) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    w1 = {r["source"]: r["weight"]
          for r in source_mix_weights(df, alpha=1.0).collect()}
    assert abs(sum(w1.values()) - 1.0) < 1e-12
    assert abs(w1["s_big"] - 0.9) < 1e-12  # proportional at alpha=1
    w0 = {r["source"]: r["weight"]
          for r in source_mix_weights(df, alpha=0.3).collect()}
    assert abs(sum(w0.values()) - 1.0) < 1e-12
    # temperature flattens: the small source gains share as alpha drops
    assert w0["s_small"] > w1["s_small"]


class TestPackSequences:
    """Greedy doc-boundary packing: first-fit-in-order per shard,
    oversize docs isolated, deterministic across partitionings."""

    def _docs(self, spark, sizes):
        rows = [(i, " ".join(["w"] * n)) for i, n in enumerate(sizes)]
        return spark.createDataFrame(rows, ["doc_id", "text"])

    def test_greedy_packing_matches_python_replay(self, spark):
        from pg_ts_semantic_headline_spark.operators.chunking import (
            pack_sequences)
        sizes = [3, 4, 5, 2, 9, 1, 8, 8, 1, 30, 2, 2]
        cap = 10
        df = self._docs(spark, sizes)
        got = {r["doc_id"]: (r["shard"], r["seq_id"], r["oversize"])
               for r in pack_sequences(df, cap, n_shards=1).collect()}
        seq, fill, want = 0, 0, {}
        for i, n in enumerate(sizes):
            if fill > 0 and fill + n > cap:
                seq, fill = seq + 1, 0
            want[i] = (0, seq, n > cap)
            fill += n
        assert got == want
        # no sequence (except oversize singletons) exceeds the budget
        from collections import defaultdict
        per_seq = defaultdict(int)
        for i, n in enumerate(sizes):
            per_seq[want[i][1]] += n
        for s, tot in per_seq.items():
            members = [i for i in want if want[i][1] == s]
            assert tot <= cap or (len(members) == 1
                                  and sizes[members[0]] > cap)

    def test_deterministic_across_partitionings(self, spark):
        from pg_ts_semantic_headline_spark.operators.chunking import (
            pack_sequences)
        import random
        rng = random.Random(3)
        sizes = [rng.randint(1, 40) for _ in range(300)]
        df = self._docs(spark, sizes)
        a = sorted(map(tuple, pack_sequences(
            df.repartition(1), 64, n_shards=8).collect()))
        b = sorted(map(tuple, pack_sequences(
            df.repartition(13), 64, n_shards=8).collect()))
        assert a == b
        # every doc appears exactly once and shards are doc_id % 8
        assert len(a) == 300
        assert all(r[1] == r[0] % 8 for r in a)

    def test_shard_col_and_validation(self, spark):
        import pyspark.sql.functions as F
        import pytest as _p
        from pg_ts_semantic_headline_spark.operators.chunking import (
            pack_sequences)
        df = self._docs(spark, [2, 2, 2, 2]).withColumn(
            "src", (F.col("doc_id") < 2).cast("int"))
        rows = pack_sequences(df, 4, n_shards=99,
                              shard_col="src").collect()
        assert {r["shard"] for r in rows} == {0, 1}
        with _p.raises(ValueError):
            pack_sequences(df, 0)


class TestSourceMixIntegerGate:
    """Round-5 determinism contract for source_mix_weights: pow is
    quantized to an e6 BIGINT inside the operator, and the e4 gate weight
    is an integer-ratio rounding whose only remaining op (IEEE double
    division) is correctly rounded — so Spark and DuckDB agree whenever
    scaled_e6 agrees, including on exact .5 e4 boundaries (the round-4
    driver flake class)."""

    def test_operator_emits_quantized_scaled_e6(self, spark):
        from pg_ts_semantic_headline_spark.operators.chunking import (
            source_mix_weights)
        rows = [(i, "s_big" if i < 90 else "s_small", "tok " * 50)
                for i in range(100)]
        df = spark.createDataFrame(
            rows, "doc_id long, source string, text string")
        out = {r["source"]: r for r in
               source_mix_weights(df, alpha=0.7).collect()}
        for r in out.values():
            # scaled_e6 is exactly round(pow(n_tokens, 0.7) * 1e6)
            assert r["scaled_e6"] == round(r["n_tokens"] ** 0.7 * 1e6)
        tot = sum(r["scaled_e6"] for r in out.values())
        # weight is the exact integer ratio (one correctly-rounded div)
        for r in out.values():
            assert r["weight"] == r["scaled_e6"] / tot

    def test_e4_ratio_rounding_matches_duckdb_on_boundaries(self, spark):
        """Constructed .5 boundary: scaled_e6=(9999, 10001) → total 20000
        → 9999·1e4/20000 = 4999.5 EXACTLY (representable double); both
        engines must round half-up to 5000. Plus off-boundary pairs."""
        import duckdb
        from pyspark.sql import Window
        cases = [(9999, 10001), (1, 1), (3, 5), (12345, 7655),
                 (1, 199999), (499999, 500001)]
        for s1, s2 in cases:
            total = s1 + s2
            df = spark.createDataFrame([(s1,), (s2,)], "scaled_e6 long")
            w = Window.partitionBy()
            got = sorted(r[0] for r in df.select(
                F.round(F.col("scaled_e6") * F.lit(1e4)
                        / F.sum("scaled_e6").over(w).cast("double"))
                .cast("long").alias("w")).collect())
            duck = sorted(r[0] for r in duckdb.sql(
                f"SELECT CAST(ROUND(s * 1e4 / CAST({total} AS DOUBLE)) "
                f"AS BIGINT) FROM (VALUES ({s1}), ({s2})) v(s)").fetchall())
            assert got == duck, (s1, s2, got, duck)
        # pin the half-up boundary value itself
        assert 5000 in [r[0] for r in duckdb.sql(
            "SELECT CAST(ROUND(9999 * 1e4 / 20000.0) AS BIGINT)"
        ).fetchall()]

    def test_pow_e6_quantization_parity_sweep(self, spark):
        """Empirical residual-risk scan: round(pow(n,0.7)·1e6) agrees
        between the JVM and DuckDB's libm for every n_tokens 1..50000 on
        this platform. A failure here would name the exact n where the
        one remaining ulp surface bites."""
        import duckdb
        jvm = dict(spark.range(1, 50001).select(
            F.col("id"),
            F.round(F.pow(F.col("id").cast("double"), F.lit(0.7))
                    * F.lit(1e6)).cast("long").alias("s")).collect())
        duck = dict(duckdb.sql(
            "SELECT r AS id, CAST(ROUND(pow(r, 0.7) * 1e6) AS BIGINT) "
            "FROM range(1, 50001) t(r)").fetchall())
        mism = [n for n in jvm if jvm[n] != duck[n]]
        assert not mism, mism[:20]
