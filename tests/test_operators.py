"""Pipeline operator tests: dedup, similarity, text stats, multimodal."""

import math
import random

import pytest
from pyspark.sql import functions as F

from pg_ts_semantic_headline_spark.operators import (
    attach_binary, cosine_topk, cosine_topk_arrow, decode_media,
    doc_fingerprint, exact_duplicates, lang_id, lsh_ann_topk,
    minhash_lsh_dedup, ngram_jaccard_pairs, quality_score, sample_frames,
    simhash_near_pairs, token_counts)


@pytest.fixture(scope="module")
def text_df(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy cat"),   # near-dup of 0
        (2, "completely different content about spark engines"),
        (3, "the quick brown fox jumps over the lazy dog"),   # exact dup of 0
        (4, "der schnelle braune fuchs und die faule katze"),
        (5, "el rapido zorro marron y el perro perezoso de la casa"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


@pytest.fixture(scope="module")
def emb_df(spark):
    rng = random.Random(7)
    rows = []
    for i in range(50):
        rows.append((i, [rng.gauss(0, 1) for _ in range(16)]))
    # vec 49 = exact copy of vec 0 (must be its top neighbor)
    rows[49] = (49, rows[0][1])
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


class TestDedup:
    def test_exact(self, text_df):
        got = {r["doc_id"]: (r["canonical_id"], r["is_duplicate"])
               for r in exact_duplicates(text_df).collect()}
        assert got[0] == (0, False)
        assert got[3] == (0, True)
        assert got[2] == (2, False)

    def test_ngram_jaccard(self, text_df):
        pairs = {(r["a"], r["b"]): r["jaccard"]
                 for r in ngram_jaccard_pairs(text_df, threshold=0.3).collect()}
        assert (0, 3) in pairs and pairs[(0, 3)] == 1.0
        assert (0, 1) in pairs and 0.3 <= pairs[(0, 1)] < 1.0
        assert (0, 2) not in pairs

    def test_minhash_lsh_finds_exact_and_near(self, text_df):
        pairs = {(r["a"], r["b"]) for r in
                 minhash_lsh_dedup(text_df, threshold=0.3).collect()}
        assert (0, 3) in pairs
        assert all(a < b for a, b in pairs)

    def test_simhash_near(self, text_df):
        pairs = {(r["a"], r["b"]): r["hamming"]
                 for r in simhash_near_pairs(text_df, max_hamming=4).collect()}
        assert pairs.get((0, 3)) == 0

    def test_simhash_near_pairs_complete_vs_bruteforce(self, spark):
        """The chunked pigeonhole blocking (max_hamming+1 chunks) must find
        EVERY pair with hamming <= max_hamming — including pairs whose
        differing bits straddle both 16-bit halves, which the r2 two-half
        blocking silently missed."""
        from pg_ts_semantic_headline_spark.operators.dedup import simhash
        rng = random.Random(11)
        words = ["alpha", "beta", "gamma", "delta", "merge", "sort",
                 "spark", "query", "window", "batch", "stream", "scan"]
        rows = [(i, " ".join(rng.choices(words, k=rng.randint(3, 12))))
                for i in range(100)]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        sims = {r["doc_id"]: r["simhash"]
                for r in simhash(df, bits=32).collect()}
        want = set()
        ids = sorted(sims)
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                if bin(sims[a] ^ sims[b]).count("1") <= 3:
                    want.add((a, b))
        got = {(r["a"], r["b"])
               for r in simhash_near_pairs(df, max_hamming=3).collect()}
        assert got == want
        assert want, "corpus produced no near pairs; test is vacuous"
        # and at least one found pair differs in BOTH 16-bit halves
        # (the case two-half blocking could not catch unless hamming<=1)
        straddling = [(a, b) for a, b in want
                      if (sims[a] ^ sims[b]) & 0xFFFF
                      and (sims[a] ^ sims[b]) >> 16
                      and bin(sims[a] ^ sims[b]).count("1") > 1]
        assert straddling, "no half-straddling pair; add more docs"

    def test_lsh_band_cap_bounds_degenerate_buckets(self, spark):
        """A pathological corpus where 1k docs share every band signature
        must not emit 1k² candidate pairs: with the cap the degenerate
        buckets are dropped (observably), and distinct docs still dedup
        through their own non-degenerate buckets."""
        from pg_ts_semantic_headline_spark.operators.dedup import (
            lsh_candidate_pairs, minhash_signatures, shingle_df)
        rows = [(i, "same boilerplate header text repeated everywhere")
                for i in range(1000)]
        rows += [(2000, "a genuinely different document about spark"),
                 (2001, "a genuinely different document about spark")]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        sh = shingle_df(df)
        sigs = minhash_signatures(sh, 16)
        stats: dict = {}
        cands = lsh_candidate_pairs(sigs, 4, 4, max_band_size=50,
                                    drop_stats=stats)
        pairs = {(r["a"], r["b"]) for r in cands.collect()}
        # O(N·cap) bound: the 1000-dup cluster contributes nothing, the
        # small genuine cluster still pairs
        assert (2000, 2001) in pairs
        assert len(pairs) <= 50 * 1002
        assert not any(a < 1000 and b < 1000 for a, b in pairs)
        got = stats["observation"].get
        assert got["dropped_buckets"] == 4          # one per band
        assert got["dropped_rows"] == 4 * 1000

    def test_containment_doc_in_doc(self, spark):
        """A doc fully quoted inside a bigger doc scores containment 1.0
        while its Jaccard stays low — the signal the operator exists for."""
        from pg_ts_semantic_headline_spark.operators.dedup import (
            ngram_containment_pairs, ngram_jaccard_pairs)
        small = "alpha beta gamma delta epsilon"
        big = small + " " + " ".join(f"filler{i}" for i in range(40))
        df = spark.createDataFrame(
            [(1, small), (2, big), (3, "totally different text entirely")],
            ["doc_id", "text"])
        got = {(r["a"], r["b"]): r["containment"]
               for r in ngram_containment_pairs(df, threshold=0.9).collect()}
        assert got == {(1, 2): 1.0}
        jac = {(r["a"], r["b"]): r["jaccard"]
               for r in ngram_jaccard_pairs(df, threshold=0.0).collect()}
        assert jac[(1, 2)] < 0.1  # Jaccard would have missed it

    def test_lsh_drop_stats_survive_empty_result(self, spark):
        """When EVERY band bucket is dropped the candidate result is
        empty and AQE elides the CollectMetrics node — the drop_stats
        handle must still report the counts (via its recount fallback)
        instead of raising a JVM AssertionError."""
        from pg_ts_semantic_headline_spark.operators.dedup import (
            lsh_candidate_pairs, minhash_signatures, shingle_df)
        rows = [(i, "same boilerplate header text repeated everywhere")
                for i in range(100)]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        sigs = minhash_signatures(shingle_df(df), 16)
        stats: dict = {}
        cands = lsh_candidate_pairs(sigs, 4, 4, max_band_size=50,
                                    drop_stats=stats)
        assert cands.collect() == []
        got = stats["observation"].get
        assert got["dropped_buckets"] == 4
        assert got["dropped_rows"] == 4 * 100

    def test_duplicate_components_long_chain_pointer_jumping(self, spark):
        """A 120-node path graph has diameter 119; plain min-label
        propagation needs 119 rounds — pointer jumping must converge well
        inside max_iter=20 (O(log n) rounds)."""
        from pg_ts_semantic_headline_spark.operators import (
            duplicate_components)
        n = 120
        docs = spark.createDataFrame([(i,) for i in range(n)], ["doc_id"])
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(n - 1)], ["a", "b"])
        got = {r["doc_id"]: r["component_id"]
               for r in duplicate_components(docs, pairs,
                                             max_iter=20).collect()}
        assert all(v == 0 for v in got.values())

    def test_duplicate_components_nonconvergence_raises(self, spark):
        from pg_ts_semantic_headline_spark.operators import (
            duplicate_components)
        n = 40
        docs = spark.createDataFrame([(i,) for i in range(n)], ["doc_id"])
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(n - 1)], ["a", "b"])
        with pytest.raises(RuntimeError, match="did not converge"):
            duplicate_components(docs, pairs, max_iter=1)

    def test_duplicate_components_reliable_checkpoint(self, spark, tmp_path):
        """The cluster-safe checkpoint mode: persists label rounds to the
        checkpoint dir instead of executor-local blocks."""
        from pg_ts_semantic_headline_spark.operators import (
            duplicate_components)
        spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
        docs = spark.createDataFrame([(i,) for i in range(6)], ["doc_id"])
        pairs = spark.createDataFrame([(0, 1), (1, 2), (4, 5)], ["a", "b"])
        got = {r["doc_id"]: r["component_id"]
               for r in duplicate_components(
                   docs, pairs, checkpoint="reliable").collect()}
        assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 4, 5: 4}

    def test_duplicate_components_chain(self, spark):
        """A chain a-b, b-c must collapse into ONE component even though
        (a, c) was never a direct pair — the transitive step plain pair
        filtering misses."""
        from pg_ts_semantic_headline_spark.operators import (
            duplicate_components)
        docs = spark.createDataFrame(
            [(i,) for i in range(6)], ["doc_id"])
        pairs = spark.createDataFrame(
            [(0, 1), (1, 2), (4, 5)], ["a", "b"])
        got = {r["doc_id"]: (r["component_id"], r["is_canonical"])
               for r in duplicate_components(docs, pairs).collect()}
        assert got[0] == (0, True)
        assert got[1] == (0, False)
        assert got[2] == (0, False)   # transitive via 1
        assert got[3] == (3, True)    # singleton
        assert got[4] == (4, True)
        assert got[5] == (4, False)


class TestSimilarity:
    def test_exact_copy_is_top1(self, emb_df):
        qv = emb_df.where("vec_id = 0").first()["embedding"]
        top = cosine_topk(emb_df, qv, k=3).collect()
        ids = [r["vec_id"] for r in top]
        assert ids[0] == 0 and ids[1] == 49
        assert abs(top[0]["cosine"] - 1.0) < 1e-9
        assert abs(top[1]["cosine"] - 1.0) < 1e-9

    def test_arrow_path_matches_builtin(self, emb_df):
        qv = emb_df.where("vec_id = 7").first()["embedding"]
        a = [(r["vec_id"], round(r["cosine"], 9))
             for r in cosine_topk(emb_df, qv, k=10).collect()]
        b = [(r["vec_id"], round(r["cosine"], 9))
             for r in cosine_topk_arrow(emb_df, qv, k=10).collect()]
        assert a == b

    def test_lsh_ann_contains_exact_copy(self, emb_df):
        qv = emb_df.where("vec_id = 0").first()["embedding"]
        got = [r["vec_id"] for r in lsh_ann_topk(emb_df, qv, k=5).collect()]
        assert got[0] == 0 and 49 in got

    def test_persisted_ann_matches_adhoc(self, emb_df, tmp_path):
        """ann_query over the persisted bucket-partitioned table must equal
        the ad-hoc recompute path (same planes, same probes, same rerank),
        and its scan must prune to the probed bucket directories."""
        from pg_ts_semantic_headline_spark.operators.similarity import (
            ann_candidates, ann_query, build_ann_index)
        out = str(tmp_path / "ann_idx")
        build_ann_index(emb_df, out, n_planes=8, seed=42)
        qv = emb_df.where("vec_id = 3").first()["embedding"]
        spark = emb_df.sparkSession
        adhoc = [(r["vec_id"], round(r["cosine"], 9)) for r in
                 lsh_ann_topk(emb_df, qv, k=5).collect()]
        persisted = [(r["vec_id"], round(r["cosine"], 9)) for r in
                     ann_query(spark, out, qv, k=5).collect()]
        assert adhoc == persisted
        from pg_ts_semantic_headline_spark.operators import load_ann_index
        handle = [(r["vec_id"], round(r["cosine"], 9)) for r in
                  load_ann_index(spark, out).query(qv, k=5).collect()]
        assert handle == persisted
        # partition pruning: the probe filter must reach the scan as a
        # partition filter (inputFiles() reflects the pre-pruning listing,
        # so inspect the physical plan)
        cands = ann_candidates(spark, out, qv)
        plan = cands._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters: [bucket" in plan


class TestIvfAnn:
    """IVF coarse-quantizer ANN: trained spherical-k-means lists instead of
    data-oblivious hyperplanes."""

    def test_training_deterministic(self, emb_df):
        import numpy as np
        from pg_ts_semantic_headline_spark.operators import (
            train_ivf_centroids)
        a = train_ivf_centroids(emb_df, n_lists=8, seed=42)
        b = train_ivf_centroids(emb_df, n_lists=8, seed=42)
        assert np.allclose(a, b)
        assert a.shape == (8, 16)
        # unit centroids (cosine geometry)
        assert np.allclose(np.linalg.norm(a, axis=1), 1.0)

    def test_full_probe_is_exact(self, emb_df, tmp_path):
        """nprobe == n_lists scans every row ⇒ identical to brute force —
        the exactness contract that backs the oracle entry."""
        from pg_ts_semantic_headline_spark.operators import (
            build_ivf_index, load_ivf_index)
        out = str(tmp_path / "ivf_idx")
        build_ivf_index(emb_df, out, n_lists=8, seed=42)
        idx = load_ivf_index(emb_df.sparkSession, out)
        qv = emb_df.where("vec_id = 7").first()["embedding"]
        exact = [(r["vec_id"], round(r["cosine"], 9)) for r in
                 cosine_topk(emb_df, qv, k=10).collect()]
        full = [(r["vec_id"], round(r["cosine"], 9)) for r in
                idx.query(qv, k=10, nprobe=idx.n_lists).collect()]
        assert full == exact

    def test_probe_pruning_and_self_recall(self, emb_df, tmp_path):
        """A vector queried against the index must land in its own list's
        probe set at nprobe=1 (assignment and probing use the same argmax),
        and the candidate scan must prune to the probed directories."""
        from pg_ts_semantic_headline_spark.operators import (
            build_ivf_index, load_ivf_index)
        out = str(tmp_path / "ivf_idx2")
        build_ivf_index(emb_df, out, n_lists=8, seed=42)
        idx = load_ivf_index(emb_df.sparkSession, out)
        qv = emb_df.where("vec_id = 0").first()["embedding"]
        got = [r["vec_id"] for r in idx.query(qv, k=5, nprobe=1).collect()]
        assert got[0] == 0 and 49 in got  # 49 is the exact copy of 0
        plan = (idx.candidates(qv, nprobe=2)._jdf.queryExecution()
                .executedPlan().toString())
        assert "PartitionFilters: [list_id" in plan

    def test_zero_vector_robust(self, spark):
        from pg_ts_semantic_headline_spark.operators import (
            build_ivf_index, load_ivf_index)
        import tempfile
        rows = [(0, [0.0] * 8), (1, [1.0] + [0.0] * 7),
                (2, [0.0, 1.0] + [0.0] * 6), (3, [1.0] * 8)]
        df = spark.createDataFrame(rows, ["vec_id", "embedding"])
        out = tempfile.mkdtemp(prefix="tsp_ivf_zero_")
        build_ivf_index(df, out, n_lists=2, seed=1)
        idx = load_ivf_index(spark, out)
        got = idx.query([1.0] + [0.0] * 7, k=4, nprobe=idx.n_lists).collect()
        ids = [r["vec_id"] for r in got]
        assert ids[0] == 1     # exact match first
        assert 0 not in ids    # zero vector: cosine undefined, never ranks


class TestIvfPq:
    """IVF-PQ: product-quantized codes inside the IVF lists — ADC shortlist
    scan + full-precision re-rank."""

    def test_full_probe_full_rerank_is_exact(self, emb_df, tmp_path):
        """nprobe=n_lists + rerank=None re-ranks every row at full
        precision ⇒ identical to brute force (the oracle contract)."""
        from pg_ts_semantic_headline_spark.operators.similarity import (
            build_ivfpq_index, load_ivfpq_index)
        out = str(tmp_path / "ivfpq_idx")
        build_ivfpq_index(emb_df, out, n_lists=4, m=4, nbits=4, seed=42)
        idx = load_ivfpq_index(emb_df.sparkSession, out)
        qv = emb_df.where("vec_id = 7").first()["embedding"]
        exact = [(r["vec_id"], round(r["cosine"], 9)) for r in
                 cosine_topk(emb_df, qv, k=10).collect()]
        full = [(r["vec_id"], round(r["cosine"], 9)) for r in
                idx.query(qv, k=10, nprobe=idx.n_lists,
                          rerank=None).collect()]
        assert full == exact

    def test_adc_shortlist_recall_and_code_size(self, emb_df, tmp_path):
        """The ADC path (rerank bounded) must still surface the exact
        duplicate pair, codes must be exactly m bytes, and the ADC score
        must approximate true cosine for the self-match."""
        from pg_ts_semantic_headline_spark.operators.similarity import (
            build_ivfpq_index, load_ivfpq_index, pq_adc_arrow)
        out = str(tmp_path / "ivfpq_idx2")
        build_ivfpq_index(emb_df, out, n_lists=4, m=4, nbits=4, seed=42)
        spark = emb_df.sparkSession
        idx = load_ivfpq_index(spark, out)
        assert all(len(r["code"]) == 4 for r in idx.codes.collect())
        qv = emb_df.where("vec_id = 0").first()["embedding"]
        got = [r["vec_id"] for r in
               idx.query(qv, k=5, nprobe=idx.n_lists, rerank=10).collect()]
        assert set(got[:2]) == {0, 49}   # exact copies, full-precision tie
        # ADC self-score: quantized cosine of vec 0 vs itself ≈ 1
        adc = pq_adc_arrow(idx.codebooks, idx.splits, qv)
        row = (idx.codes.where("vec_id = 0")
               .select(adc(F.col("code")).alias("s")).first())
        assert row["s"] > 0.8

    def test_build_deterministic_and_pruned(self, emb_df, tmp_path):
        """Same seed ⇒ byte-identical codes; the codes scan prunes to the
        probed list directories (ADC reads codes only, never vectors)."""
        from pg_ts_semantic_headline_spark.operators.similarity import (
            build_ivfpq_index, load_ivfpq_index)
        spark = emb_df.sparkSession
        out_a, out_b = str(tmp_path / "pq_a"), str(tmp_path / "pq_b")
        build_ivfpq_index(emb_df, out_a, n_lists=4, m=4, nbits=4, seed=9)
        build_ivfpq_index(emb_df, out_b, n_lists=4, m=4, nbits=4, seed=9)
        a = {r["vec_id"]: r["code"] for r in
             load_ivfpq_index(spark, out_a).codes.collect()}
        b = {r["vec_id"]: r["code"] for r in
             load_ivfpq_index(spark, out_b).codes.collect()}
        assert a == b
        idx = load_ivfpq_index(spark, out_a)
        qv = emb_df.where("vec_id = 3").first()["embedding"]
        probes = idx.probe_lists(qv, nprobe=2)
        plan = (idx.codes.where(F.col("list_id").isin(probes))
                ._jdf.queryExecution().executedPlan().toString())
        assert "PartitionFilters: [list_id" in plan

    def test_uneven_subspace_split(self, spark, tmp_path):
        """dim not divisible by m: array_split boundaries must agree
        between encoder and ADC (dim=10, m=4 → sizes 3,3,2,2)."""
        import random as _r
        from pg_ts_semantic_headline_spark.operators.similarity import (
            build_ivfpq_index, load_ivfpq_index)
        rng = _r.Random(3)
        rows = [(i, [rng.gauss(0, 1) for _ in range(10)]) for i in range(30)]
        df = spark.createDataFrame(rows, ["vec_id", "embedding"])
        out = str(tmp_path / "pq_uneven")
        build_ivfpq_index(df, out, n_lists=2, m=4, nbits=4, seed=5)
        idx = load_ivfpq_index(spark, out)
        assert [hi - lo for lo, hi in idx.splits] == [3, 3, 2, 2]
        qv = rows[4][1]
        got = [r["vec_id"] for r in
               idx.query(qv, k=3, nprobe=idx.n_lists, rerank=10).collect()]
        assert got[0] == 4


class TestPipeline:
    """Composed corpus-prep flow: annotate -> filter-with-reason ->
    exact dedup -> near dedup, plus the one-action report."""

    @pytest.fixture(scope="class")
    def prep_input(self, spark):
        rows = [
            (0, "the quick brown fox jumps over the lazy dog and runs to"
                " the hills"),
            (1, "the quick brown fox jumps over the lazy dog and runs to"
                " the hills"),                                # exact dup of 0
            (2, "the quick brown fox jumps over the lazy cat and runs to"
                " the hills"),                                # near dup of 0
            (3, "word word word"),                            # too short
            (4, "zz zz zz zz zz zz zz zz zz zz zz zz"),       # low quality
            (5, "der schnelle braune fuchs und die faule katze ist im"
                " haus von den"),                             # german
        ]
        return spark.createDataFrame(rows, ["doc_id", "text"])

    def test_reasons_and_order(self, prep_input):
        from pg_ts_semantic_headline_spark.operators import prepare_corpus
        prep = prepare_corpus(prep_input, min_tokens=5, min_quality=0.3,
                              allowed_langs=("en",), exact_dedup=True,
                              near_dedup=True, jaccard_threshold=0.4)
        got = {r["doc_id"]: r["drop_reason"] for r in prep.collect()}
        assert got == {0: None, 1: "exact_dup", 2: "near_dup",
                       3: "too_short", 4: "low_quality", 5: "lang"}

    def test_report_single_row(self, prep_input):
        from pg_ts_semantic_headline_spark.operators import (
            corpus_report, prepare_corpus)
        prep = prepare_corpus(prep_input, min_tokens=5, min_quality=0.3,
                              allowed_langs=("en",), exact_dedup=True,
                              near_dedup=True, jaccard_threshold=0.4)
        r = corpus_report(prep).collect()
        assert len(r) == 1
        row = r[0].asDict()
        assert row == {"n_input": 6, "n_kept": 1, "n_too_short": 1,
                       "n_too_long": 0, "n_low_quality": 1, "n_lang": 1,
                       "n_repetitive": 0, "n_lm_quality": 0,
                       "n_exact_dup": 1, "n_near_dup": 1}

    def test_filters_only_keeps_every_row(self, prep_input):
        from pg_ts_semantic_headline_spark.operators import prepare_corpus
        prep = prepare_corpus(prep_input, min_tokens=1, min_quality=0.0,
                              exact_dedup=False, near_dedup=False)
        rows = prep.collect()
        assert len(rows) == 6
        assert all(r["drop_reason"] is None for r in rows)
        # annotation agrees with the standalone operators (shared exprs)
        ql = {r["doc_id"]: r["quality"]
              for r in quality_score(prep_input).collect()}
        lg = {r["doc_id"]: r["lang_pred"]
              for r in lang_id(prep_input).collect()}
        for r in rows:
            assert r["quality"] == ql[r["doc_id"]]
            assert r["lang_pred"] == lg[r["doc_id"]]

    def test_max_tokens_branch(self, prep_input):
        from pg_ts_semantic_headline_spark.operators import prepare_corpus
        prep = prepare_corpus(prep_input, min_tokens=1, max_tokens=5,
                              min_quality=0.0, exact_dedup=False)
        got = {r["doc_id"]: r["drop_reason"] for r in prep.collect()}
        assert got[3] is None and got[0] == "too_long"


class TestTextStats:
    def test_token_counts(self, text_df):
        r = {x["doc_id"]: x for x in token_counts(text_df).collect()}
        assert r[0]["ws_tokens"] == 9
        assert r[0]["regex_tokens"] == 9

    def test_lang_id(self, text_df):
        got = {r["doc_id"]: r["lang_pred"] for r in lang_id(text_df).collect()}
        assert got[0] == "en"
        assert got[4] == "de"
        assert got[5] == "es"

    def test_quality_monotone_in_content(self, text_df):
        rows = {r["doc_id"]: r for r in quality_score(text_df).collect()}
        assert 0 < rows[0]["quality"] <= 1
        assert rows[0]["unique_ratio"] < 1.0  # repeated 'the'

    def test_fingerprint_stable_and_distinct(self, text_df):
        fp = {r["doc_id"]: r["fingerprint"]
              for r in doc_fingerprint(text_df).collect()}
        assert fp[0] == fp[3]
        assert fp[0] != fp[2]


class TestMultimodal:
    def test_binary_plumbing_roundtrip(self, text_df):
        media = attach_binary(text_df)
        r = {x["doc_id"]: x for x in media.collect()}
        assert r[0]["n_bytes"] == len("the quick brown fox jumps over the lazy dog")
        assert len(r[0]["sha256"]) == 64

    def test_decode_stub_deterministic(self, text_df):
        decoded = decode_media(attach_binary(text_df)).collect()
        d = {x["doc_id"]: (x["width"], x["height"], x["format"]) for x in decoded}
        assert d[0] == d[3]               # same payload → same fake metadata
        assert all(v[0] >= 64 for v in d.values())

    def test_decode_without_codec_raises(self, text_df):
        with pytest.raises(NotImplementedError):
            decode_media(attach_binary(text_df), decoder=None)

    def test_custom_decoder_contract_happy_path(self, text_df):
        # a user-supplied decoder that honors the contract plugs into the
        # same plan and its values come through typed
        def my_decoder(payload):
            n = 0 if payload is None else len(payload)
            return {"width": n, "height": 2 * n, "format": "raw"}

        got = {r["doc_id"]: r for r in decode_media(
            attach_binary(text_df), decoder=my_decoder).collect()}
        n0 = len("the quick brown fox jumps over the lazy dog")
        assert (got[0]["width"], got[0]["height"], got[0]["format"]) == \
               (n0, 2 * n0, "raw")
        assert got[0]["n_bytes"] == n0

    def test_custom_decoder_contract_violations_fail_loudly(self, text_df):
        # the contract is validated per row inside the Arrow kernel:
        # missing keys / wrong types name the decoder and the contract
        # instead of dying in a KeyError or an Arrow cast
        media = attach_binary(text_df)
        cases = [
            ("missing_keys", lambda p: {"width": 1}),
            ("non_dict", lambda p: (1, 2, "png")),
            ("float_width", lambda p: {"width": 1.5, "height": 2,
                                       "format": "png"}),
            ("bool_height", lambda p: {"width": 1, "height": True,
                                       "format": "png"}),
            ("int_format", lambda p: {"width": 1, "height": 2,
                                      "format": 7}),
        ]
        for name, bad in cases:
            bad.__name__ = name
            with pytest.raises(Exception, match="violated the contract"):
                decode_media(media, decoder=bad).collect()

    def test_image_header_decoder_real_formats(self):
        # REAL decoder: crafted container headers for every supported
        # format, dimensions chosen to catch endianness mistakes
        # (width != height, both > 255 where the format allows)
        from pg_ts_semantic_headline_spark.operators.multimodal import (
            image_header_decoder as dec)
        png = (b"\x89PNG\r\n\x1a\n\x00\x00\x00\x0dIHDR"
               + (800).to_bytes(4, "big") + (601).to_bytes(4, "big"))
        assert dec(png) == {"width": 800, "height": 601, "format": "png"}
        # JPEG with a COM segment before SOF0 (marker walk must skip it)
        jpg = (b"\xff\xd8"
               + b"\xff\xfe\x00\x04hi"                      # COM, len 4
               + b"\xff\xc0\x00\x11\x08"
               + (480).to_bytes(2, "big") + (640).to_bytes(2, "big"))
        assert dec(jpg) == {"width": 640, "height": 480, "format": "jpeg"}
        gif = b"GIF89a" + (320).to_bytes(2, "little") \
            + (200).to_bytes(2, "little")
        assert dec(gif) == {"width": 320, "height": 200, "format": "gif"}
        bmp = (b"BM" + b"\x00" * 16
               + (1024).to_bytes(4, "little", signed=True)
               + (-768).to_bytes(4, "little", signed=True))  # top-down
        assert dec(bmp) == {"width": 1024, "height": 768, "format": "bmp"}
        # WebP lossy (VP8): 14-bit LE dims after the 9D 01 2A start code
        vp8 = (b"RIFF" + b"\x00" * 4 + b"WEBP" + b"VP8 " + b"\x00" * 4
               + b"\x00\x00\x00" + b"\x9d\x01\x2a"
               + (550).to_bytes(2, "little") + (368).to_bytes(2, "little"))
        assert dec(vp8) == {"width": 550, "height": 368, "format": "webp"}
        # WebP lossless (VP8L): packed 14+14 bit dims minus one
        bits = (417 - 1) | ((302 - 1) << 14)
        vp8l = (b"RIFF" + b"\x00" * 4 + b"WEBP" + b"VP8L" + b"\x00" * 4
                + b"\x2f" + bits.to_bytes(4, "little") + b"\x00" * 4)
        assert dec(vp8l) == {"width": 417, "height": 302, "format": "webp"}
        # WebP extended (VP8X): 24-bit canvas minus one
        vp8x = (b"RIFF" + b"\x00" * 4 + b"WEBP" + b"VP8X" + b"\x00" * 8
                + (1920 - 1).to_bytes(3, "little")
                + (1080 - 1).to_bytes(3, "little"))
        assert dec(vp8x) == {"width": 1920, "height": 1080,
                             "format": "webp"}

    def test_image_header_decoder_rejects_garbage(self):
        # corrupt/truncated/unknown payloads are DATA, not bugs: all-None
        from pg_ts_semantic_headline_spark.operators.multimodal import (
            image_header_decoder as dec)
        none = {"width": None, "height": None, "format": None}
        assert dec(None) == none
        assert dec(b"") == none
        assert dec(b"not an image at all") == none
        assert dec(b"\x89PNG\r\n\x1a\n\x00\x00") == none      # truncated
        assert dec(b"\x89PNG\r\n\x1a\n\x00\x00\x00\x0dXXXX"
                   + b"\x00" * 8) == none                     # not IHDR
        assert dec(b"\xff\xd8\x00\x00") == none               # bad marker
        assert dec(b"\xff\xd8\xff\xd9") == none               # EOI, no SOF
        assert dec(b"RIFF\x00\x00\x00\x00WEBPXXXX"
                   + b"\x00" * 20) == none                    # odd chunk

    def test_image_header_decoder_through_decode_plan(self, spark):
        # the real decoder rides the same mapInPandas plan: synth a PNG
        # and a JPEG payload as DataFrame binary columns and decode
        rows = [(1, "image",
                 b"\x89PNG\r\n\x1a\n\x00\x00\x00\x0dIHDR"
                 + (33).to_bytes(4, "big") + (44).to_bytes(4, "big")),
                (2, "image",
                 b"\xff\xd8\xff\xc0\x00\x11\x08"
                 + (77).to_bytes(2, "big") + (66).to_bytes(2, "big"))]
        from pyspark.sql import functions as SF
        df = (spark.createDataFrame(
                  rows, "doc_id long, kind string, payload binary")
              .withColumn("n_bytes",
                          SF.length("payload").cast("long")))
        from pg_ts_semantic_headline_spark.operators.multimodal import (
            decode_media, image_header_decoder)
        got = {r["doc_id"]: r for r in
               decode_media(df, decoder=image_header_decoder).collect()}
        assert (got[1]["width"], got[1]["height"], got[1]["format"]) == \
               (33, 44, "png")
        assert (got[2]["width"], got[2]["height"], got[2]["format"]) == \
               (66, 77, "jpeg")

    def test_frame_sampling_offsets(self, text_df):
        frames = sample_frames(attach_binary(text_df), n_frames=4)
        rows = [r for r in frames.collect() if r["doc_id"] == 0]
        assert len(rows) == 4
        assert [r["frame_id"] for r in sorted(rows, key=lambda r: r["frame_id"])] == [0, 1, 2, 3]
        assert rows[0]["frame_bytes"] is not None


def test_lsh_params_s_curve():
    """Returned (bands, rows) must meet the recall target at the
    threshold, use the fewest hashes, and raise when impossible."""
    import pytest as _pytest
    from pg_ts_semantic_headline_spark.operators import lsh_params

    for t, rc in [(0.5, 0.95), (0.8, 0.99), (0.3, 0.9), (0.98, 0.95)]:
        bands, rows = lsh_params(t, rc)
        recall = 1.0 - (1.0 - t ** rows) ** bands
        assert recall >= rc, (t, rc, bands, rows)
        # minimality: no smaller hash budget reaches the target
        total = bands * rows
        for smaller in range(1, total):
            ok = any(1.0 - (1.0 - t ** r) ** (smaller // r) >= rc
                     for r in range(1, smaller + 1) if smaller % r == 0)
            assert not ok, (t, rc, smaller)
    with _pytest.raises(ValueError, match="max_hashes"):
        lsh_params(0.05, 0.999, max_hashes=8)


def test_redact_pii(spark):
    """Emails/IPs/phones are masked and counted; clean/null text is
    untouched; counts come from the pre-redaction text."""
    from pg_ts_semantic_headline_spark.operators.textstats import (
        redact_pii)
    df = spark.createDataFrame([
        (1, "write alice.smith+x@example.co.uk or call 555-123-4567"),
        (2, "hosts 192.168.0.1 and 10.0.0.255 only"),
        (3, "clean text entirely"),
        (4, None),
    ], "doc_id long, text string")
    rows = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert rows[1]["pii_email"] == 1 and rows[1]["pii_phone"] == 1
    assert "alice" not in rows[1]["text_redacted"]
    assert "[PII-email]" in rows[1]["text_redacted"]
    assert "4567" not in rows[1]["text_redacted"]
    assert rows[2]["pii_ipv4"] == 2
    assert "192.168" not in rows[2]["text_redacted"]
    assert rows[3]["text_redacted"] == "clean text entirely"
    assert rows[3]["pii_email"] == rows[3]["pii_ipv4"] == 0
    assert rows[4]["text_redacted"] == ""


def test_prepare_corpus_with_redaction(spark):
    """redact=True masks PII before stats and dedup: two docs differing
    only in their email dedup together; pii counts ride along."""
    from pg_ts_semantic_headline_spark.operators.pipeline import (
        prepare_corpus)
    df = spark.createDataFrame([
        (1, "the same body text mail alice@example.com thanks a lot"),
        (2, "the same body text mail bob@other.org thanks a lot"),
        (3, "a different document body with enough tokens here"),
    ], "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           prepare_corpus(df, redact=True, exact_dedup=True).collect()}
    assert out[1]["pii_email"] == 1 and out[1]["drop_reason"] is None
    assert "alice" not in out[1]["text"]
    # doc 2 differs ONLY in PII -> after redaction it is an exact dup
    assert out[2]["drop_reason"] == "exact_dup"
    assert out[3]["drop_reason"] is None and out[3]["pii_email"] == 0


def test_remove_boilerplate_lines(spark):
    from pg_ts_semantic_headline_spark.operators import (
        remove_boilerplate_lines)
    df = spark.createDataFrame([
        (1, "SITE HEADER\nunique body one\nSITE FOOTER"),
        (2, "SITE HEADER\nanother body here\nSITE FOOTER"),
        (3, "SITE HEADER\nthird unique content\nSITE FOOTER"),
        (4, "totally independent document"),
        (5, None),
        (6, "\n\nblank lines only\n\n"),
    ], "doc_id long, text string")
    rows = {r["doc_id"]: r for r in
            remove_boilerplate_lines(df, max_doc_ratio=0.5).collect()}
    assert rows[1]["text_clean"] == "unique body one"
    assert rows[1]["n_lines_removed"] == 2
    assert rows[4] ["text_clean"] == "totally independent document"
    assert rows[4]["n_lines_removed"] == 0
    assert rows[5]["text_clean"] == "" and rows[5]["n_lines_removed"] == 0
    # blank lines are never boilerplate (kept), content preserved
    assert "blank lines only" in rows[6]["text_clean"]
    assert rows[6]["n_lines_removed"] == 0


def test_repetition_stats(spark):
    from pg_ts_semantic_headline_spark.operators.textstats import (
        repetition_stats)
    df = spark.createDataFrame([
        (1, "spam spam spam spam spam spam"),
        (2, "a normal sentence with varied words throughout here"),
        (3, "dup line\ndup line\ndup line\nunique one"),
        (4, None),
        (5, "one"),
    ], "doc_id long, text string")
    rows = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert rows[1]["repetitive"] and rows[1]["top_bigram_frac"] == 1.0
    assert not rows[2]["repetitive"]
    assert rows[3]["repetitive"]
    assert abs(rows[3]["dup_line_frac"] - 0.5) < 1e-9
    assert not rows[4]["repetitive"] and rows[4]["n_bigrams"] == 0
    assert not rows[5]["repetitive"]


def test_prepare_corpus_repetition_gate(spark):
    from pg_ts_semantic_headline_spark.operators.pipeline import (
        prepare_corpus)
    df = spark.createDataFrame([
        (1, "spam spam spam spam spam spam spam spam"),
        (2, "a varied normal document with many different words inside"),
    ], "doc_id long, text string")
    out = {r["doc_id"]: r["drop_reason"] for r in
           prepare_corpus(df, max_top_bigram_frac=0.2,
                          exact_dedup=False).collect()}
    assert out[1] == "repetitive" and out[2] is None


class TestCollocations:
    CORPUS = [
        (1, "new york is a big city"),
        (2, "new york has a big port"),
        (3, "york new has nothing here"),
        (4, "a a a b"),
        (5, "solo"),
    ]

    def _df(self, spark):
        return spark.createDataFrame(self.CORPUS, "doc_id long, text string")

    def test_doc_keywords_matches_python(self, spark):
        from pg_ts_semantic_headline_spark.operators.collocations import (
            doc_keywords)
        toks = {i: t.split(" ") for i, t in self.CORPUS}
        tf = {(i, w): ts.count(w) for i, ts in toks.items() for w in set(ts)}
        df_ = {}
        for (i, w) in tf:
            df_[w] = df_.get(w, 0) + 1
        want = {}
        for i, ts in toks.items():
            ranked = sorted({(w, tf[(i, w)], df_[w]) for w in ts},
                            key=lambda x: (-x[1], x[2], x[0]))[:3]
            want[i] = [(w, t, d, r + 1)
                       for r, (w, t, d) in enumerate(ranked)]
        got = {}
        for r in doc_keywords(self._df(spark), top_n=3).collect():
            got.setdefault(r["doc_id"], []).append(
                (r["term"], r["tf"], r["df"], r["rank"]))
        for i in got:
            got[i].sort(key=lambda x: x[3])
        assert got == want

    def test_doc_keywords_single_token_doc(self, spark):
        from pg_ts_semantic_headline_spark.operators.collocations import (
            doc_keywords)
        rows = [r for r in doc_keywords(self._df(spark), top_n=3).collect()
                if r["doc_id"] == 5]
        assert [(r["term"], r["tf"], r["rank"]) for r in rows] == \
            [("solo", 1, 1)]

    def test_pmi_collocations_matches_python(self, spark):
        from pg_ts_semantic_headline_spark.operators.collocations import (
            pmi_collocations)
        toks = {i: t.split(" ") for i, t in self.CORPUS}
        uni, bi = {}, {}
        for ts in toks.values():
            for w in ts:
                uni[w] = uni.get(w, 0) + 1
            for a, b in zip(ts, ts[1:]):
                bi[(a, b)] = bi.get((a, b), 0) + 1
        nu = sum(uni.values())
        nb = sum(len(ts) - 1 for ts in toks.values() if len(ts) >= 2)
        want = {(a, b): (c, math.log((c / nb) /
                                     ((uni[a] / nu) * (uni[b] / nu))))
                for (a, b), c in bi.items() if c >= 2}
        got = {(r["w1"], r["w2"]): (r["pair_count"], r["pmi"]) for r in
               pmi_collocations(self._df(spark), min_count=2).collect()}
        assert set(got) == set(want)
        # "new york" appears twice (docs 1, 2); "york new" only once
        assert ("new", "york") in got and ("york", "new") not in got
        for k in want:
            assert got[k][0] == want[k][0]
            assert got[k][1] == pytest.approx(want[k][1], rel=1e-12)

    def test_pmi_min_count_and_short_docs(self, spark):
        from pg_ts_semantic_headline_spark.operators.collocations import (
            pmi_collocations)
        # min_count above every pair count -> empty; the 1-token doc
        # must not crash the slice-window bigram expression
        assert pmi_collocations(self._df(spark), min_count=99).count() == 0


class TestBigramLm:
    LM = [
        (101, "the cat sat on the mat"),
        (102, "the cat ate the fish"),
    ]
    SCORE = [
        (1, "the cat sat"),            # all bigrams seen
        (2, "fish ate cat"),           # w1s seen, bigrams unseen
        (3, "zz qq"),                  # fully OOV
        (4, "solo"),                   # no bigrams
    ]

    def _score_python(self):
        uni, bi = {}, {}
        for _, t in self.LM:
            ws = t.split(" ")
            for w in ws:
                uni[w] = uni.get(w, 0) + 1
            for a, b in zip(ws, ws[1:]):
                bi[(a, b)] = bi.get((a, b), 0) + 1
        v = len(uni)
        out = {}
        for d, t in self.SCORE:
            ws = t.split(" ")
            evs = list(zip(ws, ws[1:]))
            s = sum(round(math.log((bi.get(p, 0) + 1)
                                   / (uni.get(p[0], 0) + v)) * 10000)
                    for p in evs)
            oov = sum(1 for p in evs if p not in bi)
            out[d] = (len(evs), oov, s)
        return out

    def test_matches_python_oracle(self, spark):
        from pg_ts_semantic_headline_spark.operators.lm import (
            bigram_lm_score)
        lm = spark.createDataFrame(self.LM, "doc_id long, text string")
        sc = spark.createDataFrame(self.SCORE, "doc_id long, text string")
        got = {r["doc_id"]: (r["n_bigrams"], r["oov_bigrams"],
                             r["sum_logprob_q4"])
               for r in bigram_lm_score(sc, lm).collect()}
        assert got == self._score_python()
        # every input doc present, incl. the bigram-less one
        assert got[4] == (0, 0, 0)

    def test_reference_like_beats_gibberish(self, spark):
        from pg_ts_semantic_headline_spark.operators.lm import (
            bigram_lm_score)
        lm = spark.createDataFrame(self.LM, "doc_id long, text string")
        sc = spark.createDataFrame(
            [(1, "the cat sat on the mat"), (2, "qq zz xx yy ww vv")],
            "doc_id long, text string")
        r = {x["doc_id"]: x for x in bigram_lm_score(sc, lm).collect()}
        mean1 = r[1]["sum_logprob_q4"] / r[1]["n_bigrams"]
        mean2 = r[2]["sum_logprob_q4"] / r[2]["n_bigrams"]
        assert mean1 > mean2
        assert r[2]["oov_bigrams"] == r[2]["n_bigrams"]


def test_prepare_corpus_lm_gate(spark):
    from pg_ts_semantic_headline_spark.operators.pipeline import (
        corpus_report, prepare_corpus)
    lm = spark.createDataFrame(
        [(100 + i, "the cat sat on the mat and the dog ate the fish")
         for i in range(3)], "doc_id long, text string")
    df = spark.createDataFrame([
        (1, "the cat sat on the mat and the dog ate the fish today"),
        (2, "zz qq ww rr tt yy uu ii oo pp aa ss dd ff gg hh"),
    ], "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           prepare_corpus(df, min_tokens=2, exact_dedup=False,
                          lm_docs=lm, min_lm_mean_logprob=-2.0).collect()}
    assert out[1]["drop_reason"] is None
    assert out[2]["drop_reason"] == "lm_quality"
    assert out[1]["lm_mean_logprob"] > out[2]["lm_mean_logprob"]
    rep = corpus_report(
        prepare_corpus(df, min_tokens=2, exact_dedup=False, lm_docs=lm,
                       min_lm_mean_logprob=-2.0)).collect()[0]
    assert rep["n_lm_quality"] == 1 and rep["n_kept"] == 1


def test_corpus_profile(spark):
    from pg_ts_semantic_headline_spark.operators.textstats import (
        corpus_profile)
    rows = [
        (1, "en", "the quick brown fox and the dog"),
        (2, "en", "the quick brown fox and the dog"),     # exact dup of 1
        (3, "en", "a completely different document here"),
        (4, "de", "der schnelle braune fuchs"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {r["lang"]: r for r in corpus_profile(df, ["lang"]).collect()}
    assert got["en"]["n_docs"] == 3
    assert got["en"]["sum_tokens"] == 7 + 7 + 5
    assert got["en"]["n_unique_texts"] == 2      # dup collapses
    assert got["en"]["sum_chars"] == sum(len(t) for _, l, t in rows
                                         if l == "en")
    assert got["de"]["n_docs"] == 1 and got["de"]["n_unique_texts"] == 1
    # quality reconstructs: 0 <= mean <= 1
    mean_q = got["en"]["sum_quality_e6"] / (1e6 * got["en"]["n_docs"])
    assert 0.0 <= mean_q <= 1.0
    with pytest.raises(ValueError):
        corpus_profile(df, [])


def test_pmi_skipgram_window(spark):
    from pg_ts_semantic_headline_spark.operators.collocations import (
        pmi_collocations)
    rows = [(1, "a b c a b"), (2, "c a b"), (3, "x")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    uni, ev = {}, {}
    for _, t in rows:
        ws = t.split(" ")
        for w in ws:
            uni[w] = uni.get(w, 0) + 1
        for d in (1, 2):
            for a, b in zip(ws, ws[d:]):
                ev[(a, b)] = ev.get((a, b), 0) + 1
    nu = sum(uni.values())
    nb = sum(max(len(t.split(" ")) - d, 0) for _, t in rows for d in (1, 2))
    want = {p: (c, math.log((c / nb) / ((uni[p[0]] / nu)
                                        * (uni[p[1]] / nu))))
            for p, c in ev.items() if c >= 2}
    got = {(r["w1"], r["w2"]): (r["pair_count"], r["pmi"]) for r in
           pmi_collocations(df, min_count=2, window=2).collect()}
    assert set(got) == set(want) and want
    for k in want:
        assert got[k][0] == want[k][0]
        assert got[k][1] == pytest.approx(want[k][1], rel=1e-12)
    with pytest.raises(ValueError):
        pmi_collocations(df, window=0)


def test_dedup_paragraphs(spark):
    from pg_ts_semantic_headline_spark.operators import dedup_paragraphs
    df = spark.createDataFrame([
        (1, "alpha para\n\nshared passage\n\nbeta para"),
        (2, "shared passage\n\ngamma para"),          # later copy: removed
        (3, "delta\n\ndelta\n\nepsilon"),             # within-doc repeat
        (4, "\n\nzeta only\n\n"),                     # blank paras pass through
        (5, None),
    ], "doc_id long, text string")
    rows = {r["doc_id"]: r for r in dedup_paragraphs(df).collect()}
    # first occurrence (smallest doc_id) keeps the shared passage
    assert rows[1]["text_dedup"] == "alpha para\n\nshared passage\n\nbeta para"
    assert rows[1]["n_paras_removed"] == 0
    assert rows[2]["text_dedup"] == "gamma para"
    assert rows[2]["n_paras_removed"] == 1
    # within-doc duplicate keeps only the first copy
    assert rows[3]["text_dedup"] == "delta\n\nepsilon"
    assert rows[3]["n_paras_removed"] == 1
    # blank paragraphs are structure, not dedup keys
    assert rows[4]["text_dedup"] == "\n\nzeta only\n\n"
    assert rows[4]["n_paras_removed"] == 0
    assert rows[5]["text_dedup"] == "" and rows[5]["n_paras_removed"] == 0


def test_dedup_paragraphs_custom_sep_and_min_chars(spark):
    from pg_ts_semantic_headline_spark.operators import dedup_paragraphs
    df = spark.createDataFrame([
        (1, "aa|common chunk|bb"),
        (2, "common chunk|cc"),
    ], "doc_id long, text string")
    # '|' is a regex metachar — must be treated literally
    rows = {r["doc_id"]: r for r in
            dedup_paragraphs(df, sep="|").collect()}
    assert rows[1]["text_dedup"] == "aa|common chunk|bb"
    assert rows[2]["text_dedup"] == "cc"
    # min_chars: short paragraphs are never deduped
    rows = {r["doc_id"]: r for r in
            dedup_paragraphs(df, sep="|", min_chars=3).collect()}
    assert rows[1]["text_dedup"] == "aa|common chunk|bb"
    assert rows[2]["text_dedup"] == "cc"
    df2 = spark.createDataFrame([(1, "xy|ab"), (2, "ab|xy")],
                                "doc_id long, text string")
    rows = {r["doc_id"]: r for r in
            dedup_paragraphs(df2, sep="|", min_chars=3).collect()}
    assert rows[2]["text_dedup"] == "ab|xy"          # 2-char paras kept


class TestDedupSubstrings:
    def brute(self, docs, n):
        from collections import defaultdict
        occs = defaultdict(list)
        for d, t in docs:
            toks = t.split(" ")
            for s in range(len(toks) - n + 1):
                occs[" ".join(toks[s:s + n])].append((d, s))
        out = {}
        for d, t in docs:
            toks = t.split(" ")
            drop = [False] * len(toks)
            for s in range(len(toks) - n + 1):
                o = occs[" ".join(toks[s:s + n])]
                if len(o) > 1 and min(o) != (d, s):
                    for i in range(s, s + n):
                        drop[i] = True
            out[d] = (" ".join(tk for tk, dr in zip(toks, drop) if not dr),
                      sum(drop))
        return out

    def test_matches_bruteforce_random_corpus(self, spark):
        import random

        from pg_ts_semantic_headline_spark.operators.dedup import (
            dedup_substrings)

        rng = random.Random(99)
        vocab = [f"w{i}" for i in range(12)]
        shared = " ".join(rng.choice(vocab) for _ in range(9))
        docs = []
        for d in range(30):
            words = [rng.choice(vocab) for _ in range(rng.randint(3, 40))]
            if d % 4 == 0:   # inject the shared passage at a random spot
                at = rng.randint(0, len(words))
                words[at:at] = shared.split(" ")
            if d == 17:      # within-doc repeat
                words += shared.split(" ") + shared.split(" ")
            docs.append((d, " ".join(words)))
        for n in (4, 6):
            want = self.brute(docs, n)
            got = {r["doc_id"]: (r["text_dedup"], r["n_tokens_removed"])
                   for r in dedup_substrings(
                       spark.createDataFrame(docs, ["doc_id", "text"]),
                       n=n).collect()}
            assert got == want, n

    def test_keep_first_and_short_docs(self, spark):
        from pg_ts_semantic_headline_spark.operators.dedup import (
            dedup_substrings)

        docs = [(0, "a b c d e"), (1, "z a b c d e z"), (2, "tiny")]
        got = {r["doc_id"]: (r["text_dedup"], r["n_tokens_removed"])
               for r in dedup_substrings(
                   spark.createDataFrame(docs, ["doc_id", "text"]),
                   n=5).collect()}
        assert got[0] == ("a b c d e", 0)    # first occurrence intact
        assert got[1] == ("z z", 5)          # later copy cut, edges kept
        assert got[2] == ("tiny", 0)         # shorter than n: passthrough

    def test_n_validation(self, spark):
        import pytest as _pytest

        from pg_ts_semantic_headline_spark.operators.dedup import (
            dedup_substrings)

        with _pytest.raises(ValueError):
            dedup_substrings(spark.range(1).selectExpr(
                "id as doc_id", "'x' as text"), n=1)


def test_prepare_corpus_substring_dedup_stage(spark):
    from pg_ts_semantic_headline_spark.operators.pipeline import (
        prepare_corpus)

    shared = "one two three four five six seven eight"
    docs = [(0, f"start {shared} end of first document body"),
            (1, f"totally other {shared} trailing words here"),
            (2, "independent tiny text")]
    out = {r["doc_id"]: r for r in prepare_corpus(
        spark.createDataFrame(docs, ["doc_id", "text"]),
        min_tokens=2, substring_dedup_n=8).collect()}
    # doc 0 is the corpus-first occurrence: untouched
    assert out[0]["n_substr_tokens_removed"] == 0
    assert shared in out[0]["text"]
    # doc 1's copy is cut BEFORE stats: n_tokens reflects the cut text
    assert out[1]["n_substr_tokens_removed"] == 8
    assert shared not in out[1]["text"]
    assert out[1]["text"] == "totally other trailing words here"
    assert out[1]["n_tokens"] == 5
    assert out[2]["n_substr_tokens_removed"] == 0


class TestPickCanonicals:
    """Quality-aware canonical election: best score wins, ties break to
    the smallest doc_id, scoreless members rank last."""

    def test_best_score_wins_and_ties_break_low(self, spark):
        from pg_ts_semantic_headline_spark.operators.dedup import (
            pick_canonicals)
        comp = spark.createDataFrame(
            [(1, 1), (2, 1), (3, 1),        # cluster 1: best is doc 3
             (4, 4), (5, 4),                # cluster 4: tie -> doc 4
             (9, 9)],                       # singleton
            "doc_id long, component_id long")
        scores = spark.createDataFrame(
            [(1, 10.0), (2, 30.0), (3, 99.0),
             (4, 5.0), (5, 5.0), (9, 1.0)],
            "doc_id long, score double")
        got = {r["doc_id"]: (r["canonical_id"], r["is_canonical"])
               for r in pick_canonicals(comp, scores).collect()}
        assert got == {1: (3, False), 2: (3, False), 3: (3, True),
                       4: (4, True), 5: (4, False), 9: (9, True)}

    def test_scoreless_member_ranks_last(self, spark):
        from pg_ts_semantic_headline_spark.operators.dedup import (
            pick_canonicals)
        comp = spark.createDataFrame(
            [(1, 1), (2, 1)], "doc_id long, component_id long")
        scores = spark.createDataFrame(
            [(2, 0.1)], "doc_id long, score double")
        got = {r["doc_id"]: r["canonical_id"]
               for r in pick_canonicals(comp, scores).collect()}
        assert got == {1: 2, 2: 2}

    def test_composes_with_duplicate_components(self, spark):
        from pg_ts_semantic_headline_spark.operators.dedup import (
            duplicate_components, minhash_lsh_dedup, pick_canonicals)
        import pyspark.sql.functions as F
        base = "alpha beta gamma delta epsilon zeta eta theta"
        docs = spark.createDataFrame(
            [(1, base), (2, base + " extra tail words here"),
             (3, base), (10, "totally different content entirely "
                             "unrelated words")],
            ["doc_id", "text"])
        pairs = minhash_lsh_dedup(docs, threshold=0.3, n=2)
        comp = duplicate_components(docs, pairs)
        scores = docs.select(
            "doc_id", F.size(F.split("text", " ")).alias("score"))
        got = {r["doc_id"]: (r["canonical_id"], r["is_canonical"])
               for r in pick_canonicals(comp, scores).collect()}
        # docs 1/2/3 cluster; the longest (doc 2) is canonical
        assert got[1] == (2, False)
        assert got[2] == (2, True)
        assert got[3] == (2, False)
        assert got[10] == (10, True)
