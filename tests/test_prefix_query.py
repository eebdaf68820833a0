"""Inline tsquery prefix matching (`'spar':*`).

The reference lists wildcard support as its own TODO
(/root/reference/README.md:257, sql/tsp_query_matches.sql:35-36); PG
itself supports `:*` inside to_tsquery. The engine compiles the marker
into prefix slots on the phrase AST and expands them against the index
dictionary (plans/search.expand_query_prefixes) into a plain OR-query,
so matching, ranking and headlines run unchanged on the expansion.
Index-free plans refuse prefix queries loudly instead of silently
matching the bare lexeme (the pre-feature behavior).
"""

import pytest

from pg_ts_semantic_headline_spark.plans.query_compiler import (
    TSQueryParseError, render_tspquery, to_tspquery)


class TestCompile:
    def test_single_prefix(self):
        q = to_tspquery("english", "spar:* & window")
        assert q.has_prefixes
        ph = {p.items[0][0]: p for p in q.phrases}
        assert ph["spar"].prefix_slots == (1,)
        assert ph["window"].prefix_slots == ()
        assert "'spar':*" in render_tspquery(q.root)

    def test_prefix_is_stemmed_like_pg(self):
        # PG: to_tsquery('english','running:*') -> 'run':*
        q = to_tspquery("english", "running:*")
        assert q.phrases[0].items == (("run", 1),)
        assert q.phrases[0].prefix_slots == (1,)

    def test_quoted_prefix_form(self):
        q = to_tspquery("english", "'spar':* & window")
        assert q.has_prefixes

    def test_prefix_inside_phrase_and_negation(self):
        q = to_tspquery("english", "merge <-> sor:*")
        assert q.phrases[0].prefix_slots == (2,)
        qn = to_tspquery("english", "!spar:* & window")
        assert qn.has_prefixes          # negated branch still carries it
        assert len(qn.phrases) == 1     # querytree drops the negation

    def test_stopword_prefix_vanishes(self):
        q = to_tspquery("english", "the:* & window")
        assert not q.has_prefixes

    def test_weight_labels_raise_in_label_position(self):
        with pytest.raises(TSQueryParseError, match="weight labels"):
            to_tspquery("english", "'cat':A & dog")
        with pytest.raises(TSQueryParseError, match="weight labels"):
            to_tspquery("english", "'cat':*AB")

    def test_plain_queries_unchanged(self):
        q = to_tspquery("english", "child-bearing & !discarded")
        assert not q.has_prefixes
        assert q.phrases[0].prefix_slots == ()


@pytest.mark.usefixtures("spark")
class TestExpansionAndSearch:
    @pytest.fixture(scope="class")
    def index(self, spark, tmp_path_factory):
        from pg_ts_semantic_headline_spark.plans.index_build import (
            build_index, load_index)
        docs = spark.createDataFrame(
            [(1, "spark window merge sort"),
             (2, "sparse matrix window join"),
             (3, "spartan discipline row scan"),
             (4, "window filter hash join"),
             (5, "merge sorted spark stream")],
            ["doc_id", "content"])
        d = str(tmp_path_factory.mktemp("pfx") / "idx")
        build_index(spark, docs, d, config="simple")
        return load_index(spark, d)

    def test_expand_query_prefixes(self, index):
        from pg_ts_semantic_headline_spark.plans.search import (
            expand_query_prefixes)
        q = to_tspquery("simple", "spar:*")
        e = expand_query_prefixes(index, q)
        assert not e.has_prefixes
        lex = sorted(e.lexemes)
        assert lex == ["spark", "sparse", "spartan"]
        # no-op (same object) without prefixes
        q2 = to_tspquery("simple", "window")
        assert expand_query_prefixes(index, q2) is q2

    def test_boolean_matching_with_prefix(self, index):
        from pg_ts_semantic_headline_spark.plans.search import matching_docs
        q = to_tspquery("simple", "spar:* & window")
        ids = sorted(r["doc_id"] for r in matching_docs(index, q).collect())
        assert ids == [1, 2]   # spartan doc has no window
        qn = to_tspquery("simple", "window & !spar:*")
        ids = sorted(r["doc_id"] for r in matching_docs(index, qn).collect())
        assert ids == [4]

    def test_search_ranks_expansions(self, index):
        from pg_ts_semantic_headline_spark.plans.search import search
        q = to_tspquery("simple", "spar:*")
        ids = {r["doc_id"] for r in search(index, q, k=10).collect()}
        assert ids == {1, 2, 3, 5}

    def test_phrase_with_prefix_slot(self, index):
        from pg_ts_semantic_headline_spark.plans.search import matching_docs
        q = to_tspquery("simple", "merge <-> sort:*")
        ids = sorted(r["doc_id"] for r in matching_docs(index, q).collect())
        assert ids == [1, 5]   # 'merge sort' and 'merge sorted'

    def test_no_expansion_is_impossible_not_dropped(self, index):
        from pg_ts_semantic_headline_spark.plans.search import matching_docs
        # zzz:* expands to nothing: AND with it must match NOTHING
        # (dropping the phrase would wrongly return window docs)
        q = to_tspquery("simple", "window & zzz:*")
        assert matching_docs(index, q).count() == 0
        # but OR with it still returns the other branch
        qo = to_tspquery("simple", "window | zzz:*")
        assert matching_docs(index, qo).count() == 3

    def test_expansion_cap_raises(self, index):
        from pg_ts_semantic_headline_spark.plans.search import (
            expand_query_prefixes)
        q = to_tspquery("simple", "s:*")
        with pytest.raises(ValueError, match="alternatives"):
            expand_query_prefixes(index, q, max_expansions=8,
                                  max_phrase_alternatives=1)

    def test_headlines_highlight_expansions(self, index):
        from pg_ts_semantic_headline_spark.plans.search import (
            search_with_headlines)
        q = to_tspquery("simple", "spar:*")
        rows = search_with_headlines(index, q, k=10).collect()
        heads = {r["doc_id"]: r["headline"] for r in rows}
        assert "<b>spark</b>" in heads[1]
        assert "<b>sparse</b>" in heads[2]
        assert "<b>spartan</b>" in heads[3]

    def test_adhoc_plans_refuse_prefix_queries(self, spark, index):
        from pg_ts_semantic_headline_spark.plans.headline import (
            ts_semantic_headline)
        docs = spark.createDataFrame([(1, "spark window")],
                                     ["doc_id", "content"])
        q = to_tspquery("simple", "spar:*")
        with pytest.raises(ValueError, match="expand_query_prefixes"):
            ts_semantic_headline(docs, q)

    def test_percolator_refuses_prefix_queries(self, spark):
        from pg_ts_semantic_headline_spark.streaming.percolate import (
            percolate)
        docs = spark.createDataFrame([(1, "spark window")],
                                     ["doc_id", "content"])
        q = to_tspquery("simple", "spar:*")
        with pytest.raises(ValueError, match="standing query"):
            percolate(docs, {"q1": q}, config="simple")

    def test_search_batch_expands(self, index):
        from pg_ts_semantic_headline_spark.plans.search import (
            search, search_batch)
        qs = {"a": to_tspquery("simple", "spar:* & window"),
              "b": to_tspquery("simple", "merge <-> sort:*")}
        got = search_batch(index, qs, k=10).collect()
        by_q = {}
        for r in got:
            by_q.setdefault(r["query_id"], set()).add(r["doc_id"])
        assert by_q["a"] == {1, 2}
        assert by_q["b"] == {1, 5}
        # rank-identity with the single-query path
        solo = {r["doc_id"] for r in
                search(index, qs["a"], k=10).collect()}
        assert by_q["a"] == solo


@pytest.mark.usefixtures("spark")
class TestReviewFixes:
    """Fixes from the round-4 review of the prefix feature."""

    def test_negated_prefix_truncation_raises(self, spark, tmp_path):
        # truncating a NEGATED prefix would RETURN docs that contain the
        # prefix; the expansion must refuse instead of silently widening
        from pg_ts_semantic_headline_spark.plans.index_build import (
            build_index, load_index)
        from pg_ts_semantic_headline_spark.plans.search import (
            expand_query_prefixes)
        docs = spark.createDataFrame(
            [(i, f"pre{i} window") for i in range(6)],
            ["doc_id", "content"])
        d = str(tmp_path / "negidx")
        build_index(spark, docs, d, config="simple")
        index = load_index(spark, d)
        q = to_tspquery("simple", "window & !pre:*")
        with pytest.raises(ValueError, match="negated prefix"):
            expand_query_prefixes(index, q, max_expansions=3)
        # positive-slot truncation stays a warning, not an error
        qp = to_tspquery("simple", "pre:*")
        with pytest.warns(UserWarning, match="most frequent"):
            e = expand_query_prefixes(index, qp, max_expansions=3)
        assert len(e.lexemes) == 3

    def test_ranking_plans_expand_prefixes(self, spark, tmp_path):
        from pg_ts_semantic_headline_spark.plans.index_build import (
            build_index, load_index)
        from pg_ts_semantic_headline_spark.plans.ranking import (
            ltr_features, ts_rank, ts_rank_cd)
        from pg_ts_semantic_headline_spark.plans.search import (
            bm25_topk_paged, plan_search)
        docs = spark.createDataFrame(
            [(1, "spark window merge"), (2, "sparse matrix window"),
             (3, "row scan order")], ["doc_id", "content"])
        d = str(tmp_path / "rankidx")
        build_index(spark, docs, d, config="simple")
        index = load_index(spark, d)
        q = to_tspquery("simple", "spar:*")
        assert {r["doc_id"] for r in ts_rank(index, q).collect()} == {1, 2}
        # ts_rank_cd requires a cover holding EVERY term (its documented
        # all-terms semantics), so probe it with a single-expansion
        # prefix: 'wind:*' -> {'window'}
        q_cd = to_tspquery("simple", "wind:*")
        assert {r["doc_id"] for r in
                ts_rank_cd(index, q_cd).collect()} == {1, 2}
        assert {r["doc_id"] for r in
                bm25_topk_paged(index, q, k=10).collect()} == {1, 2}
        assert {r["doc_id"] for r in
                ltr_features(index, q).collect()} == {1, 2}
        terms = {r["term"] for r in plan_search(index, q).collect()}
        assert terms == {"spark", "sparse"}


class TestStopwordPGParity:
    def test_lists_match_pg_stop_files_when_available(self):
        # the module contract is VERBATIM parity with PG's shipped stop
        # files; verify against the real files on hosts that have them
        import glob
        import os
        from pg_ts_semantic_headline_spark.functions import stopwords as sw
        candidates = glob.glob(
            "/usr/share/postgresql/*/tsearch_data/english.stop")
        if not candidates:
            pytest.skip("no PostgreSQL tsearch_data on this host")
        base = os.path.dirname(candidates[0])
        for name, attr in [("english", "ENGLISH_STOPWORDS"),
                           ("german", "GERMAN_STOPWORDS"),
                           ("french", "FRENCH_STOPWORDS"),
                           ("spanish", "SPANISH_STOPWORDS"),
                           ("portuguese", "PORTUGUESE_STOPWORDS"),
                           ("italian", "ITALIAN_STOPWORDS"),
                           ("russian", "RUSSIAN_STOPWORDS"),
                           ("dutch", "DUTCH_STOPWORDS"),
                           ("swedish", "SWEDISH_STOPWORDS"),
                           ("norwegian", "NORWEGIAN_STOPWORDS"),
                           ("danish", "DANISH_STOPWORDS")]:
            pg = set(open(os.path.join(base, f"{name}.stop"),
                          encoding="utf-8").read().split())
            assert set(getattr(sw, attr)) == pg, name
