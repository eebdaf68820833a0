"""Trigram index: extraction parity, substring/LIKE/regex exactness vs
brute force, required-trigram soundness, similarity math, bucket pruning."""

import re
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from pg_ts_semantic_headline_spark.operators.trigram import (
    build_trigram_index,
    like_pattern_trigrams,
    like_search,
    load_trigram_index,
    pattern_trigrams,
    regex_required_trigrams,
    regex_search,
    similarity_col,
    similarity_topk,
    substring_search,
    text_trigrams,
    trigrams_col,
)

CORPUS = [
    (0, "merge join over the batch window"),
    (1, "Merge JOIN again: merge join!"),
    (2, "a b c short words only"),
    (3, ""),
    (4, None),
    (5, "batch batch window spark merge sort"),
    (6, "self-merge joints are not merge join s"),
    (7, "ünïcode merge join tëst 42x"),
    (8, "the quick brown fox jumps over the lazy dog"),
    (9, "sparkly remerge joinery"),
]


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


@pytest.fixture(scope="module")
def index(spark, corpus_df):
    d = tempfile.mkdtemp(prefix="tsp_trgm_test_")
    build_trigram_index(corpus_df, d, n_buckets=8)
    yield load_trigram_index(spark, d)
    shutil.rmtree(d, ignore_errors=True)


def brute_contains(pattern):
    return sorted(i for i, t in CORPUS
                  if t is not None and pattern.lower() in t.lower())


def ids(df):
    return sorted(r["doc_id"] for r in df.select("doc_id").collect())


# ------------------------------------------------------------- extraction

def test_trigrams_col_matches_python_mirror(spark, corpus_df):
    rows = corpus_df.select("doc_id",
                            trigrams_col("text").alias("tg")).collect()
    for r in rows:
        text = dict(CORPUS)[r["doc_id"]]
        assert sorted(r["tg"]) == sorted(text_trigrams(text or ""))


def test_word_padding_shape():
    assert text_trigrams("ab") == {"  a", " ab", "ab "}
    assert text_trigrams("a") == {"  a", " a "}
    assert text_trigrams("") == set()
    # dedup across repeated words
    assert text_trigrams("ab ab") == {"  a", " ab", "ab "}


def test_pattern_trigrams_edges_unpadded():
    # edge runs get no pad on the pattern boundary, inner boundaries do
    assert pattern_trigrams("merge join") == sorted(
        {"mer", "erg", "rge", "ge ", "  j", " jo", "joi", "oin"})
    # short edge runs yield nothing; internally-bounded short runs pad up
    assert pattern_trigrams("a b") == ["  b"]
    assert pattern_trigrams("xy") == []


def test_like_pattern_trigrams_union():
    got = like_pattern_trigrams("%merge%join%")
    assert set(got) == set(pattern_trigrams("merge")) | set(
        pattern_trigrams("join"))


# ------------------------------------------------- soundness (recall) law

def test_required_trigrams_always_present_in_matching_text():
    # For every corpus text containing the pattern, every required trigram
    # must be in the text's trigram set — the law candidate pruning rests on.
    for pattern in ["merge join", "batch window", "e jo", "a b c",
                    "self-merge", "42x", "ge joi"]:
        req = set(pattern_trigrams(pattern))
        for _i, text in CORPUS:
            if text and pattern.lower() in text.lower():
                assert req <= text_trigrams(text), (pattern, text)


def test_regex_required_trigrams_sound():
    cases = [
        (r"merge\s+join", ["merge join", "merge  join"]),
        (r"mer(ge)+ join", ["merge join"]),
        (r"batch.{1,3}window", ["batch window"]),
        (r"jo[a-z]n", ["joan", "john"]),
        (r"(optional)*merge", ["merge", "optionalmerge"]),
        (r"a|b", ["a", "b"]),
    ]
    for pattern, examples in cases:
        req = set(regex_required_trigrams(pattern))
        for ex in examples:
            assert re.search(pattern, ex)
            assert req <= text_trigrams(ex), (pattern, ex)
    # quantified group must NOT require its body (conservative total bail)
    assert regex_required_trigrams(r"(optional)*merge") == []
    assert regex_required_trigrams(r"a|b") == []
    # pieces keep their in-pattern boundaries: " join" is word-initial
    assert regex_required_trigrams(r"mer(ge)+ join") == sorted(
        set(pattern_trigrams("mer")) | set(pattern_trigrams(" join")))
    # (?...) intro chars are group syntax, not literals: "(?:abc)x" matches
    # "zabcx", which has NO word-initial-abc trigram, and a negative
    # lookahead's body must be ABSENT — both must bail to full-scan []
    for pattern, ex in [(r"(?:abc)x", "zabcx"), (r"(?=foo)foobar", "xfoobar"),
                        (r"(?!join )joinery", "sjoinery"),
                        (r"(?i)merge", "zMERGEz")]:
        assert re.search(pattern, ex), (pattern, ex)
        req = set(regex_required_trigrams(pattern))
        assert req <= text_trigrams(ex), (pattern, ex, req)
    assert regex_required_trigrams(r"(?:abc)x") == []


# ----------------------------------------------------------------- search

def test_substring_search_exact(spark, index, corpus_df):
    for pattern in ["merge join", "batch window", "zzz-nothing",
                    "MERGE JOIN", "a b c", "42x"]:
        got = ids(substring_search(index, corpus_df, pattern))
        assert got == brute_contains(pattern), pattern


def test_substring_case_sensitive(spark, index, corpus_df):
    got = ids(substring_search(index, corpus_df, "Merge JOIN",
                               case_sensitive=True))
    assert got == [1]


def test_substring_short_pattern_full_scan_warns(spark, index, corpus_df):
    with pytest.warns(UserWarning, match="full-scan"):
        got = ids(substring_search(index, corpus_df, "ox",
                                   allow_full_scan=True))
    assert got == [8]


def test_unprunable_pattern_refused_by_default(spark, index, corpus_df):
    # a pattern the index cannot prune must fail loudly, not silently scan
    # the corpus; allow_full_scan=True is the explicit opt-in (tested above)
    with pytest.raises(ValueError, match="allow_full_scan"):
        substring_search(index, corpus_df, "ox")
    with pytest.raises(ValueError, match="allow_full_scan"):
        like_search(index, corpus_df, "%a%")
    with pytest.raises(ValueError, match="allow_full_scan"):
        regex_search(index, corpus_df, r"(sort|spark)")


def test_like_search_exact(spark, index, corpus_df):
    for pattern in ["%merge join%", "%batch%spark%", "merge join%",
                    "%joinery", "%no_such_thing%"]:
        expect = sorted(
            r["doc_id"] for r in
            corpus_df.where(F.col("text").like(pattern)).collect())
        assert ids(like_search(index, corpus_df, pattern)) == expect, pattern


def test_regex_search_exact(spark, index, corpus_df):
    for pattern in [r"merge\s+join", r"batch.{0,2}window",
                    r"(sort|spark)", r"jo[a-z]+n"]:
        expect = sorted(
            i for i, t in CORPUS if t is not None and re.search(pattern, t))
        got = ids(regex_search(index, corpus_df, pattern,
                               allow_full_scan=True))
        assert got == expect, pattern


def test_candidates_actually_prune(spark, index, corpus_df):
    # the pruned candidate set must be a strict subset of the corpus for a
    # selective pattern (i.e. the index is consulted, not just the verify)
    cands = index.candidate_ids(pattern_trigrams("quick brown fox"))
    assert ids(cands) == [8]
    # and the postings scan carries partition filters on the bucket column
    plan = index._pruned(pattern_trigrams("quick brown fox")) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [bucket" in plan


# ------------------------------------------------------------- similarity

def py_similarity(a, b):
    ta, tb = text_trigrams(a or ""), text_trigrams(b or "")
    if not ta and not tb:
        return 0.0
    return len(ta & tb) / len(ta | tb)


def test_similarity_matches_brute_force(spark, index):
    q = "merge join batch"
    got = {r["doc_id"]: r["similarity"]
           for r in similarity_topk(index, q, k=20).collect()}
    for i, t in CORPUS:
        expect = py_similarity(t, q)
        if t:  # empty/null docs have no trigrams -> no docstats row
            assert got[i] == pytest.approx(expect, abs=1e-12), i


def test_similarity_threshold_and_order(spark, index):
    rows = similarity_topk(index, "merge join", k=3, threshold=0.1).collect()
    sims = [r["similarity"] for r in rows]
    assert sims == sorted(sims, reverse=True)
    assert all(s >= 0.1 for s in sims)


def test_similarity_col_adhoc_matches_indexed(spark, index, corpus_df):
    q = "batch window spark"
    adhoc = {r["doc_id"]: r["s"] for r in corpus_df.select(
        "doc_id", similarity_col("text", q).alias("s")).collect()}
    indexed = {r["doc_id"]: r["similarity"]
               for r in similarity_topk(index, q, k=20).collect()}
    for i in indexed:
        assert adhoc[i] == pytest.approx(indexed[i], abs=1e-12)


# ---------------------------------------------------------- suggest_terms

def test_suggest_terms_did_you_mean(spark):
    from pg_ts_semantic_headline_spark.operators.trigram import suggest_terms
    vocab = ["window", "widow", "meadow", "windows", "spark", "batch",
             "merge", "windowing"]
    terms = spark.createDataFrame([(t,) for t in vocab], "term string")
    got = suggest_terms(terms, "wnidow", k=3, threshold=0.1).collect()
    # brute-force the expected ranking with the python mirror
    def sim(a, b):
        ta, tb = text_trigrams(a), text_trigrams(b)
        return len(ta & tb) / len(ta | tb)
    want = sorted(((t, sim(t, "wnidow")) for t in vocab),
                  key=lambda x: (-x[1], x[0]))
    want = [(t, s) for t, s in want if s >= 0.1][:3]
    assert [(r["term"], round(r["similarity"], 9)) for r in got] == \
        [(t, round(s, 9)) for t, s in want]
    # the correctly-spelled word ranks itself first
    top = suggest_terms(terms, "window", k=1, threshold=0.1).first()
    assert top["term"] == "window" and top["similarity"] == 1.0


def test_add_documents_incremental(spark, corpus_df):
    from pg_ts_semantic_headline_spark.operators.trigram import (
        add_documents, build_trigram_index, load_trigram_index)
    d = tempfile.mkdtemp(prefix="tsp_trgm_incr_")
    try:
        build_trigram_index(corpus_df, d, n_buckets=8)
        idx = load_trigram_index(spark, d)
        new = spark.createDataFrame(
            [(100, "a freshly ingested merge join document"),
             (101, "nothing relevant here")],
            "doc_id long, text string")
        add_documents(idx, new)
        idx2 = load_trigram_index(spark, d)
        got = ids(substring_search(idx2, corpus_df.unionByName(new),
                                   "merge join"))
        assert got == brute_contains("merge join") + [100]
        # similarity sees the new docs' docstats too
        sims = {r["doc_id"] for r in
                similarity_topk(idx2, "merge join", k=50).collect()}
        assert 100 in sims and 101 in sims
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_delete_and_compact(spark, corpus_df):
    from pg_ts_semantic_headline_spark.operators.trigram import (
        build_trigram_index, compact_trigram_index, delete_documents,
        load_trigram_index)
    d = tempfile.mkdtemp(prefix="tsp_trgm_del_")
    try:
        build_trigram_index(corpus_df, d, n_buckets=8)
        idx = load_trigram_index(spark, d)
        before = ids(substring_search(idx, corpus_df, "merge join"))
        assert 0 in before and 1 in before
        delete_documents(idx, [0, 1])
        idx2 = load_trigram_index(spark, d)
        after = ids(substring_search(idx2, corpus_df, "merge join"))
        assert after == [i for i in before if i not in (0, 1)]
        # similarity excludes tombstoned docs too
        sims = {r["doc_id"] for r in
                similarity_topk(idx2, "merge join", k=50).collect()}
        assert 0 not in sims and 1 not in sims
        # the full-scan fallback path honors tombstones as well
        with pytest.warns(UserWarning, match="full-scan"):
            fb = ids(substring_search(idx2, corpus_df, "ox", allow_full_scan=True))
        assert fb == [8]
        with pytest.warns(UserWarning, match="full-scan"):
            fb2 = ids(substring_search(idx2, corpus_df, "me", allow_full_scan=True))
        assert 0 not in fb2 and 1 not in fb2
        # compaction folds tombstones in and clears them
        compact_trigram_index(spark, d)
        idx3 = load_trigram_index(spark, d)
        assert idx3.tombstones is None
        assert ids(substring_search(idx3, corpus_df, "merge join")) == after
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_verify_pushes_id_literals(spark, index, corpus_df, tmp_path,
                                   monkeypatch):
    # selective candidates must reach the docs scan as doc_id literals
    # (parquet row-group pruning) — a broadcast semi-join cannot prune,
    # so the verify would read the whole text column even for 1 candidate
    src = str(tmp_path / "docs_pq")
    corpus_df.write.parquet(src)
    docs_pq = spark.read.parquet(src)
    plan = substring_search(index, docs_pq, "quick brown fox") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "In(doc_id, [8])" in plan or "EqualTo(doc_id,8)" in plan, plan
    # and the semi-join path still works when the set exceeds the limit
    from pg_ts_semantic_headline_spark.operators import trigram as tmod
    monkeypatch.setattr(tmod, "VERIFY_INLIST_LIMIT", 0)
    got = ids(substring_search(index, docs_pq, "merge join"))
    assert got == brute_contains("merge join")


def test_regex_escape_sequences_sound():
    """Escape sequences must never demand trigrams a matching document
    lacks: \\n-style escapes mean the CONTROL character (a separator),
    operand-consuming escapes (\\x41, \\uFFFF, \\p{L}, \\Q..\\E,
    backrefs) bail to [] instead of reading their operand as literals."""
    # \n is a separator in matching text: requirement must hold for the
    # real-newline document
    req = set(regex_required_trigrams(r"foo\nbar"))
    assert req <= text_trigrams("foo\nbar"), req
    assert req, "separator escape should still require foo/bar trigrams"
    # \t \r \f behave the same
    assert set(regex_required_trigrams(r"alpha\tbeta")) <= \
        text_trigrams("alpha\tbeta")
    # class escapes are opaque gaps, not literals
    req_d = set(regex_required_trigrams(r"merge\d+join"))
    assert req_d <= text_trigrams("merge5join")
    # operand-consuming escapes: conservative total bail (sound)
    for pat in (r"a\x41bcdef", r"ab\uFF41cdef", r"ab\p{L}cdef",
                r"\Qmerge join\E", r"(abc)\1def", r"ab\cMcd"):
        assert regex_required_trigrams(pat) == [], pat
    # escaped punctuation stays a literal separator inside its piece
    req_p = set(regex_required_trigrams(r"foo\.bar"))
    assert req_p <= text_trigrams("foo.bar")
    assert "foo" in req_p and "bar" in req_p


def test_regex_search_with_escapes_end_to_end(spark):
    """r'foo\\nbar' must find the document containing a real newline —
    the pre-fix extraction demanded trigrams spanning 'fooNbar' and
    silently returned zero rows."""
    rows = [(0, "prefix foo\nbar suffix"),
            (1, "foonbar run together"),
            (2, "unrelated text entirely")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    d = tempfile.mkdtemp(prefix="tsp_trgm_esc_")
    try:
        build_trigram_index(df, d, n_buckets=8)
        idx = load_trigram_index(spark, d)
        assert ids(regex_search(idx, df, r"foo\nbar")) == [0]
        # operand escape degrades to full-scan verify, loudly but exactly
        with pytest.warns(UserWarning, match="full-scan"):
            got = ids(regex_search(idx, df, r"foo\x6ebar", allow_full_scan=True))
        assert got == [1]
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_replace_flow_delete_then_readd(spark, corpus_df):
    """delete_documents then add_documents of the SAME doc_id must show
    only the new content — generation-stamped tombstones kill the old
    rows, the re-added rows (higher gen) survive, and compaction
    physically keeps them."""
    from pg_ts_semantic_headline_spark.operators.trigram import (
        add_documents, compact_trigram_index, delete_documents)
    d = tempfile.mkdtemp(prefix="tsp_trgm_repl_")
    try:
        build_trigram_index(corpus_df, d, n_buckets=8)
        idx = load_trigram_index(spark, d)
        delete_documents(idx, [0])
        idx = load_trigram_index(spark, d)
        replacement = spark.createDataFrame(
            [(0, "entirely rewritten zebra document")],
            "doc_id long, text string")
        add_documents(idx, replacement)
        new_docs = (corpus_df.where(F.col("doc_id") != 0)
                    .unionByName(replacement))
        idx = load_trigram_index(spark, d)
        # old content invisible, new content found
        assert 0 not in ids(substring_search(idx, new_docs, "batch window"))
        assert ids(substring_search(idx, new_docs, "zebra")) == [0]
        # similarity sees exactly ONE live row for doc 0, scored on the
        # new trigram set only
        sims = [r for r in similarity_topk(idx, "zebra", k=5).collect()
                if r["doc_id"] == 0]
        assert len(sims) == 1
        expected = (replacement
                    .select(similarity_col("text", "zebra").alias("s"))
                    .first()["s"])
        assert abs(sims[0]["similarity"] - expected) < 1e-12
        # compaction folds the tombstone in WITHOUT destroying the
        # re-added rows
        compact_trigram_index(spark, d)
        idx2 = load_trigram_index(spark, d)
        assert idx2.tombstones is None
        assert ids(substring_search(idx2, new_docs, "zebra")) == [0]
        assert 0 not in ids(substring_search(idx2, new_docs,
                                             "batch window"))
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_similarity_long_query_join_path(spark, index, corpus_df):
    """A query past MAX_QUERY_TRIGRAMS must take the broadcast-semi-join
    postings path (no unbounded literal IN) and stay exact."""
    from pg_ts_semantic_headline_spark.operators.trigram import (
        MAX_QUERY_TRIGRAMS, similarity_scores)
    long_q = " ".join(f"wordnumber{i}ish" for i in range(30)) + \
        " merge join batch window"
    assert len(text_trigrams(long_q)) > MAX_QUERY_TRIGRAMS
    got = {r["doc_id"]: r["similarity"]
           for r in similarity_scores(index, long_q, threshold=0.0).collect()}
    want = {r["doc_id"]: r["s"] for r in corpus_df.select(
        "doc_id", similarity_col("text", long_q).alias("s")).collect()
        if r["doc_id"] in got}
    assert got.keys() >= {0, 1, 5}
    for did, s in want.items():
        assert abs(got[did] - s) < 1e-12, did


def test_zero_trigram_doc_delete_visible_in_fullscan(spark):
    """A deleted doc whose text yields NO trigrams (no docstats row) must
    still be excluded by the full-scan-fallback path — dead_doc_ids
    starts from the tombstone set, not from docstats."""
    from pg_ts_semantic_headline_spark.operators.trigram import (
        delete_documents)
    rows = [(1, "普通の 文章 です"),     # no [a-z0-9] runs -> no trigrams
            (2, "regular english text here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    d = tempfile.mkdtemp(prefix="tsp_trgm_zero_")
    try:
        build_trigram_index(df, d, n_buckets=4)
        idx = load_trigram_index(spark, d)
        with pytest.warns(UserWarning, match="full-scan"):
            assert ids(substring_search(idx, df, "普通", allow_full_scan=True)) == [1]
        delete_documents(idx, [1])
        idx = load_trigram_index(spark, d)
        with pytest.warns(UserWarning, match="full-scan"):
            assert ids(substring_search(idx, df, "普通", allow_full_scan=True)) == []
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_trigram_ingest(spark, corpus_df, tmp_path):
    """availableNow stream of docs appended per micro-batch: post-stream
    queries equal a one-shot build over the union."""
    from pg_ts_semantic_headline_spark.streaming import (
        attach_trigram_indexer)
    out = str(tmp_path / "s_trgm")
    base = corpus_df.where(F.col("doc_id") < 5)
    extra = corpus_df.where(F.col("doc_id") >= 5)
    build_trigram_index(base, out, n_buckets=8)
    src = str(tmp_path / "src")
    extra.write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = attach_trigram_indexer(stream, out, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    idx = load_trigram_index(spark, out)
    assert idx.max_gen >= 1
    assert ids(substring_search(idx, corpus_df, "merge join")) == \
        brute_contains("merge join")


class TestSimilarityJoin:
    NAMES = [
        "jonathan smith", "jonathon smith", "jon smith", "jane smyth",
        "alexander hamilton", "aleksander hamilton", "alex hamilton",
        "wolfgang amadeus mozart", "w a mozart", "ludwig van beethoven",
        "completely unrelated entry", "another different record",
        "spark structured streaming", "spark structured steaming",
    ]

    def _brute(self, rows, threshold, rows_b=None):
        from pg_ts_semantic_headline_spark.operators.trigram import (
            text_trigrams)
        tg = {i: text_trigrams(t) for i, t in rows}
        if rows_b is None:
            ids = sorted(tg)
            pairs = [(a, b) for i, a in enumerate(ids) for b in ids[i + 1:]]
            tg_b = tg
        else:
            tg_b = {i: text_trigrams(t) for i, t in rows_b}
            pairs = [(a, b) for a in tg for b in tg_b]
        out = {}
        for a, b in pairs:
            inter = len(tg[a] & tg_b[b])
            union = len(tg[a]) + len(tg_b[b]) - inter
            if union and inter / union >= threshold:
                out[(a, b)] = inter / union
        return out

    @pytest.mark.parametrize("threshold", [0.2, 0.4, 0.7])
    def test_self_join_complete_vs_bruteforce(self, spark, threshold):
        from pg_ts_semantic_headline_spark.operators.trigram import (
            similarity_join)
        rows = list(enumerate(self.NAMES))
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        got = {(r["a"], r["b"]): r["similarity"]
               for r in similarity_join(df, threshold=threshold).collect()}
        want = self._brute(rows, threshold)
        assert set(got) == set(want)
        for k in want:
            assert got[k] == pytest.approx(want[k], rel=1e-12)
        assert want, "vacuous: no qualifying pairs at this threshold"

    def test_two_table_join(self, spark):
        from pg_ts_semantic_headline_spark.operators.trigram import (
            similarity_join)
        rows_l = list(enumerate(self.NAMES[:7]))
        rows_r = [(100 + i, t) for i, t in enumerate(self.NAMES[5:])]
        dl = spark.createDataFrame(rows_l, ["doc_id", "text"])
        dr = spark.createDataFrame(rows_r, ["doc_id", "text"])
        got = {(r["a"], r["b"]): r["similarity"] for r in
               similarity_join(dl, dr, threshold=0.3).collect()}
        want = self._brute(rows_l, 0.3, rows_b=rows_r)
        assert set(got) == set(want)
        # left "alexander hamilton" must link to right "aleksander ..."
        assert any(a == 4 for a, _ in got)

    def test_threshold_validation(self, spark):
        from pg_ts_semantic_headline_spark.operators.trigram import (
            similarity_join)
        df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
        with pytest.raises(ValueError):
            similarity_join(df, threshold=0.0)
