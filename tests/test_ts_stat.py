"""PG ts_stat parity: (word, ndoc, nentry) statistics — ad-hoc, indexed,
and the fielded (weights-argument analog) forms.

PG semantics pinned here (docs §12.4.4): ndoc = number of documents the
lexeme appears in, nentry = total occurrences; with a weights argument,
only entries carrying one of the named weights count, but a document still
counts once even when several selected weights hit.
"""

import pytest
from pyspark.sql import functions as F

from pg_ts_semantic_headline_spark.plans.analyze import with_analysis
from pg_ts_semantic_headline_spark.plans.matches import (
    ts_stat, ts_stat_fielded, ts_stat_indexed)

DOCS = [
    (1, "the cat sat on the mat"),
    (2, "the cat ran"),
    (3, "dogs ran and ran"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "content"])


def _as_map(df):
    return {r["word"]: (r["ndoc"], r["nentry"]) for r in df.collect()}


def test_ts_stat_simple_counts(spark, docs):
    stats = _as_map(ts_stat(docs, config="simple"))
    # "the": docs 1 (twice) and 2 (once) -> ndoc 2, nentry 3
    assert stats["the"] == (2, 3)
    assert stats["ran"] == (2, 3)  # doc 2 once, doc 3 twice
    assert stats["cat"] == (2, 2)
    assert stats["mat"] == (1, 1)
    assert "and" in stats  # simple config keeps stopwords


def test_ts_stat_english_excludes_stopword_holes(spark, docs):
    stats = _as_map(ts_stat(docs, config="english"))
    assert "the" not in stats  # stopword holes are not lexemes
    assert stats["cat"] == (2, 2)
    assert stats["dog"] == (1, 1)  # stemmed


def test_ts_stat_accepts_preanalyzed(spark, docs):
    pre = with_analysis(docs, content_col="content", config="simple")
    assert _as_map(ts_stat(pre)) == _as_map(ts_stat(docs, config="simple"))


def test_ts_stat_min_filters(spark, docs):
    out = _as_map(ts_stat(docs, config="simple", min_ndoc=2))
    assert set(out) == {"the", "cat", "ran"}
    out = _as_map(ts_stat(docs, config="simple", min_nentry=3))
    assert set(out) == {"the", "ran"}


def test_ts_stat_indexed_equals_adhoc_and_tracks_deletes(spark, docs,
                                                         tmp_path):
    from pg_ts_semantic_headline_spark.plans.index_build import (
        build_index, load_index)
    from pg_ts_semantic_headline_spark.streaming.incremental import (
        delete_docs)

    idx_dir = str(tmp_path / "idx")
    build_index(spark, docs, idx_dir, config="simple", n_buckets=4,
                resume=False)
    idx = load_index(spark, idx_dir)
    assert _as_map(ts_stat_indexed(idx)) == _as_map(
        ts_stat(docs, config="simple"))

    # live-rows contract: a tombstoned doc leaves the stats immediately
    delete_docs(spark, idx_dir, [3])
    after = _as_map(ts_stat_indexed(load_index(spark, idx_dir)))
    assert after == _as_map(
        ts_stat(docs.where(F.col("doc_id") != 3), config="simple"))
    assert "dogs" not in after and after["ran"] == (1, 1)


def test_ts_stat_fielded_field_filter(spark, tmp_path):
    from pg_ts_semantic_headline_spark.plans.fielded import (
        build_fielded_index, load_fielded_index)

    rows = spark.createDataFrame(
        [(1, "cat tales", "the cat sat on the cat mat"),
         (2, "dog days", "a dog ran")],
        ["doc_id", "title", "body"])
    out = str(tmp_path / "fidx")
    build_fielded_index(spark, rows, out, field_cols=["title", "body"],
                        config="simple", n_buckets=4)
    fidx = load_fielded_index(spark, out)

    both = _as_map(ts_stat_fielded(fidx))
    # "cat": title once (doc 1) + body twice (doc 1) -> ndoc 1, nentry 3
    assert both["cat"] == (1, 3)
    title_only = _as_map(ts_stat_fielded(fidx, fields=["title"]))
    assert title_only["cat"] == (1, 1)
    assert "sat" not in title_only
    body_only = _as_map(ts_stat_fielded(fidx, fields=["body"]))
    assert body_only["cat"] == (1, 2)

    with pytest.raises(ValueError, match="unknown field"):
        ts_stat_fielded(fidx, fields=["abstract"])


class TestTsDebug:
    """PG §12.8.1 ts_debug-shaped analyzer introspection (driver-side)."""

    def test_english_stopword_stem_numword(self):
        from pg_ts_semantic_headline_spark.functions.lexize import ts_debug
        rows = ts_debug("english", "The Fat Cats 4ever")
        by_tok = {r["token"]: r for r in rows}
        assert by_tok["The"]["dictionary"] == "english_stem"
        assert by_tok["The"]["lexemes"] == []          # stopword consumed
        assert by_tok["Cats"]["lexemes"] == ["cat"]
        assert by_tok["4ever"] == {"token": "4ever", "alias": "numword",
                                   "dictionary": "simple",
                                   "lexemes": ["4ever"]}
        assert all(r["alias"] == "asciiword" for t, r in by_tok.items()
                   if t != "4ever")

    def test_simple_config_never_stems(self):
        from pg_ts_semantic_headline_spark.functions.lexize import ts_debug
        rows = ts_debug("simple", "The Cats")
        assert [r["lexemes"] for r in rows] == [["the"], ["cats"]]
        assert {r["dictionary"] for r in rows} == {"simple"}

    def test_non_ascii_word_alias_and_unaccent(self):
        from pg_ts_semantic_headline_spark.functions.lexize import ts_debug
        rows = ts_debug("german", "Bücher")
        assert rows[0]["alias"] == "word"
        assert rows[0]["token"] == "Bücher"            # display keeps accents
        assert rows[0]["lexemes"] == ["buch"]          # lexize unaccents

    def test_synonym_hit_and_custom_stopword(self, tmp_path):
        from pg_ts_semantic_headline_spark.functions.lexize import (
            make_synonym_config, ts_debug)
        cfg = make_synonym_config(
            "english", {"pgsql": "postgres", "noise": None},
            str(tmp_path / "syn.txt"))
        rows = ts_debug(cfg, "pgsql noise cats")
        assert rows[0] == {"token": "pgsql", "alias": "asciiword",
                           "dictionary": "synonym", "lexemes": ["postgres"]}
        assert rows[1]["dictionary"] == "synonym" and rows[1]["lexemes"] == []
        assert rows[2]["dictionary"] == "english_stem"

    def test_thesaurus_head_and_swallowed_tail(self, tmp_path):
        from pg_ts_semantic_headline_spark.functions.lexize import (
            make_thesaurus_config, ts_debug)
        cfg = make_thesaurus_config(
            "english", {"supernovae stars": "sn"},
            str(tmp_path / "thes.txt"))
        rows = ts_debug(cfg, "supernovae stars shine")
        assert rows[0]["dictionary"] == "thesaurus"
        assert rows[0]["lexemes"] == ["sn"]
        assert rows[1]["dictionary"] == "thesaurus"
        assert rows[1]["lexemes"] == []                # position hole kept
        assert rows[2]["dictionary"] == "english_stem"

    def test_thesaurus_attribution_when_substitute_equals_base(self, tmp_path):
        # the substitute can stem-collide with the head's own base lexeme
        # (supernovae -> supernova) and a phrase tail can be a stopword
        # matched by the '?' slot (None before AND after): both rows must
        # still attribute to the thesaurus, which a pre/post value diff
        # cannot see — attribution keys off the recorded match span
        from pg_ts_semantic_headline_spark.functions.lexize import (
            lexize_chunk, make_thesaurus_config, ts_debug)
        assert lexize_chunk("supernovae", "english") == "supernova"
        cfg = make_thesaurus_config(
            "english", {"supernovae the stars": "supernova"},
            str(tmp_path / "thes2.txt"))
        rows = ts_debug(cfg, "supernovae the stars shine")
        assert [r["dictionary"] for r in rows] == [
            "thesaurus", "thesaurus", "thesaurus", "english_stem"]
        assert rows[0]["lexemes"] == ["supernova"]     # head, value unchanged
        assert rows[1]["lexemes"] == []                # '?'-matched stopword
        assert rows[2]["lexemes"] == []                # swallowed tail

    def test_arity_one_default_config(self):
        from pg_ts_semantic_headline_spark.functions.lexize import ts_debug
        from pg_ts_semantic_headline_spark.plans.query_compiler import (
            get_default_text_search_config, set_default_text_search_config)
        prev = get_default_text_search_config()
        try:
            set_default_text_search_config("simple")
            assert ts_debug("Cats")[0]["lexemes"] == ["cats"]
        finally:
            set_default_text_search_config(prev)


class TestTsLexize:
    """PG ts_lexize(dict, token): one dictionary, one token — [] for a
    stopword hit, None for a miss (synonym/thesaurus templates), no
    numword routing (ts_lexize bypasses the parser)."""

    def test_stem_dictionaries(self):
        from pg_ts_semantic_headline_spark.functions.lexize import ts_lexize
        assert ts_lexize("english_stem", "supernovae") == ["supernova"]
        assert ts_lexize("english_stem", "the") == []
        assert ts_lexize("french_stem", "chevaux") == ["cheval"]
        # bare config name resolves to its stem dictionary
        assert ts_lexize("german", "bleibenden") == \
            ts_lexize("german_stem", "bleibenden")

    def test_simple_dictionary(self):
        from pg_ts_semantic_headline_spark.functions.lexize import ts_lexize
        assert ts_lexize("simple", "Spark!") == ["spark"]
        assert ts_lexize("simple", "...") is None  # strips to nothing

    def test_no_numword_routing(self):
        # PG: ts_lexize('english_stem','ties123') stems — the numword
        # rerouting happens in the parser, which ts_lexize bypasses
        from pg_ts_semantic_headline_spark.functions.lexize import ts_lexize
        assert ts_lexize("english_stem", "123abc") == \
            [__import__("pg_ts_semantic_headline_spark.functions.stemmer_en",
                        fromlist=["stem_english"]).stem_english("123abc")]

    def test_synonym_hit_miss_and_stopword(self, tmp_path):
        from pg_ts_semantic_headline_spark.functions.lexize import (
            make_synonym_config, ts_lexize)
        cfg = make_synonym_config(
            "english", {"colour": "color", "noise": None},
            str(tmp_path / "syn.json"))
        assert ts_lexize(cfg, "colour") == ["color"]
        assert ts_lexize(cfg, "noise") == []       # custom stopword
        assert ts_lexize(cfg, "anything") is None  # miss -> next dict

    def test_thesaurus_single_word_entry(self, tmp_path):
        from pg_ts_semantic_headline_spark.functions.lexize import (
            make_thesaurus_config, ts_lexize)
        cfg = make_thesaurus_config(
            "english", {"supernovae": "sn", "supernovae stars": "sn"},
            str(tmp_path / "th.json"))
        # single-token lookup can only match single-word entries
        assert ts_lexize(cfg, "supernovae") == ["sn"]
        assert ts_lexize(cfg, "star") is None

    def test_unknown_dictionary_raises(self):
        import pytest
        from pg_ts_semantic_headline_spark.functions.lexize import ts_lexize
        with pytest.raises(ValueError, match="unknown dictionary"):
            ts_lexize("klingon_stem", "word")
