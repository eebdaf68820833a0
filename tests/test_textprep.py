"""Unit tests for the pure text kernels (no Spark needed)."""


def test_series_kernels_match_scalar():
    """The vectorized pandas kernels must be byte-identical to the scalar
    reference implementations on adversarial inputs."""
    import pandas as pd

    from pg_ts_semantic_headline_spark.functions.textprep import (
        tsp_indexable_series, tsp_present_series)

    samples = [
        "Wo-ho! so-then -- stop, now: the end.",
        "  leading spaces and\nnewlines\r\nhere ",
        "don't re-enter; (parens) [brackets] {braces}!",
        "Straße über — naïve café, résumé's test…",
        "a-b-c-d e--f g'h'i",
        "", "plain words only", "!!!", "a",
        "hyphen-ated word<b>tag</b> mix",
    ]
    s = pd.Series(samples + [None])
    ind_vec = tsp_indexable_series(s)
    for raw, got in zip(samples, ind_vec):
        assert got == tsp_indexable_text(raw), raw
    assert pd.isna(ind_vec.iloc[-1])

    prepared = pd.Series([tsp_indexable_text(x) for x in samples])
    highlighted = prepared.str.replace("stop", "<b>stop</b>", regex=False)
    for series_in in (prepared, highlighted):
        pres_vec = tsp_present_series(series_in)
        for raw, got in zip(series_in, pres_vec):
            assert got == tsp_present_text(raw), raw


from pg_ts_semantic_headline_spark.functions import (
    BELL,
    analyze_document,
    lexize_chunk,
    stem_english,
    stem_german,
    to_tsp_text_array,
    tsp_indexable_text,
    tsp_present_text,
    unaccent,
)


class TestIndexableText:
    def test_end_of_word_punctuation_gets_double_bell(self):
        out = tsp_indexable_text("best of times, it was")
        assert out == f"best of times,{BELL}{BELL} it was"

    def test_intra_word_split_single_bell(self):
        out = tsp_indexable_text("Wo-ho! yes")
        assert out == f"Wo-{BELL} ho!{BELL}{BELL} yes"

    def test_pure_symbol_tokens_dropped(self):
        out = tsp_indexable_text("left --- right")
        assert out == "left right"

    def test_leading_nonword_stripped(self):
        assert tsp_indexable_text('"Quoted start') == "Quoted start"
        # leading punctuation + space at string start is removed
        assert tsp_indexable_text("-- hello").startswith("hello")

    def test_newlines_become_spaces(self):
        assert tsp_indexable_text("a\nb\rc") == "a b c"

    def test_whitespace_collapsed_and_trimmed(self):
        assert tsp_indexable_text("  a   b  ") == "a b"

    def test_position_alignment_invariant(self):
        text = "The quick-thinking fox (yes, really!) jumped; then slept."
        arr = to_tsp_text_array(text)
        # every element carries exactly one word core
        for tok in arr:
            core = lexize_chunk(tok, "simple")
            assert core, tok

    def test_idempotent_on_plain_words(self):
        assert tsp_indexable_text("plain words only") == "plain words only"


class TestPresentText:
    def test_roundtrip_plain(self):
        src = "Wo-ho! It was the best of times, it was the worst."
        assert tsp_present_text(tsp_indexable_text(src)) == src

    def test_close_tag_reseated_after_double_bell(self):
        # "child-bearing." highlighted: close tag hugs the word
        frag = f"past <b>child-{BELL} bearing.{BELL}{BELL}</b> "
        assert tsp_present_text(frag) == "past <b>child-bearing.</b>"

    def test_single_bell_tag(self):
        frag = f"<b>child-{BELL}</b> rest"
        assert tsp_present_text(frag) == "<b>child-</b>rest"


class TestUnaccent:
    def test_german_umlauts(self):
        assert unaccent("Gäste zünschten Üble ördentlich") == (
            "Gaste zunschten Uble ordentlich"
        )

    def test_eszett(self):
        assert unaccent("Straße") == "Strasse"

    def test_ascii_unchanged(self):
        s = "plain ASCII 123 ,.!"
        assert unaccent(s) == s


class TestStemmers:
    def test_porter2_vectors(self):
        vectors = {
            "decided": "decid", "decide": "decid", "negatively": "negat",
            "negative": "negat", "furiously": "furious", "times": "time",
            "running": "run", "hopping": "hop", "hoping": "hope",
            "cries": "cri", "ties": "tie", "caresses": "caress",
            "ponies": "poni", "cats": "cat", "agreed": "agre",
            "disabled": "disabl", "electricity": "electr",
            "electrical": "electr", "hopeful": "hope", "goodness": "good",
            "sky": "sky", "dying": "die", "news": "news",
            "adjustment": "adjust", "adoption": "adopt", "rate": "rate",
            "stillness": "still", "hurried": "hurri",
        }
        for w, e in vectors.items():
            assert stem_english(w) == e, (w, stem_english(w), e)

    def test_german_vectors(self):
        vectors = {
            "zechten": "zecht", "zecht": "zecht",
            "bleibenden": "bleibend", "gaste": "gast",
            "kinder": "kind", "aufgestellt": "aufgestellt",
        }
        for w, e in vectors.items():
            assert stem_german(w) == e, (w, stem_german(w), e)


class TestAnalyze:
    def test_positions_align_and_stopwords_hold_positions(self):
        toks, lex = analyze_document(
            "It was the best of times, it was the worst of times", "english")
        assert len(toks) == len(lex) == 12
        assert lex[3] == "best" and lex[5] == "time" and lex[11] == "time"
        assert lex[0] is None and lex[2] is None  # it, the

    def test_accent_insensitive_match_accent_preserving_output(self):
        toks, lex = analyze_document("die Gäste zechten", "german")
        assert toks[1] == "Gäste"       # output keeps accents
        assert lex[1] == "gast"          # index side unaccented + stemmed
        assert lex[0] is None            # 'die' German stopword

    def test_simple_config_no_stemming(self):
        _, lex = analyze_document("the running times", "simple")
        assert lex == ["the", "running", "times"]

    def test_numeric_tokens_not_stemmed(self):
        _, lex = analyze_document("chapter 16383 ends", "english")
        assert lex == ["chapter", "16383", "end"]


class TestTspvectorOps:
    """PG §9.13 tsvector utilities over the dense (tokens, lexemes)
    tspvector form — strip/length/ts_delete/concat parity plus the
    alignment invariant ts_delete must preserve."""

    def _analyzed(self, spark, rows, config="simple"):
        from pg_ts_semantic_headline_spark.plans.analyze import with_analysis
        return with_analysis(
            spark.createDataFrame(rows, ["doc_id", "content"]),
            "content", config)

    def test_strip_length_delete(self, spark):
        import pyspark.sql.functions as F
        from pg_ts_semantic_headline_spark.functions.tspvector_ops import (
            tsp_delete, tsp_length, tsp_strip)
        df = self._analyzed(spark, [(1, "fat cat sat fat"), (2, "dog")])
        got = {r["doc_id"]: r for r in df.select(
            "doc_id",
            tsp_strip("lexemes").alias("strip"),
            tsp_length("lexemes").alias("n"),
            tsp_delete("lexemes", "fat").alias("del1"),
            tsp_delete("lexemes", ["fat", "cat"]).alias("del2"),
        ).collect()}
        assert got[1]["strip"] == ["cat", "fat", "sat"]   # sorted distinct
        assert got[1]["n"] == 3 and got[2]["n"] == 1
        # hole-preserving delete: positions of survivors unchanged
        assert got[1]["del1"] == [None, "cat", "sat", None]
        assert got[1]["del2"] == [None, None, "sat", None]
        assert got[2]["del1"] == ["dog"]

    def test_delete_empty_targets_is_identity(self, spark):
        # a computed-empty target list (PG: ts_delete(tsv, '{}')) must be
        # the identity, not an array<null> typing accident
        from pg_ts_semantic_headline_spark.functions.tspvector_ops import (
            tsp_delete)
        df = self._analyzed(spark, [(1, "fat cat sat fat")])
        rows = df.select(
            "lexemes", tsp_delete("lexemes", []).alias("kept")).collect()
        assert rows[0]["kept"] == rows[0]["lexemes"]

    def test_delete_keeps_phrase_alignment(self, spark):
        # deleting an unrelated lexeme must not move a phrase match
        from pg_ts_semantic_headline_spark.functions.tspvector_ops import (
            tsp_delete)
        from pg_ts_semantic_headline_spark.plans.matches import (
            tsp_query_matches)
        from pg_ts_semantic_headline_spark.plans.query_compiler import (
            phraseto_tspquery)
        df = self._analyzed(spark, [(1, "noise fat cat tail")])
        q = phraseto_tspquery("simple", "fat cat")
        before = tsp_query_matches(df, q, match_limit=10).collect()
        after = tsp_query_matches(
            df.withColumn("lexemes", tsp_delete("lexemes", "noise")),
            q, match_limit=10).collect()
        assert [(r["start_pos"], r["end_pos"]) for r in before] == \
               [(r["start_pos"], r["end_pos"]) for r in after] == [(2, 3)]

    def test_setweight_and_filter(self, spark):
        # PG: ts_filter(setweight(tsv,'A','{cat}'), '{a}') keeps only the
        # A-labeled positions; holes and survivor positions unchanged
        from pg_ts_semantic_headline_spark.functions.tspvector_ops import (
            tsp_filter, tsp_setweight)
        df = self._analyzed(spark, [(1, "fat cat sat fat")])
        r = df.select(
            tsp_setweight("lexemes", "b").alias("w_all"),
            tsp_setweight("lexemes", "A", targets=["cat"]).alias("w_cat"),
        ).collect()[0]
        assert r["w_all"] == ["B", "B", "B", "B"]
        # 3-arg form: untargeted slots default to PG's implicit 'D'
        assert r["w_cat"] == ["D", "A", "D", "D"]
        kept = df.select(tsp_filter(
            "lexemes", tsp_setweight("lexemes", "A", targets=["cat"]),
            ["a"]).alias("kept")).collect()[0]["kept"]
        assert kept == [None, "cat", None, None]

    def test_setweight_relabel_and_holes(self, spark):
        # relabeling composes: existing weights pass through for
        # untargeted slots; stopword holes stay NULL in the weights array
        from pg_ts_semantic_headline_spark.functions.tspvector_ops import (
            tsp_filter, tsp_setweight)
        df = self._analyzed(spark, [(1, "the fat cat")], config="english")
        lex = df.select("lexemes").collect()[0]["lexemes"]
        assert lex[0] is None   # 'the' is an english stopword hole
        out = df.select(
            tsp_setweight(
                "lexemes", "A", targets=["cat"],
                weights=tsp_setweight("lexemes", "B")).alias("w"),
        ).collect()[0]["w"]
        assert out == [None, "B", "A"]
        # filtering on a label nothing carries empties the vector
        none_kept = df.select(tsp_filter(
            "lexemes", tsp_setweight("lexemes", "B"), ["c"])
            .alias("k")).collect()[0]["k"]
        assert none_kept == [None, None, None]

    def test_setweight_filter_validation(self, spark):
        import pytest
        from pg_ts_semantic_headline_spark.functions.tspvector_ops import (
            tsp_filter, tsp_setweight)
        with pytest.raises(ValueError, match="label"):
            tsp_setweight("lexemes", "E")
        with pytest.raises(ValueError, match="weight"):
            tsp_filter("lexemes", "weights", [])
        with pytest.raises(ValueError, match="unrecognized"):
            tsp_filter("lexemes", "weights", ["A", "x", "E"])

    def test_setweight_empty_targets_is_identity(self, spark):
        # PG: setweight(tsv, 'A', '{}') labels nothing — a computed-empty
        # target list keeps existing weights (unset slots normalize to
        # PG's implicit 'D'), same contract as tsp_delete([])
        from pg_ts_semantic_headline_spark.functions.tspvector_ops import (
            tsp_setweight)
        df = self._analyzed(spark, [(1, "the fat cat")], config="english")
        r = df.select(
            tsp_setweight("lexemes", "A", targets=[]).alias("bare"),
            tsp_setweight("lexemes", "A", targets=[],
                          weights=tsp_setweight("lexemes", "B"))
            .alias("kept"),
        ).collect()[0]
        assert r["bare"] == [None, "D", "D"]   # holes stay NULL
        assert r["kept"] == [None, "B", "B"]   # existing labels survive

    def test_concat_shifts_right_positions(self, spark):
        import pyspark.sql.functions as F
        from pg_ts_semantic_headline_spark.functions.tspvector_ops import (
            tsp_concat)
        from pg_ts_semantic_headline_spark.plans.matches import (
            explode_lexemes)
        left = self._analyzed(spark, [(1, "alpha beta")])
        right = self._analyzed(spark, [(1, "gamma")]) \
            .withColumnRenamed("lexemes", "lex_r") \
            .withColumnRenamed("tokens", "tok_r")
        both = (left.join(right.select("doc_id", "lex_r", "tok_r"),
                          on="doc_id")
                .select("doc_id",
                        tsp_concat("lexemes", "lex_r").alias("lexemes"),
                        tsp_concat("tokens", "tok_r").alias("tokens")))
        rows = {(r["pos"], r["lex"])
                for r in explode_lexemes(both).collect()}
        # PG: right positions shift by the left's max position (2)
        assert rows == {(1, "alpha"), (2, "beta"), (3, "gamma")}
