"""Golden parity with the reference's pgTAP assertions.

Fast-path assertions (TS_FAST_HEADLINE over precomputed arr+tsv) are checked
STRING-EXACT — the reference documents every step of that arithmetic, so our
output must be identical (english_lang_test.sql:56-58,
jswift_modest_proposal_test.sql:370-401).

Ad-hoc ts_semantic_headline assertions embed PostgreSQL's built-in
C ts_headline fragment-selection, which we deliberately do not port; for
those we assert the *highlighted span* is identical (the semantically hard
part: exact source recall, whole-phrase wrap, accent preservation) plus the
no-match fallback behavior (german_lang_test.sql:139-141).
"""

import pytest

from pg_ts_semantic_headline_spark.plans import phraseto_tspquery, to_tspquery
from pg_ts_semantic_headline_spark.plans.analyze import with_analysis
from pg_ts_semantic_headline_spark.plans.headline import (
    ts_fast_headline,
    ts_semantic_headline,
)

from conftest import load_reference_corpus, requires_reference

pytestmark = requires_reference


@pytest.fixture(scope="module")
def corpora():
    return {
        "english": load_reference_corpus("english_lang_test.sql"),
        "german": load_reference_corpus("german_lang_test.sql"),
        "swift": load_reference_corpus("jswift_modest_proposal_test.sql"),
    }


def _one_doc(spark, content, config):
    df = spark.createDataFrame([(1, content)], ["doc_id", "content"])
    return with_analysis(df, content_col="content", config=config)


def _fast_headline(spark, content, config, query, options=""):
    docs = _one_doc(spark, content, config)
    rows = ts_fast_headline(docs, query, options).collect()
    return rows[0]["headline"] if rows else None


def _semantic_headline(spark, content, config, query, options=""):
    df = spark.createDataFrame([(1, content)], ["doc_id", "content"])
    rows = ts_semantic_headline(df, query, options, content_col="content",
                                config=config).collect()
    return rows[0]["headline"] if rows else None


class TestFastHeadlineGoldenExact:
    def test_english_6_distance_or_query(self, spark, corpora):
        q = to_tspquery("english", "best<2>time|worst<2>time")
        got = _fast_headline(spark, corpora["english"], "english", q)
        assert got == ("It was the <b>best of times,</b> it was the "
                       "<b>worst of times,</b> it was the age of wisdom, "
                       "it was the age")

    @pytest.mark.parametrize("config", ["english", "simple"])
    def test_swift_power(self, spark, corpora, config):
        q = phraseto_tspquery(config, "POWER")
        got = _fast_headline(spark, corpora["swift"], config, q)
        assert got == ("of no expence and little trouble, full in our own "
                       "<b>power,</b> and whereby we can incur no danger in "
                       "disobliging England.")

    @pytest.mark.parametrize("config", ["english", "simple"])
    def test_swift_child_bearing(self, spark, corpora, config):
        q = phraseto_tspquery(config, "child-bearing")
        got = _fast_headline(spark, corpora["swift"], config, q)
        assert got == ("the youngest being nine years old, and my wife past "
                       "<b>child-bearing.</b>")

    @pytest.mark.parametrize("config", ["english", "simple"])
    def test_swift_fortune_through_the_kingdom(self, spark, corpora, config):
        q = phraseto_tspquery(config, "fortune, through the kingdom")
        got = _fast_headline(spark, corpora["swift"], config, q)
        assert got == ("be offered in sale to the persons of quality and "
                       "<b>fortune, through the kingdom,</b> always advising "
                       "the mother to let them suck plentifully in")


class TestSemanticHeadlineSpans:
    """Highlighted span parity for the ad-hoc path."""

    CASES_EN = [
        ("decide negatively", "<b>decided negative,</b>"),
        ("hurried adjuration, he cocked his blunderbuss",
         "<b>hurried adjuration, he cocked his blunderbuss,</b>"),
        ("gallop came fast and furiously up the hill",
         "<b>gallop came fast and furiously up the hill.</b>"),
        ("time", "<b>times,</b>"),
    ]

    @pytest.mark.parametrize("phrase,span", CASES_EN)
    def test_english_spans(self, spark, corpora, phrase, span):
        q = phraseto_tspquery("english", phrase)
        got = _semantic_headline(spark, corpora["english"], "english", q)
        assert got is not None and span in got, got

    CASES_DE = [
        ("Dzünschten ihm ungeniert alles Üble",
         "<b>Dzünschten ihm ungeniert alles Üble.</b>"),
        ("Schutzdache des Wagenschuppens aufgestellt",
         "<b>Schutzdache des Wagenschuppens aufgestellt.</b>"),
        ("bleibenden Gäste zecht", "<b>bleibenden Gäste zechten</b>"),
        ("Kutschen, Landauern, Einspännern",
         "<b>Kutschen, Landauern, Einspännern,</b>"),
        ("Hochzeitsgeschenk", "<b>Hochzeitsgeschenk</b>"),
    ]

    @pytest.mark.parametrize("phrase,span", CASES_DE)
    def test_german_spans(self, spark, corpora, phrase, span):
        q = phraseto_tspquery("german", phrase)
        got = _semantic_headline(spark, corpora["german"], "german", q)
        assert got is not None and span in got, got

    def test_english_or_query_spans(self, spark, corpora):
        q = to_tspquery("english", "best<2>time|worst<2>time")
        got = _semantic_headline(spark, corpora["english"], "english", q)
        assert "<b>best of times,</b>" in got
        assert "<b>worst of times,</b>" in got

    def test_simple_config_stemming_fallback(self, spark, corpora):
        # 'zecht' does not match 'zechten' without German stemming: the
        # simple config must fall back to the document head.
        q = phraseto_tspquery("simple", "bleibenden Gäste zecht")
        got = _semantic_headline(spark, corpora["german"], "simple", q)
        assert got == ("Alles ward wieder ruhig. Die Köpfe versanken in den "
                       "Heften, und der Neuling verharrte zwei")

    def test_simple_config_exact_match_works(self, spark, corpora):
        q = phraseto_tspquery("simple", "Dzünschten ihm ungeniert alles Üble")
        got = _semantic_headline(spark, corpora["german"], "simple", q)
        assert "<b>Dzünschten ihm ungeniert alles Üble.</b>" in got
