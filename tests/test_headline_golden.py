"""Golden parity with the reference's pgTAP assertions.

Fast-path assertions (TS_FAST_HEADLINE over precomputed arr+tsv) are checked
STRING-EXACT — the reference documents every step of that arithmetic, so our
output must be identical (english_lang_test.sql:56-58,
jswift_modest_proposal_test.sql:370-401).

Ad-hoc ts_semantic_headline assertions are ALSO checked string-exact: the
engine reimplements PostgreSQL's built-in non-fragment passage selection
(cover choice, MinWords/MaxWords/ShortWord window rules, document-edge
behavior), so every ad-hoc pgTAP expectation in english_lang_test.sql:33-95
and german_lang_test.sql:111-149 reproduces byte-for-byte, including the
no-match fallback (german_lang_test.sql:139-141).
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


class TestSemanticHeadlineGoldenExact:
    """String-exact golden parity for the ad-hoc 1:1 ts_headline path."""

    # english_lang_test.sql:35-53 (Tests 1-5; Tests 6-15 repeat the same
    # expectations through the phraseto/arity-3 overloads)
    CASES_EN = [
        ("query", "best<2>time|worst<2>time",
         "<b>best of times,</b> it was the <b>worst of times,</b> it was "
         "the age of wisdom"),
        ("phrase", "decide negatively",
         "<b>decided negative,</b> made a decided scramble for it, and the "
         "three other horses followed suit"),
        ("phrase", "hurried adjuration, he cocked his blunderbuss",
         "<b>hurried adjuration, he cocked his blunderbuss,</b> and stood "
         "on the offensive. The stillness consequent on the cessation"),
        ("phrase", "gallop came fast and furiously up the hill",
         "expectati The sound of a horse at a <b>gallop came fast and "
         "furiously up the hill.</b>"),
        ("phrase", "time",
         "<b>times,</b> it was the worst of <b>times,</b> it was the age "
         "of wisdom, it was the age of foolishness"),
    ]

    @pytest.mark.parametrize("kind,qs,want", CASES_EN)
    def test_english_exact(self, spark, corpora, kind, qs, want):
        q = (phraseto_tspquery("english", qs) if kind == "phrase"
             else to_tspquery("english", qs))
        got = _semantic_headline(spark, corpora["english"], "english", q)
        assert got == want

    # german_lang_test.sql:111-129 (german config) and :131-149 (simple)
    CASES_DE = [
        ("german", "Dzünschten ihm ungeniert alles Üble",
         "<b>Dzünschten ihm ungeniert alles Üble.</b> der witzenheimer zur "
         "Seite gewahrte man vierzehn- bis sechzehnjährige Mädchen"),
        ("german", "Schutzdache des Wagenschuppens aufgestellt",
         "<b>Schutzdache des Wagenschuppens aufgestellt.</b> Es prangten "
         "darauf vier Lendenbraten, sechs Schüsseln mit Hühnerfrikassee, "
         "eine Platte"),
        ("german", "bleibenden Gäste zecht",
         "<b>bleibenden Gäste zechten</b> am Küchentische bis zum frühen "
         "Morgen weiter, während die Kinder unter den Bänken"),
        ("german", "Kutschen, Landauern, Einspännern",
         "<b>Kutschen, Landauern, Einspännern,</b> Gigs, Kremsern mit "
         "Ledervorhängen, in allerlei Fuhrwerk moderner und "
         "vorsintflutlicher Art. Das junge"),
        ("german", "Hochzeitsgeschenk",
         "<b>Hochzeitsgeschenk</b> selbstverständlich ein paar Seezungen "
         "gestiftet hatte doch daran, einen Mund voll Wasser durch"),
        ("simple", "Dzünschten ihm ungeniert alles Üble",
         "<b>Dzünschten ihm ungeniert alles Üble.</b> der witzenheimer zur "
         "Seite gewahrte man vierzehn- bis sechzehnjährige Mädchen"),
        ("simple", "Schutzdache des Wagenschuppens aufgestellt",
         "<b>Schutzdache des Wagenschuppens aufgestellt.</b> Es prangten "
         "darauf vier Lendenbraten, sechs Schüsseln mit Hühnerfrikassee, "
         "eine Platte"),
        # 'zecht' cannot match 'zechten' without German stemming: the
        # simple config falls back to the document-head passage
        ("simple", "bleibenden Gäste zecht",
         "Alles ward wieder ruhig. Die Köpfe versanken in den Heften, und "
         "der Neuling verharrte zwei"),
        ("simple", "Kutschen, Landauern, Einspännern",
         "<b>Kutschen, Landauern, Einspännern,</b> Gigs, Kremsern mit "
         "Ledervorhängen, in allerlei Fuhrwerk moderner und "
         "vorsintflutlicher Art. Das junge"),
        ("simple", "Hochzeitsgeschenk",
         "<b>Hochzeitsgeschenk</b> selbstverständlich ein paar Seezungen "
         "gestiftet hatte doch daran, einen Mund voll Wasser durch"),
    ]

    @pytest.mark.parametrize("config,phrase,want", CASES_DE)
    def test_german_exact(self, spark, corpora, config, phrase, want):
        q = phraseto_tspquery(config, phrase)
        got = _semantic_headline(spark, corpora["german"], config, q)
        assert got == want
