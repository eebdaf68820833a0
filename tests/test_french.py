"""French config: Snowball stemmer goldens + full-pipeline integration.

The reference ships english/german/simple test corpora only
(/root/reference/test/); `french` is an engine extension wired through the
same registry (functions/lexize.py), so everything downstream — analysis,
query compilation, index build, matching, headlines — must work unchanged.
Stemmer goldens below are hand-traced executions of the published Snowball
French algorithm (see functions/stemmer_fr.py) — the same validation style
the German stemmer uses.
"""

import pytest

from pg_ts_semantic_headline_spark.functions.lexize import (
    SUPPORTED_CONFIGS, analyze_document, is_supported_config, lexize_word,
    ts_debug)
from pg_ts_semantic_headline_spark.functions.stemmer_fr import (
    _prelude, stem_french)


class TestPrelude:
    # examples straight from the algorithm description
    @pytest.mark.parametrize("word,expected", [
        ("jouer", "joUer"),
        ("ennuie", "ennuIe"),
        ("yeux", "Yeux"),
        ("quand", "qUand"),
        ("croyiez", "croYiez"),
    ])
    def test_marking(self, word, expected):
        assert _prelude(word) == expected


class TestStemFrench:
    @pytest.mark.parametrize("word,expected", [
        # aux/eaux pluralization
        ("chevaux", "cheval"),
        ("animaux", "animal"),
        ("généraux", "général"),
        # adverb / -ment family (step 1 + fail-through to verb steps)
        ("continuellement", "continuel"),   # ement + ell undouble
        ("grandement", "grand"),
        ("abondamment", "abond"),           # amment -> ant, then 2b ant
        # step-1 standard suffixes
        ("majestueux", "majestu"),
        ("électrique", "électr"),           # iqUe in R2
        # residual step 4 (ier -> i, e-drop, s-drop)
        ("premier", "premi"),
        ("premiers", "premi"),
        ("première", "premi"),
        ("nationale", "national"),
        ("nationales", "national"),
        ("national", "national"),
        # verb morphology (steps 2a/2b)
        ("continuait", "continu"),
        ("continuera", "continu"),
        ("mangea", "mang"),
        ("manger", "mang"),
        ("mangé", "mang"),
        ("importante", "import"),           # 'ante' is a 2b verb suffix
        # invariants / short words
        ("maison", "maison"),
        ("maisons", "maison"),
        ("été", "été"),                     # final é: RV empty, kept
        ("le", "le"),
    ])
    def test_goldens(self, word, expected):
        assert stem_french(word) == expected

    def test_unaccented_conflation_matches_accented(self):
        # the pipeline unaccents before stemming; the residual rules make
        # singular+plural of é-nouns converge on PG's accented stem
        assert stem_french("qualite") == "qualit"
        assert stem_french("qualites") == "qualit"
        assert stem_french("qualité") == "qualit"

    def test_no_marker_leak_and_never_grows_much(self):
        import random
        random.seed(11)
        alphabet = "abcdefghijklmnopqrstuvwxyzéèêëïîôûùàâç"
        for _ in range(3000):
            w = "".join(random.choice(alphabet)
                        for _ in range(random.randint(0, 12)))
            s = stem_french(w)
            assert not any(c in "UIYH" for c in s), (w, s)
            assert len(s) <= len(w) + 1


class TestFrenchConfig:
    def test_registered(self):
        assert "french" in SUPPORTED_CONFIGS
        assert is_supported_config("french")

    def test_stopwords_filtered(self):
        assert lexize_word("le", "french") is None
        assert lexize_word("des", "french") is None
        assert lexize_word("dans", "french") is None
        # accented stopwords survive unaccenting upstream of this call,
        # so the raw accented form IS filtered when passed directly
        assert lexize_word("même", "french") is None
        # PG's french.stop genuinely lacks 'les'/'ils' (verified against
        # tsearch_data/french.stop) — they stem like ordinary words
        assert lexize_word("les", "french") == "le"

    def test_digit_tokens_use_simple_dictionary(self):
        assert lexize_word("utf8", "french") == "utf8"

    def test_analyze_document_alignment(self):
        tokens, lexemes = analyze_document(
            "La jument et les chevaux mangeaient", "french")
        assert tokens == ["La", "jument", "et", "les", "chevaux",
                          "mangeaient"]
        # 'la'/'et' stopword holes keep positions; 'les' is NOT a PG
        # stopword (verified against tsearch_data/french.stop) and stems
        assert lexemes[0] is None
        assert lexemes[2] is None
        assert lexemes[3] == "le"
        assert lexemes[4] == "cheval"
        assert len(lexemes) == len(tokens)

    def test_ts_debug_attribution(self):
        rows = ts_debug("french", "la chevaux 42")
        by_token = {r["token"]: r for r in rows}
        assert by_token["la"]["dictionary"] == "french_stem"
        assert by_token["la"]["lexemes"] == []           # stopword
        assert by_token["chevaux"]["lexemes"] == ["cheval"]
        assert by_token["42"]["dictionary"] == "simple"

    def test_query_compiler_french(self):
        from pg_ts_semantic_headline_spark.plans.query_compiler import (
            phraseto_tspquery, to_tspquery)
        q = to_tspquery("french", "chevaux & mangeaient")
        lex = sorted(ph.items[0][0] for ph in q.phrases)
        assert lex == ["cheval", "mang"]
        # phrase query keeps positions; stopwords become holes that
        # relax to position gaps exactly like english
        p = phraseto_tspquery("french", "les chevaux importants")
        assert len(p.phrases) == 1


@pytest.mark.usefixtures("spark")
class TestFrenchEndToEnd:
    def test_index_search_headline(self, spark, tmp_path):
        from pg_ts_semantic_headline_spark.plans.headline import (
            ts_semantic_headline)
        from pg_ts_semantic_headline_spark.plans.index_build import (
            build_index, load_index)
        from pg_ts_semantic_headline_spark.plans.search import bm25_topk

        docs = spark.createDataFrame(
            [(1, "Les chevaux galopaient dans la prairie verte"),
             (2, "Le cheval blanc mangeait du foin dans la grange"),
             (3, "Der Hund schläft im Garten neben dem Haus"),
             (4, "Une qualité remarquable des produits français")],
            ["doc_id", "content"])
        idx_dir = str(tmp_path / "fr_idx")
        build_index(spark, docs, idx_dir, config="french")
        index = load_index(spark, idx_dir)

        # stemmed recall: both inflections ('chevaux', 'cheval') landed in
        # the index under the stem; bm25_topk takes lexemes (the compiled
        # form — to_tspquery does the stemming for surface queries)
        hits = bm25_topk(index, ["cheval"], k=10).collect()
        ids = sorted(r["doc_id"] for r in hits)
        assert ids == [1, 2]

        # semantic headline highlights the ORIGINAL surface form
        from pg_ts_semantic_headline_spark.plans.query_compiler import (
            to_tspquery)
        q = to_tspquery("french", "chevaux")
        out = ts_semantic_headline(
            docs.where("doc_id = 1"), q,
            options="StartSel=<b>,StopSel=</b>").collect()
        assert len(out) == 1
        assert "<b>chevaux</b>" in out[0]["headline"]

    def test_accented_query_matches_accented_doc(self, spark, tmp_path):
        # both sides unaccent+stem through the same path: query 'qualités'
        # must match a document containing 'qualité'
        from pg_ts_semantic_headline_spark.plans.index_build import (
            build_index, load_index)
        from pg_ts_semantic_headline_spark.plans.query_compiler import (
            to_tspquery)
        from pg_ts_semantic_headline_spark.plans.search import search

        docs = spark.createDataFrame(
            [(1, "une qualité remarquable"), (2, "un produit ordinaire")],
            ["doc_id", "content"])
        idx_dir = str(tmp_path / "fr_idx2")
        build_index(spark, docs, idx_dir, config="french")
        index = load_index(spark, idx_dir)
        q = to_tspquery("french", "qualités")
        hits = search(index, q, k=10).collect()
        assert [r["doc_id"] for r in hits] == [1]
