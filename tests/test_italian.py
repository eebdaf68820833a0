"""Italian config: Snowball stemmer goldens + pipeline integration.

Same extension pattern as French/Spanish/Portuguese: 'italian' plugs
into the shared registry. Goldens below are the LIVE PostgreSQL 15
`ts_lexize('italian_stem', w)` outputs (captured via
scripts/validate_stemmers_pg.py's throwaway instance), and the stemmer
is fuzz-validated to 0 mismatches over ~8.5k words.
"""

import pytest

from pg_ts_semantic_headline_spark.functions.lexize import (
    SUPPORTED_CONFIGS, analyze_document, is_supported_config, lexize_word,
    ts_lexize)
from pg_ts_semantic_headline_spark.functions.stemmer_it import stem_italian


class TestStemItalian:
    @pytest.mark.parametrize("word,expected", [
        # residual step 3a (final vowel, then preceding i)
        ("bambini", "bambin"),
        ("case", "cas"),
        ("grandi", "grand"),
        ("grande", "grand"),
        ("crocchi", "crocc"),       # 3a deletes i then i; 3b ch->c
        ("crocchio", "crocc"),
        ("funghi", "fung"),         # 3b gh->g
        ("banche", "banc"),
        # verb morphology (step 2)
        ("cantando", "cant"),
        ("mangiarono", "mang"),
        ("abbandonerò", "abbandon"),
        # attached pronouns (step 0)
        ("mandargli", "mand"),      # ar+gli -> mandare -> step2 are
        ("vendendolo", "vend"),     # endo+lo -> vendendo -> step2 endo
        # standard suffixes (step 1)
        ("rapidamente", "rapid"),
        ("importanza", "import"),
        ("logica", "logic"),
        ("biologia", "biolog"),
        ("nazionali", "nazional"),
        ("nazionale", "nazional"),
        ("soluzione", "soluzion"),
        ("soluzioni", "soluzion"),
        ("pubblicità", "pubblic"),
        ("qualità", "qualit"),
        # plural/singular conflation
        ("canzoni", "canzon"),
        ("canzone", "canzon"),
        # invariants / short words
        ("sole", "sol"),
    ])
    def test_goldens(self, word, expected):
        assert stem_italian(word) == expected

    def test_acute_normalized_to_grave(self):
        # prelude: á é í ó ú -> à è ì ò ù before anything else
        assert stem_italian("qualitá") == stem_italian("qualità")

    def test_fuzz_never_crashes_or_grows(self):
        import random
        random.seed(19)
        alphabet = "abcdefghijklmnopqrstuvwxyzàèìòùáéíóú"
        for _ in range(3000):
            w = "".join(random.choice(alphabet)
                        for _ in range(random.randint(0, 12)))
            s = stem_italian(w)
            assert isinstance(s, str)
            assert len(s) <= len(w)


class TestItalianConfig:
    def test_registered(self):
        assert "italian" in SUPPORTED_CONFIGS
        assert is_supported_config("italian")

    def test_stopwords_and_lexize(self):
        assert lexize_word("che", "italian") is None
        assert lexize_word("della", "italian") is None
        assert lexize_word("facendo", "italian") is None  # in PG's list
        assert ts_lexize("italian_stem", "bambini") == ["bambin"]
        assert ts_lexize("italian_stem", "di") == []

    def test_analyze_document_alignment(self):
        tokens, lexemes = analyze_document(
            "I bambini cantavano canzoni nella piazza", "italian")
        assert tokens == ["I", "bambini", "cantavano", "canzoni",
                          "nella", "piazza"]
        assert lexemes[0] is None          # 'i' stopword hole
        assert lexemes[1] == "bambin"
        assert lexemes[3] == "canzon"
        assert lexemes[4] is None          # 'nella'
        assert len(lexemes) == len(tokens)


@pytest.mark.usefixtures("spark")
class TestItalianEndToEnd:
    def test_index_search_headline(self, spark, tmp_path):
        from pg_ts_semantic_headline_spark.plans.headline import (
            ts_semantic_headline)
        from pg_ts_semantic_headline_spark.plans.index_build import (
            build_index, load_index)
        from pg_ts_semantic_headline_spark.plans.query_compiler import (
            to_tspquery)
        from pg_ts_semantic_headline_spark.plans.search import search

        docs = spark.createDataFrame(
            [(1, "I bambini cantavano canzoni nella piazza della città"),
             (2, "Una canzone popolare del vecchio quartiere"),
             (3, "Il mercato apre presto ogni mattina")],
            ["doc_id", "content"])
        idx_dir = str(tmp_path / "it_idx")
        build_index(spark, docs, idx_dir, config="italian")
        index = load_index(spark, idx_dir)

        # 'canzoni' and 'canzone' conflate through the shared path
        q = to_tspquery("italian", "canzoni")
        hits = search(index, q, k=10).collect()
        assert sorted(r["doc_id"] for r in hits) == [1, 2]

        out = ts_semantic_headline(
            docs.where("doc_id = 2"), q,
            options="StartSel=<b>,StopSel=</b>").collect()
        assert "<b>canzone</b>" in out[0]["headline"]
