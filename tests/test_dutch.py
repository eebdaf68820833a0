"""Dutch config: Snowball stemmer goldens + pipeline integration.

Same extension pattern as the other round-4/5 languages. Goldens below
are the LIVE PostgreSQL 15 `ts_lexize('dutch_stem', w)` outputs, and
the stemmer is fuzz-validated to 0 mismatches (the fuzz found a real
spec subtlety: the Dutch source's R1 `$p1 = 3` floor counts UTF-8
BYTES, unlike German's character-aware `hop 3` — see
functions/stemmer_nl.py::_mark_r1r2).
"""

import pytest

from pg_ts_semantic_headline_spark.functions.lexize import (
    SUPPORTED_CONFIGS, analyze_document, is_supported_config, lexize_word,
    ts_lexize)
from pg_ts_semantic_headline_spark.functions.stemmer_nl import stem_dutch


class TestStemDutch:
    @pytest.mark.parametrize("word,expected", [
        # en-deletion + undouble
        ("boeken", "boek"),
        ("huizen", "huiz"),
        ("kinderen", "kinder"),
        ("vrouwen", "vrouw"),
        ("steden", "sted"),
        ("dorpen", "dorp"),
        ("manen", "man"),
        # step-4 double-vowel undouble (maan -> man, brood -> brod)
        ("maan", "man"),
        ("brood", "brod"),
        ("broden", "brod"),
        # lijk / heid chains
        ("lichamelijk", "licham"),
        ("lichamelijkheden", "licham"),
        ("mogelijkheden", "mogelijk"),
        ("wetenschappelijk", "wetenschapp"),
        ("overheid", "over"),
        ("overheden", "over"),
        # ig
        ("eenvoudig", "eenvoud"),
        ("eenvoudige", "eenvoud"),
        # e-deletion
        ("uitgebreide", "uitgebreid"),
        ("praatje", "praatj"),
        ("ijsje", "ijsj"),
        # superlatives / invariants
        ("grootste", "grootst"),
        ("belangrijkste", "belangrijkst"),
        ("gemeenten", "gemeent"),   # gem-ending guard keeps the t
        ("appeltjes", "appeltjes"),
        ("gewerkt", "gewerkt"),
        ("verjaardag", "verjaardag"),
    ])
    def test_goldens(self, word, expected):
        assert stem_dutch(word) == expected

    def test_r1_floor_counts_bytes_not_letters(self):
        # pinned from live PG: the final-e deletion fires when the
        # 2-byte à pushes the byte mark to 3 ('eàe' -> 'eà'), which a
        # character-counted floor would block
        assert stem_dutch("eàe") == "eà"
        assert stem_dutch("eôé") == "eô"   # é deaccented, ô two bytes

    def test_fuzz_never_crashes_or_grows(self):
        import random
        random.seed(29)
        alphabet = "abcdefghijklmnopqrstuvwxyzäëïöüáéíóúè"
        for _ in range(3000):
            w = "".join(random.choice(alphabet)
                        for _ in range(random.randint(0, 12)))
            s = stem_dutch(w)
            assert isinstance(s, str)
            assert len(s) <= len(w)


class TestDutchConfig:
    def test_registered(self):
        assert "dutch" in SUPPORTED_CONFIGS
        assert is_supported_config("dutch")

    def test_stopwords_and_lexize(self):
        assert lexize_word("een", "dutch") is None
        assert lexize_word("niet", "dutch") is None
        assert ts_lexize("dutch_stem", "boeken") == ["boek"]
        assert ts_lexize("dutch_stem", "de") == []

    def test_analyze_document_alignment(self):
        tokens, lexemes = analyze_document(
            "De kinderen lazen boeken in de bibliotheek", "dutch")
        assert tokens == ["De", "kinderen", "lazen", "boeken", "in",
                          "de", "bibliotheek"]
        assert lexemes[0] is None          # 'de' stopword hole
        assert lexemes[1] == "kinder"
        assert lexemes[3] == "boek"
        assert lexemes[4] is None          # 'in'
        assert len(lexemes) == len(tokens)


@pytest.mark.usefixtures("spark")
class TestDutchEndToEnd:
    def test_index_search_headline(self, spark, tmp_path):
        from pg_ts_semantic_headline_spark.plans.headline import (
            ts_semantic_headline)
        from pg_ts_semantic_headline_spark.plans.index_build import (
            build_index, load_index)
        from pg_ts_semantic_headline_spark.plans.query_compiler import (
            to_tspquery)
        from pg_ts_semantic_headline_spark.plans.search import search

        docs = spark.createDataFrame(
            [(1, "De kinderen lazen boeken op het plein"),
             (2, "Een oud boek uit de stadsbibliotheek"),
             (3, "De markt opent elke ochtend vroeg")],
            ["doc_id", "content"])
        idx_dir = str(tmp_path / "nl_idx")
        build_index(spark, docs, idx_dir, config="dutch")
        index = load_index(spark, idx_dir)

        # 'boeken' and 'boek' conflate through the shared path
        q = to_tspquery("dutch", "boeken")
        hits = search(index, q, k=10).collect()
        assert sorted(r["doc_id"] for r in hits) == [1, 2]

        out = ts_semantic_headline(
            docs.where("doc_id = 2"), q,
            options="StartSel=<b>,StopSel=</b>").collect()
        assert "<b>boek</b>" in out[0]["headline"]
