"""Spanish config: Snowball stemmer goldens + pipeline integration.

Same extension pattern as French (tests/test_french.py): the reference
ships english/german/simple only; 'spanish' plugs into the shared
registry. Goldens are hand-traced executions of the published Snowball
Spanish algorithm (functions/stemmer_es.py).
"""

import pytest

from pg_ts_semantic_headline_spark.functions.lexize import (
    SUPPORTED_CONFIGS, analyze_document, is_supported_config, lexize_word,
    ts_lexize)
from pg_ts_semantic_headline_spark.functions.stemmer_es import stem_spanish


class TestStemSpanish:
    @pytest.mark.parametrize("word,expected", [
        # residual step 3 (final vowel / os)
        ("niños", "niñ"),
        ("casa", "cas"),
        ("casas", "cas"),
        ("guerra", "guerr"),
        # verb morphology (step 2b) incl. accent removal at the end
        ("trabajando", "trabaj"),
        ("comieron", "com"),
        ("viviendo", "viv"),
        ("tenía", "ten"),
        ("canciones", "cancion"),
        ("canción", "cancion"),
        # standard suffixes (step 1)
        ("rápidamente", "rapid"),
        ("importancia", "import"),
        ("lógica", "logic"),
        ("biología", "biolog"),
        ("grandes", "grand"),
        ("grande", "grand"),
        ("nacionales", "nacional"),
        ("nacional", "nacional"),
        # R2 too short: 'ución' rule must NOT fire (starts left of R2)
        ("solución", "solucion"),
        ("soluciones", "solucion"),
        # attached pronouns (step 0)
        ("haciéndola", "hac"),      # iéndo + la -> haciendo -> 2b iendo
        ("comprarlo", "compr"),     # ar + lo -> comprar -> 2b ar
        # invariants / short words
        ("el", "el"),
        ("sol", "sol"),
    ])
    def test_goldens(self, word, expected):
        assert stem_spanish(word) == expected

    def test_unaccented_input_consistency(self):
        # the pipeline unaccents first; unaccented forms stem through the
        # residual rules and stay consistent doc-vs-query
        assert stem_spanish("cancion") == stem_spanish("canciones")

    def test_fuzz_never_crashes_or_grows(self):
        import random
        random.seed(13)
        alphabet = "abcdefghijklmnopqrstuvwxyzáéíóúüñ"
        for _ in range(3000):
            w = "".join(random.choice(alphabet)
                        for _ in range(random.randint(0, 12)))
            s = stem_spanish(w)
            assert isinstance(s, str)
            assert len(s) <= len(w)


class TestSpanishConfig:
    def test_registered(self):
        assert "spanish" in SUPPORTED_CONFIGS
        assert is_supported_config("spanish")

    def test_stopwords_and_lexize(self):
        assert lexize_word("que", "spanish") is None
        assert lexize_word("para", "spanish") is None
        assert ts_lexize("spanish_stem", "niños") == ["niñ"]
        assert ts_lexize("spanish_stem", "de") == []

    def test_analyze_document_alignment(self):
        tokens, lexemes = analyze_document(
            "Los niños trabajando en casa", "spanish")
        assert tokens == ["Los", "niños", "trabajando", "en", "casa"]
        assert lexemes[0] is None          # 'los' stopword hole
        # the unaccent-first pipeline maps ñ->n (PG unaccent does too);
        # queries flow through the same path so matching stays consistent
        assert lexemes[1] == "nin"
        assert lexemes[3] is None          # 'en'
        assert len(lexemes) == len(tokens)


@pytest.mark.usefixtures("spark")
class TestSpanishEndToEnd:
    def test_index_search_headline(self, spark, tmp_path):
        from pg_ts_semantic_headline_spark.plans.headline import (
            ts_semantic_headline)
        from pg_ts_semantic_headline_spark.plans.index_build import (
            build_index, load_index)
        from pg_ts_semantic_headline_spark.plans.query_compiler import (
            to_tspquery)
        from pg_ts_semantic_headline_spark.plans.search import search

        docs = spark.createDataFrame(
            [(1, "Los niños cantaban canciones en la plaza"),
             (2, "Una canción popular del barrio antiguo"),
             (3, "El mercado abre temprano cada mañana")],
            ["doc_id", "content"])
        idx_dir = str(tmp_path / "es_idx")
        build_index(spark, docs, idx_dir, config="spanish")
        index = load_index(spark, idx_dir)

        # 'canciones' and 'canción' conflate through the shared path
        q = to_tspquery("spanish", "canciones")
        hits = search(index, q, k=10).collect()
        assert sorted(r["doc_id"] for r in hits) == [1, 2]

        out = ts_semantic_headline(
            docs.where("doc_id = 2"), q,
            options="StartSel=<b>,StopSel=</b>").collect()
        assert "<b>canción</b>" in out[0]["headline"]
