"""Portuguese config: Snowball stemmer goldens + pipeline integration.

Same extension pattern as French/Spanish (tests/test_french.py,
tests/test_spanish.py): the reference ships english/german/simple only
but accepts any REGCONFIG (/root/reference/sql/to_tspquery.sql:36-45);
'portuguese' plugs into the shared registry. Goldens below are the
LIVE PostgreSQL 15 `ts_lexize('portuguese_stem', w)` outputs (captured
via scripts/validate_stemmers_pg.py's throwaway instance), and the
stemmer is fuzz-validated to 0 mismatches over ~8.5k words.
"""

import pytest

from pg_ts_semantic_headline_spark.functions.lexize import (
    SUPPORTED_CONFIGS, analyze_document, is_supported_config, lexize_word,
    ts_lexize)
from pg_ts_semantic_headline_spark.functions.stemmer_pt import (
    stem_portuguese)


class TestStemPortuguese:
    @pytest.mark.parametrize("word,expected", [
        # residual step 4 (final vowel / os)
        ("meninos", "menin"),
        ("casas", "cas"),
        ("bonito", "bonit"),
        ("bonita", "bonit"),
        # verb morphology (step 2)
        ("cantando", "cant"),
        ("comeram", "com"),
        ("fazendo", "faz"),
        # nasal-vowel respelling (prelude/postlude: ã/õ survive)
        ("canções", "cançõ"),
        ("canção", "cançã"),
        ("coração", "coraçã"),
        ("solução", "soluçã"),
        ("soluções", "soluçõ"),
        ("proposição", "proposiçã"),
        # standard suffixes (step 1)
        ("rapidamente", "rapid"),
        ("importância", "import"),
        ("lógica", "lógic"),
        ("biologia", "biolog"),
        ("felizmente", "feliz"),
        ("habilidades", "habil"),
        ("grandes", "grand"),
        ("grande", "grand"),
        ("nacionais", "nacion"),
        ("nacional", "nacional"),
        # step-1 'ira' rule (in RV, preceded by e)
        ("bandeira", "bandeir"),
        ("bandeiras", "bandeir"),
        # step 5: final e deleted, gu/ci u/i handling; ç -> c
        ("guie", "gui"),
        ("raça", "rac"),
        # invariants / short words
        ("sol", "sol"),
    ])
    def test_goldens(self, word, expected):
        assert stem_portuguese(word) == expected

    def test_unaccented_input_consistency(self):
        # the pipeline unaccents first; regular singular/plural pairs
        # conflate through the residual rules on the unaccented forms
        # (note: unaccented 'cancao'/'cancoes' do NOT conflate — the
        # nasal-vowel rules need the real ã/õ; regular -o/-os pairs do)
        assert stem_portuguese("livro") == stem_portuguese("livros")
        assert stem_portuguese("menino") == stem_portuguese("meninos")

    def test_fuzz_never_crashes_or_grows(self):
        import random
        random.seed(17)
        alphabet = "abcdefghijklmnopqrstuvwxyzáéíóúâêôãõç"
        for _ in range(3000):
            w = "".join(random.choice(alphabet)
                        for _ in range(random.randint(0, 12)))
            s = stem_portuguese(w)
            assert isinstance(s, str)
            assert len(s) <= len(w)


class TestPortugueseConfig:
    def test_registered(self):
        assert "portuguese" in SUPPORTED_CONFIGS
        assert is_supported_config("portuguese")

    def test_stopwords_and_lexize(self):
        assert lexize_word("que", "portuguese") is None
        assert lexize_word("para", "portuguese") is None
        assert lexize_word("você", "portuguese") is None
        assert ts_lexize("portuguese_stem", "meninos") == ["menin"]
        assert ts_lexize("portuguese_stem", "de") == []

    def test_analyze_document_alignment(self):
        tokens, lexemes = analyze_document(
            "As crianças cantavam canções na praça", "portuguese")
        assert tokens == ["As", "crianças", "cantavam", "canções",
                          "na", "praça"]
        assert lexemes[0] is None          # 'as' stopword hole
        # unaccent-first pipeline: ç->c, õ->o before stemming
        assert lexemes[1] == "crianc"
        assert lexemes[3] == "canco"
        assert lexemes[4] is None          # 'na'
        assert len(lexemes) == len(tokens)


@pytest.mark.usefixtures("spark")
class TestPortugueseEndToEnd:
    def test_index_search_headline(self, spark, tmp_path):
        from pg_ts_semantic_headline_spark.plans.headline import (
            ts_semantic_headline)
        from pg_ts_semantic_headline_spark.plans.index_build import (
            build_index, load_index)
        from pg_ts_semantic_headline_spark.plans.query_compiler import (
            to_tspquery)
        from pg_ts_semantic_headline_spark.plans.search import search

        docs = spark.createDataFrame(
            [(1, "As crianças liam livros na praça da cidade"),
             (2, "Um livro popular do bairro antigo"),
             (3, "O mercado abre cedo todas as manhãs")],
            ["doc_id", "content"])
        idx_dir = str(tmp_path / "pt_idx")
        build_index(spark, docs, idx_dir, config="portuguese")
        index = load_index(spark, idx_dir)

        # 'livros' and 'livro' conflate through the shared path
        q = to_tspquery("portuguese", "livros")
        hits = search(index, q, k=10).collect()
        assert sorted(r["doc_id"] for r in hits) == [1, 2]

        out = ts_semantic_headline(
            docs.where("doc_id = 2"), q,
            options="StartSel=<b>,StopSel=</b>").collect()
        assert "<b>livro</b>" in out[0]["headline"]
