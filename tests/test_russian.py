"""Russian config: Snowball stemmer goldens + pipeline integration.

First non-Latin config: exercises the Cyrillic path through the
canonicalizer, unaccent, stopwords and the shared registry. Goldens
below are the LIVE PostgreSQL 15 `ts_lexize('russian_stem', w)` outputs
(captured via scripts/validate_stemmers_pg.py's throwaway instance),
and the stemmer is fuzz-validated to 0 mismatches over ~8.3k Cyrillic
words.
"""

import pytest

from pg_ts_semantic_headline_spark.functions.lexize import (
    SUPPORTED_CONFIGS, analyze_document, is_supported_config, lexize_word,
    ts_lexize)
from pg_ts_semantic_headline_spark.functions.stemmer_ru import stem_russian


class TestStemRussian:
    @pytest.mark.parametrize("word,expected", [
        # noun endings
        ("мальчики", "мальчик"),
        ("книги", "книг"),
        ("книгой", "книг"),
        ("стеной", "стен"),
        ("жизнь", "жизн"),
        ("жизни", "жизн"),
        ("истории", "истор"),
        ("история", "истор"),
        ("объявление", "объявлен"),
        # verb endings (group 1 needs preceding а/я)
        ("читали", "чита"),
        # perfective gerund
        ("читая", "чит"),
        ("прочитав", "прочита"),
        ("сделавшись", "сдела"),
        # adjectival (adjective + optional participle)
        ("красивый", "красив"),
        ("красивее", "красив"),
        ("насекомые", "насеком"),
        ("выживший", "выж"),
        ("делающий", "дела"),
        # step 4: superlative + нн tidy-up
        ("важнейшими", "важн"),
        # ё -> е prelude (Snowball 2.x, vendored by PG 13+)
        ("чёрный", "черн"),
        # residual / invariants
        ("быстро", "быстр"),
        ("быстрее", "быстр"),
        ("нн", "нн"),       # region guards: nothing before RV touched
        ("стол", "стол"),
    ])
    def test_goldens(self, word, expected):
        assert stem_russian(word) == expected

    def test_fuzz_never_crashes_or_grows(self):
        import random
        random.seed(23)
        alphabet = "абвгдежзийклмнопрстуфхцчшщъыьэюяё"
        for _ in range(3000):
            w = "".join(random.choice(alphabet)
                        for _ in range(random.randint(0, 12)))
            s = stem_russian(w)
            assert isinstance(s, str)
            assert len(s) <= len(w)


class TestRussianConfig:
    def test_registered(self):
        assert "russian" in SUPPORTED_CONFIGS
        assert is_supported_config("russian")

    def test_stopwords_and_lexize(self):
        assert lexize_word("и", "russian") is None
        assert lexize_word("что", "russian") is None
        assert ts_lexize("russian_stem", "книги") == ["книг"]
        assert ts_lexize("russian_stem", "не") == []

    def test_asciiword_routes_through_english_stem(self):
        # PG's `russian` regconfig maps asciiword -> english_stem
        # (ts_debug-verified on live PG 15): pure-ASCII tokens take the
        # ENGLISH stopword list and Porter2, Cyrillic takes russian_stem
        assert lexize_word("running", "russian") == "run"
        assert lexize_word("the", "russian") is None      # english stop
        assert lexize_word("books", "russian") == "book"
        tokens, lexemes = analyze_document(
            "running the мальчики", "russian")
        assert lexemes == ["run", None, "мальчик"]

    def test_analyze_document_alignment(self):
        tokens, lexemes = analyze_document(
            "Мальчики читали книги в школе", "russian")
        assert tokens == ["Мальчики", "читали", "книги", "в", "школе"]
        assert lexemes[0] == "мальчик"
        assert lexemes[1] == "чита"
        assert lexemes[2] == "книг"
        assert lexemes[3] is None          # 'в' stopword hole
        assert lexemes[4] == "школ"
        assert len(lexemes) == len(tokens)


@pytest.mark.usefixtures("spark")
class TestRussianEndToEnd:
    def test_index_search_headline(self, spark, tmp_path):
        from pg_ts_semantic_headline_spark.plans.headline import (
            ts_semantic_headline)
        from pg_ts_semantic_headline_spark.plans.index_build import (
            build_index, load_index)
        from pg_ts_semantic_headline_spark.plans.query_compiler import (
            to_tspquery)
        from pg_ts_semantic_headline_spark.plans.search import search

        docs = spark.createDataFrame(
            [(1, "Мальчики читали интересные книги в школе"),
             (2, "Новая книга о городской жизни"),
             (3, "Рынок открывается рано каждое утро")],
            ["doc_id", "content"])
        idx_dir = str(tmp_path / "ru_idx")
        build_index(spark, docs, idx_dir, config="russian")
        index = load_index(spark, idx_dir)

        # 'книги' and 'книга' conflate through the shared path
        q = to_tspquery("russian", "книги")
        hits = search(index, q, k=10).collect()
        assert sorted(r["doc_id"] for r in hits) == [1, 2]

        out = ts_semantic_headline(
            docs.where("doc_id = 2"), q,
            options="StartSel=<b>,StopSel=</b>").collect()
        assert "<b>книга</b>" in out[0]["headline"]
