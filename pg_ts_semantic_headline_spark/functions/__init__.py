from .chars import BELL, SMC_CLASS, SPACE_MAKING_CHARS
from .lexize import (
    SUPPORTED_CONFIGS,
    is_supported_config,
    make_synonym_config,
    make_thesaurus_config,
    analyze_document,
    analyze_text_simple,
    lexize_chunk,
    lexize_word,
    ts_debug,
    ts_lexize,
)
from .stemmer_de import stem_german
from .stemmer_en import stem_english
from .stemmer_es import stem_spanish
from .stemmer_fr import stem_french
from .stopwords import (
    ENGLISH_STOPWORDS,
    FRENCH_STOPWORDS,
    GERMAN_STOPWORDS,
    SPANISH_STOPWORDS,
    STOPWORDS_BY_CONFIG,
)
from .textprep import to_tsp_text_array, tsp_indexable_text, tsp_present_text
from .unaccent import unaccent

__all__ = [
    "BELL", "SMC_CLASS", "SPACE_MAKING_CHARS", "SUPPORTED_CONFIGS",
    "is_supported_config", "make_synonym_config", "make_thesaurus_config",
    "analyze_document", "analyze_text_simple", "lexize_chunk", "lexize_word",
    "stem_german", "stem_english", "stem_french", "stem_spanish",
    "ENGLISH_STOPWORDS", "GERMAN_STOPWORDS", "FRENCH_STOPWORDS",
    "SPANISH_STOPWORDS",
    "STOPWORDS_BY_CONFIG", "to_tsp_text_array", "ts_debug", "ts_lexize",
    "tsp_indexable_text", "tsp_present_text", "unaccent",
]
