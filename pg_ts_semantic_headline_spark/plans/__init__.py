from .fsck import (detect_index_family, verify_any_index,
                   verify_fielded_index, verify_index, verify_trigram_index,
                   verify_vector_index)
from .query_compiler import (
    CompiledQuery,
    Phrase,
    TSQueryParseError,
    empty_tspquery,
    phraseto_tspquery,
    plainto_tspquery,
    to_tspquery,
    ts_rewrite,
    ts_rewrite_rules_df,
    websearch_to_tspquery,
)
from .ranking import (
    ltr_features,
    min_span_docs,
    prf_search,
    proximity_rerank,
    rank_metrics,
    rm3_expand,
    slop_match_docs,
    ts_rank_cd,
)

__all__ = [
    "CompiledQuery", "Phrase", "TSQueryParseError", "empty_tspquery",
    "ltr_features", "min_span_docs", "phraseto_tspquery",
    "plainto_tspquery", "prf_search",
    "proximity_rerank", "rank_metrics", "rm3_expand", "to_tspquery",
    "ts_rewrite", "ts_rewrite_rules_df",
    "slop_match_docs", "ts_rank_cd",
    "detect_index_family", "verify_any_index",
    "verify_fielded_index", "verify_index", "verify_trigram_index",
    "verify_vector_index", "websearch_to_tspquery",
]
