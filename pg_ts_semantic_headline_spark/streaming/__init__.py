from .corpus_ingest import (attach_corpus_preparer, compact_corpus_stores,
                            prepare_corpus_batch)
from .incremental import (attach_incremental_indexer, compact_index,
                          delete_docs, merge_batch, upsert_documents)
from .percolate import (percolate, percolate_patterns,
                        percolate_patterns_stream, percolate_stream)
from .registry import (load_pattern_registry, load_query_registry,
                       save_pattern_registry, save_query_registry)
from .sessions import sessionize, sessionize_stream
from .term_stats import doc_arrival_rates, windowed_term_counts
from .vector_ingest import (attach_fielded_indexer,
                            attach_trigram_indexer,
                            attach_vector_indexer)

__all__ = ["attach_corpus_preparer", "attach_fielded_indexer",
           "attach_incremental_indexer",
           "attach_trigram_indexer", "attach_vector_indexer",
           "compact_corpus_stores", "compact_index", "delete_docs",
           "doc_arrival_rates", "load_pattern_registry",
           "load_query_registry", "merge_batch", "percolate",
           "percolate_patterns", "percolate_patterns_stream",
           "percolate_stream", "prepare_corpus_batch",
           "save_pattern_registry", "save_query_registry",
           "sessionize", "sessionize_stream", "upsert_documents",
           "windowed_term_counts"]
