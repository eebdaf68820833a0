from .incremental import attach_incremental_indexer, merge_batch
from .term_stats import doc_arrival_rates, windowed_term_counts

__all__ = ["attach_incremental_indexer", "doc_arrival_rates",
           "merge_batch", "windowed_term_counts"]
