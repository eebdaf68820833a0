from .incremental import attach_incremental_indexer, merge_batch

__all__ = ["attach_incremental_indexer", "merge_batch"]
