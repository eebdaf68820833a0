from .fsck import verify_index
from .query_compiler import (
    CompiledQuery,
    Phrase,
    TSQueryParseError,
    phraseto_tspquery,
    to_tspquery,
)

__all__ = [
    "CompiledQuery", "Phrase", "TSQueryParseError",
    "phraseto_tspquery", "to_tspquery", "verify_index",
]
