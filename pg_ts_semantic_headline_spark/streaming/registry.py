"""Persisted standing-query registries for the percolator.

The ES-percolator operational contract: standing queries survive a
process restart, so a resumed stream percolates the SAME registry it was
stopped with (reference analog: the standing TSPQueries a PG user keeps
in a table and re-applies per insert). The in-memory registry is
``dict[query_id, CompiledQuery]``; this module round-trips it through a
parquet table of (query_id, config, raw, tree) rows, where ``tree`` is a
JSON encoding of the EXACT compiled boolean AST — load never
re-lexizes, so a stem that is not a stemmer fixpoint (or a synonym map
that has since changed) cannot drift the standing set across restarts.

Scale shape: a registry is small relative to the corpus (10^4-10^6
rows); save is one driver-side createDataFrame + parquet write, load is
one bounded collect — both O(registry), never O(corpus). Single-writer
per path, like ``publish_index``: concurrent saves to one path are a
caller bug (last overwrite wins, parquet keeps it readable).

The substring-pattern registry (``percolate_patterns``'s ``dict[str,
str]``) has the same contract with a plain (query_id, pattern) table.
"""

from __future__ import annotations

import json

from pyspark.sql import SparkSession

from ..plans.query_compiler import CompiledQuery, Node, Phrase

__all__ = ["save_query_registry", "load_query_registry",
           "save_pattern_registry", "load_pattern_registry"]


def _phrase_to_obj(ph: Phrase | None):
    if ph is None:
        return None
    return [[lex, pos] for lex, pos in ph.items]


def _phrase_from_obj(obj) -> Phrase | None:
    if obj is None:
        return None
    return Phrase(items=tuple((str(lex), int(pos)) for lex, pos in obj))


def _node_to_obj(n: Node | None):
    if n is None:
        return None
    return {"op": n.op,
            "phrase": _phrase_to_obj(n.phrase),
            "children": [_node_to_obj(c) for c in n.children]}


def _node_from_obj(obj) -> Node | None:
    if obj is None:
        return None
    return Node(op=obj["op"],
                children=tuple(_node_from_obj(c) for c in obj["children"]),
                phrase=_phrase_from_obj(obj["phrase"]))


def save_query_registry(spark: SparkSession,
                        queries: dict[str, CompiledQuery],
                        path: str) -> None:
    """Persist a standing-query registry to parquet at `path` (overwrite).
    The compiled tree AND the distinct-phrase list are stored verbatim,
    so ``load_query_registry`` reconstructs each CompiledQuery
    bit-identically without touching any dictionary/stemmer state."""
    rows = [(qid,
             q.config,
             q.raw,
             json.dumps(_node_to_obj(q.root)),
             json.dumps([_phrase_to_obj(ph) for ph in q.phrases]))
            for qid, q in queries.items()]
    (spark.createDataFrame(
        rows, "query_id string, config string, raw string, "
              "tree string, phrases string")
     .coalesce(1)
     .write.mode("overwrite").parquet(path))


def load_query_registry(spark: SparkSession,
                        path: str) -> dict[str, CompiledQuery]:
    """Reload a registry saved by ``save_query_registry``. Exact inverse:
    the returned CompiledQuery objects compare equal to the saved ones."""
    out: dict[str, CompiledQuery] = {}
    for r in spark.read.parquet(path).collect():
        phrases = tuple(_phrase_from_obj(o)
                        for o in json.loads(r["phrases"]))
        out[r["query_id"]] = CompiledQuery(
            config=r["config"], raw=r["raw"],
            root=_node_from_obj(json.loads(r["tree"])),
            phrases=phrases)
    return out


def save_pattern_registry(spark: SparkSession, patterns: dict[str, str],
                          path: str) -> None:
    """Persist a standing substring-pattern registry (overwrite)."""
    (spark.createDataFrame(list(patterns.items()),
                           "query_id string, pattern string")
     .coalesce(1)
     .write.mode("overwrite").parquet(path))


def load_pattern_registry(spark: SparkSession, path: str) -> dict[str, str]:
    """Reload a registry saved by ``save_pattern_registry``."""
    return {r["query_id"]: r["pattern"]
            for r in spark.read.parquet(path).collect()}
