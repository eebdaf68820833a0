"""PG tsvector manipulation functions over the engine's tspvector form.

The engine's tspvector is the analyzed pair (tokens, lexemes): a DENSE
positional array where index i+1 is position i+1 and stopword slots hold
NULL — the recall-alignment invariant every positional operator relies
on (SURVEY §1.2). These are the PG §9.13 tsvector utilities re-expressed
as column algebra over that form, all JVM-side (no UDF):

- ``tsp_strip``      — PG ``strip(tsvector)``: the position-free lexeme
  set, sorted (PG stores lexemes sorted; ``array_sort ∘ array_distinct``
  reproduces that order for the text domain).
- ``tsp_length``     — PG ``length(tsvector)``: distinct lexeme count.
- ``tsp_delete``     — PG ``ts_delete(tsvector, lexeme|lexemes[])``,
  hole-preserving: deleted lexemes become NULL slots so every OTHER
  lexeme keeps its position and the recall vector stays aligned (PG
  compacts the vector instead — it has no alignment invariant to keep;
  documented deviation, and exactly how the reference's
  ts_filter/setweight pruning behaves inside TSP_QUERY_MATCHES,
  /root/reference/sql/tsp_query_matches.sql:42-54).
- ``tsp_concat``     — PG ``tsvector || tsvector``: the right operand's
  positions shift by the left's maximum position. In the dense array
  form the left's maximum position IS its array length, so plain array
  concatenation is bit-exactly PG's shift. Concat the tokens arrays with
  the same call to keep recall alignment.

``setweight`` / ``ts_filter(weights)`` are deliberately absent: this
engine stores no per-position weight labels — weighted ranking is the
fielded index's job (BM25F, plans/fielded.py), which generalizes PG's
four fixed labels to arbitrary query-time field weights.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["tsp_strip", "tsp_length", "tsp_delete", "tsp_concat"]


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def tsp_strip(lexemes: Column | str) -> Column:
    """Sorted distinct lexeme array, positions (and NULL holes) dropped —
    PG ``strip(tsvector)``."""
    lex = _col(lexemes)
    return F.array_sort(F.array_distinct(
        F.filter(lex, lambda x: x.isNotNull())))


def tsp_length(lexemes: Column | str) -> Column:
    """Distinct lexeme count — PG ``length(tsvector)``."""
    return F.size(tsp_strip(lexemes)).cast("int")


def tsp_delete(lexemes: Column | str, targets: Column | str | list) -> Column:
    """Remove lexeme(s) from the vector — PG ``ts_delete``. Removed
    occurrences become NULL slots (stopword holes), so remaining
    lexemes keep their positions and token-array alignment survives.
    `targets`: one lexeme, a list of lexemes, or an array column."""
    lex = _col(lexemes)
    if isinstance(targets, list):
        if not targets:
            # PG's ts_delete with an empty lexeme[] is the identity; an
            # explicit short-circuit instead of relying on Spark's
            # array_contains-against-array<null>() typing edge
            return lex
        tgt = F.array(*[F.lit(t) for t in targets])
    elif isinstance(targets, str):
        tgt = F.array(F.lit(targets))
    else:
        tgt = targets
    return F.transform(
        lex, lambda x: F.when(F.array_contains(tgt, x), F.lit(None)
                              .cast("string")).otherwise(x))


def tsp_concat(a: Column | str, b: Column | str) -> Column:
    """Positional concatenation — PG ``tsvector || tsvector``: the right
    vector's positions land after the left's maximum position (= the
    dense array's length). Apply to the lexemes AND tokens arrays with
    the same call so the pair stays aligned."""
    return F.concat(_col(a), _col(b))
