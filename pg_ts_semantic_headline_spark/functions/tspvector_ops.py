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

``setweight`` / ``ts_filter`` exist as a porting shim over a PARALLEL
weights array (same dense shape as the lexemes array, one 'A'..'D'
label or NULL hole per slot):

- ``tsp_setweight``  — PG ``setweight(tsvector, 'A' [, lexemes])``:
  builds/overwrites the weights array (optionally only on the listed
  lexemes, like PG's 3-arg form).
- ``tsp_filter``     — PG ``ts_filter(tsvector, '{a,b}')``: NULLs the
  slots whose label is not kept, hole-preserving like ``tsp_delete``.

The labels feed filtering/selection only. Weighted RANKING remains the
fielded index's job (BM25F, plans/fielded.py), which generalizes PG's
four fixed labels to arbitrary query-time field weights — see the
README section "Porting setweight from PG".
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["tsp_strip", "tsp_length", "tsp_delete", "tsp_concat",
           "tsp_setweight", "tsp_filter"]

#: PG's four weight labels; 'D' is PG's implicit default for unlabeled
#: positions (tsvector.h), which is why tsp_setweight(None-weights, ...)
#: treats missing labels as 'D'.
WEIGHT_LABELS = ("A", "B", "C", "D")


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


def tsp_setweight(lexemes: Column | str, label: str,
                  targets: list | None = None,
                  weights: Column | str | None = None) -> Column:
    """Weights array for the vector — PG ``setweight``. Returns a dense
    array<string> parallel to `lexemes`: `label` at every lexeme slot
    (2-arg PG form), or — when `targets` is given — only at slots whose
    lexeme is in `targets` (3-arg PG form), other slots keeping their
    existing label from `weights` (PG defaults unlabeled positions to
    'D'). Stopword holes stay NULL so the pair shares the alignment
    invariant. Labels compose with tsp_concat by concatenating the two
    weights arrays with the same call."""
    label = str(label).upper()
    if label not in WEIGHT_LABELS:
        raise ValueError(f"setweight label must be one of "
                         f"{WEIGHT_LABELS}, got {label!r}")
    lex = _col(lexemes)
    if targets is None:
        return F.transform(
            lex, lambda x: F.when(x.isNotNull(), F.lit(label))
                            .cast("string"))
    if weights is None:
        # 3-arg form over an unlabeled vector: untargeted slots get PG's
        # implicit default 'D'
        prev = F.transform(
            lex, lambda x: F.when(x.isNotNull(), F.lit("D")).cast("string"))
    else:
        prev = _col(weights)
    if not targets:
        # PG's setweight(tsv, 'A', '{}') labels nothing — keep existing
        # weights (computed-empty target lists are a normal pipeline
        # outcome, same contract as tsp_delete([])), normalizing unset
        # non-hole slots to 'D' exactly as a never-matching target would
        return F.zip_with(
            lex, prev,
            lambda x, w: F.when(x.isNull(), F.lit(None).cast("string"))
                          .otherwise(F.coalesce(w, F.lit("D"))))
    tgt = F.array(*[F.lit(t) for t in targets])
    return F.zip_with(
        lex, prev,
        lambda x, w: F.when(x.isNull(), F.lit(None).cast("string"))
                      .when(F.array_contains(tgt, x), F.lit(label))
                      .otherwise(F.coalesce(w, F.lit("D"))))


def tsp_filter(lexemes: Column | str, weights: Column | str,
               keep: list) -> Column:
    """Keep only the positions labeled with one of `keep` — PG
    ``ts_filter(tsvector, weights)``. Dropped slots become NULL holes
    (same deviation as tsp_delete: PG compacts, the dense form keeps
    alignment). Unlabeled slots count as 'D', matching PG's default."""
    if not keep:
        raise ValueError("ts_filter weight list is empty")
    labels = [str(w).upper() for w in keep]
    bad = [w for w in labels if w not in WEIGHT_LABELS]
    if bad:
        raise ValueError(f"unrecognized weight labels {bad}; "
                         f"expected letters from {WEIGHT_LABELS}")
    kp = F.array(*[F.lit(w) for w in labels])
    return F.zip_with(
        _col(lexemes), _col(weights),
        lambda x, w: F.when(
            F.array_contains(kp, F.coalesce(w, F.lit("D"))), x)
            .otherwise(F.lit(None).cast("string")))


def tsp_concat(a: Column | str, b: Column | str) -> Column:
    """Positional concatenation — PG ``tsvector || tsvector``: the right
    vector's positions land after the left's maximum position (= the
    dense array's length). Apply to the lexemes AND tokens arrays with
    the same call so the pair stays aligned."""
    return F.concat(_col(a), _col(b))
