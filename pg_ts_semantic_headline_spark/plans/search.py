"""BM25 top-k retrieval + phrase verification over the persisted index.

The reference has no scoring function (its "rank" is fragment match-count
density, /root/reference/sql/ts_fast_headline_cover_density.sql:96); BM25
top-k is the engine addition the north star requires. Scoring:

    idf(t)  = ln(1 + (N - df + 0.5)/(df + 0.5))      [always positive]
    s(d,q)  = Σ_t idf(t) · tf·(k1+1)/(tf + k1·(1-b+b·dl/avgdl))
    k1=1.2, b=0.75; ties broken by doc_id ascending — fully deterministic.

Two physical strategies, guaranteed rank-identical (tested):

- exact: scan postings rows for the query terms (bucket-pruned scan),
  broadcast-join the tiny idf map, hash-aggregate per doc, TakeOrdered k.
  Embarrassingly parallel; the Spark-natural default.
- blockmax: classic block-max WAND reshaped for a columnar engine.
  θ = kth best score over the densest blocks (a cheap partial pass, always a
  lower bound of the true kth score); a block (t, b) survives iff
  max_impact(t,b) + Σ_{t'≠t} ub(t') ≥ θ; candidates = docs in surviving
  blocks ∪ the θ pass docs, exactly re-scored. Any doc outside that set has
  true score ≤ max_t[blockmax(t,b_d) + Σ ub(t')] ≤ θ ≤ true kth, so the true
  top-k always survives. At 10^12-doc scale this skips decoding the long
  tail of blocks for stopword-ish code terms ("def", "import").

Phrase verification reuses the *same* pruned postings rows (positions ride
along), so a phrase query costs no second index scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .index_build import B, K1, Index
from .query_compiler import CompiledQuery, Node


def _score_col(avgdl: float):
    tf = F.col("tf").cast("double")
    dl = F.col("dl").cast("double")
    return (F.col("idf") * (tf * (K1 + 1))
            / (tf + K1 * (1 - B + B * dl / F.lit(float(avgdl)))))


def _pruned_postings(index: Index, terms: list[str]) -> DataFrame:
    """Postings rows for the query terms; bucket partition pruning applies
    because bucket = pmod(xxhash64(term), NB) folds to literals."""
    if not terms:
        return index.postings.where(F.lit(False))
    # bucket literals computed driver-side with a bit-identical Python
    # xxhash64 (no Spark job) -> parquet directory-partition pruning on the
    # scan
    from ..functions.xxhash import term_bucket
    buckets = sorted({term_bucket(t, index.n_buckets) for t in terms})
    return (index.postings
            .where(F.col("bucket").isin(buckets))
            .where(F.col("term").isin(terms)))


def _scored(index: Index, terms: list[str]) -> DataFrame:
    """(doc_id, term, tf, dl, positions, score) for query terms."""
    idf = index.terms.where(F.col("term").isin(terms)).select("term", "idf")
    rows = _pruned_postings(index, terms)
    return (rows.join(F.broadcast(idf), on="term")
                .withColumn("score", _score_col(index.avgdl)))


def bm25_topk(
    index: Index,
    query: CompiledQuery | list[str],
    k: int = 10,
    mode: str = "exact",
    candidate_docs: DataFrame | None = None,
) -> DataFrame:
    """Top-k (doc_id, score), deterministic order (score desc, doc_id asc)."""
    terms = list(query.lexemes) if isinstance(query, CompiledQuery) else list(query)
    if not terms:
        spark = index.postings.sparkSession
        return spark.createDataFrame([], "doc_id long, score double")

    if mode == "blockmax" and index.packed is not None:
        return _bm25_topk_blockmax(index, terms, k, candidate_docs)
    if mode == "blockmax":
        raise ValueError("blockmax mode requires a packed index (build_packed=True)")

    scored = _scored(index, terms)
    if candidate_docs is not None:
        scored = scored.join(candidate_docs.select("doc_id"), on="doc_id",
                             how="left_semi")
    return (scored.groupBy("doc_id")
            .agg(F.sum("score").alias("score"))
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k))


def _packed_meta(index: Index, terms: list[str]) -> DataFrame:
    """Bucket-pruned block metadata scan for the query terms (tiny: three
    columns, parquet column pruning drops the payload). max_tf_norm is the
    idf-free bound stored at build time; true block-max impact =
    idf(term) · max_tf_norm, computed here where idf is a tiny lookup."""
    from ..functions.xxhash import term_bucket
    buckets = sorted({term_bucket(t, index.n_buckets) for t in terms})
    return (index.packed
            .where(F.col("bucket").isin(buckets))
            .where(F.col("term").isin(terms))
            .select("term", "block_id", "max_tf_norm"))

def _bm25_topk_blockmax(index: Index, terms: list[str], k: int,
                        candidate_docs: DataFrame | None) -> DataFrame:
    """Three Spark jobs total: (A) per-term upper bounds, (B) θ seed pass,
    (C) surviving-block rescore. Everything else stays driver-side — per-job
    fixed cost dominates interactive query latency, so the job count IS the
    latency budget."""
    meta = _packed_meta(index, terms)
    idf_df = (index.terms.where(F.col("term").isin(terms))
              .select("term", "idf"))
    # job A (tiny): per-term global upper bounds ub = idf · max(max_tf_norm)
    ub_rows = (meta.groupBy("term")
               .agg(F.max("max_tf_norm").alias("ubn"))
               .join(idf_df, on="term")
               .select("term", (F.col("idf") * F.col("ubn")).alias("ub"),
                       "idf")
               .collect())
    ub = {r["term"]: float(r["ub"]) for r in ub_rows}
    idf_by_term = {r["term"]: float(r["idf"]) for r in ub_rows}
    if not ub:
        spark = index.postings.sparkSession
        return spark.createDataFrame([], "doc_id long, score double")
    total_ub = sum(ub.values())

    scored = _scored(index, terms)
    if candidate_docs is not None:
        scored = scored.join(candidate_docs.select("doc_id"), on="doc_id",
                             how="left_semi")
    scored = scored.withColumn(
        "block_id", F.floor(F.col("doc_id") / index.block_span)).cache()

    # job B: θ pass — exact partial scores over each term's densest blocks
    # per-term ordering by max_tf_norm == ordering by impact (idf is a
    # per-term constant)
    w = Window.partitionBy("term").orderBy(F.desc("max_tf_norm"), "block_id")
    seed_blocks = (meta.withColumn("_rn", F.row_number().over(w))
                   .where(F.col("_rn") <= max(1, (k + index.block_span - 1)
                                              // index.block_span + 1))
                   .select("term", "block_id"))
    seed_scores = (scored.join(F.broadcast(seed_blocks), ["term", "block_id"],
                               "left_semi")
                   .groupBy("doc_id").agg(F.sum("score").alias("score"))
                   .orderBy(F.desc("score"), F.asc("doc_id")).limit(k))
    seed_rows = seed_scores.collect()
    theta = float(seed_rows[-1]["score"]) if len(seed_rows) == k else 0.0

    # job C: survive iff blockmax(t,b) + Σ_{t'≠t} ub(t') ≥ θ, then exact
    # rescore of every doc in a surviving block
    spark = index.postings.sparkSession
    ub_df = spark.createDataFrame(
        [(t, ub[t], idf_by_term[t]) for t in ub],
        "term string, ub double, idf double")
    surviving = (meta.join(F.broadcast(ub_df), on="term")
                 .where(F.col("idf") * F.col("max_tf_norm")
                        + F.lit(total_ub) - F.col("ub") >= F.lit(theta))
                 .select("term", "block_id").distinct())

    cands = (scored.join(F.broadcast(surviving), ["term", "block_id"],
                         "left_semi")
             .select("doc_id").distinct())
    out = (scored.join(cands, on="doc_id", how="left_semi")
           .groupBy("doc_id").agg(F.sum("score").alias("score"))
           .orderBy(F.desc("score"), F.asc("doc_id"))
           .limit(k))
    rows = out.collect()
    scored.unpersist()
    return spark.createDataFrame(rows, "doc_id long, score double")


def phrase_match_docs(index: Index, query: CompiledQuery) -> DataFrame:
    """(doc_id, phrase_id, n_matches) via positional intersection on the
    pruned postings — the indexed form of the matches plan."""
    spark = index.postings.sparkSession
    if not query.phrases:
        return spark.createDataFrame([], "doc_id long, phrase_id int, n_matches long")
    from .matches import phrase_table_df
    qdf = phrase_table_df(spark, query)
    rows = _pruned_postings(index, list(query.lexemes))
    hay = rows.select("doc_id", "term",
                      F.explode("positions").alias("pos"))
    joined = hay.join(F.broadcast(qdf), hay.term == qdf.q_lexeme)
    aligned = joined.withColumn("range_start",
                                F.col("pos") - F.col("q_pos") + F.lit(1))
    return (aligned
            .groupBy("doc_id", "phrase_id", "range_start")
            .agg(F.count("*").alias("n_hits"),
                 F.min("pos").alias("first"), F.max("pos").alias("last"),
                 F.first("q_len").alias("q_len"), F.first("q_span").alias("q_span"))
            .where((F.col("n_hits") == F.col("q_len"))
                   & (F.col("last") - F.col("first") == F.col("q_span")))
            .groupBy("doc_id", "phrase_id")
            .agg(F.count("*").alias("n_matches")))


def _all_phrases(node: Node | None) -> list:
    """Every phrase in the tree, including negated ones (the boolean filter
    needs match sets for NOT branches too, unlike highlighting)."""
    if node is None:
        return []
    if node.op == "phrase":
        return [node.phrase]
    out = []
    for c in node.children:
        out.extend(_all_phrases(c))
    return out


def matching_docs(index: Index, query: CompiledQuery) -> DataFrame:
    """Boolean @@ filter: docs satisfying the query's AND/OR/NOT tree, with
    phrase nodes requiring exact positional adjacency."""
    from dataclasses import replace

    spark = index.postings.sparkSession
    phrases, seen = [], set()
    for ph in _all_phrases(query.root):
        if ph.items not in seen:
            seen.add(ph.items)
            phrases.append(ph)
    full_query = replace(query, phrases=tuple(phrases))
    phrase_docs = phrase_match_docs(index, full_query)
    flags = (phrase_docs.groupBy("doc_id")
             .agg(F.collect_set("phrase_id").alias("ok_phrases")))

    phrase_ids = {ph.items: pid for pid, ph in enumerate(phrases)}

    def to_expr(node: Node | None):
        if node is None:
            return F.lit(False)
        if node.op == "phrase":
            pid = phrase_ids[node.phrase.items]
            return F.array_contains(F.col("ok_phrases"), pid)
        if node.op == "not":
            return ~to_expr(node.children[0])
        sub = [to_expr(c) for c in node.children]
        out = sub[0]
        for s in sub[1:]:
            out = (out & s) if node.op == "and" else (out | s)
        return out

    has_negation = "not" in _ops(query.root)
    if has_negation:
        # NOT semantics need the full doc universe, not just phrase hitters
        universe = index.tokens.select("doc_id")
        flags = universe.join(flags, on="doc_id", how="left").withColumn(
            "ok_phrases", F.coalesce(F.col("ok_phrases"), F.array().cast("array<int>")))
    return flags.where(to_expr(query.root)).select("doc_id")


def _ops(node: Node | None) -> set[str]:
    if node is None:
        return set()
    out = {node.op}
    for c in node.children:
        out |= _ops(c)
    return out


def search(
    index: Index,
    query: CompiledQuery,
    k: int = 10,
    mode: str = "exact",
    enforce_boolean: bool = True,
) -> DataFrame:
    """Full retrieval: boolean/phrase filter → BM25 top-k.

    Returns (doc_id, score) in deterministic rank order.
    """
    cands = matching_docs(index, query) if enforce_boolean else None
    return bm25_topk(index, query, k=k, mode=mode, candidate_docs=cands)


def search_with_headlines(
    index: Index,
    query: CompiledQuery,
    k: int = 10,
    options: str = "",
    mode: str = "exact",
) -> DataFrame:
    """Top-k + whole-phrase highlighted headline per hit (the fast path over
    the persisted index: position lookup + recall-array slicing only)."""
    from .headline import ts_fast_headline

    hits = search(index, query, k=k, mode=mode)
    winners = hits.select("doc_id")
    docs = (index.tokens.join(winners, on="doc_id", how="left_semi")
            .select("doc_id", "tokens"))
    # haystack rows come straight from the already-pruned postings: the
    # precomputed-TSV trick as a persisted position-lookup joined to content
    hay = (_pruned_postings(index, list(query.lexemes))
           .join(winners, on="doc_id", how="left_semi")
           .select("doc_id", F.col("term").alias("lex"),
                   F.explode("positions").alias("pos"))
           .select("doc_id", "pos", "lex"))
    headlines = ts_fast_headline(docs, query, options, hay=hay)
    return (hits.join(headlines, on="doc_id", how="left")
            .orderBy(F.desc("score"), F.asc("doc_id")))
