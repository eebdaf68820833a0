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
- blockmax: classic block-max WAND reshaped for a columnar engine, scoring
  from the PACKED table only — row postings are never touched. Large
  segments run three lean actions:

  (A) meta: one bounded collect of the SKINNY block metadata
      (term, block_id, max_tf_norm — the payload column is never
      projected, so the columnar scan skips it) plus the idf rows; the
      driver selects the top-S seed blocks per term and the per-block
      bound sums S(b).
  (B) seed: point-lookup decode of the seed payloads (block_id literals →
      row-group pruning; a few KB), scored driver-side with the
      vectorized numpy varint kernel (scoring prefix only — positions are
      never decoded) → θ = kth best partial score.
  (C) prune + rescore: blocks are doc-ALIGNED across terms (block_id =
      doc_id // span for every term), so the survival test is the tight
      per-block SUM S(b) = Σ_t idf(t)·max_tf_norm(t, b) ≥ θ — far
      stronger than classic WAND's global-upper-bound test: a block where
      only a low-idf common term occurs is pruned even though the rare
      term's global bound is huge. ALL query terms' payloads at surviving
      block ids are decoded by an Arrow mapInPandas kernel, scored
      exactly, hash-aggregated per doc, TakeOrdered k.

  Correctness: every posting of doc d lives in block b_d = d // span for
  EVERY term, so score(d) = Σ_t idf_t·tf_norm(t, d) ≤ S(b_d). If
  score(d) ≥ θ then b_d survives and d is scored EXACTLY in (C). θ is a
  lower bound of the true kth score (seed partial scores under-estimate k
  docs' true scores), so the true top-k always survives. At 10^12-doc
  scale (B) skips decoding the long tail of blocks for stopword-ish code
  terms ("def", "import"); the payload scan is compressed varints, a
  fraction of the row-postings bytes.

Phrase verification reuses the *same* pruned postings rows (positions ride
along), so a phrase query costs no second index scan.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .index_build import B, K1, Index
from .query_compiler import CompiledQuery, Node

_BOUNDED_COLLECT_LOCK = threading.Lock()


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


def _idf_lookup(index: Index, terms: list[str],
                cols: tuple = ("term", "idf")) -> DataFrame:
    """Dictionary columns for the query terms; the terms dictionary is
    bucket-partitioned on disk, so the same driver-side bucket routing that
    prunes postings prunes the dictionary scan."""
    from ..functions.xxhash import term_bucket
    buckets = sorted({term_bucket(t, index.n_buckets) for t in terms})
    return (index.terms
            .where(F.col("bucket").isin(buckets))
            .where(F.col("term").isin(terms))
            .select(*cols))


def explain_score(
    index: Index,
    terms: list[str],
    doc_ids: list[int] | None = None,
) -> DataFrame:
    """Per-term BM25 score breakdown — the "why did this document rank
    here" debugging view (Elasticsearch `_explain`). One row per
    (doc_id, term) the doc matches: the raw integers the formula saw
    (tf, dl, df), the idf, this term's score contribution, and the
    doc's total. Same pruned-scan + broadcast-idf plan as `bm25_topk`,
    plus one doc_id-partitioned window for the total; `doc_ids` narrows
    the scan to the documents under investigation (pass the top-k ids —
    explaining a whole corpus is a smell, not a plan).

    Returns (doc_id, term, tf, dl, df, idf, term_score, doc_score),
    deterministic order left to the caller."""
    from pyspark.sql import Window

    ts = sorted(set(terms))
    if not ts:
        return index.postings.sparkSession.createDataFrame(
            [], "doc_id long, term string, tf int, dl int, df long, "
                "idf double, term_score double, doc_score double")
    rows = _pruned_postings(index, ts)
    if doc_ids is not None:
        rows = rows.where(F.col("doc_id").isin([int(d) for d in doc_ids]))
    out = (rows.join(F.broadcast(_idf_lookup(index, ts,
                                             cols=("term", "idf", "df"))),
                     on="term")
           .withColumn("term_score", _score_col(index.avgdl))
           .withColumn("doc_score",
                       F.sum("term_score").over(
                           Window.partitionBy("doc_id"))))
    return out.select("doc_id", "term", "tf", "dl", "df", "idf",
                      "term_score", "doc_score")


def _scored(index: Index, terms: list[str]) -> DataFrame:
    """(doc_id, term, tf, dl, positions, score) for query terms."""
    rows = _pruned_postings(index, terms)
    return (rows.join(F.broadcast(_idf_lookup(index, terms)), on="term")
                .withColumn("score", _score_col(index.avgdl)))


def choose_bm25_mode(index: Index, terms: list[str],
                     skew_ratio: float = 100.0,
                     common_frac: float = 0.05) -> str:
    """Cost-based physical-strategy pick for `bm25_topk(mode="auto")`.

    The two strategies are rank-identical; what differs is bytes
    decoded. Measured on this engine (BENCH/BASELINE.md §2c-2d): the
    lean row scan wins whenever term selectivities are similar (block-max
    bounds are near-equal, θ prunes nothing, and the seed pass is pure
    overhead), while per-block-sum pruning wins ~20× in decoded bytes
    exactly when the query mixes a COMMON term (many blocks) with a RARE
    one (few blocks survive θ). So: pick blockmax iff a packed store
    exists AND the widest df is both a real chunk of the corpus
    (≥ common_frac·n_docs) and ≥ skew_ratio× the narrowest df. The
    decision costs one bucket-pruned dictionary lookup (≤ |terms| rows
    to the driver) — the same rows the scoring join reads anyway."""
    ts = sorted(set(terms))
    if index.packed is None or len(ts) < 2:
        return "exact"
    dfs = [int(r["df"]) for r in
           _idf_lookup(index, ts, cols=("term", "df")).collect()]
    if len(dfs) < 2:
        return "exact"
    mx, mn = max(dfs), min(dfs)
    if mx >= common_frac * index.n_docs and mx >= skew_ratio * max(mn, 1):
        return "blockmax"
    return "exact"


def bm25_topk_federated(
    indexes: list[Index],
    query: CompiledQuery | list[str],
    k: int = 10,
    candidate_docs: DataFrame | None = None,
) -> DataFrame:
    """BM25 top-k over MANY persisted indexes as if they were one — the
    sharded layout a 10^12-file corpus actually runs (an index per
    source / time bucket / repo shard, built and compacted
    independently), queried with GLOBAL statistics:

        df_g(t) = Σ_shard df,   N_g = Σ n_docs,
        avgdl_g = Σ (n_docs · avgdl) / N_g

    so scores — and therefore ranks — are IDENTICAL to a single
    monolithic index over the union (tested; Elasticsearch calls this
    dfs_query_then_fetch, its non-default mode, because per-shard local
    idf is cheaper but rank-unstable across shardings).

    Cost: one bounded dictionary lookup per shard (≤ |terms| rows each)
    to assemble the global constants driver-side, then ONE union plan
    over the shards' bucket-pruned postings scans — per-shard pruning
    survives the union, and the per-doc aggregation is a single hash
    agg (doc_ids must be globally unique across shards, the same
    contract the shards' builder already assumes)."""
    if not indexes:
        raise ValueError("need at least one index")
    if isinstance(query, CompiledQuery):
        # expand against the FIRST shard's dictionary (shards of one
        # corpus share an analyzer; a term unknown to a shard scores 0
        # there, same as any federated term)
        query = expand_query_prefixes(indexes[0], query)
    terms = sorted(set(
        query.lexemes if isinstance(query, CompiledQuery) else query))
    spark = indexes[0].postings.sparkSession
    if not terms:
        return spark.createDataFrame([], "doc_id long, score double")

    n_g = sum(ix.n_docs for ix in indexes)
    total_dl = sum(ix.n_docs * ix.avgdl for ix in indexes)
    avgdl_g = total_dl / max(n_g, 1)
    df_g: dict = {}
    for ix in indexes:
        for r in _idf_lookup(ix, terms, cols=("term", "df")).collect():
            df_g[r["term"]] = df_g.get(r["term"], 0) + int(r["df"])
    if not df_g:
        return spark.createDataFrame([], "doc_id long, score double")
    from .index_build import idf_expr
    idf_rows = spark.createDataFrame(
        [(t, d) for t, d in sorted(df_g.items())], "term string, df long"
    ).select("term", idf_expr(F.col("df"), n_g).alias("idf"))

    parts = [_pruned_postings(ix, terms).select("term", "doc_id", "tf", "dl")
             for ix in indexes]
    rows = parts[0]
    for p in parts[1:]:
        rows = rows.unionByName(p)
    if candidate_docs is not None:
        rows = rows.join(candidate_docs.select("doc_id"), on="doc_id",
                         how="left_semi")
    scored = (rows.join(F.broadcast(idf_rows), on="term")
              .withColumn("score", _score_col(avgdl_g)))
    return (scored.groupBy("doc_id")
            .agg(F.sum("score").alias("score"))
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k))


def search_federated(
    indexes: list[Index],
    query: CompiledQuery,
    k: int = 10,
) -> DataFrame:
    """`search` over shards: boolean/phrase filtering runs per shard
    (each shard's `matching_docs` keeps its anchored, bucket-pruned
    plan; shards hold disjoint doc_ids so the union IS the global match
    set), then `bm25_topk_federated` ranks the union with global
    statistics — rank-identical to `search` on a monolithic index."""
    if not indexes:
        raise ValueError("need at least one index")
    cands = matching_docs(indexes[0], query)
    for ix in indexes[1:]:
        cands = cands.unionByName(matching_docs(ix, query))
    return bm25_topk_federated(indexes, query, k=k, candidate_docs=cands)


def plan_search(index: Index, query: CompiledQuery | list[str]) -> DataFrame:
    """EXPLAIN for a retrieval: one row per query term with the numbers
    the planner sees — df, idf, corpus fraction, the bucket its postings
    scan prunes to, whether the term exists at all — plus the auto-mode
    decision and packed-store availability repeated on every row. Read
    this before pointing an expensive query at a 10^12-doc index; cost
    is one bucket-pruned dictionary lookup, nothing else."""
    from ..functions.xxhash import term_bucket

    query = expand_query_prefixes(index, query) \
        if isinstance(query, CompiledQuery) else query
    spark = index.postings.sparkSession
    schema = ("term string, bucket int, df long, idf double, "
              "corpus_frac double, in_dictionary boolean, "
              "chosen_mode string, packed boolean")
    terms = sorted(set(
        query.lexemes if isinstance(query, CompiledQuery) else query))
    if not terms:
        return spark.createDataFrame([], schema)
    known = {r["term"]: (int(r["df"]), float(r["idf"])) for r in
             _idf_lookup(index, terms, cols=("term", "df", "idf")).collect()}
    mode = choose_bm25_mode(index, terms)
    rows = []
    for t in terms:
        df_, idf_ = known.get(t, (0, None))
        rows.append((t, term_bucket(t, index.n_buckets), df_, idf_,
                     df_ / max(index.n_docs, 1), t in known, mode,
                     index.packed is not None))
    return spark.createDataFrame(rows, schema)


def bm25_topk(
    index: Index,
    query: CompiledQuery | list[str],
    k: int = 10,
    mode: str = "exact",
    candidate_docs: DataFrame | None = None,
) -> DataFrame:
    """Top-k (doc_id, score), deterministic order (score desc, doc_id asc).
    `mode`: "exact", "blockmax", or "auto" (cost-based pick between the
    two rank-identical strategies — see choose_bm25_mode)."""
    if isinstance(query, CompiledQuery):
        query = expand_query_prefixes(index, query)
    terms = list(query.lexemes) if isinstance(query, CompiledQuery) else list(query)
    if not terms:
        spark = index.postings.sparkSession
        return spark.createDataFrame([], "doc_id long, score double")

    if mode == "auto":
        mode = choose_bm25_mode(index, terms)

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


def bm25_topk_weighted(
    index: Index,
    weights: dict[str, float],
    k: int = 10,
    min_should_match: int = 1,
    candidate_docs: DataFrame | None = None,
) -> DataFrame:
    """ES-style weighted retrieval: per-term query boosts plus
    `minimum_should_match` over the OR of the query terms —

        score(d) = Σ_t boost_t · bm25_t(d)  over d's matched terms,
        keep d iff |{t : tf(d, t) > 0}| ≥ min_should_match.

    Exactly bm25_topk's physical plan (one bucket-pruned postings scan,
    broadcast idf) plus a broadcast (term, boost) join and a
    count-distinct gate before the top-k — boosts and the match-count
    filter are plan algebra, no extra scan. min_should_match counts
    DISTINCT matched terms (ES semantics); boost 0 keeps a term as a
    match-count voter that contributes no score. Returns
    (doc_id, score, n_matched), ordered (score desc, doc_id asc)."""
    if min_should_match < 1:
        raise ValueError("min_should_match must be >= 1")
    bad = {t: b for t, b in weights.items() if float(b) < 0.0}
    if bad:
        raise ValueError(f"negative boosts: {bad}")
    terms = sorted(weights)
    spark = index.postings.sparkSession
    out_schema = "doc_id long, score double, n_matched int"
    if not terms or min_should_match > len(terms):
        return spark.createDataFrame([], out_schema)
    scored = _scored(index, terms)
    if candidate_docs is not None:
        scored = scored.join(candidate_docs.select("doc_id"), on="doc_id",
                             how="left_semi")
    wdf = F.broadcast(spark.createDataFrame(
        [(t, float(b)) for t, b in sorted(weights.items())],
        "term string, _boost double"))
    per_doc = (scored.join(wdf, on="term")
               .groupBy("doc_id")
               .agg(F.sum(F.col("score") * F.col("_boost")).alias("score"),
                    F.count_distinct("term").cast("int")
                    .alias("n_matched")))
    return (per_doc.where(F.col("n_matched") >= int(min_should_match))
            .select("doc_id", "score", "n_matched")
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k))


def bm25_topk_batch(
    index: Index,
    queries: dict[str, CompiledQuery | list[str]],
    k: int = 10,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Top-k for MANY queries in ONE plan — the offline-retrieval shape
    (eval sets, hard-negative mining, distillation): a training pipeline
    scoring 10k queries must not launch 10k driver actions.

    Plan: the union of all query terms prunes ONE postings scan (bucket
    literals + term pushdown); a tiny broadcast (query_id, term) table fans
    each posting row out to exactly the queries containing its term; one
    hash aggregation per (query_id, doc_id); one window per query for the
    top-k cut. Scan cost is paid once for the whole workload instead of
    once per query, and every per-query result is rank-identical to
    `bm25_topk(mode="exact")` (tested). Ties: score desc, doc_id asc.

    `candidates`, when given, is a (query_id, doc_id) frame restricting
    each query's scored set (the boolean-match semi-join `search_batch`
    feeds in); rank is assigned AFTER the restriction.

    Returns (query_id, doc_id, score, rank) with rank 1..k."""
    from pyspark.sql import Window

    qterms = {
        qid: sorted(set(q.lexemes if isinstance(q, CompiledQuery) else q))
        for qid, q in queries.items()}
    pairs = [(qid, t) for qid, ts in qterms.items() for t in ts]
    spark = index.postings.sparkSession
    if not pairs:
        return spark.createDataFrame(
            [], "query_id string, doc_id long, score double, rank int")
    all_terms = sorted({t for _, t in pairs})
    qdf = spark.createDataFrame(pairs, "query_id string, term string")
    scored = (_pruned_postings(index, all_terms)
              .join(F.broadcast(_idf_lookup(index, all_terms)), on="term")
              .withColumn("score", _score_col(index.avgdl))
              .join(F.broadcast(qdf), on="term"))
    agg = (scored.groupBy("query_id", "doc_id")
           .agg(F.sum("score").alias("score")))
    if candidates is not None:
        agg = agg.join(candidates.select("query_id", "doc_id"),
                       on=["query_id", "doc_id"], how="left_semi")
    w = Window.partitionBy("query_id").orderBy(F.desc("score"),
                                               F.asc("doc_id"))
    return (agg.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "doc_id", "score", "rank"))


def _pruned_packed(index: Index, terms: list[str]) -> DataFrame:
    """Packed-block rows for the query terms (driver-side bucket routing →
    parquet directory pruning, same trick as `_pruned_postings`). Payload
    bytes are only materialized by plans that project the column."""
    from ..functions.xxhash import term_bucket
    buckets = sorted({term_bucket(t, index.n_buckets) for t in terms})
    return (index.packed
            .where(F.col("bucket").isin(buckets))
            .where(F.col("term").isin(terms)))


def _bm25_part_score(tfs, dls, idf: float, avgdl: float):
    """Vectorized per-doc partial score for one term (numpy arrays in/out)."""
    tfs = tfs.astype(float)
    dls = dls.astype(float)
    return idf * tfs * (K1 + 1) / (tfs + K1 * (1 - B + B * dls / avgdl))


def _score_blocks_col_kernel(avgdl: float):
    """mapInPandas kernel: decode packed scoring prefixes into
    (doc_id, part) rows with idf arriving as a COLUMN (pre-joined onto the
    handful of packed rows — far cheaper than joining the exploded per-doc
    stream). Needs no driver-side dictionary lookup: used by the
    single-action small-segment and candidate-filtered paths."""
    import numpy as np
    import pandas as pd

    from .packing import decode_block_scores

    def gen(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            outs_d, outs_s = [], []
            for payload, base, idf in zip(pdf["payload"], pdf["base_doc"],
                                          pdf["idf"]):
                doc_ids, tfs, dls = decode_block_scores(
                    bytes(payload), int(base))
                outs_d.append(doc_ids)
                outs_s.append(_bm25_part_score(tfs, dls, float(idf), avgdl))
            yield pd.DataFrame({"doc_id": np.concatenate(outs_d),
                                "part": np.concatenate(outs_s)})

    return gen


def _score_blocks_kernel(idf_map: dict, avgdl: float):
    """mapInPandas kernel: decode packed payload scoring prefixes (numpy
    varint kernel — positions never decoded) and emit exact per-(term, doc)
    partial BM25 scores. idf is a tiny per-query dict riding the closure,
    so the executor side needs no dictionary join."""
    import numpy as np
    import pandas as pd

    from .packing import decode_block_scores

    def gen(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            outs_d, outs_s = [], []
            idfs = pdf["term"].map(idf_map)
            for payload, base, idf in zip(pdf["payload"], pdf["base_doc"],
                                          idfs):
                doc_ids, tfs, dls = decode_block_scores(
                    bytes(payload), int(base))
                outs_d.append(doc_ids)
                outs_s.append(_bm25_part_score(tfs, dls, float(idf), avgdl))
            yield pd.DataFrame({"doc_id": np.concatenate(outs_d),
                                "part": np.concatenate(outs_s)})

    return gen


# Driver-side meta fast path bound: below this many (term, block) rows the
# whole survival computation runs on collected metadata (one bounded
# collect, zero joins); above it the survival filter stays distributed.
META_COLLECT_LIMIT = 20_000

# When len(terms)·ceil(n_docs/block_span) — the maximum possible block
# count for the query — is at or below this, pruning cannot beat simply
# decoding every block in ONE action (per-action fixed cost exceeds the
# decode saved). Known driver-side with zero jobs, so small segments take
# the single-action path and big segments take the 2-action WAND path.
SMALL_SEGMENT_BLOCKS = 20_000
# candidate-filtered queries: max candidate doc ids the direct
# block-targeted plan will collect (a bounded ~8-byte-per-doc driver
# transfer) before falling back to θ-seeded pruning; negative disables
FILTERED_DIRECT_DOC_CAP = 16_384


def _bounded_collect(df: DataFrame, limit: int) -> list:
    """collect() of `df.limit(limit)` in ONE job round.

    Spark's executeTake runs limit-collects incrementally — 1 partition,
    then 4×, then 16×… — each round a separate job. When the rows are
    spread thin across many partitions (761 candidate ids over 64
    partitions, or 25k skinny meta rows), that's 4-6 sequential job
    round-trips of pure scheduling latency on an interactive query path.
    Raising spark.sql.limit.initialNumPartitions for just this collect
    makes round one scan every partition: same bounded result, one job.

    The setting is session-global, so set/restore is serialized under a
    module lock: without it two threads sharing the SparkSession could
    each read the other's inflated value as "old" and restore 1000000
    permanently. (An unrelated query running concurrently in the same
    session still executes under the inflated setting for the duration
    of this collect — a widened first limit round, never a wrong result.)
    """
    spark = df.sparkSession
    key = "spark.sql.limit.initialNumPartitions"
    with _BOUNDED_COLLECT_LOCK:
        old = spark.conf.get(key, None)
        spark.conf.set(key, "1000000")
        try:
            return df.limit(limit).collect()
        finally:
            if old is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, old)


def _topk_from_packed(index: Index, need: DataFrame, terms: list[str],
                      k: int, candidate_docs: DataFrame | None = None,
                      idf_map: dict | None = None) -> DataFrame:
    """Decode `need`'s payloads, score, aggregate per doc, TakeOrdered k.
    With idf_map (known driver-side, e.g. free from the seed collect) the
    kernel bakes idf into partial scores; without it, idf joins in-plan
    (broadcast of the bucket-pruned dictionary) — no extra action."""
    if idf_map is not None:
        decoded = (need.select("term", "base_doc", "payload")
                   .mapInPandas(_score_blocks_kernel(idf_map, index.avgdl),
                                schema="doc_id long, part double"))
    else:
        decoded = (need.join(F.broadcast(_idf_lookup(index, terms)),
                             on="term")
                   .select("base_doc", "payload", "idf")
                   .mapInPandas(_score_blocks_col_kernel(index.avgdl),
                                schema="doc_id long, part double"))
    if candidate_docs is not None:
        decoded = decoded.join(candidate_docs.select("doc_id"),
                               on="doc_id", how="left_semi")
    return (decoded.groupBy("doc_id")
            .agg(F.sum("part").alias("score"))
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k))


def _bm25_topk_blockmax(index: Index, terms: list[str], k: int,
                        candidate_docs: DataFrame | None,
                        seed_blocks_per_term: int = 4) -> DataFrame:
    """Scale-adaptive (see module docstring). Small segments: ONE action,
    decode-everything. Large segments: THREE lean actions — skinny-meta
    collect, point-lookup seed decode (→ θ), pruned rescore. A boolean/
    phrase prefilter picks between two plans by the filter's selectivity:
    a SELECTIVE filter's own block ids bound the decode set exactly
    (blocks are doc-aligned, so every packed row touching a candidate doc
    lives at a candidate block id) — decode just those blocks, no θ
    needed, scoring stays exact. A NON-selective filter (e.g. a negation
    keeping most docs) falls back to θ seeding: seeds are scored in-plan
    semi-joined to the candidates (the kth candidate-intersected seed
    partial is a valid filtered θ), and the unfiltered per-block bounds
    remain upper bounds for filtered docs, so the same survival pruning
    applies. Everything else stays driver-side — per-action fixed cost
    dominates interactive query latency, so the action count IS the
    latency budget."""
    from .packing import decode_block_scores

    spark = index.postings.sparkSession
    packed = _pruned_packed(index, terms)
    theta = 0.0
    idf_map: dict = {}
    surviving_ids: list | None = None
    # stored max_tf_norm bounds were computed with avgdl_packed; if merges
    # have raised avgdl since, true norms can exceed them by at most
    # avgdl/avgdl_packed (sup over tf, dl of the norm ratio) — scaling
    # keeps every bound a valid upper bound. Scoring itself always uses
    # the exact per-doc (tf, dl) with the CURRENT avgdl.
    bound_scale = (max(1.0, index.avgdl / index.avgdl_packed)
                   if index.avgdl_packed else 1.0)

    cand = (candidate_docs.select("doc_id")
            if candidate_docs is not None else None)
    max_blocks = len(terms) * (
        (index.n_docs + index.block_span - 1) // index.block_span)
    if max_blocks <= SMALL_SEGMENT_BLOCKS:
        # pruning cannot pay here: one action decodes everything (with a
        # candidate semi-join when a boolean/phrase prefilter applies)
        return _topk_from_packed(index, packed, terms, k, cand)
    if cand is not None:
        # selective-filter fast path: collect the candidate doc ids
        # themselves under a bounded limit (ONE evaluation of the
        # boolean/phrase subplan, nothing persisted). Within budget →
        # decode ONLY the candidates' blocks (exact scores for every
        # candidate by doc-aligned block construction: doc d's packed row
        # for ANY term lives at block ⌊d/span⌋), semi-join the collected
        # ids, aggregate — a fully-literal point-lookup action with no
        # meta collect and no θ. Overflow → the filter keeps too many
        # docs for block-targeting to pay; persist the candidates and
        # fall through to θ-seeded pruning (the ContextCleaner unpersists
        # when the result plan is released).
        cap = FILTERED_DIRECT_DOC_CAP
        doc_ids = ([int(r["doc_id"])
                    for r in _bounded_collect(cand, cap + 1)]
                   if cap >= 0 else [])
        if cap >= 0 and len(doc_ids) <= cap:
            cand_lit = spark.createDataFrame(
                [(d,) for d in sorted(doc_ids)], "doc_id long")
            blocks = sorted({d // index.block_span for d in doc_ids})
            if len(blocks) <= 64:
                # point-lookup: literal block ids reach the parquet scan
                # as pushed filters → row-group pruning; only the
                # candidates' payload bytes are ever read
                need = packed.where(F.col("block_id").isin(blocks))
                return _topk_from_packed(index, need, terms, k,
                                         candidate_docs=F.broadcast(cand_lit))
            # candidates scattered across too many blocks for a literal
            # point lookup (isin planning cost cliffs, and a semi-join
            # can't push block ids into the parquet scan, so every
            # payload byte would be read to decode a few): the skinny
            # row-postings projection (no positions, no payloads) is the
            # cheaper scoring source — one JVM-side action
            scored = (_scored(index, terms)
                      .join(F.broadcast(cand_lit), on="doc_id",
                            how="left_semi"))
            return (scored.groupBy("doc_id")
                    .agg(F.sum("score").alias("score"))
                    .orderBy(F.desc("score"), F.asc("doc_id"))
                    .limit(k))
        cand = cand.persist()

    # action A: ONE bounded collect of (a) the SKINNY block metadata for
    # the query terms — the payload column is never projected, so the
    # columnar scan reads only (term, block_id, max_tf_norm) — and (b)
    # the idf dictionary rows, appended via unionByName so no
    # broadcast-exchange sub-job runs. The LIMIT is the overflow guard:
    # hot terms whose meta exceeds it fall back to the distributed
    # survival filter below.
    meta = (packed
            .select("term", "block_id", "max_tf_norm")
            .limit(META_COLLECT_LIMIT))
    rows = meta.unionByName(
        _idf_lookup(index, terms)
        .withColumn("block_id", F.lit(None).cast("long")),
        allowMissingColumns=True).collect()
    idf_map = {r["term"]: float(r["idf"]) for r in rows
               if r["block_id"] is None}
    meta_rows = [r for r in rows if r["block_id"] is not None]
    if not meta_rows or not idf_map:
        return spark.createDataFrame([], "doc_id long, score double")
    overflowed = len(meta_rows) >= META_COLLECT_LIMIT

    # driver-side seed selection: top-S blocks per term by impact
    # (ordering by max_tf_norm == ordering by impact — idf is a per-term
    # constant) plus the per-block bound sums S(b)
    block_sum: dict = {}
    per_term: dict = {}
    for r in meta_rows:
        t = r["term"]
        impact = idf_map[t] * float(r["max_tf_norm"]) * bound_scale
        b = r["block_id"]
        block_sum[b] = block_sum.get(b, 0.0) + impact
        per_term.setdefault(t, []).append((-float(r["max_tf_norm"]), b))
    seed_ids = sorted({
        b for heap in per_term.values()
        for _, b in sorted(heap)[:seed_blocks_per_term]})

    # action B: point-lookup decode of the seed payloads (a handful of
    # block ids → parquet row-group pruning on block_id; payload bytes
    # read ONLY for these rows) → θ. Unfiltered queries score the seeds
    # driver-side (tiny collect, numpy kernel); candidate-filtered queries
    # score them IN-PLAN semi-joined to the candidates — a θ seeded from
    # unfiltered docs could exceed the kth FILTERED score and prune true
    # hits, but the kth best candidate-intersected seed partial score is a
    # valid lower bound of the kth filtered true score.
    if cand is None:
        seed_rows = (packed
                     .where(F.col("block_id").isin(seed_ids))
                     .select("term", "base_doc", "payload")
                     .collect())
        acc: dict = {}
        for r in seed_rows:
            doc_ids, tfs, dls = decode_block_scores(
                bytes(r["payload"]), int(r["base_doc"]))
            parts = _bm25_part_score(tfs, dls, idf_map[r["term"]], index.avgdl)
            for d, s in zip(doc_ids.tolist(), parts.tolist()):
                acc[d] = acc.get(d, 0.0) + s
        top = sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        # θ valid only if k docs seeded; partial seed sums are lower bounds
        theta = top[-1][1] if len(top) == k else 0.0
    else:
        seed_need = packed.where(F.col("block_id").isin(seed_ids))
        seed_top = _topk_from_packed(index, seed_need, terms, k,
                                     candidate_docs=cand,
                                     idf_map=idf_map).collect()
        theta = float(seed_top[-1]["score"]) if len(seed_top) == k else 0.0

    # ULP slack: S(b) and θ are floats computed with different operation
    # orders (driver sum-of-products vs build-time norm × query kernel); an
    # exact tie pruned by a 1-ULP shortfall would break rank identity, so
    # survival tests compare against θ minus a tiny slack (weakens pruning
    # infinitesimally, never correctness)
    theta_slack = theta - 1e-9 - abs(theta) * 1e-12

    if theta > 0.0 and not overflowed:
        # survival entirely driver-side: blocks are doc-ALIGNED across
        # terms, so block b survives iff S(b) = Σ_t idf·mtn(t, b) ≥ θ —
        # the tight per-block sum, not classic WAND's loose global bound
        surviving_ids = sorted(
            b for b, s in block_sum.items() if s >= theta_slack)
        if len(surviving_ids) >= max(1, int(0.8 * len(block_sum))):
            surviving_ids = None  # pruning buys nothing; skip the filter

    # action B: decode ALL query terms' payloads at surviving block ids
    # (the exact rescore set — blocks are doc-aligned), aggregate,
    # TakeOrdered k.
    need = packed
    if surviving_ids is not None:
        # literal IN planning/codegen cost grows steeply with list size
        # (measured: ~5 s per query at 2,000 literals on this Spark) —
        # beyond a few dozen ids a broadcast semi-join plans in constant
        # time
        if len(surviving_ids) <= 64:
            need = packed.where(F.col("block_id").isin(surviving_ids))
        else:
            ids_df = spark.createDataFrame(
                [(int(b),) for b in surviving_ids], "block_id long")
            need = packed.join(F.broadcast(ids_df), on="block_id",
                               how="left_semi")
    elif theta > 0.0 and overflowed:
        # meta overflowed the driver bound: the SAME per-block-sum
        # survival computed in-plan (θ stays valid — fewer seeds only
        # lowers it). idf is a driver literal map; the dictionary rows
        # were never truncated.
        idf_lit = F.create_map(
            *[F.lit(x) for t in idf_map for x in (t, idf_map[t])])
        surviving = (packed
                     .select("term", "block_id", "max_tf_norm")
                     .groupBy("block_id")
                     .agg(F.sum(idf_lit[F.col("term")]
                                * F.col("max_tf_norm")
                                * F.lit(bound_scale)).alias("s"))
                     .where(F.col("s") >= F.lit(theta_slack))
                     .select("block_id"))
        need = packed.join(surviving, on="block_id", how="left_semi")

    return _topk_from_packed(index, need, terms, k, candidate_docs=cand,
                             idf_map=idf_map)


def _positions_hay(index: Index, terms: list[str],
                   candidate_docs: DataFrame | None = None,
                   candidate_ids: list | None = None) -> DataFrame:
    """(doc_id, term, pos) rows for the query terms — exploded from row
    postings when they carry a positions column, else decoded from the
    packed store (which is then the index's single positional copy; see
    build_index(row_positions=...)). With `candidate_docs` (e.g. the
    top-k winners), the source prunes BEFORE explode/decode: row mode
    semi-joins doc ids, packed mode semi-joins the candidates' block ids
    so only a handful of payloads are ever decoded. `candidate_ids`
    (driver-side literals, e.g. an already-collected top-k) goes further:
    the doc/block ids push into the scan as IN-list filters, so the scan
    row-group-prunes instead of post-filtering a full read."""
    if "positions" in index.postings.columns:
        rows = _pruned_postings(index, terms)
        if candidate_ids is not None:
            rows = rows.where(F.col("doc_id").isin(list(candidate_ids)))
        elif candidate_docs is not None:
            rows = rows.join(F.broadcast(candidate_docs.select("doc_id")),
                             on="doc_id", how="left_semi")
        return rows.select("doc_id", "term",
                           F.explode("positions").alias("pos"))
    if index.packed is None:
        raise ValueError(
            "index stores no positions: row postings lack the positions "
            "column and no packed store is present (rebuild with "
            "row_positions=True or build_packed=True)")

    def gen(batches):
        import numpy as np
        import pandas as pd

        from .packing import decode_block_positions

        for pdf in batches:
            if pdf.empty:
                continue
            out_d, out_t, out_p = [], [], []
            for term, payload, base in zip(pdf["term"], pdf["payload"],
                                           pdf["base_doc"]):
                doc_ids, flat, counts = decode_block_positions(
                    bytes(payload), int(base))
                out_d.append(np.repeat(doc_ids, counts))
                out_t.append(np.repeat(term, int(counts.sum())))
                out_p.append(flat)
            yield pd.DataFrame({"doc_id": np.concatenate(out_d),
                                "term": np.concatenate(out_t),
                                "pos": np.concatenate(out_p)})

    packed = _pruned_packed(index, terms)
    if candidate_ids is not None:
        block_ids = sorted({int(d) // index.block_span
                            for d in candidate_ids})
        packed = packed.where(F.col("block_id").isin(block_ids))
    elif candidate_docs is not None:
        blocks = (candidate_docs
                  .select(F.floor(F.col("doc_id") / index.block_span)
                          .cast("long").alias("block_id"))
                  .distinct())
        packed = packed.join(F.broadcast(blocks), on="block_id",
                             how="left_semi")
    return (packed
            .select("term", "base_doc", "payload")
            .mapInPandas(gen, schema="doc_id long, term string, pos int"))


def phrase_match_docs(index: Index, query: CompiledQuery,
                      anchor_docs: DataFrame | None = None,
                      anchor_small: bool = False) -> DataFrame:
    """(doc_id, phrase_id, n_matches) via positional intersection on the
    pruned postings — the indexed form of the matches plan. NB phrase_id
    numbering follows the query's OWN tree; callers that pass a prefix
    query get it expanded here, so compute phrase ids from the SAME
    expanded query (matching_docs expands before calling in).

    Length-1 "phrases" (plain boolean leaves like the `a` in `a & !b`)
    never touch positions: occurrence == tf > 0, so they resolve from the
    compact row-postings scoring projection (n_matches = tf). Only real
    multi-lexeme phrases pay for positional decode — on a lean (packed-
    positions-only) index that is the difference between a row-projection
    scan and decoding packed payloads.

    `anchor_docs` (a SUPERSET of every doc that can satisfy the boolean
    query — see matching_docs) semi-joins each scan before any shuffle or
    decode: a common term AND-ed with a rare one shuffles only the rare
    term's docs into the per-doc aggregation, not its own millions. With
    `anchor_small` (the caller KNOWS the anchor's df is bounded) the
    anchor also prunes the packed POSITION decode to the anchor's block
    ids before any payload is touched — a phrase containing a common
    lexeme decodes a handful of blocks instead of the lexeme's whole
    posting range."""
    query = expand_query_prefixes(index, query)
    spark = index.postings.sparkSession
    if not query.phrases:
        return spark.createDataFrame([], "doc_id long, phrase_id int, n_matches long")

    singles = [(pid, ph.items[0][0])
               for pid, ph in enumerate(query.phrases) if ph.length == 1]
    multi_lexemes = sorted({lex for ph in query.phrases if ph.length > 1
                            for lex, _ in ph.items})

    single_hits = None
    if singles:
        sdf = spark.createDataFrame(
            [(t, pid) for pid, t in singles], "term string, phrase_id int")
        rows = _pruned_postings(index, sorted({t for _, t in singles}))
        if anchor_docs is not None:
            rows = rows.join(anchor_docs, on="doc_id", how="left_semi")
        single_hits = (rows.join(F.broadcast(sdf), on="term")
                       .select("doc_id", "phrase_id",
                               F.col("tf").cast("long").alias("n_matches")))

    multi_hits = None
    if multi_lexemes:
        from .matches import phrase_table_df
        qdf = (phrase_table_df(spark, query)
               .where(F.col("q_len") > 1))
        if anchor_docs is not None and anchor_small:
            # pre-decode pruning: packed mode semi-joins the anchor's
            # block ids before decoding any payload; row mode semi-joins
            # doc ids before the explode
            hay = _positions_hay(index, multi_lexemes,
                                 candidate_docs=anchor_docs)
        else:
            hay = _positions_hay(index, multi_lexemes)
            if anchor_docs is not None:
                hay = hay.join(anchor_docs, on="doc_id", how="left_semi")
        joined = hay.join(F.broadcast(qdf), hay.term == qdf.q_lexeme)
        aligned = joined.withColumn("range_start",
                                    F.col("pos") - F.col("q_pos") + F.lit(1))
        multi_hits = (aligned
                      .groupBy("doc_id", "phrase_id", "range_start")
                      .agg(F.count("*").alias("n_hits"),
                           F.min("pos").alias("first"), F.max("pos").alias("last"),
                           F.first("q_len").alias("q_len"), F.first("q_span").alias("q_span"))
                      .where((F.col("n_hits") == F.col("q_len"))
                             & (F.col("last") - F.col("first") == F.col("q_span")))
                      .groupBy("doc_id", "phrase_id")
                      .agg(F.count("*").alias("n_matches")))

    if single_hits is not None and multi_hits is not None:
        return single_hits.unionByName(multi_hits)
    return single_hits if single_hits is not None else multi_hits


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


def _required_lexemes(node: Node | None) -> set[str]:
    """Lexemes EVERY satisfying doc must contain: a phrase requires all its
    lexemes, AND requires the union of its children's requirements, OR the
    intersection (a lexeme required by every branch is required), NOT
    nothing."""
    if node is None:
        return set()
    if node.op == "phrase":
        return {lex for lex, _ in node.phrase.items}
    if node.op == "and":
        out: set[str] = set()
        for c in node.children:
            out |= _required_lexemes(c)
        return out
    if node.op == "or" and node.children:
        out = _required_lexemes(node.children[0])
        for c in node.children[1:]:
            out &= _required_lexemes(c)
        return out
    return set()


def matching_docs(index: Index, query: CompiledQuery) -> DataFrame:
    """Boolean @@ filter: docs satisfying the query's AND/OR/NOT tree, with
    phrase nodes requiring exact positional adjacency.

    Selective-term-first evaluation: when the tree REQUIRES some lexeme
    (see _required_lexemes) the rarest required one — df from a tiny
    bucket-pruned dictionary lookup — anchors the plan: every other
    term's scan is semi-joined down to the anchor's docs before the
    per-doc aggregation, so `rare & common` shuffles O(df_rare) rows
    instead of the common term's millions. A required lexeme absent from
    the dictionary short-circuits to an empty result with no corpus
    scan."""
    from dataclasses import replace

    query = expand_query_prefixes(index, query)
    spark = index.postings.sparkSession
    phrases, seen = [], set()
    for ph in _all_phrases(query.root):
        if ph.items not in seen:
            seen.add(ph.items)
            phrases.append(ph)
    full_query = replace(query, phrases=tuple(phrases))

    anchor = None
    anchor_small = False
    required = _required_lexemes(query.root)
    if required:
        dfs = {r["term"]: int(r["df"]) for r in
               _idf_lookup(index, sorted(required), cols=("term", "df"))
               .collect()}
        missing = required - set(dfs)
        if missing:
            return spark.createDataFrame([], "doc_id long")
        rarest = min(sorted(required), key=lambda t: dfs[t])
        # anchoring only pays when it actually shrinks the doc stream
        if len(query.lexemes) > 1 and dfs[rarest] * 4 <= index.n_docs:
            anchor = (_pruned_postings(index, [rarest])
                      .select("doc_id"))
            # a provably-bounded anchor can also prune the packed
            # position decode (broadcast of ≤cap doc/block ids)
            anchor_small = dfs[rarest] <= FILTERED_DIRECT_DOC_CAP

    phrase_docs = phrase_match_docs(index, full_query, anchor_docs=anchor,
                                    anchor_small=anchor_small)
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
        # NOT semantics need the full doc universe, not just phrase
        # hitters — unless an anchor exists, in which case the anchor's
        # docs ARE the universe of possible matches
        universe = (anchor if anchor is not None
                    else index.tokens.select("doc_id"))
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
    query = expand_query_prefixes(index, query)  # once, for both stages
    cands = matching_docs(index, query) if enforce_boolean else None
    return bm25_topk(index, query, k=k, mode=mode, candidate_docs=cands)


def search_batch(
    index: Index,
    queries: dict[str, CompiledQuery],
    k: int = 10,
    eval_mode: str = "auto",
) -> DataFrame:
    """N full boolean+phrase retrievals in ONE pair of index scans — the
    batched form of `search` the way `bm25_topk_batch` batches
    `bm25_topk` (offline query workloads: eval sets, alert backfills,
    saved-search refreshes must not launch N driver actions).

    Plan: all queries' phrase patterns flatten into one broadcast table
    (the percolator's registry shape, streaming/percolate.py); ONE
    positional scan pruned to the union of every query's lexemes feeds
    the pos−rel_pos alignment join, and each query's boolean AST folds
    over its satisfied-phrase set — a JVM CASE expression for small
    workloads, the percolator's Arrow spec evaluator past
    CASE_CHAIN_MAX_QUERIES (`eval_mode`, same contract as `percolate`:
    plan size must not grow with an offline workload's query count).
    The match set then semi-joins `bm25_topk_batch`'s single scored
    scan per query.

    NOT semantics: queries containing a negation must see every corpus
    doc (a doc matching no phrase can still satisfy them), so those —
    and only those — pay a corpus×negated-queries evaluation against
    the column-pruned doc list, exactly like the percolator's batch
    form. Per-query results are rank-identical to `search` (tested);
    like `search`, a query with no positive lexeme ranks nothing.

    Returns (query_id, doc_id, score, rank) with rank 1..k per query."""
    from ..streaming.percolate import (STANDING_TABLE_SCHEMA,
                                       _boolean_fold_filter,
                                       _flatten_queries)

    spark = index.postings.sparkSession
    out_schema = "query_id string, doc_id long, score double, rank int"
    if not queries:
        return spark.createDataFrame([], out_schema)
    queries = {qid: expand_query_prefixes(index, q)
               for qid, q in queries.items()}
    rows, meta = _flatten_queries(queries)
    all_lex = sorted({r[2] for r in rows})

    if all_lex:
        hay = (_positions_hay(index, all_lex)
               .select("doc_id", "pos", F.col("term").alias("lex")))
        qdf = spark.createDataFrame(rows, STANDING_TABLE_SCHEMA)
        joined = hay.join(F.broadcast(qdf), hay.lex == qdf.q_lexeme)
        aligned = joined.withColumn(
            "range_start", F.col("pos") - F.col("q_pos") + F.lit(1))
        hits = (aligned
                .groupBy("doc_id", "query_id", "phrase_id", "range_start")
                .agg(F.count("*").alias("n_hits"),
                     F.min("pos").alias("p0"), F.max("pos").alias("p1"),
                     F.first("q_len").alias("q_len"),
                     F.first("q_span").alias("q_span"))
                .where((F.col("n_hits") == F.col("q_len"))
                       & (F.col("p1") - F.col("p0") == F.col("q_span"))))
        flags = (hits.groupBy("doc_id", "query_id")
                 .agg(F.collect_set("phrase_id").alias("ok_phrases")))
    else:
        flags = spark.createDataFrame(
            [], "doc_id long, query_id string, ok_phrases array<int>")

    neg_qids = [qid for qid, (_, _, neg) in meta.items() if neg]
    if neg_qids:
        universe = (index.tokens.select("doc_id")
                    .crossJoin(F.broadcast(
                        spark.createDataFrame([(q,) for q in neg_qids],
                                              "query_id string"))))
        flags = (universe.join(flags, on=["doc_id", "query_id"],
                               how="full")
                 .withColumn("ok_phrases",
                             F.coalesce(F.col("ok_phrases"),
                                        F.array().cast("array<int>"))))

    matches = (_boolean_fold_filter(flags, meta, eval_mode)
               .select("query_id", "doc_id"))
    return bm25_topk_batch(index, queries, k=k, candidates=matches)


def search_with_headlines(
    index: Index,
    query: CompiledQuery,
    k: int = 10,
    options: str = "",
    mode: str = "exact",
) -> DataFrame:
    """Top-k + whole-phrase highlighted headline per hit (the fast path over
    the persisted index: position lookup + recall-array slicing only).

    The k hits are COLLECTED first (k rows — bounded driver work), so the
    winner doc_ids reach the tokens and positional scans as IN-list
    literals: parquet row-group pruning instead of a broadcast semi-join
    that must read every recall vector to drop all but k of them. Past
    512 winners the plan falls back to in-plan semi-joins."""
    from .headline import ts_fast_headline

    # expand prefixes up front: the headline stage must highlight the
    # concrete expansions, not the raw ':*' lexeme
    query = expand_query_prefixes(index, query)
    hits = search(index, query, k=k, mode=mode)
    spark = index.postings.sparkSession
    if k <= 512:
        rows = hits.collect()
        ids = [int(r["doc_id"]) for r in rows]
        if not ids:
            # materialize the known-empty answer: returning the lazy
            # `hits` plan would re-run the whole search on the caller's
            # next action
            empty = spark.createDataFrame([], hits.schema)
            return empty.withColumn("headline", F.lit(None).cast("string"))
        hits = spark.createDataFrame(rows, hits.schema)
        winners = None
        docs = (index.tokens.where(F.col("doc_id").isin(ids))
                .select("doc_id", "tokens"))
        hay_src = _positions_hay(index, list(query.lexemes),
                                 candidate_ids=ids)
        hay = (hay_src.where(F.col("doc_id").isin(ids))
               .select("doc_id", "pos", F.col("term").alias("lex")))
    else:
        winners = hits.select("doc_id")
        docs = (index.tokens.join(winners, on="doc_id", how="left_semi")
                .select("doc_id", "tokens"))
        # haystack rows come straight from the already-pruned positional
        # store: the precomputed-TSV trick as a persisted position-lookup
        # joined to content (row postings when they carry positions,
        # packed decode else), pre-pruned to the winners' docs/blocks
        # before any explode or decode
        hay = (_positions_hay(index, list(query.lexemes),
                              candidate_docs=winners)
               .join(winners, on="doc_id", how="left_semi")
               .select("doc_id", "pos", F.col("term").alias("lex")))
    headlines = ts_fast_headline(docs, query, options, hay=hay)
    return (hits.join(headlines, on="doc_id", how="left")
            .orderBy(F.desc("score"), F.asc("doc_id")))


def hybrid_search_rrf(
    index: Index,
    query: CompiledQuery | list[str],
    embeddings: DataFrame,
    query_vec,
    k: int = 10,
    depth: int = 100,
    k_rrf: int = 60,
    mode: str = "exact",
    ann=None,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Hybrid retrieval: fuse BM25 and embedding-cosine rankings with
    reciprocal rank fusion — score(d) = Σ_systems 1/(k_rrf + rank_d(s))
    (Cormack/Clarke/Buettcher's published RRF constant k=60 default).

    Each branch retrieves its top-`depth` (bounded, depth-sized frames),
    ranks are assigned over e4-ROUNDED scores (1e-4 quantization) with a
    doc-id tiebreak so the fused ordering is deterministic and
    reproducible across engines/float-accumulation orders, then a
    full-outer join sums the reciprocal ranks. Pass `ann` (a loaded
    AnnIndex/IvfIndex handle) to use the approximate vector branch
    instead of brute-force cosine over `embeddings`.

    Returns (doc_id, rrf_e4, bm25_rank, cosine_rank) — ranks NULL for a
    doc only one system retrieved; rrf_e4 = round(score * 1e8) (RRF
    scores live in [0, 2/61], so e8 keeps 4 significant digits)."""
    from pyspark.sql import Window

    from ..operators.similarity import cosine_topk

    lex = bm25_topk(index, query, k=depth, mode=mode)
    w_lex = Window.orderBy(
        F.desc(F.round(F.col("score") * 10000).cast("long")),
        F.asc("doc_id"))
    lexr = (lex.withColumn("bm25_rank", F.row_number().over(w_lex))
            .select("doc_id", "bm25_rank"))
    if ann is not None:
        # ANN handles store canonical (vec_id, embedding) columns; align
        # the output id to the caller's id_col so both branches agree
        vec = ann.query(query_vec, k=depth)
        if id_col != "vec_id":
            vec = vec.withColumnRenamed("vec_id", id_col)
    else:
        vec = cosine_topk(embeddings, query_vec, k=depth,
                          emb_col=emb_col, id_col=id_col)
    w_vec = Window.orderBy(
        F.desc(F.round(F.col("cosine") * 10000).cast("long")),
        F.asc(id_col))
    vecr = (vec.withColumn("cosine_rank", F.row_number().over(w_vec))
            .select(F.col(id_col).alias("doc_id"), "cosine_rank"))
    fused = (lexr.join(vecr, on="doc_id", how="full_outer")
             .withColumn(
                 "_rrf",
                 F.coalesce(1.0 / (F.lit(k_rrf) + F.col("bm25_rank")),
                            F.lit(0.0))
                 + F.coalesce(1.0 / (F.lit(k_rrf) + F.col("cosine_rank")),
                              F.lit(0.0)))
             .withColumn("rrf_e4",
                         F.round(F.col("_rrf") * 100000000).cast("long")))
    return (fused.orderBy(F.desc("rrf_e4"), F.asc("doc_id")).limit(k)
            .select("doc_id", "rrf_e4", "bm25_rank", "cosine_rank"))


def facet_counts(
    index: Index,
    query: CompiledQuery,
    meta: DataFrame,
    facet_cols: list[str],
) -> DataFrame:
    """Facet aggregation over ALL docs matching a boolean/phrase query —
    the search-engine "aggregations" sidebar (count per language, per
    source, per repo) computed beside the top-k list.

    One match plan + one shuffle: `matching_docs` anchors on the rarest
    required term (bucket-pruned postings scan), the matched doc_ids
    left-semi-join the metadata table on doc_id, and a single stack()
    unpivot + hash aggregate produces every facet's counts — N facet
    columns never cost N scans or N joins. Facet cardinality is small,
    so map-side partial aggregation collapses the final shuffle to
    ~|distinct values| rows per partition; at 10^12 docs the only heavy
    edge is the doc_id semi-join, which AQE converts to a broadcast
    whenever the match set is small.

    Returns (facet, value, doc_count) — one row per facet value present
    among the matched docs; NULL values group like SQL GROUP BY."""
    if not facet_cols:
        raise ValueError("facet_cols must name at least one column")
    docs = matching_docs(index, query)
    sel = meta.join(docs, on="doc_id", how="left_semi")
    stack = "stack({}, {}) as (facet, value)".format(
        len(facet_cols),
        ", ".join(f"'{c}', cast(`{c}` as string)" for c in facet_cols))
    return (sel.selectExpr(stack)
            .groupBy("facet", "value")
            .agg(F.count("*").alias("doc_count")))


def top_per_facet(
    index: Index,
    terms: list[str],
    meta: DataFrame,
    facet_col: str,
    k: int = 3,
    candidate_docs: DataFrame | None = None,
) -> DataFrame:
    """Top-k BM25 results WITHIN each facet value — the "best 3 hits per
    source / per language" result-diversification query (Elasticsearch
    `top_hits` inside a terms aggregation). Complements `facet_counts`:
    that returns the sidebar counts, this returns the documents.

    One pruned postings scan → per-doc BM25 sum (match-set-sized), an
    equi-join onto the metadata table for the facet column (AQE
    broadcasts the match side when it is small — the metadata table is
    never shuffled by hand), then one row_number window per facet value.
    Ties break score desc, doc_id asc. `candidate_docs` pre-filters the
    scan (boolean/phrase compositions), same contract as `bm25_topk`.

    Skew note: the window sorts each facet partition, so one dominant
    facet value costs a sort of its match subset — acceptable because the
    input is the MATCH set, not the corpus; for stopword-scale queries
    over a near-single-valued facet, cut the match set first (filters or
    a global `bm25_topk` pre-pass).

    Returns (facet_value, doc_id, score, rank), rank 1-based per value;
    NULL facet values rank in their own group like SQL GROUP BY."""
    from pyspark.sql import Window

    ts = sorted(set(terms))
    if not ts:
        return index.postings.sparkSession.createDataFrame(
            [], "facet_value string, doc_id long, score double, rank int")
    scored = _scored(index, ts)
    if candidate_docs is not None:
        scored = scored.join(candidate_docs.select("doc_id"), on="doc_id",
                             how="left_semi")
    per_doc = scored.groupBy("doc_id").agg(F.sum("score").alias("score"))
    sel = per_doc.join(
        meta.select("doc_id",
                    F.col(facet_col).cast("string").alias("facet_value")),
        on="doc_id")
    win = (Window.partitionBy("facet_value")
           .orderBy(F.desc("score"), F.asc("doc_id")))
    return (sel.withColumn("rank", F.row_number().over(win))
            .where(F.col("rank") <= k)
            .select("facet_value", "doc_id", "score", "rank"))


def significant_terms(
    index: Index,
    query: CompiledQuery,
    top_n: int = 20,
    min_fg_df: int = 2,
    exclude_query_terms: bool = False,
) -> DataFrame:
    """Terms statistically over-represented in the docs matching a query
    vs the whole corpus — Elasticsearch's `significant_terms` aggregation
    ("what is this result set ABOUT that the corpus is not?"): search
    'crash' over a bug corpus and the segfault/backtrace vocabulary
    surfaces even though it never appeared in the query.

    Scoring is the foreground/background rate lift,
    `(fg_df / fg_n) / (bg_df / bg_n)`, computed as one division of two
    exact long products — every input is an integer straight off the
    index (fg_df from the match set's postings, bg_df from the
    dictionary, bg_n from stats), so the double is bit-identical across
    engines/partitionings and the (lift desc, term asc) ranking carries
    no float-combine-order risk. Lift is ES's "simple" heuristic; JLH /
    chi² re-rank the same four integers, so callers can recompute.

    Plan shape (the 100 TB audit): `matching_docs` resolves the query
    with its usual anchored bucket-pruned scans; the match set semi-joins
    the postings on doc_id — the one heavy edge, and AQE broadcasts it
    whenever the match set is small, which is the typical case for a
    selective query; the per-term counts come out of a map-side-combined
    groupBy (shuffle is match-vocabulary-sized, not postings-sized); the
    dictionary join runs on the ALREADY-AGGREGATED term table; fg_n
    rides along as a one-row broadcast cross-join, so the whole result
    is a single action. `min_fg_df` mirrors ES's `min_doc_count` — a
    term seen once in the foreground is noise, and the filter runs
    before the top-n window sorts anything.

    Returns (term, fg_df, bg_df, fg_n, bg_n, lift, rank), rank 1-based
    by lift desc / term asc, at most `top_n` rows."""
    from pyspark.sql import Window

    docs = matching_docs(index, query)
    fg_n = docs.agg(F.count("*").alias("fg_n"))
    fg = (index.postings.join(docs, on="doc_id", how="left_semi")
          .groupBy("term").agg(F.count("*").alias("fg_df"))
          .where(F.col("fg_df") >= min_fg_df))
    if exclude_query_terms and query.lexemes:
        fg = fg.where(~F.col("term").isin(*query.lexemes))
    bg_n = int(index.n_docs)
    joined = (fg.join(index.terms.select("term",
                                         F.col("df").alias("bg_df")),
                      on="term")
              .crossJoin(F.broadcast(fg_n)))
    lift = ((F.col("fg_df") * F.lit(bg_n)).cast("double")
            / (F.col("fg_n") * F.col("bg_df")).cast("double"))
    win = Window.orderBy(F.desc("lift"), F.asc("term"))
    return (joined.withColumn("lift", lift)
            .withColumn("rank", F.row_number().over(win).cast("long"))
            .where(F.col("rank") <= top_n)
            .select("term", "fg_df", "bg_df",
                    F.col("fg_n").cast("long").alias("fg_n"),
                    F.lit(bg_n).cast("long").alias("bg_n"),
                    "lift", "rank"))


def more_like_this(
    index: Index,
    content: str,
    k: int = 10,
    max_terms: int = 10,
    exclude_doc_id: int | None = None,
    mode: str = "exact",
    config: str | None = None,
) -> DataFrame:
    """"More like this": rank the corpus by BM25 similarity to a free-text
    source document (Elasticsearch MLT / the "related articles" query).

    The source text is analyzed DRIVER-side with the index's own analyzer
    (one document — no Spark job), then query terms are chosen by an
    integer-only rule: highest tf first, then rarest (df ascending, from
    a bucket-pruned dictionary lookup), then term ascending. All-integer
    selection is deterministic and reproducible in plain SQL — no
    cross-engine float-tie risk in which terms get picked. The selected
    terms feed the normal `bm25_topk` plan (exact or blockmax), so
    retrieval cost is one pruned postings scan no matter how long the
    source document is.

    `exclude_doc_id` drops the source itself when it is part of the
    corpus. Returns (doc_id, score) in rank order (score desc, doc_id
    asc)."""
    from collections import Counter

    from ..functions.lexize import analyze_text_simple

    spark = index.postings.sparkSession
    tf = Counter(lx for lx in analyze_text_simple(
        content or "", config or index.config) if lx is not None)
    if not tf:
        return spark.createDataFrame([], "doc_id long, score double")
    # bounded driver work: one dictionary row per DISTINCT source term
    dfs = {r["term"]: int(r["df"]) for r in
           _idf_lookup(index, sorted(tf), cols=("term", "df")).collect()}
    present = [t for t in sorted(tf) if t in dfs]
    if not present:
        return spark.createDataFrame([], "doc_id long, score double")
    selected = sorted(present, key=lambda t: (-tf[t], dfs[t], t))[:max_terms]
    fetch = k + 1 if exclude_doc_id is not None else k
    top = bm25_topk(index, selected, k=fetch, mode=mode)
    if exclude_doc_id is not None:
        top = (top.where(F.col("doc_id") != int(exclude_doc_id))
               .orderBy(F.desc("score"), F.asc("doc_id")).limit(k))
    return top


def bm25f_topk_adhoc(
    df: DataFrame,
    field_weights: dict[str, float],
    terms: list[str],
    k: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25F: weighted-multi-field BM25 over an ad-hoc frame — a title
    hit outranks the same words buried in a body (Robertson's simplified
    BM25F: fold field tf/length into weighted totals FIRST, then apply
    the usual saturation once):

        wtf(t,d) = Σ_f w_f·tf_f(t,d)      wdl(d) = Σ_f w_f·len_f(d)
        score    = Σ_t idf(t)·wtf·(k1+1)/(wtf + k1·(1−b+b·wdl/avgwdl))

    idf uses documents containing t in ANY field. One projection builds
    every per-field count as column algebra (whitespace tokens — run the
    fields through `with_analysis` first for config-aware tokens), ONE
    aggregation action fixes n_docs/avg(wdl)/per-term df, and per-term
    scores combine left-to-right in sorted-term order so the doubles are
    engine-reproducible. Two actions total, no UDFs, no shuffle beyond
    the final top-k — the candidate-set-scoring shape (an indexed BM25F
    would need per-field postings; use `bm25_topk` for the single-field
    indexed path)."""
    import math

    terms = sorted(set(terms))
    fields = sorted(field_weights)
    if not fields:
        raise ValueError("field_weights must name at least one column")
    spark = df.sparkSession
    if not terms:
        return spark.createDataFrame([], "doc_id long, score double")

    def toks(f):
        return F.filter(F.split(F.col(f), " "), lambda x: x != "")

    def eq(term):
        # closure factory: a 2-arg lambda would be read by F.filter as
        # the (element, index) form and bind `term` to the index column
        return lambda x: x == term

    wdl = None
    for f in fields:
        part = F.size(toks(f)).cast("double") * float(field_weights[f])
        wdl = part if wdl is None else wdl + part
    cols = [F.col(id_col).alias("doc_id"), wdl.alias("wdl")]
    for i, t in enumerate(terms):
        wtf = None
        for f in fields:
            c = (F.size(F.filter(toks(f), eq(t)))
                 .cast("double") * float(field_weights[f]))
            wtf = c if wtf is None else wtf + c
        cols.append(wtf.alias(f"wtf_{i}"))
    per = df.select(*cols)

    stats = per.agg(
        F.count("*").alias("n"), F.avg("wdl").alias("a"),
        *[F.sum((F.col(f"wtf_{i}") > 0).cast("int")).alias(f"df_{i}")
          for i in range(len(terms))]).first()
    n_docs, avgwdl = int(stats["n"]), float(stats["a"] or 0.0)

    score = F.lit(0.0)
    any_wtf = F.lit(0.0)
    for i in range(len(terms)):
        any_wtf = any_wtf + F.col(f"wtf_{i}")
        dfi = int(stats[f"df_{i}"])
        if dfi == 0:
            continue
        idf = math.log(1 + (n_docs - dfi + 0.5) / (dfi + 0.5))
        wtf = F.col(f"wtf_{i}")
        score = score + F.when(
            wtf > 0,
            F.lit(idf) * wtf * (K1 + 1)
            / (wtf + K1 * (1 - B + B * F.col("wdl") / F.lit(avgwdl)))
        ).otherwise(F.lit(0.0))
    return (per.where(any_wtf > 0)
            .select("doc_id", score.alias("score"))
            .orderBy(F.desc("score"), F.asc("doc_id")).limit(k))


def more_like_this_by_id(
    index: Index,
    doc_id: int,
    **kwargs,
) -> DataFrame:
    """`more_like_this` addressed by doc_id: the source document's recall
    token array is point-read from the index's tokens table (one row —
    parquet row-group min/max pruning on doc_id, the same trick
    `search_with_headlines` uses for winners) and re-analyzed. The
    tokens column is the analyzer's own canonical output, so re-analysis
    reproduces the postings' lexeme stream exactly. The source doc is
    excluded from the results."""
    row = (index.tokens.where(F.col("doc_id") == int(doc_id))
           .select("tokens").first())
    if row is None:
        raise KeyError(f"doc_id {doc_id} not in index")
    return more_like_this(index, " ".join(row["tokens"]),
                          exclude_doc_id=int(doc_id), **kwargs)


def bm25_topk_paged(
    index: Index,
    query: CompiledQuery | list[str],
    k: int = 10,
    after: tuple[float, int] | None = None,
) -> DataFrame:
    """Keyset ("search_after") pagination for BM25: the page of k docs
    strictly after the cursor `(score, doc_id)` in (score desc, doc_id
    asc) order — deep pagination without OFFSET's recompute-and-discard.

    A float cursor is only meaningful if the score is REPRODUCIBLE, and
    a hash-aggregate float sum is not (partial-sum addition order varies
    run to run, so the same doc can score ±1 ulp differently on the next
    page's job and fall on the wrong side of `score == cursor`). Scores
    here are built from per-term conditional aggregates — one addend per
    (doc, term), so each aggregate is order-free — combined left-to-right
    in sorted-term order: bit-deterministic across jobs, pages, and
    engines given the same idf inputs. Each page costs one bucket-pruned
    postings scan; the cursor filter reaches the aggregate before the
    top-k sort, so page depth never grows the sorted set."""
    if isinstance(query, CompiledQuery):
        query = expand_query_prefixes(index, query)
    terms = sorted(set(query.lexemes if isinstance(query, CompiledQuery)
                       else query))
    spark = index.postings.sparkSession
    if not terms:
        return spark.createDataFrame([], "doc_id long, score double")
    rows = _scored(index, terms)
    aggs = [F.sum(F.when(F.col("term") == t, F.col("score")))
            .alias(f"_s{i}") for i, t in enumerate(terms)]
    per_doc = rows.groupBy("doc_id").agg(*aggs)
    total = F.coalesce(F.col("_s0"), F.lit(0.0))
    for i in range(1, len(terms)):
        total = total + F.coalesce(F.col(f"_s{i}"), F.lit(0.0))
    scored = per_doc.select("doc_id", total.alias("score"))
    if after is not None:
        s, d = float(after[0]), int(after[1])
        scored = scored.where((F.col("score") < s)
                              | ((F.col("score") == s)
                                 & (F.col("doc_id") > d)))
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def fuzzy_bm25_topk(
    index: Index,
    words: list[str],
    k: int = 10,
    threshold: float = 0.25,
    mode: str = "exact",
    config: str | None = None,
) -> DataFrame:
    """BM25 top-k with typo tolerance: query words missing from the index
    dictionary are rewritten to their nearest dictionary term by pg_trgm
    trigram similarity (the `suggest_terms` "did you mean" operator)
    before scoring — `wnidow` retrieves `window` docs.

    Only OUT-of-vocabulary words are corrected (a valid word is never
    rewritten). Correction is top-1 by (similarity desc, term asc); the
    similarity is an integer trigram-set ratio |∩| / |∪|, so the argmax
    is bit-deterministic across engines. OOV words with no candidate ≥
    threshold are dropped with a warning — pg_trgm's own behavior for
    hopeless typos — never silently kept as zero-hit terms. Driver work
    is bounded: one dictionary presence lookup for the whole query, and
    ONE thresholded top-1 pass over the vocabulary-sized dictionary for
    ALL OOV words together (`suggest_terms_multi` — never a scan per
    word)."""
    import logging

    from ..functions.lexize import lexize_word
    from ..operators.trigram import suggest_terms_multi

    spark = index.postings.sparkSession
    lexed: list[str] = []
    for w in words:
        lx = lexize_word(w, config or index.config)
        if lx is not None and lx not in lexed:
            lexed.append(lx)
    if not lexed:
        return spark.createDataFrame([], "doc_id long, score double")
    known = {r["term"] for r in
             _idf_lookup(index, lexed, cols=("term",)).collect()}
    oov = [lx for lx in lexed if lx not in known]
    corrections = {}
    if oov:
        corrections = {r["word"]: r["term"] for r in
                       suggest_terms_multi(index.terms, oov,
                                           threshold=threshold).collect()}
    terms, dropped = [], []
    for lx in lexed:
        if lx in known:
            terms.append(lx)
        elif lx in corrections:
            terms.append(corrections[lx])
        else:
            dropped.append(lx)
    if dropped:
        logging.getLogger(__name__).warning(
            "fuzzy_bm25_topk: no dictionary term within %.2f of %s; dropped",
            threshold, dropped)
    if not terms:
        return spark.createDataFrame([], "doc_id long, score double")
    return bm25_topk(index, sorted(set(terms)), k=k, mode=mode)


def _expand_lexized_full(index: Index, lx: str,
                         max_expansions: int) -> tuple[list[str], bool]:
    """(dictionary terms starting with the ALREADY-LEXIZED prefix `lx`
    (df desc, term asc, capped at max_expansions), truncated?) — the
    shared scan behind expand_prefix and expand_query_prefixes (which
    hold query-side lexemes and must not lexize twice: stemming is not
    idempotent)."""
    rows = (index.terms.where(F.col("term").startswith(lx))
            .select("term", "df")
            .orderBy(F.desc("df"), F.asc("term"))
            .limit(max_expansions + 1).collect())
    truncated = len(rows) > max_expansions
    return [r["term"] for r in rows[:max_expansions]], truncated


def _expand_lexized(index: Index, lx: str, max_expansions: int) -> list[str]:
    import warnings

    terms, truncated = _expand_lexized_full(index, lx, max_expansions)
    if truncated:
        warnings.warn(
            f"prefix {lx!r} matches more than {max_expansions} "
            f"dictionary terms; using the {max_expansions} most frequent")
    return terms


#: a lexeme no analyzer can emit (tokenization strips control chars):
#: substituted for a prefix with zero dictionary expansions so the
#: phrase keeps its place in the boolean tree and matches nothing —
#: dropping the phrase instead would CHANGE and/or semantics
_IMPOSSIBLE_LEXEME = "\x00<no-expansion>"


def expand_query_prefixes(index: Index, query: CompiledQuery,
                          max_expansions: int = 32,
                          max_phrase_alternatives: int = 256) -> CompiledQuery:
    """Rewrite a `:*` prefix query into a concrete query against this
    index's dictionary: every prefix slot is replaced by its dictionary
    expansions (df desc, capped per slot at `max_expansions`, like
    Lucene's max_expansions contract), a phrase with several prefix
    slots becomes an OR over the cartesian product of expansions (capped
    at `max_phrase_alternatives` — raises past it rather than silently
    truncating a phrase), and a prefix with NO expansions becomes an
    impossible phrase so AND/NOT semantics stay exact. The result has
    no prefix slots and flows through every plan — matching, ranking,
    headlines highlight each concrete expansion — unchanged.

    No-op (same object) for queries without prefixes. One bucket-
    pruned two-column dictionary scan per distinct prefix lexeme;
    nothing corpus-sized is touched."""
    from itertools import product

    from .query_compiler import (
        _collect_positive_phrases, _dedupe, CompiledQuery as _CQ, Node,
        Phrase)

    if not isinstance(query, CompiledQuery) or not query.has_prefixes:
        return query

    cache: dict[str, tuple[list[str], bool]] = {}

    def expansions(lx: str) -> tuple[list[str], bool]:
        if lx not in cache:
            cache[lx] = _expand_lexized_full(index, lx, max_expansions)
        return cache[lx]

    def walk(node, negated: bool = False):
        if node is None:
            return None
        if node.op == "phrase":
            ph = node.phrase
            if not ph.prefix_slots:
                return node
            star = set(ph.prefix_slots)
            lists = []
            for lx, pos in ph.items:
                if pos in star:
                    exp, truncated = expansions(lx)
                    if truncated:
                        if negated:
                            # truncating a NEGATED prefix is not a recall
                            # haircut, it is WRONG results: docs holding
                            # only the dropped terms would pass the NOT
                            raise ValueError(
                                f"negated prefix '{lx}':* matches more "
                                f"than {max_expansions} dictionary terms;"
                                " truncation under NOT would return docs"
                                " that do contain the prefix — raise "
                                "max_expansions to cover the full set")
                        import warnings
                        warnings.warn(
                            f"prefix {lx!r} matches more than "
                            f"{max_expansions} dictionary terms; using "
                            f"the {max_expansions} most frequent")
                    if not exp:
                        return Node("phrase", phrase=Phrase(
                            ((_IMPOSSIBLE_LEXEME, 1),)))
                    lists.append([(e, pos) for e in exp])
                else:
                    lists.append([(lx, pos)])
            total = 1
            for lst in lists:
                total *= len(lst)
            if total > max_phrase_alternatives:
                raise ValueError(
                    f"prefix phrase {ph.render()} expands to {total} "
                    f"alternatives (> {max_phrase_alternatives}); narrow "
                    "the prefixes or raise max_phrase_alternatives")
            alts = [Node("phrase", phrase=Phrase(tuple(combo)))
                    for combo in product(*lists)]
            return alts[0] if len(alts) == 1 else Node("or", tuple(alts))
        if node.op == "not":
            return Node("not", (walk(node.children[0], not negated),))
        return Node(node.op,
                    tuple(walk(c, negated) for c in node.children))

    root = walk(query.root)
    return _CQ(query.config, query.raw, root,
               _dedupe(_collect_positive_phrases(root)))


def expand_prefix(index: Index, prefix: str,
                  max_expansions: int = 32,
                  config: str | None = None) -> list[str]:
    """Dictionary terms starting with the lexized `prefix`, most frequent
    first — the expansion set behind tsquery's `'pre':*`.

    The prefix is normalized through the index's own analyzer (PG stems
    it too: `to_tsquery('english','running:*')` → `'run':*`); a prefix
    that lexizes away (stopword) expands to nothing, with a warning.
    Selection is deterministic: (df desc, term asc), capped at
    `max_expansions` — the Lucene `max_expansions` contract — and a hit
    count past the cap warns rather than truncating silently.

    Scale shape: the dictionary is the vocabulary-sized SMALL table; a
    prefix predicate cannot bucket-prune (buckets are term-hash routed),
    so this is one pruned two-column scan of terms/ — O(|vocab|) rows
    read in parallel, ≤ max_expansions + 1 rows ever reach the driver."""
    import warnings

    from ..functions.lexize import lexize_word

    lx = lexize_word(prefix, config or index.config)
    if lx is None:
        warnings.warn(f"prefix {prefix!r} lexizes to a stopword; "
                      "prefix query matches nothing")
        return []
    return _expand_lexized(index, lx, max_expansions)


def prefix_search(
    index: Index,
    prefix: str,
    k: int = 10,
    max_expansions: int = 32,
    mode: str = "exact",
    config: str | None = None,
) -> DataFrame:
    """tsquery prefix matching (`'pre':*`) as retrieval: every dictionary
    term starting with the lexized prefix ORs into one BM25 top-k — docs
    matching any expansion score by the expansions they contain.

    Each expansion keeps its own idf (Lucene's "blended" multi-term
    scoring rather than PG's rank-agnostic match): rare full words under
    a common prefix still contribute their full specificity. Cost is one
    dictionary scan (see `expand_prefix`) + the ordinary ≤32-term BM25
    plan — posting scans stay bucket-pruned per expansion term."""
    spark = index.postings.sparkSession
    terms = expand_prefix(index, prefix, max_expansions, config=config)
    if not terms:
        return spark.createDataFrame([], "doc_id long, score double")
    return bm25_topk(index, sorted(terms), k=k, mode=mode)
