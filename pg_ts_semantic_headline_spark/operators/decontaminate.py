"""Eval-set decontamination: flag/remove training documents that share
word n-grams with a benchmark (eval) set — the standard guard against
test-set leakage when assembling LLM training corpora (the n-gram-overlap
method published with GPT-2/GPT-3 and open reproductions; public
knowledge).

Spark-first shape for a 100 TB train side:

- The EVAL side is benchmark-sized (10^3-10^5 docs), so its distinct
  n-gram set BROADCASTS; the train side is scanned once and never
  shuffled at corpus scale — only the matches (rare by construction:
  a clean corpus shares almost nothing with a benchmark) reach the
  per-(train, eval) aggregation.
- N-grams travel as 64-bit xxhash64 values, not strings: 8 bytes per
  n-gram in the broadcast and the match shuffle, and the join compares
  longs instead of ~50-char strings. Collisions (~2^-64 per pair) can
  only ADD a spurious shared-count unit, never remove a real one, so
  `decontaminate` errs on the safe (drop) side.
- Everything is column algebra inside whole-stage codegen: tokenize,
  slide, hash, explode — no Python in the hot path.

Tokenization matches `operators/dedup.with_tokens` (whitespace split),
so a doc's n-gram set here is exactly its dedup shingle set at the same
n — one vocabulary of "word n-gram" across the corpus-prep suite.
"""

from __future__ import annotations

from ..io_codec import INDEX_CODEC

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import with_tokens


def ngram_hash_df(df: DataFrame, n: int = 8, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """(doc_id, h): DISTINCT xxhash64 of every word n-gram per document.
    Docs with fewer than n tokens emit nothing."""
    toks = with_tokens(df, text_col)
    # size >= n guard: Spark's sequence(1, 0) descends to [1, 0] instead
    # of being empty, which would feed slice() an invalid start of 0
    return toks.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.when(
            F.size("_toks") >= n,
            F.array_distinct(F.transform(
                F.sequence(F.lit(1), F.size("_toks") - (n - 1)),
                lambda i: F.xxhash64(
                    F.array_join(F.slice("_toks", i, n), " ")),
            ))).otherwise(F.array().cast("array<long>"))).alias("h"))


def contamination_report(train: DataFrame, eval_df: DataFrame, n: int = 8,
                         train_id: str = "doc_id",
                         train_text: str = "text",
                         eval_id: str = "doc_id",
                         eval_text: str = "text",
                         eval_hashes: DataFrame | None = None) -> DataFrame:
    """(train_id, eval_id, n_shared): every train/eval document pair
    sharing at least one word n-gram, with the count of DISTINCT shared
    n-grams. One broadcast hash join against the eval n-gram set — the
    train side is never shuffled; only matching rows reach the pair
    aggregation. Pass `eval_hashes` (a cached `ngram_hash_df(eval_df, n)`
    renamed to (eval_id, h)) to amortize the eval side across many calls
    — e.g. one per streaming micro-batch."""
    tr = (ngram_hash_df(train, n, train_text, train_id)
          .withColumnRenamed("doc_id", "train_id"))
    if eval_hashes is None:
        eval_hashes = (ngram_hash_df(eval_df, n, eval_text, eval_id)
                       .withColumnRenamed("doc_id", "eval_id"))
    return (tr.join(F.broadcast(eval_hashes), on="h")
            .groupBy("train_id", "eval_id")
            .agg(F.count("*").alias("n_shared")))


def decontaminate(train: DataFrame, eval_df: DataFrame, n: int = 8,
                  min_shared: int = 1, train_id: str = "doc_id",
                  train_text: str = "text", eval_id: str = "doc_id",
                  eval_text: str = "text",
                  eval_hashes: DataFrame | None = None) -> DataFrame:
    """Train rows that are NOT contaminated: a train doc is dropped when
    it shares >= `min_shared` distinct n-grams with ANY single eval doc
    (min_shared=1 is the strict published setting; raise it to tolerate
    incidental boilerplate overlap). The dropped set is tiny, so the
    anti-join broadcasts."""
    bad = (contamination_report(train, eval_df, n, train_id, train_text,
                                eval_id, eval_text, eval_hashes)
           .where(F.col("n_shared") >= min_shared)
           .select("train_id").distinct())
    return train.join(
        F.broadcast(bad.withColumnRenamed("train_id", train_id)),
        on=train_id, how="left_anti")


def attach_decontaminator(
    stream_docs: DataFrame,
    eval_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    n: int = 8,
    min_shared: int = 1,
    train_id: str = "doc_id",
    train_text: str = "text",
    eval_id: str = "doc_id",
    eval_text: str = "text",
    trigger_available_now: bool = True,
):
    """Streaming decontamination: each micro-batch of training documents
    is filtered against the eval set and the CLEAN rows append to
    `out_dir` as parquet — the training-data-firehose form of
    `decontaminate` (same foreachBatch pattern as the incremental
    indexers). The eval n-gram hash set is computed once and CACHED
    across batches (benchmark-sized by contract), so each batch pays
    only its own n-gram pass plus the broadcast join."""
    ev = (ngram_hash_df(eval_df, n, eval_text, eval_id)
          .withColumnRenamed("doc_id", "eval_id").cache())
    ev.count()  # materialize once, before the stream starts

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        (decontaminate(batch_df, eval_df, n, min_shared, train_id,
                       train_text, eval_id, eval_text, eval_hashes=ev)
         .write.option("compression", INDEX_CODEC).mode("append").parquet(out_dir))

    from ..streaming.wiring import start_foreach_batch
    # the cached eval hash set lives for the stream's lifetime only
    return start_foreach_batch(stream_docs, handle, checkpoint_dir,
                               trigger_available_now,
                               on_terminated=lambda: ev.unpersist())
