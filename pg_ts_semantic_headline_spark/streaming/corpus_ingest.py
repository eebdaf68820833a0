"""Streaming corpus preparation: the `prepare_corpus` cleaning pipeline
(annotate → filter-with-reason → dedup) run per micro-batch over a
document firehose, with EXACT dedup extended ACROSS batches via a
persisted fingerprint store — the continuous-ingestion counterpart of
the batch pipeline (a training-data feed never sees its corpus all at
once).

Layout under `out_dir`:

    data/batch_id=N/     kept rows of batch N (drop_reason IS NULL)
    _seen/batch_id=N/    md5 fingerprints of batch N's kept rows
    _report/batch_id=N/  one-row `corpus_report` for batch N

Semantics: within a batch, `prepare_corpus`'s rules apply unchanged
(lowest doc_id per hash is canonical); across batches, first-batch-wins —
a row whose text hash appears in ANY EARLIER batch's fingerprints is
dropped as 'exact_dup'. `near_dedup=True` remains WITHIN-batch only (a
cross-batch MinHash store is a different, far heavier artifact; the
exact store is the standard continuous-dedup layer).

Crash safety / exactly-once: every write is `mode("overwrite")` into a
batch_id-deterministic directory, so a replayed micro-batch (checkpoint
not yet committed) rewrites the same paths instead of appending
duplicates; the cross-batch fingerprint read filters `batch_id <
current`, so a replay never collides with its own half-written
fingerprints. Readers between a crash and the replay may see a
partially written batch directory — the same parquet-append caveat as
`attach_vector_indexer`.

Scale shape: the fingerprint store grows with the corpus (16-byte md5
per kept doc), so the dedup join is structured so the STORE is never
shuffled — the batch's distinct hashes broadcast INTO the store scan
(left-semi), and only the ≤|batch| hits broadcast back onto the batch
frame. At 10^12 docs, partition `_seen` by a hash prefix so the
semi-join prunes directories as well.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from ..operators.pipeline import corpus_report, prepare_corpus


def _seen_hashes(spark: SparkSession, seen_dir: str,
                 before_batch: int) -> DataFrame | None:
    """Fingerprints of batches STRICTLY BEFORE `before_batch` (None when
    the store does not exist yet). The `<` filter is what makes replays
    safe: batch N never deduplicates against its own prior attempt."""
    try:
        seen = spark.read.parquet(seen_dir)
    except AnalysisException:
        return None
    return seen.where(F.col("batch_id") < before_batch).select("h")


def prepare_corpus_batch(
    batch_df: DataFrame,
    out_dir: str,
    batch_id: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    **prep_kwargs,
) -> None:
    """One incremental step: run `prepare_corpus(**prep_kwargs)` on the
    batch, extend exact dedup against all earlier batches' fingerprints,
    then write kept rows, new fingerprints, and the per-batch report —
    each idempotently into `.../batch_id={batch_id}`. Callable directly
    (backfill jobs) or per micro-batch via `attach_corpus_preparer`."""
    spark = batch_df.sparkSession
    ann = prepare_corpus(batch_df, text_col=text_col, id_col=id_col,
                         **prep_kwargs)
    ann = ann.withColumn("_h", F.md5(F.col(text_col)))
    seen = _seen_hashes(spark, f"{out_dir}/_seen", batch_id)
    if seen is not None:
        # store-side scan is semi-joined by the BROADCAST batch hashes
        # (the store is huge, the batch is small — never shuffle the
        # store); the ≤|batch| hits broadcast back onto the batch frame
        batch_h = ann.select("_h").distinct()
        hits = (seen.withColumnRenamed("h", "_h")
                .join(F.broadcast(batch_h), on="_h", how="left_semi")
                .distinct()
                .withColumn("_prior", F.lit(True)))
        ann = (ann.join(F.broadcast(hits), on="_h", how="left")
               .withColumn("drop_reason",
                           F.coalesce(F.col("drop_reason"),
                                      F.when(F.col("_prior"),
                                             F.lit("exact_dup"))))
               .drop("_prior"))
    ann = ann.persist()
    try:
        kept = ann.where(F.col("drop_reason").isNull())
        (kept.drop("_h").write.mode("overwrite")
         .parquet(f"{out_dir}/data/batch_id={batch_id}"))
        (kept.select(F.col("_h").alias("h")).distinct()
         .write.mode("overwrite")
         .parquet(f"{out_dir}/_seen/batch_id={batch_id}"))
        (corpus_report(ann).write.mode("overwrite")
         .parquet(f"{out_dir}/_report/batch_id={batch_id}"))
    finally:
        ann.unpersist()


def attach_corpus_preparer(
    stream_docs: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    trigger_available_now: bool = True,
    **prep_kwargs,
):
    """writeStream wiring: each micro-batch runs `prepare_corpus_batch`.
    `prep_kwargs` forward to `prepare_corpus` (min_tokens, min_quality,
    allowed_langs, redact, near_dedup — the last within-batch only)."""
    def handle(batch_df: DataFrame, batch_id: int) -> None:
        prepare_corpus_batch(batch_df, out_dir, batch_id,
                             text_col=text_col, id_col=id_col,
                             **prep_kwargs)

    from .wiring import start_foreach_batch
    return start_foreach_batch(stream_docs, handle, checkpoint_dir,
                               trigger_available_now)
