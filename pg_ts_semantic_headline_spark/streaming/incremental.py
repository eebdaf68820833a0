"""Incremental index maintenance (the reference's trigger analog).

The reference keeps content_tsv/content_arr fresh with a BEFORE INSERT/UPDATE
trigger (/root/reference/development_schema.sql:18-34). The Spark-native
analog is Structured Streaming: a stream of new documents is folded into the
persisted index with `foreachBatch`, each micro-batch running the same
deterministic build pipeline over just the batch:

- tokens rows are appended (doc_id-keyed; replaces require compaction),
- postings rows for the batch are appended under the same term-bucket
  directory layout (readers see the union),
- terms/stats are re-aggregated from the postings (idf shifts with every N
  change, so the dictionary is recomputed — it is small relative to
  postings; at 100 TB this re-agg is a cheap metadata-scale job),
- packed blocks are DELETED: merged docs are absent from packed block
  metadata (they could never become block-max candidates) and the stored
  max_tf_norm bounds bake the pre-merge avgdl, so a stale packed table
  silently corrupts block-max results. Deleting forces load_index to
  return packed=None — block-max mode refuses, exact mode sees everything
  — until a compaction run (build_index resume over the union) repacks.

`merge_batch` is the foreachBatch body and is directly unit-testable without
a streaming runtime; `attach_incremental_indexer` wires it to a stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.index_build import IndexPaths, idf_expr


def merge_batch(
    spark: SparkSession,
    index_dir: str,
    batch_docs: DataFrame,
    content_col: str = "content",
    config: str = "english",
    doc_id: str = "doc_id",
) -> None:
    """Fold one batch of new documents into the persisted index."""
    paths = IndexPaths(index_dir)
    stats = spark.read.parquet(paths.stats).first()
    n_buckets = int(stats["n_buckets"])

    from ..plans.analyze import analyze_index_udf
    analyzed = (batch_docs
                .withColumn("_a", analyze_index_udf(
                    F.col(content_col), F.lit(config)))
                .select(F.col(doc_id).alias("doc_id"),
                        F.col("_a.tokens").alias("tokens"),
                        F.col("_a.dl").alias("dl"),
                        F.col("_a.postings").alias("postings"),
                        F.sha2(F.col(content_col), 256).alias("sha256")))

    analyzed.select("doc_id", "tokens", "dl", "sha256") \
        .write.mode("append").parquet(paths.tokens)

    batch_postings = (analyzed
                      .select("doc_id", "dl", F.explode("postings").alias("p"))
                      .select("doc_id", "dl",
                              F.col("p.term").alias("term"),
                              F.col("p.tf").alias("tf"),
                              F.col("p.positions").alias("positions"))
                      .withColumn("bucket",
                                  F.pmod(F.xxhash64("term"), F.lit(n_buckets))
                                  .cast("int")))
    # match the base table's schema: a positions-free scoring projection
    # (row_positions=False builds) stays positions-free — after the packed
    # delete below, positional queries on such an index require a
    # compaction rebuild (and say so), while BM25 sees merged docs
    # immediately
    existing_cols = spark.read.parquet(paths.postings).columns
    if "positions" not in existing_cols:
        batch_postings = batch_postings.drop("positions")
    (batch_postings.repartition("bucket")
     .write.mode("append").partitionBy("bucket").parquet(paths.postings))

    # invalidate packed blocks BEFORE publishing new stats: a reader that
    # loads mid-merge sees either the old consistent index or packed=None,
    # never new stats over stale blocks (Hadoop FS API — works on HDFS/S3A
    # too, not just local disk)
    jvm = spark._jvm
    packed_path = jvm.org.apache.hadoop.fs.Path(paths.packed)
    fs = packed_path.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(packed_path):
        fs.delete(packed_path, True)

    # dictionary + stats re-aggregation (metadata-scale)
    all_tokens = spark.read.parquet(paths.tokens)
    srow = all_tokens.select(F.count("*").alias("n"), F.avg("dl").alias("a")).first()
    n_docs, avgdl = int(srow["n"]), float(srow["a"])
    all_postings = spark.read.parquet(paths.postings)
    terms = (all_postings.groupBy("term")
             .agg(F.count("*").alias("df"), F.sum("tf").alias("cf"),
                  F.first("bucket").alias("bucket"))
             .withColumn("idf", idf_expr(F.col("df"), n_docs)))
    # bucket-partitioned like build_index writes it: the on-disk dictionary
    # layout must stay identical across merges or _idf_lookup's directory
    # pruning silently degrades after the first merge
    terms.write.mode("overwrite").partitionBy("bucket").parquet(paths.terms)
    spark.createDataFrame(
        [(n_docs, avgdl, stats["config"], stats["prep_version"],
          n_buckets, int(stats["block_span"]))],
        "n_docs long, avgdl double, config string, prep_version string,"
        " n_buckets int, block_span int",
    ).write.mode("overwrite").parquet(paths.stats)


def attach_incremental_indexer(
    stream_docs: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    content_col: str = "content",
    config: str = "english",
    trigger_available_now: bool = True,
):
    """writeStream wiring: every micro-batch is merged into the index."""
    spark = stream_docs.sparkSession

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        merge_batch(spark, index_dir, batch_df,
                    content_col=content_col, config=config)

    writer = (stream_docs.writeStream
              .foreachBatch(handle)
              .option("checkpointLocation", checkpoint_dir))
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
