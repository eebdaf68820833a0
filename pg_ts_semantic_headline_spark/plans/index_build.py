"""Global positional inverted-index build.

Replaces the reference's per-row trigger upkeep
(/root/reference/development_schema.sql:18-34: content_tsv/content_arr
columns + GIN index) with a batch job producing five persisted tables under
one index directory:

- tokens/    doc_id, tokens array<string>, dl, sha256   (recall vectors +
             per-row invariant column)
- postings/  bucket=<b>/ term, doc_id, tf, dl, positions array<int>
             — columnar row form, directory-partitioned by term bucket so a
             query's term lookup prunes to a handful of files; doc length is
             denormalized to kill the docstats join at query time
- packed/    bucket=<b>/ term, block_id, base_doc, n_docs, max_tf,
             max_impact, payload binary — delta+varint compressed blocks of
             128 docs each (doc-contiguous), with per-block max BM25 impact
             for block-max pruning
- terms/     term, bucket, df, cf, idf — the dictionary
- stats/     n_docs, avgdl, config, prep_version — corpus stats + the
             engine's analog of the reference's TSPVector marker domain
             check (/root/reference/sql/base_domain.sql:23-28): a loader
             assertion that content went through the canonical pipeline

plus _manifest/ — per-stage, per-partition lineage rows (row counts,
checksums, wall ms, input signature). A re-run with the same input signature
skips completed stages: that is the checkpoint-resume contract. Lineage
aggregates are computed from the stage's pre-write DataFrame (cached), not
by re-scanning written output — at corpus scale a read-back would double
the build I/O.

Shuffle budget: one shuffle to group (term, doc_id), one to write bucketed
postings, one (term, block) grouping for packed blocks. Aggregations are all
partial-aggregate-friendly; keys include doc_id or block_id, so hot terms
("def", "the") spread across reducers instead of hammering one.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (BinaryType, DoubleType, IntegerType, LongType,
                               StringType, StructField, StructType)

from .analyze import with_analysis
from .packing import pack_block

K1 = 1.2
B = 0.75
PREP_VERSION = "tsp-spark-1"
DEFAULT_BLOCK_SPAN = 128

PACKED_SCHEMA = StructType([
    StructField("term", StringType(), False),
    StructField("bucket", IntegerType(), False),
    StructField("block_id", LongType(), False),
    StructField("base_doc", LongType(), False),
    StructField("n_docs", IntegerType(), False),
    StructField("max_tf", IntegerType(), False),
    StructField("max_impact", DoubleType(), False),
    StructField("payload", BinaryType(), False),
])


def bm25_impact(tf, dl, idf, avgdl):
    return idf * (tf * (K1 + 1)) / (tf + K1 * (1 - B + B * dl / avgdl))


def idf_expr(df_col, n_docs):
    """Lucene-style always-positive BM25 idf: ln(1 + (N - df + .5)/(df + .5))."""
    return F.log(F.lit(1.0) + (F.lit(float(n_docs)) - df_col + 0.5) / (df_col + 0.5))


@dataclass
class IndexPaths:
    root: str

    @property
    def tokens(self): return f"{self.root}/tokens"
    @property
    def postings(self): return f"{self.root}/postings"
    @property
    def packed(self): return f"{self.root}/packed"
    @property
    def terms(self): return f"{self.root}/terms"
    @property
    def stats(self): return f"{self.root}/stats"
    @property
    def manifest(self): return f"{self.root}/_manifest"


def _input_signature(docs: DataFrame, doc_id: str) -> tuple[int, int]:
    row = docs.select(
        F.count("*").alias("n"),
        F.coalesce(F.bit_xor(F.xxhash64(doc_id)), F.lit(0)).alias("h")).first()
    return int(row["n"]), int(row["h"])


def _completed_stages(spark: SparkSession, paths: IndexPaths,
                      signature: tuple[int, int]) -> set[str]:
    try:
        m = spark.read.parquet(paths.manifest)
    except Exception:
        return set()
    rows = (m.where((F.col("sig_n") == signature[0])
                    & (F.col("sig_h") == signature[1]))
            .select("stage").distinct().collect())
    return {r["stage"] for r in rows}


def _write_manifest(spark: SparkSession, paths: IndexPaths, stage: str,
                    signature: tuple[int, int], partition_rows,
                    wall_ms: int) -> None:
    schema = StructType([
        StructField("stage", StringType(), False),
        StructField("partition_id", LongType(), False),
        StructField("row_count", LongType(), False),
        StructField("checksum", LongType(), False),
        StructField("wall_ms", LongType(), False),
        StructField("sig_n", LongType(), False),
        StructField("sig_h", LongType(), False),
    ])
    rows = [(stage, int(p), int(c), int(h), wall_ms,
             signature[0], signature[1]) for p, c, h in partition_rows]
    spark.createDataFrame(rows, schema).write.mode("append").parquet(paths.manifest)


def _lineage(df: DataFrame, part_col, checksum_col) -> list:
    rows = (df.groupBy(part_col.alias("p"))
              .agg(F.count("*").alias("c"),
                   F.coalesce(F.bit_xor(F.xxhash64(checksum_col)), F.lit(0)).alias("h"))
              .collect())
    return [(r["p"], r["c"], r["h"]) for r in rows]


def _packing_kernel(avgdl: float):
    """applyInPandas kernel keyed on (bucket, block_id): one pandas group per
    doc-block per term-bucket (NOT per term — per-term grouping creates
    vocabulary-many tiny groups and the per-group overhead dominates).
    Memory per group is bounded by one doc-block's postings for 1/n_buckets
    of the vocabulary."""

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["term", "doc_id"])
        bucket = int(pdf["bucket"].iloc[0])
        block_id = int(pdf["block_id"].iloc[0])
        base_doc = int(pdf["base_doc"].iloc[0])
        out = []
        for term, g in pdf.groupby("term", sort=False):
            tfs = g["tf"].tolist()
            dls = g["dl"].tolist()
            idf = float(g["idf"].iloc[0])
            payload = pack_block(g["doc_id"].tolist(), tfs,
                                 g["positions"].tolist(), base_doc)
            max_impact = max(
                bm25_impact(tf, dl, idf, avgdl) for tf, dl in zip(tfs, dls))
            out.append({
                "term": term, "bucket": bucket, "block_id": block_id,
                "base_doc": base_doc, "n_docs": len(g),
                "max_tf": int(max(tfs)), "max_impact": float(max_impact),
                "payload": payload,
            })
        return pd.DataFrame(out)

    return pack


def build_index(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    content_col: str = "content",
    config: str = "english",
    doc_id: str = "doc_id",
    n_buckets: int = 32,
    block_span: int = DEFAULT_BLOCK_SPAN,
    resume: bool = True,
    build_packed: bool = True,
    min_analyze_partitions: int | None = None,
    metrics: dict | None = None,
) -> IndexPaths:
    """Batch index build; idempotent and stage-resumable.

    `metrics`, if given, is filled with per-stage wall seconds (same numbers
    the manifest persists) — the build-job observability hook.
    """
    from pyspark import StorageLevel

    paths = IndexPaths(out_dir)
    # the signature job exists to key resume decisions; skip it entirely for
    # fresh (resume=False) builds
    signature = _input_signature(docs, doc_id) if resume else (0, 0)
    done = _completed_stages(spark, paths, signature) if resume else set()
    if metrics is None:
        metrics = {}

    # A small upstream file count must not serialize the expensive tokenize
    # UDF: spread input across the cluster before analysis. (A 100 TB scan
    # already arrives in thousands of splits; this guards the small-file /
    # coalesced-scan case. inputFiles() is a metadata listing — cheap,
    # unlike df.rdd which forces a full plan-to-RDD conversion.)
    target_parts = (min_analyze_partitions
                    if min_analyze_partitions is not None
                    else spark.sparkContext.defaultParallelism * 2)
    try:
        few_splits = len(docs.inputFiles()) < target_parts
    except Exception:
        few_splits = True
    if few_splits:
        docs = docs.repartition(target_parts)

    analyzed = with_analysis(docs, content_col=content_col, config=config)
    # content is dropped from the cached projection: the expensive tokenize
    # runs exactly once, and every downstream stage reads the cache
    analyzed = analyzed.select(
        F.col(doc_id).alias("doc_id"),
        "tokens", "lexemes",
        F.size(F.filter("lexemes", lambda x: x.isNotNull())).alias("dl"),
        F.sha2(F.col(content_col), 256).alias("sha256"),
    ).persist(StorageLevel.MEMORY_AND_DISK)

    # ---- stage: tokens (recall vectors + invariant column) ----
    corpus_obs = None
    if "tokens" not in done:
        from pyspark.sql import Observation
        t0 = time.time()
        corpus_obs = Observation("corpus_stats")
        tok = analyzed.select("doc_id", "tokens", "dl", "sha256")
        # corpus stats ride the same pass — no separate stats job
        (tok.observe(corpus_obs, F.count(F.lit(1)).alias("n_docs"),
                     F.avg("dl").alias("avgdl"))
         .write.mode("overwrite").parquet(paths.tokens))
        metrics["tokens_sec"] = time.time() - t0
        _write_manifest(spark, paths, "tokens", signature,
                        _lineage(tok, F.spark_partition_id(), F.col("doc_id")),
                        int((time.time() - t0) * 1000))

    # ---- stage: postings rows, bucketed by term hash ----
    lex = (analyzed
           .select("doc_id", "dl", F.posexplode("lexemes").alias("pos0", "term"))
           .where(F.col("term").isNotNull())
           .select("doc_id", "dl", "term", (F.col("pos0") + 1).alias("pos")))
    per_term_doc = (lex
                    .groupBy("term", "doc_id")
                    .agg(F.count("*").alias("tf"),
                         F.sort_array(F.collect_list("pos")).alias("positions"),
                         F.first("dl").alias("dl"))
                    .withColumn("bucket",
                                F.pmod(F.xxhash64("term"), F.lit(n_buckets))
                                .cast("int"))
                    .persist(StorageLevel.MEMORY_AND_DISK))

    if "postings" not in done:
        t0 = time.time()
        (per_term_doc
         .repartition(n_buckets, "bucket")
         .sortWithinPartitions("term", "doc_id")
         .write.mode("overwrite").partitionBy("bucket").parquet(paths.postings))
        metrics["postings_sec"] = time.time() - t0
        _write_manifest(spark, paths, "postings", signature,
                        _lineage(per_term_doc, F.col("bucket").cast("long"),
                                 F.concat_ws("|", "term", "doc_id")),
                        int((time.time() - t0) * 1000))

    # ---- stage: terms dictionary + corpus stats ----
    terms_mem = None
    avgdl_mem = None
    if "terms" not in done:
        t0 = time.time()
        if corpus_obs is not None:
            got = corpus_obs.get
            n_docs, avgdl = int(got["n_docs"]), float(got["avgdl"])
        else:
            stats_row = analyzed.select(
                F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")).first()
            n_docs, avgdl = int(stats_row["n_docs"]), float(stats_row["avgdl"])
        avgdl_mem = avgdl
        terms = (per_term_doc
                 .groupBy("term")
                 .agg(F.count("*").alias("df"), F.sum("tf").alias("cf"),
                      F.first("bucket").alias("bucket"))
                 .withColumn("idf", idf_expr(F.col("df"), n_docs)))
        terms_mem = terms
        terms.write.mode("overwrite").parquet(paths.terms)
        spark.createDataFrame(
            [(n_docs, avgdl, config, PREP_VERSION, n_buckets, block_span)],
            "n_docs long, avgdl double, config string, prep_version string,"
            " n_buckets int, block_span int",
        ).write.mode("overwrite").parquet(paths.stats)
        metrics["terms_sec"] = time.time() - t0
        _write_manifest(spark, paths, "terms", signature,
                        _lineage(terms, F.lit(0).cast("long"), F.col("term")),
                        int((time.time() - t0) * 1000))

    # ---- stage: packed blocks (delta+varint, block-max metadata) ----
    if build_packed and "packed" not in done:
        t0 = time.time()
        if avgdl_mem is not None:
            avgdl = avgdl_mem
            terms = terms_mem.select("term", "idf")
        else:
            avgdl = float(spark.read.parquet(paths.stats).first()["avgdl"])
            terms = spark.read.parquet(paths.terms).select("term", "idf")
        blocks = (per_term_doc
                  .join(terms, on="term")
                  .withColumn("block_id", F.floor(F.col("doc_id") / block_span))
                  .withColumn("base_doc", F.col("block_id") * block_span))
        packed = blocks.groupBy("bucket", "block_id").applyInPandas(
            _packing_kernel(avgdl), schema=PACKED_SCHEMA)
        (packed.repartition(n_buckets, "bucket")
         .sortWithinPartitions("term", "block_id")
         .write.mode("overwrite").partitionBy("bucket").parquet(paths.packed))
        metrics["packed_sec"] = time.time() - t0
        written = spark.read.parquet(paths.packed)
        _write_manifest(spark, paths, "packed", signature,
                        _lineage(written, F.col("bucket").cast("long"),
                                 F.concat_ws("|", "term", "block_id")),
                        int((time.time() - t0) * 1000))

    analyzed.unpersist()
    per_term_doc.unpersist()
    return paths


@dataclass
class Index:
    paths: IndexPaths
    tokens: DataFrame
    postings: DataFrame
    terms: DataFrame
    n_docs: int
    avgdl: float
    config: str
    n_buckets: int = 32
    block_span: int = DEFAULT_BLOCK_SPAN
    packed: DataFrame | None = None


def load_index(spark: SparkSession, out_dir: str) -> Index:
    paths = IndexPaths(out_dir)
    stats = spark.read.parquet(paths.stats).first()
    if stats["prep_version"] != PREP_VERSION:
        raise ValueError(
            f"index built with prep {stats['prep_version']!r}, "
            f"engine expects {PREP_VERSION!r}")
    try:
        packed = spark.read.parquet(paths.packed)
    except Exception:
        packed = None
    return Index(
        paths=paths,
        tokens=spark.read.parquet(paths.tokens),
        postings=spark.read.parquet(paths.postings),
        terms=spark.read.parquet(paths.terms),
        n_docs=int(stats["n_docs"]),
        avgdl=float(stats["avgdl"]),
        config=stats["config"],
        n_buckets=int(stats["n_buckets"]),
        block_span=int(stats["block_span"]),
        packed=packed,
    )
