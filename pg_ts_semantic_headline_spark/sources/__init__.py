"""Corpus loaders / normalizers.

The engine's canonical input is the Iceberg-shaped source-code table
(repo, path, commit, lang, content). `normalize_corpus` maps arbitrary
document tables onto that shape and derives the stable doc_id the index
uses everywhere (xxhash64 of the natural key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORPUS_COLUMNS = ("repo", "path", "commit", "lang", "content")


def normalize_corpus(
    df: DataFrame,
    repo_col: str | None = None,
    path_col: str | None = None,
    commit_col: str | None = None,
    lang_col: str | None = None,
    content_col: str = "content",
    doc_id_col: str | None = None,
) -> DataFrame:
    """Project any doc table to (doc_id, repo, path, commit, lang, content).

    doc_id = existing id column if given, else xxhash64(repo, path, commit)
    — deterministic and collision-safe at corpus scale (64-bit over natural
    keys)."""
    repo = F.col(repo_col) if repo_col else F.lit("unknown")
    path = F.col(path_col) if path_col else F.lit("unknown")
    commit = F.col(commit_col) if commit_col else F.lit("HEAD")
    lang = F.col(lang_col) if lang_col else F.lit("simple")
    doc_id = (F.col(doc_id_col).cast("long") if doc_id_col
              else F.xxhash64(repo, path, commit))
    return df.select(
        doc_id.alias("doc_id"), repo.alias("repo"), path.alias("path"),
        commit.alias("commit"), lang.alias("lang"),
        F.col(content_col).alias("content"))


def load_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load the driver testdata documents table normalized to corpus shape."""
    raw = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return normalize_corpus(
        raw, lang_col=None, content_col="text", doc_id_col="doc_id",
    ).withColumn("lang", F.lit("simple"))


def load_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")

from .readers import (  # noqa: E402
    parse_warc_bytes,
    read_csv_corpus,
    read_jsonl,
    read_text_lines,
    read_warc,
    read_whole_files,
    warc_text_documents,
)
from .writers import (  # noqa: E402
    write_corpus,
    write_jsonl,
    write_stream_corpus,
)
