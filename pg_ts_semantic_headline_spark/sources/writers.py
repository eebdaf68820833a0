"""Corpus sinks: parquet/JSONL writers with the file-layout controls a
large-scale pipeline needs — bounded file sizes (maxRecordsPerFile, so a
skewed partition never produces one giant file), optional directory
partitioning, and within-file ordering by doc id so downstream point
lookups row-group-prune.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_corpus(df: DataFrame, path: str,
                 partition_by: str | list[str] | None = None,
                 max_records_per_file: int | None = 1_000_000,
                 sort_by: str | None = "doc_id",
                 mode: str = "overwrite") -> None:
    """Write a document table as parquet with a scale-sane layout:

    - `max_records_per_file` bounds every output file regardless of
      partition skew (Spark splits a task's output when it crosses the
      bound — no salting dance needed just for file sizing);
    - `sort_by` orders rows within files so parquet min/max stats make
      id point-lookups and range scans row-group-prunable;
    - `partition_by` adds directory partitioning (e.g. lang) for
      predicate-pruned reads.
    """
    if sort_by is not None:
        if sort_by not in df.columns:
            raise ValueError(
                f"sort_by column {sort_by!r} not in {df.columns}; pass "
                "sort_by=None to write unsorted (silently skipping would "
                "void the row-group-pruning layout this function promises)")
        cols = ([partition_by] if isinstance(partition_by, str)
                else list(partition_by or []))
        df = df.sortWithinPartitions(*(cols + [sort_by]))
    w = df.write.mode(mode)
    if max_records_per_file is not None:
        w = w.option("maxRecordsPerFile", int(max_records_per_file))
    if partition_by:
        w = w.partitionBy(*([partition_by]
                            if isinstance(partition_by, str)
                            else list(partition_by)))
    w.parquet(path)


def write_jsonl(df: DataFrame, path: str,
                max_records_per_file: int | None = 1_000_000,
                compression: str | None = "gzip",
                mode: str = "overwrite") -> None:
    """Write as JSON-lines (the interchange format `read_jsonl` reads
    back): one object per line, gzip-compressed parts by default."""
    w = df.write.mode(mode)
    if max_records_per_file is not None:
        w = w.option("maxRecordsPerFile", int(max_records_per_file))
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def write_stream_corpus(stream_df: DataFrame, path: str,
                        checkpoint_dir: str,
                        partition_by: str | list[str] | None = None,
                        trigger_available_now: bool = True):
    """Streaming parquet sink for a document stream (exactly-once via the
    checkpoint; pair with `spark.readStream` sources or the operators'
    foreachBatch attachers when per-batch logic is needed)."""
    w = (stream_df.writeStream.format("parquet")
         .option("path", path)
         .option("checkpointLocation", checkpoint_dir))
    if partition_by:
        w = w.partitionBy(*([partition_by]
                            if isinstance(partition_by, str)
                            else list(partition_by)))
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()
