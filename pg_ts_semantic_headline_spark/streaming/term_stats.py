"""Streaming corpus-statistics operators: watermarked windowed term counts.

The reference's only "streaming" is trigger-based column upkeep
(/root/reference/development_schema.sql:18-34). Building at corpus scale,
an ingest pipeline also wants LIVE statistics over the arriving stream —
hot terms per time window, document arrival rates — without rebuilding the
index. This is idiomatic Structured Streaming: event-time window + a
watermark for late data, with the analysis UDF reused verbatim from the
batch path, so streaming and batch counts can never diverge.

`windowed_term_counts` is a pure transformation on a streaming DataFrame —
unit-testable via availableNow + a memory sink, deployable via
`writeStream` on anything.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_term_counts(
    stream_docs: DataFrame,
    content_col: str = "content",
    time_col: str = "event_time",
    config: str = "english",
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """(window, term, n_docs, n_occurrences) per event-time window.

    The stream carries (event_time, content); the SAME fused analysis UDF
    as the index build produces doc-local (term, tf) pairs (map-side
    combine: no one-row-per-token shuffle), then a watermarked windowed
    aggregation sums them. Late rows beyond the watermark are dropped by
    the engine; state is bounded by (windows in flight) × (vocab).
    """
    from ..plans.analyze import analyze_index_udf

    per_doc = (stream_docs
               .withWatermark(time_col, watermark)
               .withColumn("_a", analyze_index_udf(
                   F.col(content_col), F.lit(config)))
               .select(time_col, F.explode("_a.postings").alias("p"))
               .select(time_col,
                       F.col("p.term").alias("term"),
                       F.col("p.tf").alias("tf")))
    return (per_doc
            .groupBy(F.window(time_col, window).alias("window"), "term")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("tf").alias("n_occurrences")))


def doc_arrival_rates(
    stream_docs: DataFrame,
    time_col: str = "event_time",
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """(window, n_docs, total_bytes) — ingest-rate telemetry per window."""
    return (stream_docs
            .withWatermark(time_col, watermark)
            .groupBy(F.window(time_col, window).alias("window"))
            .agg(F.count("*").alias("n_docs"),
                 F.sum(F.length("content")).alias("total_bytes")))
