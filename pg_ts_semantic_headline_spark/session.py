"""Recommended Spark configuration for this engine.

`recommended_conf` returns the settings as a dict (testable, mergeable
into spark-submit `--conf` flags or an existing builder);
`configured_builder` applies them to a fresh builder. Nothing here is
magic — every entry is a documented consequence of how the engine's
plans are shaped — and every operator works on a stock session too.
"""

from __future__ import annotations


def recommended_conf(cores: int, sf_hint_gb: float | None = None) -> dict:
    """Engine-tuned settings for a session with `cores` total executor
    cores (cluster-wide, not per-executor).

    - AQE + skew-join ON: the candidate semi-joins (filtered search,
      dedup verify) and the metadata joins rely on runtime broadcast
      conversion and skew splitting instead of hand-tuned hints.
    - shuffle.partitions = 2×cores: the index build range-partitions
      the postings shuffle into ~2×cores ranges so sort/pack
      parallelism scales with the cluster, and hot terms split across
      consecutive reducers; query-path shuffles are metadata-scale and
      AQE coalesces them back down.
    - Arrow enabled: every text-analysis kernel is a pandas UDF; Arrow
      batch transfer is the difference between 10× and 100× over
      row-at-a-time Python.
    - files.maxPartitionBytes 256 MB when a corpus-size hint says the
      input is large: tokenization is CPU-bound per byte, so fewer,
      fatter scan tasks amortize Python worker startup; leave the
      128 MB default for small inputs (task-count starvation wins).
    """
    if cores < 1:
        raise ValueError("cores must be >= 1")
    conf = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.shuffle.partitions": str(2 * cores),
        "spark.sql.execution.arrow.pyspark.enabled": "true",
    }
    if sf_hint_gb is not None and sf_hint_gb >= 50:
        conf["spark.sql.files.maxPartitionBytes"] = str(256 * 1024 * 1024)
    return conf


def configured_builder(cores: int, master: str | None = None,
                       sf_hint_gb: float | None = None):
    """A `SparkSession.builder` with `recommended_conf` applied; pass
    `master` for local runs (e.g. "local[32]") and leave it unset under
    spark-submit/cluster managers."""
    from pyspark.sql import SparkSession

    b = SparkSession.builder
    if master:
        b = b.master(master)
    for k, v in recommended_conf(cores, sf_hint_gb).items():
        b = b.config(k, v)
    return b
