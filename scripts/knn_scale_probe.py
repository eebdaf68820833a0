"""kNN-join scale probe: self-join an N-vector synthetic corpus through
the IVF index at a realistic (n_lists, nprobe) and report build time,
join wall time, and queries/sec — evidence that the cogroup-matmul shape
holds as the corpus grows (the candidate work per query is
nprobe/n_lists of the corpus regardless of N).

Usage: python scripts/knn_scale_probe.py [n_vectors] [dim] [n_lists] [nprobe]
"""

import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

N = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
DIM = int(sys.argv[2]) if len(sys.argv) > 2 else 64
N_LISTS = int(sys.argv[3]) if len(sys.argv) > 3 else 64
NPROBE = int(sys.argv[4]) if len(sys.argv) > 4 else 4


def main():
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "64")
             .config("spark.driver.memory", "24g")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from pg_ts_semantic_headline_spark.operators.similarity import (
        build_ivf_index, ivf_knn_join, load_ivf_index)

    # deterministic synthetic vectors: 8 gaussian-ish clusters via
    # hash-derived pseudo-randoms (no Python RNG in the executors)
    vec = spark.range(N).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(DIM - 1)),
            lambda i: (F.pmod(F.xxhash64(F.col("id"), i), F.lit(1000))
                       .cast("double") / 500.0 - 1.0)
            + F.when(F.pmod(F.col("id"), 8) == F.pmod(i, F.lit(8)),
                     F.lit(3.0)).otherwise(F.lit(0.0)),
        ).alias("embedding"))
    vec = vec.persist()
    n = vec.count()

    d = tempfile.mkdtemp(prefix="knn_probe_")
    t0 = time.time()
    build_ivf_index(vec, d, n_lists=N_LISTS, seed=42)
    t_build = time.time() - t0
    idx = load_ivf_index(spark, d)

    q = vec.selectExpr("vec_id as query_id", "embedding")
    # warm
    ivf_knn_join(idx, q.limit(512), k=10, nprobe=NPROBE).count()
    t0 = time.time()
    rows = ivf_knn_join(idx, q, k=10, nprobe=NPROBE).count()
    t_join = time.time() - t0
    print(f"N={n} dim={DIM} n_lists={N_LISTS} nprobe={NPROBE}: "
          f"build {t_build:.1f}s, knn_join {t_join:.1f}s "
          f"({n / t_join:,.0f} queries/s, {rows} result rows)")
    spark.stop()


if __name__ == "__main__":
    main()
