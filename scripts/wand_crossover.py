"""Exact vs block-max WAND at a corpus size where pruning matters.

Usage: python scripts/wand_crossover.py <index_dir> [cpus]

Loads a prebuilt index (e.g. the 480k-doc scaling-job output) and times,
in one warm session with min-of-N:
  - exact (row postings scan),
  - blockmax adaptive (the planner picks its path),
  - blockmax with pruning forced (SMALL_SEGMENT_BLOCKS=0) — the
    large-segment 2-action path,
asserting rank identity between all of them. Prints one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    idx_dir = sys.argv[1]
    cpus = sys.argv[2] if len(sys.argv) > 2 else "32"

    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .config("spark.sql.shuffle.partitions", str(max(int(cpus), 16)))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "16g")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from pg_ts_semantic_headline_spark.plans import search as S
    from pg_ts_semantic_headline_spark.plans.index_build import load_index
    from pg_ts_semantic_headline_spark.plans.query_compiler import to_tspquery

    index = load_index(spark, idx_dir)
    queries = [to_tspquery("english", s) for s in
               ["spark & window", "batch | stream", "filter<2>scan",
                "query & !vector", "merge & sort & join"]]

    def run_mode(mode):
        for q in queries:
            S.bm25_topk(index, q, k=10, mode=mode).collect()

    def timed(fn, n=3):
        ts = []
        for _ in range(n):
            t0 = time.time()
            fn()
            ts.append((time.time() - t0) / len(queries))
        return round(min(ts), 3)

    # warm
    run_mode("exact")
    run_mode("blockmax")

    out = {"index": idx_dir, "cpus": int(cpus), "n_docs": index.n_docs,
           "blocks_per_term_max":
               (index.n_docs + index.block_span - 1) // index.block_span}
    out["exact_s_per_query"] = timed(lambda: run_mode("exact"))
    out["blockmax_adaptive_s_per_query"] = timed(lambda: run_mode("blockmax"))

    small_default = S.SMALL_SEGMENT_BLOCKS
    S.SMALL_SEGMENT_BLOCKS = 0
    try:
        run_mode("blockmax")  # warm the pruned path
        out["blockmax_pruned_s_per_query"] = timed(lambda: run_mode("blockmax"))
        # rank identity across all three physical paths
        for q in queries:
            pruned = [(r["doc_id"], round(r["score"], 9)) for r in
                      S.bm25_topk(index, q, k=10, mode="blockmax").collect()]
            S.SMALL_SEGMENT_BLOCKS = small_default
            adaptive = [(r["doc_id"], round(r["score"], 9)) for r in
                        S.bm25_topk(index, q, k=10, mode="blockmax").collect()]
            exact = [(r["doc_id"], round(r["score"], 9)) for r in
                     S.bm25_topk(index, q, k=10, mode="exact").collect()]
            S.SMALL_SEGMENT_BLOCKS = 0
            assert pruned == adaptive == exact, q.raw
        out["rank_identical"] = True
    finally:
        S.SMALL_SEGMENT_BLOCKS = small_default

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
