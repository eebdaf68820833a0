"""Block-max WAND on a Zipf-skewed corpus — the pruning-wins evidence.

The driver testdata has a uniform 29-term vocabulary, where block-max
bounds are all equal and pruning cannot help (scripts/wand_crossover.py
shows the adaptive planner correctly refusing to prune there). Real
corpora are Zipfian: a query mixing a rare high-idf term with a common
low-idf term lets θ (seeded from the rare term's dense blocks) eliminate
almost every block of the common term. This script synthesizes such a
corpus at a size where the large-segment path engages
(len(terms)·ceil(n_docs/128) > SMALL_SEGMENT_BLOCKS), then times:

  - exact         (row-postings scan)
  - blockmax      (adaptive → 2-action seed+prune)
  - decode-all    (pruning disabled: every query-term block decoded)

and asserts rank identity. Usage:
    python scripts/wand_skew_demo.py [n_docs] [cpus] [out_dir]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_600_000
    cpus = sys.argv[2] if len(sys.argv) > 2 else "32"
    out_dir = sys.argv[3] if len(sys.argv) > 3 else "/dev/shm/tsp_skew_idx"

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .config("spark.sql.shuffle.partitions", str(int(cpus) * 2))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "24g")
             .config("spark.local.dir", "/dev/shm/tsp_skew_local")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from pg_ts_semantic_headline_spark.plans import search as S
    from pg_ts_semantic_headline_spark.plans.index_build import (
        build_index, load_index)

    # ~25 words/doc from a 5000-word vocabulary with log-uniform ranks
    # (power-law-ish): rank = floor(exp(u·ln V)) — rank 1 is ~8% of all
    # occurrences, rank 4999 is one-in-a-million. Deterministic via hash.
    V = 5000
    docs = (spark.range(n_docs).toDF("doc_id")
            .withColumn("content", F.array_join(F.transform(
                F.sequence(F.lit(1), F.lit(25)),
                lambda i: F.concat(
                    F.lit("w"),
                    F.floor(F.exp(
                        (F.pmod(F.xxhash64(F.col("doc_id") * 31 + i),
                                F.lit(1_000_000)) / 1_000_000.0)
                        * float(__import__("math").log(V))))
                    .cast("int"))), " ")))

    # TSP_SKEW_KEEP=1 keeps the index dir and resumes an existing build
    # (same input signature → no-op) so probe iterations skip the ~7-min
    # corpus build
    keep = os.environ.get("TSP_SKEW_KEEP") == "1"
    import shutil
    if not keep:
        shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.time()
    build_index(spark, docs, out_dir, config="simple", n_buckets=32,
                block_span=128, resume=keep, min_analyze_partitions=0)
    build_sec = time.time() - t0
    index = load_index(spark, out_dir)

    # pick one very common and one rare-but-present term from the built
    # dictionary (df-extremes make the bound spread maximal)
    trow = index.terms.orderBy(F.desc("df")).first()
    common = trow["term"]
    rare = (index.terms.where(F.col("df").between(200, 2000))
            .orderBy("df", "term").first()["term"])
    terms = [common, rare]
    max_blocks = len(terms) * ((index.n_docs + 127) // 128)

    def timed(fn, n=3):
        ts = []
        for _ in range(n):
            t0 = time.time()
            fn()
            ts.append(time.time() - t0)
        return round(min(ts), 3)

    S.bm25_topk(index, terms, k=10, mode="exact").collect()   # warm
    S.bm25_topk(index, terms, k=10, mode="blockmax").collect()

    out = {"n_docs": index.n_docs, "cpus": int(cpus),
           "build_sec": round(build_sec, 1),
           "terms": terms, "max_blocks": max_blocks,
           "prune_path_engaged": max_blocks > S.SMALL_SEGMENT_BLOCKS}
    out["exact_s"] = timed(
        lambda: S.bm25_topk(index, terms, k=10, mode="exact").collect())
    out["blockmax_pruned_s"] = timed(
        lambda: S.bm25_topk(index, terms, k=10, mode="blockmax").collect())

    small = S.SMALL_SEGMENT_BLOCKS
    S.SMALL_SEGMENT_BLOCKS = 10 ** 12   # force decode-everything
    try:
        S.bm25_topk(index, terms, k=10, mode="blockmax").collect()
        out["blockmax_decode_all_s"] = timed(
            lambda: S.bm25_topk(index, terms, k=10, mode="blockmax").collect())
        da = [(r["doc_id"], round(r["score"], 9)) for r in
              S.bm25_topk(index, terms, k=10, mode="blockmax").collect()]
    finally:
        S.SMALL_SEGMENT_BLOCKS = small
    pr = [(r["doc_id"], round(r["score"], 9)) for r in
          S.bm25_topk(index, terms, k=10, mode="blockmax").collect()]
    ex = [(r["doc_id"], round(r["score"], 9)) for r in
          S.bm25_topk(index, terms, k=10, mode="exact").collect()]
    assert da == pr == ex, (da[:3], pr[:3], ex[:3])
    out["rank_identical"] = True

    # candidate-filtered path: boolean AND of the same terms — the filter
    # (a postings-row semi plan on both sides) is identical work, so the
    # delta is the scoring strategy. Times all three filtered plans:
    # exact row-scan, direct candidate-block decode (default — the AND is
    # selective), θ-seeded prune (direct path force-disabled).
    from pg_ts_semantic_headline_spark.plans.query_compiler import to_tspquery
    fq = to_tspquery("simple", f"{rare} & {common}")
    S.search(index, fq, k=10, mode="exact").collect()      # warm
    S.search(index, fq, k=10, mode="blockmax").collect()
    out["filtered_exact_s"] = timed(
        lambda: S.search(index, fq, k=10, mode="exact").collect())
    out["filtered_blockmax_direct_s"] = timed(
        lambda: S.search(index, fq, k=10, mode="blockmax").collect())
    fex = [(r["doc_id"], round(r["score"], 9)) for r in
           S.search(index, fq, k=10, mode="exact").collect()]
    fpr = [(r["doc_id"], round(r["score"], 9)) for r in
           S.search(index, fq, k=10, mode="blockmax").collect()]
    direct_cap = S.FILTERED_DIRECT_DOC_CAP
    S.FILTERED_DIRECT_DOC_CAP = -1     # force θ-seeded filtered pruning
    try:
        S.search(index, fq, k=10, mode="blockmax").collect()
        out["filtered_blockmax_theta_s"] = timed(
            lambda: S.search(index, fq, k=10, mode="blockmax").collect())
        fth = [(r["doc_id"], round(r["score"], 9)) for r in
               S.search(index, fq, k=10, mode="blockmax").collect()]
    finally:
        S.FILTERED_DIRECT_DOC_CAP = direct_cap
    assert fex == fpr == fth and fex, (fex[:3], fpr[:3], fth[:3])
    out["filtered_rank_identical"] = True

    print(json.dumps(out))
    if not keep:
        shutil.rmtree(out_dir, ignore_errors=True)
        shutil.rmtree("/dev/shm/tsp_skew_local", ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
