"""Trigram-index pruning probe: does indexed substring search beat a
full-scan `contains`, and does the gap widen with the corpus?

Replicates the sf documents table 1x and Nx (default 96x => ~480k docs)
with a per-replica doc_id offset, builds the trigram index at each scale,
and times:

- substring_search through the index (bucket-pruned AND-count candidates
  + contains verify on candidates only)
- the same predicate as a brute-force full scan (contains over every row)
- a rarer pattern (more required trigrams => tighter candidates)
- similarity_topk through the docstats + pruned-postings join

The claim under test: the full scan pays O(corpus bytes) per query; the
indexed path pays O(matching trigram postings + candidate rows), so the
indexed/brute ratio should grow with corpus size while candidate counts
track true-match counts. Prints one JSON line per scale plus ratios.

An optional 4th arg `inject` appends a deterministic synthetic identifier
token (`fn_handler_<doc_id % 50000>`) to every document and adds identifier
patterns to the query set — the code-search shape (large vocabulary,
selective needles) that the driver's tiny-vocabulary word-soup corpus
cannot express: there, common trigrams appear in ~half the corpus, so the
candidate filter is structurally unselective and a full scan wins (both
outcomes are reported; see BENCH/BASELINE.md).

A 5th arg `doc_rep=N` repeats each document's text N times: the document's
DISTINCT trigram set saturates (postings stay ~constant) while the text
bytes the brute-force scan must read grow N× — the document-size axis that
decides whether the index pays for itself.

Usage: python scripts/trigram_scale_probe.py [sf_dir] [replicate] [cpus] \
           [inject] [doc_rep=N]
"""

import json
import shutil
import sys
import tempfile
import time
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PATTERNS = ["merge join", "batch window spark", "slow filter value small"]


def min_of(fn, reps=2):
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    replicate = int(sys.argv[2]) if len(sys.argv) > 2 else 96
    cpus = sys.argv[3] if len(sys.argv) > 3 else "32"
    inject = len(sys.argv) > 4 and sys.argv[4] == "inject"
    doc_rep = 1
    for a in sys.argv[4:]:
        if a.startswith("doc_rep="):
            doc_rep = int(a.split("=")[1])

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .appName("tsp-trigram-scale-probe")
             .config("spark.sql.shuffle.partitions", str(max(int(cpus), 16)))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "24g")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from pg_ts_semantic_headline_spark.operators.trigram import (
        build_trigram_index, load_trigram_index, pattern_trigrams,
        similarity_topk, substring_search)

    base = spark.read.parquet(f"{sf_dir}/documents.parquet")
    results = {}
    for label, rep in (("small", 1), ("large", replicate)):
        docs = (base if rep == 1 else base
                .withColumn("rep", F.explode(
                    F.sequence(F.lit(0), F.lit(rep - 1))))
                .select((F.col("doc_id").cast("long")
                         + F.col("rep").cast("long") * 10_000_000)
                        .alias("doc_id"), "text"))
        if doc_rep > 1:
            docs = docs.withColumn(
                "text", F.array_join(F.array_repeat(F.col("text"),
                                                    doc_rep), " "))
        patterns = list(PATTERNS)
        if inject:
            docs = docs.withColumn(
                "text", F.concat_ws(" ", "text", F.concat(
                    F.lit("fn_handler_"),
                    F.pmod(F.col("doc_id"), F.lit(50_000)))))
            patterns += ["fn_handler_123", "handler_4321"]
        # materialize the replicated input so scan cost is identical for
        # both competitors (no explode re-execution inside the timed runs)
        src = tempfile.mkdtemp(prefix=f"trgm_src_{label}_")
        docs.write.mode("overwrite").parquet(src)
        docs = spark.read.parquet(src)
        n_docs = docs.count()

        idx_dir = tempfile.mkdtemp(prefix=f"trgm_idx_{label}_")
        t0 = time.time()
        build_trigram_index(docs, idx_dir, n_buckets=64)
        build_sec = time.time() - t0
        idx = load_trigram_index(spark, idx_dir)
        substring_search(idx, docs, patterns[0]).count()   # warm

        row = {"n_docs": n_docs, "build_sec": round(build_sec, 2)}
        for i, pat in enumerate(patterns):
            indexed = min_of(
                lambda p=pat: substring_search(idx, docs, p).count())
            brute = min_of(
                lambda p=pat: docs.where(
                    F.contains(F.lower("text"), F.lit(p.lower()))).count())
            cands = idx.candidate_ids(pattern_trigrams(pat)).count()
            hits = docs.where(
                F.contains(F.lower("text"), F.lit(pat.lower()))).count()
            row[f"p{i}_indexed_sec"] = round(indexed, 3)
            row[f"p{i}_brute_sec"] = round(brute, 3)
            row[f"p{i}_candidates"] = cands
            row[f"p{i}_matches"] = hits
        row["similarity_topk_sec"] = round(min_of(
            lambda: similarity_topk(idx, "merge join batch window",
                                    k=10, threshold=0.05).collect()), 3)
        results[label] = row
        print(json.dumps({label: row}), flush=True)
        shutil.rmtree(idx_dir, ignore_errors=True)
        shutil.rmtree(src, ignore_errors=True)

    s, l = results["small"], results["large"]
    ratios = {
        "corpus_growth": round(l["n_docs"] / s["n_docs"], 1),
        "build_growth": round(l["build_sec"] / s["build_sec"], 2),
    }
    n_patterns = len(PATTERNS) + (2 if inject else 0)
    for i in range(n_patterns):
        ratios[f"p{i}_indexed_growth"] = round(
            l[f"p{i}_indexed_sec"] / s[f"p{i}_indexed_sec"], 2)
        ratios[f"p{i}_brute_over_indexed_large"] = round(
            l[f"p{i}_brute_sec"] / l[f"p{i}_indexed_sec"], 2)
        ratios[f"p{i}_candidate_precision_large"] = round(
            l[f"p{i}_matches"] / max(l[f"p{i}_candidates"], 1), 3)
    print(json.dumps({"ratios": ratios}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
