"""verify_index (fsck): healthy index passes, mutations downgrade the
right checks, and physical corruption is detected."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from pg_ts_semantic_headline_spark.plans.fsck import verify_index
from pg_ts_semantic_headline_spark.plans.index_build import build_index
from pg_ts_semantic_headline_spark.streaming import delete_docs, merge_batch

CONFIG = "simple"
BASE = [(i, f"alpha beta gamma doc{i} common words here") for i in range(20)]


def _report(spark, out, deep=False):
    return {r["check"]: r for r in
            verify_index(spark, out, deep=deep).collect()}


@pytest.fixture()
def index_dir(spark, tmp_path):
    out = str(tmp_path / "idx")
    df = spark.createDataFrame(BASE, ["doc_id", "content"])
    build_index(spark, df, out, config=CONFIG, n_buckets=4, block_span=8)
    return out


def test_healthy_index_all_ok(spark, index_dir):
    rep = _report(spark, index_dir, deep=True)
    bad = {k: (v["status"], v["expected"], v["actual"], v["detail"])
           for k, v in rep.items() if v["status"] == "fail"}
    assert not bad, bad
    # the deep reconciliations actually ran on a fresh build
    for check in ("terms_vs_postings_df", "packed_vs_postings",
                  "build_checksum_postings", "stats_n_docs"):
        assert rep[check]["status"] == "ok", rep[check]


def test_merge_flags_stale_packed_and_stays_consistent(spark, index_dir):
    batch = spark.createDataFrame(
        [(100, "fresh needle document beta")], ["doc_id", "content"])
    merge_batch(spark, index_dir, batch, config=CONFIG)
    rep = _report(spark, index_dir, deep=True)
    assert rep["packed_state"]["status"] == "warn"          # compaction due
    assert rep["packed_vs_postings"]["status"] == "skip"
    assert rep["build_checksums"]["status"] == "skip"       # gen > 0
    # the live-stats and dictionary invariants hold across the merge
    for check in ("stats_n_docs", "stats_avgdl", "terms_vs_postings_df",
                  "terms_vs_postings_cf", "files_vs_manifest_postings"):
        assert rep[check]["status"] == "ok", rep[check]


def test_tombstoned_delete_keeps_invariants(spark, index_dir):
    delete_docs(spark, index_dir, [3, 4])
    rep = _report(spark, index_dir, deep=True)
    assert rep["tombstone_gen"]["status"] == "ok"
    assert rep["stats_n_docs"]["status"] == "ok"
    assert rep["terms_vs_postings_df"]["status"] == "ok"


def test_corrupt_stats_detected(spark, index_dir):
    stats = spark.read.parquet(f"{index_dir}/stats").collect()
    row = stats[0].asDict()
    row["n_docs"] = 999
    spark.createDataFrame([tuple(row.values())],
                          list(row.keys())).write.mode("overwrite") \
        .parquet(f"{index_dir}/stats")
    rep = _report(spark, index_dir)
    assert rep["stats_n_docs"]["status"] == "fail"


def test_lost_file_detected(spark, index_dir):
    victim = sorted(glob.glob(f"{index_dir}/postings/*/*.parquet"))[0]
    os.remove(victim)
    rep = _report(spark, index_dir)
    assert rep["files_vs_manifest_postings"]["status"] == "fail"


def test_bitflip_detected_by_deep_checksum(spark, index_dir):
    # rewrite one postings partition with an altered tf: footer row
    # counts survive, only the deep checksum pass can notice
    post = spark.read.parquet(f"{index_dir}/postings")
    tampered = post.withColumn(
        "doc_id", F.when(F.col("doc_id") == 0, F.lit(7777))
                   .otherwise(F.col("doc_id")))
    tampered.write.mode("overwrite").partitionBy("bucket") \
        .parquet(f"{index_dir}/postings_tmp")
    import shutil
    shutil.rmtree(f"{index_dir}/postings")
    os.rename(f"{index_dir}/postings_tmp", f"{index_dir}/postings")
    rep = _report(spark, index_dir, deep=True)
    assert rep["build_checksum_postings"]["status"] == "fail"
