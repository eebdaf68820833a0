"""Prefix-filter effectiveness probe for `similarity_join`.

Builds a synthetic person-name corpus (clusters of typo'd variants over
a shared name vocabulary — the record-linkage shape), then compares the
CANDIDATE PAIR count of the prefix-filtered equi-join against the
unfiltered join-on-every-shared-trigram baseline, plus wall time for
the full verified join. Candidate count is the scale metric that
matters: verify cost is linear in candidates, and at 100× the
unfiltered count grows quadratically on hot trigrams while the prefix
count tracks the true match count.

Usage: python scripts/simjoin_demo.py [n_records] [threshold]
"""

import random
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, ".")

FIRST = ("john jon johan jane janet alex alexander aleks maria marie "
         "wolfgang ludwig anna annette peter petra").split()
LAST = ("smith smyth schmidt hamilton mozart beethoven miller mueller "
        "johnson jonson garcia gracia").split()


def typo(rng, s):
    i = rng.randrange(len(s))
    op = rng.randrange(3)
    if op == 0:
        return s[:i] + s[i + 1:]                       # drop
    if op == 1:
        return s[:i] + chr(97 + rng.randrange(26)) + s[i:]  # insert
    return s[:i] + chr(97 + rng.randrange(26)) + s[i + 1:]  # substitute


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    t = float(sys.argv[2]) if len(sys.argv) > 2 else 0.6
    rng = random.Random(7)
    rows = []
    for i in range(n):
        base = (f"{rng.choice(FIRST)} {chr(97 + rng.randrange(26))} "
                f"{rng.choice(LAST)}")
        rows.append((i, typo(rng, base) if i % 3 else base))

    spark = (SparkSession.builder.master("local[16]")
             .config("spark.sql.shuffle.partitions", "16")
             .config("spark.driver.memory", "12g")
             .config("spark.ui.enabled", "false").getOrCreate())
    df = spark.createDataFrame(rows, ["doc_id", "text"]).cache()
    df.count()

    from pg_ts_semantic_headline_spark.operators.trigram import (
        similarity_join, trigrams_col)

    # join FAN-OUT, computed analytically (materializing the
    # unfiltered candidate set OOMs — which is the point): the rows an
    # equi-join on trigram tg emits is df(tg)^2 unfiltered, vs
    # prefix_count(tg)·df(tg) prefix-filtered
    ex = (df.select(F.col("doc_id").alias("a"),
                    F.explode(trigrams_col("text")).alias("tg")))
    raw_fanout = int(ex.groupBy("tg").agg(F.count("*").alias("d"))
                     .agg(F.sum(F.col("d") * F.col("d"))).first()[0])

    t0 = time.time()
    out = similarity_join(df, threshold=t)
    matches = out.count()
    wall = time.time() - t0

    # prefix-filtered candidate count (re-derive the internal stage)
    from pyspark.sql import Window
    L = (df.select(F.col("doc_id").alias("a"),
                   trigrams_col("text").alias("tg_a"))
         .withColumn("n_a", F.size("tg_a")).where(F.col("n_a") > 0))
    ex_l = L.select("a", "n_a", F.explode("tg_a").alias("tg"))
    freq = ex_l.groupBy("tg").agg(F.count("*").alias("_df"))
    win = Window.partitionBy("a").orderBy(F.asc("_df"), F.asc("tg"))
    plen = F.col("n_a") - F.ceil(F.lit(t) * F.col("n_a")) + 1
    pref = (ex_l.join(F.broadcast(freq), on="tg")
            .withColumn("_r", F.row_number().over(win))
            .where(F.col("_r") <= plen).select("a", "tg"))
    pd_ = pref.groupBy("tg").agg(F.count("*").alias("p"))
    fd = ex.groupBy("tg").agg(F.count("*").alias("d"))
    pref_fanout = int(pd_.join(fd, on="tg")
                      .agg(F.sum(F.col("p") * F.col("d"))).first()[0])

    print({
        "n_records": n, "threshold": t,
        "unfiltered_join_fanout": raw_fanout,
        "prefix_join_fanout": pref_fanout,
        "reduction_x": round(raw_fanout / max(pref_fanout, 1), 1),
        "verified_matches": matches,
        "join_wall_s": round(wall, 2),
    })
    spark.stop()


if __name__ == "__main__":
    main()
