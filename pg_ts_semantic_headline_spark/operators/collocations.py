"""Corpus vocabulary analysis: per-document keyword extraction and PMI
bigram collocations.

Both are pure column algebra over the same whitespace tokenization the
gate oracles use (`split(text, ' ')`), so they are reproducible in ANSI
SQL. `doc_keywords` is deliberately INTEGER-only (tf desc, df asc, term
asc — the same no-float-tie selection rule as `more_like_this`), so its
ranking can never diverge across engines by a ulp. `pmi_collocations`
emits doubles, but every input to the PMI formula is an exact integer
count and the expression is evaluated in one fixed order, so both
engines agree to well under the e4 gate rounding.

Scale shape (100 TB): everything is explode → partial-aggregated
groupBy — map-side combine keeps the shuffle at vocabulary/bigram-
vocabulary size, not corpus size. The dictionary joins run on the
ALREADY-AGGREGATED pair/term tables (orders of magnitude smaller than
the token stream); the two scalar totals ride along as one-row
cross-joined aggregates, keeping each operator a single action.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _toks(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return df.select(F.col(id_col).alias("doc_id"),
                     F.split(F.col(text_col), " ").alias("_t"))


def doc_keywords(docs: DataFrame, top_n: int = 5,
                 text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Top-N characteristic terms per document: rank by tf desc (most
    used here), df asc (rarest in the corpus), term asc — an integer
    tf-idf surrogate with no float tie risk. Returns
    (doc_id, term, tf, df, rank); rank is 1-based and dense per doc."""
    toks = (_toks(docs, text_col, id_col)
            .select("doc_id", F.explode("_t").alias("term")))
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dft = tf.groupBy("term").agg(F.count("*").alias("df"))
    win = (Window.partitionBy("doc_id")
           .orderBy(F.desc("tf"), F.asc("df"), F.asc("term")))
    return (tf.join(dft, on="term")
            .withColumn("rank", F.row_number().over(win).cast("long"))
            .where(F.col("rank") <= top_n)
            .select("doc_id", "term", "tf", "df", "rank"))


def doc_keywords_indexed(index, top_n: int = 5) -> DataFrame:
    """`doc_keywords` off the persisted inverted index — the 100 TB
    path: tf per (doc, term) is already materialized in the postings
    and df sits in the dictionary, so keyword extraction never
    re-tokenizes a byte of text. One postings scan (skinny columns:
    doc_id, term, tf — positions/payloads pruned), one join with the
    metadata-scale dictionary, one per-doc window. Identical output to
    the ad-hoc form whenever the index was built with an analyzer that
    matches the ad-hoc whitespace tokenization (tested with the
    `simple` config); with a stemming config the keywords are the
    index's lexemes, which is usually what a search UI wants anyway."""
    from pyspark.sql import Window

    tf = index.postings.select("doc_id", "term", "tf")
    dft = index.terms.select("term", "df")
    win = (Window.partitionBy("doc_id")
           .orderBy(F.desc("tf"), F.asc("df"), F.asc("term")))
    return (tf.join(dft, on="term")
            .withColumn("rank", F.row_number().over(win).cast("long"))
            .where(F.col("rank") <= top_n)
            .select("doc_id", "term",
                    F.col("tf").cast("long").alias("tf"),
                    "df", "rank"))


def pmi_collocations(docs: DataFrame, min_count: int = 5,
                     text_col: str = "text",
                     id_col: str = "doc_id",
                     window: int = 1) -> DataFrame:
    """Pointwise mutual information over word pairs at distance
    1..`window` (window=1 → classic adjacent bigrams; larger windows →
    skip-gram collocations à la word2vec contexts):
    pmi = ln( (c_ab/Nb) / ((c_a/Nu) * (c_b/Nu) ) ) with Nb = total pair
    events in the window and Nu = total tokens. Pairs with fewer than
    `min_count` occurrences are dropped (PMI is noise at tiny counts).
    Returns (w1, w2, pair_count, pmi); (a, b) at distance d and
    (b, a) at distance d' are distinct ordered events.

    Pairs come from zips of shifted array slices — no self-join of the
    token stream; the only wide ops are the two count aggregations.
    Docs shorter than d+1 tokens contribute no distance-d pairs
    (explicit guard: `slice` with length ≤ 0 would error)."""
    if window < 1:
        raise ValueError("window must be >= 1")
    toks = _toks(docs, text_col, id_col)
    n = F.size("_t")
    uni = (toks.select(F.explode("_t").alias("w"))
           .groupBy("w").agg(F.count("*").alias("c")))

    def shifted(d):
        return F.when(n >= d + 1, F.zip_with(
            F.slice("_t", 1, n - d),
            F.slice("_t", 1 + d, n - d),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")))
        ).otherwise(F.array())

    ev = F.flatten(F.array(*[shifted(d) for d in range(1, window + 1)]))
    pairs = (toks.select(F.explode(ev).alias("p"))
             .select("p.w1", "p.w2")
             .groupBy("w1", "w2").agg(F.count("*").alias("pair_count"))
             .where(F.col("pair_count") >= min_count))
    nu = uni.agg(F.sum("c").alias("nu"))
    # Nb must count ALL pair events, not just the ones above min_count
    all_pairs_nb = (toks.agg(F.sum(
        sum((F.greatest(n - d, F.lit(0))
             for d in range(1, window + 1)), F.lit(0))).alias("nb")))
    u1 = uni.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    out = (pairs.join(u1, on="w1").join(u2, on="w2")
           .crossJoin(F.broadcast(all_pairs_nb))
           .crossJoin(F.broadcast(nu)))
    pmi = F.log(
        (F.col("pair_count") / F.col("nb"))
        / ((F.col("c1") / F.col("nu")) * (F.col("c2") / F.col("nu"))))
    return out.select("w1", "w2", "pair_count", pmi.alias("pmi"))
