"""N-gram language-model quality scoring (the CCNet/KenLM filtering
recipe, Spark-first): train a Laplace-smoothed bigram LM on a trusted
reference slice, score every candidate document by its per-bigram
log-probability, keep/bucket documents by the score.

Determinism contract: the per-document score is the SUM of
e4-QUANTIZED log-probs — each bigram contributes
round(ln(p)·10⁴) as an integer, so the per-doc aggregation is exact
integer addition and commutes across engines, partitionings, and
retries (a float Σln(p) would drift with hash-agg combine order; see
the fixed-order-summation notes in `plans/search.bm25_topk_paged`).
Quantization at 1e-4 nats is far below any useful filtering threshold.

Scale shape: both count tables come out of map-side-combined groupBys
(shuffle is vocabulary/bigram-vocabulary sized, not corpus sized); the
scoring join runs doc-bigrams ⋈ LM tables on their natural keys — the
LM side is the aggregated reference slice, which Spark broadcasts when
small and shuffle-joins when not. No driver-side materialization of
either vocabulary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bigrams(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(doc_id, w1, w2) with one NULL-pair row for docs shorter than 2
    tokens (explode_outer keeps them so every input doc scores)."""
    t = F.split(F.col(text_col), " ")
    n = F.size(t)
    pairs = F.when(n >= 2, F.zip_with(
        F.slice(t, 1, n - 1), F.slice(t, 2, n - 1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")))
    ).otherwise(F.array())
    return (docs.select(F.col(id_col).alias("doc_id"), pairs.alias("_p"))
            .select("doc_id", F.explode_outer("_p").alias("p"))
            .select("doc_id", F.col("p.w1").alias("w1"),
                    F.col("p.w2").alias("w2")))


def train_bigram_lm(lm_docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id"
                    ) -> tuple[DataFrame, DataFrame, int]:
    """(unigram counts (w1, c1), bigram counts (w1, w2, c12), vocab
    size V) from the reference corpus. Laplace-smoothed conditionals:
    p(w2|w1) = (c12 + 1) / (c1 + V), with c12 = 0 / c1 = 0 for unseen
    events — every bigram gets positive probability, so OOV text
    scores low instead of -inf."""
    toks = (lm_docs.select(
        F.explode(F.split(F.col(text_col), " ")).alias("w1")))
    uni = toks.groupBy("w1").agg(F.count("*").alias("c1"))
    bi = (_bigrams(lm_docs, text_col, id_col)
          .where(F.col("w1").isNotNull())
          .groupBy("w1", "w2").agg(F.count("*").alias("c12")))
    v = uni.count()
    return uni, bi, v


def bigram_lm_score(docs: DataFrame, lm_docs: DataFrame,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Score `docs` under a bigram LM trained on `lm_docs`. Returns one
    row per input document:

      (doc_id, n_bigrams, oov_bigrams, sum_logprob_q4)

    n_bigrams     — bigram events in the doc (0 for <2-token docs)
    oov_bigrams   — events never seen in the LM corpus
    sum_logprob_q4 — Σ round(ln((c12+1)/(c1+V))·10⁴), an exact integer;
                     mean log-prob = sum_logprob_q4 / (10⁴·n_bigrams),
                     perplexity = exp(-mean). Lower (more negative) =
                     less reference-like; threshold or bucket on it.

    The LM corpus is read twice (once for the vocabulary-size action,
    once through the count joins) — persist `lm_docs` when the trusted
    slice is not already small relative to the corpus being scored.
    """
    uni, bi, v = train_bigram_lm(lm_docs, text_col, id_col)
    events = _bigrams(docs, text_col, id_col)
    joined = (events
              .join(bi, on=["w1", "w2"], how="left")
              .join(uni, on="w1", how="left"))
    c12 = F.coalesce(F.col("c12"), F.lit(0)).cast("double")
    c1 = F.coalesce(F.col("c1"), F.lit(0)).cast("double")
    logprob_q = F.round(
        F.log((c12 + 1.0) / (c1 + float(v))) * 10000.0).cast("long")
    scored = joined.select(
        "doc_id",
        F.when(F.col("w1").isNotNull(), 1).otherwise(0).alias("_ev"),
        F.when(F.col("w1").isNotNull() & F.col("c12").isNull(), 1)
        .otherwise(0).alias("_oov"),
        F.when(F.col("w1").isNotNull(), logprob_q).otherwise(F.lit(0))
        .alias("_lq"))
    return (scored.groupBy("doc_id")
            .agg(F.sum("_ev").alias("n_bigrams"),
                 F.sum("_oov").alias("oov_bigrams"),
                 F.sum("_lq").alias("sum_logprob_q4")))
