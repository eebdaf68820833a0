"""Training-data corpus preparation: the composed cleaning flow a
pre-training pipeline runs before indexing — annotate, filter, dedup —
as ONE declarative plan plus a single-action metrics report.

Flow (each stage optional via thresholds):

1. annotate  — token count, quality score, language ID, all computed in
   one narrow projection over a single `split(text)` (no joins between
   the stat operators — `lang_exprs`/`quality_exprs` are the same column
   algebra the standalone operators use, so results stay
   oracle-identical);
2. filter    — drop by token bounds, quality floor, language allowlist;
   the drop REASON is recorded per row (first failing rule) rather than
   rows being silently discarded;
3. exact dedup — md5 hash-groupBy among survivors only (filter-first:
   the shuffle sees the already-thinned corpus); lowest doc_id per hash
   is canonical;
4. near dedup (optional) — MinHash+LSH pairs -> connected components ->
   non-canonical members dropped (`dedup.minhash_lsh_dedup` +
   `duplicate_components`, both already bucket-capped / convergence-
   checked for scale).

`prepare_corpus` returns the fully annotated frame (every input row,
with `drop_reason` NULL for keepers); `corpus_report` reduces it to one
row of per-reason counts in a single aggregation. No driver-side loops,
no collects; at 100 TB the only shuffles are the dedup groupBys/joins,
each over the filtered survivor set.
"""

from __future__ import annotations

import math
import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import duplicate_components, minhash_lsh_dedup
from .textstats import _tok, lang_exprs, quality_exprs


def prepare_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 5,
    max_tokens: int | None = None,
    min_quality: float = 0.0,
    allowed_langs: tuple | None = None,
    exact_dedup: bool = True,
    near_dedup: bool = False,
    jaccard_threshold: float = 0.5,
    checkpoint: str = "local",
    cache: bool = False,
    redact: bool = False,
    max_top_bigram_frac: float | None = None,
    lm_docs: DataFrame | None = None,
    min_lm_mean_logprob: float = -9.0,
    substring_dedup_n: int | None = None,
) -> DataFrame:
    """Annotated corpus with a `drop_reason` column (NULL = kept).

    Columns: doc_id, <text_col>, n_tokens, quality, lang_pred,
    drop_reason in {'too_short','too_long','low_quality','lang',
    'repetitive' (when max_top_bigram_frac is set),
    'lm_quality' (when lm_docs is set),'exact_dup',
    'near_dup', NULL}. Reasons apply in that order (first
    failing rule wins); dedup stages only consider rows that passed the
    row-local filters, and within a duplicate cluster the lowest doc_id
    is kept. `redact=True` runs `redact_pii` FIRST, so stats, filters
    and dedup all see the masked text (PII-only differences dedup
    together) and per-kind `pii_*` count columns ride along.

    `lm_docs` enables the CCNet-style LM gate: a Laplace bigram LM is
    trained on that trusted slice (`lm.bigram_lm_score`) and documents
    whose mean per-bigram logprob (nats) falls below
    `min_lm_mean_logprob` are dropped as 'lm_quality'. The post-PII
    text is what gets scored; a `lm_mean_logprob` column rides along
    (NULL for docs with no bigram events — those always pass).

    `substring_dedup_n` enables the Lee-et-al ExactSubstr stage
    (`dedup.dedup_substrings`, published default 50): duplicated
    n-token windows are cut from every occurrence but the corpus-first,
    REWRITING the text (whitespace-normalized) right after the PII
    scrub and before any stat/filter/dedup — so token counts, quality,
    the LM gate and the doc-level dedups all see the deduplicated
    text. Adds an `n_substr_tokens_removed` column.

    `cache=True` persists the annotated frame(s) so the dedup joins do
    not recompute the annotate projection per reference — recommended
    whenever near_dedup is on (the frame is referenced by the minhash,
    components, and final-join sides). The cached intermediates live
    until evicted or `spark.catalog.clearCache()`."""
    pii_cols: list = []
    if redact:
        # PII scrub FIRST: every downstream stat/filter/dedup sees the
        # masked text (two docs differing only in their PII dedup
        # together, and quality/token counts describe what ships)
        from .textstats import redact_pii as _redact_pii
        df = _redact_pii(df, text_col=text_col, out_col="_red")
        df = df.drop(text_col).withColumnRenamed("_red", text_col)
        pii_cols = [c for c in df.columns if c.startswith("pii_")]
    substr_cols: list = []
    if substring_dedup_n is not None:
        from .dedup import dedup_substrings
        sub = dedup_substrings(df, n=substring_dedup_n,
                               text_col=text_col, id_col=id_col)
        df = (df.drop(text_col)
              .join(sub.withColumnRenamed("doc_id", id_col), on=id_col)
              .withColumnRenamed("text_dedup", text_col)
              .withColumnRenamed("n_tokens_removed",
                                 "n_substr_tokens_removed"))
        substr_cols = ["n_substr_tokens_removed"]
    elif "n_substr_tokens_removed" in df.columns:
        # an upstream stage (the streaming cross-batch cutter) already
        # rewrote the text: carry its counter through the annotation
        substr_cols = ["n_substr_tokens_removed"]
    t = F.col("_t")
    lang_pred, _ = lang_exprs(t)
    q = quality_exprs(t)
    ann_extra = []
    if max_top_bigram_frac is not None:
        # Gopher-style repetition gate: share of the most frequent word
        # bigram, via the same sorted-array fold as
        # textstats.repetition_stats (no explode, no shuffle)
        grams = F.when(
            F.size(t) >= 2,
            F.transform(F.sequence(F.lit(1), F.size(t) - 1),
                        lambda i: F.array_join(F.slice(t, i, 2), " "))
        ).otherwise(F.array().cast("array<string>"))
        run0 = F.struct(F.lit("").alias("prev"), F.lit(0).alias("run"),
                        F.lit(0).alias("best"))

        def _step(acc, x):
            run = F.when(x == acc["prev"],
                         acc["run"] + 1).otherwise(F.lit(1))
            return F.struct(x.alias("prev"), run.alias("run"),
                            F.greatest(acc["best"], run).alias("best"))

        top_frac = F.when(
            F.size(grams) > 0,
            F.aggregate(F.array_sort(grams), run0, _step)["best"]
            .cast("double") / F.size(grams)).otherwise(F.lit(0.0))
        ann_extra = [top_frac.alias("_topg")]
    ann = (df.select(F.col(id_col).alias("doc_id"),
                     F.col(text_col).alias(text_col),
                     _tok(F.col(text_col)).alias("_t"),
                     *pii_cols, *substr_cols)
           .select("doc_id", text_col,
                   q["n_tokens"].alias("n_tokens"),
                   q["quality"].alias("quality"),
                   lang_pred.alias("lang_pred"),
                   *pii_cols, *substr_cols, *ann_extra))
    if lm_docs is not None:
        # LM gate: scores computed over the same (post-PII) frame the
        # other annotations see; mean logprob in nats from the exact
        # integer quantized sum. Docs with no bigrams keep NULL (pass).
        from .lm import bigram_lm_score
        scores = bigram_lm_score(df, lm_docs, text_col=text_col,
                                 id_col=id_col)
        mean = F.when(
            F.col("n_bigrams") > 0,
            F.col("sum_logprob_q4") / (F.col("n_bigrams") * 10000.0))
        ann = (ann.join(scores.select("doc_id",
                                      mean.alias("lm_mean_logprob")),
                        on="doc_id", how="left"))

    reason = F.when(F.col("n_tokens") < min_tokens, F.lit("too_short"))
    if max_tokens is not None:
        reason = reason.when(F.col("n_tokens") > max_tokens,
                             F.lit("too_long"))
    reason = reason.when(F.col("quality") < min_quality,
                         F.lit("low_quality"))
    if allowed_langs is not None:
        reason = reason.when(~F.col("lang_pred").isin(list(allowed_langs)),
                             F.lit("lang"))
    if max_top_bigram_frac is not None:
        reason = reason.when(F.col("_topg") > max_top_bigram_frac,
                             F.lit("repetitive"))
    if lm_docs is not None:
        reason = reason.when(
            F.col("lm_mean_logprob") < float(min_lm_mean_logprob),
            F.lit("lm_quality"))
    ann = ann.withColumn("drop_reason", reason).drop("_topg")

    if not (exact_dedup or near_dedup):
        return ann

    if cache:
        ann = ann.persist()

    # dedup stages refine drop_reason via LEFT JOINS on the one annotated
    # frame — no survivor/dropped union (which would re-scan the source
    # once per branch); the annotate scan runs once per aggregation side
    # plus once for the final join, or exactly once when cache=True
    if exact_dedup:
        ann = ann.withColumn("_h", F.md5(F.col(text_col)))
        canon = (ann.where(F.col("drop_reason").isNull())
                 .groupBy("_h").agg(F.min("doc_id").alias("_canon")))
        ann = (ann.join(canon, on="_h", how="left")
               .withColumn("drop_reason",
                           F.coalesce(
                               F.col("drop_reason"),
                               F.when(F.col("doc_id") != F.col("_canon"),
                                      F.lit("exact_dup"))))
               .drop("_h", "_canon"))
        if cache and near_dedup:
            ann = ann.persist()

    if near_dedup:
        survivors = ann.where(F.col("drop_reason").isNull())
        pairs = minhash_lsh_dedup(survivors, text_col=text_col,
                                  threshold=jaccard_threshold)
        comps = duplicate_components(survivors, pairs,
                                     checkpoint=checkpoint)
        ann = (ann.join(comps.select("doc_id",
                                     F.col("is_canonical").alias("_can")),
                        on="doc_id", how="left")
               .withColumn("drop_reason",
                           F.coalesce(
                               F.col("drop_reason"),
                               F.when(~F.coalesce("_can", F.lit(True)),
                                      F.lit("near_dup"))))
               .drop("_can"))

    return ann


def corpus_report(prepared: DataFrame) -> DataFrame:
    """One-row metrics over a `prepare_corpus` result, in ONE aggregation:
    total input, kept, and a count per drop reason."""
    def n_where(cond):
        return F.sum(F.when(cond, 1).otherwise(0))

    r = F.col("drop_reason")
    return prepared.agg(
        F.count("*").alias("n_input"),
        n_where(r.isNull()).alias("n_kept"),
        n_where(r == "too_short").alias("n_too_short"),
        n_where(r == "too_long").alias("n_too_long"),
        n_where(r == "low_quality").alias("n_low_quality"),
        n_where(r == "lang").alias("n_lang"),
        n_where(r == "repetitive").alias("n_repetitive"),
        n_where(r == "lm_quality").alias("n_lm_quality"),
        n_where(r == "exact_dup").alias("n_exact_dup"),
        n_where(r == "near_dup").alias("n_near_dup"))


def remove_boilerplate_lines(df: DataFrame, max_doc_ratio: float = 0.2,
                             text_col: str = "text",
                             id_col: str = "doc_id") -> DataFrame:
    """Strip boilerplate LINES — lines whose (trimmed) text appears in
    >= max_doc_ratio of documents (site headers/footers/nav/license
    stubs, the classic web-corpus cleanup): returns (doc_id, text_clean,
    n_lines_removed). Blank lines are never counted as boilerplate.

    Two-pass shape, the standard at corpus scale: (1) explode lines and
    aggregate distinct-document frequency per trimmed line — frequent
    lines are FEW by definition (each costs doc_ratio·N rows), so the
    flagged set broadcasts; (2) anti-join the exploded lines against it
    and reassemble per doc in original order. One count() job fixes N;
    docs that were entirely boilerplate (or NULL) come back as ''."""
    n_docs = df.count()
    cutoff = max(1, int(math.ceil(max_doc_ratio * n_docs)))
    lines = (df.select(F.col(id_col).alias("doc_id"),
                       F.posexplode(F.split(F.col(text_col), "\n"))
                       .alias("pos", "raw"))
             .withColumn("norm", F.trim(F.col("raw"))))
    frequent = (lines.where(F.col("norm") != "")
                .groupBy("norm")
                .agg(F.count_distinct("doc_id").alias("_df"))
                .where(F.col("_df") >= cutoff)
                .select("norm"))
    kept = lines.join(F.broadcast(frequent), on="norm", how="left_anti")
    rebuilt = (kept.groupBy("doc_id")
               .agg(F.array_join(
                        F.transform(
                            F.array_sort(F.collect_list(
                                F.struct("pos", "raw"))),
                            lambda s: s["raw"]),
                        "\n").alias("text_clean"),
                    F.count("*").alias("_kept")))
    all_ids = df.select(
        F.col(id_col).alias("doc_id"),
        F.when(F.col(text_col).isNull(), F.lit(0))
         .otherwise(F.size(F.split(F.col(text_col), "\n")))
         .alias("_total"))
    return (all_ids.join(rebuilt, on="doc_id", how="left")
            .select("doc_id",
                    F.coalesce("text_clean", F.lit("")).alias("text_clean"),
                    (F.col("_total") - F.coalesce("_kept", F.lit(0)))
                    .cast("int").alias("n_lines_removed")))


def dedup_paragraphs(df: DataFrame, sep: str = "\n\n",
                     min_chars: int = 1,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Corpus-GLOBAL exact paragraph dedup, keep-first occurrence:
    split every document on `sep`, and remove each paragraph copy that
    already occurred earlier in the corpus — "earlier" meaning the
    smallest (doc_id, position) — including repeats WITHIN one doc.
    Returns (doc_id, text_dedup, n_paras_removed).

    Complements `remove_boilerplate_lines`: that drops only lines
    frequent across >= ratio·N docs, so a passage duplicated in just two
    documents sails through; this removes EVERY later copy — the
    paragraph-granularity recipe of CCNet and of Lee et al. 2021
    ("Deduplicating Training Data Makes Language Models Better"), the
    standard between-doc-exact and doc-level-near dedup stages.
    Paragraphs shorter than `min_chars` after trim (blanks, stray
    separators) pass through unexamined — they are structure, not
    content, and would otherwise collapse every blank line in the
    corpus into one.

    Scale shape: one shuffle keyed on the trimmed paragraph text itself
    (exact — no hash-collision false drops), `min(struct(doc_id, pos))`
    as the keep-winner (partial-aggregatable, map-side combined), a
    rejoin on the same key (co-partitioned, no second shuffle of the
    big side under AQE), then per-doc reassembly. No global sort or
    window; nothing driver-side.
    """
    # split() takes a REGEX; sep is a plain string everywhere else in
    # this function (the re-join), so quote it for the split side
    sep_re = re.escape(sep)
    paras = (df.select(F.col(id_col).alias("doc_id"),
                       F.posexplode(F.split(F.col(text_col), sep_re, -1))
                       .alias("pos", "raw"))
             .withColumn("norm", F.trim(F.col("raw"))))
    cand = paras.where(F.length("norm") >= min_chars)
    firsts = (cand.groupBy("norm")
              .agg(F.min(F.struct("doc_id", "pos")).alias("first")))
    kept_cand = (cand.join(firsts, on="norm")
                 .where((F.col("doc_id") == F.col("first.doc_id"))
                        & (F.col("pos") == F.col("first.pos")))
                 .select("doc_id", "pos", "raw"))
    passthru = (paras.where(F.length("norm") < min_chars)
                .select("doc_id", "pos", "raw"))
    rebuilt = (kept_cand.unionByName(passthru)
               .groupBy("doc_id")
               .agg(F.array_join(
                        F.transform(
                            F.array_sort(F.collect_list(
                                F.struct("pos", "raw"))),
                            lambda s: s["raw"]),
                        sep).alias("text_dedup"),
                    F.count("*").alias("_kept")))
    all_ids = df.select(
        F.col(id_col).alias("doc_id"),
        F.when(F.col(text_col).isNull(), F.lit(0))
         .otherwise(F.size(F.split(F.col(text_col), sep_re, -1)))
         .alias("_total"))
    return (all_ids.join(rebuilt, on="doc_id", how="left")
            .select("doc_id",
                    F.coalesce("text_dedup", F.lit("")).alias("text_dedup"),
                    (F.col("_total") - F.coalesce("_kept", F.lit(0)))
                    .cast("int").alias("n_paras_removed")))
