"""Text analysis operators: language ID, quality scoring, token counting,
document fingerprinting. All pure column algebra (JVM, whole-stage codegen);
formulas chosen to be deterministic and reproducible in the DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Minimal function-word profiles for a fast n-gram-free language heuristic.
LANG_PROFILES = {
    "en": ["the", "of", "and", "to", "in", "is", "was", "it", "for", "with"],
    "de": ["der", "die", "und", "das", "von", "zu", "mit", "den", "ist", "im"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "del", "se", "las"],
    "fr": ["le", "la", "de", "et", "les", "des", "en", "un", "du", "une"],
}

# A BPE-ish tokenizer regex: word pieces, numbers, or single non-space marks.
TOKEN_REGEX = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def _tok(text_col):
    return F.split(F.trim(text_col), r"\s+")


def token_counts(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """(doc_id, ws_tokens, regex_tokens, n_chars_computed)."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.size(_tok(F.col(text_col))).alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_REGEX), 0))
        .alias("regex_tokens"),
        F.length(F.col(text_col)).alias("n_chars_computed"))


def lang_exprs(t_col):
    """(lang_pred, lang_score) column expressions over a token-array
    column: argmax of function-word hit ratio, deterministic tie-break by
    profile order. Shared by `lang_id` and the corpus-prep pipeline so
    both stay oracle-identical."""
    n = F.size(t_col)
    best_lang, best_score = F.lit("und"), F.lit(-1.0)
    for lang, words in LANG_PROFILES.items():
        hits = F.size(F.filter(t_col, lambda t: t.isin(words)))
        score = F.round(hits / F.greatest(n, F.lit(1)), 6)
        better = score > best_score
        best_lang = F.when(better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(better, score).otherwise(best_score)
    return best_lang, best_score


def lang_id(df: DataFrame, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """(doc_id, lang_pred, lang_score): argmax of function-word hit ratio,
    deterministic tie-break by profile order."""
    out = df.select(F.col(id_col).alias("doc_id"),
                    _tok(F.col(text_col)).alias("_t"))
    best_lang, best_score = lang_exprs(F.col("_t"))
    return out.select("doc_id", best_lang.alias("lang_pred"),
                      best_score.alias("lang_score"))


def quality_score(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id",
                  stop_words: tuple = ("the", "of", "and", "a", "to", "in")
                  ) -> DataFrame:
    """(doc_id, n_tokens, avg_token_len, stop_ratio, unique_ratio, quality):
    classic pre-training quality heuristics combined into one 0..1 score."""
    base = df.select(F.col(id_col).alias("doc_id"),
                     _tok(F.col(text_col)).alias("_t"))
    q = quality_exprs(F.col("_t"), stop_words)
    return base.select(
        "doc_id", q["n_tokens"].alias("n_tokens"),
        F.round(q["avg_token_len"], 6).alias("avg_token_len"),
        F.round(q["stop_ratio"], 6).alias("stop_ratio"),
        F.round(q["unique_ratio"], 6).alias("unique_ratio"),
        q["quality"].alias("quality"))


def quality_exprs(t_col, stop_words: tuple = ("the", "of", "and", "a",
                                              "to", "in")):
    """Named quality expressions over a token-array column (shared by
    `quality_score` and the corpus-prep pipeline)."""
    n = F.size(t_col)
    uniq = F.size(F.array_distinct(t_col))
    stop_hits = F.size(F.filter(t_col, lambda t: t.isin(list(stop_words))))
    avg_len = (F.aggregate(t_col, F.lit(0),
                           lambda acc, t: acc + F.length(t))
               / F.greatest(n, F.lit(1)))
    stop_ratio = stop_hits / F.greatest(n, F.lit(1))
    unique_ratio = uniq / F.greatest(n, F.lit(1))
    # length factor saturates at 100 tokens; penalize all-dup and no-stopword
    length_f = F.least(n / F.lit(100.0), F.lit(1.0))
    quality = F.round(
        (length_f + F.least(stop_ratio * 5, F.lit(1.0)) + unique_ratio) / 3, 6)
    return {"n_tokens": n, "avg_token_len": avg_len,
            "stop_ratio": stop_ratio, "unique_ratio": unique_ratio,
            "quality": quality}


def doc_fingerprint(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """(doc_id, fingerprint, n_shingles): order-invariant sketch built from
    the min/max md5 of the document's word n-gram shingles (a rolling-window
    content signature robust to local edits outside the extremes)."""
    from .dedup import shingle_df

    sh = shingle_df(df, text_col, id_col, n)
    return (sh.withColumn("h", F.md5("shingle"))
            .groupBy("doc_id")
            .agg(F.concat_ws("-", F.min("h"), F.max("h"),
                             F.count("*")).alias("fingerprint"),
                 F.count("*").alias("n_shingles")))


#: PII patterns kept RE2-safe AND Java-regex-safe (no lookaround, no
#: alternation whose leftmost-first vs leftmost-longest semantics could
#: diverge between engines), so the DuckDB oracle redacts identically.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\b\+?\d{3}[-. ]\d{3}[-. ]\d{4}\b",
}


def redact_pii(df, text_col: str = "text",
               patterns: dict[str, str] | None = None,
               out_col: str = "text_redacted"):
    """Detect and mask PII-shaped spans: returns `df` plus `out_col`
    (every match replaced by `[PII-<kind>]`) and one `pii_<kind>` count
    column per pattern — the standard pre-training scrub (emails, IPv4s,
    phone numbers by default; pass `patterns` to extend). Pure column
    algebra: one regexp_extract_all (count) + one regexp_replace chain
    per kind, whole-stage codegen, no Python in the hot path. Counts are
    computed BEFORE any replacement so overlapping kinds each see the
    original text; replacements apply in sorted-kind order for
    determinism."""
    patterns = PII_PATTERNS if patterns is None else patterns
    src = F.coalesce(F.col(text_col), F.lit(""))
    for kind in sorted(patterns):
        # F.lit pattern, NOT SQL-string interpolation: a pattern inside a
        # SQL literal would have its backslashes eaten by the SQL parser
        df = df.withColumn(
            f"pii_{kind}",
            F.size(F.regexp_extract_all(src, F.lit(patterns[kind]),
                                        F.lit(0))).cast("int"))
    red = src
    for kind in sorted(patterns):
        red = F.regexp_replace(red, patterns[kind], f"[PII-{kind}]")
    return df.withColumn(out_col, red)


def repetition_stats(df, text_col: str = "text",
                     id_col: str = "doc_id",
                     max_dup_line_frac: float = 0.3,
                     max_top_bigram_frac: float = 0.2):
    """Within-document repetition signals (the published Gopher/
    MassiveText-style quality rules — Rae et al. 2021, public):
    (doc_id, n_bigrams, dup_line_frac, dup_bigram_frac, top_bigram_frac,
    repetitive). Pure array algebra, no explode and no shuffle:

    - dup_line_frac: 1 - distinct/total over non-blank trimmed lines;
    - dup_bigram_frac: 1 - distinct/total over word bigrams;
    - top_bigram_frac: share of the single most frequent bigram,
      computed by one fold over the SORTED bigram array (longest equal
      run = mode count — no per-doc groupBy);
    - repetitive: dup_line_frac > max_dup_line_frac OR
      top_bigram_frac > max_top_bigram_frac (thresholds are arguments;
      defaults are in the published rules' neighborhood, not gospel).

    Docs with < 2 tokens have no bigrams: fractions 0, never flagged."""
    toks = _tok(F.coalesce(F.col(text_col), F.lit("")))
    lines_all = F.transform(
        F.split(F.coalesce(F.col(text_col), F.lit("")), "\n"),
        lambda x: F.trim(x))
    lines = F.filter(lines_all, lambda x: x != "")
    n_lines = F.size(lines)
    dup_line = F.when(
        n_lines > 0,
        1.0 - F.size(F.array_distinct(lines)) / n_lines.cast("double")
    ).otherwise(F.lit(0.0))

    grams = F.when(
        F.size(toks) >= 2,
        F.transform(F.sequence(F.lit(1), F.size(toks) - 1),
                    lambda i: F.array_join(F.slice(toks, i, 2), " "))
    ).otherwise(F.array().cast("array<string>"))
    n_g = F.size(grams)
    dup_g = F.when(
        n_g > 0,
        1.0 - F.size(F.array_distinct(grams)) / n_g.cast("double")
    ).otherwise(F.lit(0.0))
    # mode count of the bigram multiset: fold over the sorted array
    # tracking (prev, current run, best run)
    run0 = F.struct(F.lit("").alias("prev"), F.lit(0).alias("run"),
                    F.lit(0).alias("best"))

    def step(acc, x):
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(x.alias("prev"), run.alias("run"),
                        F.greatest(acc["best"], run).alias("best"))

    top_cnt = F.aggregate(F.array_sort(grams), run0, step)["best"]
    top_frac = F.when(n_g > 0,
                      top_cnt.cast("double") / n_g.cast("double")) \
        .otherwise(F.lit(0.0))

    return df.select(
        F.col(id_col).alias("doc_id"),
        n_g.cast("int").alias("n_bigrams"),
        dup_line.alias("dup_line_frac"),
        dup_g.alias("dup_bigram_frac"),
        top_frac.alias("top_bigram_frac"),
        ((dup_line > max_dup_line_frac)
         | (top_frac > max_top_bigram_frac)).alias("repetitive"))


def corpus_profile(df: DataFrame, group_cols: list | tuple = ("lang",),
                   text_col: str = "text") -> DataFrame:
    """Corpus card: one row per group with ALL-INTEGER aggregates, so the
    result is exact under any aggregation order (floats like mean
    quality reconstruct driver-side: sum_quality_e6 / (1e6·n_docs)).

    Columns: <group_cols...>, n_docs, sum_tokens, sum_chars,
    sum_quality_e6, n_unique_texts. One groupBy (map-side combined) plus
    the same single-split annotate projection the other textstats use;
    n_unique_texts is an exact distinct-count of md5(text) per group —
    the dedup headroom number a mixing plan starts from."""
    gcols = list(group_cols)
    if not gcols:
        raise ValueError("group_cols must name at least one column")
    t = _tok(F.col(text_col))
    q = quality_exprs(t)
    ann = df.select(
        *gcols,
        q["n_tokens"].alias("_nt"),
        F.length(F.coalesce(F.col(text_col), F.lit(""))).alias("_nc"),
        F.round(q["quality"] * 1_000_000).cast("long").alias("_q6"),
        F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias("_h"))
    return (ann.groupBy(*gcols)
            .agg(F.count("*").alias("n_docs"),
                 F.sum("_nt").alias("sum_tokens"),
                 F.sum("_nc").alias("sum_chars"),
                 F.sum("_q6").alias("sum_quality_e6"),
                 F.count_distinct("_h").alias("n_unique_texts")))
