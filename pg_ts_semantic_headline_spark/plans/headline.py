"""Whole-phrase headline generation as DataFrame plans.

- `ts_fast_headline_cover_density`
  (/root/reference/sql/ts_fast_headline_cover_density.sql:58-97): bucket the
  exact matches by word window, slice the recall array around each bucket,
  wrap every matched string with the selection tags in one regex pass, rank
  buckets by match density.
- `ts_fast_headline` (/root/reference/sql/ts_fast_headline.sql:51-66): join
  fragments with the delimiter and strip indexing tokens.
- `ts_semantic_headline` (/root/reference/sql/ts_semantic_headline.sql:52-70):
  ad-hoc path over raw content. The reference pre-fragments with PostgreSQL's
  *built-in* ts_headline (whose C cover-selection quirks we deliberately do
  not port); in Spark there is no per-call reparse penalty, so we analyze the
  full document on the fly and run the fast path directly. Known deviation:
  fragment word-window boundaries can differ from the reference's ad-hoc
  (not fast-path) output; the highlighted phrase spans are identical. The
  no-match fallback (first words of the document, :69) is reproduced.

All arithmetic (option parsing defaults, integer division, the pad formula,
bucket key, density ordering) follows the reference line for line.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from .analyze import with_analysis
from .matches import tsp_query_matches
from .query_compiler import CompiledQuery

_RE_OPTION = re.compile(r'(\w+)=(?:"([^"]+)"|((?:(?![\s,]+\w+=).)+))')
# the reference's regex-escape character set (ts_fast_headline_cover_density.sql:84)
_RE_REGEX_SPECIALS = re.compile(r"([.+*?^$()\[\]{}|\\])")


def parse_headline_options(options: str | None) -> dict[str, str]:
    """Comma-delimited k=v options; later duplicates win (PG ->> behavior)."""
    if not options:
        return {}
    out = {}
    for m in _RE_OPTION.finditer(options):
        out[m.group(1)] = m.group(2) if m.group(2) is not None else m.group(3)
    return out


def _highlight_udf(start_sel: str, stop_sel: str):
    """One-pass alternation wrap of every exact matched string in the
    space-padded fragment (cover_density.sql:78-87). Non-overlapping global
    replace, like PG's REGEXP_REPLACE 'g'."""

    def run(fragment: pd.Series, words_list: pd.Series) -> pd.Series:
        out = []
        for frag, words in zip(fragment, words_list):
            if frag is None:
                out.append(None)
                continue
            alts = "|".join(_RE_REGEX_SPECIALS.sub(r"\\\1", w) for w in words)
            out.append(re.sub(
                f" ({alts}) ",
                lambda m: f" {start_sel}{m.group(1)}{stop_sel} ",
                frag))
        return pd.Series(out)

    return F.pandas_udf(run, returnType=StringType())


def _present_udf(stop_sel: str):
    from ..functions.textprep import tsp_present_text

    def run(text: pd.Series) -> pd.Series:
        return text.map(lambda s: tsp_present_text(s, stop_sel)
                        if s is not None else None)

    return F.pandas_udf(run, returnType=StringType())


def ts_fast_headline_cover_density(
    docs: DataFrame,
    query: CompiledQuery,
    options: str = "",
    doc_id: str = "doc_id",
    hay: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, headline, density) — up to MaxFragments fragments per doc,
    highlighted but NOT yet present-text-cleaned (fragments still carry
    indexing tokens, exactly like the reference's intermediate)."""
    opts = parse_headline_options(options)
    start_sel = opts.get("StartSel", "<b>")
    stop_sel = opts.get("StopSel", "</b>")
    min_words = int(opts["MinWords"]) // 2 if "MinWords" in opts else 10
    max_words = int(opts.get("MaxWords", 30))
    max_offset = max_words // 2 + 1
    max_fragments = int(opts.get("MaxFragments", 1))
    disable_semantics = opts.get("DisableSematics", "FALSE").upper() == "TRUE"

    matches = tsp_query_matches(
        docs, query,
        match_limit=max_fragments + 6,
        disable_semantic_check=disable_semantics,
        doc_id=doc_id, hay=hay)

    bucket = (F.floor(F.col("start_pos") / (max_words + 1))
              * (max_words + 1)).alias("bucket")

    grouped = (matches
               .groupBy(doc_id, bucket)
               .agg(F.count("*").alias("density"),
                    F.min("start_pos").alias("s"),
                    F.max("end_pos").alias("e"),
                    # matched strings in document order for the alternation
                    F.transform(
                        F.array_sort(F.collect_list(
                            F.struct("start_pos", "words"))),
                        lambda x: x["words"]).alias("match_words")))

    # pad = GREATEST(max_offset - (e - s/2 + 1), min_words)  [integer div]
    pad = F.greatest(
        F.lit(max_offset) - (F.col("e") - F.floor(F.col("s") / 2) + 1),
        F.lit(min_words)).cast("int")

    sliced = (grouped
              .withColumn("pad", pad)
              .join(docs.select(doc_id, "tokens"), on=doc_id)
              .withColumn("lo", F.greatest(F.col("s") - F.col("pad"), F.lit(1)))
              .withColumn("hi", F.col("e") + F.col("pad"))
              .withColumn("fragment", F.concat(
                  F.lit(" "),
                  F.array_join(F.slice(
                      F.col("tokens"), F.col("lo"),
                      F.col("hi") - F.col("lo") + 1), " "),
                  F.lit(" "))))

    highlight = _highlight_udf(start_sel, stop_sel)
    lit = sliced.withColumn(
        "headline", highlight(F.col("fragment"), F.col("match_words")))

    w = Window.partitionBy(doc_id).orderBy(F.desc("density"), F.asc("bucket"))
    return (lit
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= max_fragments)
            .select(doc_id, "headline", "density", "bucket"))


def ts_fast_headline(
    docs: DataFrame,
    query: CompiledQuery,
    options: str = "",
    doc_id: str = "doc_id",
    hay: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, headline) — fragments joined by FragmentDelimiter in
    (density DESC, bucket ASC) order, then present-text cleanup."""
    opts = parse_headline_options(options)
    delim = opts.get("FragmentDelimiter", "...")
    stop_sel = opts.get("StopSel", "</b>")

    frags = ts_fast_headline_cover_density(docs, query, options, doc_id, hay=hay)
    assembled = (frags
                 .groupBy(doc_id)
                 .agg(F.array_join(
                     F.transform(
                         F.array_sort(F.collect_list(F.struct(
                             (-F.col("density")).alias("k1"),
                             F.col("bucket").alias("k2"),
                             F.col("headline").alias("h")))),
                         lambda x: x["h"]),
                     delim).alias("raw_headline")))
    present = _present_udf(stop_sel)
    return assembled.select(
        doc_id, present(F.col("raw_headline")).alias("headline"))


def ts_semantic_headline(
    docs: DataFrame,
    query: CompiledQuery,
    options: str = "",
    content_col: str = "content",
    config: str | None = None,
    doc_id: str = "doc_id",
    fallback_words: int = 15,
) -> DataFrame:
    """Ad-hoc path over raw content: analyze on the fly, fast headline with
    the reference's forced MaxFragments=30,MinWords=64,MaxWords=64 overlay
    (ts_semantic_headline.sql:64-68), COALESCE to the document head on no
    match (:69)."""
    cfg = config or query.config
    analyzed = with_analysis(docs, content_col=content_col, config=cfg)
    effective = (options + ("," if options else "")
                 + "MaxFragments=30,MinWords=64,MaxWords=64")
    headlines = ts_fast_headline(analyzed, query, effective, doc_id)
    fallback = F.array_join(
        F.slice(F.split(F.trim(F.col(content_col)), r"\s+"),
                1, fallback_words), " ")
    return (docs
            .join(headlines, on=doc_id, how="left")
            .select(doc_id,
                    F.coalesce(F.col("headline"), fallback).alias("headline")))
