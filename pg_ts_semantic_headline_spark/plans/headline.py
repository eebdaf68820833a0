"""Whole-phrase headline generation as DataFrame plans.

- `ts_fast_headline_cover_density`
  (/root/reference/sql/ts_fast_headline_cover_density.sql:58-97): bucket the
  exact matches by word window, slice the recall array around each bucket,
  wrap every matched string with the selection tags in one regex pass, rank
  buckets by match density.
- `ts_fast_headline` (/root/reference/sql/ts_fast_headline.sql:51-66): join
  fragments with the delimiter and strip indexing tokens.
- `ts_semantic_headline` (/root/reference/sql/ts_semantic_headline.sql:52-70):
  the 1:1 ts_headline replacement. Faithful two-phase flow: phase 1
  reimplements PostgreSQL's built-in ts_headline default (non-fragment)
  passage selection — minimal covers containing every distinct query
  lexeme, best cover by query-word count (first wins ties), window
  extended forward to MinWords words skipping ShortWord-or-shorter end
  words, backward at document end, document-head passage when no cover —
  then phase 2 runs TS_FAST_HEADLINE over the selected passage with the
  reference's forced MaxFragments=30,MinWords=64,MaxWords=64 overlay
  (:64-68), COALESCE to the trimmed passage on no exact phrase match
  (:69). Verified string-exact against every ad-hoc pgTAP assertion in
  english_lang_test.sql:33-95 and german_lang_test.sql:111-149.

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
    from ..functions.textprep import tsp_present_series

    def run(text: pd.Series) -> pd.Series:
        return tsp_present_series(text, stop_sel)

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


_RE_STRIP_LEAD = re.compile(r"^\W+", re.UNICODE)
_RE_STRIP_TAIL = re.compile(r"\W+$", re.UNICODE)


def _select_passage(toks: list, match_sets: list, required: frozenset,
                    min_words: int, max_words: int,
                    short_word: int) -> tuple[int, int]:
    """PostgreSQL default (non-fragment) ts_headline passage selection over
    whitespace tokens: enumerate minimal covers holding every distinct
    query lexeme, pick the cover with the most query-item words (first
    wins ties), then size the window — forward to >= min_words ending on a
    word longer than ShortWord, capped at max_words; backward when the
    document ends first; document head when no cover exists."""
    n = len(toks)
    # pg's hlCover needs EVERY distinct query item in the window — a query
    # lexeme absent from the whole document means NO cover (fallback to the
    # document head), even when the other lexemes all occur
    seen = set()
    for s in match_sets:
        seen |= s
    if not required <= seen:
        required = frozenset()

    def wlen(tok: str) -> int:
        return len(_RE_STRIP_TAIL.sub("", _RE_STRIP_LEAD.sub("", tok)))

    def grow(p: int, q: int) -> tuple[int, int]:
        curlen = q - p + 1
        if curlen >= max_words:
            return p, p + max_words - 1
        e, i = q, q + 1
        while i < n and curlen < max_words:
            curlen += 1
            e = i
            if curlen >= min_words and wlen(toks[i]) > short_word:
                break
            i += 1
        b = p
        while curlen < min_words and b > 0:
            b -= 1
            curlen += 1
        while b > 0 and curlen < max_words and wlen(toks[b]) <= short_word:
            b -= 1
            curlen += 1
        return b, e

    covers = []
    if required:
        # minimal windows containing all required lexemes (two pointers)
        from collections import Counter
        cnt: Counter = Counter()
        have, left = 0, 0
        for right in range(n):
            for x in match_sets[right]:
                cnt[x] += 1
                if cnt[x] == 1:
                    have += 1
            while have == len(required):
                if any(cnt[x] == 1 for x in match_sets[left]):
                    break
                for x in match_sets[left]:
                    cnt[x] -= 1
                left += 1
            if have == len(required):
                covers.append((left, right))
                for x in match_sets[left]:
                    cnt[x] -= 1
                    if cnt[x] == 0:
                        have -= 1
                left += 1

    if not covers:
        # no cover: document-head passage (pg's NOCOVER behavior)
        return grow(0, 0) if n else (0, -1)

    best, bestlen = None, -1
    for p, q in covers:
        hi = min(q, p + max_words - 1)
        poslen = sum(1 for i in range(p, hi + 1) if match_sets[i])
        if poslen > bestlen:
            best, bestlen = (p, q), poslen
    return grow(*best)


def _pg_passage_udf(query: CompiledQuery, cfg: str, min_words: int,
                    max_words: int, short_word: int):
    """Arrow UDF: raw content -> the pg-selected passage string. Token
    emission matches pg's generateHeadline: the passage ends at the last
    WORD (trailing punctuation stripped) unless it reaches the document
    edge, where the raw edge token is kept verbatim (english_lang golden 4
    keeps 'hill.' at document end; german golden 1 drops the comma after
    'Mädchen' mid-document)."""
    from ..functions.lexize import analyze_text_simple

    qlex = frozenset(query.lexemes)

    def one(content: str) -> str:
        if content is None:
            return None
        toks = content.split()
        if not toks:
            return ""
        memo: dict = {}

        def mset(tok: str) -> frozenset:
            got = memo.get(tok)
            if got is None:
                lexs = analyze_text_simple(tok, cfg)
                got = qlex.intersection(x for x in lexs if x is not None)
                memo[tok] = got
            return got

        match_sets = [mset(t) for t in toks] if qlex else [frozenset()] * len(toks)
        b, e = _select_passage(toks, match_sets, qlex, min_words, max_words,
                               short_word)
        if e < b:
            return ""
        window = list(toks[b:e + 1])
        if b > 0:
            window[0] = _RE_STRIP_LEAD.sub("", window[0])
        if e < len(toks) - 1:
            window[-1] = _RE_STRIP_TAIL.sub("", window[-1])
        return " ".join(window)

    def run(content: pd.Series) -> pd.Series:
        return content.map(one)

    return F.pandas_udf(run, returnType=StringType())


def ts_semantic_headline(
    docs: DataFrame,
    query: CompiledQuery,
    options: str = "",
    content_col: str = "content",
    config: str | None = None,
    doc_id: str = "doc_id",
) -> DataFrame:
    """Ad-hoc 1:1 ts_headline replacement (see module docstring): pg-style
    passage selection over raw content, then the fast path over ONLY the
    selected passage — the re-analysis phase 2 pays for ~MaxWords words
    per doc, not the whole document."""
    from .query_compiler import require_no_prefixes
    require_no_prefixes(query, "ts_semantic_headline (ad-hoc, no dictionary)")
    cfg = config or query.config
    opts = parse_headline_options(options)
    min_words = int(opts.get("MinWords", 15))
    max_words = int(opts.get("MaxWords", 35))
    short_word = int(opts.get("ShortWord", 3))

    passage = _pg_passage_udf(query, cfg, min_words, max_words, short_word)
    passages = (docs
                .select(doc_id, F.col(content_col))
                .withColumn("_passage", passage(F.col(content_col)))
                .drop(content_col))
    analyzed = with_analysis(passages, content_col="_passage", config=cfg)
    effective = (options + ("," if options else "")
                 + "MaxFragments=30,MinWords=64,MaxWords=64")
    headlines = ts_fast_headline(analyzed, query, effective, doc_id)
    return (passages
            .join(headlines, on=doc_id, how="left")
            .select(doc_id,
                    F.coalesce(F.col("headline"),
                               F.trim(F.col("_passage"))).alias("headline")))
