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
  passage selection IN CANONICAL-CHUNK space (PG counts parser word
  tokens: compounds count as their parts, non-ASCII symbol runs count
  as words) — hlCover enumeration anchors each cover on the first
  query-item word at-or-after the scan point and closes it at the
  smallest index whose window SATISFIES the query phrase-/boolean-aware
  (NOT-branches vacuous); each cover is resized (truncate to MaxWords;
  extend forward to MinWords ending on a word longer than ShortWord OR
  a query-item word, backward under the same rule only when the
  document ends early), covers then compete on query-item word count
  within the resized window, first wins ties; document-head MinWords
  passage (no ShortWord logic) when no cover — then phase 2 runs
  TS_FAST_HEADLINE over the selected passage with the reference's
  forced MaxFragments=30,MinWords=64,MaxWords=64 overlay (:64-68),
  COALESCE to the trimmed passage on no exact phrase match (:69).
  Verified string-exact against every ad-hoc pgTAP assertion in
  english_lang_test.sql:33-95 and german_lang_test.sql:111-149, AND
  fuzz-validated 0-divergent against the LIVE reference extension
  running in PostgreSQL (scripts/validate_reference_pg.py, ~1000
  doc×query cases across several seeds).

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


def _phrase_starts(phrase, chunk_lex: list) -> tuple[list, int]:
    """(sorted start indices where the phrase matches the chunk stream,
    span) — PG's headline machinery is PHRASE-AWARE (live-probed: a
    '<->' query with no adjacent occurrence has NO cover and falls back
    to the document head), so satisfaction must check aligned
    positions, not bag presence."""
    items = phrase.items
    base = items[0][1]
    span = phrase.span
    n = len(chunk_lex)
    starts = []
    for s in range(n - span):
        ok = True
        for lx, pos in items:
            if chunk_lex[s + (pos - base)] != lx:
                ok = False
                break
        if ok:
            starts.append(s)
    return starts, span


def _formula_sat(node, l: int, r: int, starts: dict) -> bool:
    """PG hlCover's satisfaction test for window [l..r]: phrase = an
    aligned match fully inside the window, AND/OR boolean, NOT-branches
    vacuously true (live-PG probes: 'aaa & !zzz' covers like plain
    'aaa'; 'aaa & zzz' with zzz absent has NO cover; 'aaa | zzz' covers
    on aaa alone)."""
    if node is None:
        return False
    if node.op == "phrase":
        import bisect
        ss, span = starts[id(node.phrase)]
        i = bisect.bisect_left(ss, l)
        return i < len(ss) and ss[i] + span <= r
    if node.op == "not":
        return True
    if node.op == "and":
        return all(_formula_sat(c, l, r, starts) for c in node.children)
    return any(_formula_sat(c, l, r, starts) for c in node.children)


def _has_positive_leaf(node) -> bool:
    if node is None:
        return False
    if node.op == "phrase":
        return True
    if node.op == "not":
        return False
    return any(_has_positive_leaf(c) for c in node.children)


def _collect_phrases(node, out: list) -> None:
    if node is None:
        return
    if node.op == "phrase":
        out.append(node.phrase)
        return
    for c in node.children:
        _collect_phrases(c, out)


def _select_passage(n: int, chunk_lex: list, word_lens: list, root,
                    item_lexemes: frozenset, min_words: int,
                    max_words: int, short_word: int) -> tuple[int, int]:
    """PostgreSQL default (non-fragment) ts_headline passage selection,
    in CANONICAL-CHUNK space (PG counts parser word tokens: a
    hyphenated compound counts as its parts — live-PG-probed).

    Every rule here is pinned by live-PG probes (scripts/
    validate_reference_pg.py + the round-4 probe session):
    - covers = minimal windows whose present-item set SATISFIES the
      positive boolean structure (OR needs one side, AND needs all,
      NOT vacuous);
    - each cover is RESIZED first, then covers compete on poslen
      (query-item words inside the resized window, including negated
      items — PG marks those too), FIRST cover wins ties;
    - resize: covers longer than MaxWords truncate to their first
      MaxWords words; shorter-than-MinWords covers extend forward
      until >= MinWords ending on a word longer than ShortWord (capped
      at MaxWords), then backward under the same rule when the
      document ends first;
    - NOCOVER: plain first-MinWords document head, NO ShortWord logic
      (probed: the fallback happily ends on a short word)."""

    def resize(p: int, q: int) -> tuple[int, int]:
        curlen = q - p + 1
        if curlen > max_words:
            return p, p + max_words - 1
        b, e = p, q
        if curlen < min_words:
            i = q + 1
            while i < n and curlen < max_words:
                curlen += 1
                e = i
                if curlen >= min_words and (word_lens[i] > short_word
                                            or chunk_lex[i] is not None):
                    # a query-item word ends the window even when short
                    # ('... dog' golden-fuzz case); PG treats item words
                    # as good endings regardless of ShortWord
                    break
                i += 1
            # backward ONLY when the document ended before MinWords; it
            # keeps extending past short words until a long word (probed:
            # [43..59] case) — but a window whose forward pass met
            # MinWords never moves its start (probed: covers starting on
            # a short match word stay put)
            if curlen < min_words:
                while b > 0 and curlen < max_words:
                    b -= 1
                    curlen += 1
                    if curlen >= min_words and (word_lens[b] > short_word
                                                or chunk_lex[b] is not None):
                        break
        return b, e

    covers: list = []
    if root is not None and _has_positive_leaf(root):
        phrases: list = []
        _collect_phrases(root, phrases)
        starts = {id(ph): _phrase_starts(ph, chunk_lex) for ph in phrases}
        # PG hlCover, as pinned by live probes: p anchors on the FIRST
        # position >= scan start holding ANY query item (even one from a
        # bag-unsatisfied phrase — the 'decide <-> negatively' fuzz doc
        # anchors on an earlier lone 'decide'); q is the SMALLEST index
        # where [p..q] SATISFIES the query phrase-/boolean-aware; then
        # the scan advances p+1. No q for the widest window => no
        # further cover for any later p either (windows only shrink).
        item_pos = [i for i in range(n) if chunk_lex[i] is not None]
        import bisect as _b
        s = 0
        while True:
            k = _b.bisect_left(item_pos, s)
            if k >= len(item_pos):
                break
            p = item_pos[k]
            if not _formula_sat(root, p, n - 1, starts):
                break
            lo, hi = p, n - 1
            while lo < hi:          # min q with sat(p, q): monotone in q
                mid = (lo + hi) // 2
                if _formula_sat(root, p, mid, starts):
                    hi = mid
                else:
                    lo = mid + 1
            covers.append((p, lo))
            s = p + 1

    if not covers:
        if n == 0:
            return (0, -1)
        return (0, min(min_words, n) - 1)

    best, bestlen = None, -1
    for p, q in covers:
        b, e = resize(p, q)
        poslen = sum(1 for i in range(b, e + 1)
                     if chunk_lex[i] in item_lexemes)
        if poslen > bestlen:
            best, bestlen = (b, e), poslen
    return best


def _all_item_lexemes(node, out: set) -> None:
    """Every query-item lexeme, INCLUDING negated branches — PG's
    headline machinery marks (and counts in poslen) negated items too;
    only the engine's fast-path highlight stage restricts to positive
    phrases, which is also the reference's behavior (its
    tsquery_to_tsvector drops negations before highlighting)."""
    if node is None:
        return
    if node.op == "phrase":
        for lx, _ in node.phrase.items:
            out.add(lx)
        return
    for c in node.children:
        _all_item_lexemes(c, out)


def _pg_passage_udf(query: CompiledQuery, cfg: str, min_words: int,
                    max_words: int, short_word: int):
    """Arrow UDF: raw content -> the pg-selected passage string.

    Works in canonical-chunk space (PG word-token counting: hyphenated
    compounds count as their parts), mapping the selected chunk window
    back to raw text. A window boundary inside a compound emits only
    the covered parts' original characters ('child-bearing' cut after
    'child' emits 'child'), matching PG's generateHeadline; edge tokens
    keep raw punctuation only at the document edges (english golden 4
    keeps 'hill.' at document end; german golden 1 drops the comma
    after 'Mädchen' mid-document)."""
    from ..functions.chars import BELL
    from ..functions.lexize import analyze_text_simple
    from ..functions.textprep import tsp_indexable_text

    item_lex: set = set()
    _all_item_lexemes(query.root, item_lex)
    item_lexemes = frozenset(item_lex)
    root = query.root
    strip_w = re.compile(r"\W+", re.UNICODE)

    def one(content: str) -> str:
        if content is None:
            return None
        toks = content.split()
        if not toks:
            return ""
        memo: dict = {}

        def tok_chunks(tok: str):
            got = memo.get(tok)
            if got is None:
                canon = tsp_indexable_text(tok)
                ctexts = canon.split(" ") if canon else []
                lexs = analyze_text_simple(tok, cfg)
                if len(lexs) < len(ctexts):
                    lexs = lexs + [None] * (len(ctexts) - len(lexs))
                got = [(c.replace(BELL, ""),
                        len(strip_w.sub("", c)),
                        lexs[i] if lexs[i] in item_lexemes else None)
                       for i, c in enumerate(ctexts)]
                if not got:
                    # pure-symbol token: ASCII symbols are parser blanks
                    # (uncounted), but non-ASCII symbol runs ('—', '…')
                    # are 'word' tokens in PG's parser and COUNT toward
                    # MinWords/MaxWords (the german corpus golden pins
                    # this: 'hatte — doch' is three words)
                    sym = sum(1 for ch in tok
                              if ord(ch) > 127 and not ch.isspace())
                    if sym:
                        got = [(tok, sym, None)]
                memo[tok] = got
            return got

        # flat chunk arrays + owner mapping
        chunk_lex: list = []
        word_lens: list = []
        owner: list = []        # (tok_idx, chunk_idx_in_tok, n_chunks)
        originals: list = []
        for ti, tok in enumerate(toks):
            cs = tok_chunks(tok)
            for ci, (orig, wl, lx) in enumerate(cs):
                chunk_lex.append(lx)
                word_lens.append(wl)
                owner.append((ti, ci, len(cs)))
                originals.append(orig)
        n = len(chunk_lex)
        if n == 0:
            return ""

        b, e = _select_passage(n, chunk_lex, word_lens, root,
                               item_lexemes, min_words, max_words,
                               short_word)
        if e < b:
            return ""

        tb, jb, _ = owner[b]
        te, je, ke = owner[e]
        if tb == te:
            cs = tok_chunks(toks[tb])
            text = "".join(o for o, _, _ in cs[jb:je + 1])
            window = [text]
        else:
            first = (toks[tb] if jb == 0 else
                     "".join(o for o, _, _ in tok_chunks(toks[tb])[jb:]))
            last = (toks[te] if je == ke - 1 else
                    "".join(o for o, _, _ in tok_chunks(toks[te])[:je + 1]))
            window = [first] + toks[tb + 1:te] + [last]
        # edge punctuation stripping (generateHeadline drops the blank
        # run after the last word) — but a pure-SYMBOL word token at the
        # edge ('—' counts as a parser word) must survive: stripping
        # would delete the word itself, not trailing blanks
        if b > 0:
            lead = _RE_STRIP_LEAD.sub("", window[0])
            if lead:
                window[0] = lead
        if e < n - 1:
            tail = _RE_STRIP_TAIL.sub("", window[-1])
            if tail:
                window[-1] = tail
        return " ".join(w for w in window if w)

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
