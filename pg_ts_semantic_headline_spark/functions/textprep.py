"""Text canonicalization kernels.

`tsp_indexable_text` rewrites text so that, after whitespace-splitting, token
i of the split array corresponds 1:1 to lexeme position i of the analyzed
token stream — the core invariant the whole engine hangs on (reference:
/root/reference/sql/tsp_indexable_text.sql:67-133 and
problems/exact_matches.md). It does so by appending BELL (U+0001) + space
after every run of word-breaking characters, dropping pure-symbol tokens and
collapsing whitespace.

`tsp_present_text` is the display-time inverse (reference:
/root/reference/sql/tsp_present_text.sql:15-36): it removes the BELL+space
indexing tokens (re-joining intra-word splits), keeps word separation for
end-of-word splits, and re-seats a highlight close tag against its word.

These are pure-Python string kernels; Spark-side they run inside vectorized
pandas UDFs over Arrow batches (see `lexize.py`), never per-row Python rows.
"""

from __future__ import annotations

import re

from .chars import BELL, SMC_CLASS

_RE_NEWLINES = re.compile(r"[\n\r]")
_RE_LEADING_NONWORD = re.compile(r"^\W+")
_RE_SMC_BEFORE_SPACE = re.compile(f"([{SMC_CLASS}]+)\\s")
_RE_SMC_RUN = re.compile(f"([{SMC_CLASS}{BELL}]+)")
_RE_SPACE_SMC_SPACE = re.compile(f"(\\s)([{SMC_CLASS}]+) ")
_RE_PURE_SYMBOL_TOKEN = re.compile(f"\\s([{SMC_CLASS}]+{BELL}+)")
_RE_WS_RUN = re.compile(r"\s+")


def tsp_indexable_text(text: str) -> str:
    """Canonicalize ``text`` so word positions align with lexeme positions."""
    if text is None:
        return None
    s = _RE_NEWLINES.sub(" ", text)
    s = _RE_LEADING_NONWORD.sub("", s)
    # Word-breaking runs get BELL+space appended, forcing delimited terms
    # ("hyphen-ated", "don't") apart into individually indexed tokens.
    s = _RE_SMC_BEFORE_SPACE.sub(f"\\1{BELL} ", s)
    s = _RE_SMC_RUN.sub(f"\\1{BELL} ", s)
    s = _RE_SPACE_SMC_SPACE.sub(r"\1\2", s)
    # Tokens made only of symbols carry no lexeme: drop them entirely.
    s = _RE_PURE_SYMBOL_TOKEN.sub(" ", s)
    s = _RE_WS_RUN.sub(" ", s)
    return s.strip()


def tsp_present_text(text: str, end_delimiter: str = "</b>") -> str:
    """Strip indexing tokens for display; inverse of `tsp_indexable_text`."""
    if text is None:
        return None
    delim = re.escape(end_delimiter)
    s = text
    # Double BELL marks an end-of-word split: restore a single space.
    s = re.sub(f"{BELL}{BELL} ", " ", s)
    # Single BELL marks an intra-word split: re-join with no space.
    s = re.sub(f"{BELL} ", "", s)
    # Same two cases when a highlight close tag intervenes: seat the tag
    # directly against the word it closes.
    s = re.sub(f"{BELL}{BELL}({delim}) ", r"\1 ", s)
    s = re.sub(f"{BELL}({delim}) ", r"\1", s)
    s = s.replace(BELL, "")
    return s.strip()


def tsp_indexable_series(s):
    """Vectorized `tsp_indexable_text` over a pandas Series: the same
    compiled patterns applied via str.replace chains (C-loop per pattern
    instead of a Python call per row). Null-safe: NaN/None propagate."""
    out = s.str.replace(_RE_NEWLINES, " ", regex=True)
    out = out.str.replace(_RE_LEADING_NONWORD, "", regex=True)
    out = out.str.replace(_RE_SMC_BEFORE_SPACE, f"\\1{BELL} ", regex=True)
    out = out.str.replace(_RE_SMC_RUN, f"\\1{BELL} ", regex=True)
    out = out.str.replace(_RE_SPACE_SMC_SPACE, r"\1\2", regex=True)
    out = out.str.replace(_RE_PURE_SYMBOL_TOKEN, " ", regex=True)
    out = out.str.replace(_RE_WS_RUN, " ", regex=True)
    return out.str.strip()


def tsp_present_series(s, end_delimiter: str = "</b>"):
    """Vectorized `tsp_present_text` over a pandas Series."""
    delim = re.escape(end_delimiter)
    out = s.str.replace(f"{BELL}{BELL}({delim}) ", r"\1 ", regex=True)
    out = out.str.replace(f"{BELL}({delim}) ", r"\1", regex=True)
    out = out.str.replace(f"{BELL}{BELL} ", " ", regex=False)
    out = out.str.replace(f"{BELL} ", "", regex=False)
    out = out.str.replace(BELL, "", regex=False)
    return out.str.strip()


def to_tsp_text_array(text: str) -> list[str]:
    """Recall vector: whitespace-split canonicalized text, 0-indexed list
    whose element i-1 aligns with lexeme position i. Accent-PRESERVING
    (the analyzed stream is unaccented, this array is not)."""
    if text is None:
        return None
    prepared = tsp_indexable_text(text)
    if not prepared:
        return []
    return prepared.split(" ")
