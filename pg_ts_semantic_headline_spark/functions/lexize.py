"""Lexeme analysis pipeline: chunk → lexeme, and full document analysis.

Reproduces what `to_tsvector(config, TSP_INDEXABLE_TEXT(UNACCENT(text)))`
yields in the reference (/root/reference/sql/to_tspvector.sql:19-27), as a
position-aligned lexeme array: element i-1 is the lexeme at position i, or
None where the position is consumed by a stopword / empty core (positions
count every token, matched or not — that is what keeps lexeme position n
equal to element n of the recall array).

Per-config behavior mirrors PostgreSQL's regconfigs:
- simple:  lowercase, no stopwords, no stemming
- english: tokens containing digits → lowercase only (numword → simple
  dict); otherwise stopword check then Porter2 stem
- german:  same shape with the German stopword list and Snowball stemmer
"""

from __future__ import annotations

import re
from functools import lru_cache

from .chars import BELL, SMC_CLASS
from .stemmer_de import stem_german
from .stemmer_en import stem_english
from .stopwords import STOPWORDS_BY_CONFIG
from .textprep import tsp_indexable_text
from .unaccent import unaccent

# A chunk of canonicalized text is word-core + optional trailing run of
# word-breaking chars + BELL markers (leading runs get split off and dropped
# by the canonicalizer), so stripping the breakers recovers the core.
_RE_STRIP = re.compile(f"[{SMC_CLASS}{BELL}]+")
_RE_HAS_DIGIT = re.compile(r"\d")

_STEMMERS = {
    "english": stem_english,
    "german": stem_german,
    "simple": None,
}

SUPPORTED_CONFIGS = tuple(_STEMMERS)

# Derived configs with a synonym dictionary in front of a base config —
# PG's `CREATE TEXT SEARCH DICTIONARY ... (TEMPLATE = synonym)` analog.
# The dictionary is DATA, not driver state: the config string embeds the
# JSON file's path ("synonym:<base>:<path>"), so the per-row config column
# flowing into the Arrow analysis UDFs is self-contained — every executor
# process lazily loads (and memoizes) the file, exactly like PG workers
# read dictionary files from $SHAREDIR. On a multi-node cluster ship the
# file with `spark-submit --files` or put it on shared storage, the same
# assumption the index directory already makes. Files are treated as
# immutable once written (the loader memoizes by path): to change a
# mapping, write a NEW file.
SYNONYM_PREFIX = "synonym:"


def make_synonym_config(base: str, synonyms: dict, path: str) -> str:
    """Write a synonym dictionary file and return its config string.

    `synonyms` maps a surface token to its output lexeme; both sides are
    casefolded (PG casefolds synonym files). Map a token to None/"" to
    make it a custom stopword (the position is kept, like any stopword).
    A matched token bypasses the base pipeline entirely — PG's synonym
    dictionary is ahead of the stemmer and stops processing on a hit —
    so 'colour: color' indexes 'color' unstemmed; misses fall through to
    `base` ('english'/'german'/'simple')."""
    import json

    if base not in _STEMMERS:
        raise ValueError(f"unknown base config {base!r}")
    norm = {str(k).lower(): (str(v).lower() if v not in (None, "") else None)
            for k, v in synonyms.items()}
    with open(path, "w") as f:
        json.dump(norm, f, sort_keys=True)
    return f"{SYNONYM_PREFIX}{base}:{path}"


@lru_cache(maxsize=64)
def _synonym_spec(config: str) -> tuple[str, dict]:
    """(base, mapping) for a synonym: config string; memoized per process
    so the file is read once per executor, not per row."""
    base, _, path = config[len(SYNONYM_PREFIX):].partition(":")
    if base not in _STEMMERS or not path:
        raise ValueError(f"malformed synonym config {config!r}")
    import json

    with open(path) as f:
        return base, json.load(f)


@lru_cache(maxsize=131_072)
def is_supported_config(config: str) -> bool:
    """True for a base config or a well-formed, loadable synonym config."""
    if config in _STEMMERS:
        return True
    if isinstance(config, str) and config.startswith(SYNONYM_PREFIX):
        try:
            _synonym_spec(config)
            return True
        except Exception:
            return False
    return False


@lru_cache(maxsize=131_072)
def lexize_chunk(chunk: str, config: str) -> str | None:
    """Lexeme for one whitespace-delimited chunk, or None (stopword/empty).

    Memoized per process: token frequencies are Zipf-distributed, so in a
    long-lived executor the stemmer (90% of kernel time, measured) runs
    once per distinct surface form and every repeat is a C-level dict hit.
    The bound caps executor memory at a few tens of MB; eviction is LRU so
    a multi-tenant worker degrades gracefully, never wrongly."""
    core = _RE_STRIP.sub("", chunk)
    if not core:
        return None
    lower = core.lower()
    if config.startswith(SYNONYM_PREFIX):
        base, mapping = _synonym_spec(config)
        if lower in mapping:
            return mapping[lower]
        config = base
    stemmer = _STEMMERS[config]
    if stemmer is None:
        return lower
    if _RE_HAS_DIGIT.search(lower):
        # numeric-bearing tokens go through the simple dictionary in the
        # english/german regconfigs: lowercased, never stemmed.
        return lower
    if lower in STOPWORDS_BY_CONFIG[config]:
        return None
    return stemmer(lower)


def lexize_word(word: str, config: str) -> str | None:
    """Lexize a bare word (query-side helper; word may carry punctuation)."""
    return lexize_chunk(word, config)


def analyze_document(content: str, config: str) -> tuple[list[str], list[str | None]]:
    """Return (tokens, lexemes), position-aligned 1:1.

    tokens  - accent-preserving recall array (content_arr analog)
    lexemes - unaccented, lexized stream (content_tsv analog); None entries
              hold the position of stopwords so positions stay aligned.
    """
    if content is None:
        return [], []
    canon = tsp_indexable_text(content)
    tokens = canon.split(" ") if canon else []
    # ASCII fast path: unaccent is the identity, so the unaccented
    # canonicalization IS `canon` — skip the second regex-chain pass
    # (the chain is the post-memoization kernel hotspot; most source
    # code and English text is pure ASCII)
    if content.isascii():
        indexed = canon
    else:
        indexed = tsp_indexable_text(unaccent(content))
    chunks = indexed.split(" ") if indexed else []
    lexemes = [lexize_chunk(c, config) for c in chunks]
    # Unaccenting almost never changes chunk boundaries; guard the invariant
    # cheaply rather than silently misaligning.
    if len(lexemes) != len(tokens):
        if len(lexemes) < len(tokens):
            lexemes = lexemes + [None] * (len(tokens) - len(lexemes))
        else:
            lexemes = lexemes[: len(tokens)]
    return tokens, lexemes


def analyze_text_simple(content: str, config: str) -> list[str | None]:
    """Lexeme array only (used by the semantic re-check on tiny slices)."""
    indexed = tsp_indexable_text(
        content if content.isascii() else unaccent(content))
    chunks = indexed.split(" ") if indexed else []
    return [lexize_chunk(c, config) for c in chunks]
