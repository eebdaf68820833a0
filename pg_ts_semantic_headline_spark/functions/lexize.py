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
- french / spanish / portuguese / italian / russian / dutch / swedish /
  norwegian / danish: same shape with the
  respective stopword lists and Snowball stemmers (extensions beyond the
  reference's english/german/simple test surface — the reference accepts
  any REGCONFIG via its overloads, /root/reference/sql/to_tspquery.sql:
  36-45, so these are the largest web-corpus languages routed through
  the same registry; each is validated to 0 mismatches against a live
  PostgreSQL 15 by scripts/validate_stemmers_pg.py)
"""

from __future__ import annotations

import re
from functools import lru_cache

from .chars import BELL, SMC_CLASS
from .stemmer_de import stem_german
from .stemmer_en import stem_english
from .stemmer_es import stem_spanish
from .stemmer_fr import stem_french
from .stemmer_it import stem_italian
from .stemmer_pt import stem_portuguese
from .stemmer_nl import stem_dutch
from .stemmer_ru import stem_russian
from .stemmer_scand import stem_danish, stem_norwegian, stem_swedish
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
    "french": stem_french,
    "spanish": stem_spanish,
    "portuguese": stem_portuguese,
    "italian": stem_italian,
    "russian": stem_russian,
    "dutch": stem_dutch,
    "swedish": stem_swedish,
    "norwegian": stem_norwegian,
    "danish": stem_danish,
    "simple": None,
    # source-code config: lowercase, no stopwords, no stemming (like
    # simple), plus camelCase splitting in the canonicalization step —
    # see camel_mark / the base_config checks in analyze_document
    "code": None,
}

SUPPORTED_CONFIGS = tuple(_STEMMERS)

# camelCase boundaries for the "code" config: lower/digit→Upper
# ("fooBar" → foo|Bar) and acronym→word ("HTTPServer" → HTTP|Server).
# Markers are inserted AFTER tsp_indexable_text, as the single-BELL
# intra-word split the canonicalizer already produces for "hyphen-ated":
# the recall token keeps the original characters + BELL, positions stay
# aligned, and tsp_present_text re-joins the pieces to the EXACT source
# spelling at display time. snake_case needs nothing ('_' is already a
# word-breaking delimiter).
_RE_CAMEL_LOW_UP = re.compile(r"(?<=[a-z0-9])(?=[A-Z])")
_RE_CAMEL_ACRO = re.compile(r"(?<=[A-Z])(?=[A-Z][a-z])")


def camel_mark(canonicalized: str) -> str:
    """Insert intra-word split markers at camelCase boundaries of an
    already-canonicalized string (boundaries never span a space, so this
    only splits within tokens)."""
    s = _RE_CAMEL_LOW_UP.sub(f"{BELL} ", canonicalized)
    return _RE_CAMEL_ACRO.sub(f"{BELL} ", s)


def base_config(config: str) -> str:
    """The underlying stemmer config: resolves synonym:/thesaurus:
    dictionary configs to their base, returns plain configs unchanged."""
    if config.startswith(SYNONYM_PREFIX):
        return _synonym_spec(config)[0]
    if config.startswith(THESAURUS_PREFIX):
        return _thesaurus_spec(config)[0]
    return config

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


# Thesaurus configs — PG's `TEMPLATE = thesaurus`: multi-word phrases
# replaced by one lexeme. Like PG, matching happens on the OUTPUT of the
# subdictionary (the base config's lexemes), so 'supernovae stars' in the
# file matches 'supernova star' in text; a base stopword inside a file
# phrase lexizes to None and then matches ANY stopword at that slot (PG's
# `?` wildcard, by construction). The substitute lexeme takes the FIRST
# matched word's position and the rest become None holes — positions are
# NOT renumbered (PG renumbers), keeping this engine's lexeme-position ==
# recall-array-index invariant; headlines therefore highlight the first
# word of a substituted phrase. Same file-path-in-config-string transport
# as synonym configs.
THESAURUS_PREFIX = "thesaurus:"


def make_thesaurus_config(base: str, entries: dict, path: str) -> str:
    """Write a thesaurus dictionary file and return its config string.

    `entries` maps a space-separated phrase (surface words) to its
    substitute lexeme; phrases are base-lexized at load time (PG runs the
    subdictionary over the file too). A phrase whose FIRST word lexizes
    to a stopword cannot anchor a match and is rejected."""
    import json

    if base not in _STEMMERS:
        raise ValueError(f"unknown base config {base!r}")
    norm = {}
    for phrase, sub in entries.items():
        words = str(phrase).split()
        if not words or sub in (None, ""):
            raise ValueError(f"bad thesaurus entry {phrase!r}: {sub!r}")
        key = [lexize_chunk(w.lower(), base) for w in words]
        if key[0] is None:
            raise ValueError(
                f"thesaurus phrase {phrase!r} starts with a stopword")
        norm[" ".join("?" if k is None else k for k in key)] = \
            str(sub).lower()
    with open(path, "w") as f:
        json.dump(norm, f, sort_keys=True)
    return f"{THESAURUS_PREFIX}{base}:{path}"


@lru_cache(maxsize=64)
def _thesaurus_spec(config: str) -> tuple[str, dict]:
    """(base, trie) for a thesaurus: config — trie maps first lexeme →
    list of (lexeme_pattern_tuple, substitute), longest first; '?' slots
    match any stopword (None)."""
    base, _, path = config[len(THESAURUS_PREFIX):].partition(":")
    if base not in _STEMMERS or not path:
        raise ValueError(f"malformed thesaurus config {config!r}")
    import json

    with open(path) as f:
        raw = json.load(f)
    trie: dict = {}
    for key, sub in raw.items():
        pat = tuple(None if w == "?" else w for w in key.split(" "))
        trie.setdefault(pat[0], []).append((pat, sub))
    for pats in trie.values():
        pats.sort(key=lambda e: (-len(e[0]), e[0][1:] or ("",)))
    return base, trie


def apply_thesaurus(lexemes: list, config: str) -> list:
    """Greedy longest-match substitution over a base-lexeme stream
    (None = stopword slot). Output is position-aligned with the input:
    the substitute sits at the first matched slot, the rest become None."""
    return _apply_thesaurus_roles(lexemes, config)[0]


def _apply_thesaurus_roles(lexemes: list, config: str) -> tuple[list, list]:
    """apply_thesaurus plus a position-aligned role list: 'head' at a
    matched phrase's first slot, 'tail' at its swallowed rest, None
    elsewhere. ts_debug needs the ROLES, not a value diff: a substitute
    can equal the head's own base lexeme, and a '?'-matched stopword tail
    slot is None both before and after, so comparing pre/post values
    misattributes exactly those rows."""
    _, trie = _thesaurus_spec(config)
    out = list(lexemes)
    roles: list = [None] * len(out)
    n = len(out)
    i = 0
    while i < n:
        lx = out[i]
        cands = trie.get(lx) if lx is not None else None
        if cands:
            for pat, sub in cands:
                m = len(pat)
                if i + m <= n and all(
                        out[i + j] == pat[j] for j in range(1, m)):
                    out[i] = sub
                    roles[i] = "head"
                    for j in range(1, m):
                        out[i + j] = None
                        roles[i + j] = "tail"
                    i += m
                    break
            else:
                i += 1
        else:
            i += 1
    return out, roles


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
    if isinstance(config, str):
        try:
            if config.startswith(SYNONYM_PREFIX):
                _synonym_spec(config)
                return True
            if config.startswith(THESAURUS_PREFIX):
                _thesaurus_spec(config)
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
    elif config.startswith(THESAURUS_PREFIX):
        # per-chunk lexize uses the subdictionary only; the multi-word
        # substitution is a stream pass (apply_thesaurus) over the result
        config = _thesaurus_spec(config)[0]
    if config not in _STEMMERS:
        raise ValueError(
            f"unknown text search config {config!r}"
            + ("; this index was built with a per-document config column —"
               " pass an explicit config= to driver-side re-analysis"
               if config == "percolumn" else ""))
    if config == "russian" and lower.isascii():
        # PG's built-in `russian` regconfig maps the parser's asciiword/
        # asciihword token types to english_stem (verified by ts_debug on
        # live PG 15), so pure-ASCII tokens take the ENGLISH stopword
        # list and Porter2 — 'running the мальчики' indexes as
        # 'run:1 мальчик:3'. Non-Latin-only configs are the only ones
        # with this split; every Latin config routes asciiword to its
        # own stemmer.
        config = "english"
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
    """Lexize a bare word (query-side helper; word may carry punctuation).
    Under a thesaurus config, single-word entries still substitute (a
    bare word can never match a multi-word phrase)."""
    lx = lexize_chunk(word, config)
    if lx is not None and config.startswith(THESAURUS_PREFIX):
        return apply_thesaurus([lx], config)[0]
    return lx


def ts_lexize(dictionary: str, token: str) -> list[str] | None:
    """PG ``ts_lexize(dict regdictionary, token text)`` (PG docs §12.8.3):
    run ONE dictionary over ONE token. Returns the emitted lexemes, []
    when the dictionary consumed the token as a stopword (PG prints {}),
    or None when the dictionary does not recognize the token.

    Dictionary names follow ts_debug's attribution: ``simple``,
    ``english_stem``/``german_stem``/``french_stem`` (a bare config name
    is accepted as its stem dictionary), or a full ``synonym:``/
    ``thesaurus:`` config string — for those, None signals a miss (PG's
    synonym template returns NULL on a miss so the next dictionary in
    the chain runs; the stem dictionaries never return NULL).

    Unlike `lexize_word`, there is no numword routing here: PG's
    ts_lexize bypasses the parser, so a digit-bearing token handed to a
    stem dictionary is stemmed like any other word."""
    core = _RE_STRIP.sub("", token)
    if not core:
        return None
    lower = core.lower()
    if dictionary == "simple":
        return [lower]
    if dictionary.startswith(SYNONYM_PREFIX):
        _, mapping = _synonym_spec(dictionary)
        if lower in mapping:
            sub = mapping[lower]
            return [] if sub is None else [sub]
        return None
    if dictionary.startswith(THESAURUS_PREFIX):
        base, trie = _thesaurus_spec(dictionary)
        lx = ts_lexize(base, token)
        anchor = lx[0] if lx else None
        for pat, sub in trie.get(anchor, []):
            if len(pat) == 1:
                return [sub]
        return None
    base = dictionary[:-5] if dictionary.endswith("_stem") else dictionary
    if base not in _STEMMERS:
        raise ValueError(f"unknown dictionary {dictionary!r}")
    stemmer = _STEMMERS[base]
    if stemmer is None:
        return [lower]
    if lower in STOPWORDS_BY_CONFIG[base]:
        return []
    return [stemmer(lower)]


def analyze_document(content: str, config: str) -> tuple[list[str], list[str | None]]:
    """Return (tokens, lexemes), position-aligned 1:1.

    tokens  - accent-preserving recall array (content_arr analog)
    lexemes - unaccented, lexized stream (content_tsv analog); None entries
              hold the position of stopwords so positions stay aligned.
    """
    if content is None:
        return [], []
    canon = tsp_indexable_text(content)
    if base_config(config) == "code" and canon:
        canon = camel_mark(canon)
    tokens = canon.split(" ") if canon else []
    # ASCII fast path: unaccent is the identity, so the unaccented
    # canonicalization IS `canon` — skip the second regex-chain pass
    # (the chain is the post-memoization kernel hotspot; most source
    # code and English text is pure ASCII)
    if content.isascii():
        indexed = canon
    else:
        indexed = tsp_indexable_text(unaccent(content))
        if base_config(config) == "code" and indexed:
            indexed = camel_mark(indexed)
    chunks = indexed.split(" ") if indexed else []
    lexemes = [lexize_chunk(c, config) for c in chunks]
    if config.startswith(THESAURUS_PREFIX):
        lexemes = apply_thesaurus(lexemes, config)
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
    if base_config(config) == "code" and indexed:
        indexed = camel_mark(indexed)
    chunks = indexed.split(" ") if indexed else []
    lexemes = [lexize_chunk(c, config) for c in chunks]
    if config.startswith(THESAURUS_PREFIX):
        lexemes = apply_thesaurus(lexemes, config)
    return lexemes


def ts_debug(config: str, text: str | None = None) -> list[dict]:
    """PG ``ts_debug(config, text)`` — per-token analyzer introspection
    (PG docs §12.8.1): for every token the parser emits, which dictionary
    consumed it and what lexemes came out. The debugging companion to
    `ts_stat`: "why does this query (not) match" answers start here.

    Returns driver-side rows (like the tsquery utilities — this is a
    human-in-the-loop debug tool, not a corpus operator) of
    ``{token, alias, dictionary, lexemes}``:

    - token       — the accent-PRESERVING surface chunk (what a headline
                    would restore), including any code-config camelCase
                    split marks;
    - alias       — parser classification, PG's names for the classes the
                    engine's tokenizer distinguishes: `asciiword`, `word`
                    (non-ASCII letters), `numword` (digit-bearing — routed
                    to the simple dictionary, never stemmed), `blank`
                    (strips to nothing);
    - dictionary  — `simple`, `<base>_stem`, `synonym`, `thesaurus`, or
                    None for blanks;
    - lexemes     — [] when the dictionary consumed the token as a
                    stopword (PG prints {}), None for blanks, else the
                    emitted lexemes. A thesaurus phrase substitutes on its
                    FIRST token; the swallowed continuation slots show
                    `thesaurus` with [] (they hold position gaps, per the
                    repo's alignment invariant).

    With one argument, the session default config applies (same arity
    convention as the query constructors)."""
    if text is None:
        from ..plans.query_compiler import _DEFAULT_CONFIG
        config, text = _DEFAULT_CONFIG, config
    if text is None:
        return []
    canon = tsp_indexable_text(text)
    is_code = base_config(config) == "code"
    if is_code and canon:
        canon = camel_mark(canon)
    tokens = canon.split(" ") if canon else []
    if text.isascii():
        indexed = canon
    else:
        indexed = tsp_indexable_text(unaccent(text))
        if is_code and indexed:
            indexed = camel_mark(indexed)
    chunks = indexed.split(" ") if indexed else []
    if len(chunks) != len(tokens):  # same guard as analyze_document
        chunks = (chunks + [""] * len(tokens))[: len(tokens)]
    pre = [lexize_chunk(c, config) for c in chunks]
    if config.startswith(THESAURUS_PREFIX):
        post, th_roles = _apply_thesaurus_roles(list(pre), config)
    else:
        post, th_roles = pre, [None] * len(pre)

    rows = []
    for token, chunk, lx_pre, lx_post, th_role in zip(
            tokens, chunks, pre, post, th_roles):
        core = _RE_STRIP.sub("", chunk)
        if not core:
            rows.append({"token": token, "alias": "blank",
                         "dictionary": None, "lexemes": None})
            continue
        lower = core.lower()
        # alias classifies the ORIGINAL surface form (PG parses before any
        # dictionary sees the token); lexize still runs unaccented
        surface = _RE_STRIP.sub("", token) or core
        if _RE_HAS_DIGIT.search(surface):
            alias = "numword"
        elif surface.isascii():
            alias = "asciiword"
        else:
            alias = "word"
        cfg = config
        if cfg.startswith(SYNONYM_PREFIX):
            base, mapping = _synonym_spec(cfg)
            if lower in mapping:
                sub = mapping[lower]
                rows.append({"token": token, "alias": alias,
                             "dictionary": "synonym",
                             "lexemes": [] if sub is None else [sub]})
                continue
            cfg = base
        elif cfg.startswith(THESAURUS_PREFIX):
            # attribute by the recorded match ROLE, not a pre/post value
            # diff: a substitute equal to the head's own base lexeme, or
            # a '?'-matched stopword tail (None before and after), has
            # lx_post == lx_pre yet was consumed by the thesaurus
            if th_role is not None:
                rows.append({"token": token, "alias": alias,
                             "dictionary": "thesaurus",
                             "lexemes": [] if lx_post is None
                             else [lx_post]})
                continue
            cfg = _thesaurus_spec(cfg)[0]
        stemmer = _STEMMERS[cfg]
        if stemmer is None or _RE_HAS_DIGIT.search(lower):
            rows.append({"token": token, "alias": alias,
                         "dictionary": "simple", "lexemes": [lower]})
        elif lower in STOPWORDS_BY_CONFIG[cfg]:
            rows.append({"token": token, "alias": alias,
                         "dictionary": f"{cfg}_stem", "lexemes": []})
        else:
            rows.append({"token": token, "alias": alias,
                         "dictionary": f"{cfg}_stem",
                         "lexemes": [stemmer(lower)]})
    return rows
