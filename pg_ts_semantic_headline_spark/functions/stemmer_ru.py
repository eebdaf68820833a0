"""Russian Snowball stemmer.

Implements the published "Russian stemming algorithm" from the Snowball
project — the algorithm behind PostgreSQL's `russian_stem` dictionary.
Same integration contract as the other Snowball modules: the config
plugs into the shared registry (functions/lexize.py), so analysis,
query compilation, index build, search and headlines work unchanged
with config='russian'. Validated against a LIVE PostgreSQL 15
`ts_lexize('russian_stem', w)` by scripts/validate_stemmers_pg.py
(0-mismatch bar, like the other languages).

Control flow (all suffix tests limited to RV — the region after the
first vowel; Snowball wraps every backward step in `setlimit tomark
pV`): step 1 tries a perfective-gerund ending, else removes an optional
reflexive ending then the first of adjectival / verb / noun; step 2
deletes a final и; step 3 deletes the derivational ост/ость in R2;
step 4 tidies (нн undouble, superlative ейш/ейше, final ь). The
prelude maps every ё to е (Snowball 2.x behavior, vendored by PG 13+).
"""

from __future__ import annotations

_VOWELS = set("аеиоуыэюя")


def _isv(c: str) -> bool:
    return c in _VOWELS


def _mark_rv(s: str) -> int:
    for i, c in enumerate(s):
        if _isv(c):
            return i + 1
    return len(s)


def _mark_r2(s: str) -> int:
    n = len(s)
    r1 = n
    for i in range(1, n):
        if not _isv(s[i]) and _isv(s[i - 1]):
            r1 = i + 1
            break
    for i in range(r1 + 1, n):
        if not _isv(s[i]) and _isv(s[i - 1]):
            return i + 1
    return n


def _in(region_start: int, word_len: int, suf_len: int) -> bool:
    return word_len - suf_len >= region_start


def _ay_before(s: str, suf_len: int, rv: int) -> bool:
    """Group-1 condition: the ending is preceded by а or я, and that
    letter itself lies within the RV limit."""
    i = len(s) - suf_len - 1
    return i >= rv and s[i] in "ая"


# (suffix, group): group 1 requires a preceding а/я (kept), group 2
# deletes unconditionally. Longest-fitting-in-RV match wins; a failed
# group-1 condition fails the whole among (Snowball: no fallback to a
# shorter suffix after a rule body fails).
_PERFECTIVE_GERUND = sorted([
    ("в", 1), ("вши", 1), ("вшись", 1),
    ("ив", 2), ("ивши", 2), ("ившись", 2),
    ("ыв", 2), ("ывши", 2), ("ывшись", 2),
], key=lambda t: -len(t[0]))

_REFLEXIVE = ["ся", "сь"]

_ADJECTIVE = sorted([
    "ее", "ие", "ые", "ое", "ими", "ыми", "ей", "ий", "ый", "ой",
    "ем", "им", "ым", "ом", "его", "ого", "ему", "ому", "их", "ых",
    "ую", "юю", "ая", "яя", "ою", "ею",
], key=len, reverse=True)

_PARTICIPLE = sorted([
    ("ем", 1), ("нн", 1), ("вш", 1), ("ющ", 1), ("щ", 1),
    ("ивш", 2), ("ывш", 2), ("ующ", 2),
], key=lambda t: -len(t[0]))

_VERB = sorted([
    ("ла", 1), ("на", 1), ("ете", 1), ("йте", 1), ("ли", 1), ("й", 1),
    ("л", 1), ("ем", 1), ("н", 1), ("ло", 1), ("но", 1), ("ет", 1),
    ("ют", 1), ("ны", 1), ("ть", 1), ("ешь", 1), ("нно", 1),
    ("ила", 2), ("ыла", 2), ("ена", 2), ("ейте", 2), ("уйте", 2),
    ("ите", 2), ("или", 2), ("ыли", 2), ("ей", 2), ("уй", 2),
    ("ил", 2), ("ыл", 2), ("им", 2), ("ым", 2), ("ен", 2),
    ("ило", 2), ("ыло", 2), ("ено", 2), ("ят", 2), ("ует", 2),
    ("уют", 2), ("ит", 2), ("ыт", 2), ("ены", 2), ("ить", 2),
    ("ыть", 2), ("ишь", 2), ("ую", 2), ("ю", 2),
], key=lambda t: -len(t[0]))

_NOUN = sorted([
    "а", "ев", "ов", "ие", "ье", "е", "иями", "ями", "ами", "еи",
    "ии", "и", "ией", "ей", "ой", "ий", "й", "иям", "ям", "ием",
    "ем", "ам", "ом", "о", "у", "ах", "иях", "ях", "ы", "ь", "ию",
    "ью", "ю", "ия", "ья", "я",
], key=len, reverse=True)


def _grouped_among(s: str, rv: int,
                   table: list[tuple[str, int]]) -> tuple[str, bool]:
    """Longest suffix fitting in RV wins; group 1 additionally needs a
    preceding а/я inside RV (condition failure fails the whole among)."""
    n = len(s)
    for suf, grp in table:
        if s.endswith(suf) and _in(rv, n, len(suf)):
            if grp == 1 and not _ay_before(s, len(suf), rv):
                return s, False
            return s[:-len(suf)], True
    return s, False


def _plain_among(s: str, rv: int, sufs: list[str]) -> tuple[str, bool]:
    n = len(s)
    for suf in sufs:
        if s.endswith(suf) and _in(rv, n, len(suf)):
            return s[:-len(suf)], True
    return s, False


def _adjectival(s: str, rv: int) -> tuple[str, bool]:
    s, ok = _plain_among(s, rv, _ADJECTIVE)
    if not ok:
        return s, False
    s, _ = _grouped_among(s, rv, _PARTICIPLE)  # optional (try)
    return s, True


def _tidy_up(s: str, rv: int) -> str:
    n = len(s)
    for suf in ("ейше", "ейш"):
        if s.endswith(suf) and _in(rv, n, len(suf)):
            s = s[:-len(suf)]
            # нн undouble: both н's must lie within the limit (the test
            # over the preceding н moves the cursor too)
            if s.endswith("нн") and _in(rv, len(s), 2):
                s = s[:-1]
            return s
    if s.endswith("нн") and _in(rv, n, 2):
        return s[:-1]
    if s.endswith("ь") and _in(rv, n, 1):
        return s[:-1]
    return s


def stem_russian(word: str) -> str:
    s = word.replace("ё", "е")
    rv = _mark_rv(s)
    r2 = _mark_r2(s)

    # step 1
    s2, ok = _grouped_among(s, rv, _PERFECTIVE_GERUND)
    if ok:
        s = s2
    else:
        s, _ = _plain_among(s, rv, _REFLEXIVE)  # try reflexive
        s, ok = _adjectival(s, rv)
        if not ok:
            s, ok = _grouped_among(s, rv, _VERB)
        if not ok:
            s, _ = _plain_among(s, rv, _NOUN)

    # step 2: final и
    if s.endswith("и") and _in(rv, len(s), 1):
        s = s[:-1]

    # step 3: derivational ост/ость in R2 (strict: longest match only)
    for suf in ("ость", "ост"):
        if s.endswith(suf) and _in(rv, len(s), len(suf)):
            if _in(r2, len(s), len(suf)):
                s = s[:-len(suf)]
            break

    # step 4
    return _tidy_up(s, rv)
