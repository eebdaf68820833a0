"""Dutch Snowball stemmer.

Implements the published "Dutch stemming algorithm" from the Snowball
project — the algorithm behind PostgreSQL's `dutch_stem` dictionary
(PG 15 vendors the classic algorithm, not Snowball 3.0's revision).
Same integration contract as the other Snowball modules: the config
plugs into the shared registry (functions/lexize.py). Validated against
a LIVE PostgreSQL 15 `ts_lexize('dutch_stem', w)` by
scripts/validate_stemmers_pg.py (0-mismatch bar).

Algorithm shape: prelude removes umlaut/acute accents and marks initial
y, post-vocalic y and intervocalic i as consonants (upper case); R1 is
adjusted to start no earlier than the third letter; suffix steps share
an `undouble` (kk/dd/tt) helper and a final double-vowel undoubling
(maan -> man) that the e/en deletions expose.
"""

from __future__ import annotations

_VOWELS = set("aeiouyè")

_DEACCENT = str.maketrans("äëïöüáéíóú", "aeiouaeiou")


def _isv(c: str) -> bool:
    return c in _VOWELS


def _prelude(word: str) -> str:
    s = list(word.translate(_DEACCENT))
    for i, c in enumerate(s):
        if c == "y" and (i == 0 or _isv(s[i - 1])):
            s[i] = "Y"
        elif (c == "i" and i > 0 and _isv(s[i - 1])
                and i + 1 < len(s) and _isv(s[i + 1])):
            s[i] = "I"
    return "".join(s)


def _boff(s: str, i: int) -> int:
    """UTF-8 byte offset of character i — region marks are BYTE
    positions, matching the generated Snowball C code PG runs."""
    return len(s[:i].encode("utf-8"))


def _mark_r1r2(s: str) -> tuple[int, int]:
    """Byte-offset region marks. The Dutch source adjusts R1 with a
    literal `$p1 = 3` — three BYTES, not three letters (German uses
    `hop 3`/`setmark x`, which IS character-aware; Dutch does not) — so
    a 2-byte letter like à in the first letters shifts R1 one letter
    earlier than a character count would. Verified against live PG 15:
    dutch_stem('eàe') = 'eà' (final-e deletion fires because p1 = byte 3
    = after 'eà'), while a character-based floor would block it."""
    n = len(s)
    r1 = n
    for i in range(1, n):
        if not _isv(s[i]) and _isv(s[i - 1]):
            r1 = i + 1
            break
    r2 = n
    for i in range(r1 + 1, n):
        if not _isv(s[i]) and _isv(s[i - 1]):
            r2 = i + 1
            break
    r1_b = _boff(s, r1)
    if r1_b < 3:
        r1_b = 3
    return r1_b, _boff(s, r2)


def _in(region_start_b: int, s: str, suf_len: int) -> bool:
    """True if a suffix of suf_len chars starts at or after the byte
    mark — i.e. lies entirely inside the region."""
    return _boff(s, len(s) - suf_len) >= region_start_b


def _undouble(s: str) -> str:
    for dd in ("kk", "dd", "tt"):
        if s.endswith(dd):
            return s[:-1]
    return s


def _valid_s_ending(s: str) -> bool:
    return bool(s) and not _isv(s[-1]) and s[-1] != "j"


def _valid_en_ending(s: str) -> bool:
    return bool(s) and not _isv(s[-1]) and not s.endswith("gem")


def _step1(s: str, r1: int) -> str:
    n = len(s)
    # longest among: heden | en ene | s se
    if s.endswith("heden"):
        if _in(r1, s, 5):
            return s[:-5] + "heid"
        return s
    for suf in ("ene", "en"):
        if s.endswith(suf):
            stem = s[:-len(suf)]
            if _in(r1, s, len(suf)) and _valid_en_ending(stem):
                return _undouble(stem)
            return s
    for suf in ("se", "s"):
        if s.endswith(suf):
            stem = s[:-len(suf)]
            if _in(r1, s, len(suf)) and _valid_s_ending(stem):
                return stem
            return s
    return s


def _step2(s: str, r1: int) -> tuple[str, bool]:
    """Delete suffix e if in R1 and preceded by a non-vowel; undouble."""
    n = len(s)
    if (s.endswith("e") and _in(r1, s, 1)
            and n >= 2 and not _isv(s[-2])):
        return _undouble(s[:-1]), True
    return s, False


def _step3a(s: str, r1: int, r2: int) -> str:
    """heid deletion is conditioned on R2 (seeded fuzz vs live PG:
    'asbeheid' keeps its heid — R1 would delete it); the follow-up en
    removal is the step-1 R1 rule."""
    n = len(s)
    if s.endswith("heid") and _in(r2, s, 4) and (n < 5 or s[-5] != "c"):
        s = s[:-4]
        # then treat a preceding en as in step 1
        if s.endswith("en"):
            stem = s[:-2]
            if _in(r1, s, 2) and _valid_en_ending(stem):
                s = _undouble(stem)
    return s


def _step3b(s: str, r1: int, r2: int, e_removed: bool) -> str:
    n = len(s)
    # longest among the d-suffixes
    for suf in ("end", "ing"):
        if s.endswith(suf):
            if _in(r2, s, 3):
                s = s[:-3]
                if (s.endswith("ig") and _in(r2, s, 2)
                        and (len(s) < 3 or s[-3] != "e")):
                    s = s[:-2]
                else:
                    s = _undouble(s)
            return s
    if s.endswith("lijk"):
        if _in(r2, s, 4):
            s = s[:-4]
            s, _ = _step2(s, r1)
        return s
    if s.endswith("baar"):
        if _in(r2, s, 4):
            s = s[:-4]
        return s
    if s.endswith("ig"):
        if _in(r2, s, 2) and (n < 3 or s[-3] != "e"):
            s = s[:-2]
        return s
    if s.endswith("bar"):
        if _in(r2, s, 3) and e_removed:
            s = s[:-3]
        return s
    return s


def _step4(s: str) -> str:
    """Undouble vowel: word ends C-VV-D (D a non-vowel other than I,
    VV in {aa, ee, oo, uu}, C a non-vowel) -> drop one vowel."""
    n = len(s)
    if n >= 4 and not _isv(s[-1]) and s[-1] != "I":
        if s[-2] == s[-3] and s[-2] in "aeou" and not _isv(s[-4]):
            return s[:-2] + s[-1]
    return s


def _postlude(s: str) -> str:
    return s.replace("I", "i").replace("Y", "y")


def stem_dutch(word: str) -> str:
    s = _prelude(word)
    r1, r2 = _mark_r1r2(s)

    s = _step1(s, r1)
    s, e_removed = _step2(s, r1)
    s = _step3a(s, r1, r2)
    s = _step3b(s, r1, r2, e_removed)
    s = _step4(s)
    return _postlude(s)
