"""Spanish Snowball stemmer.

Implements the published "Spanish stemming algorithm" from the Snowball
project — the algorithm behind PostgreSQL's `spanish_stem` dictionary.
Same integration contract as the French stemmer (stemmer_fr.py): the
config plugs into the shared registry, so analysis, query compilation,
index build and headlines work unchanged with config='spanish'.

Same unaccent-first caveat as the other non-English configs: in-pipeline
input arrives lowercased and unaccented, so the accented suffix rules
(ación, ía, ó …) rarely fire there; the residual step-3 deletions (final
a/o/os/e) recover most of the conflation, and query/document text flow
through the identical path so matching stays consistent. The accented
rules are kept in full for standalone use.
"""

from __future__ import annotations

_VOWELS = set("aeiouáéíóúü")

_ACCENT_FIX = str.maketrans("áéíóú", "aeiou")


def _isv(c: str) -> bool:
    return c in _VOWELS


def _mark_rv(s: str) -> int:
    """RV per the Spanish algorithm: second letter a consonant -> after
    the next following vowel; first two letters vowels -> after the next
    following consonant; consonant+vowel start -> after the third
    letter; else end of word."""
    n = len(s)
    if n < 3:
        return n
    if not _isv(s[1]):
        for i in range(2, n):
            if _isv(s[i]):
                return i + 1
        return n
    if _isv(s[0]) and _isv(s[1]):
        for i in range(2, n):
            if not _isv(s[i]):
                return i + 1
        return n
    return 3


def _mark_r1r2(s: str) -> tuple[int, int]:
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
    return r1, r2


def _in(region_start: int, word_len: int, suf_len: int) -> bool:
    return word_len - suf_len >= region_start


# ---------------------------------------------------------------- step 0

_PRONOUNS = sorted(
    ["me", "se", "sela", "selo", "selas", "selos", "la", "le", "lo",
     "las", "les", "los", "nos"], key=len, reverse=True)
# (preceding group, accent-fixed replacement or None for keep-as-is)
_STEP0_A = [("iéndo", "iendo"), ("ándo", "ando"),
            ("ár", "ar"), ("ér", "er"), ("ír", "ir")]
_STEP0_B = ["ando", "iendo", "ar", "er", "ir"]


def _step0(s: str, rv: int) -> str:
    """Attached pronoun: strip the clitic when preceded by a gerund /
    infinitive marker lying in RV; accented markers lose their accent."""
    for pron in _PRONOUNS:
        if not s.endswith(pron):
            continue
        base = s[: -len(pron)]
        nb = len(base)
        for pre, repl in _STEP0_A:
            if base.endswith(pre) and _in(rv, nb, len(pre)):
                return base[: -len(pre)] + repl
        for pre in _STEP0_B:
            if base.endswith(pre) and _in(rv, nb, len(pre)):
                return base
        # (c) yendo preceded by u — the u need not be in RV
        if (base.endswith("yendo") and _in(rv, nb, 5)
                and nb >= 6 and base[nb - 6] == "u"):
            return base
        return s  # pronoun matched but no valid preceding group
    return s


# ---------------------------------------------------------------- step 1

_STEP1 = sorted([
    ("anza", 1), ("anzas", 1), ("ico", 1), ("ica", 1), ("icos", 1),
    ("icas", 1), ("ismo", 1), ("ismos", 1), ("able", 1), ("ables", 1),
    ("ible", 1), ("ibles", 1), ("ista", 1), ("istas", 1), ("oso", 1),
    ("osa", 1), ("osos", 1), ("osas", 1), ("amiento", 1), ("amientos", 1),
    ("imiento", 1), ("imientos", 1),
    ("adora", 2), ("ador", 2), ("ación", 2), ("adoras", 2), ("adores", 2),
    ("aciones", 2), ("ante", 2), ("antes", 2), ("ancia", 2), ("ancias", 2),
    ("logía", 3), ("logías", 3),
    ("ución", 4), ("uciones", 4),
    ("encia", 5), ("encias", 5),
    ("amente", 6),
    ("mente", 7),
    ("idad", 8), ("idades", 8),
    ("iva", 9), ("ivo", 9), ("ivas", 9), ("ivos", 9),
], key=lambda e: -len(e[0]))


def _step1(s: str, r1: int, r2: int) -> tuple[str, bool]:
    n = len(s)
    for suf, g in _STEP1:
        if not s.endswith(suf):
            continue
        m = len(suf)
        if g == 1:
            if _in(r2, n, m):
                return s[:-m], True
        elif g == 2:
            if _in(r2, n, m):
                s = s[:-m]
                if s.endswith("ic") and _in(r2, len(s), 2):
                    s = s[:-2]
                return s, True
        elif g == 3:
            if _in(r2, n, m):
                return s[:-m] + "log", True
        elif g == 4:
            if _in(r2, n, m):
                return s[:-m] + "u", True
        elif g == 5:
            if _in(r2, n, m):
                return s[:-m] + "ente", True
        elif g == 6:  # amente
            if _in(r1, n, m):
                s = s[:-m]
                k = len(s)
                if s.endswith("iv") and _in(r2, k, 2):
                    s = s[:-2]
                    if s.endswith("at") and _in(r2, len(s), 2):
                        s = s[:-2]
                elif s.endswith(("os", "ic", "ad")) and _in(r2, k, 2):
                    s = s[:-2]
                return s, True
        elif g == 7:  # mente
            if _in(r2, n, m):
                s = s[:-m]
                k = len(s)
                for pre in ("ante", "able", "ible"):
                    if s.endswith(pre) and _in(r2, k, len(pre)):
                        s = s[: -len(pre)]
                        break
                return s, True
        elif g == 8:  # idad(es)
            if _in(r2, n, m):
                s = s[:-m]
                k = len(s)
                for pre in ("abil", "ic", "iv"):
                    if s.endswith(pre) and _in(r2, k, len(pre)):
                        s = s[: -len(pre)]
                        break
                return s, True
        elif g == 9:  # iva/ivo/ivas/ivos
            if _in(r2, n, m):
                s = s[:-m]
                if s.endswith("at") and _in(r2, len(s), 2):
                    s = s[:-2]
                return s, True
        return s, False  # longest match found; its condition failed
    return s, False


# --------------------------------------------------------------- step 2a

_STEP2A = sorted(["ya", "ye", "yan", "yen", "yeron", "yendo", "yo", "yó",
                  "yas", "yes", "yais", "yamos"], key=len, reverse=True)


def _step2a(s: str, rv: int) -> tuple[str, bool]:
    """Verb suffixes beginning y: delete if in RV and preceded by u
    (the u need not be in RV)."""
    n = len(s)
    for suf in _STEP2A:
        m = len(suf)
        if not (s.endswith(suf) and _in(rv, n, m)):
            continue
        if n - m >= 1 and s[n - m - 1] == "u":
            return s[:-m], True
        return s, False
    return s, False


# --------------------------------------------------------------- step 2b

_STEP2B_GU = ["en", "es", "éis", "emos"]
_STEP2B_PLAIN = """
arían arías arán arás aríais aría aréis aríamos aremos ará aré erían
erías erán erás eríais ería eréis eríamos eremos erá eré irían irías
irán irás iríais iría iréis iríamos iremos irá iré aba ada ida ía ara
iera ad ed id ase iese aste iste an aban ían aran ieran asen iesen aron
ieron ado ido ando iendo ió ar er ir as abas adas idas ías aras ieras
ases ieses ís áis abais íais arais ierais aseis ieseis asteis isteis
ados idos amos ábamos íamos imos áramos iéramos iésemos ásemos
""".split()

_STEP2B_ALL = sorted(
    [(x, "gu") for x in _STEP2B_GU] + [(x, "p") for x in _STEP2B_PLAIN],
    key=lambda e: -len(e[0]))


def _step2b(s: str, rv: int) -> tuple[str, bool]:
    n = len(s)
    for suf, g in _STEP2B_ALL:
        m = len(suf)
        # RV-limited search: non-fitting candidates fall through
        if not (s.endswith(suf) and _in(rv, n, m)):
            continue
        s = s[:-m]
        if g == "gu" and s.endswith("gu"):
            # delete the u (g remains); the u need not be in RV
            s = s[:-1]
        return s, True
    return s, False


# ---------------------------------------------------------------- step 3

_STEP3 = sorted(
    [("os", "d"), ("a", "d"), ("o", "d"), ("á", "d"), ("í", "d"),
     ("ó", "d"), ("e", "e"), ("é", "e")], key=lambda x: -len(x[0]))


def _step3(s: str, rv: int) -> str:
    """One RV-limited among: a candidate poking left of RV is a
    non-match and the scan falls through to shorter suffixes."""
    n = len(s)
    for suf, g in _STEP3:
        m = len(suf)
        if not (s.endswith(suf) and _in(rv, n, m)):
            continue
        s = s[:-m]
        if g == "e" and s.endswith("gu") and _in(rv, len(s), 1):
            # e/é preceded by gu with the u in RV: delete the u too
            s = s[:-1]
        return s
    return s


def stem_spanish(word: str) -> str:
    # no short-word guard: Snowball Spanish has none, and the final
    # acute-accent removal applies at any length
    s = word
    rv = _mark_rv(s)
    r1, r2 = _mark_r1r2(s)

    s = _step0(s, rv)
    s, changed1 = _step1(s, r1, r2)
    if not changed1:
        s, changed2a = _step2a(s, rv)
        if not changed2a:
            s, _ = _step2b(s, rv)
    s = _step3(s, rv)
    return s.translate(_ACCENT_FIX)
