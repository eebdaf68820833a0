"""Portuguese Snowball stemmer.

Implements the published "Portuguese stemming algorithm" from the
Snowball project — the algorithm behind PostgreSQL's `portuguese_stem`
dictionary. Same integration contract as the French/Spanish stemmers:
the config plugs into the shared registry (functions/lexize.py), so
analysis, query compilation, index build, search and headlines work
unchanged with config='portuguese'. Validated against a LIVE
PostgreSQL 15 `ts_lexize('portuguese_stem', w)` by
scripts/validate_stemmers_pg.py (0-mismatch bar, like fr/es/de/en).

Same unaccent-first caveat as the other non-English configs: in-pipeline
input arrives lowercased and unaccented, so the accented suffix rules
(ção, ências, á-verb endings …) rarely fire there; the residual step-4/5
deletions recover most of the conflation, and query and document text
flow through the identical path so matching stays consistent. The
accented rules are kept in full for standalone use.

Algorithm note: the Snowball program's prelude respells the nasal vowels
ã → "a~" and õ → "o~" (the '~' acting as a consonant) before regions are
computed, and the postlude reverses it; this module does the same, so
suffixes below spell "ção" as "ça~o" etc.
"""

from __future__ import annotations

_VOWELS = set("aeiouáéíóúâêô")


def _isv(c: str) -> bool:
    return c in _VOWELS


def _prelude(s: str) -> str:
    return s.replace("ã", "a~").replace("õ", "o~")


def _postlude(s: str) -> str:
    return s.replace("a~", "ã").replace("o~", "õ")


def _mark_rv(s: str) -> int:
    """RV per the Spanish/Portuguese definition: second letter a
    consonant -> after the next following vowel; first two letters
    vowels -> after the next consonant; else (consonant-vowel) after the
    third letter; end of word when not found."""
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


# ---------------------------------------------------------------- step 1

# (suffix, group) — longest match wins across all groups (Snowball
# `among`: a failed condition does NOT fall back to a shorter suffix).
_STEP1 = sorted([
    # group 1: delete if in R2
    ("eza", 1), ("ezas", 1), ("ico", 1), ("ica", 1), ("icos", 1),
    ("icas", 1), ("ismo", 1), ("ismos", 1), ("ável", 1), ("ível", 1),
    ("ista", 1), ("istas", 1), ("oso", 1), ("osa", 1), ("osos", 1),
    ("osas", 1), ("amento", 1), ("amentos", 1), ("imento", 1),
    ("imentos", 1), ("adora", 1), ("ador", 1), ("aça~o", 1),
    ("adoras", 1), ("adores", 1), ("aço~es", 1), ("ante", 1),
    ("antes", 1), ("ância", 1),
    # group 2: -> log if in R2
    ("logia", 2), ("logias", 2),
    # group 3: -> u if in R2
    ("uça~o", 3), ("uço~es", 3),
    # group 4: -> ente if in R2
    ("ência", 4), ("ências", 4),
    # group 5: amente — R1 delete + iv/at + os/ic/ad chains
    ("amente", 5),
    # group 6: mente — R2 delete + ante/avel/ível chains
    ("mente", 6),
    # group 7: idade(s) — R2 delete + abil/ic/iv chains
    ("idade", 7), ("idades", 7),
    # group 8: iva/ivo(s) — R2 delete + at chain
    ("iva", 8), ("ivo", 8), ("ivas", 8), ("ivos", 8),
    # group 9: ira(s) -> ir if in RV and preceded by 'e'
    ("ira", 9), ("iras", 9),
], key=lambda t: -len(t[0]))


def _step1(s: str, r1: int, r2: int, rv: int) -> tuple[str, bool]:
    n = len(s)
    for suf, grp in _STEP1:
        if not s.endswith(suf):
            continue
        ln = len(suf)
        if grp == 1:
            if _in(r2, n, ln):
                return s[:-ln], True
            return s, False
        if grp == 2:
            if _in(r2, n, ln):
                return s[:-ln] + "log", True
            return s, False
        if grp == 3:
            if _in(r2, n, ln):
                return s[:-ln] + "u", True
            return s, False
        if grp == 4:
            if _in(r2, n, ln):
                return s[:-ln] + "ente", True
            return s, False
        if grp == 5:
            if not _in(r1, n, ln):
                return s, False
            s2 = s[:-ln]
            n2 = len(s2)
            if s2.endswith("iv") and _in(r2, n2, 2):
                s2 = s2[:-2]
                if s2.endswith("at") and _in(r2, len(s2), 2):
                    s2 = s2[:-2]
            else:
                for pre in ("os", "ic", "ad"):
                    if s2.endswith(pre) and _in(r2, n2, 2):
                        s2 = s2[:-2]
                        break
            return s2, True
        if grp == 6:
            if not _in(r2, n, ln):
                return s, False
            s2 = s[:-ln]
            n2 = len(s2)
            for pre in ("ante", "avel", "ível"):
                if s2.endswith(pre) and _in(r2, n2, 4):
                    s2 = s2[:-4]
                    break
            return s2, True
        if grp == 7:
            if not _in(r2, n, ln):
                return s, False
            s2 = s[:-ln]
            n2 = len(s2)
            if s2.endswith("abil") and _in(r2, n2, 4):
                s2 = s2[:-4]
            else:
                for pre in ("ic", "iv"):
                    if s2.endswith(pre) and _in(r2, n2, 2):
                        s2 = s2[:-2]
                        break
            return s2, True
        if grp == 8:
            if not _in(r2, n, ln):
                return s, False
            s2 = s[:-ln]
            if s2.endswith("at") and _in(r2, len(s2), 2):
                s2 = s2[:-2]
            return s2, True
        if grp == 9:
            if _in(rv, n, ln) and n - ln >= 1 and s[n - ln - 1] == "e":
                return s[:-ln] + "ir", True
            return s, False
    return s, False


# ---------------------------------------------------------------- step 2

_STEP2 = sorted([
    "ada", "ida", "ia", "aria", "eria", "iria", "ará", "ara", "erá",
    "era", "irá", "ava", "asse", "esse", "isse", "aste", "este", "iste",
    "ei", "arei", "erei", "irei", "am", "iam", "ariam", "eriam",
    "iriam", "aram", "eram", "iram", "avam", "em", "arem", "erem",
    "irem", "assem", "essem", "issem", "ado", "ido", "ando", "endo",
    "indo", "ara~o", "era~o", "ira~o", "ar", "er", "ir", "as", "adas",
    "idas", "ias", "arias", "erias", "irias", "arás", "aras", "erás",
    "eras", "irás", "avas", "es", "ardes", "erdes", "irdes", "ares",
    "eres", "ires", "asses", "esses", "isses", "astes", "estes",
    "istes", "is", "ais", "eis", "íeis", "aríeis", "eríeis", "iríeis",
    "áreis", "areis", "éreis", "ereis", "íreis", "ireis", "ásseis",
    "ésseis", "ísseis", "áveis", "ados", "idos", "ámos", "amos",
    "íamos", "aríamos", "eríamos", "iríamos", "áramos", "éramos",
    "íramos", "ávamos", "emos", "aremos", "eremos", "iremos",
    "ássemos", "êssemos", "íssemos", "imos", "armos", "ermos", "irmos",
    "eu", "iu", "ou", "ira", "iras",
], key=len, reverse=True)


def _step2(s: str, rv: int) -> tuple[str, bool]:
    n = len(s)
    for suf in _STEP2:
        # RV-limited search (Snowball `setlimit tomark pV`): a candidate
        # poking left of RV is a non-match and the scan falls through to
        # shorter suffixes (same semantics as the validated es step 2b)
        if s.endswith(suf) and _in(rv, n, len(suf)):
            return s[:-len(suf)], True
    return s, False


# ------------------------------------------------------------ steps 3-5

def _step3(s: str, rv: int) -> str:
    """Delete suffix i if in RV and preceded by c."""
    if s.endswith("ci") and _in(rv, len(s), 1):
        return s[:-1]
    return s


_STEP4 = sorted(["os", "a", "i", "o", "á", "í", "ó"], key=len,
                reverse=True)


def _step4(s: str, rv: int) -> tuple[str, bool]:
    n = len(s)
    for suf in _STEP4:
        # RV-limited among with fall-through, like es step 3
        if s.endswith(suf) and _in(rv, n, len(suf)):
            return s[:-len(suf)], True
    return s, False


def _step5(s: str, rv: int) -> str:
    n = len(s)
    if n and s[-1] in "eéê" and _in(rv, n, 1):
        s = s[:-1]
        # and if preceded by gu (or ci) with the u (or i) in RV,
        # delete the u (or i)
        if ((s.endswith("gu") or s.endswith("ci"))
                and _in(rv, len(s), 1)):
            s = s[:-1]
        return s
    if s.endswith("ç"):
        return s[:-1] + "c"
    return s


def stem_portuguese(word: str) -> str:
    s = _prelude(word)
    rv = _mark_rv(s)
    r1, r2 = _mark_r1r2(s)

    s, changed1 = _step1(s, r1, r2, rv)
    changed2 = False
    if not changed1:
        s, changed2 = _step2(s, rv)
    if changed1 or changed2:
        s = _step3(s, rv)
    else:
        s, _ = _step4(s, rv)
    # unlike Spanish, the Portuguese algorithm has no final
    # accent-removal pass — the postlude only restores the nasal vowels
    s = _step5(s, rv)
    return _postlude(s)
