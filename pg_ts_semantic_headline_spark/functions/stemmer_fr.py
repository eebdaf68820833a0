"""French Snowball stemmer.

Implements the published "French stemming algorithm" from the Snowball
project — the algorithm behind PostgreSQL's `french_stem` dictionary.
Widens the engine's language surface beyond the reference's
english/german/simple set (/root/reference/ ships tests for those three
only); the config plugs into the same analysis pipeline, so index build,
query compilation, headlines and ranking all work unchanged with
config='french'.

Interaction with the unaccent-first pipeline (the reference unaccents the
whole stream before analysis — /root/reference/sql/to_tspvector.sql:23):
in-pipeline input is already lowercased and unaccented, so the rules that
name accented suffixes (ité, é-verb endings, ièr …) rarely fire. That is
the same deliberate trade the German stemmer documents for umlauts: query
and document text flow through the identical path, so matching stays
consistent; much of the conflation is recovered by the residual rules
(e.g. both 'qualité' and 'qualités' unaccent+stem to 'qualit', which is
also PG's accented french_stem output). The accented rules are kept in
full for standalone use on accented text.
"""

from __future__ import annotations

_VOWELS = set("aeiouyâàëéêèïîôûù")
# é è ë ï as single chars for readability below
_E_ACUTE = "é"
_E_GRAVE = "è"
_E_DIAER = "ë"
_I_DIAER = "ï"
_C_CEDIL = "ç"


def _isv(c: str) -> bool:
    return c in _VOWELS


def _prelude(word: str) -> str:
    """Mark letters that must be treated as consonants: u/i between
    vowels -> U/I, y next to a vowel -> Y, u after q -> U, and the
    diaereses ë/ï -> He/Hi (H is a consonant marker the postlude strips).
    Examples from the algorithm text: jouer->joUer, ennuie->ennuIe,
    yeux->Yeux, quand->qUand, croyiez->croYiez.

    Faithful `repeat goto` semantics (round-5 seeded-fuzz fix): the
    source tries the branches IN ORDER at each cursor position, and the
    `v ['u'] v` branch outranks `['y'] v` — so in 'yuoccation' the u is
    marked (y stays a vowel, collapsing R1/R2 to 2/4 and deleting
    'ation' -> 'yuocc', live-PG-verified), where a per-letter scan that
    marks y first gets R2=7 and keeps 'at'. After a successful mark the
    cursor lands at the END of the matched pattern, so the vowel that
    closed one match can open the next."""
    s = list(word)
    i = 0
    while i < len(s):
        c = s[i]
        # diaereses respell FIRST — before the vowel-mark branch: live-PG
        # evidence 'ëyíáë' behaves as 'Heyíá(He)' (rv=2, final e
        # deleted), i.e. a word-initial ë becomes He rather than acting
        # as the v of an ë['y'] mark
        # cursor resumes AT the replacement (advance 1, landing on the
        # H): the i of a fresh 'Hi' must be able to open a later
        # v['u']v / v['i']v mark — live-PG evidence 'pïuation' → 'pïuat'
        # (the U-mark after Hi collapses r2 onto the 'ion') and
        # '…ïii' → '…ïi' (I-mark makes the final i verb-suffix-deletable)
        if c == _E_DIAER:
            s[i:i + 1] = ["H", "e"]
            i += 1
            continue
        if c == _I_DIAER:
            s[i:i + 1] = ["H", "i"]
            i += 1
            continue
        # v [ u]v / i]v / y] — second char marked. The trailing vowel is
        # re-scanned (resume ON it, not past it): live-PG evidence
        # 'ïßùöùiïf' → the ï AFTER the I-mark still respells to Hi,
        # exposing the 'if' suffix ('…ùiïf' → '…ùi').
        if _isv(c) and i + 1 < len(s):
            c2 = s[i + 1]
            if (c2 in "ui" and i + 2 < len(s) and _isv(s[i + 2])):
                s[i + 1] = c2.upper()
                i += 2
                continue
            if c2 == "y":
                s[i + 1] = "Y"
                i += 2
                continue
        # branch 4: [y] v — trailing vowel re-scanned, as in branch 1
        if c == "y" and i + 1 < len(s) and _isv(s[i + 1]):
            s[i] = "Y"
            i += 1
            continue
        # branch 5: q [u]
        if c == "q" and i + 1 < len(s) and s[i + 1] == "u":
            s[i + 1] = "U"
            i += 2
            continue
        i += 1
    return "".join(s)


def _mark_rv(s: str) -> int:
    """RV: after the third letter if the word begins with two vowels or
    with par/col/tap; else after the first vowel not at the beginning;
    else end of word."""
    n = len(s)
    if n >= 3 and ((_isv(s[0]) and _isv(s[1]))
                   or s[:3] in ("par", "col", "tap")):
        return 3
    for i in range(1, n):
        if _isv(s[i]):
            return i + 1
    return n


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
    """True if a suffix of length suf_len lies entirely in the region."""
    return word_len - suf_len >= region_start


# ---------------------------------------------------------------- step 1

_MENT_FAMILY = ("amment", "emment", "ment", "ments")

# (suffix, group): searched longest-first across ALL groups; only the
# longest matching suffix's rule runs (Snowball `among` semantics — a
# failed condition does NOT fall back to a shorter suffix).
_STEP1 = sorted([
    ("ance", 1), ("iqUe", 1), ("isme", 1), ("able", 1), ("iste", 1),
    ("eux", 1), ("ances", 1), ("iqUes", 1), ("ismes", 1), ("ables", 1),
    ("istes", 1),
    ("atrice", 2), ("ateur", 2), ("ation", 2), ("atrices", 2),
    ("ateurs", 2), ("ations", 2),
    ("logie", 3), ("logies", 3),
    ("usion", 4), ("ution", 4), ("usions", 4), ("utions", 4),
    ("ence", 5), ("ences", 5),
    ("ement", 6), ("ements", 6),
    ("it" + _E_ACUTE, 7), ("it" + _E_ACUTE + "s", 7),
    ("if", 8), ("ive", 8), ("ifs", 8), ("ives", 8),
    ("eaux", 9),
    ("aux", 10),
    ("euse", 11), ("euses", 11),
    ("issement", 12), ("issements", 12),
    ("amment", 13),
    ("emment", 14),
    ("ment", 15), ("ments", 15),
], key=lambda e: -len(e[0]))


def _step1(s: str, rv: int, r1: int, r2: int) -> tuple[str, bool, bool]:
    """Returns (word, changed, ment_family_removed)."""
    n = len(s)
    for suf, g in _STEP1:
        if not s.endswith(suf):
            continue
        m = len(suf)
        if g == 1:
            if _in(r2, n, m):
                return s[:-m], True, False
        elif g == 2:
            if _in(r2, n, m):
                s = s[:-m]
                if s.endswith("ic"):
                    if _in(r2, len(s), 2):
                        s = s[:-2]
                    else:
                        s = s[:-2] + "iqU"
                return s, True, False
        elif g == 3:
            if _in(r2, n, m):
                return s[:-m] + "log", True, False
        elif g == 4:
            if _in(r2, n, m):
                return s[:-m] + "u", True, False
        elif g == 5:
            if _in(r2, n, m):
                return s[:-m] + "ent", True, False
        elif g == 6:  # ement / ements
            if _in(rv, n, m):
                s = s[:-m]
                k = len(s)
                if s.endswith("iv") and _in(r2, k, 2):
                    s = s[:-2]
                    if s.endswith("at") and _in(r2, len(s), 2):
                        s = s[:-2]
                elif s.endswith("eus"):
                    if _in(r2, k, 3):
                        s = s[:-3]
                    elif _in(r1, k, 3):
                        s = s[:-3] + "eux"
                elif s.endswith("abl") and _in(r2, k, 3):
                    s = s[:-3]
                elif s.endswith("iqU") and _in(r2, k, 3):
                    s = s[:-3]
                elif (s.endswith("i" + _E_GRAVE + "r")
                      or s.endswith("I" + _E_GRAVE + "r")) and _in(rv, k, 3):
                    s = s[:-3] + "i"
                return s, True, False
        elif g == 7:  # ité / ités
            if _in(r2, n, m):
                s = s[:-m]
                k = len(s)
                if s.endswith("abil"):
                    if _in(r2, k, 4):
                        s = s[:-4]
                    else:
                        s = s[:-4] + "abl"
                elif s.endswith("ic"):
                    if _in(r2, k, 2):
                        s = s[:-2]
                    else:
                        s = s[:-2] + "iqU"
                elif s.endswith("iv") and _in(r2, k, 2):
                    s = s[:-2]
                return s, True, False
        elif g == 8:  # if / ive / ifs / ives
            if _in(r2, n, m):
                s = s[:-m]
                if s.endswith("at") and _in(r2, len(s), 2):
                    s = s[:-2]
                    if s.endswith("ic"):
                        if _in(r2, len(s), 2):
                            s = s[:-2]
                        else:
                            s = s[:-2] + "iqU"
                return s, True, False
        elif g == 9:  # eaux -> eau, unconditionally
            return s[:-m] + "eau", True, False
        elif g == 10:  # aux -> al if in R1
            if _in(r1, n, m):
                return s[:-m] + "al", True, False
        elif g == 11:  # euse(s): delete in R2, else -> eux in R1
            if _in(r2, n, m):
                return s[:-m], True, False
            if _in(r1, n, m):
                return s[:-m] + "eux", True, False
        elif g == 12:  # issement(s): delete in R1, preceded by non-vowel
            if _in(r1, n, m) and n - m >= 1 and not _isv(s[n - m - 1]):
                return s[:-m], True, False
        elif g == 13:  # amment -> ant in RV
            if _in(rv, n, m):
                return s[:-m] + "ant", True, True
        elif g == 14:  # emment -> ent in RV
            if _in(rv, n, m):
                return s[:-m] + "ent", True, True
        elif g == 15:  # ment(s): delete if preceded by a vowel in RV
            if n - m >= 1 and _isv(s[n - m - 1]) and n - m - 1 >= rv:
                return s[:-m], True, True
        return s, False, False  # longest match found; its condition failed
    return s, False, False


# --------------------------------------------------------------- step 2a

_STEP2A = sorted([
    "îmes", "ît", "îtes", "i", "ie", "ies", "ir", "ira",
    "irai", "iraIent", "irais", "irait", "iras", "irent", "irez", "iriez",
    "irions", "irons", "iront", "is", "issaIent", "issais", "issait",
    "issant", "issante", "issantes", "issants", "isse", "issent", "isses",
    "issez", "issiez", "issions", "issons", "it",
], key=len, reverse=True)


def _step2a(s: str, rv: int) -> tuple[str, bool]:
    """Verb suffixes beginning i: delete if in RV and preceded by a
    non-vowel which is itself in RV (the whole Snowball search runs
    inside a limit set to RV — a suffix poking left of RV is not a MATCH
    at all, so the search falls through to the next-longest candidate;
    the preceded-by-non-vowel test is a CONDITION, whose failure fails
    the whole step with no fallback)."""
    n = len(s)
    for suf in _STEP2A:
        m = len(suf)
        if not (s.endswith(suf) and _in(rv, n, m)):
            continue
        p = n - m - 1
        # the preceding non-vowel must not be the 'H' marker (ï -> Hi):
        # Snowball's i_verb_suffix tests `not 'H' non-v` so a word like
        # 'dëï' keeps its final ï (live-PG cross-validation)
        if p >= rv and not _isv(s[p]) and s[p] != "H":
            return s[:-m], True
        return s, False
    return s, False


# --------------------------------------------------------------- step 2b

_STEP2B_IONS = "ions"
_STEP2B_E = sorted([
    _E_ACUTE, _E_ACUTE + "e", _E_ACUTE + "es", _E_ACUTE + "s",
    _E_GRAVE + "rent", "er", "era", "erai", "eraIent", "erais", "erait",
    "eras", "erez", "eriez", "erions", "erons", "eront", "ez", "iez",
], key=len, reverse=True)
_STEP2B_A = sorted([
    "âmes", "ât", "âtes", "a", "ai", "aIent", "ais", "ait",
    "ant", "ante", "antes", "ants", "as", "asse", "assent", "asses",
    "assiez", "assions",
], key=len, reverse=True)

_STEP2B_ALL = sorted(
    [(x, "e") for x in _STEP2B_E] + [(x, "a") for x in _STEP2B_A]
    + [(_STEP2B_IONS, "ions")], key=lambda e: -len(e[0]))


def _step2b(s: str, rv: int, r2: int) -> tuple[str, bool]:
    n = len(s)
    for suf, g in _STEP2B_ALL:
        m = len(suf)
        # the search is limited to RV: a suffix extending left of RV is
        # not a match — fall through to the next-longest candidate
        if not (s.endswith(suf) and _in(rv, n, m)):
            continue
        if g == "ions":
            if _in(r2, n, m):
                return s[:-m], True
            return s, False
        if g == "e":
            return s[:-m], True
        # 'a' group: delete; a preceding e (in RV) goes too
        s = s[:-m]
        if s.endswith("e") and len(s) - 1 >= rv:
            s = s[:-1]
        return s, True
    return s, False


# ---------------------------------------------------------------- step 4

_STEP4 = sorted([
    ("i" + _E_GRAVE + "re", "ier"), ("I" + _E_GRAVE + "re", "ier"),
    ("ier", "ier"), ("Ier", "ier"),
    ("ion", "ion"), ("e", "e"), (_E_DIAER, "gue"),
], key=lambda e: -len(e[0]))


def _step4(s: str, rv: int, r2: int) -> tuple[str, bool]:
    changed = False
    n = len(s)
    # s-removal: ends s, not preceded by a, i (unless that i is itself
    # preceded by H — the ï/Hi mark), o, u, è or s
    if s.endswith("s") and n >= 2:
        p = s[n - 2]
        blocked = p in ("a", "i", "o", "u", _E_GRAVE, "s")
        if p == "i" and n >= 3 and s[n - 3] == "H":
            blocked = False
        if not blocked:
            s = s[:-1]
            n -= 1
            changed = True
    for suf, g in _STEP4:
        m = len(suf)
        # RV-limited search: non-fitting suffixes are non-matches and the
        # scan falls through to the next-longest candidate
        if not (s.endswith(suf) and _in(rv, n, m)):
            continue
        if g == "ion":
            p = n - m - 1
            if _in(r2, n, m) and p >= rv and s[p] in "st":
                return s[:-m], True
            return s, changed
        if g == "ier":
            return s[:-m] + "i", True
        if g == "e":
            return s[:-m], True
        if g == "gue":
            # a LITERAL ë here is one the prelude's cursor jumped over
            # (it only survives respelling-to-He after an I/U/Y mark,
            # e.g. 'kàIë'); the residual among deletes it whenever it
            # lies in RV — live-PG probes: kàië→kài, aiguë→aigu,
            # cigurë→cigur, abcë kept only because its ë sits left of
            # RV (round-5 seeded-fuzz fix; the old gu-only condition
            # wrongly kept vowel-preceded cases)
            return s[:-m], True
        return s, changed
    return s, changed


def _postlude(s: str) -> str:
    out = []
    i = 0
    while i < len(s):
        c = s[i]
        if c == "H":
            if i + 1 < len(s) and s[i + 1] == "e":
                out.append(_E_DIAER)
                i += 2
                continue
            if i + 1 < len(s) and s[i + 1] == "i":
                out.append(_I_DIAER)
                i += 2
                continue
            i += 1
            continue
        out.append({"I": "i", "U": "u", "Y": "y"}.get(c, c))
        i += 1
    return "".join(out)


def stem_french(word: str) -> str:
    # no short-word guard: Snowball French has none, and steps 5/6 and
    # the postlude apply at any length ('él' -> 'el', live-PG-verified)
    s = _prelude(word)
    rv = _mark_rv(s)
    r1, r2 = _mark_r1r2(s)

    s1, changed1, ment = _step1(s, rv, r1, r2)
    # Snowball control flow: a ment-family removal in step 1 modifies the
    # word but FAILS standard_suffix, so the verb-suffix steps run on the
    # modified word; step 3 (final Y/ç fixup) runs only when the
    # standard/2a/2b chain SUCCEEDED, otherwise step 4 (residual) runs —
    # even when a ment ending was stripped along the way.
    branch_success = changed1 and not ment
    if not branch_success:
        s1, changed2a = _step2a(s1, rv)
        if changed2a:
            branch_success = True
        else:
            s1, changed2b = _step2b(s1, rv, r2)
            branch_success = changed2b
    if branch_success:
        if s1.endswith("Y"):
            s1 = s1[:-1] + "i"
        elif s1.endswith(_C_CEDIL):
            s1 = s1[:-1] + "c"
    else:
        s1, _ = _step4(s1, rv, r2)

    # steps 5 and 6 always run
    for end in ("enn", "onn", "ett", "ell", "eill"):
        if s1.endswith(end):
            s1 = s1[:-1]
            break
    # un-accent: é/è followed by at least one non-vowel at the end -> e
    j = len(s1) - 1
    k = 0
    while j >= 0 and not _isv(s1[j]):
        j -= 1
        k += 1
    if k >= 1 and j >= 0 and s1[j] in (_E_ACUTE, _E_GRAVE):
        s1 = s1[:j] + "e" + s1[j + 1:]

    return _postlude(s1)
