"""German Snowball stemmer.

Implements the published "German stemming algorithm" from the Snowball
project — the algorithm behind PostgreSQL's `german_stem` dictionary, which
the reference's german-config tests exercise (e.g. query 'bleibenden Gäste
zecht' matching 'bleibenden Gäste zechten' —
/root/reference/test/german_lang_test.sql:119-121).

Input here is already lowercased and unaccented (the reference unaccents the
whole stream before analysis), so the umlaut-removal finalization is a no-op
in practice but kept for standalone use.
"""

from __future__ import annotations

_VOWELS = set("aeiouyäöü")
_S_ENDING = set("bdfghklmnrt")
_ST_ENDING = set("bdfghklmnt")


def _regions(word: str) -> tuple[int, int]:
    n = len(word)
    r1 = n
    for i in range(1, n):
        if word[i] not in _VOWELS and word[i - 1] in _VOWELS:
            r1 = i + 1
            break
    # R2 scans onward from the UNADJUSTED r1 — the 3-letter floor
    # applies to p1 only, AFTER p2 is marked (`gopast v gopast non-v
    # setmark p1 ... setmark p2; try($p1 < x $p1 = x)`). Computing r2
    # from the adjusted r1 skipped boundaries between the raw mark and
    # the floor ('upaqaung' must lose its 'ung': raw r1=2 ⇒ r2=4, not 7
    # — seeded live-PG fuzz, round 5).
    r2 = n
    for i in range(r1 + 1, n):
        if word[i] not in _VOWELS and word[i - 1] in _VOWELS:
            r2 = i + 1
            break
    # R1 is adjusted so that the region before it has at least 3 letters.
    if r1 < 3:
        r1 = 3 if n >= 3 else n
    return r1, r2


def stem_german(word: str) -> str:
    word = word.replace("ß", "ss")
    # no short-word early-return: the umlaut finalization applies at any
    # length ('üâ' -> 'uâ', live-PG-verified); regions are empty for
    # short words so no suffix step can fire anyway

    # Protect u/y between vowels from being treated as vowels.
    chars = list(word)
    for i in range(1, len(chars) - 1):
        if chars[i] in "uy" and chars[i - 1] in _VOWELS and chars[i + 1] in _VOWELS:
            chars[i] = chars[i].upper()
    word = "".join(chars)

    # regions are computed on the MARKED string: a protected U/y between
    # vowels counts as a consonant here (lowercasing first would undo the
    # mark — live-PG cross-validation caught 'jouer': R1 must start after
    # the marked U, giving 'jou' like german_stem, not 'jouer')
    r1, r2 = _regions(word)

    # Step 1
    if word.endswith(("em", "ern", "er")):
        for suf in ("ern", "em", "er"):
            if word.endswith(suf):
                if len(word) - len(suf) >= r1:
                    word = word[: -len(suf)]
                break
    elif word.endswith(("en", "es", "e")):
        for suf in ("en", "es", "e"):
            if word.endswith(suf):
                if len(word) - len(suf) >= r1:
                    word = word[: -len(suf)]
                    if word.endswith("niss"):
                        word = word[:-1]
                break
    elif word.endswith("s"):
        if len(word) - 1 >= r1 and len(word) >= 2 and word[-2].lower() in _S_ENDING:
            word = word[:-1]

    # Step 2
    if word.endswith(("en", "er", "est")):
        for suf in ("est", "en", "er"):
            if word.endswith(suf):
                if len(word) - len(suf) >= r1:
                    word = word[: -len(suf)]
                break
    elif word.endswith("st"):
        if (len(word) - 2 >= r1 and len(word) >= 6
                and word[-3].lower() in _ST_ENDING):
            word = word[:-2]

    # Step 3: d-suffixes
    if word.endswith(("end", "ung")):
        if len(word) - 3 >= r2:
            word = word[:-3]
            if (word.endswith("ig") and len(word) - 2 >= r2
                    and not word.endswith("eig")):
                word = word[:-2]
    elif word.endswith(("isch", "ik", "ig")):
        for suf in ("isch", "ik", "ig"):
            if word.endswith(suf):
                if (len(word) - len(suf) >= r2
                        and word[: -len(suf)][-1:] != "e"):
                    word = word[: -len(suf)]
                break
    elif word.endswith(("lich", "heit")):
        if len(word) - 4 >= r2:
            word = word[:-4]
            for pre in ("er", "en"):
                if word.endswith(pre) and len(word) - 2 >= r1:
                    word = word[:-2]
                    break
    elif word.endswith("keit"):
        if len(word) - 4 >= r2:
            word = word[:-4]
            for pre in ("lich", "ig"):
                if word.endswith(pre) and len(word) - len(pre) >= r2:
                    word = word[: -len(pre)]
                    break

    word = word.lower()
    for a, b in (("ä", "a"), ("ö", "o"), ("ü", "u")):
        word = word.replace(a, b)
    return word
