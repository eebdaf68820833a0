"""Accent folding equivalent to PostgreSQL's `unaccent` dictionary.

The reference pipeline applies UNACCENT to the *whole document string*
before canonicalization (`/root/reference/sql/to_tspvector.sql:23`) and to
query strings (`/root/reference/sql/to_tspquery.sql:25`), while the recall
token array deliberately keeps accents (`/root/reference/sql/to_tsp_text_array.sql:12`).
Matching is therefore accent-insensitive while output is accent-preserving.

Implementation: NFKD-decompose each non-ASCII BMP codepoint, strip combining
marks, and keep the result when it is pure ASCII; a small manual table covers
letters with no decomposition (ss for eszett, ae/oe ligatures, slashed o,
eth, thorn, stroked l/d/h). The table is built once per process and applied
with `str.translate`, which is vectorization-friendly inside Arrow batches.
"""

from __future__ import annotations

import unicodedata
from functools import lru_cache

_MANUAL = {
    "ß": "ss", "ẞ": "SS",
    "Æ": "AE", "æ": "ae", "Œ": "OE", "œ": "oe",
    "Ø": "O", "ø": "o", "Đ": "D", "đ": "d",
    "Ð": "D", "ð": "d", "Þ": "TH", "þ": "th",
    "Ł": "L", "ł": "l", "Ħ": "H", "ħ": "h",
    "Ŋ": "N", "ŋ": "n", "Ŧ": "T", "ŧ": "t",
    "ı": "i", "ĸ": "k", "ſ": "s",
    "Ɖ": "D", "Ɔ": "O", "ɔ": "o", "Ǝ": "E", "ǝ": "e",
}


@lru_cache(maxsize=1)
def _translate_table() -> dict[int, str]:
    table: dict[int, str] = {}
    for ch, repl in _MANUAL.items():
        table[ord(ch)] = repl
    # Latin ranges with combining-mark decompositions (Latin-1 Supplement,
    # Latin Extended-A/B, Extended Additional).
    ranges = [(0x00C0, 0x024F), (0x1E00, 0x1EFF)]
    for lo, hi in ranges:
        for cp in range(lo, hi + 1):
            if cp in table:
                continue
            ch = chr(cp)
            decomp = unicodedata.normalize("NFKD", ch)
            stripped = "".join(c for c in decomp if not unicodedata.combining(c))
            if stripped != ch and stripped and all(ord(c) < 0x80 for c in stripped):
                table[cp] = stripped
    return table


def unaccent(text: str) -> str:
    """Fold accented Latin characters to their ASCII base characters."""
    if text is None:
        return None
    return text.translate(_translate_table())
