"""Space-making character set used by the text canonicalizer.

These are the 217 Unicode codepoints that PostgreSQL's text-search parsers
treat as "blank" (word-breaking) after UNACCENT, harvested by the reference
with a ts_debug sweep over the BMP (see the harvest query documented in
/root/reference/sql/tsp_indexable_text.sql:23-63; character list at :73-95).
We store them as compact codepoint ranges rather than a literal string.

The canonicalizer (`tsp_indexable_text`) inserts a BELL (U+0001) + space
after every run of these characters so that character-delimited terms
("hyphen-ated") tokenize into separate, position-aligned words.
"""

from __future__ import annotations

import re

BELL = "\x01"

# (start, end) inclusive codepoint ranges; 217 codepoints total.
_SMC_RANGES: tuple[tuple[int, int], ...] = (
    (0x0002, 0x001F), (0x0021, 0x002F), (0x003A, 0x0040), (0x005B, 0x0060),
    (0x007B, 0x007F), (0x00A1, 0x00A1), (0x00A9, 0x00A9), (0x00AB, 0x00AB),
    (0x00AD, 0x00AE), (0x00B1, 0x00B1), (0x00BB, 0x00BB), (0x00BF, 0x00BF),
    (0x00D7, 0x00D7), (0x00F7, 0x00F7), (0x0149, 0x0149), (0x02B9, 0x02BD),
    (0x02C2, 0x02C4), (0x02C6, 0x02C6), (0x02C8, 0x02C8), (0x02CB, 0x02CB),
    (0x02D0, 0x02D0), (0x02D6, 0x02D7), (0x02DC, 0x02DC), (0x2010, 0x2016),
    (0x2018, 0x201F), (0x2024, 0x2024), (0x2026, 0x2026), (0x2032, 0x2033),
    (0x2039, 0x203A), (0x203C, 0x203C), (0x2044, 0x2049), (0x204E, 0x204E),
    (0x20A3, 0x20A4), (0x2117, 0x2117), (0x215F, 0x215F), (0x2212, 0x2212),
    (0x2215, 0x2216), (0x2223, 0x2223), (0x2225, 0x2225), (0x226A, 0x226B),
    (0x2474, 0x24B5), (0x2985, 0x2986), (0x2A74, 0x2A76), (0x3001, 0x3002),
    (0x3008, 0x300B), (0x3014, 0x3015), (0x3018, 0x301B), (0x301D, 0x301E),
    (0x33C2, 0x33C2), (0x33C7, 0x33C7), (0x33D8, 0x33D8),
)

SPACE_MAKING_CHARS: frozenset[str] = frozenset(
    chr(cp) for lo, hi in _SMC_RANGES for cp in range(lo, hi + 1)
)

# Regex character-class body matching any space-making char.
SMC_CLASS = "".join(
    (re.escape(chr(lo)) if lo == hi else f"{re.escape(chr(lo))}-{re.escape(chr(hi))}")
    for lo, hi in _SMC_RANGES
)
