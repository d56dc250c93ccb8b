"""Codepoint lookup tables for preprocessing, built from public Unicode data.

Transcribes the reference's preprocessing character semantics:

* ``RE_NON_ALPHA`` (``/root/reference/src/utils.rs:8-11``): every char NOT in
  the kept set is replaced by a space. The kept set is ``{'#'} ∪ \\p{L} ∪
  \\p{M}`` plus a handful of apostrophe-like chars, the Devanagari danda, and
  explicit Thaana/Gujarati ranges (most of which are already letters/marks;
  the net additions are the danda U+0964, Gujarati digits/signs
  U+0AE4-U+0AF1, and the apostrophes). We materialize it as a boolean table
  over all 0x110000 codepoints using Python's ``unicodedata`` categories.

* CJK block membership (``/root/reference/src/utils.rs:32-50``): the 17
  ``CJK_*`` Unicode blocks (deliberately excluding Hangul and Kana — see the
  comment at ``/root/reference/src/identifier.rs:186-191``). Ranges are from
  the public Unicode Blocks.txt.

Note on the reference's "char has no unicode block" fallback
(``utils.rs:57-71``, causes a whole-text ``zxx``): every char that survives
the keep-filter is an *assigned* codepoint (letters/marks/listed punct), and
every assigned codepoint belongs to a block, so that branch is unreachable
after replacement; we do not model it.
"""

from __future__ import annotations

import sys
import unicodedata

import numpy as np

N_CODEPOINTS = 0x110000
SPACE = 0x20

# The 17 CJK_* blocks from utils.rs:32-50 (inclusive ranges, Unicode Blocks.txt).
CJK_BLOCK_RANGES: tuple[tuple[int, int], ...] = (
    (0x2E80, 0x2EFF),    # CJK Radicals Supplement
    (0x2EBF0, 0x2EE5F),  # CJK Unified Ideographs Extension I
    (0x3000, 0x303F),    # CJK Symbols and Punctuation
    (0x31C0, 0x31EF),    # CJK Strokes
    (0x3300, 0x33FF),    # CJK Compatibility
    (0x3400, 0x4DBF),    # CJK Unified Ideographs Extension A
    (0x4E00, 0x9FFF),    # CJK Unified Ideographs
    (0xF900, 0xFAFF),    # CJK Compatibility Ideographs
    (0xFE30, 0xFE4F),    # CJK Compatibility Forms
    (0x20000, 0x2A6DF),  # Extension B
    (0x2A700, 0x2B73F),  # Extension C
    (0x2B740, 0x2B81F),  # Extension D
    (0x2B820, 0x2CEAF),  # Extension E
    (0x2CEB0, 0x2EBEF),  # Extension F
    (0x2F800, 0x2FA1F),  # CJK Compatibility Ideographs Supplement
    (0x30000, 0x3134F),  # Extension G
    (0x31350, 0x323AF),  # Extension H
)

# Explicit non-letter/mark chars in the RE_NON_ALPHA kept set (utils.rs:8-11).
_EXPLICIT_KEPT = (
    "#",            # literal hash survives replacement
    "′",       # ′ prime
    "'",            # U+0027 apostrophe
    "’",       # ’ right single quote
    "´",       # ´ acute accent
    "ʹ",       # ʹ modifier letter prime
    "।",       # । Devanagari danda (inside the Bengali matra run)
    " ",            # literal spaces appear inside the class (identity under replace)
)
# Explicit ranges listed char-by-char in the class (Thaana vowels, Gujarati).
_EXPLICIT_RANGES = (
    (0x07A6, 0x07B0),
    (0x0A81, 0x0A83),
    (0x0ABC, 0x0ACD),
    (0x0AD0, 0x0AD0),
    (0x0AE0, 0x0AF1),
)


# Letter ranges assigned AFTER this interpreter's unicodedata version
# (Python 3.11 ships Unicode 14.0) that the reference's regex crate
# (Unicode 16 \p{L}) matches — without the supplement these are category
# 'Cn' here and get stripped to spaces while the reference keeps them.
# All-Lo ideograph blocks (no holes):
_POST_UNIDATA_LETTER_RANGES: "tuple[tuple[int, int], ...]" = (
    (0x31350, 0x323AF),  # CJK Ext H (Unicode 15.0)
    (0x2EBF0, 0x2EE5D),  # CJK Ext I (Unicode 15.1)
    (0x1E4D0, 0x1E4EB),  # Nag Mundari letters (15.0; EC-F9 are digits/marks)
)


def build_keep_table() -> np.ndarray:
    """bool[0x110000]: True = char survives RE_NON_ALPHA replacement."""
    keep = np.zeros(N_CODEPOINTS, dtype=bool)
    cat = unicodedata.category
    for cp in range(N_CODEPOINTS):
        c = cat(chr(cp))
        if c[0] == "L" or c[0] == "M":
            keep[cp] = True
    for ch in _EXPLICIT_KEPT:
        keep[ord(ch)] = True
    for lo, hi in _EXPLICIT_RANGES:
        keep[lo : hi + 1] = True
    for lo, hi in _POST_UNIDATA_LETTER_RANGES:
        keep[lo : hi + 1] = True
    return keep


def build_cjk_table() -> np.ndarray:
    """bool[0x110000]: True = char is in one of the 17 CJK_* blocks."""
    cjk = np.zeros(N_CODEPOINTS, dtype=bool)
    for lo, hi in CJK_BLOCK_RANGES:
        cjk[lo : hi + 1] = True
    return cjk


if __name__ == "__main__":  # pragma: no cover
    out = sys.argv[1]
    np.save(f"{out}/keep_table.npy", build_keep_table())
    np.save(f"{out}/cjk_table.npy", build_cjk_table())
