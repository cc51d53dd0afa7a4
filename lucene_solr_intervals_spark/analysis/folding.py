"""ASCIIFoldingFilter analog: fold the Latin blocks to ASCII.

Reference: /root/reference/lucene/analysis/common/src/java/org/apache/
lucene/analysis/miscellaneous/ASCIIFoldingFilter.java:60 — a 2,088-line
generated switch.  This module re-derives its Latin core (Latin-1
Supplement, Latin Extended-A/B, Latin Extended Additional) from NFKD
decomposition (the same source the reference table was generated from:
strip combining marks, keep the ASCII skeleton) plus the handful of
non-decomposable specials, each verified against the reference switch:
Æ/æ->AE/ae, Œ/œ->OE/oe (:1038), ß->ss (:1223), Þ/þ->TH/th (:1268),
Ð/ð->D/d, Ø/ø->O/o (:948), Đ/đ->D/d (:379), Ħ/ħ->H/h (:610), ı->i (:689),
ĸ->q (:1108), Ł/ł->L/l (:784), ŉ->n (:908), Ŋ/ŋ->N/n (:890), Ŧ/ŧ->T/t
(:1233), ſ->s (:1196).

Applied as a CHAR FILTER (whole-text str.translate — one C call per
document) ahead of the tokenizer, so accented letters become ASCII
letters BEFORE the ASCII letter-class tokenizers split on them; the
exotic blocks (Greek/Cyrillic lookalikes, fullwidth forms, enclosed
alphanumerics) are out of scope.  NOTE: folding can lengthen text
(ß->ss), so character offsets of a folded chain refer to the FOLDED
text.
"""

from __future__ import annotations

import unicodedata
from functools import lru_cache

_SPECIALS = {
    0x00C6: "AE", 0x00E6: "ae",   # Æ æ
    0x0152: "OE", 0x0153: "oe",   # Œ œ
    0x00DF: "ss", 0x1E9E: "SS",   # ß ẞ
    0x00DE: "TH", 0x00FE: "th",   # Þ þ
    0x00D0: "D", 0x00F0: "d",     # Ð ð
    0x00D8: "O", 0x00F8: "o",     # Ø ø
    0x0110: "D", 0x0111: "d",     # Đ đ
    0x0126: "H", 0x0127: "h",     # Ħ ħ
    0x0131: "i",                   # ı
    0x0138: "q",                   # ĸ (kra)
    0x0141: "L", 0x0142: "l",     # Ł ł
    0x0149: "n",                   # ŉ
    0x014A: "N", 0x014B: "n",     # Ŋ ŋ
    0x0166: "T", 0x0167: "t",     # Ŧ ŧ
    0x017F: "s",                   # ſ (long s)
    # superscript digits — present in the reference switch (:1560,1579,1598)
    0x00B9: "1", 0x00B2: "2", 0x00B3: "3",
}

_RANGES = (
    (0x0080, 0x0250),  # Latin-1 Supplement + Latin Extended-A/B
    (0x1E00, 0x1F00),  # Latin Extended Additional (Vietnamese et al.)
    (0xFB00, 0xFB07),  # Latin ligatures ﬀ ﬁ ﬂ ﬃ ﬄ ﬅ ﬆ
)


@lru_cache(maxsize=1)
def fold_table() -> dict[int, str]:
    """codepoint -> ASCII replacement, for str.translate."""
    table: dict[int, str] = {}
    for lo, hi in _RANGES:
        for cp in range(lo, hi):
            d = unicodedata.normalize("NFKD", chr(cp))
            ascii_d = "".join(
                c for c in d if ord(c) < 0x80 and not unicodedata.combining(c)
            )
            # Only keep all-letter skeletons: the reference switch has NO
            # case for vulgar fractions (¼½¾ — NFKD yields '14'/'12'/'34'
            # with the fraction slash dropped) or spacing marks (¨ ¯ ´ ¸
            # NBSP), so those pass through as separators.  Digit folds the
            # reference DOES handle (¹²³) are listed in _SPECIALS.
            if ascii_d and ascii_d != chr(cp) and ascii_d.isalpha():
                table[cp] = ascii_d
    table.update(_SPECIALS)
    return table


def fold_ascii(text: str) -> str:
    """Fold one string (C-level str.translate — no per-char Python)."""
    if not text:
        return text
    return text.translate(fold_table())
