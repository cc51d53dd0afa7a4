"""Phonetic encoders + PhoneticFilter analog.

Reference roles:
  analysis/phonetic/PhoneticFilter.java:33        inject/replace filter
  analysis/phonetic/DoubleMetaphoneFilter.java:33 primary+alternate filter
The encoders themselves are re-implementations of the PUBLIC algorithms
the reference delegates to (Apache Commons Codec's language package —
cited in PhoneticFilter's javadoc):
  Soundex          Russell/Odell American Soundex with the commons-codec
                   H/W rule
  RefinedSoundex   commons-codec refined mapping, unbounded length
  DoubleMetaphone  Lawrence Philips' Double Metaphone (primary +
                   alternate codes, maxCodeLen)
Pinned by the TestPhoneticFilter / DoubleMetaphoneFilterTest vectors in
tests/test_phonetic.py.
"""

from __future__ import annotations

_SOUNDEX_MAP = "01230120022455012623010202"  # A..Z
_REFINED_MAP = "01360240043788015936020505"  # A..Z


def _clean(s: str) -> str:
    return "".join(c for c in s.upper() if "A" <= c <= "Z")


def soundex(value: str) -> str:
    """American Soundex, commons-codec semantics (H/W rule included)."""
    s = _clean(value)
    if not s:
        return ""

    def mapping_code(i: int) -> str:
        c = s[i]
        mapped = _SOUNDEX_MAP[ord(c) - 65]
        if i > 1 and mapped != "0":
            hw = s[i - 1]
            if hw in "HW":
                pre = s[i - 2]
                if _SOUNDEX_MAP[ord(pre) - 65] == mapped or pre in "HW":
                    return "\0"
        return mapped

    out = [s[0], "0", "0", "0"]
    last = mapping_code(0)
    incount, count = 1, 1
    while incount < len(s) and count < 4:
        mapped = mapping_code(incount)
        incount += 1
        if mapped == "\0":
            continue
        if mapped != "0" and mapped != last:
            out[count] = mapped
            count += 1
        last = mapped
    return "".join(out)


def refined_soundex(value: str) -> str:
    """Refined Soundex (commons-codec): first letter + every mapped code,
    adjacent duplicates collapsed, no length cap."""
    s = _clean(value)
    if not s:
        return ""
    out = [s[0]]
    last = None
    for c in s:
        code = _REFINED_MAP[ord(c) - 65]
        if code != last:
            out.append(code)
        last = code
    return "".join(out)


# ------------------------------------------------------------ DoubleMetaphone
_VOWELS = "AEIOUY"
_SILENT_START = ("GN", "KN", "PN", "WR", "PS")
_L_R_N_M_B_H_F_V_W_SPACE = ("L", "R", "N", "M", "B", "H", "F", "V", "W", " ")
_ES_EP_EB_EL_EY_IB_IL_IN_IE_EI_ER = (
    "ES", "EP", "EB", "EL", "EY", "IB", "IL", "IN", "IE", "EI", "ER")
_L_T_K_S_N_M_B_Z = ("L", "T", "K", "S", "N", "M", "B", "Z")


class _DM:
    """One encode pass; primary/alternate accumulate together."""

    def __init__(self, value: str, max_len: int):
        self.value = _cleandm(value)
        self.max_len = max_len
        self.primary: list[str] = []
        self.alternate: list[str] = []

    def done(self) -> bool:
        return (len(self.primary) >= self.max_len
                and len(self.alternate) >= self.max_len)

    def add(self, prim: str, alt: str | None = None) -> None:
        if alt is None:
            alt = prim
        if prim:
            self.primary.append(prim)
        if alt:
            self.alternate.append(alt)

    def result(self) -> tuple[str, str]:
        return ("".join(self.primary)[: self.max_len],
                "".join(self.alternate)[: self.max_len])


def _cleandm(s: str) -> str:
    return "".join(c for c in s.upper() if "A" <= c <= "Z")


def _ch(s: str, i: int) -> str:
    return s[i] if 0 <= i < len(s) else ""


def _contains(s: str, start: int, length: int, *criteria: str) -> bool:
    if start < 0 or start + length > len(s):
        return False
    return s[start:start + length] in criteria


def _is_vowel(c: str) -> bool:
    return len(c) == 1 and c in _VOWELS


def _slavo_germanic(s: str) -> bool:
    return any(x in s for x in ("W", "K", "CZ", "WITZ"))


def double_metaphone(value: str, max_len: int = 4) -> tuple[str, str]:
    """Philips' Double Metaphone: (primary, alternate) codes, each capped
    at max_len.  Empty string when nothing encodable."""
    m = _DM(value, max_len)
    s = m.value
    n = len(s)
    if n == 0:
        return "", ""
    slavo = _slavo_germanic(s)
    i = 0
    if s[:2] in _SILENT_START:
        i = 1
    if s[0] == "X":
        m.add("S")  # pseudo-Spanish
        i = 1

    while i < n and not m.done():
        c = s[i]
        if c in _VOWELS:
            if i == 0:
                m.add("A")
            i += 1
        elif c == "B":
            m.add("P")
            i += 2 if _ch(s, i + 1) == "B" else 1
        elif c == "Ç":
            m.add("S")
            i += 1
        elif c == "C":
            i = _handle_c(m, s, i)
        elif c == "D":
            if _contains(s, i, 2, "DG"):
                if _contains(s, i + 2, 1, "I", "E", "Y"):
                    m.add("J")  # edge
                    i += 3
                else:
                    m.add("TK")  # edgar
                    i += 2
            elif _contains(s, i, 2, "DT", "DD"):
                m.add("T")
                i += 2
            else:
                m.add("T")
                i += 1
        elif c == "F":
            m.add("F")
            i += 2 if _ch(s, i + 1) == "F" else 1
        elif c == "G":
            i = _handle_g(m, s, i, slavo)
        elif c == "H":
            # only keep if first & before vowel or between 2 vowels
            if (i == 0 or _is_vowel(_ch(s, i - 1))) and _is_vowel(_ch(s, i + 1)):
                m.add("H")
                i += 2
            else:
                i += 1
        elif c == "J":
            i = _handle_j(m, s, i, slavo)
        elif c == "K":
            m.add("K")
            i += 2 if _ch(s, i + 1) == "K" else 1
        elif c == "L":
            i = _handle_l(m, s, i)
        elif c == "M":
            m.add("M")
            i += 2 if _conditions_m0(s, i) else 1
        elif c == "N":
            m.add("N")
            i += 2 if _ch(s, i + 1) == "N" else 1
        elif c == "Ñ":
            m.add("N")
            i += 1
        elif c == "P":
            i = _handle_p(m, s, i)
        elif c == "Q":
            m.add("K")
            i += 2 if _ch(s, i + 1) == "Q" else 1
        elif c == "R":
            i = _handle_r(m, s, i, slavo)
        elif c == "S":
            i = _handle_s(m, s, i, slavo)
        elif c == "T":
            i = _handle_t(m, s, i)
        elif c == "V":
            m.add("F")
            i += 2 if _ch(s, i + 1) == "V" else 1
        elif c == "W":
            i = _handle_w(m, s, i)
        elif c == "X":
            i = _handle_x(m, s, i)
        elif c == "Z":
            i = _handle_z(m, s, i, slavo)
        else:
            i += 1

    return m.result()


def _handle_c(m: _DM, s: str, i: int) -> int:
    if _condition_c0(s, i):  # very confusing, moved to (:-O)
        m.add("K")
        return i + 2
    if i == 0 and _contains(s, i, 6, "CAESAR"):
        m.add("S")
        return i + 2
    if _contains(s, i, 2, "CH"):
        return _handle_ch(m, s, i)
    if _contains(s, i, 2, "CZ") and not _contains(s, i - 2, 4, "WICZ"):
        m.add("S", "X")  # "czerny"
        return i + 2
    if _contains(s, i + 1, 3, "CIA"):
        m.add("X")  # "focaccia"
        return i + 3
    if _contains(s, i, 2, "CC") and not (i == 1 and _ch(s, 0) == "M"):
        return _handle_cc(m, s, i)
    if _contains(s, i, 2, "CK", "CG", "CQ"):
        m.add("K")
        return i + 2
    if _contains(s, i, 2, "CI", "CE", "CY"):
        if _contains(s, i, 3, "CIO", "CIE", "CIA"):
            m.add("S", "X")  # italian vs english
        else:
            m.add("S")
        return i + 2
    m.add("K")
    if _contains(s, i + 1, 2, " C", " Q", " G"):
        return i + 3  # "mac caffrey", "mac gregor"
    if (_contains(s, i + 1, 1, "C", "K", "Q")
            and not _contains(s, i + 1, 2, "CE", "CI")):
        return i + 2
    return i + 1


def _handle_cc(m: _DM, s: str, i: int) -> int:
    if (_contains(s, i + 2, 1, "I", "E", "H")
            and not _contains(s, i + 2, 2, "HU")):
        # "bellocchio" but not "bacchus"
        if ((i == 1 and _ch(s, i - 1) == "A")
                or _contains(s, i - 1, 5, "UCCEE", "UCCES")):
            m.add("KS")  # "accident", "accede", "succeed"
        else:
            m.add("X")  # "bacci", "bertucci"
        return i + 3
    m.add("K")  # Pierce's rule
    return i + 2


def _handle_ch(m: _DM, s: str, i: int) -> int:
    if i > 0 and _contains(s, i, 4, "CHAE"):
        m.add("K", "X")  # "michael"
        return i + 2
    if _condition_ch0(s, i):
        m.add("K")  # greek roots: "chemistry", "chorus"
        return i + 2
    if _condition_ch1(s, i):
        m.add("K")  # germanic/greek/otherwise 'ch' as 'kh'
        return i + 2
    if i > 0:
        if _contains(s, 0, 2, "MC"):
            m.add("K")  # "McHugh"
        else:
            m.add("X", "K")
    else:
        m.add("X")
    return i + 2


def _handle_g(m: _DM, s: str, i: int, slavo: bool) -> int:
    if _ch(s, i + 1) == "H":
        return _handle_gh(m, s, i)
    if _ch(s, i + 1) == "N":
        if i == 1 and _is_vowel(_ch(s, 0)) and not slavo:
            m.add("KN", "N")
        elif (not _contains(s, i + 2, 2, "EY")
                and _ch(s, i + 1) != "Y" and not slavo):
            m.add("N", "KN")
        else:
            m.add("KN")
        return i + 2
    if _contains(s, i + 1, 2, "LI") and not slavo:
        m.add("KL", "L")  # "tagliaro"
        return i + 2
    if i == 0 and (_ch(s, i + 1) == "Y"
                   or _contains(s, i + 1, 2, *_ES_EP_EB_EL_EY_IB_IL_IN_IE_EI_ER)):
        m.add("K", "J")  # -ges-, -gep-, -gel-, -gie- at beginning
        return i + 2
    if ((_contains(s, i + 1, 2, "ER") or _ch(s, i + 1) == "Y")
            and not _contains(s, 0, 6, "DANGER", "RANGER", "MANGER")
            and not _contains(s, i - 1, 1, "E", "I")
            and not _contains(s, i - 1, 3, "RGY", "OGY")):
        m.add("K", "J")  # -ger-, -gy-
        return i + 2
    if (_contains(s, i + 1, 1, "E", "I", "Y")
            or _contains(s, i - 1, 4, "AGGI", "OGGI")):
        if (_contains(s, 0, 4, "VAN ", "VON ")
                or _contains(s, 0, 3, "SCH")
                or _contains(s, i + 1, 2, "ET")):
            m.add("K")  # obvious germanic
        elif _contains(s, i + 1, 3, "IER"):
            m.add("J")
        else:
            m.add("J", "K")
        return i + 2
    if _ch(s, i + 1) == "G":
        m.add("K")
        return i + 2
    m.add("K")
    return i + 1


def _handle_gh(m: _DM, s: str, i: int) -> int:
    if i > 0 and not _is_vowel(_ch(s, i - 1)):
        m.add("K")
        return i + 2
    if i == 0:
        if _ch(s, i + 2) == "I":
            m.add("J")
        else:
            m.add("K")
        return i + 2
    if ((i > 1 and _contains(s, i - 2, 1, "B", "H", "D"))
            or (i > 2 and _contains(s, i - 3, 1, "B", "H", "D"))
            or (i > 3 and _contains(s, i - 4, 1, "B", "H"))):
        return i + 2  # Parker's rule (with some further refinements)
    if (i > 2 and _ch(s, i - 1) == "U"
            and _contains(s, i - 3, 1, "C", "G", "L", "R", "T")):
        m.add("F")  # "laugh", "McLaughlin", "cough", ...
    elif i > 0 and _ch(s, i - 1) != "I":
        m.add("K")
    return i + 2


def _handle_j(m: _DM, s: str, i: int, slavo: bool) -> int:
    if _contains(s, i, 4, "JOSE") or _contains(s, 0, 4, "SAN "):
        # obvious Spanish, "jose", "san jacinto"
        if ((i == 0 and _ch(s, i + 4) == " ")
                or len(s) == 4 or _contains(s, 0, 4, "SAN ")):
            m.add("H")
        else:
            m.add("J", "H")
        return i + 1
    if i == 0 and not _contains(s, i, 4, "JOSE"):
        m.add("J", "A")  # Yankelovich/Jankelowicz
    elif (_is_vowel(_ch(s, i - 1)) and not slavo
            and (_ch(s, i + 1) == "A" or _ch(s, i + 1) == "O")):
        m.add("J", "H")  # spanish pron. of e.g. 'bajador'
    elif i == len(s) - 1:
        m.add("J", " ")
    elif (not _contains(s, i + 1, 1, *_L_T_K_S_N_M_B_Z)
            and not _contains(s, i - 1, 1, "S", "K", "L")):
        m.add("J")
    if _ch(s, i + 1) == "J":
        return i + 2
    return i + 1


def _handle_l(m: _DM, s: str, i: int) -> int:
    if _ch(s, i + 1) == "L":
        if _condition_l0(s, i):
            m.add("L", "")  # potential alternate spelling
        else:
            m.add("L")
        return i + 2
    m.add("L")
    return i + 1


def _handle_p(m: _DM, s: str, i: int) -> int:
    if _ch(s, i + 1) == "H":
        m.add("F")
        return i + 2
    m.add("P")
    return i + 2 if _contains(s, i + 1, 1, "P", "B") else i + 1


def _handle_r(m: _DM, s: str, i: int, slavo: bool) -> int:
    if (i == len(s) - 1 and not slavo
            and _contains(s, i - 2, 2, "IE")
            and not _contains(s, i - 4, 2, "ME", "MA")):
        m.add("", "R")  # french e.g. 'rogier'
    else:
        m.add("R")
    return i + 2 if _ch(s, i + 1) == "R" else i + 1


def _handle_s(m: _DM, s: str, i: int, slavo: bool) -> int:
    if _contains(s, i - 1, 3, "ISL", "YSL"):
        return i + 1  # special cases "island", "isle", "carlisle"
    if i == 0 and _contains(s, i, 5, "SUGAR"):
        m.add("X", "S")
        return i + 1
    if _contains(s, i, 2, "SH"):
        if _contains(s, i + 1, 4, "HEIM", "HOEK", "HOLM", "HOLZ"):
            m.add("S")  # germanic
        else:
            m.add("X")
        return i + 2
    if _contains(s, i, 3, "SIO", "SIA") or _contains(s, i, 4, "SIAN"):
        if slavo:
            m.add("S")
        else:
            m.add("S", "X")
        return i + 3
    if ((i == 0 and _contains(s, i + 1, 1, "M", "N", "L", "W"))
            or _contains(s, i + 1, 1, "Z")):
        m.add("S", "X")  # german & anglicisations
        return i + 2 if _contains(s, i + 1, 1, "Z") else i + 1
    if _contains(s, i, 2, "SC"):
        return _handle_sc(m, s, i)
    if (i == len(s) - 1 and _contains(s, i - 2, 2, "AI", "OI")):
        m.add("", "S")  # french e.g. "resnais", "artois"
    else:
        m.add("S")
    return i + 2 if _contains(s, i + 1, 1, "S", "Z") else i + 1


def _handle_sc(m: _DM, s: str, i: int) -> int:
    if _ch(s, i + 2) == "H":
        if _contains(s, i + 3, 2, "OO", "ER", "EN", "UY", "ED", "EM"):
            if _contains(s, i + 3, 2, "ER", "EN"):
                m.add("X", "SK")  # "schermerhorn", "schenker"
            else:
                m.add("SK")  # dutch origin e.g. "school", "schooner"
        elif i == 0 and not _is_vowel(_ch(s, 3)) and _ch(s, 3) != "W":
            m.add("X", "S")
        else:
            m.add("X")
    elif _contains(s, i + 2, 1, "I", "E", "Y"):
        m.add("S")
    else:
        m.add("SK")
    return i + 3


def _handle_t(m: _DM, s: str, i: int) -> int:
    if _contains(s, i, 4, "TION") or _contains(s, i, 3, "TIA", "TCH"):
        m.add("X")
        return i + 3
    if _contains(s, i, 2, "TH") or _contains(s, i, 3, "TTH"):
        if (_contains(s, i + 2, 2, "OM", "AM")
                or _contains(s, 0, 4, "VAN ", "VON ")
                or _contains(s, 0, 3, "SCH")):
            m.add("T")  # special case "thomas", "thames", germanic
        else:
            m.add("0", "T")
        return i + 2
    m.add("T")
    return i + 2 if _contains(s, i + 1, 1, "T", "D") else i + 1


def _handle_w(m: _DM, s: str, i: int) -> int:
    if _contains(s, i, 2, "WR"):
        m.add("R")  # can also be in middle of word
        return i + 2
    if i == 0 and (_is_vowel(_ch(s, i + 1)) or _contains(s, i, 2, "WH")):
        if _is_vowel(_ch(s, i + 1)):
            m.add("A", "F")  # Wasserman should match Vasserman
        else:
            m.add("A")  # need Uomo to match Womo
        return i + 1
    if ((i == len(s) - 1 and _is_vowel(_ch(s, i - 1)))
            or _contains(s, i - 1, 5, "EWSKI", "EWSKY", "OWSKI", "OWSKY")
            or _contains(s, 0, 3, "SCH")):
        m.add("", "F")  # Arnow should match Arnoff
        return i + 1
    if _contains(s, i, 4, "WICZ", "WITZ"):
        m.add("TS", "FX")  # polish e.g. "filipowicz"
        return i + 4
    return i + 1


def _handle_x(m: _DM, s: str, i: int) -> int:
    if not (i == len(s) - 1
            and (_contains(s, i - 3, 3, "IAU", "EAU")
                 or _contains(s, i - 2, 2, "AU", "OU"))):
        m.add("KS")  # french e.g. breaux
    return i + 2 if _contains(s, i + 1, 1, "C", "X") else i + 1


def _handle_z(m: _DM, s: str, i: int, slavo: bool) -> int:
    if _ch(s, i + 1) == "H":
        m.add("J")  # chinese pinyin e.g. "zhao"
        return i + 2
    if (_contains(s, i + 1, 2, "ZO", "ZI", "ZA")
            or (slavo and i > 0 and _ch(s, i - 1) != "T")):
        m.add("S", "TS")
    else:
        m.add("S")
    return i + 2 if _ch(s, i + 1) == "Z" else i + 1


# ---- conditions
def _condition_c0(s: str, i: int) -> bool:
    if _contains(s, i, 4, "CHIA"):
        return True
    if i <= 1:
        return False
    if _is_vowel(_ch(s, i - 2)):
        return False
    if not _contains(s, i - 1, 3, "ACH"):
        return False
    c = _ch(s, i + 2)
    return (c != "I" and c != "E") or _contains(s, i - 2, 6, "BACHER", "MACHER")


def _condition_ch0(s: str, i: int) -> bool:
    if i != 0:
        return False
    if not (_contains(s, i + 1, 5, "HARAC", "HARIS")
            or _contains(s, i + 1, 3, "HOR", "HYM", "HIA", "HEM")):
        return False
    return not _contains(s, 0, 5, "CHORE")


def _condition_ch1(s: str, i: int) -> bool:
    return ((_contains(s, 0, 4, "VAN ", "VON ") or _contains(s, 0, 3, "SCH"))
            or _contains(s, i - 2, 6, "ORCHES", "ARCHIT", "ORCHID")
            or _contains(s, i + 2, 1, "T", "S")
            or ((_contains(s, i - 1, 1, "A", "O", "U", "E") or i == 0)
                and (_contains(s, i + 2, 1, *_L_R_N_M_B_H_F_V_W_SPACE)
                     or i + 1 == len(s) - 1)))


def _condition_l0(s: str, i: int) -> bool:
    if i == len(s) - 3 and _contains(s, i - 1, 4, "ILLO", "ILLA", "ALLE"):
        return True
    return ((_contains(s, len(s) - 2, 2, "AS", "OS")
             or _contains(s, len(s) - 1, 1, "A", "O"))
            and _contains(s, i - 1, 4, "ALLE"))


def _conditions_m0(s: str, i: int) -> bool:
    if _ch(s, i + 1) == "M":
        return True
    return (_contains(s, i - 1, 3, "UMB")
            and ((i + 1) == len(s) - 1 or _contains(s, i + 2, 2, "ER")))


# ------------------------------------------------------------ filter + SPI
ENCODERS = {
    "soundex": soundex,
    "refined_soundex": refined_soundex,
    "double_metaphone": lambda v: double_metaphone(v)[0],
}


def phonetic_stream(tokens, encoder, inject: bool = True):
    """PhoneticFilter.java:33 incrementToken: per token, emit the phonetic
    code; with inject=True the ORIGINAL follows at the same position
    (posInc 0).  Unencodable / identity codes pass the original through."""
    for term, pos_inc, start, end in tokens:
        if not term:
            yield (term, pos_inc, start, end)
            continue
        try:
            code = encoder(term)
        except Exception:
            code = ""
        if not code or code == term:
            yield (term, pos_inc, start, end)
            continue
        yield (code, pos_inc, start, end)
        if inject:
            yield (term, 0, start, end)


def double_metaphone_stream(tokens, max_len: int = 4, inject: bool = False):
    """DoubleMetaphoneFilter.java:33: primary code, then the distinct
    alternate stacked at posInc 0; tokens with no encodable chars pass
    through; inject keeps the original first."""
    for term, pos_inc, start, end in tokens:
        prim, alt = double_metaphone(term, max_len)
        emitted = False
        if inject and term:
            yield (term, pos_inc, start, end)
            emitted = True
        if prim:
            yield (prim, 0 if emitted else pos_inc, start, end)
            emitted = True
        if alt and alt != prim:
            yield (alt, 0 if emitted else pos_inc, start, end)
            emitted = True
        if not emitted:
            yield (term, pos_inc, start, end)


def register_phonetic_analyzer(
    name: str, encoder: str = "double_metaphone", inject: bool = True,
    base_lower: bool = True,
) -> None:
    """ws + PhoneticFilter chain on the analyzer SPI.  Codes are indexed
    verbatim (they are already uppercase letters+digits); with inject the
    original (lowercased) stacks at the same position.

    Batched flat path: phonetic_stream is a stateless term -> terms map,
    so whole batches encode once per UNIQUE term (analysis/termmap.py)."""
    from .termmap import make_term_map_analyzer, probe_stateless
    from .tokenizer import register_analyzer, register_flat_analyzer
    from .worddelimiter import _ws_offsets_raw

    enc = ENCODERS[encoder]

    def _run(text: str, with_offsets: bool):
        if not text:
            return ([], [], 0) if not with_offsets else ([], [], [], [], 0)
        terms, positions, starts, ends = [], [], [], []
        pos = -1
        for t, pi, st, en in phonetic_stream(_ws_offsets_raw(text), enc, inject):
            pos += pi
            terms.append(t.lower() if base_lower else t)
            positions.append(pos)
            starts.append(st)
            ends.append(en)
        if with_offsets:
            return terms, positions, starts, ends, len(terms)
        return terms, positions, len(terms)

    scalar = lambda s: _run(s, False)  # noqa: E731
    scalar_off = lambda s: _run(s, True)  # noqa: E731
    register_flat_analyzer(
        name,
        make_term_map_analyzer(
            lambda uniq: probe_stateless(
                uniq, lambda toks: phonetic_stream(toks, enc, inject)
            ),
            lower=base_lower,
            scalar_fns=(scalar, scalar_off),
        ),
    )
    register_analyzer(name, scalar, scalar_off)
