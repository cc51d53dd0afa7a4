"""TestPhoneticFilter.java + DoubleMetaphoneFilterTest.java transcriptions
(reference lucene/analysis/phonetic/src/test/.../TestPhoneticFilter.java:36
and DoubleMetaphoneFilterTest.java:30) against analysis/phonetic.py, plus
published commons-codec vectors for the bare encoders."""

from __future__ import annotations

import pytest

from lucene_solr_intervals_spark.analysis.phonetic import (
    double_metaphone,
    double_metaphone_stream,
    phonetic_stream,
    refined_soundex,
    register_phonetic_analyzer,
    soundex,
)


def ws_tokens(text):
    """MockTokenizer.WHITESPACE equivalent with offsets, posInc=1."""
    out, i = [], 0
    for part in text.split(" "):
        if part:
            out.append((part, 1, i, i + len(part)))
        i += len(part) + 1
    return out


def terms(stream):
    return [t for t, _pi, _s, _e in stream]


# ---------------------------------------------------------------- encoders
# TestPhoneticFilter.testAlgorithms vectors (the encoder outputs)
@pytest.mark.parametrize("word,code", [
    ("aaa", "A000"), ("bbb", "B000"), ("ccc", "C000"), ("easgasg", "E220"),
    # published commons-codec SoundexTest vectors (H/W rule cases)
    ("Robert", "R163"), ("Rupert", "R163"), ("Ashcraft", "A261"),
    ("Ashcroft", "A261"), ("Tymczak", "T522"), ("Pfister", "P236"),
    ("testing", "T235"), ("The", "T000"), ("quick", "Q200"),
    ("brown", "B650"), ("fox", "F200"), ("jumped", "J513"),
    ("over", "O160"), ("lazy", "L200"), ("dogs", "D200"),
])
def test_soundex(word, code):
    assert soundex(word) == code


@pytest.mark.parametrize("word,code", [
    ("aaa", "A0"), ("bbb", "B1"), ("ccc", "C3"), ("easgasg", "E034034"),
    # commons-codec RefinedSoundexTest
    ("testing", "T6036084"), ("TESTING", "T6036084"), ("The", "T60"),
    ("quick", "Q503"), ("brown", "B1908"), ("fox", "F205"),
    ("jumped", "J408106"), ("over", "O0209"), ("lazy", "L7050"),
    ("dogs", "D6043"),
])
def test_refined_soundex(word, code):
    assert refined_soundex(word) == code


# DoubleMetaphoneFilterTest + commons-codec DoubleMetaphoneTest vectors
@pytest.mark.parametrize("word,max_len,prim,alt", [
    ("international", 4, "ANTR", "ANTR"),
    ("international", 8, "ANTRNXNL", "ANTRNXNL"),
    ("Kuczewski", 4, "KSSK", "KXFS"),
    ("aaa", 4, "A", "A"), ("bbb", 4, "PP", "PP"), ("ccc", 4, "KK", "KK"),
    ("easgasg", 4, "ASKS", "ASKS"),
    ("maurice", 4, "MRS", "MRS"),
    ("auto", 4, "AT", "AT"),
    ("maisey", 4, "MS", "MS"),
    ("catherine", 4, "K0RN", "KTRN"),
    ("geoff", 4, "JF", "KF"),
    ("Chile", 4, "XL", "XL"),
    ("katherine", 4, "K0RN", "KTRN"),
    ("steven", 4, "STFN", "STFN"),
    ("michael", 4, "MKL", "MXL"),
    ("smith", 4, "SM0", "XMT"),
    ("schmidt", 4, "XMT", "SMT"),
    ("thompson", 4, "TMPS", "TMPS"),
    ("Xavier", 4, "SF", "SFR"),
    ("Jose", 4, "HS", "HS"),
    ("dumb", 4, "TM", "TM"),
])
def test_double_metaphone(word, max_len, prim, alt):
    assert double_metaphone(word, max_len) == (prim, alt)


def test_double_metaphone_empty_and_nonalpha():
    assert double_metaphone("") == ("", "")
    assert double_metaphone("12345") == ("", "")


# ----------------------------------------------------- PhoneticFilter stream
# TestPhoneticFilter.testAlgorithms: inject=True emits code first, original
# second at the same position (PhoneticFilter.java:86 "we return the
# phonetic alternative first").
def test_phonetic_filter_soundex_inject():
    out = list(phonetic_stream(ws_tokens("aaa bbb ccc easgasg"), soundex, True))
    assert terms(out) == ["A000", "aaa", "B000", "bbb", "C000", "ccc",
                          "E220", "easgasg"]
    assert [pi for _t, pi, _s, _e in out] == [1, 0, 1, 0, 1, 0, 1, 0]
    # offsets of the injected original match the code's
    assert out[0][2:] == out[1][2:] == (0, 3)


def test_phonetic_filter_soundex_replace():
    out = list(phonetic_stream(ws_tokens("aaa bbb ccc easgasg"), soundex, False))
    assert terms(out) == ["A000", "B000", "C000", "E220"]
    assert [pi for _t, pi, _s, _e in out] == [1, 1, 1, 1]


def test_phonetic_filter_refined_soundex_inject():
    out = list(phonetic_stream(ws_tokens("aaa bbb ccc easgasg"),
                               refined_soundex, True))
    assert terms(out) == ["A0", "aaa", "B1", "bbb", "C3", "ccc",
                          "E034034", "easgasg"]


def test_phonetic_filter_unencodable_passthrough():
    # PhoneticFilter.java:75 "pass through" when the encoder yields nothing
    out = list(phonetic_stream(ws_tokens("12345 #$%@#^%&"), soundex, True))
    assert terms(out) == ["12345", "#$%@#^%&"]


def test_phonetic_filter_identity_code_not_injected():
    # value.equals(v) -> no injection (PhoneticFilter.java:73)
    out = list(phonetic_stream([("A000", 1, 0, 4)], soundex, True))
    assert terms(out) == ["A000"]


# ----------------------------------------- DoubleMetaphoneFilter stream
def test_dm_filter_size4_false_inject():
    out = list(double_metaphone_stream(ws_tokens("international"), 4, False))
    assert terms(out) == ["ANTR"]


def test_dm_filter_size4_true_inject():
    out = list(double_metaphone_stream(ws_tokens("international"), 4, True))
    assert terms(out) == ["international", "ANTR"]
    assert [pi for _t, pi, _s, _e in out] == [1, 0]


def test_dm_filter_alternate_inject_false():
    out = list(double_metaphone_stream(ws_tokens("Kuczewski"), 4, False))
    assert terms(out) == ["KSSK", "KXFS"]
    assert [pi for _t, pi, _s, _e in out] == [1, 0]


def test_dm_filter_size8_false_inject():
    out = list(double_metaphone_stream(ws_tokens("international"), 8, False))
    assert terms(out) == ["ANTRNXNL"]


def test_dm_filter_nonconvertible_with_inject():
    out = list(double_metaphone_stream(ws_tokens("12345 #$%@#^%&"), 8, True))
    assert terms(out) == ["12345", "#$%@#^%&"]


def test_dm_filter_nonconvertible_without_inject():
    out = list(double_metaphone_stream(ws_tokens("12345 #$%@#^%&"), 8, False))
    assert terms(out) == ["12345", "#$%@#^%&"]
    out = list(double_metaphone_stream(ws_tokens("12345 #$%@#^%& hello"),
                                       8, False))
    assert terms(out) == ["12345", "#$%@#^%&", "HL"]


# ----------------------------------------------------------- analyzer SPI
def test_register_phonetic_analyzer():
    from lucene_solr_intervals_spark.analysis.tokenizer import ANALYZERS

    register_phonetic_analyzer("dm_test_an", "double_metaphone", inject=True)
    assert "dm_test_an" in ANALYZERS
    toks, positions, n = ANALYZERS["dm_test_an"]("smith waters")
    # primary code + lowered original stacked at the same position
    assert toks == ["sm0", "smith", "atrs", "waters"]
    assert positions == [0, 0, 1, 1]
    assert n == 4
