"""Transcribed CJK goldens + batched-path invariants.

Vectors from the reference's own suites:
  lucene/analysis/common/src/test/org/apache/lucene/analysis/cjk/
    TestCJKBigramFilter.java   (testHuge, testHanOnly, testAllScripts,
                                testUnigramsAndBigrams*)
    TestCJKWidthFilter.java    (testFullWidthASCII, testHalfWidthKana,
                                testEmptyTerm)
posInc vectors are asserted as positions (cumsum - 1), the engine's
flat shape.
"""

from __future__ import annotations

import numpy as np
import pytest

from lucene_solr_intervals_spark.analysis.cjk import (
    ALL_CJK,
    HAN,
    cjk_flat,
    cjk_width_fold,
    register_cjk_analyzer,
)

SENT = "多くの学生が試験に落ちた"
BIGRAMS = ["多く", "くの", "の学", "学生", "生が", "が試", "試験", "験に",
           "に落", "落ち", "ちた"]


def _one(text, **kw):
    flat = cjk_flat([text], keep_offsets=True, **kw)
    return (
        flat["terms"].tolist(),
        flat["positions"].tolist(),
        flat["starts"].tolist(),
        flat["ends"].tolist(),
    )


# --------------------------------------------------------------- width
def test_full_width_ascii():
    # TestCJKWidthFilter.testFullWidthASCII (chain adds lowercase)
    terms, _, starts, ends = _one("Ｔｅｓｔ １２３４")
    assert terms == ["test", "1234"]
    assert starts == [0, 5] and ends == [4, 9]


@pytest.mark.parametrize(
    "raw,expect",
    [("ｶﾀｶﾅ", "カタカナ"), ("ｳﾞｨｯﾂ", "ヴィッツ"), ("ﾊﾟﾅｿﾆｯｸ", "パナソニック")],
)
def test_half_width_kana_fold(raw, expect):
    # TestCJKWidthFilter.testHalfWidthKana — term-level fold
    assert cjk_width_fold(raw) == expect


def test_half_width_kana_through_chain():
    # folded runs then bigram like any katakana run
    terms, pos, _, _ = _one("ｶﾀｶﾅ")
    assert terms == ["カタ", "タカ", "カナ"] and pos == [0, 1, 2]


def test_width_empty_term():
    assert cjk_width_fold("") == ""


def test_width_lone_voice_mark():
    # voice mark with no combinable base falls back to 0x3099/0x309A
    assert cjk_width_fold("ｱﾞ") == "ア゙"


# -------------------------------------------------------------- bigrams
def test_all_scripts():
    terms, pos, _, _ = _one(SENT + "。")
    assert terms == BIGRAMS
    assert pos == list(range(11))


def test_huge():
    terms, pos, _, _ = _one(SENT * 11)
    expect = (BIGRAMS + ["た多"]) * 10 + BIGRAMS
    assert terms == expect
    assert pos == list(range(len(expect)))


def test_han_only():
    terms, pos, starts, ends = _one(SENT + "。", flags=HAN)
    assert terms == ["多", "く", "の", "学生", "が", "試験", "に", "落",
                     "ち", "た"]
    assert pos == list(range(10))
    assert starts == [0, 1, 2, 3, 5, 6, 8, 9, 10, 11]
    assert ends == [1, 2, 3, 5, 6, 8, 9, 10, 11, 12]


def test_unigrams_and_bigrams_all_scripts():
    terms, pos, starts, ends = _one(SENT + "。", output_unigrams=True)
    assert terms == [
        "多", "多く", "く", "くの", "の", "の学", "学", "学生", "生",
        "生が", "が", "が試", "試", "試験", "験", "験に", "に",
        "に落", "落", "落ち", "ち", "ちた", "た",
    ]
    # posInc 1,0,1,0,... -> positions 0,0,1,1,2,2,...,11
    assert pos == [0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 6, 7, 7, 8, 8,
                   9, 9, 10, 10, 11]
    assert starts == [0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 6, 7, 7, 8,
                      8, 9, 9, 10, 10, 11]
    assert ends == [1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 6, 7, 7, 8, 8, 9, 9, 10,
                    10, 11, 11, 12, 12]


def test_unigrams_and_bigrams_han_only():
    terms, pos, starts, ends = _one(
        SENT + "。", flags=HAN, output_unigrams=True
    )
    assert terms == ["多", "く", "の", "学", "学生", "生", "が", "試",
                     "試験", "験", "に", "落", "ち", "た"]
    # posIncs 1,1,1,1,0,1,1,1,0,1,1,1,1,1
    assert pos == [0, 1, 2, 3, 3, 4, 5, 6, 6, 7, 8, 9, 10, 11]
    assert starts == [0, 1, 2, 3, 3, 4, 5, 6, 6, 7, 8, 9, 10, 11]
    assert ends == [1, 2, 3, 4, 5, 5, 6, 7, 8, 8, 9, 10, 11, 12]


def test_unigrams_and_bigrams_huge():
    terms, _, _, _ = _one(SENT * 11, output_unigrams=True)
    unit = []
    for i, b in enumerate(BIGRAMS + ["た多"]):
        unit += [b[0], b]
    expect = unit * 10 + unit[:-1]  # last repeat has no trailing た多
    assert terms == expect


# ------------------------------------------------- mixed / pass-through
def test_lone_cjk_and_words():
    # lone CJK chars (space/word-separated) emit unigrams; words pass thru
    terms, pos, _, _ = _one("hello 多 world 学生 ok")
    assert terms == ["hello", "多", "world", "学生", "ok"]
    assert pos == [0, 1, 2, 3, 4]


def test_unaligned_cjk_breaks_chain():
    terms, _, _, _ = _one("多 多")
    assert terms == ["多", "多"]


def test_word_between_cjk_breaks_chain():
    terms, _, _, _ = _one("多a多")
    assert terms == ["多", "a", "多"]


def test_stopwords_leave_holes():
    terms, pos, _, _ = _one("the 学生 of 試験", stopwords=frozenset(["the", "of"]))
    assert terms == ["学生", "試験"]
    assert pos == [1, 3]


def test_code_word_class():
    terms, _, _, _ = _one("get_index 学生", word_chars="code")
    assert terms == ["get_index", "学生"]


def test_registered_chain_flat():
    from lucene_solr_intervals_spark.analysis.tokenizer import (
        _CUSTOM_FLAT,
        tokenize_flat,
    )

    assert "cjk" in _CUSTOM_FLAT
    flat = tokenize_flat(["多くの学生", "hello the 試験"], "cjk")
    assert flat["terms"].tolist() == [
        "多く", "くの", "の学", "学生", "hello", "試験"
    ]
    assert flat["doclens"].tolist() == [4, 2]


def test_batch_equals_per_doc():
    docs = [
        SENT, "", None, "hello 多 world", "ｶﾀｶﾅ and ＡＳＣＩＩ",
        "한국어 처리", "多 多", SENT + "。",
    ]
    batch = cjk_flat(docs, output_unigrams=True, keep_offsets=True)
    parts = [
        cjk_flat([d], output_unigrams=True, keep_offsets=True) for d in docs
    ]
    terms = sum((p["terms"].tolist() for p in parts), [])
    assert batch["terms"].tolist() == terms
    for k in ("positions", "starts", "ends"):
        assert batch[k].tolist() == sum((p[k].tolist() for p in parts), [])
    assert batch["doclens"].tolist() == [int(p["doclens"][0]) for p in parts]


def test_hangul_runs_bigram():
    terms, pos, _, _ = _one("한국어")
    assert terms == ["한국", "국어"] and pos == [0, 1]


def test_register_custom():
    register_cjk_analyzer("_tmp_cjk_unibi", ALL_CJK, output_unigrams=True)
    from lucene_solr_intervals_spark.analysis.tokenizer import tokenize_flat

    flat = tokenize_flat([SENT], "_tmp_cjk_unibi")
    assert flat["terms"][0] == "多" and flat["terms"][1] == "多く"


# ------------------------------------------------- TestCJKAnalyzer vectors
# (lucene/analysis/common/src/test/.../cjk/TestCJKAnalyzer.java; the
# surrogate case's offsets transcribe to CODEPOINT semantics — Java
# counts UTF-16 units, this engine counts codepoints)
def test_analyzer_ja1():
    terms, pos, starts, ends = _one("一二三四五六七八九十")
    assert terms == ["一二", "二三", "三四", "四五", "五六", "六七",
                     "七八", "八九", "九十"]
    assert starts == list(range(9)) and ends == list(range(2, 11))


def test_analyzer_ja2():
    terms, _, starts, ends = _one("一 二三四 五六七八九 十")
    assert terms == ["一", "二三", "三四", "五六", "六七", "七八", "八九", "十"]
    assert starts == [0, 2, 3, 6, 7, 8, 9, 12]
    assert ends == [1, 4, 5, 8, 9, 10, 11, 13]


def test_analyzer_c():
    terms, _, starts, ends = _one("abc defgh ijklmn opqrstu vwxy z")
    assert terms == ["abc", "defgh", "ijklmn", "opqrstu", "vwxy", "z"]
    assert starts == [0, 4, 10, 17, 25, 30]
    assert ends == [3, 9, 16, 24, 29, 31]


def test_analyzer_mix():
    terms, _, starts, ends = _one("あいうえおabcかきくけこ")
    assert terms == ["あい", "いう", "うえ", "えお", "abc", "かき", "きく",
                     "くけ", "けこ"]
    assert starts == [0, 1, 2, 3, 5, 8, 9, 10, 11]
    assert ends == [2, 3, 4, 5, 8, 10, 11, 12, 13]


def test_analyzer_mix2():
    terms, _, starts, ends = _one("あいうえおabんcかきくけ こ")
    assert terms == ["あい", "いう", "うえ", "えお", "ab", "ん", "c",
                     "かき", "きく", "くけ", "こ"]
    assert starts == [0, 1, 2, 3, 5, 7, 8, 9, 10, 11, 14]
    assert ends == [2, 3, 4, 5, 7, 8, 9, 11, 12, 13, 15]


def test_analyzer_non_ideographic():
    terms, _, starts, ends = _one("一 روبرت موير")
    assert terms == ["一", "روبرت", "موير"]
    assert starts == [0, 2, 8] and ends == [1, 7, 12]


def test_analyzer_non_ideographic_non_letter():
    # the nonspacing mark U+064F extends its word (UAX29 Extend)
    terms, _, starts, ends = _one("一 رُوبرت موير")
    assert terms == ["一", "رُوبرت", "موير"]
    assert starts == [0, 2, 9] and ends == [1, 8, 13]


def test_analyzer_surrogates():
    # astral Han (U+29B05) — codepoint offsets (Java vector counts UTF-16)
    terms, _, starts, ends = _one("𩬅艱鍟䇹愯瀛")
    assert terms == ["𩬅艱", "艱鍟", "鍟䇹", "䇹愯", "愯瀛"]
    assert starts == [0, 1, 2, 3, 4] and ends == [2, 3, 4, 5, 6]


def test_analyzer_single_char():
    terms, pos, starts, ends = _one("一")
    assert terms == ["一"] and starts == [0] and ends == [1]


def test_analyzer_token_stream():
    terms, _, starts, ends = _one("一丁丂")
    assert terms == ["一丁", "丁丂"]
    assert starts == [0, 1] and ends == [2, 3]
