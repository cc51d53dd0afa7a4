"""Token-stream equality: batched dictionary-level analyzer chains
(analysis/termmap.py) vs the scalar reference transcriptions.

The round-7 chains (WordDelimiter / Phonetic / Compound / Hunspell) ran
per-doc, per-token Python (`_flat_fallback`); round 8 moves them onto the
factorize fast path (one scalar-stream probe per UNIQUE term per batch).
These tests pin every flat-array field — doc_idx, terms, positions,
doclens, starts, ends — exactly equal between the two executions, the
same guarantee the en_stem `_stem_dictionary` precedent carries.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

import lucene_solr_intervals_spark.analysis.worddelimiter  # noqa: F401 (registers chains)
from lucene_solr_intervals_spark.analysis.tokenizer import (
    ANALYZERS,
    OFFSET_ANALYZERS,
    _flat_fallback,
    tokenize_flat,
)

DOCS = [
    "PowerShot SD500 plays O'Neil's music",
    "wi-fi wi-fi-4000 j2se SuperDuperXL-500 42abc",
    "",
    "   ",
    "--",
    "-- hello world",
    "-- -- two leading holes",
    "mid -- dash -- stream",
    None,
    "repeat repeat repeat wi-fi repeat",
    "café über straße",
    "TRAILING-- --LEADING __under__",
    "tabs\tand\nnewlines  multiple   spaces",
    "x y z single letters",
    "500-42 1,000 3.14.15",
    "ALLCAPS MixedCase lowercase",
    # regression (round 9): a doc whose leading token is all-delimiter,
    # followed by EMPTY/None docs at the batch tail — the reduceat boundary
    # clamp truncated the previous doc's leading-hole count
    "_ 9",
    "",
    "- leading then empties",
    "",
    None,
]


def _assert_flat_equal(name: str, texts, keep_offsets: bool):
    batched = tokenize_flat(texts, name, keep_offsets)
    scalar_fn = (OFFSET_ANALYZERS if keep_offsets else ANALYZERS)[name]
    expected = _flat_fallback(texts, scalar_fn, keep_offsets)
    keys = ["doc_idx", "positions", "doclens"] + (
        ["starts", "ends"] if keep_offsets else []
    )
    assert batched["terms"].tolist() == expected["terms"].tolist(), name
    for k in keys:
        assert np.array_equal(batched[k], expected[k]), f"{name}.{k}"


@pytest.mark.parametrize("keep_offsets", [False, True])
@pytest.mark.parametrize(
    "name", ["word_delimiter", "word_delimiter_cat", "word_delimiter_preserve"]
)
def test_word_delimiter_parity(name, keep_offsets):
    _assert_flat_equal(name, DOCS, keep_offsets)


def test_word_delimiter_custom_flags_parity():
    from lucene_solr_intervals_spark.analysis.worddelimiter import (
        CATENATE_ALL,
        DEFAULT_FLAGS,
        register_word_delimiter_analyzer,
    )

    register_word_delimiter_analyzer(
        "_tmp_wdf_all",
        DEFAULT_FLAGS | CATENATE_ALL,
        prot_words=frozenset(["wi-fi"]),
    )
    _assert_flat_equal("_tmp_wdf_all", DOCS, True)


def test_word_delimiter_exotic_flags_fall_back_exactly():
    # no GENERATE / CATENATE / PRESERVE: delimiter words SWALLOW their
    # position increment (carry) — the vector path must hand the whole
    # batch to the scalar transcription, bit-for-bit
    from lucene_solr_intervals_spark.analysis.worddelimiter import (
        SPLIT_ON_CASE_CHANGE,
        SPLIT_ON_NUMERICS,
        register_word_delimiter_analyzer,
    )

    register_word_delimiter_analyzer(
        "_tmp_wdf_nogen", SPLIT_ON_CASE_CHANGE | SPLIT_ON_NUMERICS
    )
    _assert_flat_equal("_tmp_wdf_nogen", DOCS, False)
    _assert_flat_equal("_tmp_wdf_nogen", DOCS, True)


@pytest.mark.parametrize("keep_offsets", [False, True])
@pytest.mark.parametrize(
    "encoder,inject",
    [("soundex", False), ("soundex", True), ("double_metaphone", True),
     ("refined_soundex", False)],
)
def test_phonetic_parity(encoder, inject, keep_offsets):
    from lucene_solr_intervals_spark.analysis.phonetic import (
        register_phonetic_analyzer,
    )

    name = f"_tmp_ph_{encoder}_{inject}"
    register_phonetic_analyzer(name, encoder, inject=inject)
    docs = DOCS + ["robert rupert ashcraft pfister", "smith smyth SMITH"]
    _assert_flat_equal(name, docs, keep_offsets)


@pytest.mark.parametrize("keep_offsets", [False, True])
@pytest.mark.parametrize("only_longest", [False, True])
def test_compound_parity(only_longest, keep_offsets):
    from lucene_solr_intervals_spark.analysis.compound import (
        register_compound_analyzer,
    )

    name = f"_tmp_cmp_{only_longest}"
    register_compound_analyzer(
        name,
        ["soft", "ball", "team", "fuss", "ball", "abend"],
        min_sub=2,
        only_longest=only_longest,
    )
    docs = DOCS + ["softballteam fussballabend softball plays", "ball"]
    _assert_flat_equal(name, docs, keep_offsets)


@pytest.fixture(scope="module")
def hunspell_chain():
    from lucene_solr_intervals_spark.analysis.hunspell import (
        HunspellDictionary,
        register_hunspell_analyzer,
    )

    aff = "SET UTF-8\nSFX A Y 2\nSFX A 0 s . \nSFX A y ies y\n"
    dic = "3\nbook/A\nbody/A\nlucid\n"
    register_hunspell_analyzer(
        "_tmp_hun", HunspellDictionary(aff, dic, ignore_case=True)
    )
    return "_tmp_hun"


@pytest.mark.parametrize("keep_offsets", [False, True])
def test_hunspell_parity(hunspell_chain, keep_offsets):
    docs = DOCS + ["books bodies book body lucid unknownword", "BOOKS Bodies"]
    _assert_flat_equal(hunspell_chain, docs, keep_offsets)


_FUZZ_ALPHABET = "aB9-. 'é中_x "


@settings(max_examples=120, deadline=None)
@given(
    st.lists(
        st.text(alphabet=_FUZZ_ALPHABET, max_size=24), min_size=0, max_size=8
    )
)
def test_word_delimiter_fuzz_parity(docs):
    for name in ("word_delimiter", "word_delimiter_cat", "word_delimiter_preserve"):
        _assert_flat_equal(name, docs, True)


def test_flat_path_registered():
    """The four chains must ride _CUSTOM_FLAT (the batched path), not the
    per-doc fallback — the round-7 scale defect this module fixes."""
    from lucene_solr_intervals_spark.analysis.tokenizer import _CUSTOM_FLAT

    for name in ("word_delimiter", "word_delimiter_cat", "word_delimiter_preserve"):
        assert name in _CUSTOM_FLAT
