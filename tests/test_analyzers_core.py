"""Core analyzer chains (KeywordAnalyzer / SimpleAnalyzer / StopAnalyzer
roles) + the register_analyzer extension point.

Reference: analysis/core/KeywordAnalyzer.java:28, SimpleAnalyzer.java:31,
LetterTokenizer.java:36, StopAnalyzer.java:51-55.
"""

from lucene_solr_intervals_spark.analysis.tokenizer import (
    ANALYZERS,
    keyword_tokenize,
    letter_tokenize,
    register_analyzer,
)


def test_keyword_whole_input_one_token():
    terms, pos, dl = keyword_tokenize("Foo Bar-42 baz")
    assert terms == ["Foo Bar-42 baz"] and pos == [0] and dl == 1
    assert keyword_tokenize("") == ([], [], 0)


def test_simple_letter_runs_lowercased():
    # LetterTokenizer: maximal letter runs; digits/punct split
    terms, pos, dl = ANALYZERS["simple"]("Foo42Bar, baz-QUX")
    assert terms == ["foo", "bar", "baz", "qux"]
    assert pos == [0, 1, 2, 3] and dl == 4


def test_stop_analyzer_position_holes():
    terms, pos, dl = ANALYZERS["stop"]("the quick fox is fast")
    # 'the' and 'is' removed, positions keep holes
    assert terms == ["quick", "fox", "fast"]
    assert pos == [1, 2, 4] and dl == 3


def test_language_stop_chains():
    fr, _, _ = ANALYZERS["fr"]("le chat et la souris")
    assert fr == ["chat", "souris"]
    de, _, _ = ANALYZERS["de"]("der Hund und die Katze")
    assert de == ["hund", "katze"]


def test_register_analyzer_extension_point():
    register_analyzer("rev_test", lambda s: letter_tokenize(s[::-1]))
    try:
        terms, _, _ = ANALYZERS["rev_test"]("abc xyz")
        assert terms == ["zyx", "cba"]
    finally:
        ANALYZERS.pop("rev_test", None)


def test_keyword_index_roundtrip(spark):
    from lucene_solr_intervals_spark.index.builder import build_index
    from lucene_solr_intervals_spark.search import queries as Q
    from lucene_solr_intervals_spark.search.executor import Searcher

    corpus = spark.createDataFrame(
        [(0, "US-WEST-2"), (1, "us-west-2"), (2, "EU-CENTRAL-1")],
        ["doc_id", "text"],
    )
    idx = build_index(corpus, analyzer="keyword")
    s = Searcher(idx, corpus=corpus, mode="sql")
    # keyword analyzer: exact verbatim match only
    got = sorted(r["doc_id"] for r in s.matching(Q.Term("US-WEST-2")).collect())
    assert got == [0]
    idx.unpersist()


# ------------------------------------------------------- flat batch tokenizer


def test_tokenize_flat_matches_scalar_analyzers():
    """The byte-domain batched tokenizer (build hot path) must reproduce the
    scalar analyzers exactly: terms, pre-stop positions (holes), doclens,
    char offsets, and the maxTokenLength no-position-drop."""
    import random
    import string

    import numpy as np

    from lucene_solr_intervals_spark.analysis.tokenizer import (
        ENGLISH_STOP_WORDS,
        code_tokenize,
        code_tokenize_offsets,
        tokenize_flat,
    )

    rng = random.Random(7)
    alphabet = string.ascii_letters + string.digits + "_ .,;!?\n\t()é漢🙂-\x00"
    texts = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 120)))
        for _ in range(300)
    ]
    texts += ["", None, "the and of it", "x" * 300 + " kept", "é漢🙂 wörld_1 ok"]

    cases = [
        ("code", lambda t: code_tokenize(t), lambda t: code_tokenize_offsets(t)),
        (
            "code_stop",
            lambda t: code_tokenize(t, ENGLISH_STOP_WORDS),
            lambda t: code_tokenize_offsets(t, ENGLISH_STOP_WORDS),
        ),
    ]
    for analyzer, scalar, scalar_off in cases:
        flat = tokenize_flat(texts, analyzer)
        off = np.searchsorted(flat["doc_idx"], np.arange(len(texts) + 1))
        for i, t in enumerate(texts):
            terms, positions, doclen = scalar(t)
            sl = slice(off[i], off[i + 1])
            assert flat["terms"][sl].tolist() == terms
            assert flat["positions"][sl].tolist() == positions
            assert flat["doclens"][i] == doclen
        flat = tokenize_flat(texts, analyzer, keep_offsets=True)
        off = np.searchsorted(flat["doc_idx"], np.arange(len(texts) + 1))
        for i, t in enumerate(texts):
            terms, positions, starts, ends, doclen = scalar_off(t)
            sl = slice(off[i], off[i + 1])
            assert flat["terms"][sl].tolist() == terms
            assert flat["positions"][sl].tolist() == positions
            assert flat["starts"][sl].tolist() == starts
            assert flat["ends"][sl].tolist() == ends


def test_tokenize_flat_fallback_and_empty():
    import numpy as np

    from lucene_solr_intervals_spark.analysis.tokenizer import tokenize_flat

    flat = tokenize_flat(["Hello World", "the fox"], "ws")
    assert flat["terms"].tolist() == ["Hello", "World", "the", "fox"]
    assert flat["doclens"].tolist() == [2, 2]
    assert flat["doc_idx"].tolist() == [0, 0, 1, 1]

    flat = tokenize_flat([], "code")
    assert flat["terms"].size == 0 and flat["doclens"].size == 0
    flat = tokenize_flat(["", "...", None], "code")
    assert flat["terms"].size == 0
    assert flat["doclens"].tolist() == [0, 0, 0]
    assert flat["positions"].dtype == np.int64


def test_tokenize_flat_property_random_unicode():
    """Property: for ANY text batch, the flat tokenizer equals the scalar
    analyzer (hypothesis drives weird unicode/control/emoji inputs)."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from lucene_solr_intervals_spark.analysis.tokenizer import (
        ENGLISH_STOP_WORDS,
        code_tokenize,
        tokenize_flat,
    )

    @settings(max_examples=150, deadline=None)
    @given(
        st.lists(
            st.one_of(st.none(), st.text(max_size=80)),
            min_size=0,
            max_size=8,
        )
    )
    def check(texts):
        for analyzer, stop in (("code", None), ("code_stop", ENGLISH_STOP_WORDS)):
            flat = tokenize_flat(texts, analyzer)
            off = np.searchsorted(flat["doc_idx"], np.arange(len(texts) + 1))
            for i, t in enumerate(texts):
                terms, positions, doclen = code_tokenize(t, stop)
                sl = slice(off[i], off[i + 1])
                assert flat["terms"][sl].tolist() == terms, (analyzer, repr(t))
                assert flat["positions"][sl].tolist() == positions
                assert flat["doclens"][i] == doclen

    check()


def test_tokenize_flat_matches_scalar_all_builtin_chains():
    """Round-5: EVERY built-in chain rides the batched fast path — the
    letter chains (byte LUT), ws (char-domain unicode whitespace LUT),
    en_stem (dictionary-level Porter), keyword (whole-value)."""
    import random
    import string

    import numpy as np

    from lucene_solr_intervals_spark.analysis.tokenizer import (
        ANALYZERS,
        _FLAT_FAST,
        _flat_fallback,
        tokenize_flat,
    )

    rng = random.Random(11)
    alphabet = (
        string.ascii_letters + string.digits + "_ .,;!?\n\t()é漢🙂-\x00"
        "  　 \x85"  # unicode whitespace for ws parity
    )
    texts = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 120)))
        for _ in range(200)
    ]
    texts += [
        "", None, "the and of it", "x" * 300 + " kept",
        "é漢🙂 wörld_1 ok", "running jumps easily", "le même chat", "der hund",
        "A B　C", "  lead trail  ",
    ]
    for analyzer in ("simple", "stop", "fr", "de", "ws", "en_stem", "keyword"):
        assert analyzer in _FLAT_FAST
        flat = tokenize_flat(texts, analyzer)
        ref = _flat_fallback(texts, ANALYZERS[analyzer], False)
        assert flat["terms"].tolist() == ref["terms"].tolist(), analyzer
        assert flat["positions"].tolist() == ref["positions"].tolist(), analyzer
        assert flat["doc_idx"].tolist() == ref["doc_idx"].tolist(), analyzer
        assert flat["doclens"].tolist() == ref["doclens"].tolist(), analyzer


def test_tokenize_flat_ws_offsets_match_scalar():
    import numpy as np

    from lucene_solr_intervals_spark.analysis.tokenizer import (
        tokenize_flat,
        ws_tokenize_offsets,
    )

    texts = ["Hello  World", "é漢🙂 wörld", "A B　C", "", "one"]
    flat = tokenize_flat(texts, "ws", keep_offsets=True)
    off = np.searchsorted(flat["doc_idx"], np.arange(len(texts) + 1))
    for i, t in enumerate(texts):
        terms, positions, starts, ends, doclen = ws_tokenize_offsets(t)
        sl = slice(off[i], off[i + 1])
        assert flat["terms"][sl].tolist() == terms
        assert flat["positions"][sl].tolist() == positions
        assert flat["starts"][sl].tolist() == starts
        assert flat["ends"][sl].tolist() == ends


def test_tokenize_flat_property_ws_and_letters():
    """Hypothesis property: flat == scalar for ws / stop / en_stem over
    arbitrary unicode (exercises the char-domain whitespace LUT and the
    split()-mismatch bail-out)."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from lucene_solr_intervals_spark.analysis.tokenizer import (
        ANALYZERS,
        _flat_fallback,
        tokenize_flat,
    )

    @settings(max_examples=120, deadline=None)
    @given(
        st.lists(
            st.one_of(st.none(), st.text(max_size=60)),
            min_size=0,
            max_size=6,
        )
    )
    def check(texts):
        for analyzer in ("ws", "stop", "en_stem"):
            flat = tokenize_flat(texts, analyzer)
            ref = _flat_fallback(texts, ANALYZERS[analyzer], False)
            assert flat["terms"].tolist() == ref["terms"].tolist(), analyzer
            assert flat["positions"].tolist() == ref["positions"].tolist()
            assert flat["doclens"].tolist() == ref["doclens"].tolist()

    check()


def test_stem_keep_chain():
    """KeywordRepeat + Porter + RemoveDuplicates: original AND stem at the
    same position; identical stems not duplicated."""
    from lucene_solr_intervals_spark.analysis.tokenizer import ANALYZERS

    terms, positions, doclen = ANALYZERS["en_stem_keep"]("running runs the dog")
    assert terms == ["running", "run", "runs", "run", "dog"]
    assert positions == [0, 0, 1, 1, 3]  # stop hole at 2, stems posInc=0
    assert doclen == 3  # distinct positions (overlaps discounted)


def test_length_and_limit_filters():
    """LengthFilter holes + LimitTokenCountFilter head-cut (r5 SPI)."""
    from lucene_solr_intervals_spark.analysis.tokenizer import (
        ANALYZERS,
        register_length_filter_analyzer,
    )

    if "len_2_5" not in ANALYZERS:
        register_length_filter_analyzer("len_2_5", base="code", min_len=2, max_len=5)
    terms, positions, doclen = ANALYZERS["len_2_5"]("a bb ccc verylongtoken dd")
    # 'a' (len 1) and 'verylongtoken' (len 13) dropped WITH holes
    assert terms == ["bb", "ccc", "dd"]
    assert positions == [1, 2, 4]
    assert doclen == 3

    if "first3" not in ANALYZERS:
        register_length_filter_analyzer("first3", base="code", max_count=3)
    terms, positions, doclen = ANALYZERS["first3"]("one two three four five")
    assert terms == ["one", "two", "three"] and doclen == 3


def test_pattern_replace_char_filter_instance():
    """PatternReplaceCharFilter is a one-liner through the CharFilter SPI."""
    import re

    from lucene_solr_intervals_spark.analysis.tokenizer import (
        ANALYZERS,
        register_char_filter_analyzer,
    )

    camel = re.compile(r"(?<=[a-z])(?=[A-Z])")
    if "camel_split" not in ANALYZERS:
        register_char_filter_analyzer(
            "camel_split", lambda t: camel.sub(" ", t), base="code"
        )
    terms, _, _ = ANALYZERS["camel_split"]("getIndexReader fooBar")
    assert terms == ["get", "index", "reader", "foo", "bar"]


def test_limit_counts_post_length_survivors():
    """Review r5b: LimitTokenCount runs downstream of LengthFilter."""
    from lucene_solr_intervals_spark.analysis.tokenizer import (
        ANALYZERS,
        register_length_filter_analyzer,
    )

    if "len2_first3" not in ANALYZERS:
        register_length_filter_analyzer(
            "len2_first3", base="code", min_len=2, max_count=3
        )
    terms, _, doclen = ANALYZERS["len2_first3"]("a bb cc dd ee")
    # 'a' dropped by length; the NEXT THREE survivors kept
    assert terms == ["bb", "cc", "dd"] and doclen == 3


def test_char_filter_chain_offsets_twin():
    """Review r5b: char-filter chains register an offsets twin (folded
    text coordinates) so highlight paths work."""
    from lucene_solr_intervals_spark.analysis.tokenizer import (
        OFFSET_ANALYZERS,
        register_html_strip_analyzer,
    )

    if "html_code" not in OFFSET_ANALYZERS:
        register_html_strip_analyzer("html_code", base="code")
    assert "fr_fold" in OFFSET_ANALYZERS  # folding = char-filter instance
    terms, positions, starts, ends, doclen = OFFSET_ANALYZERS["html_code"](
        "<b>vector</b> merge"
    )
    assert terms == ["vector", "merge"]
    # offsets refer to the STRIPPED text "vector merge"
    assert list(zip(starts, ends)) == [(0, 6), (7, 12)]


def test_common_grams_chain_has_no_offsets_twin():
    from lucene_solr_intervals_spark.analysis.tokenizer import (
        ANALYZERS,
        OFFSET_ANALYZERS,
        register_common_grams_analyzer,
    )

    if "cg_noff" not in ANALYZERS:
        register_common_grams_analyzer("cg_noff", {"the"}, base="code")
    assert "cg_noff" not in OFFSET_ANALYZERS
