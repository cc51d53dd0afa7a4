"""Analysis chain: tokenizer -> lowercase -> stop filter (position holes).

Mirrors the reference's StandardAnalyzer pipeline semantics
(/root/reference/lucene/analysis/common/src/java/org/apache/lucene/analysis/
standard/StandardAnalyzer.java:84-89): Tokenizer -> LowerCaseFilter ->
StopFilter.  Two behaviors are load-bearing for parity:

* StopFilter preserves position increments (StopFilter.java:31 extends
  FilteringTokenFilter): removed tokens leave HOLES in the position
  sequence, so phrase/interval matching sees the original positions.
* doclen counts only EMITTED tokens (DefaultIndexingChain.java:602-637
  increments length per token reaching the index), i.e. after stop removal.

Tokenizers provided:
  * code_tokenize  — split on [^A-Za-z0-9_]+ and lowercase: the fixed
    analyzer for the source-code corpus (FIXTURES.md F1).
  * ws_tokenize    — whitespace split, used by the golden interval fixtures
    (the reference interval tests use whitespace-delimited synthetic docs).

Each returns (terms, positions, doclen) where positions carry pre-stop
indexes.  The Spark-side wrapper is an Arrow-vectorized pandas UDF — no
per-row Python at the DataFrame boundary.
"""

from __future__ import annotations

import re
from collections.abc import Iterable

# English stopwords of the reference's StopAnalyzer
# (/root/reference/lucene/analysis/common/src/java/org/apache/lucene/
#  analysis/core/StopAnalyzer.java:38-49)
ENGLISH_STOP_WORDS = frozenset(
    "a an and are as at be but by for if in into is it no not of on or such "
    "that the their then there these they this to was will with".split()
)

_CODE_SPLIT = re.compile(r"[^A-Za-z0-9_]+")
_WS_SPLIT = re.compile(r"\s+")

# Lucene's StandardTokenizer drops tokens longer than maxTokenLength=255
# (StandardAnalyzer.java:39); we keep the same cap.
MAX_TOKEN_LENGTH = 255


def _analyze(
    raw_tokens: Iterable[str],
    lowercase: bool,
    stopwords: frozenset[str] | None,
) -> tuple[list[str], list[int], int]:
    terms: list[str] = []
    positions: list[int] = []
    pos = 0
    for tok in raw_tokens:
        if not tok or len(tok) > MAX_TOKEN_LENGTH:
            continue
        t = tok.lower() if lowercase else tok
        if stopwords is not None and t in stopwords:
            pos += 1  # hole: position increments past the stopword
            continue
        terms.append(t)
        positions.append(pos)
        pos += 1
    return terms, positions, len(terms)


def code_tokenize(
    text: str,
    stopwords: frozenset[str] | None = None,
) -> tuple[list[str], list[int], int]:
    """Fixed analyzer for the source-code corpus: [^A-Za-z0-9_]+ split, lower."""
    if text is None:
        return [], [], 0
    return _analyze(_CODE_SPLIT.split(text), True, stopwords)


def ws_tokenize(
    text: str,
    lowercase: bool = False,
    stopwords: frozenset[str] | None = None,
) -> tuple[list[str], list[int], int]:
    """Whitespace tokenizer used by the golden interval fixtures."""
    if text is None:
        return [], [], 0
    return _analyze(_WS_SPLIT.split(text), lowercase, stopwords)


_CODE_TOKEN = re.compile(r"[A-Za-z0-9_]+")


def code_tokenize_offsets(
    text: str,
    stopwords: frozenset[str] | None = None,
) -> tuple[list[str], list[int], list[int], list[int], int]:
    """Like code_tokenize but also returns character (start, end) offsets —
    the OFFSETS posting feature (Weight.PostingFeatures.OFFSETS), feeding
    interval-driven highlighting."""
    if text is None:
        return [], [], [], [], 0
    terms: list[str] = []
    positions: list[int] = []
    starts: list[int] = []
    ends: list[int] = []
    pos = 0
    for m in _CODE_TOKEN.finditer(text):
        tok = m.group(0)
        if len(tok) > MAX_TOKEN_LENGTH:
            continue
        t = tok.lower()
        if stopwords is not None and t in stopwords:
            pos += 1
            continue
        terms.append(t)
        positions.append(pos)
        starts.append(m.start())
        ends.append(m.end())
        pos += 1
    return terms, positions, starts, ends, len(terms)


_WS_TOKEN = re.compile(r"\S+")


def ws_tokenize_offsets(
    text: str,
    lowercase: bool = True,
    stopwords: frozenset[str] | None = None,
) -> tuple[list[str], list[int], list[int], list[int], int]:
    """Whitespace tokenizer with character offsets (the OFFSETS posting
    stream of the reference's interval offset tests)."""
    if text is None:
        return [], [], [], [], 0
    terms: list[str] = []
    positions: list[int] = []
    starts: list[int] = []
    ends: list[int] = []
    pos = 0
    for m in _WS_TOKEN.finditer(text):
        tok = m.group(0)
        if len(tok) > MAX_TOKEN_LENGTH:
            continue
        t = tok.lower() if lowercase else tok
        if stopwords is not None and t in stopwords:
            pos += 1
            continue
        terms.append(t)
        positions.append(pos)
        starts.append(m.start())
        ends.append(m.end())
        pos += 1
    return terms, positions, starts, ends, len(terms)


_LETTER_SPLIT = re.compile(r"[^A-Za-z]+")


def keyword_tokenize(text: str) -> tuple[list[str], list[int], int]:
    """KeywordAnalyzer (lucene/analysis/common/src/java/org/apache/lucene/
    analysis/core/KeywordAnalyzer.java:28): the ENTIRE input as one token,
    verbatim — id/zipcode-style fields."""
    if not text:
        return [], [], 0
    return [text], [0], 1


def letter_tokenize(
    text: str,
    lowercase: bool = True,
    stopwords: frozenset[str] | None = None,
) -> tuple[list[str], list[int], int]:
    """LetterTokenizer chain (core/LetterTokenizer.java:36 — maximal runs of
    letters): SimpleAnalyzer = letter + lowercase (SimpleAnalyzer.java:31);
    StopAnalyzer adds the english stop set (StopAnalyzer.java:51-55)."""
    if text is None:
        return [], [], 0
    return _analyze(_LETTER_SPLIT.split(text), lowercase, stopwords)


# Representative stop sets for two more language chains — the structural
# analog of the reference's per-language analyzers (FrenchAnalyzer.java /
# GermanAnalyzer.java: tokenizer -> lowercase -> language stop set); sets
# are common-knowledge function words, extensible via register_analyzer.
FRENCH_STOP_WORDS = frozenset(
    "au aux avec ce ces dans de des du elle en et eux il je la le les leur "
    "lui ma mais me même mes moi mon ne nos notre nous on ou par pas pour "
    "qu que qui sa se ses son sur ta te tes toi ton tu un une vos votre "
    "vous".split()
)
GERMAN_STOP_WORDS = frozenset(
    "aber als am an auch auf aus bei bin bis bist da damit das dass dein "
    "deine dem den der des dessen die dies diese dir du er es für hatte "
    "ich ihr ihre im in ist ja kann mein meine mit muss nach nicht noch "
    "nun oder sein seine sich sie sind so und uns unser unter vom von vor "
    "war was weiter wie wieder wir wird zu zum zur".split()
)

ANALYZERS = {
    "code": code_tokenize,
    "code_stop": lambda s: code_tokenize(s, ENGLISH_STOP_WORDS),
    "ws": ws_tokenize,
    "keyword": keyword_tokenize,
    "simple": letter_tokenize,
    "stop": lambda s: letter_tokenize(s, True, ENGLISH_STOP_WORDS),
    "fr": lambda s: letter_tokenize(s, True, FRENCH_STOP_WORDS),
    "de": lambda s: letter_tokenize(s, True, GERMAN_STOP_WORDS),
}


def register_analyzer(name: str, fn, offsets_fn=None) -> None:
    """Custom-analyzer extension point (the Analyzer SPI role): fn maps
    text -> (terms, positions, doclen); optional offsets_fn additionally
    returns character (starts, ends) for the OFFSETS posting stream."""
    ANALYZERS[name] = fn
    if offsets_fn is not None:
        OFFSET_ANALYZERS[name] = offsets_fn

OFFSET_ANALYZERS = {
    "code": code_tokenize_offsets,
    "code_stop": lambda s: code_tokenize_offsets(s, ENGLISH_STOP_WORDS),
    "ws": ws_tokenize_offsets,
}


def tokenize_series(texts, analyzer: str = "code"):
    """pandas.Series[str] -> (Series[list[str]], Series[list[int]], Series[int]).

    Vectorized entry point for pandas UDFs: one Python call per Arrow batch.
    """
    import pandas as pd

    fn = ANALYZERS[analyzer]
    terms_col, pos_col, len_col = [], [], []
    for t in texts:
        terms, positions, doclen = fn(t)
        terms_col.append(terms)
        pos_col.append(positions)
        len_col.append(doclen)
    return pd.Series(terms_col), pd.Series(pos_col), pd.Series(len_col)


# ------------------------------------------------------------------ batched
# Vectorized whole-batch tokenizer: the DefaultIndexingChain invert loop
# (DefaultIndexingChain.java:561-637) re-expressed as numpy array ops over
# ONE byte buffer per Arrow batch — no per-document Python call in the
# build hot path.  The token-character class of code_tokenize
# ([A-Za-z0-9_]) is pure ASCII, so utf-8 byte runs of token characters are
# exactly the str-domain regex tokens (every byte of a non-ASCII character
# is >= 0x80, i.e. a separator byte), and byte length == char length.

import numpy as _vnp  # noqa: E402

_TOKEN_BYTE = _vnp.zeros(256, dtype=bool)
for _r in (range(48, 58), range(65, 91), range(97, 123), (95,)):
    _TOKEN_BYTE[list(_r)] = True
# LetterTokenizer class ([A-Za-z] — core/LetterTokenizer.java:36).  Pure
# ASCII like the scalar regex [^A-Za-z]+: every byte of a non-ASCII char is
# >= 0x80 and therefore a separator in BOTH domains, so byte runs == the
# str-domain regex tokens for the letter chains too.
_LETTER_BYTE = _vnp.zeros(256, dtype=bool)
for _r in (range(65, 91), range(97, 123)):
    _LETTER_BYTE[list(_r)] = True
_LOWER_MAP = _vnp.arange(256, dtype=_vnp.uint8)
_LOWER_MAP[65:91] += 32
_IDENT_MAP = _vnp.arange(256, dtype=_vnp.uint8)

# char-domain whitespace LUT — exactly the codepoints `re` counts as \s in
# str mode (scalar ws_tokenize splits on \s+), so the char-domain fast path
# and the scalar tokenizer agree on every unicode whitespace character.
_WS_CODEPOINTS = (
    list(range(0x09, 0x0E)) + list(range(0x1C, 0x21)) + [0x85, 0xA0, 0x1680]
    + list(range(0x2000, 0x200B)) + [0x2028, 0x2029, 0x202F, 0x205F, 0x3000]
)
_WS_LUT = _vnp.zeros(0x3001, dtype=bool)
_WS_LUT[_WS_CODEPOINTS] = True


def _stem_dictionary(terms):
    """PorterStemFilter as a DICTIONARY pass: stem each distinct term once
    (vocabulary-bounded Python) and scatter back — never per token.
    pd.factorize is hash-based (no O(n log n) string sort)."""
    from .porter import porter_stem

    if terms.size == 0:
        return terms
    import pandas as _pd

    inv, uniq = _pd.factorize(terms)
    stemmed = _vnp.asarray([porter_stem(t) for t in uniq.tolist()], dtype=object)
    return stemmed[inv]


# Analyzers the batched fast path reproduces exactly — every built-in chain.
# Spec: (domain, token-class LUT, lowercase, stopwords, term-dict post-pass).
# "byte": LUT over utf-8 bytes (token classes are pure ASCII, so byte runs
# == char runs); "char": LUT over codepoints (ws needs unicode whitespace);
# "keyword": whole value as one token.
_FLAT_FAST = {
    "code": ("byte", _TOKEN_BYTE, True, None, None),
    "code_stop": ("byte", _TOKEN_BYTE, True, ENGLISH_STOP_WORDS, None),
    "simple": ("byte", _LETTER_BYTE, True, None, None),
    "stop": ("byte", _LETTER_BYTE, True, ENGLISH_STOP_WORDS, None),
    "fr": ("byte", _LETTER_BYTE, True, FRENCH_STOP_WORDS, None),
    "de": ("byte", _LETTER_BYTE, True, GERMAN_STOP_WORDS, None),
    "en_stem": ("byte", _TOKEN_BYTE, True, ENGLISH_STOP_WORDS, _stem_dictionary),
    "ws": ("char", _WS_LUT, False, None, None),
    "keyword": ("keyword", None, False, None, None),
}


def _flat_fallback(texts, fn, keep_offsets: bool):
    """Generic per-doc loop producing the same flat-array shape.  `fn` is a
    resolved scalar analyzer (resolve on the DRIVER — registry entries added
    via register_analyzer are not present in executor workers)."""
    terms_all: list[str] = []
    doc_idx_parts, pos_parts, s_parts, e_parts = [], [], [], []
    doclens = _vnp.zeros(len(texts), dtype=_vnp.int64)
    for i, t in enumerate(texts):
        out = fn(t)
        if keep_offsets:
            terms, positions, starts, ends, doclen = out
            s_parts.append(_vnp.asarray(starts, dtype=_vnp.int64))
            e_parts.append(_vnp.asarray(ends, dtype=_vnp.int64))
        else:
            terms, positions, doclen = out
        terms_all.extend(terms)
        pos_parts.append(_vnp.asarray(positions, dtype=_vnp.int64))
        doc_idx_parts.append(_vnp.full(len(terms), i, dtype=_vnp.int64))
        doclens[i] = doclen
    cat = lambda parts: (  # noqa: E731
        _vnp.concatenate(parts) if parts else _vnp.zeros(0, dtype=_vnp.int64)
    )
    flat = {
        "doc_idx": cat(doc_idx_parts),
        "terms": _vnp.asarray(terms_all, dtype=object),
        "positions": cat(pos_parts),
        "doclens": doclens,
    }
    if keep_offsets:
        flat["starts"], flat["ends"] = cat(s_parts), cat(e_parts)
    return flat


def tokenize_flat(texts, analyzer: str = "code", keep_offsets: bool = False):
    """Tokenize a whole batch of texts into FLAT arrays (one buffer pass).

    Returns a dict:
      doc_idx   int64[n_tok]  index into `texts` per emitted token (sorted)
      terms     object[n_tok] emitted (lowercased, post-stop) terms
      positions int64[n_tok]  pre-stop position (stop removal leaves holes)
      doclens   int64[n_doc]  emitted-token count per text
      starts/ends int64[n_tok] doc-relative CHAR offsets (keep_offsets only)

    Fast path ("code"/"code_stop"): utf-8 encode each text (C), join into
    one byte buffer, LUT-classify token bytes, diff-detect runs, blank
    separators to spaces and recover every token with a single C-level
    ``bytes.split()`` — zero per-token and zero per-doc Python in the loop
    body.  Other analyzers fall back to the per-doc chain (identical
    output shape).  Equivalence with the scalar analyzers is pinned by
    tests/test_analyzers_core.py.
    """
    n_docs = len(texts)
    if analyzer in _CHAR_FILTER_CHAINS:
        cf, base, stop = _CHAR_FILTER_CHAINS[analyzer]
        return _char_filter_flat(texts, cf, base, stop, keep_offsets)
    if analyzer in _CUSTOM_FLAT:
        return _CUSTOM_FLAT[analyzer](texts, keep_offsets)
    if analyzer in _SHINGLE_CHAINS:
        base, stop, params = _SHINGLE_CHAINS[analyzer]
        return _shingle_flat(texts, base, stop, params, keep_offsets)
    if analyzer in _SYN_CHAINS:
        base, syn_map, stop = _SYN_CHAINS[analyzer]
        return _synonym_flat(texts, base, syn_map, stop, keep_offsets)
    if analyzer not in _FLAT_FAST:
        fn = (OFFSET_ANALYZERS if keep_offsets else ANALYZERS)[analyzer]
        return _flat_fallback(texts, fn, keep_offsets)
    domain, lut, lowercase, stopwords, post = _FLAT_FAST[analyzer]
    if analyzer == "ws" and keep_offsets:
        lowercase = True  # ws_tokenize_offsets' historic default
    empty = {
        "doc_idx": _vnp.zeros(0, dtype=_vnp.int64),
        "terms": _vnp.zeros(0, dtype=object),
        "positions": _vnp.zeros(0, dtype=_vnp.int64),
        "doclens": _vnp.zeros(n_docs, dtype=_vnp.int64),
    }
    if keep_offsets:
        empty["starts"] = empty["ends"] = _vnp.zeros(0, dtype=_vnp.int64)
    if n_docs == 0:
        return empty

    if domain == "keyword":
        # KeywordAnalyzer: whole value = one token, verbatim, no cap
        vals = _vnp.asarray(
            [t if isinstance(t, str) else "" for t in texts], dtype=object
        )
        nz = _vnp.fromiter((len(v) > 0 for v in vals), dtype=bool, count=n_docs)
        doc_idx = _vnp.flatnonzero(nz)
        flat = {
            "doc_idx": doc_idx,
            "terms": vals[doc_idx],
            "positions": _vnp.zeros(doc_idx.size, dtype=_vnp.int64),
            "doclens": nz.astype(_vnp.int64),
        }
        if keep_offsets:
            flat["starts"] = _vnp.zeros(doc_idx.size, dtype=_vnp.int64)
            flat["ends"] = _vnp.fromiter(
                (len(v) for v in vals[doc_idx]), dtype=_vnp.int64, count=doc_idx.size
            )
        return flat

    if domain == "byte":
        enc = [
            (t if isinstance(t, str) else "").encode("utf-8", "replace") for t in texts
        ]
        blens = _vnp.fromiter((len(b) for b in enc), dtype=_vnp.int64, count=n_docs)
        # doc i occupies buf[doc_off[i] : doc_off[i] + blens[i]]; 1-byte sep
        doc_off = _vnp.zeros(n_docs, dtype=_vnp.int64)
        _vnp.cumsum(blens[:-1] + 1, out=doc_off[1:])
        buf = b"\n".join(enc)
        if not buf:
            return empty
        arr = _vnp.frombuffer(buf, dtype=_vnp.uint8)
        mask = lut[arr]
    else:  # char domain (ws): unicode whitespace needs codepoint classes
        strs = [t if isinstance(t, str) else "" for t in texts]
        clens = _vnp.fromiter((len(s) for s in strs), dtype=_vnp.int64, count=n_docs)
        doc_off = _vnp.zeros(n_docs, dtype=_vnp.int64)
        _vnp.cumsum(clens[:-1] + 1, out=doc_off[1:])
        joined = "\n".join(strs)
        if not joined:
            return empty
        arr = _vnp.frombuffer(joined.encode("utf-32-le"), dtype=_vnp.uint32)
        sep = _vnp.zeros(arr.size, dtype=bool)
        small = arr < lut.size
        sep[small] = lut[arr[small]]
        mask = ~sep

    m8 = mask.view(_vnp.int8)
    d = m8[1:].astype(_vnp.int8) - m8[:-1]
    starts = _vnp.flatnonzero(d == 1) + 1
    ends = _vnp.flatnonzero(d == -1) + 1
    if mask[0]:
        starts = _vnp.concatenate(([0], starts))
    if mask[-1]:
        ends = _vnp.concatenate((ends, [arr.size]))
    if starts.size == 0:
        return empty
    if domain == "byte":
        out = (_LOWER_MAP if lowercase else _IDENT_MAP)[arr]
        out[~mask] = 32
    else:
        out = arr.copy()
        out[~mask] = 32
    # maxTokenLength cap (StandardAnalyzer.java:39): oversized tokens are
    # dropped WITHOUT a position increment — blank them before split
    keep = (ends - starts) <= MAX_TOKEN_LENGTH
    if not keep.all():
        for s, e in zip(starts[~keep], ends[~keep]):
            out[s:e] = 32
        starts, ends = starts[keep], ends[keep]
        if starts.size == 0:
            return empty
    if domain == "byte":
        terms = _vnp.asarray(out.tobytes().decode("ascii").split(), dtype=object)
    else:
        terms = _vnp.asarray(
            out.tobytes().decode("utf-32-le").split(), dtype=object
        )
        if terms.size != starts.size:
            # a codepoint str.split() treats as whitespace but the \s LUT
            # does not (or vice versa) — bail to the exact scalar path
            fn = (OFFSET_ANALYZERS if keep_offsets else ANALYZERS)[analyzer]
            return _flat_fallback(texts, fn, keep_offsets)
    doc_idx = _vnp.searchsorted(doc_off, starts, side="right") - 1
    first_tok = _vnp.searchsorted(doc_idx, _vnp.arange(n_docs))
    positions = _vnp.arange(doc_idx.size, dtype=_vnp.int64) - first_tok[doc_idx]
    if keep_offsets:
        if domain == "byte":
            # byte -> char offsets: subtract utf-8 continuation bytes so far
            cont = ((arr & 0xC0) == 0x80).astype(_vnp.int64)
            ncont = _vnp.zeros(arr.size + 1, dtype=_vnp.int64)
            _vnp.cumsum(cont, out=ncont[1:])
            doc_char_off = doc_off - ncont[doc_off]
            s_char = starts - ncont[starts] - doc_char_off[doc_idx]
            e_char = ends - ncont[ends] - doc_char_off[doc_idx]
        else:  # char domain offsets are already char-relative
            s_char = starts - doc_off[doc_idx]
            e_char = ends - doc_off[doc_idx]
    if domain == "char" and lowercase:
        # per-token C-level lower (str.lower can change char counts for a
        # handful of codepoints, so it must run AFTER offsets are fixed —
        # same order as the scalar chain)
        import pandas as _pd

        terms = _pd.Index(terms).str.lower().to_numpy(dtype=object)
    if stopwords is not None:
        import pandas as _pd

        drop = _pd.Index(terms).isin(list(stopwords))
        emit = ~drop
        terms, doc_idx, positions = terms[emit], doc_idx[emit], positions[emit]
        if keep_offsets:
            s_char, e_char = s_char[emit], e_char[emit]
    if post is not None:
        # dictionary-level post pass (e.g. Porter: stem distinct terms once)
        terms = post(terms)
    flat = {
        "doc_idx": doc_idx,
        "terms": terms,
        "positions": positions,
        "doclens": _vnp.bincount(doc_idx, minlength=n_docs).astype(_vnp.int64),
    }
    if keep_offsets:
        flat["starts"], flat["ends"] = s_char, e_char
    return flat


# ---------------------------------------------------------------- synonyms
# Synonym analyzer chains: tokenize -> lowercase -> SynonymFilter -> stop.
# The synonym pass runs BEFORE stop filtering (SynonymFilter.java:44-46) on
# the consecutive-position stream; stop removal afterwards leaves the usual
# holes; doclen becomes the discountOverlaps norm length (count of distinct
# positions — BM25Similarity.java:55-57,138-141).
_SYN_CHAINS: dict[str, tuple[str, object, frozenset[str] | None]] = {}


def register_synonym_analyzer(
    name: str,
    syn_map,
    base: str = "code",
    stopwords: frozenset[str] | None = None,
) -> None:
    """Register an analyzer chain with a SynonymFilter stage.

    `base` names a NO-STOP tokenizer ("code", "ws", "simple", ...) — the
    synonym filter needs consecutive input positions, so stopwords are
    applied after it via `stopwords` (StopFilter placement per the
    SynonymFilter javadoc).  Registered chains ride the batched flat path
    (including the byte-domain fast base) — no per-doc Python."""
    if base in _SYN_CHAINS:
        raise ValueError("chaining synonym analyzers is not supported")
    _SYN_CHAINS[name] = (base, syn_map, stopwords)

    def _scalar(text: str, _n=name):
        flat = _synonym_flat(
            [text] if text is not None else [""], *_SYN_CHAINS[_n], False
        )
        return (
            flat["terms"].tolist(),
            flat["positions"].tolist(),
            int(flat["doclens"][0]),
        )

    def _scalar_off(text: str, _n=name):
        flat = _synonym_flat(
            [text] if text is not None else [""], *_SYN_CHAINS[_n], True
        )
        return (
            flat["terms"].tolist(),
            flat["positions"].tolist(),
            flat["starts"].tolist(),
            flat["ends"].tolist(),
            int(flat["doclens"][0]),
        )

    register_analyzer(name, _scalar, _scalar_off)


def _require_dense_positions(flat, n_docs: int, base: str, chain: str) -> None:
    """Synonym/shingle passes REQUIRE consecutive per-doc positions (slot ==
    position; SynonymFilter.java:44-46 makes the same demand of its input).
    A base chain with stopword holes would silently mis-stack synonym
    outputs / join shingles across removed stopwords — fail loudly."""
    doc_idx, pos = flat["doc_idx"], flat["positions"]
    if pos.size:
        first = _vnp.searchsorted(doc_idx, _vnp.arange(n_docs))
        expect = _vnp.arange(doc_idx.size, dtype=_vnp.int64) - first[doc_idx]
        if not _vnp.array_equal(pos, expect):
            raise ValueError(
                f"{chain} base analyzer {base!r} emits position holes; use a "
                f"no-stop base and pass stopwords= to the {chain} chain"
            )


def _stop_filter_flat(flat: dict, stopwords) -> dict:
    """StopFilter over flat arrays: drop stopword rows across every
    per-token stream, positions untouched (holes preserved)."""
    if stopwords:
        import pandas as _pd

        emit = ~_pd.Index(flat["terms"]).isin(list(stopwords))
        for k in ("doc_idx", "terms", "positions", "starts", "ends"):
            if k in flat:
                flat[k] = flat[k][emit]
    return flat


def _synonym_flat(texts, base: str, syn_map, stopwords, keep_offsets: bool):
    """tokenize(base, no stop) -> synonym_flat_pass -> stop holes -> doclens."""
    from .synonyms import discounted_lengths, synonym_flat_pass

    n_docs = len(texts)
    flat = tokenize_flat(texts, base, keep_offsets)
    _require_dense_positions(flat, n_docs, base, "synonym")
    flat.pop("doclens", None)
    flat = synonym_flat_pass(flat, syn_map)
    flat = _stop_filter_flat(flat, stopwords)
    flat["doclens"] = discounted_lengths(flat["doc_idx"], flat["positions"], n_docs)
    return flat


# ---------------------------------------------------------------- shingles
# ShingleFilter chains: tokenize -> lowercase -> shingles (stop holes become
# "_" filler slots inside shingles — ShingleFilter.java:52-55).
_SHINGLE_CHAINS: dict[str, tuple[str, frozenset[str] | None, dict]] = {}


def register_shingle_analyzer(
    name: str,
    base: str = "code",
    stopwords: frozenset[str] | None = None,
    **params,
) -> None:
    """Register a ShingleFilter chain (token n-grams — the phrase-speed
    companion of NGramPhraseQuery).  `params` forwards min_size / max_size /
    output_unigrams / separator / filler / output_unigrams_if_no_shingles to
    analysis.shingles.shingle_flat_pass."""
    if base in _SYN_CHAINS or base in _SHINGLE_CHAINS:
        raise ValueError("shingle base must be a plain tokenizer chain")
    _SHINGLE_CHAINS[name] = (base, stopwords, params)

    def _scalar(text: str, _n=name):
        flat = _shingle_flat([text] if text is not None else [""], *_SHINGLE_CHAINS[_n], False)
        return (
            flat["terms"].tolist(),
            flat["positions"].tolist(),
            int(flat["doclens"][0]),
        )

    def _scalar_off(text: str, _n=name):
        flat = _shingle_flat([text] if text is not None else [""], *_SHINGLE_CHAINS[_n], True)
        return (
            flat["terms"].tolist(),
            flat["positions"].tolist(),
            flat["starts"].tolist(),
            flat["ends"].tolist(),
            int(flat["doclens"][0]),
        )

    register_analyzer(name, _scalar, _scalar_off)


def _shingle_flat(texts, base: str, stopwords, params: dict, keep_offsets: bool):
    from .shingles import shingle_flat_pass

    flat = tokenize_flat(texts, base, keep_offsets)
    _require_dense_positions(flat, len(texts), base, "shingle")
    final_offs = None
    if keep_offsets:
        final_offs = _vnp.fromiter(
            (len(t) if isinstance(t, str) else 0 for t in texts),
            dtype=_vnp.int64,
            count=len(texts),
        )
    return shingle_flat_pass(
        flat, stopwords=stopwords, doc_final_offsets=final_offs, **params
    )


# ----------------------------------------------------------------- folding
# ASCIIFoldingFilter chains are an INSTANCE of the generic char-filter SPI
# below: fold Latin accents to ASCII ahead of the base tokenizer
# (analysis/folding.py), stop set folded at registration so "même" still
# stops after becoming "meme".


def register_folding_analyzer(
    name: str,
    base: str = "simple",
    stopwords: frozenset[str] | None = None,
) -> None:
    """Register a base-tokenizer chain with ASCII folding (ASCIIFolding
    Filter.java:60).  `base` is a no-stop tokenizer; `stopwords` are folded
    and applied post-tokenize.  Offsets refer to the FOLDED text (folding
    can lengthen, ß->ss)."""
    from .folding import fold_ascii

    folded_stop = (
        frozenset(fold_ascii(w) for w in stopwords) if stopwords else None
    )
    register_char_filter_analyzer(name, fold_ascii, base, folded_stop)


# ------------------------------------------------------ char-filter chains
# Generic CharFilter SPI (the Analyzer.initReader extension point): a
# text -> text function applied BEFORE the base tokenizer.  ASCII folding
# and HTML stripping are instances; users plug any str -> str callable.
_CHAR_FILTER_CHAINS: dict[str, tuple[object, str, frozenset[str] | None]] = {}


def register_char_filter_analyzer(
    name: str,
    char_filter,
    base: str = "code",
    stopwords: frozenset[str] | None = None,
) -> None:
    """Register base tokenizer chain preceded by a CHAR FILTER
    (charfilter/BaseCharFilter.java role): `char_filter(text) -> text`
    runs per document (C-level string ops expected) ahead of tokenize;
    `stopwords` apply post-tokenize.  Offsets refer to the FILTERED
    text."""
    if base in _CHAR_FILTER_CHAINS or base in _SYN_CHAINS or base in _SHINGLE_CHAINS:
        raise ValueError("char-filter base must be a plain tokenizer chain")
    _CHAR_FILTER_CHAINS[name] = (char_filter, base, stopwords)

    def _scalar(text: str, _n=name):
        flat = _char_filter_flat(
            [text] if text is not None else [""], *_CHAR_FILTER_CHAINS[_n], False
        )
        return (
            flat["terms"].tolist(),
            flat["positions"].tolist(),
            int(flat["doclens"][0]),
        )

    def _scalar_off(text: str, _n=name):
        # offsets refer to the FILTERED text (char filters may change length)
        flat = _char_filter_flat(
            [text] if text is not None else [""], *_CHAR_FILTER_CHAINS[_n], True
        )
        return (
            flat["terms"].tolist(),
            flat["positions"].tolist(),
            flat["starts"].tolist(),
            flat["ends"].tolist(),
            int(flat["doclens"][0]),
        )

    register_analyzer(name, _scalar, _scalar_off)


def _char_filter_flat(texts, char_filter, base: str, stopwords, keep_offsets: bool):
    filtered = [char_filter(t) if isinstance(t, str) else t for t in texts]
    flat = tokenize_flat(filtered, base, keep_offsets)
    if stopwords:
        flat = _stop_filter_flat(flat, stopwords)
        flat["doclens"] = _vnp.bincount(
            flat["doc_idx"], minlength=len(texts)
        ).astype(_vnp.int64)
    return flat


def register_html_strip_analyzer(
    name: str,
    base: str = "code",
    stopwords: frozenset[str] | None = None,
) -> None:
    """HTMLStripCharFilter chain (charfilter/HTMLStripCharFilter.java —
    see analysis/htmlstrip.py): markup stripped + entities decoded before
    tokenization."""
    from .htmlstrip import strip_html

    register_char_filter_analyzer(name, strip_html, base, stopwords)


# ----------------------------------------------------- small token filters


def register_length_filter_analyzer(
    name: str,
    base: str = "code",
    min_len: int = 0,
    max_len: int = 10**9,
    max_count: int | None = None,
) -> None:
    """LengthFilter + LimitTokenCountFilter chain
    (miscellaneous/LengthFilter.java:30 — drop tokens outside
    [min_len, max_len], position increments PRESERVED i.e. holes, like any
    FilteringTokenFilter; miscellaneous/LimitTokenCountFilter.java:28 —
    keep only the first `max_count` tokens per document, the classic
    huge-document indexing guard).  Vectorized: one length mask + one
    per-doc rank mask over the flat arrays."""

    def _fn(texts, keep_offsets, _b=base, _mi=min_len, _ma=max_len, _mc=max_count):
        import pandas as _pd

        flat = tokenize_flat(texts, _b, keep_offsets)
        terms = flat["terms"]
        if terms.size:
            lens = _pd.Index(terms).str.len().to_numpy(dtype=_vnp.int64)
            keep = (lens >= _mi) & (lens <= _ma)
            if _mc is not None:
                # LimitTokenCount runs DOWNSTREAM of LengthFilter: it
                # counts the tokens that survived the length window
                di = flat["doc_idx"]
                # clip: trailing empty docs point past the last row (their
                # base is never gathered)
                first = _vnp.minimum(
                    _vnp.searchsorted(di, _vnp.arange(len(texts))), di.size - 1
                )
                csum = _vnp.cumsum(keep)
                base = csum[first] - keep[first]
                kept_rank = csum - 1 - base[di]
                keep &= kept_rank < _mc
            for k in ("doc_idx", "terms", "positions", "starts", "ends"):
                if k in flat:
                    flat[k] = flat[k][keep]
        flat["doclens"] = _vnp.bincount(
            flat["doc_idx"], minlength=len(texts)
        ).astype(_vnp.int64)
        return flat

    register_flat_analyzer(name, _fn)


# ---------------------------------------------------------- custom chains
# Generic registry for fully-custom BATCHED chains: fn(texts, keep_offsets)
# -> flat dict.  Used by the n-gram tokenizers (analysis/ngrams.py) and
# open to users who want a flat-path analyzer without the scalar detour.
_CUSTOM_FLAT: dict[str, object] = {}


def register_flat_analyzer(name: str, flat_fn, offsets: bool = True) -> None:
    """Register a batched flat analyzer: flat_fn(texts, keep_offsets) must
    return the tokenize_flat dict shape (doc_idx/terms/positions/doclens
    [+starts/ends]).  A scalar ANALYZERS twin is derived automatically;
    pass offsets=False for chains that cannot produce starts/ends (no
    OFFSET_ANALYZERS twin is registered, so offsets consumers fail with a
    clear KeyError on the NAME instead of a missing dict key)."""
    _CUSTOM_FLAT[name] = flat_fn

    def _scalar(text: str, _n=name):
        flat = _CUSTOM_FLAT[_n]([text] if text is not None else [""], False)
        return (
            flat["terms"].tolist(),
            flat["positions"].tolist(),
            int(flat["doclens"][0]),
        )

    def _scalar_off(text: str, _n=name):
        flat = _CUSTOM_FLAT[_n]([text] if text is not None else [""], True)
        return (
            flat["terms"].tolist(),
            flat["positions"].tolist(),
            flat["starts"].tolist(),
            flat["ends"].tolist(),
            int(flat["doclens"][0]),
        )

    register_analyzer(name, _scalar, _scalar_off if offsets else None)


def register_ngram_analyzer(name: str, min_gram: int = 1, max_gram: int = 2) -> None:
    """NGramTokenizer chain (NGramTokenizer.java:58, 4.4+ order): char
    n-grams of the raw text, one position per gram — the char-level
    producer NGramPhraseQuery pairs with."""
    from .ngrams import ngram_flat

    def _fn(texts, keep_offsets, _mi=min_gram, _ma=max_gram):
        flat = ngram_flat(texts, _mi, _ma)
        if not keep_offsets:
            flat = {k: v for k, v in flat.items() if k not in ("starts", "ends")}
        return flat

    register_flat_analyzer(name, _fn)


def register_common_grams_analyzer(
    name: str,
    common_words,
    base: str = "code",
    query_mode: bool = False,
    separator: str = "_",
) -> None:
    """CommonGramsFilter chain (commongrams/CommonGramsFilter.java:48):
    common-word-adjacent bigrams stacked at the first token's position —
    the stopword-phrase speed trick pairing with CommonTermsQuery.
    query_mode=True gives the CommonGramsQueryFilter output (one token per
    position, bigrams replacing their unigrams)."""
    from .shingles import common_grams_flat_pass

    cw = frozenset(common_words)

    def _fn(texts, keep_offsets, _b=base, _cw=cw, _q=query_mode, _s=separator):
        flat = tokenize_flat(texts, _b, False)  # offsets n/a for grams
        _require_dense_positions(flat, len(texts), _b, "common-grams")
        return common_grams_flat_pass(flat, _cw, separator=_s, query_mode=_q)

    register_flat_analyzer(name, _fn, offsets=False)


def register_edge_ngram_analyzer(
    name: str,
    base: str = "code",
    min_gram: int = 1,
    max_gram: int = 1,
    stopwords: frozenset[str] | None = None,
) -> None:
    """EdgeNGramTokenFilter chain (EdgeNGramTokenFilter.java:35): leading
    grams of each base token stacked at the token's position — index-time
    autocomplete (prefix search without wildcard expansion).  `stopwords`
    are applied BEFORE gramming (holes preserved)."""
    from .ngrams import edge_ngram_flat_pass

    def _fn(texts, keep_offsets, _b=base, _mi=min_gram, _ma=max_gram, _sw=stopwords):
        flat = _stop_filter_flat(tokenize_flat(texts, _b, keep_offsets), _sw)
        return edge_ngram_flat_pass(flat, _mi, _ma)

    register_flat_analyzer(name, _fn)


def flat_tokenizer(analyzer: str = "code", keep_offsets: bool = False):
    """Resolve a batched flat tokenizer callable ON THE DRIVER so analyzers
    added via register_analyzer() travel inside the task closure (executor
    workers never see driver-side registry mutations)."""
    if analyzer in _CHAR_FILTER_CHAINS:
        cf, base, stop = _CHAR_FILTER_CHAINS[analyzer]
        return lambda texts: _char_filter_flat(texts, cf, base, stop, keep_offsets)
    if analyzer in _CUSTOM_FLAT:
        fn = _CUSTOM_FLAT[analyzer]
        return lambda texts: fn(texts, keep_offsets)
    if analyzer in _SHINGLE_CHAINS:
        base, stop, params = _SHINGLE_CHAINS[analyzer]
        return lambda texts: _shingle_flat(texts, base, stop, params, keep_offsets)
    if analyzer in _SYN_CHAINS:
        base, syn_map, stop = _SYN_CHAINS[analyzer]
        return lambda texts: _synonym_flat(texts, base, syn_map, stop, keep_offsets)
    if analyzer in _FLAT_FAST:
        return lambda texts: tokenize_flat(texts, analyzer, keep_offsets)
    fn = (OFFSET_ANALYZERS if keep_offsets else ANALYZERS)[analyzer]
    return lambda texts: _flat_fallback(texts, fn, keep_offsets)


def en_stem_tokenize(text: str) -> tuple[list[str], list[int], int]:
    """EnglishAnalyzer-style chain (lucene/analysis/common/.../en/
    EnglishAnalyzer.java): tokenize -> lowercase -> stop (position holes)
    -> PorterStemFilter.  Stemming happens after stop removal, like the
    reference pipeline order."""
    from .porter import porter_stem

    terms, positions, doclen = code_tokenize(text, ENGLISH_STOP_WORDS)
    return [porter_stem(t) for t in terms], positions, doclen


ANALYZERS["en_stem"] = en_stem_tokenize

# Folded variants of the language chains (ASCIIFoldingFilter placement):
# accent-insensitive matching — "café" indexes as "cafe", "même" still stops.
register_folding_analyzer("fr_fold", base="simple", stopwords=FRENCH_STOP_WORDS)
register_folding_analyzer("de_fold", base="simple", stopwords=GERMAN_STOP_WORDS)


def _stem_keep_flat(texts, keep_offsets):
    """KeywordRepeatFilter -> PorterStemFilter -> RemoveDuplicates chain
    (miscellaneous/KeywordRepeatFilter.java:29 + RemoveDuplicatesTokenFilter
    .java:27): every token indexes BOTH its original form and its stem at
    the SAME position (stem injected with posInc=0, dropped when identical)
    — exact-match queries stay exact while stemmed queries still recall."""
    flat = tokenize_flat(texts, "code_stop", keep_offsets)
    terms = flat["terms"]
    stemmed = _stem_dictionary(terms)
    if terms.size == 0:
        return flat
    diff = _vnp.fromiter(
        (a != b for a, b in zip(terms, stemmed)), dtype=bool, count=terms.size
    )
    extra = _vnp.flatnonzero(diff)
    base_idx = _vnp.arange(terms.size, dtype=_vnp.int64)
    comb = _vnp.concatenate((base_idx, extra))
    ordk = _vnp.concatenate(
        (_vnp.zeros(terms.size, dtype=_vnp.int64), _vnp.ones(extra.size, dtype=_vnp.int64))
    )
    order = _vnp.lexsort((ordk, comb))
    gather = comb[order]
    out = {
        "doc_idx": flat["doc_idx"][gather],
        "terms": _vnp.concatenate((terms, stemmed[extra]))[order],
        "positions": flat["positions"][gather],
        "doclens": flat["doclens"],  # distinct positions unchanged
    }
    if keep_offsets:
        out["starts"] = flat["starts"][gather]
        out["ends"] = flat["ends"][gather]
    return out


# exact + stemmed at the same position (the KeywordRepeat trick)
register_flat_analyzer("en_stem_keep", _stem_keep_flat)


# ---------------------------------------------- snowball language chains
# Spanish / Italian / Portuguese / Dutch analyzers: unicode-letter tokenize
# -> lowercase -> language stop set -> Snowball stem (the *_stem chains) —
# the reference's per-language analyzer pipelines (es/SpanishAnalyzer role
# etc.) with SnowballFilter.java:53 as the stemming stage
# (analysis/snowball.py).  The letter class must include accented letters,
# so these chains run in the CHAR domain: a codepoint LUT marks separators
# (non-alphabetic) for the BMP through U+3000; codepoints past the LUT are
# treated as letters (exact for every Latin script; approximate only for
# exotic non-letter symbols beyond U+3000).

_UALPHA_SEP = _vnp.ones(0x3001, dtype=bool)
_UALPHA_SEP[[_cp for _cp in range(0x3001) if chr(_cp).isalpha()]] = False


def uletter_tokenize(
    text: str,
    stopwords: frozenset[str] | None = None,
    stem=None,
) -> tuple[list[str], list[int], int]:
    """Scalar twin of the char-domain unicode-letter flat path: maximal
    runs of alphabetic codepoints, lowercase, stop holes, optional stem."""
    if text is None:
        return [], [], 0
    import itertools

    def _is_tok(ch: str) -> bool:
        cp = ord(ch)
        return cp >= 0x3001 or not _UALPHA_SEP[cp]

    raw = ["".join(g) for k, g in itertools.groupby(text, key=_is_tok) if k]
    terms, positions, doclen = _analyze(raw, True, stopwords)
    if stem is not None:
        terms = [stem(t) for t in terms]
    return terms, positions, doclen


def _stem_dict(stem_fn):
    """SnowballFilter as a DICTIONARY pass (the _stem_dictionary pattern,
    generalized): stem each distinct term once per batch, scatter back."""

    def post(terms):
        if terms.size == 0:
            return terms
        import pandas as _pd

        inv, uniq = _pd.factorize(terms)
        return _vnp.asarray(
            [stem_fn(t) for t in uniq.tolist()], dtype=object
        )[inv]

    return post


# Standard snowball stop sets (public function-word lists).
SPANISH_STOP_WORDS = frozenset(
    "de la que el en y a los del se las por un para con no una su al lo "
    "como más pero sus le ya o este sí porque esta entre cuando muy sin "
    "sobre también me hasta hay donde quien desde todo nos durante todos "
    "uno les ni contra otros ese eso ante ellos e esto mí antes algunos "
    "qué unos yo otro otras otra él tanto esa estos mucho quienes nada "
    "muchos cual poco ella estar estas algunas algo nosotros".split()
)
ITALIAN_STOP_WORDS = frozenset(
    "ad al allo ai agli alla alle con col coi da dal dallo dai dagli "
    "dalla dalle di del dello dei degli della delle in nel nello nei "
    "negli nella nelle su sul sullo sui sugli sulla sulle per tra contro "
    "io tu lui lei noi voi loro mio mia miei mie tuo tua tuoi tue suo "
    "sua suoi sue nostro nostra nostri nostre vostro vostra vostri "
    "vostre e è che chi ci anche se come dove ma non più quale quanto "
    "quanti quanta quante quello questo questi qui sono ho ha una uno un".split()
)
PORTUGUESE_STOP_WORDS = frozenset(
    "de a o que e do da em um para é com não uma os no se na por mais as "
    "dos como mas foi ao ele das tem à seu sua ou ser quando muito há "
    "nos já está eu também só pelo pela até isso ela entre era depois "
    "sem mesmo aos ter seus quem nas me esse eles estão você tinha foram "
    "essa num nem suas meu às minha têm numa pelos elas".split()
)
DUTCH_STOP_WORDS = frozenset(
    "de en van ik te dat die in een hij het niet zijn is was op aan met "
    "als voor had er maar om hem dan zou of wat mijn men dit zo door "
    "over ze zich bij ook tot je mij uit der daar haar naar heb hoe "
    "heeft hebben deze u want nog zal me zij nu ge geen omdat iets "
    "worden toch al waren veel meer doen toen moet ben zonder kan hun "
    "dus alles onder ja eens hier wie werd altijd doch wordt wezen "
    "kunnen ons zelf tegen na reeds wil kon niets uw iemand geweest "
    "andere".split()
)

from .snowball import STEMMERS as SNOWBALL_STEMMERS  # noqa: E402

for _lang, _stops in (
    ("es", SPANISH_STOP_WORDS),
    ("it", ITALIAN_STOP_WORDS),
    ("pt", PORTUGUESE_STOP_WORDS),
    ("nl", DUTCH_STOP_WORDS),
):
    _stemf = SNOWBALL_STEMMERS[_lang]
    ANALYZERS[_lang] = lambda s, _st=_stops: uletter_tokenize(s, _st)
    ANALYZERS[f"{_lang}_stem"] = lambda s, _st=_stops, _f=_stemf: uletter_tokenize(
        s, _st, _f
    )
    _FLAT_FAST[_lang] = ("char", _UALPHA_SEP, True, _stops, None)
    _FLAT_FAST[f"{_lang}_stem"] = (
        "char", _UALPHA_SEP, True, _stops, _stem_dict(_stemf),
    )
