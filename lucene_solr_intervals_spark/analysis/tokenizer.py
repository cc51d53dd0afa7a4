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


def en_stem_tokenize(text: str) -> tuple[list[str], list[int], int]:
    """EnglishAnalyzer-style chain (lucene/analysis/common/.../en/
    EnglishAnalyzer.java): tokenize -> lowercase -> stop (position holes)
    -> PorterStemFilter.  Stemming happens after stop removal, like the
    reference pipeline order."""
    from .porter import porter_stem

    terms, positions, doclen = code_tokenize(text, ENGLISH_STOP_WORDS)
    return [porter_stem(t) for t in terms], positions, doclen


ANALYZERS["en_stem"] = en_stem_tokenize
