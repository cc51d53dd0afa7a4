"""Compound-word decomposition (Germanic languages).

Reference roles:
  compound/CompoundWordTokenFilterBase.java:60   original passes through,
      subwords stack at posInc 0 with the ORIGINAL token's offsets
  compound/DictionaryCompoundWordTokenFilter.java:74  brute-force dictionary
      subword scan (every [i, i+j) window, minSubwordSize <= j <=
      maxSubwordSize, onlyLongestMatch keeps the longest per start)
  compound/HyphenationCompoundWordTokenFilter.java:46  decompose() walks
      Liang hyphenation points; parts accepted when in the dictionary
      (with the genitive-'s' one-shorter retry) or unconditionally when no
      dictionary is given
  compound/hyphenation/HyphenationTree.java:315  hyphenate(): class-map
      normalization, exception list, pattern search over '.word.', odd
      interletter values are break points, synthetic 0/len endpoints
  compound/hyphenation/PatternParser.java  classes/exceptions/patterns XML

The hyphenation algorithm itself is Liang's TeX algorithm (public); the
pattern files are standard TeX/FOP hyphenation data supplied by the user
(tests load the reference's Danish test fixture).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

DEFAULT_MIN_WORD_SIZE = 5
DEFAULT_MIN_SUBWORD_SIZE = 2
DEFAULT_MAX_SUBWORD_SIZE = 15


# ------------------------------------------------------------- hyphenation
class HyphenationTree:
    """Liang pattern matcher (HyphenationTree.java role; dict-backed
    instead of a ternary tree — the pattern sets are small and the scan is
    a per-distinct-token dictionary pass, not a hot loop)."""

    def __init__(self):
        self.classmap: dict[str, str] = {}  # char -> normalized char
        # pattern letters -> interletter values (len(letters) + 1 ints)
        self.patterns: dict[str, tuple[int, ...]] = {}
        self.exceptions: dict[str, list[int]] = {}
        self.max_pat = 0

    # ---- building (PatternParser.java callbacks)
    def add_class(self, chargroup: str) -> None:
        if not chargroup:
            return
        norm = chargroup[0]
        for c in chargroup:
            self.classmap[c] = norm

    def add_pattern(self, pattern: str) -> None:
        letters: list[str] = []
        values = [0]
        last_digit = 0
        for ch in pattern:
            if ch.isdigit():
                last_digit = int(ch)
            else:
                letters.append(ch)
                values[-1] = max(values[-1], last_digit)
                values.append(0)
                last_digit = 0
        values[-1] = max(values[-1], last_digit)
        key = "".join(letters)
        self.patterns[key] = tuple(values)
        self.max_pat = max(self.max_pat, len(key))

    def add_exception(self, hyphenated: str) -> None:
        """'as-so-ciate' -> break offsets [2, 4]."""
        parts = hyphenated.split("-")
        word = "".join(parts)
        offs, j = [], 0
        for p in parts[:-1]:
            j += len(p)
            offs.append(j)
        self.exceptions[word] = offs

    @classmethod
    def from_xml(cls, path: str) -> "HyphenationTree":
        """PatternParser.java over the FOP hyphenation-info XML
        (<classes>, <exceptions>, <patterns> whitespace-separated)."""
        tree = cls()
        root = ET.parse(path).getroot()
        for el in root:
            tag = el.tag.lower()
            text = el.text or ""
            if tag == "classes":
                for group in text.split():
                    tree.add_class(group)
            elif tag == "patterns":
                for pat in text.split():
                    tree.add_pattern(pat)
            elif tag == "exceptions":
                for exc in text.split():
                    tree.add_exception(exc)
        return tree

    # ---- matching (HyphenationTree.hyphenate:315)
    def hyphenate(self, word: str, remain: int = 1, push: int = 1) -> list[int] | None:
        """Hyphenation points of `word` as char offsets, including the
        synthetic 0 and len endpoints; None when unhyphenatable."""
        normalized = []
        for ch in word:
            nc = self.classmap.get(ch)
            if nc is None:
                # non-letter character: the reference ignores a leading run
                # and rejects words with interior non-letters; tokens here
                # are already letter runs, so reject outright
                return None
            normalized.append(nc)
        n = len(normalized)
        if n < remain + push:
            return None
        sw = "".join(normalized)
        points: list[int] = []
        if sw in self.exceptions:
            points = [
                j for j in self.exceptions[sw]
                if remain <= j < n - push
            ]
        else:
            padded = "." + sw + "."
            il = [0] * (n + 3)
            mp = self.max_pat
            for i in range(len(padded)):
                # all patterns that start at i (prefix scan up to max len)
                for ln in range(1, min(mp, len(padded) - i) + 1):
                    vals = self.patterns.get(padded[i : i + ln])
                    if vals is None:
                        continue
                    for k, v in enumerate(vals):
                        if i + k < len(il) and v > il[i + k]:
                            il[i + k] = v
            # odd interletter value at il[i+1] => break before letter i
            # (HyphenationTree.java:385-390)
            points = [
                i for i in range(n)
                if (il[i + 1] & 1) == 1 and remain <= i <= n - push
            ]
        if not points:
            return None
        return [0] + points + [n]


# ------------------------------------------------------------- decompose
def _dictionary_parts(
    term: str, dictionary, min_sub: int, max_sub: int, only_longest: bool
) -> list[str]:
    """DictionaryCompoundWordTokenFilter.decompose:74."""
    low = term.lower()
    n = len(low)
    out: list[str] = []
    for i in range(0, n - min_sub + 1):
        longest = None
        for j in range(min_sub, max_sub + 1):
            if i + j > n:
                break
            if low[i : i + j] in dictionary:
                if only_longest:
                    if longest is None or len(longest) < j:
                        longest = term[i : i + j]
                else:
                    out.append(term[i : i + j])
        if only_longest and longest is not None:
            out.append(longest)
    return out


def _hyphenation_parts(
    term: str, tree: HyphenationTree, dictionary, min_sub: int,
    max_sub: int, only_longest: bool,
) -> list[str]:
    """HyphenationCompoundWordTokenFilter.decompose:46 (incl. the
    genitive-'s' one-shorter dictionary retry)."""
    low = term.lower()
    hyp = tree.hyphenate(low, 1, 1)
    if hyp is None:
        return []
    out: list[str] = []
    for i in range(len(hyp)):
        start = hyp[i]
        longest = None
        for j in range(1, len(hyp) - i):
            plen = hyp[i + j] - start
            if plen > max_sub:
                break
            if plen < min_sub:
                continue
            if dictionary is None or low[start : start + plen] in dictionary:
                if only_longest:
                    if longest is None or len(longest) < plen:
                        longest = term[start : start + plen]
                else:
                    out.append(term[start : start + plen])
            elif low[start : start + plen - 1] in dictionary:
                if only_longest:
                    if longest is None or len(longest) < plen - 1:
                        longest = term[start : start + plen - 1]
                else:
                    out.append(term[start : start + plen - 1])
        if only_longest and longest is not None:
            out.append(longest)
    return out


def compound_stream(
    tokens,
    dictionary=None,
    tree: HyphenationTree | None = None,
    min_word: int = DEFAULT_MIN_WORD_SIZE,
    min_sub: int = DEFAULT_MIN_SUBWORD_SIZE,
    max_sub: int = DEFAULT_MAX_SUBWORD_SIZE,
    only_longest: bool = False,
):
    """CompoundWordTokenFilterBase.incrementToken:91: the original token
    always passes through first; decomposed subwords follow at posInc 0
    carrying the ORIGINAL token's offsets."""
    if dictionary is not None:
        dictionary = {w.lower() for w in dictionary}
    for term, pos_inc, start, end in tokens:
        yield (term, pos_inc, start, end)
        if len(term) < min_word:
            continue
        if tree is not None:
            parts = _hyphenation_parts(
                term, tree, dictionary, min_sub, max_sub, only_longest
            )
        elif dictionary is not None:
            parts = _dictionary_parts(
                term, dictionary, min_sub, max_sub, only_longest
            )
        else:
            parts = []
        for p in parts:
            yield (p, 0, start, end)


def register_compound_analyzer(
    name: str,
    dictionary,
    tree: HyphenationTree | None = None,
    min_word: int = DEFAULT_MIN_WORD_SIZE,
    min_sub: int = DEFAULT_MIN_SUBWORD_SIZE,
    max_sub: int = DEFAULT_MAX_SUBWORD_SIZE,
    only_longest: bool = False,
    lower: bool = True,
) -> None:
    """ws + lowercase + CompoundWordTokenFilter chain on the analyzer SPI.

    Batched flat path: compound_stream is a stateless term -> terms map,
    so whole batches decompose once per UNIQUE term (analysis/termmap.py)."""
    from .termmap import make_term_map_analyzer, probe_stateless
    from .tokenizer import register_analyzer, register_flat_analyzer
    from .worddelimiter import _ws_offsets_raw

    dict_set = {w.lower() for w in dictionary} if dictionary is not None else None

    def _run(text: str, with_offsets: bool):
        if not text:
            return ([], [], 0) if not with_offsets else ([], [], [], [], 0)
        terms, positions, starts, ends = [], [], [], []
        pos = -1
        stream = compound_stream(
            _ws_offsets_raw(text), dict_set, tree,
            min_word, min_sub, max_sub, only_longest,
        )
        for t, pi, st, en in stream:
            pos += pi
            terms.append(t.lower() if lower else t)
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
                uniq,
                lambda toks: compound_stream(
                    toks, dict_set, tree, min_word, min_sub, max_sub, only_longest
                ),
            ),
            lower=lower,
            scalar_fns=(scalar, scalar_off),
        ),
    )
    register_analyzer(name, scalar, scalar_off)
