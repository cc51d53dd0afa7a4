"""WordDelimiterFilter: split words into subwords on delimiters / case
changes / letter-number transitions, with optional catenation and
original-preservation.

Transcription of the reference semantics (cited per structure):
  WordDelimiterFilter.java:86   flag constants, incrementToken state
                                machine, position()/buffer()/OffsetSorter
  WordDelimiterIterator.java:26 subword break iterator (setBounds,
                                next, isBreak, endsWithPossessive)
The control flow is re-derived as a Python generator over (term, posInc,
start, end) tuples — same observable token stream (terms, offsets,
position increments), pinned by the transcribed TestWordDelimiterFilter
vectors in tests/test_worddelimiter.py.

Char typing uses unicodedata categories — the same mapping as the
reference's WordDelimiterIterator.getType (UPPER/LOWER/ALPHA/DIGIT/
SUBWORD_DELIM by Unicode general category; surrogates never split).
"""

from __future__ import annotations

import unicodedata
from typing import Iterable, Iterator

LOWER = 0x01
UPPER = 0x02
DIGIT = 0x04
SUBWORD_DELIM = 0x08
ALPHA = 0x03
ALPHANUM = 0x07

GENERATE_WORD_PARTS = 1
GENERATE_NUMBER_PARTS = 2
CATENATE_WORDS = 4
CATENATE_NUMBERS = 8
CATENATE_ALL = 16
PRESERVE_ORIGINAL = 32
SPLIT_ON_CASE_CHANGE = 64
SPLIT_ON_NUMERICS = 128
STEM_ENGLISH_POSSESSIVE = 256

DEFAULT_FLAGS = (
    GENERATE_WORD_PARTS | GENERATE_NUMBER_PARTS
    | SPLIT_ON_CASE_CHANGE | SPLIT_ON_NUMERICS | STEM_ENGLISH_POSSESSIVE
)

_DONE = -1


def char_type(ch: str) -> int:
    """WordDelimiterIterator.getType (Character.getType switch)."""
    cat = unicodedata.category(ch)
    if cat == "Lu":
        return UPPER
    if cat == "Ll":
        return LOWER
    if cat in ("Lt", "Lm", "Lo", "Mn", "Me", "Mc"):
        return ALPHA
    if cat in ("Nd", "Nl", "No"):
        return DIGIT
    if cat == "Cs":  # unpaired surrogate: prevent splitting
        return ALPHA | DIGIT
    return SUBWORD_DELIM


class _Iter:
    """WordDelimiterIterator.java:26 — subword break iterator."""

    def __init__(self, split_case: bool, split_num: bool, stem_poss: bool):
        self.split_case = split_case
        self.split_num = split_num
        self.stem_poss = stem_poss

    def set_text(self, text: str) -> None:
        self.text = text
        self.length = self.end_bounds = len(text)
        self.current = self.start_bounds = self.end = 0
        self.skip_possessive = self.has_final_possessive = False
        # setBounds: strip leading/trailing delimiters; note a trailing 's
        while self.start_bounds < self.length and (
            char_type(text[self.start_bounds]) & SUBWORD_DELIM
        ):
            self.start_bounds += 1
        while self.end_bounds > self.start_bounds and (
            char_type(text[self.end_bounds - 1]) & SUBWORD_DELIM
        ):
            self.end_bounds -= 1
        if self._ends_with_possessive(self.end_bounds):
            self.has_final_possessive = True
        self.current = self.start_bounds

    def next(self) -> int:
        self.current = self.end
        if self.current == _DONE:
            return _DONE
        if self.skip_possessive:
            self.current += 2
            self.skip_possessive = False
        last_type = 0
        while self.current < self.end_bounds:
            last_type = char_type(self.text[self.current])
            if not (last_type & SUBWORD_DELIM):
                break
            self.current += 1
        if self.current >= self.end_bounds:
            self.end = _DONE
            return _DONE
        self.end = self.current + 1
        while self.end < self.end_bounds:
            t = char_type(self.text[self.end])
            if self._is_break(last_type, t):
                break
            last_type = t
            self.end += 1
        if self.end < self.end_bounds - 1 and self._ends_with_possessive(self.end + 2):
            self.skip_possessive = True
        return self.end

    def type(self) -> int:
        if self.end == _DONE:
            return 0
        t = char_type(self.text[self.current])
        if t in (LOWER, UPPER):
            return ALPHA
        return t

    def is_single_word(self) -> bool:
        if self.has_final_possessive:
            return self.current == self.start_bounds and self.end == self.end_bounds - 2
        return self.current == self.start_bounds and self.end == self.end_bounds

    def _is_break(self, last_type: int, t: int) -> bool:
        if t & last_type:
            return False
        if not self.split_case and (last_type & ALPHA) and (t & ALPHA):
            return False
        if (last_type & UPPER) and (t & ALPHA):
            return False  # UPPER->letter: don't split
        if not self.split_num and (
            ((last_type & ALPHA) and (t & DIGIT))
            or ((last_type & DIGIT) and (t & ALPHA))
        ):
            return False
        return True

    def _ends_with_possessive(self, pos: int) -> bool:
        return (
            self.stem_poss
            and pos > 2
            and self.text[pos - 2] == "'"
            and self.text[pos - 1] in ("s", "S")
            and (char_type(self.text[pos - 3]) & ALPHA)
            and (pos == self.end_bounds or (char_type(self.text[pos]) & SUBWORD_DELIM))
        )


class _Concat:
    """WordDelimiterFilter$WordDelimiterConcatenation."""

    __slots__ = ("parts", "start_offset", "end_offset", "type", "subword_count")

    def __init__(self):
        self.clear()

    def clear(self):
        self.parts: list[str] = []
        self.start_offset = self.end_offset = self.type = self.subword_count = 0

    def is_empty(self) -> bool:
        return not self.parts

    def append(self, text: str):
        self.parts.append(text)
        self.subword_count += 1


def word_delimiter_stream(
    tokens: Iterable[tuple[str, int, int, int]],
    flags: int = DEFAULT_FLAGS,
    prot_words: frozenset[str] | None = None,
) -> Iterator[tuple[str, int, int, int]]:
    """Run the WordDelimiterFilter state machine over an input token
    stream of (term, pos_inc, start_offset, end_offset); yields the same
    shape.  Faithful to WordDelimiterFilter.incrementToken
    (WordDelimiterFilter.java:193-305): immediate emits for untouched /
    protected / preserved-original / single words; everything else is
    buffered per input word and flushed sorted by (startOffset asc,
    posInc desc) at word end."""

    def has(flag: int) -> bool:
        return (flags & flag) != 0

    it = _Iter(has(SPLIT_ON_CASE_CHANGE), has(SPLIT_ON_NUMERICS),
               has(STEM_ENGLISH_POSSESSIVE))
    prot = prot_words or frozenset()
    concat = _Concat()
    concat_all = _Concat()

    state = {
        "accum": 0,
        "first": True,
        "has_output_token": False,
        "has_output_following_original": False,
        "last_concat_count": 0,
    }
    saved = {"term": "", "start": 0, "end": 0, "illegal": False}

    def position(inject: bool) -> int:
        # WordDelimiterFilter.java:position()
        pos_inc = state["accum"]
        if state["has_output_token"]:
            state["accum"] = 0
            return 0 if inject else max(1, pos_inc)
        state["has_output_token"] = True
        if not state["has_output_following_original"]:
            state["has_output_following_original"] = True
            return 0
        state["accum"] = 0
        return max(1, pos_inc)

    def generate_part(single: bool) -> tuple[str, int, int, int]:
        text = saved["term"][it.current:it.end]
        start = saved["start"] + it.current
        end = saved["start"] + it.end
        if saved["illegal"]:
            # synonym-style offsets: don't slice them
            if single and start <= saved["end"]:
                off = (start, saved["end"])
            else:
                off = (saved["start"], saved["end"])
        else:
            off = (start, end)
        return (text, position(False), off[0], off[1])

    def concat_write(c: _Concat) -> tuple[str, int, int, int]:
        text = "".join(c.parts)
        if saved["illegal"]:
            off = (saved["start"], saved["end"])
        else:
            off = (c.start_offset, c.end_offset)
        tok = (text, position(True), off[0], off[1])
        state["accum"] = 0
        return tok

    def flush_concat(c: _Concat):
        state["last_concat_count"] = c.subword_count
        if c.subword_count != 1 or not should_generate_parts(c.type):
            tok = concat_write(c)
            c.clear()
            return tok
        c.clear()
        return None

    def should_concatenate(word_type: int) -> bool:
        return (has(CATENATE_WORDS) and (word_type & ALPHA)) or (
            has(CATENATE_NUMBERS) and (word_type & DIGIT)
        )

    def should_generate_parts(word_type: int) -> bool:
        return (has(GENERATE_WORD_PARTS) and (word_type & ALPHA)) or (
            has(GENERATE_NUMBER_PARTS) and (word_type & DIGIT)
        )

    source = iter(tokens)
    buffered: list[tuple[int, int, tuple[str, int, int, int]]] = []

    while True:
        # ---- consume one input word
        nxt = next(source, None)
        if nxt is None:
            return
        term, pos_inc, start, end = nxt
        state["accum"] += pos_inc
        it.set_text(term)
        it.next()

        # word of no delimiters, or protected: emit as-is
        if (it.current == 0 and it.end == len(term)) or term in prot:
            yield (term, state["accum"], start, end)
            state["accum"] = 0
            state["first"] = False
            continue

        # word of only delimiters
        if it.end == _DONE and not has(PRESERVE_ORIGINAL):
            if pos_inc == 1 and not state["first"]:
                state["accum"] -= 1
            continue

        # saveState
        saved["term"] = term
        saved["start"] = start
        saved["end"] = end
        saved["illegal"] = (end - start) != len(term)
        state["has_output_token"] = False
        state["has_output_following_original"] = not has(PRESERVE_ORIGINAL)
        state["last_concat_count"] = 0
        concat.clear()
        concat_all.clear()
        buffered.clear()

        if has(PRESERVE_ORIGINAL):
            yield (term, state["accum"], start, end)
            state["accum"] = 0
            state["first"] = False

        # ---- iterate subwords of this word
        single_emitted = None
        while it.end != _DONE:
            # word surrounded by delimiters: always output, BEFORE any
            # concatenation bookkeeping (the reference returns here)
            if it.is_single_word():
                single_emitted = generate_part(True)
                it.next()
                state["first"] = False
                yield single_emitted
                continue

            word_type = it.type()

            if not concat.is_empty() and (concat.type & word_type) == 0:
                tok = flush_concat(concat)
                if tok is not None:
                    buffered.append((tok[2], tok[1], tok))
                state["has_output_token"] = False

            if should_concatenate(word_type):
                if concat.is_empty():
                    concat.type = word_type
                    concat.start_offset = saved["start"] + it.current
                concat.append(saved["term"][it.current:it.end])
                concat.end_offset = saved["start"] + it.end
            if has(CATENATE_ALL):
                if concat_all.is_empty():
                    concat_all.start_offset = saved["start"] + it.current
                concat_all.append(saved["term"][it.current:it.end])
                concat_all.end_offset = saved["start"] + it.end

            if should_generate_parts(word_type):
                tok = generate_part(False)
                buffered.append((tok[2], tok[1], tok))

            it.next()

        # ---- end of word: flush concatenations, then the sorted buffer
        if not concat.is_empty():
            tok = flush_concat(concat)
            if tok is not None:
                buffered.append((tok[2], tok[1], tok))
        if not concat_all.is_empty():
            if concat_all.subword_count > state["last_concat_count"]:
                tok = concat_write(concat_all)
                buffered.append((tok[2], tok[1], tok))
            concat_all.clear()

        buffered.sort(key=lambda x: (x[0], -x[1]))
        for _, _, tok in buffered:
            t, pi, s, e = tok
            if state["first"] and pi == 0:
                pi = 1
            state["first"] = False
            yield (t, pi, s, e)
        buffered.clear()


# --------------------------------------------------------------- analyzers
def _ws_offsets_raw(text: str) -> list[tuple[str, int, int, int]]:
    """Case-preserving whitespace tokenizer with offsets (the recommended
    WDF input per the WordDelimiterFilter javadoc: a tokenizer that does
    NOT strip intra-word delimiters)."""
    out = []
    i, n = 0, len(text)
    while i < n:
        while i < n and text[i].isspace():
            i += 1
        j = i
        while j < n and not text[j].isspace():
            j += 1
        if j > i:
            out.append((text[i:j], 1, i, j))
        i = j
    return out


def word_delimiter_analyze(
    text: str,
    flags: int = DEFAULT_FLAGS,
    prot_words: frozenset[str] | None = None,
    lowercase: bool = True,
    with_offsets: bool = False,
):
    """Whitespace + WordDelimiterFilter (+ LowerCaseFilter) scalar analyzer
    in the engine's (terms, positions, [starts, ends,] doclen) shape.
    Positions come from the emitted posInc chain (cumsum - 1), so stacked
    tokens (posInc=0: catenations, preserved originals) share a slot the
    way the reference indexes them."""
    if not text:
        return ([], [], 0) if not with_offsets else ([], [], [], [], 0)
    terms, positions, starts, ends = [], [], [], []
    pos = -1
    for t, pi, s, e in word_delimiter_stream(_ws_offsets_raw(text), flags, prot_words):
        pos += pi
        terms.append(t.lower() if lowercase else t)
        positions.append(pos)
        starts.append(s)
        ends.append(e)
    if with_offsets:
        return terms, positions, starts, ends, len(terms)
    return terms, positions, len(terms)


def register_word_delimiter_analyzer(
    name: str,
    flags: int = DEFAULT_FLAGS,
    prot_words: frozenset[str] | None = None,
    lowercase: bool = True,
) -> None:
    """Register a ws+WDF(+lowercase) chain on the analyzer SPI.  Two
    pre-registered chains (see analysis/__init__ wiring in tokenizer):
      word_delimiter      index/query-side parts only (combinations=0)
      word_delimiter_cat  index-side with CATENATE_WORDS|CATENATE_NUMBERS
    matching the javadoc's recommended index-vs-query configuration.

    The batched flat path runs WDF as a DICTIONARY pass (one state-machine
    probe per unique term per Arrow batch — analysis/termmap.py); the
    scalar transcription stays the semantics owner on the ANALYZERS SPI."""
    from .termmap import make_term_map_analyzer, probe_wdf
    from .tokenizer import register_analyzer, register_flat_analyzer

    scalar = lambda s: word_delimiter_analyze(s, flags, prot_words, lowercase)  # noqa: E731
    scalar_off = lambda s: word_delimiter_analyze(  # noqa: E731
        s, flags, prot_words, lowercase, True
    )
    register_flat_analyzer(
        name,
        make_term_map_analyzer(
            lambda uniq: probe_wdf(uniq, flags, prot_words),
            lower=lowercase,
            scalar_fns=(scalar, scalar_off),
        ),
    )
    register_analyzer(name, scalar, scalar_off)


register_word_delimiter_analyzer("word_delimiter", DEFAULT_FLAGS)
register_word_delimiter_analyzer(
    "word_delimiter_cat", DEFAULT_FLAGS | CATENATE_WORDS | CATENATE_NUMBERS
)
register_word_delimiter_analyzer(
    "word_delimiter_preserve", DEFAULT_FLAGS | PRESERVE_ORIGINAL
)
