"""Pattern-based analysis: PatternReplaceCharFilter + PatternTokenizer.

Transcription of the reference semantics:
  pattern/PatternReplaceCharFilter.java:43  regex replacement over the
      whole buffered input, with BaseCharFilter offset correction:
      shorter replacements add one cumulative 'backskip' entry after the
      replacement; longer replacements map every extra output char back
      to the match's last input char (--cumulative per char); correct()
      clamps at 0 (the enforced non-negative offsets of the reference's
      testLongerReplacement '^' case)
  pattern/PatternTokenizer.java:56  one token per regex match (group >= 0
      selects a capture group) or regex-as-delimiter split (group == -1);
      empty tokens are never emitted
Pinned by the transcribed TestPatternReplaceCharFilter /
TestPatternTokenizer vectors in tests/test_pattern.py.

Replacement strings accept the reference's $N group references (also $0)
alongside Python's \\N syntax.
"""

from __future__ import annotations

import re

import numpy as np

_DOLLAR_REF = re.compile(r"\$(\d)")


def _py_replacement(replacement: str) -> str:
    """Java-style $N -> Python \\g<N> (the reference tests use $1$2...)."""
    return _DOLLAR_REF.sub(r"\\g<\1>", replacement)


def pattern_replace_filter(
    text: str, regex: re.Pattern, replacement: str
) -> tuple[str, np.ndarray, np.ndarray]:
    """processPattern: returns (output, offsets, diffs) — the
    BaseCharFilter correction table in the same shape mapping.py uses."""
    rep_template = _py_replacement(replacement)
    out: list[str] = []
    offs: list[int] = []
    diffs: list[int] = []
    cumulative = 0
    last_end = 0
    out_len = 0

    def add(off: int, cum: int) -> None:
        if offs and off == offs[-1]:
            diffs[-1] = cum
        else:
            offs.append(off)
            diffs.append(cum)

    for m in regex.finditer(text):
        group_size = m.end() - m.start()
        skipped = text[last_end : m.start()]
        last_end = m.end()
        length_before = out_len + len(skipped)
        rep = m.expand(rep_template)
        out.append(skipped)
        out.append(rep)
        out_len = length_before + len(rep)
        if group_size != len(rep):
            if len(rep) < group_size:
                # backskip AFTER the replacement (possibly past the end)
                cumulative += group_size - len(rep)
                add(length_before + len(rep), cumulative)
            else:
                # every extra char points at the match's last input char
                for i in range(group_size, len(rep)):
                    cumulative -= 1
                    add(length_before + i, cumulative)
        if m.end() == m.start() and m.end() >= len(text):
            break  # zero-width match at end: finditer already stops, guard
    out.append(text[last_end:])
    return (
        "".join(out),
        np.asarray(offs, dtype=np.int64),
        np.asarray(diffs, dtype=np.int64),
    )


def correct_offset(out_off: int, offs: np.ndarray, diffs: np.ndarray) -> int:
    """Scalar correct() with the PatternReplaceCharFilter >= 0 clamp."""
    if offs.size == 0:
        return out_off
    i = int(np.searchsorted(offs, out_off, side="right")) - 1
    return max(0, out_off + (int(diffs[i]) if i >= 0 else 0))


def register_pattern_replace_analyzer(
    name: str,
    pattern: str,
    replacement: str,
    base: str = "code",
    stopwords=None,
) -> None:
    """Register a base-tokenizer chain preceded by a
    PatternReplaceCharFilter; token offsets are corrected back to the
    ORIGINAL text (clamped non-negative) via the BaseCharFilter table,
    like register_mapping_analyzer."""
    from .mapping import correct_offsets
    from .tokenizer import _char_filter_flat, register_flat_analyzer

    regex = re.compile(pattern)

    def _flat(texts, keep_offsets, _r=regex, _rep=replacement, _b=base, _s=stopwords):
        filtered, tables = [], []
        for t in texts:
            o, offs, dfs = pattern_replace_filter(
                t if isinstance(t, str) else "", _r, _rep
            )
            filtered.append(o)
            tables.append((offs, dfs))
        flat = _char_filter_flat(filtered, lambda s: s, _b, _s, keep_offsets)
        if keep_offsets and flat["doc_idx"].size:
            starts, ends = flat["starts"], flat["ends"]
            di = flat["doc_idx"]
            bounds = np.concatenate(
                [[0], np.cumsum(np.bincount(di, minlength=len(texts)))]
            ).astype(np.int64)
            for d in range(len(texts)):
                lo, hi = bounds[d], bounds[d + 1]
                if lo == hi:
                    continue
                offs, dfs = tables[d]
                if offs.size:
                    starts[lo:hi] = np.maximum(
                        correct_offsets(starts[lo:hi], offs, dfs), 0
                    )
                    ends[lo:hi] = np.maximum(
                        correct_offsets(ends[lo:hi], offs, dfs), 0
                    )
        return flat

    register_flat_analyzer(name, _flat)


# ----------------------------------------------------- pattern tokenizer
def pattern_tokenize(
    text: str, regex: re.Pattern, group: int = -1, lowercase: bool = True
):
    """PatternTokenizer.incrementToken: group >= 0 emits that capture
    group per match; group == -1 splits on the pattern.  Empty tokens are
    skipped without a position increment (the reference emits nothing for
    them)."""
    terms: list[str] = []
    positions: list[int] = []
    starts: list[int] = []
    ends: list[int] = []
    if text:
        if group >= 0:
            spans = [
                (m.start(group), m.end(group))
                for m in regex.finditer(text)
                if m.group(group)
            ]
        else:
            spans = []
            prev = 0
            for m in regex.finditer(text):
                if m.start() > prev:
                    spans.append((prev, m.start()))
                prev = m.end()
            if prev < len(text):
                spans.append((prev, len(text)))
        for s, e in spans:
            tok = text[s:e]
            terms.append(tok.lower() if lowercase else tok)
            positions.append(len(positions))
            starts.append(s)
            ends.append(e)
    return terms, positions, starts, ends, len(terms)


def register_pattern_tokenizer_analyzer(
    name: str,
    pattern: str,
    group: int = -1,
    lowercase: bool = True,
    stopwords=None,
) -> None:
    """PatternTokenizer(+LowerCase+Stop) chain on the analyzer SPI."""
    from .tokenizer import (
        _stop_filter_flat,
        register_flat_analyzer,
    )

    regex = re.compile(pattern)

    def _flat(texts, keep_offsets, _r=regex, _g=group, _lc=lowercase, _s=stopwords):
        terms_all: list[str] = []
        doc_parts, pos_parts, s_parts, e_parts = [], [], [], []
        n_docs = len(texts)
        doclens = np.zeros(n_docs, dtype=np.int64)
        for i, t in enumerate(texts):
            tm, ps, st, en, dl = pattern_tokenize(
                t if isinstance(t, str) else "", _r, _g, _lc
            )
            terms_all.extend(tm)
            pos_parts.append(np.asarray(ps, dtype=np.int64))
            s_parts.append(np.asarray(st, dtype=np.int64))
            e_parts.append(np.asarray(en, dtype=np.int64))
            doc_parts.append(np.full(len(tm), i, dtype=np.int64))
            doclens[i] = dl
        cat = lambda p: (  # noqa: E731
            np.concatenate(p) if p else np.zeros(0, dtype=np.int64)
        )
        flat = {
            "doc_idx": cat(doc_parts),
            "terms": np.asarray(terms_all, dtype=object),
            "positions": cat(pos_parts),
            "doclens": doclens,
        }
        if keep_offsets:
            flat["starts"], flat["ends"] = cat(s_parts), cat(e_parts)
        if _s:
            flat = _stop_filter_flat(flat, _s)
            flat["doclens"] = np.bincount(
                flat["doc_idx"], minlength=n_docs
            ).astype(np.int64)
        return flat

    register_flat_analyzer(name, _flat)
