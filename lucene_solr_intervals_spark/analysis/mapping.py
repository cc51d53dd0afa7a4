"""MappingCharFilter: greedy longest-match character-sequence rewriting
ahead of the tokenizer, with offset correction back to the ORIGINAL text.

Transcription of the reference semantics:
  charfilter/MappingCharFilter.java:40  greedy FST walk (longest pattern
      at a point wins, replacement may be empty, matching resumes AFTER
      the consumed input — replacements are never re-scanned)
  charfilter/BaseCharFilter.java:44     correct(): (output offset ->
      input offset) piecewise-constant cumulative-diff table;
      addOffCorrectMap bookkeeping including the diff<0 "extra chars map
      back to the same input offset" fan-out
Pinned by the transcribed TestMappingCharFilter vectors in
tests/test_mapping_charfilter.py (1:1, 1:2, 2:1, 3:1, 4:2, 5:0, token
stream, chained filters).

The FST is replaced by a (patterns-by-first-char + prefix set) walk —
same observable matches; the engine never builds Lucene FSTs.
"""

from __future__ import annotations

import numpy as np


class NormalizeCharMap:
    """NormalizeCharMap.Builder analog: match -> replacement table with
    greedy longest-match semantics."""

    def __init__(self, mappings: dict[str, str]):
        if any(not m for m in mappings):
            raise ValueError("cannot match the empty string")
        self.mappings = dict(mappings)
        self.by_first: dict[str, list[str]] = {}
        self.prefixes: set[str] = set()
        for pat in mappings:
            self.by_first.setdefault(pat[0], []).append(pat)
            for i in range(1, len(pat) + 1):
                self.prefixes.add(pat[:i])
        self.max_len = max((len(p) for p in mappings), default=0)


def mapping_filter(
    text: str, norm_map: NormalizeCharMap
) -> tuple[str, np.ndarray, np.ndarray]:
    """Apply the map to one text.  Returns (output, offsets, diffs) where
    (offsets, diffs) is the BaseCharFilter correction table: input_off =
    output_off + diffs[last i with offsets[i] <= output_off]."""
    out: list[str] = []
    out_len = 0
    offs: list[int] = []
    diffs: list[int] = []
    by_first = norm_map.by_first
    prefixes = norm_map.prefixes
    mappings = norm_map.mappings
    n = len(text)
    input_off = 0

    def add_off_correct(off: int, cumulative: int) -> None:
        # BaseCharFilter.addOffCorrectMap: same offset overwrites
        if offs and off == offs[-1]:
            diffs[-1] = cumulative
        else:
            offs.append(off)
            diffs.append(cumulative)

    while input_off < n:
        ch = text[input_off]
        last_match = None
        last_len = -1
        if ch in by_first:
            # greedy walk: extend while the slice is still a known prefix,
            # remembering the longest full pattern seen (FST arc walk role)
            lookahead = 1
            while input_off + lookahead <= n:
                frag = text[input_off:input_off + lookahead]
                if frag not in prefixes:
                    break
                if frag in mappings:
                    last_match = mappings[frag]
                    last_len = lookahead
                lookahead += 1
        if last_match is not None:
            input_off += last_len
            diff = last_len - len(last_match)
            if diff != 0:
                prev = diffs[-1] if diffs else 0
                if diff > 0:
                    # replacement shorter than matched input
                    add_off_correct(input_off - diff - prev, prev + diff)
                else:
                    # replacement longer: the extra output chars all map
                    # back to the same input offset
                    output_start = input_off - prev
                    for extra in range(-diff):
                        add_off_correct(output_start + extra, prev - extra - 1)
            out.append(last_match)
            out_len += len(last_match)
        else:
            out.append(ch)
            out_len += 1
            input_off += 1

    return (
        "".join(out),
        np.asarray(offs, dtype=np.int64),
        np.asarray(diffs, dtype=np.int64),
    )


def correct_offsets(
    out_offs: np.ndarray, offsets: np.ndarray, diffs: np.ndarray
) -> np.ndarray:
    """Vectorized BaseCharFilter.correct over an array of output offsets."""
    out_offs = np.asarray(out_offs, dtype=np.int64)
    if offsets.size == 0:
        return out_offs.copy()
    idx = np.searchsorted(offsets, out_offs, side="right") - 1
    corr = np.where(idx >= 0, diffs[np.maximum(idx, 0)], 0)
    return out_offs + corr


def register_mapping_analyzer(
    name: str,
    mappings: dict[str, str],
    base: str = "code",
    stopwords=None,
) -> None:
    """Register base-tokenizer chain preceded by a MappingCharFilter.
    Unlike the generic char-filter SPI (offsets on the filtered text),
    token offsets here are CORRECTED back to the original text via the
    BaseCharFilter table — the property the reference's highlighter
    depends on."""
    from .tokenizer import (
        _char_filter_flat,
        register_flat_analyzer,
    )

    norm_map = NormalizeCharMap(mappings)

    def _flat(texts, keep_offsets, _m=norm_map, _b=base, _s=stopwords):
        filtered, tables = [], []
        for t in texts:
            o, offs, dfs = mapping_filter(t if isinstance(t, str) else "", _m)
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
                    starts[lo:hi] = correct_offsets(starts[lo:hi], offs, dfs)
                    ends[lo:hi] = correct_offsets(ends[lo:hi], offs, dfs)
        return flat

    register_flat_analyzer(name, _flat)
