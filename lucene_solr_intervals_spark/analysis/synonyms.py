"""SynonymFilter analog: multi-word synonym injection over token arrays.

Re-derives the reference's classic SynonymFilter semantics
(/root/reference/lucene/analysis/common/src/java/org/apache/lucene/analysis/
synonym/SynonymFilter.java) onto the engine's flat occurrence arrays:

* Greedy parse (SynonymFilter.java:47-62): at each input token, the rule
  matching the MOST input tokens wins; a match consumes its span
  (inputSkipCount = matchInputLength, :442) so later rules restart after it.
* "Sausage" stacking (SynonymFilter.java:70-86): output word j of a rule
  matched at input slot s is stacked onto slot s+j (addOutput, :457-512);
  words past the end of input are emitted as new trailing positions
  (:601-625, testOutputHangsOffEnd).
* Per-slot emission order: the original token first (if keepOrig or
  unmatched), then pending outputs FIFO, all at the same position —
  posInc=0 overlaps (incrementToken, :555-600).
* Position collapse: a slot left with nothing to emit (swallowed original,
  no stacked output) advances NO position (:562-565) — `a b c` with
  `a b => foo` analyzes to `foo c` at positions 0,1 (TestSynonymMapFilter
  testDontKeepOrig).

The filter runs BEFORE stop filtering (SynonymFilter.java:44-46: the stream
"cannot properly handle position increments != 1, ie, you should place this
filter before filtering out stop words") — input positions are consecutive
per document, so slot index == position, which is what lets the whole pass
work on flat numpy arrays with Python only per *candidate match* (first-word
prefilter), never per token.

Norm accounting (the part SURVEY §2.2 had punted on): tokens emitted with
posInc=0 are counted by FieldInvertState.numOverlap
(FieldInvertState.java:35-38) and BM25's discountOverlaps=true default
subtracts them from the norm length (BM25Similarity.java:55-57,138-141).
With explicit position arrays that is exactly `count(distinct position)` —
see `discounted_lengths`.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

WORD_SEP = " "


@dataclass
class SynonymMap:
    """SynonymMap.Builder analog (SynonymMap.java:35): input phrase ->
    (keepOrig, output phrases).  Multiple add() calls for one input merge
    outputs in add-order and OR keepOrig (the FST union does the same)."""

    # input tuple -> [keep_orig, list of output word-tuples]
    rules: dict[tuple[str, ...], list] = field(default_factory=dict)
    _by_first: dict | None = field(default=None, repr=False, compare=False)

    def add(self, input_phrase: str, output_phrase: str, keep_orig: bool) -> None:
        inp = tuple(input_phrase.split())
        out = tuple(output_phrase.split())
        if not inp or not out:
            raise ValueError("empty synonym input/output")
        entry = self.rules.setdefault(inp, [False, []])
        entry[0] = entry[0] or keep_orig
        if out not in entry[1]:  # Builder dedups identical rules
            entry[1].append(out)
        self._by_first = None  # invalidate the compiled table

    # -- compiled lookup tables (built once, cached on the instance so a
    # large Solr map is not re-scanned on every Arrow batch) ---------------
    def _compiled(self):
        if self._by_first is None:
            by_first: dict[str, list[int]] = {}
            for inp in self.rules:
                lens = by_first.setdefault(inp[0], [])
                if len(inp) not in lens:
                    lens.append(len(inp))
            for lens in by_first.values():
                lens.sort(reverse=True)  # longest match wins
            self._by_first = by_first
        return self._by_first

    @classmethod
    def parse_solr(cls, text: str, expand: bool = True) -> "SynonymMap":
        """SolrSynonymParser format (SolrSynonymParser.java:30-52):
        `a, b => c, d`  explicit mapping (orig not kept);
        `a, b, c`       equivalence — expand=True: every term maps to every
                        term (original included as an output), expand=False:
                        every term maps to the first.
        `#` comments and blank lines ignored; phrases may be multi-word."""
        m = cls()
        for line in text.splitlines():
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            if "=>" in line:
                if line.count("=>") > 1:
                    # SolrSynonymParser.java: "Invalid synonym rule" on a
                    # double mapping like `a => b => c`
                    raise ValueError(f"invalid synonym rule (double =>): {line!r}")
                lhs, rhs = line.split("=>", 1)
                inputs = [p.strip() for p in lhs.split(",") if p.strip()]
                outputs = [p.strip() for p in rhs.split(",") if p.strip()]
                if not inputs or not outputs:
                    raise ValueError(f"invalid synonym rule (empty side): {line!r}")
                for i in inputs:
                    for o in outputs:
                        m.add(i, o, keep_orig=False)
            else:
                terms = [p.strip() for p in line.split(",") if p.strip()]
                if expand:
                    for i in terms:
                        for o in terms:
                            m.add(i, o, keep_orig=False)
                else:
                    for i in terms:
                        m.add(i, terms[0], keep_orig=False)
        return m

    @classmethod
    def parse_wordnet(cls, text: str) -> "SynonymMap":
        """WordnetSynonymParser prolog format (WordnetSynonymParser.java:33):
        s(synset_id, w_num, 'word', ss_type, sense, tag) — all words of one
        synset are mutual synonyms (expanded, originals included)."""
        import re

        groups: dict[str, list[str]] = {}
        for mt in re.finditer(r"s\(\s*(\d+)\s*,\s*\d+\s*,\s*'((?:[^']|'')*)'", text):
            word = mt.group(2).replace("''", "'").replace("_", " ")
            groups.setdefault(mt.group(1), []).append(word)
        m = cls()
        for words in groups.values():
            for i in words:
                for o in words:
                    m.add(i, o, keep_orig=False)
        return m


def synonym_flat_pass(flat: dict, syn: SynonymMap) -> dict:
    """Apply the synonym filter to flat occurrence arrays.

    `flat` holds doc_idx / terms / positions (+ optional starts / ends char
    offsets), with positions CONSECUTIVE per document (pre-stop stream —
    slot == position).  Returns the same shape with synonym tokens stacked
    in (overlapping positions) and swallowed slots collapsed.  `doclens`,
    if present, is dropped — recompute after any downstream stop filter via
    `discounted_lengths`.

    Vectorization contract: numpy end-to-end except one Python iteration
    per *candidate* start (tokens whose term begins some rule — prefiltered
    with a single isin) and per accepted-match output word.  Synonym-free
    batches never enter the Python loop.
    """
    terms = np.asarray(flat["terms"], dtype=object)
    doc_idx = np.asarray(flat["doc_idx"], dtype=np.int64)
    positions = np.asarray(flat["positions"], dtype=np.int64)
    has_off = "starts" in flat
    starts = np.asarray(flat["starts"], dtype=np.int64) if has_off else None
    ends = np.asarray(flat["ends"], dtype=np.int64) if has_off else None
    n = terms.size
    by_first = syn._compiled()
    if n == 0 or not by_first:
        out = {"doc_idx": doc_idx, "terms": terms, "positions": positions}
        if has_off:
            out["starts"], out["ends"] = starts, ends
        return out

    import pandas as pd

    cand = np.flatnonzero(pd.Index(terms).isin(list(by_first)))

    # greedy left-to-right sweep over candidate starts (parse(), :310-454)
    matches: list[tuple[int, int, list]] = []  # (start_idx, k, entry)
    resume = 0
    for i in cand:
        if i < resume:
            continue  # consumed by an earlier match (inputSkipCount)
        t0 = terms[i]
        for k in by_first[t0]:
            if i + k > n or doc_idx[i + k - 1] != doc_idx[i]:
                continue
            inp = (t0,) if k == 1 else tuple(terms[i : i + k])
            entry = syn.rules.get(inp)
            if entry is not None:
                matches.append((i, k, entry))
                resume = i + k
                break

    if not matches:
        out = {"doc_idx": doc_idx, "terms": terms, "positions": positions}
        if has_off:
            out["starts"], out["ends"] = starts, ends
        return out

    drop = np.zeros(n, dtype=bool)
    inj_doc: list[int] = []
    inj_slot: list[int] = []
    inj_term: list[str] = []
    inj_start: list[int] = []
    inj_end: list[int] = []
    # doc boundaries for the offset inherit rules (last input token of doc)
    if has_off:
        doc_last = {}  # doc -> index of its last token
        bounds = np.flatnonzero(np.diff(doc_idx) != 0)
        for b in np.concatenate((bounds, [n - 1])):
            doc_last[int(doc_idx[b])] = int(b)

    for i, k, (keep_orig, outputs) in matches:
        if not keep_orig:
            drop[i : i + k] = True
        d = int(doc_idx[i])
        base = int(positions[i])
        for out in outputs:
            single = len(out) == 1
            for j, w in enumerate(out):
                inj_doc.append(d)
                inj_slot.append(base + j)
                inj_term.append(w)
                if has_off:
                    # addOutput offset rules (:480-496): output token inherits
                    # the startOffset of the input at its slot; single-word
                    # outputs span to the match end; tokens hanging past the
                    # end of input inherit the last input token's offsets.
                    slot_i = i + j
                    in_doc = slot_i < n and doc_idx[slot_i] == d
                    ref_i = slot_i if in_doc else doc_last[d]
                    inj_start.append(int(starts[ref_i]))
                    if single:
                        inj_end.append(int(ends[i + k - 1]))
                    else:
                        inj_end.append(int(ends[ref_i]))

    kept = np.flatnonzero(~drop)
    n_inj = len(inj_term)
    comb_doc = np.concatenate((doc_idx[kept], np.asarray(inj_doc, dtype=np.int64)))
    comb_slot = np.concatenate((positions[kept], np.asarray(inj_slot, dtype=np.int64)))
    comb_term = np.concatenate(
        (terms[kept], np.asarray(inj_term, dtype=object))
    )
    # per-slot order: original first, then outputs in stacking order
    comb_ord = np.concatenate(
        (np.full(kept.size, -1, dtype=np.int64), np.arange(n_inj, dtype=np.int64))
    )
    if has_off:
        comb_start = np.concatenate((starts[kept], np.asarray(inj_start, dtype=np.int64)))
        comb_end = np.concatenate((ends[kept], np.asarray(inj_end, dtype=np.int64)))
    order = np.lexsort((comb_ord, comb_slot, comb_doc))
    comb_doc, comb_slot, comb_term = comb_doc[order], comb_slot[order], comb_term[order]
    if has_off:
        comb_start, comb_end = comb_start[order], comb_end[order]

    # collapse: empty slots advance no position (incrementToken :562-565) —
    # new position = rank of this (doc, slot) among the doc's occupied slots
    m = comb_doc.size
    new_slot = np.ones(m, dtype=bool)
    if m > 1:
        new_slot[1:] = (comb_doc[1:] != comb_doc[:-1]) | (comb_slot[1:] != comb_slot[:-1])
    rank = np.cumsum(new_slot) - 1
    doc_first = np.ones(m, dtype=bool)
    if m > 1:
        doc_first[1:] = comb_doc[1:] != comb_doc[:-1]
    base_rank = rank[doc_first]  # one per distinct doc, in order
    doc_ord = np.cumsum(doc_first) - 1
    new_pos = rank - base_rank[doc_ord]

    out = {"doc_idx": comb_doc, "terms": comb_term, "positions": new_pos}
    if has_off:
        out["starts"], out["ends"] = comb_start, comb_end
    return out


def discounted_lengths(doc_idx: np.ndarray, positions: np.ndarray, n_docs: int) -> np.ndarray:
    """Per-doc norm length with discountOverlaps=true
    (BM25Similarity.java:55-57: state.getLength() - state.getNumOverlap()):
    tokens at an already-occupied position carry posInc=0, so the discounted
    length is the count of DISTINCT positions per document."""
    if doc_idx.size == 0:
        return np.zeros(n_docs, dtype=np.int64)
    first = np.ones(doc_idx.size, dtype=bool)
    first[1:] = (doc_idx[1:] != doc_idx[:-1]) | (positions[1:] != positions[:-1])
    return np.bincount(doc_idx[first], minlength=n_docs).astype(np.int64)


def synonym_token_stream(
    tokens: list[str], syn: SynonymMap
) -> tuple[list[str], list[int]]:
    """Single-stream helper for the TestSynonymMapFilter transcriptions:
    token list in, (terms, posInc list) out — posInc derived from the
    collapsed positions exactly as the attribute-based tests assert them."""
    flat = {
        "doc_idx": np.zeros(len(tokens), dtype=np.int64),
        "terms": np.asarray(tokens, dtype=object),
        "positions": np.arange(len(tokens), dtype=np.int64),
    }
    out = synonym_flat_pass(flat, syn)
    incs = []
    prev = -1
    for p in out["positions"].tolist():
        incs.append(p - prev)
        prev = p
    return out["terms"].tolist(), incs
