"""ShingleFilter analog: token n-grams over the flat occurrence arrays.

Re-derives /root/reference/lucene/analysis/common/src/java/org/apache/
lucene/analysis/shingle/ShingleFilter.java onto dense per-document slot
arrays:

* Every input position is a slot; a stopword hole contributes a FILLER
  token ("_", ShingleFilter.java:52-55) to shingles crossing it but emits
  no unigram.
* At each slot, the unigram (if outputUnigrams and the slot is real) is
  emitted first, then shingles of size minShingleSize..maxShingleSize
  starting at that slot, all at the SAME position (posInc 0 after the
  first — ShingleFilterTest BI_GRAM_POSITION_INCREMENTS).
* A shingle is emitted iff its window lies inside the document's slot
  count (trailing holes included) and contains >= 1 real token —
  "_ sentence" is emitted, "_ _" is not (BI_GRAM_TOKENS_WITH_HOLES,
  testTwoTrailingHoles/TriShingle).
* Positions do NOT collapse: a hole slot that emits no shingle stays an
  empty position (the posInc-2 gap survives).
* Offsets: a filler inherits a zero-width offset at the next real token's
  start (or the document's final offset for trailing holes); a shingle
  spans first-token start .. last-token end (testTrailingHole1/2).

The whole pass is numpy over the dense stream — the only Python-level
loop is over the (max_size - min_size + 1) shingle sizes.
"""

from __future__ import annotations

import numpy as np

DEFAULT_FILLER = "_"
DEFAULT_SEPARATOR = " "


def shingle_flat_pass(
    flat: dict,
    stopwords: frozenset[str] | None = None,
    min_size: int = 2,
    max_size: int = 2,
    output_unigrams: bool = True,
    separator: str = DEFAULT_SEPARATOR,
    filler: str = DEFAULT_FILLER,
    output_unigrams_if_no_shingles: bool = False,
    doc_final_offsets: np.ndarray | None = None,
) -> dict:
    """Input: DENSE pre-stop flat arrays (positions consecutive per doc —
    every slot present).  `stopwords` marks hole slots.  Output: flat
    arrays of unigrams + shingles with slot positions (no collapse).
    `doclens` in the result is the discountOverlaps norm length (distinct
    occupied positions)."""
    if min_size < 2 or max_size < min_size:
        raise ValueError("shingle sizes need 2 <= min_size <= max_size")
    terms = np.asarray(flat["terms"], dtype=object)
    doc_idx = np.asarray(flat["doc_idx"], dtype=np.int64)
    slots = np.asarray(flat["positions"], dtype=np.int64)
    has_off = "starts" in flat
    n = terms.size
    n_docs = int(flat["doclens"].size) if "doclens" in flat else (
        int(doc_idx.max()) + 1 if n else 0
    )
    empty = {
        "doc_idx": np.zeros(0, dtype=np.int64),
        "terms": np.zeros(0, dtype=object),
        "positions": np.zeros(0, dtype=np.int64),
        "doclens": np.zeros(n_docs, dtype=np.int64),
    }
    if has_off:
        empty["starts"] = empty["ends"] = np.zeros(0, dtype=np.int64)
    if n == 0:
        return empty

    if stopwords:
        import pandas as pd

        real = ~pd.Index(terms).isin(list(stopwords)).astype(bool)
    else:
        real = np.ones(n, dtype=bool)
    dense_terms = terms.copy()
    dense_terms[~real] = filler

    # per-doc boundaries in the dense stream
    doc_end = np.searchsorted(doc_idx, np.arange(n_docs), side="right")

    if has_off:
        starts = np.asarray(flat["starts"], dtype=np.int64).copy()
        ends = np.asarray(flat["ends"], dtype=np.int64).copy()
        # filler offsets: zero-width at the next real token's start, or the
        # doc's final offset for trailing holes (testTrailingHole1)
        if not real.all():
            final = (
                doc_final_offsets
                if doc_final_offsets is not None
                else np.zeros(n_docs, dtype=np.int64)
            )
            # vectorized next-real lookup: searchsorted over the sorted
            # real-token indices, bounded to the hole's own document
            holes = np.flatnonzero(~real)
            real_idx = np.flatnonzero(real)
            nxt = np.searchsorted(real_idx, holes)
            v = np.empty(holes.size, dtype=np.int64)
            in_doc = np.zeros(holes.size, dtype=bool)
            if real_idx.size:
                safe = np.minimum(nxt, real_idx.size - 1)
                cand = real_idx[safe]
                in_doc = (nxt < real_idx.size) & (cand < doc_end[doc_idx[holes]])
                v[in_doc] = starts[cand[in_doc]]
            v[~in_doc] = final[doc_idx[holes[~in_doc]]]
            starts[holes] = v
            ends[holes] = v

    creal = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(real, out=creal[1:])

    shingle_docs = np.zeros(n_docs, dtype=bool)  # which DOCS produced one
    pieces = []  # (order_key, doc, slot, term, start, end) as arrays
    for k in range(min_size, max_size + 1):
        if n < k:
            break
        # window [i, i+k) valid if it stays inside the doc of i
        i = np.arange(n - k + 1)
        ok = doc_idx[i] == doc_idx[i + k - 1]
        ok &= (creal[i + k] - creal[i]) > 0  # >= 1 real token
        i = i[ok]
        if i.size == 0:
            continue
        shingle_docs[doc_idx[i]] = True
        gram = dense_terms[i]
        for j in range(1, k):
            gram = gram + (separator + dense_terms[i + j])
        piece = {
            "ord": np.full(i.size, k, dtype=np.int64),
            "doc": doc_idx[i],
            "slot": slots[i],
            "term": gram,
        }
        if has_off:
            piece["start"] = starts[i]
            piece["end"] = ends[i + k - 1]
        pieces.append(piece)

    if output_unigrams:
        u = np.flatnonzero(real)
    elif output_unigrams_if_no_shingles:
        # PER DOCUMENT, like the reference filter (one token stream each):
        # only docs that produced no shingle emit their unigrams
        u = np.flatnonzero(real & ~shingle_docs[doc_idx])
    else:
        u = np.zeros(0, dtype=np.int64)
    if u.size:
        piece = {
            "ord": np.zeros(u.size, dtype=np.int64),
            "doc": doc_idx[u],
            "slot": slots[u],
            "term": terms[u],
        }
        if has_off:
            piece["start"] = starts[u]
            piece["end"] = ends[u]
        pieces.insert(0, piece)

    if not pieces:
        return empty
    cat = lambda key: np.concatenate([p[key] for p in pieces])  # noqa: E731
    comb_doc, comb_slot = cat("doc"), cat("slot")
    comb_term, comb_ord = cat("term"), cat("ord")
    order = np.lexsort((comb_ord, comb_slot, comb_doc))
    out = {
        "doc_idx": comb_doc[order],
        "terms": comb_term[order],
        "positions": comb_slot[order],
    }
    if has_off:
        out["starts"] = cat("start")[order]
        out["ends"] = cat("end")[order]
    from .synonyms import discounted_lengths

    out["doclens"] = discounted_lengths(out["doc_idx"], out["positions"], n_docs)
    return out


def common_grams_flat_pass(
    flat: dict,
    common_words,
    separator: str = "_",
    query_mode: bool = False,
) -> dict:
    """CommonGramsFilter / CommonGramsQueryFilter analogs
    (lucene/analysis/common/.../commongrams/CommonGramsFilter.java:48,
    CommonGramsQueryFilter.java:33) over dense flat arrays.

    Index mode: every token at its position, plus — for each adjacent pair
    where EITHER side is a common word — the bigram "a{sep}b" stacked at
    the first token's position (posInc 0): "the fox" -> the, the_fox(0),
    fox.  The phrase-speed trick for stopword-heavy phrases, pairing with
    CommonTermsQuery.

    Query mode: ONE token per position — the bigram replaces its two
    unigrams; a trailing unigram covered by the preceding bigram is
    dropped: "fox of the" -> fox_of, of_the (CommonGramsFilterTest
    testCommonGramsQueryFilter's truth table)."""
    terms = np.asarray(flat["terms"], dtype=object)
    doc_idx = np.asarray(flat["doc_idx"], dtype=np.int64)
    slots = np.asarray(flat["positions"], dtype=np.int64)
    n = terms.size
    n_docs = int(np.asarray(flat["doclens"]).size)
    empty = {
        "doc_idx": np.zeros(0, dtype=np.int64),
        "terms": np.zeros(0, dtype=object),
        "positions": np.zeros(0, dtype=np.int64),
        "doclens": np.zeros(n_docs, dtype=np.int64),
    }
    if n == 0:
        return empty
    import pandas as pd

    common = pd.Index(terms).isin(list(common_words))
    # adjacent pairs within one document
    i = np.arange(n - 1) if n > 1 else np.zeros(0, dtype=np.int64)
    pair_ok = np.zeros(max(n - 1, 0), dtype=bool)
    if n > 1:
        pair_ok = (doc_idx[i] == doc_idx[i + 1]) & (common[i] | common[i + 1])
    gi = np.flatnonzero(pair_ok)
    grams = (
        terms[gi] + (separator + terms[gi + 1]) if gi.size else np.zeros(0, object)
    )

    if not query_mode:
        comb_doc = np.concatenate((doc_idx, doc_idx[gi]))
        comb_slot = np.concatenate((slots, slots[gi]))
        comb_term = np.concatenate((terms, grams))
        comb_ord = np.concatenate(
            (np.zeros(n, dtype=np.int64), np.ones(gi.size, dtype=np.int64))
        )
        order = np.lexsort((comb_ord, comb_slot, comb_doc))
        out = {
            "doc_idx": comb_doc[order],
            "terms": comb_term[order],
            "positions": comb_slot[order],
        }
        from .synonyms import discounted_lengths

        out["doclens"] = discounted_lengths(
            out["doc_idx"], out["positions"], n_docs
        )
        return out

    # query mode: gram at i replaces unigram(i); last unigram of a doc is
    # dropped iff a gram ends at it
    has_gram = np.zeros(n, dtype=bool)
    has_gram[gi] = True
    covered_end = np.zeros(n, dtype=bool)
    covered_end[gi + 1] = True
    is_last = np.ones(n, dtype=bool)
    if n > 1:
        is_last[:-1] = doc_idx[:-1] != doc_idx[1:]
    emit_uni = ~has_gram & ~(is_last & covered_end)
    ui = np.flatnonzero(emit_uni)
    comb_doc = np.concatenate((doc_idx[ui], doc_idx[gi]))
    comb_slot = np.concatenate((slots[ui], slots[gi]))
    comb_term = np.concatenate((terms[ui], grams))
    order = np.lexsort((comb_slot, comb_doc))
    # one token per position -> renumber positions sequentially per doc
    d_sorted = comb_doc[order]
    first = np.ones(d_sorted.size, dtype=bool)
    if d_sorted.size > 1:
        first[1:] = d_sorted[1:] != d_sorted[:-1]
    base = np.flatnonzero(first)
    doc_ord = np.cumsum(first) - 1
    pos = np.arange(d_sorted.size, dtype=np.int64) - base[doc_ord]
    return {
        "doc_idx": d_sorted,
        "terms": comb_term[order],
        "positions": pos,
        "doclens": np.bincount(d_sorted, minlength=n_docs).astype(np.int64),
    }
