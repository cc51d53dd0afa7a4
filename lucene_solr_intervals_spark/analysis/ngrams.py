"""Character n-gram tokenizers (lucene/analysis/common/.../ngram/).

* NGramTokenizer (NGramTokenizer.java:58, the 4.4+ streaming form):
  n-grams of the RAW text (spaces included, no trimming), emitted by
  increasing start offset, sizes min..max per start, EVERY gram advancing
  the position by 1 — "abcde" @(2,3) -> ab abc bc bcd cd cde de, posInc
  all 1, offsets [start, start+size).  This is the char-level producer
  NGramPhraseQuery's rewrite was designed against (NGramPhraseQuery.java:33).
* EdgeNGramTokenFilter (EdgeNGramTokenFilter.java:35): per-token LEADING
  grams of sizes min..max (grams longer than the token skipped), all at
  the token's position (first gram carries the accumulated posInc, rest
  0), offsets = the whole token's span — the index-time autocomplete
  trick (prefix search without wildcard expansion).

Both are vectorized over the flat arrays: gram strings come from numpy
UCS4 window views (`sliding_window_view(...).view('U{n}')`) — one C-level
reinterpret per gram size, no per-gram Python.
"""

from __future__ import annotations

import numpy as np


def ngram_flat(texts, min_gram: int = 1, max_gram: int = 2) -> dict:
    """NGramTokenizer over whole documents -> flat arrays."""
    if min_gram < 1 or max_gram < min_gram:
        raise ValueError("need 1 <= min_gram <= max_gram")
    n_docs = len(texts)
    doc_parts, term_parts, pos_parts = [], [], []
    start_parts, end_parts = [], []
    doclens = np.zeros(n_docs, dtype=np.int64)
    for d, t in enumerate(texts):
        s = t if isinstance(t, str) else ""
        L = len(s)
        if L < min_gram:
            continue
        arr = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
        starts_all, terms_all, ends_all = [], [], []
        for n in range(min_gram, max_gram + 1):
            if n > L:
                break
            win = np.lib.stride_tricks.sliding_window_view(arr, n)
            grams = win.copy().view(f"<U{n}").ravel().astype(object)
            st = np.arange(L - n + 1, dtype=np.int64)
            starts_all.append(st)
            ends_all.append(st + n)
            terms_all.append(grams)
        st = np.concatenate(starts_all)
        en = np.concatenate(ends_all)
        tm = np.concatenate(terms_all)
        # emit by increasing start offset, then size (the 4.4+ order)
        order = np.lexsort((en, st))
        k = st.size
        doc_parts.append(np.full(k, d, dtype=np.int64))
        term_parts.append(tm[order])
        pos_parts.append(np.arange(k, dtype=np.int64))  # posInc 1 per gram
        start_parts.append(st[order])
        end_parts.append(en[order])
        doclens[d] = k
    cat = lambda p, dt: (  # noqa: E731
        np.concatenate(p) if p else np.zeros(0, dtype=dt)
    )
    return {
        "doc_idx": cat(doc_parts, np.int64),
        "terms": cat(term_parts, object),
        "positions": cat(pos_parts, np.int64),
        "starts": cat(start_parts, np.int64),
        "ends": cat(end_parts, np.int64),
        "doclens": doclens,
    }


def edge_ngram_flat_pass(flat: dict, min_gram: int = 1, max_gram: int = 1) -> dict:
    """EdgeNGramTokenFilter over flat token arrays: leading grams of each
    token stacked at the token's position (posInc first / 0 rest), token
    offsets preserved.  Tokens shorter than min_gram vanish but their
    position stays a hole (savePosIncr accumulation)."""
    if min_gram < 1 or max_gram < min_gram:
        raise ValueError("need 1 <= min_gram <= max_gram")
    import pandas as pd

    terms = np.asarray(flat["terms"], dtype=object)
    n = terms.size
    has_off = "starts" in flat
    lens = pd.Index(terms).str.len().to_numpy(dtype=np.int64) if n else np.zeros(0, np.int64)
    ser = pd.Index(terms)
    pieces = []
    for g in range(min_gram, max_gram + 1):
        sel = np.flatnonzero(lens >= g)
        if sel.size == 0:
            continue
        piece = {
            "idx": sel,
            "ord": np.full(sel.size, g, dtype=np.int64),
            "term": ser[sel].str.slice(0, g).to_numpy(dtype=object),
        }
        pieces.append(piece)
    if not pieces:
        out = {
            "doc_idx": np.zeros(0, dtype=np.int64),
            "terms": np.zeros(0, dtype=object),
            "positions": np.zeros(0, dtype=np.int64),
            "doclens": np.zeros(len(flat.get("doclens", [])), dtype=np.int64),
        }
        if has_off:
            out["starts"] = out["ends"] = np.zeros(0, dtype=np.int64)
        return out
    idx = np.concatenate([p["idx"] for p in pieces])
    ordk = np.concatenate([p["ord"] for p in pieces])
    term = np.concatenate([p["term"] for p in pieces])
    order = np.lexsort((ordk, idx))
    idx, term = idx[order], term[order]
    doc_idx = np.asarray(flat["doc_idx"], dtype=np.int64)[idx]
    positions = np.asarray(flat["positions"], dtype=np.int64)[idx]
    out = {"doc_idx": doc_idx, "terms": term, "positions": positions}
    if has_off:
        out["starts"] = np.asarray(flat["starts"], dtype=np.int64)[idx]
        out["ends"] = np.asarray(flat["ends"], dtype=np.int64)[idx]
    from .synonyms import discounted_lengths

    n_docs = int(np.asarray(flat["doclens"]).size)
    out["doclens"] = discounted_lengths(doc_idx, positions, n_docs)
    return out
