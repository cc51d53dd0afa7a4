"""Dictionary-level batched execution for per-token analyzer chains.

The round-7 chains — WordDelimiterFilter, PhoneticFilter, compound
decomposition, Hunspell stemming — are TERM -> TERMS maps over a raw
whitespace token stream: the emissions for an input token are a function
of the token text alone (WDF additionally carries a small cross-token
position state, reconstructed vectorized below).  Running their scalar
reference transcriptions per token is interpreter-bound at index-build
scale, so a whole Arrow batch runs as:

  1. batched raw-whitespace tokenize (numpy char-domain run detection,
     same machinery as tokenizer.tokenize_flat) -> flat arrays
  2. ``pd.factorize`` the term column -> UNIQUE terms
  3. run the scalar reference stream ONCE per unique term
     (vocabulary-bounded Python — the en_stem ``_stem_dictionary``
     precedent, analysis/tokenizer.py:277)
  4. numpy gather/expand the cached emissions back over occurrences:
     positions from per-emission posInc prefix sums, offsets rebased by
     each occurrence's start (all reference offset math is start-affine)

Token-stream equality with the scalar chains is pinned by
tests/test_termmap_parity.py; throughput vs the per-doc ``_flat_fallback``
is tracked by tools/bench_analyzers.py.

Reference roles (semantics owned by the scalar transcriptions):
  WordDelimiterFilter.java:86, PhoneticFilter.java:33,
  CompoundWordTokenFilterBase.java:91, HunspellStemFilter.java:48.
"""

from __future__ import annotations

import numpy as np

# str.isspace() codepoints (== str.split() separators; the scalar base
# tokenizer `_ws_offsets_raw` splits on isspace, NOT the regex \s class).
# Everything isspace lives at or below U+3000.
_WS_ISSPACE = np.zeros(0x3001, dtype=bool)
_WS_ISSPACE[[_cp for _cp in range(0x3001) if chr(_cp).isspace()]] = True


def _empty_flat(n_docs: int, keep_offsets: bool) -> dict:
    flat = {
        "doc_idx": np.zeros(0, dtype=np.int64),
        "terms": np.zeros(0, dtype=object),
        "positions": np.zeros(0, dtype=np.int64),
        "doclens": np.zeros(n_docs, dtype=np.int64),
    }
    if keep_offsets:
        flat["starts"] = flat["ends"] = np.zeros(0, dtype=np.int64)
    return flat


def ws_raw_flat(texts):
    """Batched twin of worddelimiter._ws_offsets_raw: case-preserving
    isspace-run tokenizer with char offsets, NO max-token-length cap (the
    recommended WDF input keeps intra-word delimiters and long tokens).

    Returns dict: doc_idx / terms (raw case) / starts / ends, all flat,
    sorted by document then token order."""
    n_docs = len(texts)
    strs = [t if isinstance(t, str) else "" for t in texts]
    clens = np.fromiter((len(s) for s in strs), dtype=np.int64, count=n_docs)
    doc_off = np.zeros(n_docs, dtype=np.int64)
    if n_docs > 1:
        np.cumsum(clens[:-1] + 1, out=doc_off[1:])
    joined = "\n".join(strs)
    out = {
        "doc_idx": np.zeros(0, dtype=np.int64),
        "terms": np.zeros(0, dtype=object),
        "starts": np.zeros(0, dtype=np.int64),
        "ends": np.zeros(0, dtype=np.int64),
    }
    if not joined:
        return out
    arr = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
    sep = np.zeros(arr.size, dtype=bool)
    small = arr < _WS_ISSPACE.size
    sep[small] = _WS_ISSPACE[arr[small]]
    mask = ~sep
    m8 = mask.view(np.int8)
    d = m8[1:].astype(np.int8) - m8[:-1]
    starts = np.flatnonzero(d == 1) + 1
    ends = np.flatnonzero(d == -1) + 1
    if mask[0]:
        starts = np.concatenate(([0], starts))
    if mask[-1]:
        ends = np.concatenate((ends, [arr.size]))
    if starts.size == 0:
        return out
    buf = arr.copy()
    buf[sep] = 32  # blank separators; token runs contain no isspace chars,
    # so C-level str.split() recovers exactly one string per run
    terms = np.asarray(buf.tobytes().decode("utf-32-le").split(), dtype=object)
    doc_idx = np.searchsorted(doc_off, starts, side="right") - 1
    return {
        "doc_idx": doc_idx,
        "terms": terms,
        "starts": starts - doc_off[doc_idx],
        "ends": ends - doc_off[doc_idx],
    }


def probe_stateless(uniq, stream_fn):
    """Run a STATELESS reference stream (phonetic / compound / hunspell —
    pure per-token loops: every input token emits >= 1 token, the first
    at the input's posInc == 1, stacked extras at 0) over ALL unique
    terms in ONE stream call (compound_stream normalizes its dictionary
    per call — one call per batch, not per term).  Emission segments are
    recovered from the posInc > 0 markers; offsets are token-relative
    because every probe token starts at 0."""
    sub: list[str] = []
    pi: list[int] = []
    rs: list[int] = []
    re_: list[int] = []
    for t, p, s, e in stream_fn([(u, 1, 0, len(u)) for u in uniq]):
        sub.append(t)
        pi.append(p)
        rs.append(s)
        re_.append(e)
    pi_arr = np.asarray(pi, dtype=np.int64)
    term_starts = np.flatnonzero(pi_arr > 0)
    if term_starts.size != len(uniq):
        raise AssertionError(
            "stateless term-map stream violated the one-posInc-per-token "
            f"contract: {term_starts.size} segments for {len(uniq)} terms"
        )
    off = np.concatenate((term_starts, [pi_arr.size])).astype(np.int64)
    return (
        off,
        np.asarray(sub, dtype=object),
        pi_arr,
        np.asarray(rs, dtype=np.int64),
        np.asarray(re_, dtype=np.int64),
        np.zeros(len(uniq), dtype=np.int64),
    )


def probe_wdf(uniq, flags: int, prot_words):
    """Probe WordDelimiterFilter once per unique term in the COMMON stream
    context (an emission already seen, accumulated posInc == 1) by
    sandwiching the term between plain single-letter words: 'x' consumes
    the stream-initial state, the trailing 'y' posInc reveals whether the
    term CARRIES an unconsumed position increment (a word that emits no
    token, e.g. all-delimiters, or generate/catenate flags all off).

    Single letters always take the emit-as-is path (no delimiters), so
    the sandwich contributes exactly one leading and one trailing
    emission regardless of flags."""
    from .worddelimiter import word_delimiter_stream

    sub: list[str] = []
    pi: list[int] = []
    rs: list[int] = []
    re_: list[int] = []
    off = np.zeros(len(uniq) + 1, dtype=np.int64)
    carry = np.zeros(len(uniq), dtype=np.int64)
    for k, u in enumerate(uniq):
        toks = [
            ("x", 1, 0, 1),
            (u, 1, 2, 2 + len(u)),
            ("y", 1, 3 + len(u), 4 + len(u)),
        ]
        out = list(word_delimiter_stream(toks, flags, prot_words))
        # structurally: out[0] is the 'x' emission, out[-1] is 'y'
        carry[k] = out[-1][1] - 1
        n = 0
        for t, p, s, e in out[1:-1]:
            sub.append(t)
            pi.append(p)
            rs.append(s - 2)
            re_.append(e - 2)
            n += 1
        off[k + 1] = off[k] + n
    return (
        off,
        np.asarray(sub, dtype=object),
        np.asarray(pi, dtype=np.int64),
        np.asarray(rs, dtype=np.int64),
        np.asarray(re_, dtype=np.int64),
        carry,
    )


def term_map_flat(texts, keep_offsets, probe, lower=True, scalar_fns=None,
                  cache=None, cache_max=262_144):
    """Assemble the flat tokenize dict for a whole batch from per-UNIQUE
    emissions.  `probe(uniq) -> (off, sub, pi, rel_starts, rel_ends,
    carry)`; `scalar_fns = (fn, offsets_fn)` are the exact fallbacks for
    stream contexts the vector path does not model (a term that swallows
    its position increment under exotic WDF flag sets — carry != 0).

    `cache` (a per-chain dict, held by the closure make_term_map_analyzer
    builds) memoizes RAW emissions per term ACROSS batches: consecutive
    Arrow batches of a corpus share most of their vocabulary, and Spark
    reuses Python workers, so after warm-up each batch only probes its
    genuinely new terms.  Bounded by `cache_max` (cleared wholesale when
    exceeded — the working set re-warms in one batch)."""
    import pandas as pd

    from .tokenizer import _flat_fallback

    n_docs = len(texts)
    base = ws_raw_flat(texts)
    tdoc, tterms = base["doc_idx"], base["terms"]
    if tterms.size == 0:
        return _empty_flat(n_docs, keep_offsets)
    inv, uniq = pd.factorize(tterms)
    if cache is None:
        off, sub, pi, rs, re_, carry = probe(uniq.tolist())
    else:
        missing = [u for u in uniq if u not in cache]
        if missing:
            if len(cache) + len(missing) > cache_max:
                cache.clear()
            moff, msub, mpi, mrs, mre, mcarry = probe(missing)
            for k, u in enumerate(missing):
                s, e = int(moff[k]), int(moff[k + 1])
                cache[u] = (
                    msub[s:e], mpi[s:e], mrs[s:e], mre[s:e], int(mcarry[k])
                )
        entries = [cache[u] for u in uniq]
        cnt_u = np.fromiter(
            (e[0].size for e in entries), dtype=np.int64, count=len(entries)
        )
        off = np.concatenate(([0], np.cumsum(cnt_u)))
        if len(entries):
            sub = np.concatenate([e[0] for e in entries])
            pi = np.concatenate([e[1] for e in entries])
            rs = np.concatenate([e[2] for e in entries])
            re_ = np.concatenate([e[3] for e in entries])
        else:
            sub = np.zeros(0, dtype=object)
            pi = rs = re_ = np.zeros(0, dtype=np.int64)
        carry = np.fromiter(
            (e[4] for e in entries), dtype=np.int64, count=len(entries)
        )
    if carry.any():
        # a term carries posInc past itself with emissions the common
        # context can't replay — exact scalar fallback (never reached by
        # the registered chains: DEFAULT_FLAGS always generates parts)
        return _flat_fallback(texts, scalar_fns[1 if keep_offsets else 0], keep_offsets)
    cnt = np.diff(off)
    if lower and sub.size:
        sub = pd.Index(sub).str.lower().to_numpy(dtype=object)

    # per-unique inclusive posInc prefix + totals (vocabulary-bounded)
    n_uniq = len(uniq)
    total = np.zeros(n_uniq, dtype=np.int64)
    if pi.size:
        cpi = np.cumsum(pi)
        seg_start = np.repeat(off[:-1], cnt)
        prefix_pi = cpi - cpi[seg_start] + pi[seg_start]
        nz = cnt > 0
        total[nz] = cpi[off[1:][nz] - 1] - cpi[off[:-1][nz]] + pi[off[:-1][nz]]
    else:
        prefix_pi = pi

    c_occ = cnt[inv]
    adv_occ = total[inv]
    n_out = int(c_occ.sum())
    if n_out == 0:
        return _empty_flat(n_docs, keep_offsets)

    doc_first = np.searchsorted(tdoc, np.arange(n_docs))
    # doc-leading swallowed tokens (all-delimiter words before the first
    # emission keep their +1 accumulated increment -> leading hole):
    # every token before the doc's first EMITTING token is one of them.
    n_occ = tdoc.size
    has_c = c_occ > 0
    idx = np.arange(n_occ, dtype=np.int64)
    masked = np.where(has_c, idx, n_occ)
    safe_first = np.minimum(doc_first, max(n_occ - 1, 0))
    if n_occ:
        # sentinel so a trailing empty doc's boundary (== n_occ) is a valid
        # reduceat index WITHOUT clamping it into the previous doc's
        # segment (clamping truncated that doc's min and lost its leading
        # hole when the batch ended in empty docs)
        red = np.minimum.reduceat(np.append(masked, n_occ), doc_first)
    else:
        red = masked
    # docs with no tokens / no emissions never contribute rows
    lead = np.maximum(red - doc_first, 0)
    lead[doc_first >= n_occ] = 0

    # expand occurrences -> emissions
    occ_rep = np.repeat(idx, c_occ)
    ends_c = np.cumsum(c_occ)
    within = np.arange(n_out, dtype=np.int64) - np.repeat(ends_c - c_occ, c_occ)
    flat_idx = np.repeat(off[:-1][inv], c_occ) + within

    # positions: (sum of total posInc over preceding tokens in the doc)
    # + within-term inclusive prefix - 1 + doc-leading hole correction
    cadv = np.cumsum(adv_occ)
    excl = cadv - adv_occ
    doc_anchor = excl[safe_first]
    base_pos = excl - doc_anchor[tdoc]
    doc_idx_out = tdoc[occ_rep]
    positions = base_pos[occ_rep] + prefix_pi[flat_idx] - 1 + lead[doc_idx_out]

    flat = {
        "doc_idx": doc_idx_out,
        "terms": sub[flat_idx],
        "positions": positions,
        "doclens": np.bincount(doc_idx_out, minlength=n_docs).astype(np.int64),
    }
    if keep_offsets:
        flat["starts"] = base["starts"][occ_rep] + rs[flat_idx]
        flat["ends"] = base["starts"][occ_rep] + re_[flat_idx]
    return flat


def make_term_map_analyzer(probe, lower=True, scalar_fns=None):
    """Bind a batched flat analyzer callable (texts, keep_offsets) -> flat
    dict for tokenizer.register_flat_analyzer / _CUSTOM_FLAT.  The closure
    carries a per-process emission cache that persists across Arrow
    batches (and across tasks in reused Python workers)."""
    cache: dict = {}

    def _fn(texts, keep_offsets):
        return term_map_flat(
            texts, keep_offsets, probe, lower, scalar_fns, cache
        )

    return _fn
