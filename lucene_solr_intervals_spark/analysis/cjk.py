"""CJK analysis: width normalization + script bigrams, fully batched.

Reference transcription (semantics + tables):
  CJKWidthFilter.java:34   fullwidth ASCII -> basic latin; halfwidth
                           katakana -> kana, voice marks combined with a
                           preceding base form (KANA_NORM / KANA_COMBINE
                           tables transcribed verbatim)
  CJKBigramFilter.java:48  HAN/HIRAGANA/KATAKANA/HANGUL flag-selected
                           bigrams over the codepoints of adjacent
                           (offset-aligned) CJK tokens; lone CJK chars
                           emit unigrams; outputUnigrams interleaves
                           A + AB + B + BC + C with bigrams at posInc 0
  CJKAnalyzer.java:43      StandardTokenizer -> CJKWidth -> LowerCase ->
                           CJKBigram -> StopFilter
Pinned by the transcribed TestCJKBigramFilter / TestCJKWidthFilter
vectors in tests/test_cjk.py.

The tokenizer stage reproduces StandardTokenizer's observable CJK
behavior: alphanumeric runs as single tokens, Han and Hiragana one token
PER CHARACTER, Katakana and Hangul as runs — which is why the bigram
filter's cross-token alignment check (startOffset == lastEndOffset)
forms bigrams across scripts, e.g. Han+Hiragana.

Scale: the whole chain is numpy over one utf-32 buffer per Arrow batch —
script classification by codepoint LUT, token runs by diff-detection,
width folding as a dictionary pass over UNIQUE tokens (analysis/termmap
precedent), bigram strings as uint32 pair views (dtype '<U2') — no
per-document or per-token Python in the hot path.
"""

from __future__ import annotations

import numpy as np

HAN = 1
HIRAGANA = 2
KATAKANA = 4
HANGUL = 8
ALL_CJK = HAN | HIRAGANA | KATAKANA | HANGUL

# ---------------------------------------------------------------- width
# halfwidth kana mappings 0xFF65-0xFF9F (CJKWidthFilter.java KANA_NORM)
_KANA_NORM = [
    0x30FB, 0x30F2, 0x30A1, 0x30A3, 0x30A5, 0x30A7, 0x30A9, 0x30E3, 0x30E5,
    0x30E7, 0x30C3, 0x30FC, 0x30A2, 0x30A4, 0x30A6, 0x30A8, 0x30AA, 0x30AB,
    0x30AD, 0x30AF, 0x30B1, 0x30B3, 0x30B5, 0x30B7, 0x30B9, 0x30BB, 0x30BD,
    0x30BF, 0x30C1, 0x30C4, 0x30C6, 0x30C8, 0x30CA, 0x30CB, 0x30CC, 0x30CD,
    0x30CE, 0x30CF, 0x30D2, 0x30D5, 0x30D8, 0x30DB, 0x30DE, 0x30DF, 0x30E0,
    0x30E1, 0x30E2, 0x30E4, 0x30E6, 0x30E8, 0x30E9, 0x30EA, 0x30EB, 0x30EC,
    0x30ED, 0x30EF, 0x30F3, 0x3099, 0x309A,
]
# kana combining diffs 0x30A6-0x30FD (CJKWidthFilter.java KANA_COMBINE_*)
_KANA_COMBINE_VOICED = [
    78, 0, 0, 0, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1,
    0, 1, 0, 1, 0, 0, 1, 0, 1, 0, 1, 0, 0, 0, 0, 0, 0, 1, 0, 0, 1, 0, 0, 1,
    0, 0, 1, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 8, 8, 8, 8, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1,
]
_KANA_COMBINE_HALF_VOICED = [
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 2, 0, 0, 2, 0, 0, 2,
    0, 0, 2, 0, 0, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
]


def cjk_width_fold(term: str) -> str:
    """CJKWidthFilter.incrementToken over one term: fullwidth ASCII
    variants fold to basic latin; halfwidth katakana folds to kana, with
    voice marks (0xFF9E/0xFF9F) combined into a preceding base form when
    possible (combining deletes the mark, shrinking the term — the
    reference leaves the offset attribute untouched, which its bigram
    refill() detects as 'crazy offsets')."""
    out: list[str] = []
    for ch in term:
        o = ord(ch)
        if 0xFF01 <= o <= 0xFF5E:
            out.append(chr(o - 0xFEE0))
        elif 0xFF65 <= o <= 0xFF9F:
            if o in (0xFF9E, 0xFF9F) and out:
                prev = ord(out[-1])
                if 0x30A6 <= prev <= 0x30FD:
                    d = (
                        _KANA_COMBINE_HALF_VOICED
                        if o == 0xFF9F
                        else _KANA_COMBINE_VOICED
                    )[prev - 0x30A6]
                    if d:
                        out[-1] = chr(prev + d)
                        continue
            out.append(chr(_KANA_NORM[o - 0xFF65]))
        else:
            out.append(ch)
    return "".join(out)


# ------------------------------------------------------- classification
_SEP, _WORD, _HAN, _HIRA, _KATA, _HANG = 0, 1, 2, 3, 4, 5
_CJK_OF_FLAG = {_HAN: HAN, _HIRA: HIRAGANA, _KATA: KATAKANA, _HANG: HANGUL}

_HAN_RANGES = [
    (0x2E80, 0x2FD5), (0x3005, 0x3005), (0x3007, 0x3007), (0x3021, 0x3029),
    (0x3038, 0x303B), (0x3400, 0x4DBF), (0x4E00, 0x9FFF), (0xF900, 0xFAFF),
]
_HIRA_RANGES = [(0x3041, 0x3096), (0x3099, 0x309F)]
_KATA_RANGES = [(0x30A1, 0x30FA), (0x30FC, 0x30FF), (0x31F0, 0x31FF),
                (0xFF66, 0xFF9F)]
_HANG_RANGES = [(0x1100, 0x11FF), (0x3130, 0x318F), (0xA960, 0xA97F),
                (0xAC00, 0xD7A3), (0xD7B0, 0xD7FF)]

_LUTS: dict[str, np.ndarray] = {}


def _get_lut(word_chars: str) -> np.ndarray:
    """Codepoint class LUT over the BMP, built lazily (the isalnum sweep
    costs ~10ms — keep it off the import path).  word_chars:
      "unicode"  StandardTokenizer-style word class (str.isalnum)
      "code"     the engine's source-code class [A-Za-z0-9_] (lets CJK
                 chains share doc-length statistics with the `code`
                 tokenizer for exact BM25 invariance oracles)
    """
    lut = _LUTS.get(word_chars)
    if lut is None:
        lut = np.zeros(0x10000, dtype=np.int8)
        if word_chars == "code":
            for r in (range(48, 58), range(65, 91), range(97, 123), (95,)):
                lut[list(r)] = _WORD
        else:
            import unicodedata

            # isalnum plus combining marks (UAX29 Extend: a nonspacing
            # mark continues its word — TestCJKAnalyzer
            # testNonIdeographicNonLetter's رُوبرت stays one token)
            alnum = [
                cp
                for cp in range(0x10000)
                if chr(cp).isalnum()
                or unicodedata.category(chr(cp)) in ("Mn", "Mc", "Me")
            ]
            lut[alnum] = _WORD
        for cls, ranges in (
            (_HAN, _HAN_RANGES), (_HIRA, _HIRA_RANGES),
            (_KATA, _KATA_RANGES), (_HANG, _HANG_RANGES),
        ):
            for lo, hi in ranges:
                lut[lo : hi + 1] = cls
        _LUTS[word_chars] = lut
    return lut


def _classify(arr: np.ndarray, word_chars: str) -> np.ndarray:
    lut = _get_lut(word_chars)
    cls = np.zeros(arr.size, dtype=np.int8)
    bmp = arr < 0x10000
    cls[bmp] = lut[arr[bmp]]
    if not bmp.all():
        hi = ~bmp
        # supplementary Han (CJK extensions B..F / compat supplement)
        cls[hi & (arr >= 0x20000) & (arr <= 0x2FA1F)] = _HAN
        if word_chars != "code":
            other = hi & (cls == _SEP) & ~((arr >= 0x20000) & (arr <= 0x2FA1F))
            if other.any():
                for cp in np.unique(arr[other]):
                    if chr(int(cp)).isalnum():
                        cls[other & (arr == cp)] = _WORD
    return cls


# ------------------------------------------------------------ the chain
def cjk_flat(
    texts,
    flags: int = ALL_CJK,
    output_unigrams: bool = False,
    stopwords=None,
    word_chars: str = "unicode",
    keep_offsets: bool = False,
):
    """Batched CJKAnalyzer chain -> tokenize_flat dict shape."""
    import pandas as pd

    from .termmap import _empty_flat
    from .tokenizer import _stop_filter_flat

    n_docs = len(texts)
    strs = [t if isinstance(t, str) else "" for t in texts]
    clens = np.fromiter((len(s) for s in strs), dtype=np.int64, count=n_docs)
    doc_off = np.zeros(n_docs, dtype=np.int64)
    if n_docs > 1:
        np.cumsum(clens[:-1] + 1, out=doc_off[1:])
    joined = "\n".join(strs)
    if not joined:
        return _empty_flat(n_docs, keep_offsets)
    arr = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
    cls = _classify(arr, word_chars)

    # token runs: word/katakana/hangul maximal same-class runs; han and
    # hiragana one token per character (StandardTokenizer emission shape)
    nonsep = cls != _SEP
    per_char = (cls == _HAN) | (cls == _HIRA)
    prev_cls = np.empty_like(cls)
    prev_cls[0] = _SEP
    prev_cls[1:] = cls[:-1]
    next_cls = np.empty_like(cls)
    next_cls[-1] = _SEP
    next_cls[:-1] = cls[1:]
    start_m = nonsep & ((prev_cls != cls) | per_char)
    end_m = nonsep & ((next_cls != cls) | per_char)
    ts = np.flatnonzero(start_m)
    if ts.size == 0:
        return _empty_flat(n_docs, keep_offsets)
    te = np.flatnonzero(end_m) + 1
    tok_cls = cls[ts]
    tok_doc = np.searchsorted(doc_off, ts, side="right") - 1
    s_rel = ts - doc_off[tok_doc]
    e_rel = te - doc_off[tok_doc]
    tlen = te - ts

    # term strings: scatter into a space-padded buffer, one C-level split
    n_tok = ts.size
    total = int(tlen.sum())
    cum_excl = np.cumsum(tlen) - tlen
    within_t = np.arange(total, dtype=np.int64) - np.repeat(cum_excl, tlen)
    src_idx = np.repeat(ts, tlen) + within_t
    buf = np.full(total + n_tok, 32, dtype=np.uint32)
    buf[np.repeat(cum_excl + np.arange(n_tok), tlen) + within_t] = arr[src_idx]
    terms = np.asarray(
        buf.tobytes().decode("utf-32-le").split(), dtype=object
    )

    # width fold + lowercase as a DICTIONARY pass over unique tokens
    inv, uniq = pd.factorize(terms)
    folded_u = np.asarray(
        [cjk_width_fold(u).lower() for u in uniq.tolist()], dtype=object
    )
    flen_u = np.fromiter((len(f) for f in folded_u), dtype=np.int64,
                         count=len(folded_u))
    olen_u = np.fromiter((len(u) for u in uniq), dtype=np.int64,
                         count=len(uniq))
    crazy_u = flen_u != olen_u  # reference refill(): end-start != len

    sel_flag = np.zeros(6, dtype=bool)
    for c, f in _CJK_OF_FLAG.items():
        sel_flag[c] = bool(flags & f)
    sel = sel_flag[tok_cls]

    # chains: maximal runs of CONSECUTIVE selected tokens whose offsets
    # align (startOffset == lastEndOffset — CJKBigramFilter.java:171)
    prev_sel = np.empty_like(sel)
    prev_sel[0] = False
    prev_sel[1:] = sel[:-1]
    aligned = np.zeros(n_tok, dtype=bool)
    aligned[1:] = ts[1:] == te[:-1]
    chain_start = sel & ~(prev_sel & aligned)

    # expand selected tokens to codepoints of their FOLDED terms
    sel_idx = np.flatnonzero(sel)
    flen_s = flen_u[inv[sel_idx]]
    n_cp = int(flen_s.sum())
    if n_cp:
        fbuf = np.frombuffer(
            "".join(folded_u.tolist()).encode("utf-32-le"), dtype=np.uint32
        )
        uoff = np.cumsum(flen_u) - flen_u
        cum_s = np.cumsum(flen_s) - flen_s
        win_cp = np.arange(n_cp, dtype=np.int64) - np.repeat(cum_s, flen_s)
        cp_tok = np.repeat(sel_idx, flen_s)
        cp_val = fbuf[np.repeat(uoff[inv[sel_idx]], flen_s) + win_cp]
        cp_crazy = crazy_u[inv[cp_tok]]
        cp_start = np.where(cp_crazy, s_rel[cp_tok], s_rel[cp_tok] + win_cp)
        cp_end = np.where(cp_crazy, e_rel[cp_tok], s_rel[cp_tok] + win_cp + 1)
        # chain membership per codepoint
        chain_id_tok = np.cumsum(chain_start) - 1  # valid on sel rows
        cp_chain = chain_id_tok[cp_tok]
        chain_len = np.bincount(cp_chain, minlength=int(cp_chain.max()) + 1)
        cum_ch = np.cumsum(chain_len) - chain_len
        win_ch = np.arange(n_cp, dtype=np.int64) - cum_ch[cp_chain]
        L = chain_len[cp_chain]
        has_next = win_ch < L - 1
        if output_unigrams:
            cp_cnt = 1 + has_next.astype(np.int64)
        else:
            cp_cnt = has_next.astype(np.int64) + (L == 1).astype(np.int64)
    else:
        cp_cnt = np.zeros(0, dtype=np.int64)

    # ---- assemble emissions in stream order: units = pass tokens (one
    # emission) interleaved with selected tokens' codepoints (0-2 each)
    unit_of_tok = np.where(sel, flen_u[inv], 1)
    n_units = int(unit_of_tok.sum())
    unit_tok = np.repeat(np.arange(n_tok), unit_of_tok)
    unit_is_cp = sel[unit_tok]
    # map each cp-unit to its row in the cp arrays (cp rows are in the
    # same global order as cp units)
    unit_cnt = np.ones(n_units, dtype=np.int64)
    if n_cp:
        unit_cnt[unit_is_cp] = cp_cnt
    n_em = int(unit_cnt.sum())
    if n_em == 0:
        return _empty_flat(n_docs, keep_offsets)
    em_unit = np.repeat(np.arange(n_units), unit_cnt)
    cum_u = np.cumsum(unit_cnt) - unit_cnt
    em_slot = np.arange(n_em, dtype=np.int64) - cum_u[em_unit]
    em_tok = unit_tok[em_unit]
    em_doc = tok_doc[em_tok]

    em_terms = np.empty(n_em, dtype=object)
    em_pi = np.ones(n_em, dtype=np.int64)
    em_s = np.empty(n_em, dtype=np.int64)
    em_e = np.empty(n_em, dtype=np.int64)

    pass_m = ~unit_is_cp[em_unit]
    if pass_m.any():
        pt = em_tok[pass_m]
        em_terms[pass_m] = folded_u[inv[pt]]
        em_s[pass_m] = s_rel[pt]
        em_e[pass_m] = e_rel[pt]
    if n_cp:
        cp_row_of_unit = np.cumsum(unit_is_cp) - 1  # valid on cp units
        cp_row = cp_row_of_unit[em_unit]
        cpm = ~pass_m
        # which emissions are bigrams: unibi -> slot 1; bigram-only ->
        # slot 0 of a has_next codepoint
        if output_unigrams:
            bi_m = cpm & (em_slot == 1)
        else:
            bi_m = cpm & has_next[cp_row]
        uni_m = cpm & ~bi_m
        if uni_m.any():
            r = cp_row[uni_m]
            em_terms[uni_m] = (
                cp_val[r].astype("uint32").view("<U1").astype(object)
            )
            em_s[uni_m] = cp_start[r]
            em_e[uni_m] = cp_end[r]
        if bi_m.any():
            r = cp_row[bi_m]
            pair = np.empty((r.size, 2), dtype=np.uint32)
            pair[:, 0] = cp_val[r]
            pair[:, 1] = cp_val[r + 1]
            em_terms[bi_m] = pair.view("<U2").ravel().astype(object)
            em_s[bi_m] = cp_start[r]
            em_e[bi_m] = cp_end[r + 1]
            if output_unigrams:
                em_pi[bi_m] = 0  # bigram stacks on the unigram it follows

    # positions: per-doc cumulative posInc - 1
    g = np.cumsum(em_pi)
    first_em = np.searchsorted(em_doc, np.arange(n_docs))
    anchor = (g - em_pi)[np.minimum(first_em, n_em - 1)]
    positions = g - 1 - anchor[em_doc]

    flat = {
        "doc_idx": em_doc,
        "terms": em_terms,
        "positions": positions,
        "doclens": np.bincount(em_doc, minlength=n_docs).astype(np.int64),
    }
    if keep_offsets:
        flat["starts"], flat["ends"] = em_s, em_e
    if stopwords:
        flat = _stop_filter_flat(flat, stopwords)
        flat["doclens"] = np.bincount(
            flat["doc_idx"], minlength=n_docs
        ).astype(np.int64)
    return flat


def register_cjk_analyzer(
    name: str,
    flags: int = ALL_CJK,
    output_unigrams: bool = False,
    stopwords=None,
    word_chars: str = "unicode",
) -> None:
    """Register a CJKAnalyzer-style chain (width fold -> lowercase ->
    script bigrams -> stop) on the analyzer SPI, riding the batched flat
    path."""
    from .tokenizer import register_flat_analyzer

    def _fn(texts, keep_offsets):
        return cjk_flat(
            texts, flags, output_unigrams, stopwords, word_chars, keep_offsets
        )

    register_flat_analyzer(name, _fn)


# CJKAnalyzer role: all scripts bigrammed, english-style stop set (the
# reference ships an English stopword file in its cjk resources)
def register_default_cjk() -> None:
    from .tokenizer import ANALYZERS, ENGLISH_STOP_WORDS

    if "cjk" not in ANALYZERS:
        register_cjk_analyzer("cjk", ALL_CJK, False, ENGLISH_STOP_WORDS)


register_default_cjk()
