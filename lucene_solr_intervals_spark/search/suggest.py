"""Suggest / autocomplete over the term dictionary and stored fields.

Analogs of the reference suggest module (lucene/suggest):

* prefix suggester — AnalyzingSuggester / WFSTCompletionLookup role
  (lucene/suggest/src/java/org/apache/lucene/search/suggest/analyzing/
  AnalyzingSuggester.java:86): completions of a prefix ordered by weight.
  The FST over sorted inputs maps to the term-sorted dictionary DataFrame
  with a pushdown-able `startswith` range predicate; weight = df (the
  "popularity" a search box wants) or any supplied weight column.
* infix suggester — AnalyzingInfixSuggester.java:109: matches the pattern
  anywhere inside the suggestion (it searches an auxiliary index of
  suggestion texts; here a `contains` filter over the same dictionary —
  both are a scan of the suggestion set, ours pruned by Catalyst).
* document-title suggester — AnalyzingInfixSuggester's stored-payload mode:
  suggest full stored strings (e.g. titles) weighted by a numeric column.

All are single pruned scans + a top-k (TakeOrderedAndProject) — no driver
materialization of the dictionary, which at 10^12-doc scale has billions of
terms and must stay distributed.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf resolves annotations here
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def suggest_prefix(
    index, prefix: str, k: int = 10, field: str | None = None,
    exact_first: bool = False,
) -> DataFrame:
    """Top-k (suggestion, weight) completions of `prefix`, weight = df,
    ordered weight desc then suggestion asc (SortedInputIterator order).

    exact_first=True is the WFSTCompletionLookup mode
    (lucene/suggest/src/java/org/apache/lucene/search/suggest/fst/
    WFSTCompletionLookup.java:40 `exactFirst` ctor flag): an exact key
    match is returned FIRST even when heavier completions exist, then the
    remaining completions by weight."""
    f = field or getattr(index, "default_field", "text")
    ts = index.term_stats.where(F.col("field") == f)
    order = [F.desc("weight"), F.asc("suggestion")]
    if exact_first:
        order = [F.desc((F.col("suggestion") == prefix).cast("int"))] + order
    return (
        ts.where(F.col("term").startswith(prefix))
        .select(
            F.col("term").alias("suggestion"),
            F.col("df").cast("long").alias("weight"),
        )
        .orderBy(*order)
        .limit(k)
    )


def build_infix_index(index, field: str | None = None) -> DataFrame:
    """Auxiliary infix index (the AnalyzingInfixSuggester.java:109 build
    step — it indexes the suggestion text so lookups are INDEX reads, not
    scans).  Here: explode every suffix of every term into a (sub, term,
    weight) relation, sorted by `sub`.  An infix hit is then
    `sub startswith pattern` — a RANGE predicate, so a parquet-persisted
    aux table is min/max-pruned to the matching row groups instead of
    running `contains` over the whole dictionary (at billions of terms the
    contains scan reads everything; the suffix relation is ~avg_len× the
    dictionary but each lookup touches only the matching range)."""
    f = field or getattr(index, "default_field", "text")
    ts = index.term_stats.where(F.col("field") == f)
    return (
        ts.select(
            "term",
            # the aux relation remembers which field it was built for, so a
            # lookup against the wrong field cannot silently return
            # wrong-field suggestions (it filters to nothing instead)
            F.lit(f).alias("field"),
            F.col("df").cast("long").alias("weight"),
            F.explode(
                F.expr(
                    "transform(sequence(1, length(term)),"
                    " i -> substring(term, i, length(term)))"
                )
            ).alias("sub"),
        )
        .sortWithinPartitions("sub")
    )


def suggest_infix(
    index,
    pattern: str,
    k: int = 10,
    field: str | None = None,
    aux: DataFrame | None = None,
) -> DataFrame:
    """Top-k (suggestion, weight) where `pattern` occurs anywhere in the
    term (AnalyzingInfixSuggester.java:109 lookup semantics).

    With `aux` (from build_infix_index, typically persisted/parquet-backed):
    the lookup is a pushdown-able startswith range over the suffix relation
    — the scale path.  Without it: a documented v1 `contains` filter over
    the dictionary (correct, but un-pruned)."""
    f = field or getattr(index, "default_field", "text")
    if aux is not None:
        if "field" in aux.columns:
            # guard against an aux index built for a different field
            aux = aux.where(F.col("field") == f)
        hits = (
            aux.where(F.col("sub").startswith(pattern))
            .groupBy("term")
            .agg(F.max("weight").alias("weight"))  # dedupe repeat infixes
        )
        return (
            hits.select(F.col("term").alias("suggestion"), "weight")
            .orderBy(F.desc("weight"), F.asc("suggestion"))
            .limit(k)
        )
    ts = index.term_stats.where(F.col("field") == f)
    return (
        ts.where(F.col("term").contains(pattern))
        .select(
            F.col("term").alias("suggestion"),
            F.col("df").cast("long").alias("weight"),
        )
        .orderBy(F.desc("weight"), F.asc("suggestion"))
        .limit(k)
    )


ALPHA = 0.4  # stupid-backoff factor (FreeTextSuggester.java ALPHA = 0.4)


def build_freetext_model(
    docs_df: DataFrame, text_col: str = "text", analyzer: str = "code"
) -> DataFrame:
    """FreeTextSuggester model build (lucene/suggest/src/java/org/apache/
    lucene/search/suggest/analyzing/FreeTextSuggester.java:91: an n-gram
    language model over the analyzed text, default ngrams=2).

    Returns the gram-count relation (ord, ctx, token, cnt):
      ord=1  unigrams   ctx=''          cnt = occurrences of token
      ord=2  bigrams    ctx=prev token  cnt = occurrences of (ctx, token)

    One tokenize pass + two groupBys; the model is a DataFrame, so a 100 TB
    corpus's model build is the same shuffle shape as word count.  The
    (ctx, token) pairs are derived from the tokenizer's terms ARRAY with
    pure column expressions — zip each token with its predecessor via a
    shifted slice — so the only Python boundary is the (batched, flat)
    tokenizer UDF itself; no mapInPandas, no per-row gram loop."""
    from ..index.builder import tokenize_expr

    tok = tokenize_expr(analyzer)
    pairs = (
        docs_df.select(tok(F.col(text_col)).alias("t"))
        .select(F.col("t.terms").alias("terms"))
        .where(F.size("terms") > 0)
        .withColumn(
            "ctxs",
            F.concat(
                F.array(F.lit("")),
                F.expr("slice(terms, 1, greatest(size(terms) - 1, 0))"),
            ),
        )
        .select(F.explode(F.arrays_zip("ctxs", "terms")).alias("z"))
        .select(F.col("z.ctxs").alias("ctx"), F.col("z.terms").alias("token"))
    )
    uni = pairs.groupBy("token").agg(F.count(F.lit(1)).alias("cnt")).select(
        F.lit(1).alias("ord"), F.lit("").alias("ctx"), "token", "cnt"
    )
    bi = (
        pairs.where(F.col("ctx") != "")
        .groupBy("ctx", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.lit(2).alias("ord"), "ctx", "token", "cnt")
    )
    return uni.unionByName(bi)


def suggest_free_text(
    model: DataFrame,
    context: str,
    prefix: str = "",
    k: int = 10,
) -> DataFrame:
    """FreeTextSuggester.lookup (FreeTextSuggester.java:366): predict the
    next token after `context` (optionally completing `prefix`) with
    stupid-backoff scoring:

      bigram hit:   score = count(ctx, w) / count(ctx)
      unigram back: score = ALPHA * count(w) / total_tokens
                    (only for w the bigram level did not already suggest —
                    the seen-set dedup at :443)

    Everything stays in-plan: the denominators are 1-row aggregates
    cross-joined in, so no count ever hits the driver."""
    uni = model.where(F.col("ord") == 1)
    bi = model.where((F.col("ord") == 2) & (F.col("ctx") == context))
    if prefix:
        uni = uni.where(F.col("token").startswith(prefix))
        bi = bi.where(F.col("token").startswith(prefix))
    ctx_cnt = (
        model.where((F.col("ord") == 1) & (F.col("token") == context))
        .agg(F.coalesce(F.sum("cnt"), F.lit(0)).alias("ctx_cnt"))
    )
    tot = model.where(F.col("ord") == 1).agg(F.sum("cnt").alias("tot"))
    top = bi.crossJoin(F.broadcast(ctx_cnt)).select(
        "token",
        (F.col("cnt").cast("double") / F.col("ctx_cnt")).alias("score"),
    )
    back = (
        uni.join(bi.select("token"), "token", "left_anti")
        .crossJoin(F.broadcast(tot))
        .select(
            "token",
            (F.lit(ALPHA) * F.col("cnt").cast("double") / F.col("tot")).alias(
                "score"
            ),
        )
    )
    return (
        top.unionByName(back)
        .orderBy(F.desc("score"), F.asc("token"))
        .limit(k)
        .select(F.col("token").alias("suggestion"), "score")
    )


def build_stored_infix_index(
    df: DataFrame, text_col: str, weight_col: str
) -> DataFrame:
    """Auxiliary suffix relation for STORED-string suggestions — the same
    treatment build_infix_index gives the term dictionary: every character
    suffix of the lowered stored string becomes a (sub, suggestion, weight)
    row, sorted by `sub`, so an infix lookup is a min/max-prunable
    startswith RANGE instead of a contains scan over every stored value
    (AnalyzingInfixSuggester.java:109 — lookups are index reads)."""
    return (
        df.select(
            F.col(text_col).alias("suggestion"),
            F.col(weight_col).cast("double").alias("weight"),
            F.explode(
                F.expr(
                    f"transform(sequence(1, length(lower({text_col}))),"
                    f" i -> substring(lower({text_col}), i,"
                    f" length(lower({text_col}))))"
                )
            ).alias("sub"),
        )
        .sortWithinPartitions("sub")
    )


def suggest_stored(
    df: DataFrame,
    text_col: str,
    weight_col: str,
    query: str,
    k: int = 10,
    infix: bool = True,
    aux: DataFrame | None = None,
) -> DataFrame:
    """Suggest full stored strings (AnalyzingInfixSuggester payload mode):
    case-insensitive prefix/infix match over a stored column, weighted by a
    numeric column — e.g. suggest document titles by view count.

    With `aux` (from build_stored_infix_index, typically parquet-persisted):
    the infix lookup becomes a pushdown-able startswith range over the
    suffix relation — the scale path.  Without it: a contains scan
    (correct, but reads every stored value)."""
    pat = query.lower()
    if infix and aux is not None:
        hits = (
            aux.where(F.col("sub").startswith(pat))
            .groupBy("suggestion")
            .agg(F.max("weight").alias("weight"))  # dedupe repeat infixes
        )
        return (
            hits.orderBy(F.desc("weight"), F.asc("suggestion"))
            .limit(k)
            .select("suggestion", "weight")
        )
    t = F.lower(F.col(text_col))
    cond = t.contains(pat) if infix else t.startswith(pat)
    return (
        df.where(cond)
        .select(
            F.col(text_col).alias("suggestion"),
            F.col(weight_col).cast("double").alias("weight"),
        )
        # same dedup rule as the aux path: one row per distinct stored
        # value, max weight — both modes agree on identical inputs
        .groupBy("suggestion")
        .agg(F.max("weight").alias("weight"))
        .orderBy(F.desc("weight"), F.asc("suggestion"))
        .limit(k)
    )


SEP = "\x1f"  # AnalyzingSuggester SEP_LABEL role (token separator byte)


def build_analyzing_index(
    df: DataFrame,
    text_col: str,
    weight_col: str,
    analyzer: str = "simple",
    preserve_sep: bool = True,
) -> DataFrame:
    """AnalyzingSuggester index side (analyzing/AnalyzingSuggester.java:115
    FST<Weight,Surface>): each stored suggestion is ANALYZED at index time
    and keyed by its analyzed form (tokens joined by a separator when
    PRESERVE_SEP, concatenated otherwise); the surface (original) string
    and weight ride along.  The sorted-FST role maps to a key-sorted
    relation with a pushdown-able startswith range — one Arrow-batched
    analysis pass, no per-row Python in the plan beyond it."""
    from ..analysis.tokenizer import ANALYZERS

    if analyzer not in ANALYZERS:
        raise ValueError(f"unknown analyzer {analyzer!r}")
    sep = SEP if preserve_sep else ""

    @F.pandas_udf("string")
    def _key(texts: pd.Series) -> pd.Series:
        fn = ANALYZERS[analyzer]
        return texts.map(lambda t: sep.join(fn(t)[0]) if t is not None else "")

    # nondeterministic marker: stops Catalyst from DUPLICATING the analysis
    # UDF when a later filter (the startswith lookup) is pushed through the
    # projection — the inline path then analyzes each suggestion exactly
    # once (PLANS_r6.md; the persisted-index path never re-analyzes at all)
    _key = _key.asNondeterministic()

    return (
        df.select(
            _key(F.col(text_col)).alias("key"),
            F.col(text_col).alias("suggestion"),
            F.col(weight_col).cast("double").alias("weight"),
        )
        .where(F.col("key") != "")  # un-analyzable suggestions are dropped
        .sortWithinPartitions("key")
    )


def suggest_analyzing(
    source: DataFrame,
    query: str,
    k: int = 10,
    *,
    text_col: str | None = None,
    weight_col: str | None = None,
    analyzer: str = "simple",
    preserve_sep: bool = True,
    exact_first: bool = True,
) -> DataFrame:
    """AnalyzingSuggester lookup (AnalyzingSuggester.java:86 class doc):
    the query is analyzed with the same chain, completions are suggestions
    whose ANALYZED form starts with the analyzed query, ranked by weight
    descending (FST cost = MAX - weight), ties broken by analyzed form then
    surface; EXACT_FIRST returns exact analyzed matches first.  Analysis
    merges surface forms — "The Ghost" and "ghost" share the key "ghost"
    under a stop+lowercase chain and both surface for query "gho".

    `source` is either a prebuilt build_analyzing_index relation or a raw
    stored-field DataFrame (pass text_col/weight_col to analyze inline).
    An empty analyzed query returns no results (reference limitation list:
    "Lookups with the empty string return no results")."""
    from ..analysis.tokenizer import ANALYZERS

    if text_col is not None:
        source = build_analyzing_index(
            source, text_col, weight_col, analyzer, preserve_sep
        )
    sep = SEP if preserve_sep else ""
    qkey = sep.join(ANALYZERS[analyzer](query)[0])
    if not qkey:
        return source.select("suggestion", "weight").limit(0)
    hits = source.where(F.col("key").startswith(qkey))
    order = [F.desc("weight"), F.asc("key"), F.asc("suggestion")]
    if exact_first:
        order = [F.desc((F.col("key") == qkey).cast("int"))] + order
    return hits.orderBy(*order).limit(k).select("suggestion", "weight")


_FUZZY_ALPHABET = "abcdefghijklmnopqrstuvwxyz0123456789_"


def _edit1_prefixes(prefix: str, transpositions: bool = True) -> list[str]:
    """All strings within one edit of `prefix` (deletions, substitutions,
    insertions, adjacent transpositions) — the Levenshtein-automaton
    frontier of FuzzySuggester, enumerated (bounded: ~38 x len variants)."""
    out = {prefix}
    for i in range(len(prefix)):
        out.add(prefix[:i] + prefix[i + 1 :])  # deletion
        for c in _FUZZY_ALPHABET:
            out.add(prefix[:i] + c + prefix[i + 1 :])  # substitution
    for i in range(len(prefix) + 1):
        for c in _FUZZY_ALPHABET:
            out.add(prefix[:i] + c + prefix[i:])  # insertion
    if transpositions:
        for i in range(len(prefix) - 1):
            out.add(
                prefix[:i] + prefix[i + 1] + prefix[i] + prefix[i + 2 :]
            )
    return sorted(out)


def suggest_fuzzy(
    index,
    prefix: str,
    k: int = 10,
    field: str | None = None,
    max_edits: int = 1,
    prefix_length: int = 1,
    transpositions: bool = True,
) -> DataFrame:
    """FuzzySuggester analog (lucene/suggest/src/java/org/apache/lucene/
    search/suggest/analyzing/FuzzySuggester.java:66): prefix completions
    tolerant to typos — the lookup key may differ from the indexed
    completions by up to `max_edits` (default 1, like the reference),
    with the first `prefix_length` chars required to match exactly
    (FuzzySuggester nonFuzzyPrefix, :84).

    The reference intersects a Levenshtein automaton with the suggest FST;
    here the automaton's language is ENUMERATED (bounded — 1 edit over a
    36-char alphabet is ~38 x len variants) and pushed down as a per-length
    `substring(term, 1, L) IN (variants)` predicate: a handful of hash-set
    probes over the term dictionary, each a prunable prefix range — never
    a full-dictionary edit-distance scan.  Weight = df, like
    suggest_prefix."""
    if max_edits not in (0, 1):
        raise ValueError("max_edits 0 or 1 (reference default; 2 explodes)")
    f = field or getattr(index, "default_field", "text")
    ts = index.term_stats.where(F.col("field") == f)
    variants = (
        _edit1_prefixes(prefix, transpositions) if max_edits else [prefix]
    )
    if prefix_length > 0:
        exact = prefix[:prefix_length]
        variants = [v for v in variants if v.startswith(exact)]
    by_len: dict[int, list[str]] = {}
    for v in variants:
        by_len.setdefault(len(v), []).append(v)
    cond = F.lit(False)
    for length, vs in sorted(by_len.items()):
        if length == 0:
            continue
        cond = cond | F.substring(F.col("term"), 1, length).isin(vs)
    return (
        ts.where(cond)
        .select(
            F.col("term").alias("suggestion"),
            F.col("df").cast("long").alias("weight"),
        )
        .orderBy(F.desc("weight"), F.asc("suggestion"))
        .limit(k)
    )
