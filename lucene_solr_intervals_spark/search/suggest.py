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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def suggest_prefix(
    index, prefix: str, k: int = 10, field: str | None = None
) -> DataFrame:
    """Top-k (suggestion, weight) completions of `prefix`, weight = df,
    ordered weight desc then suggestion asc (SortedInputIterator order)."""
    f = field or getattr(index, "default_field", "text")
    ts = index.term_stats.where(F.col("field") == f)
    return (
        ts.where(F.col("term").startswith(prefix))
        .select(
            F.col("term").alias("suggestion"),
            F.col("df").cast("long").alias("weight"),
        )
        .orderBy(F.desc("weight"), F.asc("suggestion"))
        .limit(k)
    )


def suggest_infix(
    index, pattern: str, k: int = 10, field: str | None = None
) -> DataFrame:
    """Top-k (suggestion, weight) where `pattern` occurs anywhere in the
    term (AnalyzingInfixSuggester.java:109 lookup semantics)."""
    f = field or getattr(index, "default_field", "text")
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
    corpus's model build is the same shuffle shape as word count."""
    from ..analysis.tokenizer import ANALYZERS

    fn = ANALYZERS[analyzer]

    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("ctx", T.StringType()),
            T.StructField("token", T.StringType()),
        ]
    )

    def _grams(batches):
        for pdf in batches:
            ctxs, toks = [], []
            for text in pdf[text_col]:
                terms, _, _ = fn(text)
                for i, t in enumerate(terms):
                    ctxs.append("" if i == 0 else terms[i - 1])
                    toks.append(t)
            yield pd.DataFrame({"ctx": ctxs, "token": toks})

    pairs = docs_df.select(text_col).mapInPandas(_grams, schema)
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


def suggest_stored(
    df: DataFrame,
    text_col: str,
    weight_col: str,
    query: str,
    k: int = 10,
    infix: bool = True,
) -> DataFrame:
    """Suggest full stored strings (AnalyzingInfixSuggester payload mode):
    case-insensitive prefix/infix match over a stored column, weighted by a
    numeric column — e.g. suggest document titles by view count."""
    pat = query.lower()
    t = F.lower(F.col(text_col))
    cond = t.contains(pat) if infix else t.startswith(pat)
    return (
        df.where(cond)
        .select(
            F.col(text_col).alias("suggestion"),
            F.col(weight_col).cast("double").alias("weight"),
        )
        .orderBy(F.desc("weight"), F.asc("suggestion"))
        .limit(k)
    )
