"""Text-analysis operators for large-scale training-data pipelines.

All JVM-side (built-in pyspark.sql.functions — whole-stage codegen, no
Python in the hot path): tokenization statistics, language-ID heuristic,
quality scoring, fingerprinting.  Each has an exact ANSI-SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..analysis.tokenizer import ENGLISH_STOP_WORDS

TOKEN_SPLIT = "[^a-z0-9_]+"


def tokens_col(text_col):
    """array<string> of code-analyzer tokens, JVM-side (matches code_tokenize)."""
    return F.filter(F.split(F.lower(text_col), TOKEN_SPLIT), lambda t: t != "")


def token_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-doc token counting: whitespace tokens, analyzer tokens, distinct."""
    toks = tokens_col(F.col(text_col))
    ws = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
    return docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.size(ws).cast("long").alias("ws_tokens"),
        F.size(toks).cast("long").alias("code_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("distinct_tokens"),
        F.length(text_col).cast("long").alias("n_chars"),
    )


def quality_score(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic quality signals: length, type-token ratio, stopword ratio,
    mean token length.  The classic pre-training quality filters."""
    toks = tokens_col(F.col(text_col))
    stop_arr = F.array(*[F.lit(w) for w in sorted(ENGLISH_STOP_WORDS)])
    n = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    n_distinct = F.size(F.array_distinct(toks))
    total_len = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        n.cast("long").alias("n_tokens"),
        F.round(n_distinct / F.greatest(n, F.lit(1)).cast("double"), 4).alias("ttr"),
        F.round(n_stop / F.greatest(n, F.lit(1)).cast("double"), 4).alias("stopword_ratio"),
        F.round(total_len / F.greatest(n, F.lit(1)).cast("double"), 4).alias("mean_token_len"),
    )


def lang_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """N-gram-free language-ID heuristic: English stopword density.

    A real deployment would swap in fastText/cld3 via mapInPandas; the
    Spark plumbing (columnar ratio computation, threshold classify) is the
    operator being exercised.
    """
    toks = tokens_col(F.col(text_col))
    stop_arr = F.array(*[F.lit(w) for w in sorted(ENGLISH_STOP_WORDS)])
    ratio = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t))) / F.greatest(
        F.size(toks), F.lit(1)
    ).cast("double")
    return docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.round(ratio, 4).alias("stop_ratio"),
        F.when(ratio >= 0.03, F.lit("en")).otherwise(F.lit("unknown")).alias("lang_guess"),
    )


def fingerprint(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Normalized document fingerprint: md5 over the sorted distinct token
    set (shingle-free variant of Broder's fingerprinting; dedup key for
    bag-of-words-identical docs)."""
    toks = tokens_col(F.col(text_col))
    canon = F.concat_ws(" ", F.array_sort(F.array_distinct(toks)))
    return docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.md5(canon).alias("fingerprint"),
    )


def doc_lm_score(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.4,
) -> DataFrame:
    """Training-data quality filter: per-document mean log-likelihood under
    the corpus's own bigram LM with stupid backoff (the FreeTextSuggester
    model family, FreeTextSuggester.java:91 / ALPHA=0.4) — unnaturally
    repetitive or out-of-distribution documents score low, fluent
    in-distribution text scores high.  This is the cheap LM-based quality
    signal a 100 TB pretraining pipeline computes before the expensive
    model-based filters.

    p(w_0)        = cnt(w_0) / total_tokens
    p(w_i|w_i-1)  = cnt(bigram)/cnt(w_i-1)        if the bigram was seen
                    alpha * cnt(w_i)/total_tokens otherwise

    Shapes: two global groupBy passes build the model (word count shape);
    scoring is two hash joins keyed on token / (ctx, token) plus one
    groupBy(doc) — no driver round-trips, no UDFs.
    """
    toks = (
        docs.select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.posexplode(tokens_col(F.col(text_col))).alias("pos", "token"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    pairs = toks.withColumn("ctx", F.lag("token", 1, "").over(w))
    uni = pairs.groupBy("token").agg(F.count(F.lit(1)).alias("u_cnt"))
    tot = pairs.agg(F.count(F.lit(1)).alias("tot"))
    bi = (
        pairs.where(F.col("ctx") != "")
        .groupBy("ctx", "token")
        .agg(F.count(F.lit(1)).alias("b_cnt"))
    )
    ctx_cnt = uni.select(F.col("token").alias("ctx"), F.col("u_cnt").alias("c_cnt"))
    scored = (
        pairs.join(uni, "token")
        .join(bi, ["ctx", "token"], "left")
        .join(ctx_cnt, "ctx", "left")
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "p",
            F.when(
                F.col("ctx") == "", F.col("u_cnt").cast("double") / F.col("tot")
            )
            .when(
                F.col("b_cnt").isNotNull(),
                F.col("b_cnt").cast("double") / F.col("c_cnt"),
            )
            .otherwise(
                F.lit(alpha) * F.col("u_cnt").cast("double") / F.col("tot")
            ),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.round(F.avg(F.log("p")), 4).alias("lm_score"))
        .orderBy("doc_id")
    )


# GPT-2-style pre-tokenizer, RE2/Java-compatible subset: the published
# pattern's lookahead ((?!\S)) and unicode classes are dropped so Spark
# (java.util.regex) and DuckDB (RE2) match identically; alternation is
# first-char-disjoint so leftmost-first == leftmost-longest here.
BPE_TOKEN_PATTERN = r" ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 \t\n\r\f]+"
WS_SPLIT_PATTERN = r"[ \t\n\r\f]+"


def bpe_token_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Token counting the way a pre-training cost model does it: whitespace
    tokens AND a BPE-ish regex pre-tokenization (the GPT-2 pattern family —
    letter runs / digit runs / punctuation runs with an attached leading
    space).  chars_per_bpe_token is the usual ~4 chars/token planning
    number.  Pure column expressions, whole-stage codegen."""
    toks = F.regexp_extract_all(F.col(text_col), F.lit(BPE_TOKEN_PATTERN), F.lit(0))
    ws = F.filter(F.split(F.col(text_col), WS_SPLIT_PATTERN), lambda t: t != "")
    n_bpe = F.size(toks)
    return docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        n_bpe.cast("long").alias("bpe_tokens"),
        F.size(ws).cast("long").alias("ws_tokens"),
        F.round(
            F.length(text_col).cast("double") / F.greatest(n_bpe, F.lit(1)), 4
        ).alias("chars_per_bpe_token"),
    )
