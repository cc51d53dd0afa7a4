"""Index construction: corpus DataFrame -> inverted index DataFrames.

Maps the reference's indexing chain (SURVEY.md §3.1) onto Spark:

  DefaultIndexingChain.PerField.invert (per-doc tokenize + position accum,
  DefaultIndexingChain.java:561-637)      -> Arrow-vectorized tokenize UDF
  FreqProxTermsWriterPerField (in-RAM term -> (tf, prox) hash agg,
  FreqProxTermsWriterPerField.java:110)   -> explode + groupBy(term, doc_id)
                                             (Catalyst does map-side partial agg)
  BM25Similarity.computeNorm (:138-141)   -> norm_byte column via byte315
  segment flush (FreqProxTermsWriter.flush:82-107, term-sorted)
                                          -> per-partition pack kernel writing
                                             term-sorted Parquet segments

Two representations:

* ``InvertedIndex`` — exploded, fully relational:
    postings(term, doc_id, tf, positions array<int>)
    docs(doc_id, doclen, norm_byte)
    term_stats(term, df, ttf)
  Catalyst gets full visibility: predicate pushdown on `term` reaches the
  Parquet scan, joins/aggs are whole-stage-codegen.  This is the query-side
  workhorse and the shape the DuckDB oracle can replicate.

* packed segments (see segment.py) — binary posting columns + block-max
  metadata, built per-partition without any shuffle; the scale path for the
  10^12-file index build and WAND top-k.
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..analysis.tokenizer import ANALYZERS
from ..scoring.bm25 import BM25Stats
from ..scoring.smallfloat import encode_norm

TOKENIZED_SCHEMA = T.StructType(
    [
        T.StructField("terms", T.ArrayType(T.StringType())),
        T.StructField("positions", T.ArrayType(T.IntegerType())),
        T.StructField("doclen", T.IntegerType()),
        T.StructField("norm_byte", T.IntegerType()),
    ]
)


def tokenize_expr(analyzer: str = "code"):
    """Arrow-batched tokenizer UDF: text -> (terms, positions, doclen, norm_byte)."""

    @F.pandas_udf(TOKENIZED_SCHEMA)
    def _tok(texts: pd.Series) -> pd.DataFrame:
        import numpy as np

        fn = ANALYZERS[analyzer]
        terms_col, pos_col, len_col = [], [], []
        for t in texts:
            terms, positions, doclen = fn(t)
            terms_col.append(terms)
            pos_col.append(positions)
            len_col.append(doclen)
        lens = np.maximum(np.array(len_col, dtype=np.int64), 1)
        norm_bytes = encode_norm(lens).astype(np.int32)
        # doclen==0 docs keep norm byte of doclen 1 (Lucene never indexes an
        # empty field value; guard keeps sqrt finite)
        return pd.DataFrame(
            {
                "terms": terms_col,
                "positions": pos_col,
                "doclen": len_col,
                "norm_byte": norm_bytes,
            }
        )

    return _tok


@dataclass
class InvertedIndex:
    postings: DataFrame
    docs: DataFrame
    term_stats: DataFrame
    max_doc: int
    sum_ttf: int

    @property
    def bm25_stats(self) -> BM25Stats:
        return BM25Stats(max_doc=self.max_doc, sum_total_term_freq=self.sum_ttf)

    @property
    def avgdl(self) -> float:
        return self.sum_ttf / self.max_doc if self.max_doc else 1.0

    def unpersist(self) -> None:
        for df in (self.postings, self.docs, self.term_stats):
            try:
                df.unpersist()
            except Exception:
                pass


def build_index(
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    analyzer: str = "code",
    keep_positions: bool = True,
    persist: bool = True,
) -> InvertedIndex:
    """Build the exploded inverted index from a corpus DataFrame.

    The groupBy(term, doc_id) is the only shuffle; Catalyst applies map-side
    partial aggregation so heavy terms ship partial (tf, positions) rather
    than raw occurrences.  Positions stay as array<int> (the kernel decodes
    nothing — Arrow hands numpy arrays straight through).
    """
    tok = tokenize_expr(analyzer)
    tokenized = corpus.select(
        F.col(id_col).cast("long").alias("doc_id"), tok(F.col(text_col)).alias("t")
    ).select("doc_id", "t.terms", "t.positions", "t.doclen", "t.norm_byte")

    docs = tokenized.select("doc_id", "doclen", "norm_byte")

    occurrences = tokenized.select(
        "doc_id",
        F.explode(F.arrays_zip("terms", "positions")).alias("o"),
    ).select("doc_id", F.col("o.terms").alias("term"), F.col("o.positions").alias("pos"))

    if keep_positions:
        postings = occurrences.groupBy("term", "doc_id").agg(
            F.count(F.lit(1)).cast("int").alias("tf"),
            F.sort_array(F.collect_list("pos")).alias("positions"),
        )
    else:
        postings = occurrences.groupBy("term", "doc_id").agg(
            F.count(F.lit(1)).cast("int").alias("tf")
        )

    term_stats = postings.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"), F.sum("tf").alias("ttf")
    )

    if persist:
        postings = postings.persist()
        docs = docs.persist()
        term_stats = term_stats.persist()

    agg = docs.agg(
        F.count(F.lit(1)).alias("n"), F.coalesce(F.sum("doclen"), F.lit(0)).alias("s")
    ).collect()[0]
    return InvertedIndex(
        postings=postings,
        docs=docs,
        term_stats=term_stats,
        max_doc=int(agg["n"]),
        sum_ttf=int(agg["s"]),
    )


def load_corpus(spark: SparkSession, sf_dir: str, table: str = "documents") -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")
