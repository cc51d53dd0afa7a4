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


TOKENIZED_OFFSETS_SCHEMA = T.StructType(
    [
        T.StructField("terms", T.ArrayType(T.StringType())),
        T.StructField("positions", T.ArrayType(T.IntegerType())),
        T.StructField("starts", T.ArrayType(T.IntegerType())),
        T.StructField("ends", T.ArrayType(T.IntegerType())),
        T.StructField("doclen", T.IntegerType()),
        T.StructField("norm_byte", T.IntegerType()),
    ]
)


def tokenize_expr(analyzer: str = "code", with_offsets: bool = False):
    """Arrow-batched tokenizer UDF: text -> (terms, positions[, starts,
    ends], doclen, norm_byte).  `with_offsets` adds the character-offset
    streams (Weight.PostingFeatures.OFFSETS)."""

    from ..analysis.tokenizer import flat_tokenizer

    ftok = flat_tokenizer(analyzer, keep_offsets=with_offsets)

    def _split_cols(flat, n_docs):
        """Flat occurrence arrays -> per-doc list columns (np.split views —
        no per-token Python; Arrow serializes ndarray cells directly)."""
        import numpy as np

        if n_docs == 0:
            cols = {"terms": [], "positions": []}
            if "starts" in flat:
                cols["starts"] = cols["ends"] = []
            return cols
        bounds = np.searchsorted(flat["doc_idx"], np.arange(1, n_docs))
        cols = {
            "terms": np.split(flat["terms"], bounds),
            "positions": np.split(flat["positions"].astype(np.int32), bounds),
        }
        if "starts" in flat:
            cols["starts"] = np.split(flat["starts"].astype(np.int32), bounds)
            cols["ends"] = np.split(flat["ends"].astype(np.int32), bounds)
        return cols

    if with_offsets:

        @F.pandas_udf(TOKENIZED_OFFSETS_SCHEMA)
        def _tok_off(texts: pd.Series) -> pd.DataFrame:
            import numpy as np

            flat = ftok(texts.tolist())
            cols = _split_cols(flat, len(texts))
            doclens = flat["doclens"]
            return pd.DataFrame(
                {
                    "terms": cols["terms"],
                    "positions": cols["positions"],
                    "starts": cols["starts"],
                    "ends": cols["ends"],
                    "doclen": doclens.astype(np.int32),
                    "norm_byte": encode_norm(np.maximum(doclens, 1)).astype(np.int32),
                }
            )

        return _tok_off

    @F.pandas_udf(TOKENIZED_SCHEMA)
    def _tok(texts: pd.Series) -> pd.DataFrame:
        import numpy as np

        flat = ftok(texts.tolist())
        cols = _split_cols(flat, len(texts))
        doclens = flat["doclens"]
        # doclen==0 docs keep norm byte of doclen 1 (Lucene never indexes an
        # empty field value; guard keeps sqrt finite)
        return pd.DataFrame(
            {
                "terms": cols["terms"],
                "positions": cols["positions"],
                "doclen": doclens.astype(np.int32),
                "norm_byte": encode_norm(np.maximum(doclens, 1)).astype(np.int32),
            }
        )

    return _tok


TOKENIZED_AGG_SCHEMA = T.StructType(
    [
        T.StructField("terms", T.ArrayType(T.StringType())),
        T.StructField("tfs", T.ArrayType(T.IntegerType())),
        T.StructField("positions", T.ArrayType(T.ArrayType(T.IntegerType()))),
        T.StructField("doclen", T.IntegerType()),
        T.StructField("norm_byte", T.IntegerType()),
    ]
)


def tokenize_agg_expr(analyzer: str = "code"):
    """Arrow-batched tokenizer UDF that also performs the FreqProx per-doc
    aggregation IN the batch: text -> (unique terms, tfs, per-term sorted
    position lists, doclen, norm_byte).

    This is the in-RAM invert of DefaultIndexingChain.PerField (the same
    hash-agg FreqProxTermsWriterPerField does per doc) done vectorized per
    Arrow batch — so the exploded build's postings need NO occurrence-level
    shuffle at all: the groupBy(field, term, doc_id) + sort_array stage
    (which shipped every position through an Exchange) becomes a plain
    explode of already-aggregated rows.  Values are identical: tf is the
    occurrence count and each position list is ascending (positions are
    non-decreasing within a doc, and the stable grouping sort preserves
    that order), exactly what sort_array(collect_list(pos)) produced —
    pinned by test_build_index_aggregated_matches_groupby."""
    from ..analysis.tokenizer import flat_tokenizer

    ftok = flat_tokenizer(analyzer, keep_offsets=False)

    @F.pandas_udf(TOKENIZED_AGG_SCHEMA)
    def _tok_agg(texts: pd.Series) -> pd.DataFrame:
        import numpy as np

        flat = ftok(texts.tolist())
        n_docs = len(texts)
        doclens = flat["doclens"]
        terms = flat["terms"]
        ntok = terms.size if hasattr(terms, "size") else len(terms)
        if n_docs == 0 or ntok == 0:
            empty_obj = [np.empty(0, dtype=object)] * n_docs
            empty_i32 = [np.empty(0, dtype=np.int32)] * n_docs
            empty_ll = [[] for _ in range(n_docs)]
            return pd.DataFrame(
                {
                    "terms": empty_obj,
                    "tfs": empty_i32,
                    "positions": empty_ll,
                    "doclen": np.asarray(doclens, dtype=np.int32),
                    "norm_byte": encode_norm(
                        np.maximum(np.asarray(doclens), 1)
                    ).astype(np.int32),
                }
            )
        doc_idx = np.asarray(flat["doc_idx"], dtype=np.int64)
        positions = np.asarray(flat["positions"], dtype=np.int32)
        codes, uniques = pd.factorize(np.asarray(terms, dtype=object))
        uniques = np.asarray(uniques, dtype=object)
        # group key = (doc, term-code); stable sort keeps each group's
        # positions in emission order (ascending within a doc)
        key = doc_idx * np.int64(len(uniques)) + codes.astype(np.int64)
        order = np.argsort(key, kind="stable")
        ks = key[order]
        starts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])
        tfs_all = np.diff(np.r_[starts, ks.size]).astype(np.int32)
        gterm = uniques[codes[order][starts]]
        gdoc = doc_idx[order][starts]
        pos_groups = np.split(positions[order], starts[1:])
        doc_bounds = np.searchsorted(gdoc, np.arange(1, n_docs))
        out_terms = np.split(gterm, doc_bounds)
        out_tfs = np.split(tfs_all, doc_bounds)
        out_pos: list = []
        b = np.r_[0, doc_bounds, len(pos_groups)]
        for i in range(n_docs):
            out_pos.append(pos_groups[b[i] : b[i + 1]])
        return pd.DataFrame(
            {
                "terms": out_terms,
                "tfs": out_tfs,
                "positions": out_pos,
                "doclen": np.asarray(doclens, dtype=np.int32),
                "norm_byte": encode_norm(
                    np.maximum(np.asarray(doclens), 1)
                ).astype(np.int32),
            }
        )

    return _tok_agg


@dataclass
class InvertedIndex:
    """Exploded multi-field inverted index.

    postings(field, term, doc_id, tf, positions)  — per-field streams
    docs(doc_id, field, doclen, norm_byte)        — per-field norms
    term_stats(field, term, df, ttf)              — per-field stats
    Per-field avgdl follows Lucene 4.x BM25Similarity.avgFieldLength
    (BM25Similarity.java:82-89): sumTotalTermFreq(field) / maxDoc — docs
    lacking the field still count in the denominator.
    """

    postings: DataFrame
    docs: DataFrame
    term_stats: DataFrame
    max_doc: int
    sum_ttf: int
    default_field: str = "text"
    avgdl_by_field: dict[str, float] | None = None
    sum_ttf_by_field: dict[str, int] | None = None

    @property
    def bm25_stats(self) -> BM25Stats:
        return BM25Stats(max_doc=self.max_doc, sum_total_term_freq=self.sum_ttf)

    @property
    def avgdl(self) -> float:
        return self.sum_ttf / self.max_doc if self.max_doc else 1.0

    def avgdl_of(self, field: str) -> float:
        if self.avgdl_by_field is None or field == self.default_field:
            return self.avgdl
        return self.avgdl_by_field.get(field, 1.0)

    def sum_ttf_of(self, field: str) -> int:
        """getNumberOfFieldTokens per field (BasicStats.java) — exact int,
        feeding the SimilarityBase collection models."""
        if self.sum_ttf_by_field is None or field == self.default_field:
            return self.sum_ttf
        return self.sum_ttf_by_field.get(field, 0)

    @property
    def fields(self) -> list[str]:
        return sorted(self.avgdl_by_field) if self.avgdl_by_field else [self.default_field]

    def unpersist(self) -> None:
        for df in (self.postings, self.docs, self.term_stats):
            try:
                df.unpersist()
            except Exception:
                pass


# PAYLOADS posting feature (Weight.PostingFeatures.PAYLOADS,
# lucene/core/src/java/org/apache/lucene/search/Weight.java:217-235): a
# per-position value stream parallel to positions.  Lucene payloads are
# produced by analysis-chain filters; each registry entry is the JVM-column
# twin of one such filter over the occurrence stream (term, pos, ...):
#   token_len  NumericPayloadTokenFilter-style token-derived value
#   pos_mod7   synthetic position-derived value (deterministic + ANSI-SQL
#              replicable, so the DuckDB oracle checks the whole pipeline)
#   delimited  DelimitedPayloadTokenFilter.java:33 — tokens arrive as
#              "term|payload"; the term is split and the float tail stored
PAYLOAD_EXPRS = {
    "token_len": lambda: F.length(F.col("term")).cast("double"),
    "pos_mod7": lambda: ((F.col("pos") % 7) + 1).cast("double"),
}


def build_index(
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    analyzer: str = "code",
    keep_positions: bool = True,
    persist: bool = True,
    fields: dict[str, str] | None = None,
    keep_offsets: bool = False,
    payload: str | None = None,
) -> InvertedIndex:
    """Build the exploded inverted index from a corpus DataFrame.

    `fields` maps field name -> corpus column (DefaultIndexingChain.PerField
    — one inverted stream per field); default is one field named after
    `text_col`.  The groupBy(field, term, doc_id) is the only shuffle;
    Catalyst applies map-side partial aggregation so heavy terms ship
    partial (tf, positions) rather than raw occurrences.  Positions stay as
    array<int> (the kernel decodes nothing — Arrow hands numpy arrays
    straight through).
    """
    if fields is None:
        fields = {text_col: text_col}
    default_field = text_col if text_col in fields else sorted(fields)[0]

    # default shape (positions, no offsets/payloads): per-doc FreqProx
    # aggregation happens INSIDE the tokenizer batch (tokenize_agg_expr),
    # so postings are an explode of already-aggregated rows — the
    # occurrence-level groupBy shuffle (every position through an
    # Exchange) is gone from the build entirely.  The offsets/payloads
    # variants keep the relational aggregation below.
    if keep_positions and not keep_offsets and payload is None:
        tok_agg = tokenize_agg_expr(analyzer)
        per_field = []
        for fname, col in sorted(fields.items()):
            per_field.append(
                corpus.select(
                    F.col(id_col).cast("long").alias("doc_id"),
                    F.lit(fname).alias("field"),
                    tok_agg(F.col(col)).alias("t"),
                ).select(
                    "doc_id", "field", "t.terms", "t.tfs", "t.positions",
                    "t.doclen", "t.norm_byte",
                )
            )
        tokenized = per_field[0]
        for p in per_field[1:]:
            tokenized = tokenized.unionByName(p)
        tokenized = tokenized.persist()
        docs = tokenized.select("doc_id", "field", "doclen", "norm_byte")
        postings = tokenized.select(
            "doc_id",
            "field",
            F.explode(F.arrays_zip("terms", "tfs", "positions")).alias("o"),
        ).select(
            "field",
            F.col("o.terms").alias("term"),
            "doc_id",
            F.col("o.tfs").alias("tf"),
            F.col("o.positions").alias("positions"),
        )
        return _finish_index(
            tokenized, docs, postings, persist, default_field
        )

    tok = tokenize_expr(analyzer, with_offsets=keep_offsets)
    off_cols = ["t.starts", "t.ends"] if keep_offsets else []
    per_field = []
    for fname, col in sorted(fields.items()):
        per_field.append(
            corpus.select(
                F.col(id_col).cast("long").alias("doc_id"),
                F.lit(fname).alias("field"),
                tok(F.col(col)).alias("t"),
            ).select(
                "doc_id", "field", "t.terms", "t.positions", *off_cols,
                "t.doclen", "t.norm_byte",
            )
        )
    tokenized = per_field[0]
    for p in per_field[1:]:
        tokenized = tokenized.unionByName(p)
    # Cache the tokenizer output: docs and postings have separate lineages
    # through `tokenized`, and the two materializing actions below (field
    # row counts, term-stats sums) would otherwise each run the Arrow
    # tokenizer UDF over the whole corpus — the dominant build cost paid
    # twice (guide §5: persist exactly what is reused).  Unpersisted after
    # the downstream relations are materialized.
    tokenized = tokenized.persist()

    docs = tokenized.select("doc_id", "field", "doclen", "norm_byte")

    zip_cols = ["terms", "positions"] + (["starts", "ends"] if keep_offsets else [])
    occurrences = tokenized.select(
        "doc_id",
        "field",
        F.explode(F.arrays_zip(*zip_cols)).alias("o"),
    ).select(
        "doc_id",
        "field",
        F.col("o.terms").alias("term"),
        F.col("o.positions").alias("pos"),
        *([F.col("o.starts").alias("start"), F.col("o.ends").alias("end")] if keep_offsets else []),
    )

    if payload is not None:
        if payload == "delimited":
            # DelimitedPayloadTokenFilter: "term|1.5" -> term + float payload
            occurrences = occurrences.withColumn(
                "payload",
                F.coalesce(
                    F.get(F.split(F.col("term"), r"\|"), 1).cast("double"),
                    F.lit(1.0),  # undelimited token -> default payload
                ),
            ).withColumn("term", F.get(F.split(F.col("term"), r"\|"), 0))
        else:
            occurrences = occurrences.withColumn("payload", PAYLOAD_EXPRS[payload]())

    extra = (["start", "end"] if keep_offsets else []) + (
        ["payload"] if payload is not None else []
    )
    if extra:
        # positions + aligned per-position streams (OFFSETS / PAYLOADS
        # posting features): one struct-sorted collect keeps arrays parallel
        postings = (
            occurrences.groupBy("field", "term", "doc_id")
            .agg(
                F.count(F.lit(1)).cast("int").alias("tf"),
                F.sort_array(F.collect_list(F.struct("pos", *extra))).alias("pse"),
            )
            .select(
                "field", "term", "doc_id", "tf",
                F.col("pse.pos").alias("positions"),
                *(
                    [F.col("pse.start").alias("starts"), F.col("pse.end").alias("ends")]
                    if keep_offsets
                    else []
                ),
                *([F.col("pse.payload").alias("payloads")] if payload is not None else []),
            )
        )
    elif keep_positions:
        postings = occurrences.groupBy("field", "term", "doc_id").agg(
            F.count(F.lit(1)).cast("int").alias("tf"),
            F.sort_array(F.collect_list("pos")).alias("positions"),
        )
    else:
        postings = occurrences.groupBy("field", "term", "doc_id").agg(
            F.count(F.lit(1)).cast("int").alias("tf")
        )

    return _finish_index(tokenized, docs, postings, persist, default_field)


def _finish_index(
    tokenized: DataFrame,
    docs: DataFrame,
    postings: DataFrame,
    persist: bool,
    default_field: str,
) -> InvertedIndex:
    term_stats = postings.groupBy("field", "term").agg(
        F.count(F.lit(1)).alias("df"), F.sum("tf").alias("ttf")
    )

    if persist:
        postings = postings.persist()
        docs = docs.persist()
        term_stats = term_stats.persist()

    # per-field doc counts come from the tokenizer relation itself (docs is
    # a straight column select of it — row counts per field are identical),
    # so ONE job fills the tokenizer cache and yields max_doc ...
    rows = tokenized.groupBy("field").agg(F.count(F.lit(1)).alias("n")).collect()
    # every field row-set covers every doc (tokenizer emits doclen 0 rows)
    max_doc = max((int(r["n"]) for r in rows), default=0)

    # ... and the two remaining cache fills — docs, and postings/term_stats
    # via the sumTotalTermFreq aggregation — share no lineage below the
    # now-filled tokenizer cache, so they run as concurrent jobs
    # (guide §2.6): the build tail loses min(docs-fill, stats-fill).
    # sumTotalTermFreq per field from the postings (BM25Similarity.java:82-89
    # avgFieldLength): counts EVERY emitted token, including posInc=0 synonym
    # overlaps — whereas docs.doclen is the overlap-DISCOUNTED norm length
    # (identical when the analyzer injects no overlaps).
    from concurrent.futures import ThreadPoolExecutor

    def _stats_fill():
        return (
            term_stats.groupBy("field")
            .agg(F.coalesce(F.sum("ttf"), F.lit(0)).alias("s"))
            .collect()
        )

    if persist:
        with ThreadPoolExecutor(max_workers=2) as ex:
            fd = ex.submit(docs.count)
            fs = ex.submit(_stats_fill)
            fd.result()
            stat_rows = fs.result()
    else:
        stat_rows = _stats_fill()
    # the actions above have materialized the persisted postings / docs /
    # term_stats relations; the tokenizer cache has served its purpose
    tokenized.unpersist()
    sum_by_field = {r["field"]: 0 for r in rows}
    sum_by_field.update({r["field"]: int(r["s"]) for r in stat_rows})
    avgdl_by_field = {
        f: (s / max_doc if max_doc else 1.0) for f, s in sum_by_field.items()
    }
    return InvertedIndex(
        postings=postings,
        docs=docs,
        term_stats=term_stats,
        max_doc=max_doc,
        sum_ttf=sum_by_field.get(default_field, 0),
        default_field=default_field,
        avgdl_by_field=avgdl_by_field,
        sum_ttf_by_field=sum_by_field,
    )


def load_corpus(spark: SparkSession, sf_dir: str, table: str = "documents") -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")
