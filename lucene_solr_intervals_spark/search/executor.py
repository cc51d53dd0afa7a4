"""Query execution over the exploded inverted index (DataFrame path).

Maps the reference's search lifecycle (SURVEY.md §3.2) onto Spark:

  Query.rewrite / createWeight (stats binding)  -> driver-side planning over
                                                   broadcast term_stats
  Scorer DAG (Conjunction/Disjunction/ReqExcl)  -> joins / groupBy over
                                                   per-term hit DataFrames
  TopScoreDocCollector (HitQueue.lessThan:76-80,
  tie-break score desc then docID asc)          -> ORDER BY score DESC,
                                                   doc_id ASC LIMIT k
                                                   (Spark TakeOrderedAndProject
                                                   = per-partition heap + merge)
  IntervalFilterQuery scorers                   -> per-doc interval kernel in
                                                   an Arrow-batched UDF over
                                                   collected position arrays

Scoring modes:
  mode="sql"    float64 BM25 without norm quantization — ANSI-SQL-expressible,
                replayed verbatim by the DuckDB oracle harness.
  mode="lucene" float32 + byte315 norm quantization — rank-identical to the
                reference (BM25Similarity.java:234-238); scored inside a
                vectorized pandas UDF to keep float32 op order exact.

Scoring semantics per node (Lucene 4.x):
  TermQuery      score = idf(df,N) * (k1+1) * tf / (tf + norm)
  BooleanQuery   sum of matching clause scores (coord == 1 under BM25:
                 Similarity.coord default; BM25Similarity does not override)
  PhraseQuery    freq = number of phrase matches; idf summed over terms
                 (PhraseWeight via idfExplain(termStats[]))
  sloppy phrase  freq = sum of sloppyFreq(matchDistance) = 1/(d+1)
  Interval queries (Ordered/Unordered/NonOverlapping/IntervalFiltered)
                 freq() == 1 (IntervalFilterQuery.java:375-377), idf summed
                 over all leaf terms (:135-151)
  MultiTermQuery (Prefix/Wildcard/Regexp/TermRange/Fuzzy) rewrite to
                 constant-score over the expanded doc set
                 (MultiTermQuery.CONSTANT_SCORE_AUTO_REWRITE_DEFAULT)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..index.builder import InvertedIndex
from ..intervals import kernel as IK
from ..intervals import vectorized as VK
from . import queries as Q

K1 = 1.2
B = 0.75


class TimeExceeded(RuntimeError):
    """TimeLimitingCollector.TimeExceededException analog."""

_INTERVAL_RESULT = T.StructType(
    [
        T.StructField("n", T.IntegerType()),
        T.StructField(
            "intervals",
            T.ArrayType(
                T.StructType(
                    [T.StructField("begin", T.IntegerType()), T.StructField("end", T.IntegerType())]
                )
            ),
        ),
        T.StructField("sloppy_freq", T.DoubleType()),
    ]
)


def _lucene_wildcard_to_rlike(pattern: str) -> str:
    """WildcardQuery.toAutomaton (WildcardQuery.java:43-77): * = any string,
    ? = any single char, backslash escapes the NEXT char to a literal
    (WILDCARD_ESCAPE); a trailing backslash is leniently a literal
    backslash (TestWildcard.testEscapes)."""
    import re as _re

    out = []
    i = 0
    while i < len(pattern):
        ch = pattern[i]
        if ch == "\\":
            if i + 1 < len(pattern):
                out.append(_re.escape(pattern[i + 1]))
                i += 2
            else:
                out.append(_re.escape("\\"))
                i += 1
            continue
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        else:
            out.append(_re.escape(ch))
        i += 1
    return "^" + "".join(out) + "$"


class Searcher:
    def __init__(
        self,
        index: InvertedIndex,
        corpus: DataFrame | None = None,
        mode: str = "sql",
        k1: float = K1,
        b: float = B,
        text_col: str = "text",
        similarity=None,
    ):
        # Similarity strategy (the §2.11 extension point): two families, two
        # precision modes each — BM25Similarity ("sql"/"lucene") and
        # DefaultSimilarity classic TF-IDF ("classic"/"classic_lucene"),
        # the reference's default (IndexSearcher.java:92) — plus the
        # SimilarityBase families (DFR/IB/LM, scoring/similarities.py)
        # selected by name or instance via `similarity=` (sql precision).
        assert mode in ("sql", "lucene", "classic", "classic_lucene")
        if isinstance(similarity, str):
            from ..scoring.similarities import make_similarity

            similarity = make_similarity(similarity)
        if similarity is not None and mode != "sql":
            raise ValueError(
                "SimilarityBase families are float64 column expressions; "
                "use mode='sql' with similarity="
            )
        self.similarity = similarity
        self.index = index
        self.corpus = corpus
        self.mode = mode
        self.k1 = k1
        self.b = b
        self._text_col = text_col
        self.default_field = getattr(index, "default_field", "text")

    def _field_of(self, q: Q.Query) -> str:
        return getattr(q, "field", None) or self.default_field

    def _positional_field(self, q: Q.Query) -> str:
        """Positional/interval trees bind all leaves to ONE field (the
        reference's interval iterators pull one field's positions;
        cross-field interval streams are the CombinedIntervalIterator
        collector path — see fielded_intervals())."""
        fields = {f for f, _ in Q.field_term_pairs(q, self.default_field)}
        if len(fields) > 1:
            raise ValueError(
                f"positional query spans fields {sorted(fields)}; use "
                "fielded_intervals() for cross-field interval collection"
            )
        return next(iter(fields)) if fields else self.default_field

    # ------------------------------------------------------------- scoring

    @property
    def _classic(self) -> bool:
        return self.mode in ("classic", "classic_lucene")

    @property
    def _f32(self) -> bool:
        """Quantized-norm float32 modes (the rank-parity targets)."""
        return self.mode in ("lucene", "classic_lucene")

    def _idf_col(self, df_col):
        n = self.index.max_doc
        if self._classic:
            # DefaultSimilarity.java:120 — 1 + ln(N / (df + 1))
            return F.lit(1.0) + F.log(F.lit(float(n)) / (df_col + 1.0))
        return F.log(F.lit(1.0) + (F.lit(float(n)) - df_col + 0.5) / (df_col + 0.5))

    def _norm_col(self, doclen_col, field: str | None = None):
        avgdl = self.index.avgdl_of(field) if field else self.index.avgdl
        return F.lit(self.k1) * (
            F.lit(1.0 - self.b) + F.lit(self.b) * doclen_col / F.lit(avgdl)
        )

    def _sim_score_col(self, field: str):
        """SimilarityBase.score(stats, freq, docLen) as one column expression
        over (tf, df, ttf, doclen).  sum_ttf/avgdl are bound per field the
        same way BasicStats.getNumberOfFieldTokens is (BasicStats.java)."""
        idx = self.index
        sum_ttf = (
            idx.sum_ttf_of(field) if hasattr(idx, "sum_ttf_of") else idx.sum_ttf
        )
        return self.similarity.score_col(
            F.col("tf"),
            F.col("df"),
            F.col("ttf"),
            F.col("doclen"),
            n_docs=idx.max_doc,
            avgdl=idx.avgdl_of(field),
            sum_ttf=sum_ttf,
        )

    def _score_col(self, idf_col, tf_col, doclen_col, field: str | None = None):
        if self._classic:
            # un-normalized classic term score: sqrt(tf) * idf^2 / sqrt(dl)
            # (queryNorm and coord are query-level — applied in scored())
            return F.sqrt(tf_col) * idf_col * idf_col / F.sqrt(doclen_col)
        return idf_col * F.lit(self.k1 + 1.0) * tf_col / (
            tf_col + self._norm_col(doclen_col, field)
        )

    def _lucene_score_udf(self, field: str | None = None):
        """float32-exact scorer: (tf, norm_byte, df) -> score.

        mode="lucene": BM25 via the quantized norm cache of `field`
        (BM25Similarity.java:206-238 binds the cache to the field's avgdl).
        mode="classic_lucene": DefaultSimilarity — sqrt(tf) * idf^2 *
        byte315ToFloat(norm_byte) (TFIDFSimilarity TermScorer path; the
        query-level queryNorm/coord are applied in scored())."""
        import numpy as np

        from ..scoring.bm25 import idf as idf32
        from ..scoring.bm25 import norm_cache
        from ..scoring.classic import DECODE_TABLE, idf_classic

        n_docs = self.index.max_doc

        if self.mode == "classic_lucene":

            @F.pandas_udf(T.FloatType())
            def _score_classic(
                tf: pd.Series, norm_byte: pd.Series, df: pd.Series
            ) -> pd.Series:
                tf32 = np.sqrt(tf.to_numpy(dtype=np.float32), dtype=np.float32)
                i = idf_classic(df.to_numpy(dtype=np.int64), n_docs)
                norm = DECODE_TABLE[norm_byte.to_numpy(dtype=np.int64) & 0xFF]
                return pd.Series((i * i * tf32 * norm).astype(np.float32))

            return _score_classic

        avgdl = self.index.avgdl_of(field) if field else self.index.avgdl
        cache = norm_cache(avgdl, self.k1, self.b)
        k1 = np.float32(self.k1)

        @F.pandas_udf(T.FloatType())
        def _score(tf: pd.Series, norm_byte: pd.Series, df: pd.Series) -> pd.Series:
            tf32 = tf.to_numpy(dtype=np.float32)
            i = idf32(df.to_numpy(dtype=np.int64), n_docs)
            w = (i * (k1 + np.float32(1.0))).astype(np.float32)
            norm = cache[norm_byte.to_numpy(dtype=np.int64) & 0xFF]
            return pd.Series((w * tf32 / (tf32 + norm)).astype(np.float32))

        return _score

    def term_hits(
        self,
        terms: list[str],
        with_positions: bool = False,
        field: str | None = None,
        with_payloads: bool = False,
    ) -> DataFrame:
        """Per-(term, doc) scored hits for a list of same-field terms.

        postings.filter(field ==, term isin) -> Parquet/cache pruning;
        term_stats is broadcast (tiny after the filter); docs joined for the
        field's norms.  Stats (df, avgdl, norms) are all bound per field.
        """
        idx = self.index
        f = field or self.default_field
        cols = (
            ["term", "doc_id", "tf"]
            + (["positions"] if with_positions else [])
            + (["payloads"] if with_payloads else [])
        )
        # stats stay an in-plan subquery broadcast: a createDataFrame
        # literal from the _stats_of memo was tried in r10 and measured
        # ~0.25 s SLOWER per query (LocalRelation planning + conversion
        # beats the cached-table scan it replaced — BENCH/ab_r10 notes)
        stats = idx.term_stats.where(
            (F.col("field") == f) & F.col("term").isin(terms)
        ).select("term", "df", "ttf")
        hits = (
            idx.postings.where((F.col("field") == f) & F.col("term").isin(terms))
            .select(*cols)
            .join(F.broadcast(stats), "term")
            .join(idx.docs.where(F.col("field") == f).select("doc_id", "doclen", "norm_byte"), "doc_id")
        )
        if self.similarity is not None:
            score = self._sim_score_col(f)
        elif self._f32:
            score = self._lucene_score_udf(f)(F.col("tf"), F.col("norm_byte"), F.col("df"))
        else:
            score = self._score_col(self._idf_col(F.col("df")), F.col("tf"), F.col("doclen"), f)
        return hits.withColumn("score", score)

    # ------------------------------------------------------- main entry

    def search(self, q: Q.Query, k: int = 10) -> DataFrame:
        """Top-k (doc_id, score), tie-break (score desc, doc_id asc) — the
        HitQueue contract (HitQueue.java:76-80)."""
        scored = self.scored(q)
        return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

    def count(self, q: Q.Query) -> int:
        """TotalHitCountCollector analog."""
        return self.matching(q).count()

    def rescore(
        self, first: Q.Query, second: Q.Query, n_top: int, k: int, weight: float = 1.0
    ) -> DataFrame:
        """QueryRescorer (QueryRescorer.java:31): re-rank the first-pass
        top-N with combined = first + weight * second (0 if no match)."""
        top_n = self.search(first, n_top).withColumnRenamed("score", "first_score")
        second_scores = self.scored(second).withColumnRenamed("score", "second_score")
        combined = top_n.join(F.broadcast(second_scores), "doc_id", "left").select(
            "doc_id",
            (
                F.col("first_score")
                + F.lit(weight) * F.coalesce(F.col("second_score"), F.lit(0.0))
            ).alias("score"),
        )
        return combined.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

    def more_like_this(self, doc_id: int, max_terms: int = 10, k: int = 10) -> DataFrame:
        """MoreLikeThis (MoreLikeThis.java:147): top tf*idf terms of the doc
        -> OR query (excluding the seed doc).  Term selection deterministic:
        (tf*idf desc, term asc)."""
        idx = self.index
        f = self.default_field
        doc_terms = (
            idx.postings.where((F.col("doc_id") == doc_id) & (F.col("field") == f))
            .join(idx.term_stats.where(F.col("field") == f).select("term", "df"), "term")
            .withColumn("tfidf", F.col("tf") * self._idf_col(F.col("df")))
            .orderBy(F.desc("tfidf"), F.asc("term"))
            .limit(max_terms)
            .select("term")
            .collect()
        )
        terms = [r["term"] for r in doc_terms]
        if not terms:
            return self.index.docs.select("doc_id").where(F.lit(False)).withColumn(
                "score", F.lit(0.0)
            )
        q = Q.Boolean(should=tuple(Q.Term(t) for t in terms))
        return (
            self.scored(q)
            .where(F.col("doc_id") != doc_id)
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
        )

    def search_after(self, q: Q.Query, k: int, after_score: float, after_doc: int) -> DataFrame:
        """Keyset pagination (IndexSearcher.searchAfter, IndexSearcher.java:234-250)."""
        scored = self.scored(q)
        below = scored.where(
            (F.col("score") < F.lit(after_score))
            | ((F.col("score") == F.lit(after_score)) & (F.col("doc_id") > F.lit(after_doc)))
        )
        return below.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

    # --------------------------------------------------------- scored sets

    def scored(self, q: Q.Query) -> DataFrame:
        """All matching docs with scores: (doc_id, score).

        Classic modes apply the query-level queryNorm here — the
        IndexSearcher.createNormalizedWeight step (one normalization at the
        TOP of the tree; TFIDFSimilarity$IDFStats.normalize) — while the
        recursive clause scoring below stays un-normalized."""
        out = self._scored_raw(q)
        if self._classic:
            qn = self._query_norm(q)
            if qn != 1.0:
                out = out.select(
                    "doc_id", (F.col("score") * F.lit(float(qn))).alias("score")
                )
        return out

    def _query_norm(self, q: Q.Query) -> float:
        """queryNorm = 1/sqrt(sumOfSquaredWeights) (DefaultSimilarity.java:56-59).
        float32 like Java under classic_lucene; float64 under classic (the
        SQL-expressible variant the DuckDB oracle replays); BM25Similarity
        overrides queryNorm to 1."""
        import math

        ssw = self._sum_sq_weights(q)
        if self.mode == "classic":
            return 1.0 / math.sqrt(ssw) if ssw > 0 else 1.0
        from ..scoring.classic import query_norm

        return float(query_norm(ssw))

    def _sum_sq_weights(self, q: Q.Query) -> float:
        """getValueForNormalization over the query tree: Term -> (idf*boost)^2
        (TFIDFSimilarity$IDFStats), positional -> summed idf (PhraseWeight /
        IntervalFilterQuery.getSimWeight), Boolean/DisMax -> boost^2 * Σ
        clause values (BooleanWeight / DisjunctionMaxWeight), constant-score
        shapes -> boost^2.  Accumulates float32 (Java parity) under
        classic_lucene, float64 under classic."""
        import math

        import numpy as np

        from ..scoring.classic import idf_classic

        f32 = self.mode == "classic_lucene"
        wrap = np.float32 if f32 else float
        n = self.index.max_doc

        def idf_of(field, term):
            df = self._df_of(field, term)
            if f32:
                return idf_classic(df, n)
            return 1.0 + math.log(n / (df + 1.0))

        boost = wrap(getattr(q, "boost", 1.0))
        if isinstance(q, Q.Term):
            w = wrap(idf_of(self._field_of(q), q.term) * boost)
            return float(wrap(w * w))
        if isinstance(
            q,
            (Q.Phrase, Q.MultiPhrase, Q.NGramPhrase, Q.OrderedNear,
             Q.UnorderedNear, Q.NonOverlapping, Q.IntervalFiltered),
        ):
            f = self._positional_field(q)
            s = wrap(0.0)
            for t in Q.terms_of(q):
                s = wrap(s + idf_of(f, t))
            w = wrap(s * boost)
            return float(wrap(w * w))
        if isinstance(q, (Q.Boolean, Q.DisjunctionMax)):
            subs = (
                tuple(q.must) + tuple(q.should)
                if isinstance(q, Q.Boolean)
                else q.subs
            )
            s = wrap(0.0)
            for c in subs:
                s = wrap(s + wrap(self._sum_sq_weights(c)))
            return float(wrap(boost * boost * s))
        return float(wrap(boost * boost))

    def _df_of(self, field: str, term: str) -> int:
        """Driver-side point df lookup (memoized; query-term-bounded)."""
        return self._stats_of(field, [term])[term][0]

    def _stats_of(self, field: str, terms: list[str]) -> dict[str, tuple[int, int]]:
        """Bulk driver-side (df, ttf) lookup, memoized per searcher: ONE
        pruned collect for the still-unseen terms of a query instead of a
        stats subquery (scan + broadcast build) inside every query job.
        Bounded by the observed query workload, never the vocabulary —
        the same memo contract as SegmentSearcher._dfs."""
        memo = getattr(self, "_df_point_memo", None)
        if memo is None:
            memo = self._df_point_memo = {}
        missing = [t for t in terms if (field, t) not in memo]
        if missing:
            rows = self.index.term_stats.where(
                (F.col("field") == field) & F.col("term").isin(missing)
            ).select("term", "df", "ttf").collect()
            found = {r["term"]: (int(r["df"]), int(r["ttf"])) for r in rows}
            for t in missing:
                memo[(field, t)] = found.get(t, (0, 0))
        return {t: memo[(field, t)] for t in terms}

    def _scored_raw(self, q: Q.Query) -> DataFrame:
        if isinstance(q, Q.Term):
            return self.term_hits([q.term], field=self._field_of(q)).select(
                "doc_id", (F.col("score") * F.lit(q.boost)).alias("score")
            )

        if isinstance(q, Q.PayloadTerm):
            # PayloadTermQuery.java:55: spanScore * payloadScore; the payload
            # function folds the per-position payload stream JVM-side
            hits = self.term_hits(
                [q.term], field=self._field_of(q), with_payloads=True
            )
            p = F.col("payloads")
            if q.fn == "avg":
                pscore = F.aggregate(
                    p, F.lit(0.0), lambda a, x: a + x
                ) / F.size(p).cast("double")
            elif q.fn == "min":
                pscore = F.array_min(p).cast("double")
            elif q.fn == "max":
                pscore = F.array_max(p).cast("double")
            elif q.fn == "sum":
                pscore = F.aggregate(p, F.lit(0.0), lambda a, x: a + x)
            else:
                raise ValueError(f"unknown payload function {q.fn}")
            base = F.col("score") if q.include_span_score else F.lit(1.0)
            return hits.select(
                "doc_id", (base * pscore * F.lit(float(q.boost))).alias("score")
            )

        if isinstance(q, Q.MatchAll):
            # every field's docs rows cover every doc -> default field slice
            return self.index.docs.where(
                F.col("field") == self.default_field
            ).select("doc_id", F.lit(float(q.boost)).alias("score"))

        if isinstance(q, Q.ConstantScore):
            return self.matching(q.inner).select(
                "doc_id", F.lit(float(q.boost)).alias("score")
            )

        if isinstance(q, (Q.Prefix, Q.Wildcard, Q.Regexp, Q.TermRange, Q.Fuzzy)):
            if q.rewrite == "scoring_boolean":
                # SCORING_BOOLEAN_QUERY_REWRITE (MultiTermQuery.java:114):
                # every expanded term scores like a TermQuery SHOULD clause
                return self._scored_multi_term(q)
            # CONSTANT_SCORE rewrite: expand terms, constant score per doc
            return self._expanded_docs(q).select(
                "doc_id", F.lit(float(q.boost)).alias("score")
            )

        if isinstance(q, Q.NumericRange):
            return self._numeric_range_docs(q).select(
                "doc_id", F.lit(float(q.boost)).alias("score")
            )

        if isinstance(q, Q.Boolean):
            return self._scored_boolean(q)

        if isinstance(q, Q.DisjunctionMax):
            sub_terms = [s.term for s in q.subs if isinstance(s, Q.Term)]
            if (
                len(sub_terms) == len(q.subs)
                and len(set(sub_terms)) == len(sub_terms)
                and len({self._field_of(s) for s in q.subs}) == 1
            ):
                # batched all-Term DisMax: one term_hits scan, per-clause
                # boost re-attached by a CASE chain (same shape and
                # equivalence argument as the Boolean fast path below)
                f = self._field_of(q.subs[0])
                hits = self.term_hits(sorted(sub_terms), field=f)
                bexpr = None
                for s in q.subs:
                    cond = F.col("term") == s.term
                    v = F.lit(float(s.boost))
                    bexpr = F.when(cond, v) if bexpr is None else bexpr.when(cond, v)
                u = hits.select(
                    "doc_id", (F.col("score") * bexpr).alias("score")
                )
            else:
                parts = [
                    self._scored_raw(sub).select("doc_id", "score") for sub in q.subs
                ]
                u = parts[0]
                for p in parts[1:]:
                    u = u.unionByName(p)
            agg = u.groupBy("doc_id").agg(
                F.max("score").alias("mx"), F.sum("score").alias("sm")
            )
            score = F.col("mx") + F.lit(float(q.tie_breaker)) * (F.col("sm") - F.col("mx"))
            return agg.select("doc_id", (score * F.lit(q.boost)).alias("score"))

        if isinstance(q, Q.Phrase) and q.slop == 0:
            return self._scored_positional(q, freq_mode="count")

        if isinstance(q, Q.Phrase):
            # PhraseQuery.java:296: slop > 0 -> SloppyPhraseScorer (classic);
            # the intervals-module semantics stay selectable via scorer=
            mode = "classic_sloppy" if q.scorer == "classic" else "sloppy"
            return self._scored_positional(q, freq_mode=mode)

        if isinstance(q, Q.MultiPhrase) and q.slop > 0:
            # MultiPhraseQuery.setSlop -> SloppyPhraseScorer over slot
            # position unions (MultiPhraseQuery.java:216)
            return self._scored_positional(q, freq_mode="classic_sloppy")

        if isinstance(q, (Q.MultiPhrase, Q.NGramPhrase)):
            return self._scored_positional(q, freq_mode="count")

        if isinstance(q, Q.ComplexPhrase):
            return self._scored_raw(self._rewrite_complex_phrase(q))

        if isinstance(q, Q.CustomScore):
            # CustomScoreQuery.java:182 customScore: subQueryScore * each
            # valSrcScore; value sources are SQL exprs over corpus columns
            if self.corpus is None:
                raise ValueError("CustomScore requires Searcher(corpus=...)")
            scored = self._scored_raw(q.sub)
            vs = self.corpus.select(
                F.col("doc_id").cast("long").alias("doc_id"),
                *[
                    F.expr(e).cast("double").alias(f"_vs{i}")
                    for i, e in enumerate(q.value_exprs)
                ],
            )
            out = scored.join(vs, "doc_id", "left")
            score = F.col("score")
            for i in range(len(q.value_exprs)):
                score = score * F.coalesce(F.col(f"_vs{i}"), F.lit(1.0))
            return out.select(
                "doc_id", (score * F.lit(float(q.boost))).alias("score")
            )

        if isinstance(q, Q.Boosting):
            # BoostingQuery.java:60-68: context contributes NO score of its
            # own; matching it multiplies the match score by context_boost
            scored = self._scored_raw(q.match)
            ctx = self.matching(q.context).withColumn("_in_ctx", F.lit(1))
            return scored.join(ctx, "doc_id", "left").select(
                "doc_id",
                (
                    F.col("score")
                    * F.when(
                        F.col("_in_ctx").isNotNull(), F.lit(float(q.context_boost))
                    ).otherwise(F.lit(1.0))
                    * F.lit(float(q.boost))
                ).alias("score"),
            )

        if isinstance(q, (Q.OrderedNear, Q.UnorderedNear, Q.NonOverlapping, Q.IntervalFiltered)):
            # IntervalFilterQuery: freq() == 1 (IntervalFilterQuery.java:375-377)
            return self._scored_positional(q, freq_mode="one")

        raise ValueError(f"cannot score query type {type(q).__name__}")

    def _scored_boolean(self, q: Q.Boolean) -> DataFrame:
        if q.min_should_match > len(q.should):
            # more required optional matches than optional clauses exist:
            # unsatisfiable — matches NOTHING (TestBooleanMinShouldMatch
            # testMinHigherThenNumOptional / testNoOptionalButMin)
            return (
                self.index.docs.where(F.lit(False))
                .select(
                    F.col("doc_id").cast("long").alias("doc_id"),
                    F.lit(0.0).alias("score"),
                )
            )
        pos_clauses = [(c, 1, 0) for c in q.must] + [(c, 0, 1) for c in q.should]
        if not pos_clauses:
            raise ValueError("boolean query with no positive clauses")
        terms_list = [c.term for c, _, _ in pos_clauses if isinstance(c, Q.Term)]
        if (
            len(terms_list) == len(pos_clauses)
            and len(set(terms_list)) == len(terms_list)
            and len({self._field_of(c) for c, _, _ in pos_clauses}) == 1
        ):
            # Batched all-Term form (r10, measured: df_bool_or 2.8 -> 2.2 s
            # at sf0.1): ONE term_hits scan for every clause term instead of
            # one scan + broadcast-join pair PER clause, with the clause
            # attributes (is_must, is_should, boost) re-attached by a
            # codegen CASE chain on term — no extra relation, no join.
            # Terms must be distinct across clauses so score*boost stays the
            # bit-identical single product the per-clause union computed
            # (a repeated term falls back to the union below).
            f = self._field_of(pos_clauses[0][0])
            hits = self.term_hits(sorted(terms_list), field=f)

            def chain(val_of):
                expr = None
                for c, m, s in pos_clauses:
                    cond = F.col("term") == c.term
                    v = val_of(c, m, s)
                    expr = F.when(cond, v) if expr is None else expr.when(cond, v)
                return expr

            u = hits.select(
                "doc_id",
                (F.col("score") * chain(lambda c, m, s: F.lit(float(c.boost)))).alias(
                    "score"
                ),
                chain(lambda c, m, s: F.lit(m)).alias("is_must"),
                chain(lambda c, m, s: F.lit(s)).alias("is_should"),
            )
        else:
            parts = []
            for c, m, s in pos_clauses:
                parts.append(
                    self._scored_raw(c).select(
                        "doc_id", "score",
                        F.lit(m).alias("is_must"), F.lit(s).alias("is_should"),
                    )
                )
            u = parts[0]
            for p in parts[1:]:
                u = u.unionByName(p)
        agg = u.groupBy("doc_id").agg(
            F.sum("score").alias("score"),
            F.sum("is_must").alias("n_must"),
            F.sum("is_should").alias("n_should"),
        )
        cond = F.col("n_must") == len(q.must)
        msm = q.min_should_match if q.should else 0
        if not q.must and q.should:
            msm = max(msm, 1)
        if msm:
            cond = cond & (F.col("n_should") >= msm)
        score = F.col("score") * F.lit(q.boost)
        if self._classic and (q.must or q.should):
            # coord(overlap, maxOverlap) = overlap / maxOverlap
            # (DefaultSimilarity.java:51-53; BM25's coord override == 1)
            max_overlap = len(q.must) + len(q.should)
            score = score * (
                (F.col("n_must") + F.col("n_should")) / F.lit(float(max_overlap))
            )
        out = agg.where(cond).select("doc_id", score.alias("score"))
        for c in q.must_not:
            out = out.join(self.matching(c), "doc_id", "left_anti")
        return out

    # ------------------------------------------------------ doc-level match

    def matching(self, q: Q.Query) -> DataFrame:
        """Matching doc_ids without scoring (filter context)."""
        if isinstance(q, Q.Term):
            return (
                self.index.postings.where(
                    (F.col("field") == self._field_of(q)) & (F.col("term") == q.term)
                )
                .select("doc_id")
                .distinct()
            )
        if isinstance(q, Q.MatchAll):
            return self.index.docs.where(
                F.col("field") == self.default_field
            ).select("doc_id")
        if isinstance(q, (Q.Prefix, Q.Wildcard, Q.Regexp, Q.TermRange, Q.Fuzzy)):
            return self._expanded_docs(q)
        if isinstance(q, Q.NumericRange):
            return self._numeric_range_docs(q)
        if isinstance(q, Q.ConstantScore):
            return self.matching(q.inner)
        if isinstance(q, Q.Boosting):
            # the context only rescales scores; matching set == match's
            return self.matching(q.match)
        if isinstance(q, Q.CustomScore):
            # value sources only rescale scores; matching set == sub's
            return self.matching(q.sub)
        if isinstance(q, Q.Boolean):
            if q.min_should_match > len(q.should):
                # unsatisfiable minNrShouldMatch -> empty (see _scored_boolean)
                return self.index.docs.where(F.lit(False)).select(
                    F.col("doc_id").cast("long").alias("doc_id")
                )
            out = None
            for c in q.must:
                m = self.matching(c)
                out = m if out is None else out.join(m, "doc_id", "left_semi")
            if q.should:
                parts = [self.matching(c) for c in q.should]
                u = parts[0]
                for p in parts[1:]:
                    u = u.unionByName(p)
                # minimumNumberShouldMatch applies WHETHER OR NOT must clauses
                # exist (BooleanQuery.java, MinShouldMatchSumScorer.java:38);
                # without must clauses at least one should must match
                msm = q.min_should_match if q.must else max(q.min_should_match, 1)
                if msm > 1:
                    sat = u.groupBy("doc_id").count().where(
                        F.col("count") >= msm
                    ).select("doc_id")
                elif msm == 1:
                    sat = u.distinct()
                else:
                    sat = None
                if sat is not None:
                    out = sat if out is None else out.join(sat, "doc_id", "left_semi")
            for c in q.must_not:
                out = out.join(self.matching(c), "doc_id", "left_anti")
            return out
        # positional queries: reuse the scored path (kernel decides matches)
        return self.scored(q).select("doc_id")

    def _rewrite_complex_phrase(self, q: Q.ComplexPhrase) -> Q.Query:
        """ComplexPhraseQuery.rewrite (ComplexPhraseQueryParser.java:60 inner
        class): expand every multi-term slot against the term dictionary
        (capped, like the span rewrite materializing terms), then

          slop == 0 -> MultiPhraseQuery over the expanded slots
          slop  > 0 -> SpanNearQuery(slop, inOrder=true) analog: OrderedNear
                       over slot disjunctions
        """
        expanded: list[tuple[str, ...]] = []
        for slot in q.slots:
            terms: list[str] = []
            for sub in slot:
                if isinstance(sub, Q.Term):
                    terms.append(sub.term)
                else:
                    rows = self._cap_expansion(self._expand_terms(sub), sub).collect()
                    terms.extend(r["term"] for r in rows)
            if not terms:
                # a slot with zero dictionary matches can never match
                return Q.Boolean(
                    must=(Q.Term("\x00__never__"),), boost=q.boost
                )
            expanded.append(tuple(sorted(set(terms))))
        if q.slop == 0:
            return Q.MultiPhrase(tuple(expanded), boost=q.boost, field=q.field)
        subs = tuple(
            Q.Term(ts[0], field=q.field)
            if len(ts) == 1
            else Q.Boolean(should=tuple(Q.Term(t, field=q.field) for t in ts))
            for ts in expanded
        )
        return Q.OrderedNear(q.slop, subs, boost=q.boost)

    def _expand_terms(self, q: Q.Query) -> DataFrame:
        """Multi-term expansion against the term dictionary (term_stats).

        PrefixQuery.java:34 / WildcardQuery.java:43 / RegexpQuery.java:48 /
        TermRangeQuery.java:43 / FuzzyQuery.java:54 — the term dict scan; the
        sorted/partitioned term_stats plays the BlockTree role.
        """
        ts = self.index.term_stats.where(F.col("field") == self._field_of(q))
        if isinstance(q, Q.Prefix):
            return ts.where(F.col("term").startswith(q.prefix)).select("term")
        if isinstance(q, Q.Wildcard):
            return ts.where(F.col("term").rlike(_lucene_wildcard_to_rlike(q.pattern))).select(
                "term"
            )
        if isinstance(q, Q.Regexp):
            # Lucene RegExp automaton dialect (RegExp.java:40-315), not Java
            # regex: anchored, ~/&/@/#/<n-m>/"..." operators — translated by
            # search.regexp into JVM-side rlike combinations
            from .regexp import to_term_condition

            return ts.where(to_term_condition(q.pattern, F.col("term"))).select("term")
        if isinstance(q, Q.TermRange):
            cond = F.lit(True)
            if q.lower is not None:
                cond = cond & (
                    F.col("term") >= q.lower if q.include_lower else F.col("term") > q.lower
                )
            if q.upper is not None:
                cond = cond & (
                    F.col("term") <= q.upper if q.include_upper else F.col("term") < q.upper
                )
            return ts.where(cond).select("term")
        if isinstance(q, Q.Fuzzy):
            # FuzzyTermsEnum-style pruning (FuzzyTermsEnum.java automaton ∩
            # sorted dict): never levenshtein the whole dictionary.  Two
            # SOUND pre-filters cut the scan first — a length band
            # |len(t)−len(q)| ≤ max_edits (an edit changes length by ≤1) and
            # the non-fuzzy prefix (FuzzyQuery prefixLength) as a startswith
            # range predicate that min/max column stats can prune; only the
            # survivors pay the (thresholded) edit-distance evaluation.
            cond = (
                (F.length(F.col("term")) >= len(q.term) - q.max_edits)
                & (F.length(F.col("term")) <= len(q.term) + q.max_edits)
            )
            if q.prefix_length > 0:
                cond = cond & F.col("term").startswith(q.term[: q.prefix_length])
            matched = ts.where(cond).where(
                F.levenshtein(F.col("term"), F.lit(q.term), q.max_edits) >= 0
            )
            if q.max_expansions:
                # TopTermsRewrite cap (MultiTermQuery.java:234): FuzzyQuery
                # keeps the highest-boost terms — boost decreases with edit
                # distance (FuzzyTermsEnum), ties by df desc then term asc.
                # The LIMIT runs as a DataFrame top-k; only the capped term
                # list ever reaches the driver.
                return (
                    matched.withColumn(
                        "_ed", F.levenshtein(F.col("term"), F.lit(q.term), q.max_edits)
                    )
                    .orderBy(F.asc("_ed"), F.desc("df"), F.asc("term"))
                    .limit(q.max_expansions)
                    .select("term")
                )
            return matched.select("term")
        raise ValueError(type(q).__name__)

    def _cap_expansion(self, terms: DataFrame, q: Q.Query) -> DataFrame:
        """TopTerms cap for prefix/wildcard/regexp/range expansions
        (MultiTermQuery.java:234): keep the max_expansions highest-df terms
        (constant boost -> df is the tiebreaker that keeps scores useful)."""
        cap = getattr(q, "max_expansions", None)
        if not cap or isinstance(q, Q.Fuzzy):  # Fuzzy caps inside _expand_terms
            return terms
        ts = self.index.term_stats.where(F.col("field") == self._field_of(q))
        return (
            terms.join(ts.select("term", "df"), "term")
            .orderBy(F.desc("df"), F.asc("term"))
            .limit(cap)
            .select("term")
        )

    def _scored_multi_term(self, q: Q.Query) -> DataFrame:
        """SCORING_BOOLEAN rewrite, fully DataFrame-side: the expanded term
        set is joined (broadcast) against postings — the term list itself
        never materializes on the driver, so a 10^4-term wildcard stays
        distributed.  score(doc) = sum over matched expanded terms of the
        term's BM25 score, like a rewritten BooleanQuery of SHOULD
        TermQueries (MultiTermQuery.java:114)."""
        f = self._field_of(q)
        terms = self._cap_expansion(self._expand_terms(q), q)
        idx = self.index
        stats = idx.term_stats.where(F.col("field") == f).select("term", "df", "ttf")
        hits = (
            idx.postings.where(F.col("field") == f)
            .select("term", "doc_id", "tf")
            .join(F.broadcast(terms), "term")
            # stats after the field filter is query-expansion-sized; without
            # the hint this was a shuffle of the postings side at scale
            .join(F.broadcast(stats), "term")
            .join(
                idx.docs.where(F.col("field") == f).select("doc_id", "doclen", "norm_byte"),
                "doc_id",
            )
        )
        if self.similarity is not None:
            score = self._sim_score_col(f)
        elif self._f32:
            score = self._lucene_score_udf(f)(F.col("tf"), F.col("norm_byte"), F.col("df"))
        else:
            score = self._score_col(self._idf_col(F.col("df")), F.col("tf"), F.col("doclen"), f)
        if isinstance(q, Q.Fuzzy):
            # FuzzyTermsEnum.java:228: per-term boost 1 - edits/termLength —
            # closer expansions outrank farther ones
            sim = F.lit(1.0) - F.levenshtein(
                F.col("term"), F.lit(q.term)
            ).cast("double") / F.lit(float(max(len(q.term), 1)))
            score = score * F.greatest(sim, F.lit(0.0))
        return (
            hits.withColumn("score", score)
            .groupBy("doc_id")
            .agg((F.sum("score") * F.lit(float(q.boost))).alias("score"))
        )

    def _expanded_docs(self, q: Q.Query) -> DataFrame:
        terms = self._cap_expansion(self._expand_terms(q), q)
        return (
            self.index.postings.where(F.col("field") == self._field_of(q))
            .join(F.broadcast(terms), "term", "left_semi")
            .select("doc_id")
            .distinct()
        )

    def _numeric_range_docs(self, q: Q.NumericRange) -> DataFrame:
        if self.corpus is None:
            raise ValueError("NumericRange requires a corpus DataFrame")
        col = F.col(q.column)
        cond = F.lit(True)
        if q.lower is not None:
            cond = cond & (col >= q.lower if q.include_lower else col > q.lower)
        if q.upper is not None:
            cond = cond & (col <= q.upper if q.include_upper else col < q.upper)
        return self.corpus.where(cond).select(F.col("doc_id").cast("long").alias("doc_id"))

    # --------------------------------------------------- positional kernel

    def _expand_tree(self, q: Q.Query) -> Q.Query | None:
        """Rewrite multi-term nodes inside a positional query tree to term
        disjunctions against the term dictionary (MultiTermQuery.rewrite);
        returns None if an expansion is empty (query cannot match)."""
        if isinstance(q, (Q.Prefix, Q.Wildcard, Q.Regexp, Q.TermRange, Q.Fuzzy)):
            # expansion is capped (TopTerms) BEFORE the collect, so a broad
            # pattern inside a near-query cannot flood the driver
            terms = [
                r["term"]
                for r in self._cap_expansion(self._expand_terms(q), q).collect()
            ]
            if not terms:
                return None
            if len(terms) == 1:
                return Q.Term(terms[0])
            return Q.Boolean(should=tuple(Q.Term(t) for t in sorted(terms)))
        if isinstance(q, (Q.OrderedNear, Q.UnorderedNear)):
            subs = [self._expand_tree(c) for c in q.subs]
            if any(s is None for s in subs):
                return None
            return type(q)(q.slop, tuple(subs), q.collect_leaves, q.boost)
        if isinstance(q, Q.NonOverlapping):
            m = self._expand_tree(q.minuend)
            s = self._expand_tree(q.subtrahend)
            if m is None:
                return None
            return Q.NonOverlapping(m, s if s is not None else Q.Term("\x00none"), q.boost)
        if isinstance(q, Q.IntervalFiltered):
            inner = self._expand_tree(q.inner)
            if inner is None:
                return None
            return Q.IntervalFiltered(inner, q.filt, q.collect_leaves, q.boost)
        if isinstance(q, Q.Boolean):
            must = [self._expand_tree(c) for c in q.must]
            if any(c is None for c in must):
                return None
            should = [s for c in q.should if (s := self._expand_tree(c)) is not None]
            must_not = [s for c in q.must_not if (s := self._expand_tree(c)) is not None]
            return Q.Boolean(tuple(must), tuple(should), tuple(must_not), q.min_should_match, q.boost)
        return q

    def _required_filter_helps(
        self, field: str, leaf_terms: list[str], required: set
    ) -> bool:
        """Should the required-terms semi-filter run before the positions
        groupBy?  Best case it keeps len(leaf_terms) * min(required df) of
        the sum(df) hit rows; when that bound cannot even halve the
        shuffle, the extra aggregate + semi-join stages cost more than
        they save at every scale."""
        leaf_dfs = self._stats_of(field, leaf_terms)
        sum_df = sum(d for d, _ in leaf_dfs.values())
        min_req = min(leaf_dfs.get(t, (0, 0))[0] for t in required)
        return min_req * len(leaf_terms) * 2 <= sum_df

    def _scored_positional(self, q: Q.Query, freq_mode: str) -> DataFrame:
        """Interval-kernel execution: gather per-doc positions for the leaf
        terms (pre-filtered to candidate docs by a required-term semi-join),
        run the minimal-interval kernel per doc inside an Arrow-batched UDF,
        score with the IntervalFilterQuery semantics."""
        if self.similarity is not None:
            raise ValueError(
                "positional queries score with BM25/classic similarities; "
                "the SimilarityBase families cover term-level scoring"
            )
        expanded = self._expand_tree(q)
        if expanded is None:
            return self.index.docs.select("doc_id").where(F.lit(False)).withColumn(
                "score", F.lit(0.0)
            )
        q = expanded
        pfield = self._positional_field(q)
        leaf_terms = sorted(set(Q.terms_of(q)))
        required = _required_terms(q)
        hits = self.term_hits(leaf_terms, with_positions=True, field=pfield).select(
            "doc_id", "term", "positions", "doclen", "norm_byte", "df"
        )
        if required:
            # docs must contain every required term: count-distinct
            # semi-filter BEFORE the positions groupBy, so non-candidate
            # docs' position arrays never shuffle.  Stats-driven (r10, the
            # CommonTermsQuery df-split idea): the filter costs an extra
            # aggregate + semi-join stage, and its best case keeps
            # len(leaf_terms) * min(required df) of the sum(df) hit rows —
            # when that bound cannot even halve the shuffle (unselective
            # conjunctions of similarly-common terms, e.g. a 2-term phrase
            # of head words), the stages cost more than they save at every
            # scale, so skip it.  dfs come from the memoized _stats_of
            # lookup; the filter is purely an optimization (the kernel
            # emits n=0 for docs missing a required term), so skipping it
            # is result-identical.
            if self._required_filter_helps(pfield, leaf_terms, required):
                req = (
                    self.index.postings.where(
                        (F.col("field") == pfield) & F.col("term").isin(sorted(required))
                    )
                    .groupBy("doc_id")
                    .agg(F.count(F.lit(1)).alias("nreq"))
                    .where(F.col("nreq") == len(required))
                    .select("doc_id")
                )
                hits = hits.join(req, "doc_id", "left_semi")

        per_doc = hits.groupBy("doc_id", "doclen", "norm_byte").agg(
            F.collect_list(F.struct("term", "positions")).alias("tp")
        )

        query = q  # closure capture (dataclasses pickle fine)
        shape = VK.fast_shape(q)
        if freq_mode == "classic_sloppy" and (
            shape is None or shape[0] not in ("csloppy2", "csloppyk", "csloppyr")
        ):
            shape = None  # multi-term slots: Python walk

        if freq_mode == "classic_sloppy" and shape is None:
            # SloppyPhraseScorer walk per doc (search/sloppy.py); MultiPhrase
            # slots become per-slot term sets (position unions kernel-side)
            from .sloppy import sloppy_slots_freq

            if isinstance(q, Q.MultiPhrase):
                phrase_slots = [frozenset(s) for s in q.slots]
            else:
                phrase_slots = [frozenset((t,)) for t in q.terms]
            phrase_slop = int(q.slop)

            @F.pandas_udf(_INTERVAL_RESULT)
            def _kernel(tp: pd.Series) -> pd.DataFrame:
                ns, ivs, sfreqs = [], [], []
                for entries in tp:
                    pos = {e["term"]: list(e["positions"]) for e in entries}
                    nm, fr = sloppy_slots_freq(phrase_slots, pos, phrase_slop)
                    ns.append(nm)
                    ivs.append([])
                    sfreqs.append(float(fr))
                return pd.DataFrame({"n": ns, "intervals": ivs, "sloppy_freq": sfreqs})

        elif shape is not None:
            # batch-vectorized path: the whole Arrow batch becomes flat
            # (doc*stride + pos) key arrays per term; one numpy program per
            # batch instead of an interpreted iterator tree per doc
            @F.pandas_udf(_INTERVAL_RESULT)
            def _kernel(tp: pd.Series) -> pd.DataFrame:
                import numpy as np

                ndocs = len(tp)
                n_out = np.zeros(ndocs, dtype=np.int32)
                sf_out = np.zeros(ndocs, dtype=np.float64)
                if ndocs:
                    td: dict[str, tuple[list, list]] = {}
                    maxpos = 0
                    for di, entries in enumerate(tp):
                        for e in entries:
                            p = np.asarray(e["positions"], dtype=np.int64)
                            if p.size and int(p[-1]) > maxpos:
                                maxpos = int(p[-1])
                            dis, ps = td.setdefault(e["term"], ([], []))
                            dis.append(di)
                            ps.append(p)
                    stride = maxpos + len(td) + 2
                    term_keys = {}
                    for t, (dis, ps) in td.items():
                        lens = np.fromiter((p.size for p in ps), dtype=np.int64, count=len(ps))
                        doc_rep = np.repeat(np.asarray(dis, dtype=np.int64), lens)
                        flat = (
                            np.concatenate(ps) if ps else np.empty(0, dtype=np.int64)
                        )
                        term_keys[t] = doc_rep * stride + flat
                    docs, cnt, sfreq = VK.run_shape(shape, term_keys, stride)
                    n_out[docs] = cnt
                    sf_out[docs] = sfreq
                return pd.DataFrame(
                    {"n": n_out, "intervals": [[] for _ in range(ndocs)], "sloppy_freq": sf_out}
                )

        else:

            @F.pandas_udf(_INTERVAL_RESULT)
            def _kernel(tp: pd.Series) -> pd.DataFrame:
                ns, ivs, sfreqs = [], [], []
                for entries in tp:
                    pos = {e["term"]: list(e["positions"]) for e in entries}
                    it = IK.build_iter(query, pos)
                    if it is None:
                        ns.append(0)
                        ivs.append([])
                        sfreqs.append(0.0)
                        continue
                    items = (
                        it.items
                        if isinstance(it, IK.ReplayIter)
                        else IK._materialize(it)
                    )
                    ns.append(len(items))
                    ivs.append([{"begin": iv.begin, "end": iv.end} for iv, _ in items])
                    sfreqs.append(float(sum(1.0 / (d + 1) if d >= 0 else 1.0 for _, d in items)))
                return pd.DataFrame({"n": ns, "intervals": ivs, "sloppy_freq": sfreqs})

        evaluated = per_doc.withColumn("res", _kernel(F.col("tp"))).where(F.col("res.n") > 0)

        # summed idf over leaf terms (IntervalFilterQuery.getSimWeight:135-151)
        # — dfs from the per-searcher memo (one pruned collect per unseen
        # term set; repeated phrase/near terms cost no job at all)
        stats = {
            t: d for t, (d, _ttf) in self._stats_of(pfield, leaf_terms).items()
        }
        n = self.index.max_doc
        # idfExplain sums per-term float32 idfs in float32
        # (BM25Similarity.java:185-198); repeats count, like termStats[] does
        import numpy as np

        from ..scoring.bm25 import idf as idf32

        if self._classic:
            if self.mode == "classic_lucene":
                from ..scoring.classic import idf_classic

                s32 = np.float32(0.0)
                for t in Q.terms_of(q):
                    s32 = np.float32(s32 + idf_classic(stats.get(t, 0), n))
                sum_idf = float(s32)
            else:  # classic sql mode: float64 exact
                import math

                sum_idf = sum(
                    1.0 + math.log(n / (stats.get(t, 0) + 1.0)) for t in Q.terms_of(q)
                )
        else:
            sum_idf32 = np.float32(0.0)
            for t in Q.terms_of(q):
                sum_idf32 = np.float32(sum_idf32 + idf32(stats.get(t, 0), n))
            sum_idf = float(sum_idf32)

        if freq_mode == "one":
            freq = F.lit(1.0)
        elif freq_mode == "count":
            freq = F.col("res.n").cast("double")
        else:  # sloppy / classic_sloppy
            freq = F.col("res.sloppy_freq")

        boost = getattr(q, "boost", 1.0)
        if self.mode == "classic_lucene":
            # DefaultSimilarity phrase/interval scoring: sqrt(freq) * idf^2
            # * decodeNorm (PhraseWeight binds the summed idf); queryNorm is
            # applied once at the top of the tree (scored())
            import numpy as np

            from ..scoring.classic import DECODE_TABLE

            # sum_idf here is classic idf summed (float32) by the caller
            w = np.float32(np.float32(sum_idf) * np.float32(sum_idf))

            @F.pandas_udf(T.FloatType())
            def _iscore_c(fr: pd.Series, nb: pd.Series) -> pd.Series:
                f32 = np.sqrt(fr.to_numpy(dtype=np.float32), dtype=np.float32)
                norm = DECODE_TABLE[nb.to_numpy(dtype=np.int64) & 0xFF]
                return pd.Series((w * f32 * norm).astype(np.float32))

            score = (_iscore_c(freq, F.col("norm_byte")) * F.lit(boost)).alias("score")
        elif self.mode == "lucene":
            # float32 + quantized norms, consistent with the packed path
            import numpy as np

            from ..scoring.bm25 import norm_cache

            cache = norm_cache(self.index.avgdl_of(pfield), self.k1, self.b)
            w = np.float32(np.float32(sum_idf) * np.float32(self.k1 + 1.0))

            @F.pandas_udf(T.FloatType())
            def _iscore(fr: pd.Series, nb: pd.Series) -> pd.Series:
                f32 = fr.to_numpy(dtype=np.float32)
                norm = cache[nb.to_numpy(dtype=np.int64) & 0xFF]
                return pd.Series((w * f32 / (f32 + norm)).astype(np.float32))

            score = (_iscore(freq, F.col("norm_byte")) * F.lit(boost)).alias("score")
        else:
            score = (
                self._score_col(F.lit(sum_idf), freq, F.col("doclen"), pfield) * F.lit(boost)
            ).alias("score")
        return evaluated.select("doc_id", score)

    def highlight(
        self, q: Q.Query, k: int = 10, pad: int = 20, analyzer: str = "code"
    ) -> DataFrame:
        """Interval-driven highlighting (HighlightingIntervalCollector.java:35
        / postings-offsets highlighter): take the top-k docs, re-analyze ONLY
        those docs with character offsets (PostingFeatures.OFFSETS), replay
        the interval kernel, and cut a snippet around the first interval.

        Returns (doc_id, score, begin, end, offset_begin, offset_end, snippet).
        """
        if self.corpus is None:
            raise ValueError("highlight requires a corpus DataFrame")
        from ..analysis.tokenizer import OFFSET_ANALYZERS

        expanded = self._expand_tree(q)
        top = self.search(q, k)
        joined = top.join(
            self.corpus.select(
                F.col("doc_id").cast("long").alias("doc_id"),
                F.col(self._text_col).alias("_text"),
            ),
            "doc_id",
        )
        tok_fn = OFFSET_ANALYZERS[analyzer]
        query = expanded

        schema = T.StructType(
            [
                T.StructField("begin", T.IntegerType()),
                T.StructField("end", T.IntegerType()),
                T.StructField("offset_begin", T.IntegerType()),
                T.StructField("offset_end", T.IntegerType()),
                T.StructField("snippet", T.StringType()),
            ]
        )

        @F.pandas_udf(schema)
        def _hl(texts: pd.Series) -> pd.DataFrame:
            rows = []
            for text in texts:
                terms, positions, starts, ends, _ = tok_fn(text)
                pos: dict[str, list[int]] = {}
                cs: dict[int, int] = {}
                ce: dict[int, int] = {}
                for t, p, s0, e0 in zip(terms, positions, starts, ends):
                    pos.setdefault(t, []).append(p)
                    cs[p] = s0
                    ce[p] = e0
                m = IK.match_intervals(query, pos) if query is not None else None
                if not m:
                    rows.append((None, None, None, None, None))
                    continue
                b, e = m[0]
                ob, oe = cs.get(b, 0), ce.get(e, len(text))
                lo = max(0, ob - pad)
                hi = min(len(text), oe + pad)
                rows.append((b, e, ob, oe, text[lo:hi]))
            return pd.DataFrame(
                rows, columns=["begin", "end", "offset_begin", "offset_end", "snippet"]
            )

        return joined.withColumn("h", _hl(F.col("_text"))).select(
            "doc_id",
            "score",
            F.col("h.begin").alias("begin"),
            F.col("h.end").alias("end"),
            F.col("h.offset_begin").alias("offset_begin"),
            F.col("h.offset_end").alias("offset_end"),
            F.col("h.snippet").alias("snippet"),
        )

    def highlight_fragments(
        self,
        q: Q.Query,
        k: int = 10,
        n_fragments: int = 3,
        fragment_size: int = 100,
        analyzer: str = "code",
    ) -> DataFrame:
        """Highlighter.getBestFragments analog (lucene/highlighter/src/java/
        org/apache/lucene/search/highlight/Highlighter.java getBestFragments
        + SimpleFragmenter): split each top-k doc into fixed-size character
        fragments, score each fragment the QueryScorer way
        (QueryScorer.java:147-171 getTokenScore: a fragment's score is the
        sum of term WEIGHTS — idf here — over the UNIQUE query terms whose
        interval-matched occurrences fall inside it; positions outside a
        surviving interval contribute nothing, the positionSensitive
        checkPosition gate), and return the top `n_fragments`
        NON-OVERLAPPING fragments per doc ordered by fragment score desc
        then position asc.  A fragment holding one rare term therefore
        outranks one holding many occurrences of a common term.

        Returns (doc_id, score, frag_rank, offset_begin, offset_end,
        n_matches, frag_score, snippet).
        """
        import math

        if self.corpus is None:
            raise ValueError("highlight requires a corpus DataFrame")
        from ..analysis.tokenizer import OFFSET_ANALYZERS

        expanded = self._expand_tree(q)
        leaf_terms = sorted(set(Q.terms_of(expanded))) if expanded else []
        dfs = {t: self._df_of(self._positional_field(q), t) for t in leaf_terms}
        n_total = self.index.max_doc
        idf = {
            t: math.log(1.0 + (n_total - d + 0.5) / (d + 0.5))
            for t, d in dfs.items()
        }
        top = self.search(q, k)
        joined = top.join(
            self.corpus.select(
                F.col("doc_id").cast("long").alias("doc_id"),
                F.col(self._text_col).alias("_text"),
            ),
            "doc_id",
        )
        tok_fn = OFFSET_ANALYZERS[analyzer]
        query = expanded
        fsz = int(fragment_size)
        nfr = int(n_fragments)

        # FastVectorHighlighter-style multi-color tags (vectorhighlight/
        # BaseFragmentsBuilder.java COLORED_PRE_TAGS): each query leaf term
        # gets its own tag index, cycling through the palette
        tag_of_term = {t: i % 10 for i, t in enumerate(leaf_terms)}

        frag_schema = T.ArrayType(
            T.StructType(
                [
                    T.StructField("offset_begin", T.IntegerType()),
                    T.StructField("offset_end", T.IntegerType()),
                    T.StructField("n_matches", T.IntegerType()),
                    T.StructField("frag_score", T.DoubleType()),
                    T.StructField("snippet", T.StringType()),
                    T.StructField("snippet_tagged", T.StringType()),
                ]
            )
        )

        @F.pandas_udf(frag_schema)
        def _frags(texts: pd.Series) -> pd.Series:
            out = []
            for text in texts:
                terms, positions, starts, ends, _ = tok_fn(text)
                pos: dict[str, list[int]] = {}
                cs: dict[int, int] = {}
                ce: dict[int, int] = {}
                term_of_pos: dict[int, str] = {}
                for t, p, s0, e0 in zip(terms, positions, starts, ends):
                    pos.setdefault(t, []).append(p)
                    cs[p] = s0
                    ce[p] = e0
                    term_of_pos[p] = t
                m = IK.match_intervals(query, pos) if query is not None else None
                if not m:
                    out.append([])
                    continue
                # token-aligned fragmentation (SimpleFragmenter.isNewFragment:
                # a new fragment starts when the NEXT token would exceed the
                # size budget — fragments never split a token, so a match is
                # always whole inside its fragment)
                bounds: list[tuple[int, int]] = []  # (char_lo, char_hi)
                frag_of_tok: list[int] = []
                lo = 0
                hi = 0
                for s0, e0 in zip(starts, ends):
                    if e0 - lo > fsz and hi > lo:
                        bounds.append((lo, hi))
                        lo = s0
                    frag_of_tok.append(len(bounds))
                    hi = e0
                if hi > lo or not bounds:
                    bounds.append((lo, max(hi, lo)))
                frag_of_pos = dict(zip(positions, frag_of_tok))
                counts: dict[int, int] = {}
                # QueryScorer.getTokenScore: weight counted ONCE per unique
                # term per fragment; only interval-matched positions count
                # (the positionSensitive checkPosition gate)
                uniq: dict[int, set] = {}
                for b, e in m:
                    fi = frag_of_pos.get(b, 0)
                    counts[fi] = counts.get(fi, 0) + 1
                    for p in range(b, e + 1):
                        t = term_of_pos.get(p)
                        if t in idf:
                            uniq.setdefault(frag_of_pos.get(p, fi), set()).add(t)
                scores = {
                    fi: sum(idf[t] for t in ts) for fi, ts in uniq.items()
                }
                best = sorted(
                    counts.items(),
                    key=lambda kv: (-scores.get(kv[0], 0.0), kv[0]),
                )[:nfr]
                # matched char spans per fragment for the tagged snippet
                # (BaseFragmentsBuilder.makeFragment: wrap each matched
                # occurrence in its term's colored tag)
                spans_of_frag: dict[int, list[tuple[int, int, int]]] = {}
                for b, e in m:
                    for p in range(b, e + 1):
                        t = term_of_pos.get(p)
                        if t in tag_of_term and p in cs:
                            spans_of_frag.setdefault(frag_of_pos.get(p, 0), []).append(
                                (cs[p], ce[p], tag_of_term[t])
                            )

                def _tagged(fi: int) -> str:
                    lo, hi = bounds[fi]
                    parts = []
                    cur = lo
                    for s0, e0, ti in sorted(set(spans_of_frag.get(fi, []))):
                        # clamp to the fragment: a match whose char span
                        # crosses the boundary is cut at offset_end, and a
                        # span starting past it is dropped — snippet_tagged
                        # must agree with snippet/offset_end
                        if s0 < cur or s0 >= hi:
                            continue
                        e0 = min(e0, hi)
                        parts.append(text[cur:s0])
                        parts.append(f'<b class="hl{ti}">{text[s0:e0]}</b>')
                        cur = e0
                    parts.append(text[cur:hi])
                    return "".join(parts)

                frags = [
                    {
                        "offset_begin": bounds[fi][0],
                        "offset_end": bounds[fi][1],
                        "n_matches": n,
                        "frag_score": round(scores.get(fi, 0.0), 6),
                        "snippet": text[bounds[fi][0] : bounds[fi][1]],
                        "snippet_tagged": _tagged(fi),
                    }
                    for fi, n in best
                ]
                # rank by fragment score desc, position asc (getBestFragments
                # FragmentQueue order)
                frags.sort(key=lambda f: (-f["frag_score"], f["offset_begin"]))
                out.append(frags)
            return pd.Series(out)

        return (
            joined.withColumn("frags", _frags(F.col("_text")))
            .select("doc_id", "score", F.posexplode("frags").alias("i", "f"))
            .select(
                "doc_id",
                "score",
                (F.col("i") + 1).alias("frag_rank"),
                F.col("f.offset_begin").alias("offset_begin"),
                F.col("f.offset_end").alias("offset_end"),
                F.col("f.n_matches").alias("n_matches"),
                F.col("f.frag_score").alias("frag_score"),
                F.col("f.snippet").alias("snippet"),
                F.col("f.snippet_tagged").alias("snippet_tagged"),
            )
        )

    def highlight_passages(
        self,
        q: Q.Query,
        k: int = 10,
        n_passages: int = 2,
        analyzer: str = "code",
    ) -> DataFrame:
        """PostingsHighlighter analog (lucene/highlighter/src/java/org/
        apache/lucene/search/postingshighlight/PostingsHighlighter.java:103):
        sentence-bounded passages (BreakIterator.getSentenceInstance role —
        here a sentence regex), each scored in the PassageScorer shape
        (PassageScorer.java:60): per UNIQUE matched term,
        idf(term) * tf / (tf + k1*(1-b + b*len/avgLen)) summed — BM25
        saturation with the passage's token length normalized by the doc's
        average passage length.  Top `n_passages` per top-k doc.

        Returns (doc_id, score, passage_rank, offset_begin, offset_end,
        passage_score, snippet).
        """
        import math
        import re as _re

        if self.corpus is None:
            raise ValueError("highlight requires a corpus DataFrame")
        from ..analysis.tokenizer import OFFSET_ANALYZERS

        expanded = self._expand_tree(q)
        leaf_terms = sorted(set(Q.terms_of(expanded))) if expanded else []
        dfs = {t: self._df_of(self._positional_field(q), t) for t in leaf_terms}
        n = self.index.max_doc
        idf = {
            t: math.log(1.0 + (n - d + 0.5) / (d + 0.5)) for t, d in dfs.items()
        }
        top = self.search(q, k)
        joined = top.join(
            self.corpus.select(
                F.col("doc_id").cast("long").alias("doc_id"),
                F.col(self._text_col).alias("_text"),
            ),
            "doc_id",
        )
        tok_fn = OFFSET_ANALYZERS[analyzer]
        query = expanded
        npass = int(n_passages)
        k1, b = self.k1, self.b
        sent_re = _re.compile(r"[^.!?\n]+(?:[.!?]+|\n|$)")

        pass_schema = T.ArrayType(
            T.StructType(
                [
                    T.StructField("offset_begin", T.IntegerType()),
                    T.StructField("offset_end", T.IntegerType()),
                    T.StructField("passage_score", T.DoubleType()),
                    T.StructField("snippet", T.StringType()),
                ]
            )
        )

        @F.pandas_udf(pass_schema)
        def _passages(texts: pd.Series) -> pd.Series:
            out = []
            for text in texts:
                terms, positions, starts, ends, _ = tok_fn(text)
                pos: dict[str, list[int]] = {}
                term_of_pos: dict[int, str] = {}
                char_of_pos: dict[int, int] = {}
                for t, p, s0, _e0 in zip(terms, positions, starts, ends):
                    pos.setdefault(t, []).append(p)
                    term_of_pos[p] = t
                    char_of_pos[p] = s0
                m = IK.match_intervals(query, pos) if query is not None else None
                if not m:
                    out.append([])
                    continue
                spans = [(mm.start(), mm.end()) for mm in sent_re.finditer(text)]
                if not spans:
                    spans = [(0, len(text))]
                # token length per passage (for the length norm)
                tok_count = [0] * len(spans)
                si = 0
                for s0 in starts:
                    while si < len(spans) and s0 >= spans[si][1]:
                        si += 1
                    if si < len(spans):
                        tok_count[si] += 1
                avg_len = max(sum(tok_count) / len(spans), 1.0)
                # matched-term tf per passage: every query interval endpoint
                # position contributes its own term occurrence
                tfs: list[dict[str, int]] = [dict() for _ in spans]
                import bisect

                span_starts = [s for s, _ in spans]
                for bgn, end in m:
                    for p in (bgn, end) if end != bgn else (bgn,):
                        c = char_of_pos.get(p)
                        t = term_of_pos.get(p)
                        if c is None or t is None:
                            continue
                        si2 = bisect.bisect_right(span_starts, c) - 1
                        d = tfs[max(si2, 0)]
                        d[t] = d.get(t, 0) + 1
                scored = []
                for i, d in enumerate(tfs):
                    if not d:
                        continue
                    norm = k1 * (1 - b + b * max(tok_count[i], 1) / avg_len)
                    s = sum(
                        idf.get(t, 0.0) * tf / (tf + norm) for t, tf in d.items()
                    )
                    scored.append((i, s))
                scored.sort(key=lambda x: (-x[1], x[0]))
                out.append(
                    [
                        {
                            "offset_begin": spans[i][0],
                            "offset_end": spans[i][1],
                            "passage_score": float(s),
                            "snippet": text[spans[i][0] : spans[i][1]],
                        }
                        for i, s in scored[:npass]
                    ]
                )
            return pd.Series(out)

        return (
            joined.withColumn("ps", _passages(F.col("_text")))
            .select("doc_id", "score", F.posexplode("ps").alias("i", "p"))
            .select(
                "doc_id",
                "score",
                (F.col("i") + 1).alias("passage_rank"),
                F.col("p.offset_begin").alias("offset_begin"),
                F.col("p.offset_end").alias("offset_end"),
                F.col("p.passage_score").alias("passage_score"),
                F.col("p.snippet").alias("snippet"),
            )
        )

    def intervals(self, q: Q.Query) -> DataFrame:
        """(doc_id, begin, end) of every surviving interval — the highlighter
        feed (HighlightingIntervalCollector analog)."""
        leaf_terms = sorted(set(Q.terms_of(q)))
        hits = self.term_hits(
            leaf_terms, with_positions=True, field=self._positional_field(q)
        ).select("doc_id", "term", "positions")
        per_doc = hits.groupBy("doc_id").agg(
            F.collect_list(F.struct("term", "positions")).alias("tp")
        )
        query = q

        @F.pandas_udf(_INTERVAL_RESULT)
        def _kernel(tp: pd.Series) -> pd.DataFrame:
            ns, ivs, sf = [], [], []
            for entries in tp:
                pos = {e["term"]: list(e["positions"]) for e in entries}
                m = IK.match_intervals(query, pos)
                ns.append(len(m) if m else 0)
                ivs.append([{"begin": b, "end": e} for b, e in (m or [])])
                sf.append(0.0)
            return pd.DataFrame({"n": ns, "intervals": ivs, "sloppy_freq": sf})

        return (
            per_doc.withColumn("res", _kernel(F.col("tp")))
            .where(F.col("res.n") > 0)
            .select("doc_id", F.explode("res.intervals").alias("iv"))
            .select("doc_id", F.col("iv.begin").alias("begin"), F.col("iv.end").alias("end"))
        )

    # --------------------------------------------------- time-limited search

    def search_with_timeout(
        self, q: Q.Query, k: int = 10, timeout_sec: float = 30.0
    ) -> DataFrame:
        """TimeLimitingCollector analog (TimeLimitingCollector.java:32): abort
        the search when the budget expires.  Spark's unit of cancellation is
        the job, not the collected hit, so exceeding the budget cancels the
        query's job group and raises TimeExceeded (partial-hit delivery is a
        per-collector notion that doesn't exist under whole-stage execution).
        Rows are collected eagerly and re-wrapped so cancellation cannot leak
        into an unrelated later job."""
        import threading
        import uuid

        spark = self.index.postings.sparkSession
        sc = spark.sparkContext
        group = f"timelimited-{uuid.uuid4().hex[:12]}"
        result: dict = {}

        def _run():
            sc.setJobGroup(group, "search_with_timeout", interruptOnCancel=True)
            try:
                result["rows"] = self.search(q, k).collect()
            except Exception as e:  # noqa: BLE001 — surfaced below
                result["error"] = e
            finally:
                sc.setJobGroup("", "")

        t = threading.Thread(target=_run, daemon=True)
        t.start()
        t.join(timeout_sec)
        if t.is_alive():
            sc.cancelJobGroup(group)
            t.join(5.0)
            raise TimeExceeded(
                f"search exceeded {timeout_sec}s budget (job group {group} cancelled)"
            )
        if "error" in result:
            raise result["error"]
        return spark.createDataFrame(
            result["rows"], schema="doc_id long, score double"
        )

    # ------------------------------------------------------------- explain

    def explain(self, q: Q.Query, doc_id: int) -> dict:
        """Weight.explain analog (Weight.java:64, BM25Similarity.explain):
        a nested {value, description, match, details} breakdown of doc_id's
        score for `q`.  Invariant (CheckHits.java:35): explain(q, d)[\"value\"]
        equals the scored() value for matching docs — tested in
        tests/test_explain.py.  Driver-side point lookups; debugging API,
        not a batch path."""
        if isinstance(q, Q.Term):
            f = self._field_of(q)
            row = (
                self.index.postings.where(
                    (F.col("field") == f)
                    & (F.col("term") == q.term)
                    & (F.col("doc_id") == doc_id)
                )
                .select("tf")
                .collect()
            )
            if not row:
                return {
                    "match": False,
                    "value": 0.0,
                    "description": f"no matching term {f}:{q.term} in {doc_id}",
                    "details": [],
                }
            tf = float(row[0]["tf"])
            df_row = self.index.term_stats.where(
                (F.col("field") == f) & (F.col("term") == q.term)
            ).collect()
            df = int(df_row[0]["df"]) if df_row else 0
            drow = self.index.docs.where(
                (F.col("field") == f) & (F.col("doc_id") == doc_id)
            ).collect()[0]
            n = self.index.max_doc
            avgdl = self.index.avgdl_of(f)
            import math

            idf_v = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            if self._classic:
                # DefaultSimilarity explain: queryNorm * sqrt(tf) * idf^2 * norm
                import numpy as np

                from ..scoring.classic import DECODE_TABLE, idf_classic, query_norm

                qn = query_norm(self._sum_sq_weights(q))
                if self.mode == "classic_lucene":
                    i32 = idf_classic(df, n)
                    norm = np.float32(DECODE_TABLE[int(drow["norm_byte"]) & 0xFF])
                    tf32 = np.sqrt(np.float32(tf), dtype=np.float32)
                    value = float(
                        np.float32(
                            np.float32(i32 * i32) * tf32 * norm * qn * np.float32(q.boost)
                        )
                    )
                    idf_v = float(i32)
                else:
                    idf_v = 1.0 + math.log(n / (df + 1.0))
                    value = (
                        math.sqrt(tf) * idf_v * idf_v / math.sqrt(float(drow["doclen"]))
                        * float(qn) * q.boost
                    )
                return {
                    "match": True,
                    "value": value,
                    "description": f"weight({f}:{q.term} in {doc_id}) [DefaultSimilarity]",
                    "details": [
                        {"value": idf_v, "description": f"idf(docFreq={df}, numDocs={n})"},
                        {"value": float(qn), "description": "queryNorm"},
                        {"value": tf, "description": f"tf(freq={tf})"},
                    ],
                }
            if self.mode == "lucene":
                import numpy as np

                from ..scoring.bm25 import idf as idf32
                from ..scoring.bm25 import norm_cache

                cache = norm_cache(avgdl, self.k1, self.b)
                w = np.float32(idf32(df, n) * np.float32(self.k1 + 1.0))
                norm = float(cache[int(drow["norm_byte"]) & 0xFF])
                tf32 = np.float32(tf)
                value = float(np.float32(w * tf32 / (tf32 + np.float32(norm))))
                idf_v = float(idf32(df, n))
            else:
                norm = self.k1 * (1.0 - self.b + self.b * float(drow["doclen"]) / avgdl)
                value = idf_v * (self.k1 + 1.0) * tf / (tf + norm)
            value *= q.boost
            return {
                "match": True,
                "value": value,
                "description": (
                    f"weight({f}:{q.term} in {doc_id}) [BM25, k1={self.k1}, b={self.b}]"
                    + (f" boost={q.boost}" if q.boost != 1.0 else "")
                ),
                "details": [
                    {"value": idf_v, "description": f"idf(docFreq={df}, maxDocs={n})"},
                    {"value": tf, "description": f"tf(termFreq={tf:g})"},
                    {
                        "value": norm,
                        "description": f"fieldNorm(doclen={int(drow['doclen'])}, avgdl={avgdl:.4f})",
                    },
                ],
            }

        if isinstance(q, Q.MatchAll):
            return {"match": True, "value": float(q.boost), "description": "MatchAllDocsQuery", "details": []}

        if isinstance(q, Q.ConstantScore):
            inner = self.explain(q.inner, doc_id)
            m = inner["match"]
            return {
                "match": m,
                "value": float(q.boost) if m else 0.0,
                "description": "ConstantScore",
                "details": [inner],
            }

        if isinstance(q, Q.Boolean):
            for c in q.must_not:
                sub = self.explain(c, doc_id)
                if sub["match"]:
                    return {
                        "match": False,
                        "value": 0.0,
                        "description": "excluded by MUST_NOT clause",
                        "details": [sub],
                    }
            must = [self.explain(c, doc_id) for c in q.must]
            should = [self.explain(c, doc_id) for c in q.should]
            n_should = sum(1 for s in should if s["match"])
            msm = q.min_should_match if q.must else max(q.min_should_match, 1)
            if any(not m["match"] for m in must):
                return {
                    "match": False,
                    "value": 0.0,
                    "description": "failure to meet condition of required clause",
                    "details": must,
                }
            if q.should and n_should < msm:
                return {
                    "match": False,
                    "value": 0.0,
                    "description": f"failure to match minimumNumberShouldMatch={msm}",
                    "details": should,
                }
            details = must + [s for s in should if s["match"]]
            value = sum(d["value"] for d in details) * q.boost
            return {"match": True, "value": value, "description": "sum of:", "details": details}

        if isinstance(q, Q.DisjunctionMax):
            subs = [self.explain(c, doc_id) for c in q.subs]
            matching = [s for s in subs if s["match"]]
            if not matching:
                return {"match": False, "value": 0.0, "description": "no matching clause", "details": subs}
            mx = max(s["value"] for s in matching)
            sm = sum(s["value"] for s in matching)
            value = (mx + q.tie_breaker * (sm - mx)) * q.boost
            return {
                "match": True,
                "value": value,
                "description": f"max plus {q.tie_breaker} times others of:",
                "details": matching,
            }

        # positional / multi-term / numeric-range: score via the batch path
        # for this single doc (exact same plan, filtered)
        row = (
            self.scored(q)
            .where(F.col("doc_id") == doc_id)
            .collect()
        )
        if not row:
            return {
                "match": False,
                "value": 0.0,
                "description": f"no match for {type(q).__name__} in {doc_id}",
                "details": [],
            }
        return {
            "match": True,
            "value": float(row[0]["score"]),
            "description": f"{type(q).__name__} (scored via interval/expansion path)",
            "details": [],
        }

    @staticmethod
    def format_explain(e: dict, indent: int = 0) -> str:
        """Render an explain() tree like Explanation.toString()."""
        pad = "  " * indent
        out = [f"{pad}{e['value']:.6g} = {e['description']}"]
        for d in e.get("details", []):
            out.append(Searcher.format_explain(d, indent + 1))
        return "\n".join(out)

    def intervals_with_offsets(self, q: Q.Query) -> DataFrame:
        """(doc_id, begin, end, offset_begin, offset_end) per surviving
        interval, with character offsets read from the OFFSETS posting
        streams — no re-tokenization (Interval.java:22-37 carries
        offsetBegin/offsetEnd populated from the postings, Weight.java:217-235;
        golden parity: TestPositionsAndOffsets).  Requires an index built
        with keep_offsets=True."""
        if "starts" not in self.index.postings.columns:
            raise ValueError("index was built without keep_offsets=True")
        pfield = self._positional_field(q)
        leaf_terms = sorted(set(Q.terms_of(q)))
        hits = self.index.postings.where(
            (F.col("field") == pfield) & F.col("term").isin(leaf_terms)
        ).select("doc_id", "term", "positions", "starts", "ends")
        per_doc = hits.groupBy("doc_id").agg(
            F.collect_list(F.struct("term", "positions", "starts", "ends")).alias("tp")
        )
        query = q

        schema = T.StructType(
            [
                T.StructField(
                    "matches",
                    T.ArrayType(
                        T.StructType(
                            [
                                T.StructField("begin", T.IntegerType()),
                                T.StructField("end", T.IntegerType()),
                                T.StructField("offset_begin", T.IntegerType()),
                                T.StructField("offset_end", T.IntegerType()),
                            ]
                        )
                    ),
                )
            ]
        )

        @F.pandas_udf(schema)
        def _kernel(tp: pd.Series) -> pd.DataFrame:
            out = []
            for entries in tp:
                pos = {e["term"]: list(e["positions"]) for e in entries}
                # position -> (char start, char end), from the posting streams
                omap: dict[int, tuple[int, int]] = {}
                for e in entries:
                    for p, s0, e0 in zip(e["positions"], e["starts"], e["ends"]):
                        omap[int(p)] = (int(s0), int(e0))
                m = IK.match_intervals(query, pos)
                if not m:
                    out.append(None)
                    continue
                out.append(
                    [
                        {
                            "begin": b,
                            "end": e,
                            "offset_begin": omap.get(b, (0, 0))[0],
                            "offset_end": omap.get(e, (0, 0))[1],
                        }
                        for b, e in m
                    ]
                )
            return pd.DataFrame({"matches": out})

        return (
            per_doc.withColumn("res", _kernel(F.col("tp")))
            .where(F.col("res.matches").isNotNull())
            .select("doc_id", F.explode("res.matches").alias("m"))
            .select(
                "doc_id",
                F.col("m.begin").alias("begin"),
                F.col("m.end").alias("end"),
                F.col("m.offset_begin").alias("offset_begin"),
                F.col("m.offset_end").alias("offset_end"),
            )
        )

    def fielded_intervals(self, q: Q.Query) -> DataFrame:
        """(doc_id, field, begin, end) of every collected LEAF interval of a
        (possibly cross-field) Boolean-of-Terms query — the
        TestFieldedIntervals contract: the MatchCollector, driven through
        CombinedIntervalIterator over per-field children, accumulates every
        present leaf term's positions tagged with its field, deduped and
        ordered (doc, field asc, begin asc, end desc)
        (IntervalTestBase.java:200-293, CombinedIntervalIterator.java:25).
        """
        default = self.default_field
        pairs = sorted(set(Q.field_term_pairs(q, default)))
        fields = sorted({f for f, _ in pairs})
        parts = []
        for f in fields:
            terms = [t for ff, t in pairs if ff == f]
            parts.append(
                self.index.postings.where(
                    (F.col("field") == f) & F.col("term").isin(terms)
                ).select("doc_id", "field", "term", "positions")
            )
        hits = parts[0]
        for p in parts[1:]:
            hits = hits.unionByName(p)
        per_doc = hits.groupBy("doc_id").agg(
            F.collect_list(F.struct("field", "term", "positions")).alias("ftp")
        )
        query = q

        schema = T.StructType(
            [
                T.StructField(
                    "matches",
                    T.ArrayType(
                        T.StructType(
                            [
                                T.StructField("field", T.StringType()),
                                T.StructField("begin", T.IntegerType()),
                                T.StructField("end", T.IntegerType()),
                            ]
                        )
                    ),
                )
            ]
        )

        @F.pandas_udf(schema)
        def _kernel(ftp: pd.Series) -> pd.DataFrame:
            out = []
            for entries in ftp:
                pos = {
                    (e["field"], e["term"]): list(e["positions"]) for e in entries
                }
                m = IK.fielded_collect(query, pos, default)
                out.append(
                    [{"field": f, "begin": b, "end": e} for f, b, e in m]
                    if m
                    else None
                )
            return pd.DataFrame({"matches": out})

        return (
            per_doc.withColumn("res", _kernel(F.col("ftp")))
            .where(F.col("res.matches").isNotNull())
            .select("doc_id", F.explode("res.matches").alias("m"))
            .select(
                "doc_id",
                F.col("m.field").alias("field"),
                F.col("m.begin").alias("begin"),
                F.col("m.end").alias("end"),
            )
        )


def _required_terms(q: Q.Query) -> set[str]:
    """Terms that must all be present for a doc to match (conjunction gate)."""
    if isinstance(q, Q.Term):
        return {q.term}
    if isinstance(q, (Q.Phrase,)):
        return set(q.terms)
    if isinstance(q, (Q.OrderedNear, Q.UnorderedNear)):
        out: set[str] = set()
        for c in q.subs:
            out |= _required_terms(c)
        return out
    if isinstance(q, Q.NonOverlapping):
        return _required_terms(q.minuend)
    if isinstance(q, Q.IntervalFiltered):
        return _required_terms(q.inner)
    if isinstance(q, Q.Boolean):
        out = set()
        for c in q.must:
            out |= _required_terms(c)
        return out
    return set()
