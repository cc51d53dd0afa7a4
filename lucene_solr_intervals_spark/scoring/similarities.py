"""SimilarityBase families: DFR, IB, and language-model similarities.

Reference: lucene/core/src/java/org/apache/lucene/search/similarities/ —
SimilarityBase.java:34 subclasses score(stats, freq, docLen) per term.
Each class here emits the same formula as ONE Spark SQL column expression
(whole-stage codegen, no UDF), float64, directly replayable in ANSI SQL —
the "sql"-precision member of the family (the float32/quantized-norm
parity targets remain the BM25/classic modes).

Stats glossary (BasicStats.java):
  n_docs   getNumberOfDocuments()      index max_doc
  df       getDocFreq()                docs containing the term
  ttf      getTotalTermFreq()          total occurrences of the term
  sum_ttf  getNumberOfFieldTokens()    total tokens of the field
  avgdl    getAvgFieldLength()         sum_ttf / n_docs
  dl       docLen (exact doclen here — the sql-precision convention)

Supported similarities:

  DFRInL2     DFRSimilarity(BasicModelIn, AfterEffectL, NormalizationH2):
              tfn = tf * log2(1 + c*avgdl/dl)          NormalizationH2.java:53
              score = boost * tfn * log2((N+1)/(df+0.5))   BasicModelIn.java:36
                      * 1/(tfn+1)                       AfterEffectL.java:33
  IBLL        IBSimilarity(DistributionLL, LambdaDF, NormalizationH2):
              lambda = (df+1)/(N+1)                     LambdaDF.java:33
              score = boost * -ln(lambda/(tfn+lambda))  DistributionLL.java:34
  LMDirichlet p = (ttf+1)/(sum_ttf+1)                   LMSimilarity.java:154
              score = boost * (ln(1 + tf/(mu*p)) + ln(mu/(dl+mu)))
              clipped at 0                              LMDirichletSimilarity.java:65-69
  LMJelinekMercer
              score = boost * ln(1 + ((1-lam)*tf/dl)/(lam*p))
                                                        LMJelinekMercerSimilarity.java:53-57
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

_LN2 = 0.6931471805599453


def _log2(col):
    return F.log(col) / F.lit(_LN2)


@dataclass(frozen=True)
class SimilarityBase:
    """Per-term scoring strategy over exploded stats columns."""

    name: str = "base"

    def score_col(
        self,
        tf: Column,
        df: Column,
        ttf: Column,
        doclen: Column,
        *,
        n_docs: int,
        avgdl: float,
        sum_ttf: int,
    ) -> Column:
        raise NotImplementedError


def _tfn_h2(tf: Column, doclen: Column, c: float, avgdl: float) -> Column:
    """NormalizationH2.java:53: tf * log2(1 + c * avgdl / dl)."""
    return tf * _log2(F.lit(1.0) + F.lit(c) * F.lit(avgdl) / doclen)


@dataclass(frozen=True)
class DFRInL2(SimilarityBase):
    """DFR I(n)L2 (DFRSimilarity.java:61 composition)."""

    c: float = 1.0
    name: str = "dfr_inl2"

    def score_col(self, tf, df, ttf, doclen, *, n_docs, avgdl, sum_ttf):
        tfn = _tfn_h2(tf, doclen, self.c, avgdl)
        basic = tfn * _log2(F.lit(float(n_docs) + 1.0) / (df + 0.5))
        after_effect = F.lit(1.0) / (tfn + 1.0)
        return basic * after_effect


@dataclass(frozen=True)
class IBLL(SimilarityBase):
    """IB with log-logistic distribution, DF lambda, H2 normalization
    (IBSimilarity.java:60 composition)."""

    c: float = 1.0
    name: str = "ib_ll"

    def score_col(self, tf, df, ttf, doclen, *, n_docs, avgdl, sum_ttf):
        tfn = _tfn_h2(tf, doclen, self.c, avgdl)
        lam = (df + 1.0) / F.lit(float(n_docs) + 1.0)
        return -F.log(lam / (tfn + lam))


def _collection_prob(ttf: Column, sum_ttf: int) -> Column:
    """LMSimilarity.DefaultCollectionModel (LMSimilarity.java:154)."""
    return (ttf + 1.0) / F.lit(float(sum_ttf) + 1.0)


@dataclass(frozen=True)
class LMDirichlet(SimilarityBase):
    mu: float = 2000.0
    name: str = "lm_dirichlet"

    def score_col(self, tf, df, ttf, doclen, *, n_docs, avgdl, sum_ttf):
        p = _collection_prob(ttf, sum_ttf)
        raw = F.log(F.lit(1.0) + tf / (F.lit(self.mu) * p)) + F.log(
            F.lit(self.mu) / (doclen + F.lit(self.mu))
        )
        return F.greatest(raw, F.lit(0.0))


@dataclass(frozen=True)
class LMJelinekMercer(SimilarityBase):
    lam: float = 0.1
    name: str = "lm_jelinek_mercer"

    def score_col(self, tf, df, ttf, doclen, *, n_docs, avgdl, sum_ttf):
        p = _collection_prob(ttf, sum_ttf)
        return F.log(
            F.lit(1.0) + (F.lit(1.0 - self.lam) * tf / doclen) / (F.lit(self.lam) * p)
        )


@dataclass(frozen=True)
class SweetSpot(SimilarityBase):
    """SweetSpotSimilarity (lucene/misc/src/java/org/apache/lucene/misc/
    SweetSpotSimilarity.java:41): DefaultSimilarity with a PLATEAU length
    norm (:137-156 — flat 1.0 across the [ln_min, ln_max] "sweet spot" of
    document lengths, degrading as 1/sqrt outside it) and baselineTf
    (:167-186 — tf <= tf_min scores a flat tf_base, else
    sqrt(tf + base^2 - min)).  Per-term score in the sql-precision
    convention: baselineTf(tf) * idf^2 * lengthNorm(dl), classic idf
    = 1 + ln(N/(df+1)).  Defaults degrade to DefaultSimilarity
    (min=max=1, steepness=0.5 -> 1/sqrt(dl); base=min=0 -> sqrt(tf))."""

    name: str = "sweet_spot"
    ln_min: int = 1
    ln_max: int = 1
    steepness: float = 0.5
    tf_base: float = 0.0
    tf_min: float = 0.0

    def score_col(self, tf, df, ttf, doclen, *, n_docs, avgdl, sum_ttf):
        idf = F.lit(1.0) + F.log(F.lit(float(n_docs)) / (df + F.lit(1.0)))
        base, mn = float(self.tf_base), float(self.tf_min)
        tf_col = F.when(tf <= F.lit(mn), F.lit(base)).otherwise(
            F.sqrt(tf + F.lit(base * base - mn))
        )
        tf_col = F.when(tf == F.lit(0.0), F.lit(0.0)).otherwise(tf_col)
        l, h, s = float(self.ln_min), float(self.ln_max), float(self.steepness)
        norm = F.lit(1.0) / F.sqrt(
            F.lit(s)
            * (
                F.abs(doclen - F.lit(l))
                + F.abs(doclen - F.lit(h))
                - F.lit(h - l)
            )
            + F.lit(1.0)
        )
        return tf_col * idf * idf * norm


SIMILARITIES = {
    "dfr_inl2": DFRInL2,
    "ib_ll": IBLL,
    "lm_dirichlet": LMDirichlet,
    "lm_jelinek_mercer": LMJelinekMercer,
    "sweet_spot": SweetSpot,
}


def make_similarity(name: str, **kwargs) -> SimilarityBase:
    try:
        return SIMILARITIES[name](**kwargs)
    except KeyError:
        raise ValueError(
            f"unknown similarity {name!r}; available: {sorted(SIMILARITIES)}"
        ) from None
