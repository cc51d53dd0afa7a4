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


_LOG2_E = 1.4426950408889634  # BasicModelP.java:32 LOG2_E
_PI = 3.141592653589793


def _tfn(
    normalization: str,
    c: float,
    tf: Column,
    ttf: Column,
    doclen: Column,
    avgdl: float,
    sum_ttf: int,
) -> Column:
    """Normalization.tfn dispatch — the DFR/IB "second normalization".

      none  tf                                 Normalization.NoNormalization
      h1    tf * avgdl / dl                    NormalizationH1.java:50 (the
            reference's 4.x H1 ignores its c hyper-parameter)
      h2    tf * log2(1 + c * avgdl / dl)      NormalizationH2.java:53
      h3    (tf + mu*(ttf+1)/(sum_ttf+1))
              / (dl + mu) * mu, mu = c         NormalizationH3.java:44
      z     tf * (avgdl / dl)^z, z = c         NormalizationZ.java:45
    """
    if normalization == "none":
        return tf * F.lit(1.0)
    if normalization == "h1":
        return tf * F.lit(avgdl) / doclen
    if normalization == "h2":
        return tf * _log2(F.lit(1.0) + F.lit(c) * F.lit(avgdl) / doclen)
    if normalization == "h3":
        mu = F.lit(c)
        g = (ttf + 1.0) / F.lit(float(sum_ttf) + 1.0)
        return (tf + mu * g) / (doclen + mu) * mu
    if normalization == "z":
        return tf * F.pow(F.lit(avgdl) / doclen, F.lit(c))
    raise ValueError(f"unknown normalization {normalization!r}")


@dataclass(frozen=True)
class DFR(SimilarityBase):
    """The full DFRSimilarity composition matrix (DFRSimilarity.java:78-154):
    score = basicModel(stats, tfn) * afterEffect(stats, tfn), with tfn from
    the chosen normalization.  7 basic models x 3 after-effects (incl.
    NoAfterEffect) x 5 normalizations (incl. NoNormalization), float64
    sql-precision column expressions.

      basic_model  be BasicModelBE.java:38   d  BasicModelD.java:40
                   g  BasicModelG.java:34    if BasicModelIF.java:32
                   in BasicModelIn.java:33   ine BasicModelIne.java:33
                   p  BasicModelP.java:38
      after_effect l AfterEffectL.java:32    b AfterEffectB.java:32
                   none AfterEffect.NoAfterEffect
      normalization / c: see _tfn (c doubles as H3's mu and Z's z)
    """

    basic_model: str = "in"
    after_effect: str = "l"
    normalization: str = "h2"
    c: float = 1.0
    name: str = "dfr"

    def score_col(self, tf, df, ttf, doclen, *, n_docs, avgdl, sum_ttf):
        tfn = _tfn(self.normalization, self.c, tf, ttf, doclen, avgdl, sum_ttf)
        N = float(n_docs)
        bm = self.basic_model
        if bm == "be":
            # BasicModelBE.java:38-49 (f(n,m) = (m+.5)*log2(n/m)+(n-m)*log2(n))
            Fq = ttf + 1.0 + tfn
            N2 = Fq + F.lit(N)

            def fhelp(nc: Column, mc: Column) -> Column:
                return (mc + 0.5) * _log2(nc / mc) + (nc - mc) * _log2(nc)

            basic = (
                -_log2((N2 - 1.0) * F.lit(2.718281828459045))
                + fhelp(N2 + Fq - 1.0, N2 + Fq - tfn - 2.0)
                - fhelp(Fq, Fq - tfn)
            )
        elif bm == "d":
            # BasicModelD.java:40-49
            Fq = ttf + 1.0 + tfn
            phi = tfn / Fq
            nphi = F.lit(1.0) - phi
            p = 1.0 / (N + 1.0)
            Dkl = phi * _log2(phi / F.lit(p)) + nphi * _log2(nphi / F.lit(1.0 - p))
            basic = Dkl * Fq + 0.5 * _log2(F.lit(1.0) + F.lit(2.0 * _PI) * tfn * nphi)
        elif bm == "g":
            # BasicModelG.java:34-40 (lambda from F/(N+F))
            Fg = ttf + 1.0
            lam = Fg / (F.lit(N) + Fg)
            basic = _log2(lam + 1.0) + tfn * _log2((F.lit(1.0) + lam) / lam)
        elif bm == "if":
            basic = tfn * _log2(F.lit(1.0) + F.lit(N + 1.0) / (ttf + 0.5))
        elif bm == "in":
            basic = tfn * _log2(F.lit(N + 1.0) / (df + 0.5))
        elif bm == "ine":
            # BasicModelIne.java:33-37: ne = N * (1 - ((N-1)/N)^F)
            ne = F.lit(N) * (F.lit(1.0) - F.pow(F.lit((N - 1.0) / N), ttf))
            basic = tfn * _log2(F.lit(N + 1.0) / (ne + 0.5))
        elif bm == "p":
            # BasicModelP.java:38-43
            lam = (ttf + 1.0) / F.lit(N + 1.0)
            basic = (
                tfn * _log2(tfn / lam)
                + (lam + F.lit(1.0) / (F.lit(12.0) * tfn) - tfn) * F.lit(_LOG2_E)
                + 0.5 * _log2(F.lit(2.0 * _PI) * tfn)
            )
        else:
            raise ValueError(f"unknown basic model {bm!r}")
        ae = self.after_effect
        if ae == "l":
            after = F.lit(1.0) / (tfn + 1.0)
        elif ae == "b":
            # AfterEffectB.java:32-36: F = ttf+1, n = df+1
            after = ((ttf + 1.0) + 1.0) / ((df + 1.0) * (tfn + 1.0))
        elif ae == "none":
            after = F.lit(1.0)
        else:
            raise ValueError(f"unknown after effect {ae!r}")
        return basic * after


@dataclass(frozen=True)
class IB(SimilarityBase):
    """The full IBSimilarity matrix (IBSimilarity.java:60): 2 distributions
    x 2 lambdas x the shared normalizations.

      distribution ll DistributionLL.java:34  spl DistributionSPL.java:34
      lam          df LambdaDF.java:33 (df+1)/(N+1)
                   ttf LambdaTTF.java:23 (ttf+1)/(N+1)
    """

    distribution: str = "ll"
    lam: str = "df"
    normalization: str = "h2"
    c: float = 1.0
    name: str = "ib"

    def score_col(self, tf, df, ttf, doclen, *, n_docs, avgdl, sum_ttf):
        tfn = _tfn(self.normalization, self.c, tf, ttf, doclen, avgdl, sum_ttf)
        num = df if self.lam == "df" else ttf
        if self.lam not in ("df", "ttf"):
            raise ValueError(f"unknown lambda {self.lam!r}")
        lam = (num + 1.0) / F.lit(float(n_docs) + 1.0)
        if self.distribution == "ll":
            return -F.log(lam / (tfn + lam))
        if self.distribution == "spl":
            # DistributionSPL.java:34-40 (lambda==1 clamped to .99)
            lam = F.when(lam == 1.0, F.lit(0.99)).otherwise(lam)
            return -F.log(
                (F.pow(lam, tfn / (tfn + 1.0)) - lam) / (F.lit(1.0) - lam)
            )
        raise ValueError(f"unknown distribution {self.distribution!r}")


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
    "dfr": DFR,
    "dfr_inl2": DFRInL2,
    "ib": IB,
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
