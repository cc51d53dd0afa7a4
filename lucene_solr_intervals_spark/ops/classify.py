"""Classification over the inverted index (lucene/classification module).

naive_bayes_classify re-expresses SimpleNaiveBayesClassifier
(lucene/classification/src/java/org/apache/lucene/classification/
SimpleNaiveBayesClassifier.java:145,206-237) as DataFrame algebra:

  score(c, d) = ln(N_c / N)                                (:255-257)
              + Σ_{w in d, with repeats} ln( (df_c(w) + 1)
                    / (avgUniqueTermsPerDoc * N_c + N) )   (:206-237)

where df_c(w) = number of class-c docs containing w (the reference counts
DOCS, not term frequency: getWordFreqForClass runs text:w AND class:c as a
TotalHitCount query, :239-253) and avgUniqueTermsPerDoc = sumDocFreq /
docCount (:228-237).  Since ln(0 + 1) = 0, absent (class, term) pairs drop
out and the per-class score decomposes into one broadcast-joined
aggregation plus a doclen * ln(den_c) correction — no cross join, no UDF.

knn_classify is KNearestNeighborClassifier (:36): majority label among the
top-k BM25 neighbors of the document's own terms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def naive_bayes_classify(
    index, labels: DataFrame, label_col: str = "label"
) -> DataFrame:
    """Classify every indexed doc: (doc_id, predicted) — resubstitution mode
    (train and classify on the same corpus), ties broken by label asc.
    `labels`: (doc_id, label)."""
    f = getattr(index, "default_field", "text")
    lab = labels.select(
        F.col("doc_id").cast("long").alias("doc_id"), F.col(label_col).alias("label")
    )
    postings = index.postings.where(F.col("field") == f).select("term", "doc_id", "tf")
    docs = index.docs.where(F.col("field") == f).select("doc_id", "doclen")

    n_total = index.max_doc
    # class sizes and priors
    cls = lab.groupBy("label").agg(F.count(F.lit(1)).alias("n_c"))
    # avg unique terms per doc = sumDocFreq / docCount  (:228-237)
    sum_doc_freq = postings.count()
    avg_unique = sum_doc_freq / n_total if n_total else 0.0
    den = cls.select(
        "label",
        (F.lit(avg_unique) * F.col("n_c") + F.lit(float(n_total))).alias("den"),
        (F.log(F.col("n_c").cast("double")) - F.log(F.lit(float(n_total)))).alias(
            "log_prior"
        ),
    )

    # df_c(term) = class-c docs containing term (docs, not tf)
    cls_term = (
        postings.join(lab, "doc_id")
        .groupBy("label", "term")
        .agg(F.count(F.lit(1)).alias("df_c"))
    )

    # Σ_w tf(w,d) * ln(df_c(w)+1): absent pairs contribute ln(1) = 0
    contrib = (
        postings.join(cls_term, "term")
        .groupBy("doc_id", "label")
        .agg(
            F.sum(F.col("tf") * F.log(F.col("df_c").cast("double") + 1.0)).alias(
                "pos_part"
            )
        )
    )

    scored = (
        docs.crossJoin(F.broadcast(den))
        .join(contrib, ["doc_id", "label"], "left")
        .select(
            "doc_id",
            "label",
            (
                F.col("log_prior")
                + F.coalesce(F.col("pos_part"), F.lit(0.0))
                - F.col("doclen").cast("double") * F.log(F.col("den"))
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("label"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id", F.col("label").alias("predicted"))
    )


def knn_classify(
    searcher, labels: DataFrame, doc_id: int, k: int = 10, max_terms: int = 10,
    label_col: str = "label",
) -> str | None:
    """KNearestNeighborClassifier (:36): MoreLikeThis top-k neighbors'
    majority label (ties by label asc), excluding the doc itself."""
    top = searcher.more_like_this(doc_id, max_terms=max_terms, k=k)
    lab = labels.select(
        F.col("doc_id").cast("long").alias("doc_id"), F.col(label_col).alias("label")
    )
    rows = (
        top.join(lab, "doc_id")
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("label"))
        .limit(1)
        .collect()
    )
    return rows[0]["label"] if rows else None
