"""lucene_solr_intervals_spark — a PySpark-native inverted-index + BM25 +
minimal-interval query engine.

A from-scratch, Spark-first re-expression of the capabilities of the
flaxsearch/lucene-solr-intervals fork (Lucene 4.x + LUCENE-2878 interval
queries).  The reference defines WHAT we compute (BM25 ranking, minimal
interval semantics, postings compression, LSM segment merge); the HOW is
idiomatic PySpark: DataFrames + Catalyst for all relational glue,
Arrow-vectorized pandas UDFs for the domain kernels (tokenize, postings
pack/unpack, block-max WAND, interval matching).

Layout:
  analysis/   tokenizers (StandardAnalyzer-like chain, stopword position holes)
  codecs/     delta-gap + varbyte posting compression (numpy vectorized)
  scoring/    float32 BM25 + SmallFloat byte315 norm quantization (bit-exact)
  intervals/  Vigna-style minimal-interval iterators (ordered/unordered/
              block/disjunction/Brouwerian + within/range/freq filters)
  index/      segment build (mapInPandas), manifest, sort-merge compaction
  search/     query tree, planner, DataFrame + kernel executors, WAND top-k
  ops/        training-data pipeline ops (dedup, ANN, text quality, multimodal)
"""

__version__ = "0.1.0"
