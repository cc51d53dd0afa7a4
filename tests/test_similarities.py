"""SimilarityBase families (DFR InL2, IB LL, LMDirichlet, LMJelinekMercer)
vs pure-Python oracles of the reference formulas.

Reference: similarities/LMDirichletSimilarity.java:65-69,
LMJelinekMercerSimilarity.java:53-57, BasicModelIn.java:36,
AfterEffectL.java:33, NormalizationH2.java:53, DistributionLL.java:34,
LambdaDF.java:33, LMSimilarity.java:154.
"""

import math

import pytest

from lucene_solr_intervals_spark.search import queries as Q

DOCS = [
    (0, "apple banana apple cherry"),
    (1, "banana cherry cherry cherry durian"),
    (2, "apple apple apple"),
    (3, "durian elderberry fig grape apple banana"),
    (4, "fig grape"),
]


def _corpus_stats():
    toks = {d: t.split() for d, t in DOCS}
    n = len(DOCS)
    sum_ttf = sum(len(v) for v in toks.values())
    avgdl = sum_ttf / n
    return toks, n, sum_ttf, avgdl


def _tf_df_ttf(term):
    toks, n, sum_ttf, avgdl = _corpus_stats()
    tf = {d: v.count(term) for d, v in toks.items() if term in v}
    df = len(tf)
    ttf = sum(tf.values())
    return tf, df, ttf


def _log2(x):
    return math.log(x) / math.log(2.0)


def _expected(sim_name, term):
    toks, n, sum_ttf, avgdl = _corpus_stats()
    tf, df, ttf = _tf_df_ttf(term)
    out = {}
    for d, f in tf.items():
        dl = float(len(toks[d]))
        if sim_name == "dfr_inl2":
            tfn = f * _log2(1 + avgdl / dl)
            s = tfn * _log2((n + 1) / (df + 0.5)) / (tfn + 1.0)
        elif sim_name == "ib_ll":
            tfn = f * _log2(1 + avgdl / dl)
            lam = (df + 1.0) / (n + 1.0)
            s = -math.log(lam / (tfn + lam))
        elif sim_name == "lm_dirichlet":
            p = (ttf + 1.0) / (sum_ttf + 1.0)
            s = math.log(1 + f / (2000.0 * p)) + math.log(2000.0 / (dl + 2000.0))
            s = max(s, 0.0)
        elif sim_name == "lm_jelinek_mercer":
            p = (ttf + 1.0) / (sum_ttf + 1.0)
            s = math.log(1 + (0.9 * f / dl) / (0.1 * p))
        else:
            raise AssertionError(sim_name)
        out[d] = s
    return out


@pytest.fixture(scope="module")
def tiny_index(spark):
    from lucene_solr_intervals_spark.index.builder import build_index

    corpus = spark.createDataFrame(DOCS, ["doc_id", "text"])
    idx = build_index(corpus, analyzer="code")
    yield corpus, idx
    idx.unpersist()


@pytest.mark.parametrize(
    "sim_name", ["dfr_inl2", "ib_ll", "lm_dirichlet", "lm_jelinek_mercer"]
)
def test_term_scores_match_formula(spark, tiny_index, sim_name):
    from lucene_solr_intervals_spark.search.executor import Searcher

    corpus, idx = tiny_index
    s = Searcher(idx, corpus=corpus, mode="sql", similarity=sim_name)
    got = {r["doc_id"]: r["score"] for r in s.scored(Q.Term("apple")).collect()}
    want = _expected(sim_name, "apple")
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], rel=1e-9), (sim_name, d)


def test_boolean_sums_clause_scores(spark, tiny_index):
    from lucene_solr_intervals_spark.search.executor import Searcher

    corpus, idx = tiny_index
    s = Searcher(idx, corpus=corpus, mode="sql", similarity="lm_dirichlet")
    q = Q.Boolean(should=(Q.Term("apple"), Q.Term("banana")))
    got = {r["doc_id"]: r["score"] for r in s.scored(q).collect()}
    ea, eb = _expected("lm_dirichlet", "apple"), _expected("lm_dirichlet", "banana")
    want = {}
    for d in set(ea) | set(eb):
        want[d] = ea.get(d, 0.0) + eb.get(d, 0.0)
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], rel=1e-9)


def test_dirichlet_clips_negative_scores(spark, tiny_index):
    # a doc whose tf/dl ratio is BELOW the collection probability pushes the
    # Dirichlet log-ratio negative (large mu: score ~ (tf/p - dl)/mu); the
    # reference clips at 0 (LMDirichletSimilarity.java:69).  'apple' has
    # p = 7/21 = 1/3 and doc 3 carries tf=1 over dl=6: 1 < 6/3 -> negative.
    from lucene_solr_intervals_spark.scoring.similarities import LMDirichlet
    from lucene_solr_intervals_spark.search.executor import Searcher

    corpus, idx = tiny_index
    s = Searcher(idx, corpus=corpus, mode="sql", similarity=LMDirichlet(mu=1e5))
    got = {r["doc_id"]: r["score"] for r in s.scored(Q.Term("apple")).collect()}
    assert all(v >= 0.0 for v in got.values())
    assert got[3] == 0.0  # the clip actually fired
    assert got[2] > 0.0


def test_positional_rejected_under_similarity_base(spark, tiny_index):
    from lucene_solr_intervals_spark.search.executor import Searcher

    corpus, idx = tiny_index
    s = Searcher(idx, corpus=corpus, mode="sql", similarity="dfr_inl2")
    with pytest.raises(ValueError, match="positional"):
        s.scored(Q.Phrase(("apple", "banana")))


def test_multi_term_rewrite_uses_similarity(spark, tiny_index):
    from lucene_solr_intervals_spark.search.executor import Searcher

    corpus, idx = tiny_index
    s = Searcher(idx, corpus=corpus, mode="sql", similarity="ib_ll")
    q = Q.Prefix("app", rewrite="scoring_boolean")
    got = {r["doc_id"]: r["score"] for r in s.scored(q).collect()}
    want = _expected("ib_ll", "apple")
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], rel=1e-9)


def test_unknown_similarity_name():
    from lucene_solr_intervals_spark.scoring.similarities import make_similarity

    with pytest.raises(ValueError, match="unknown similarity"):
        make_similarity("bm42")


def test_fielded_similarity_uses_per_field_stats(spark):
    """A term scored on a NON-default field must use that field's own
    df/ttf/avgdl/sum_ttf (BasicStats bound per field)."""
    from lucene_solr_intervals_spark.index.builder import build_index
    from lucene_solr_intervals_spark.search.executor import Searcher

    rows = [
        (0, "apple banana", "red red green"),
        (1, "apple", "green blue"),
        (2, "cherry", "red"),
    ]
    corpus = spark.createDataFrame(rows, ["doc_id", "text", "tags"])
    idx = build_index(
        corpus, analyzer="code", fields={"text": "text", "tags": "tags"}
    )
    s = Searcher(idx, corpus=corpus, mode="sql", similarity="lm_dirichlet")
    got = {
        r["doc_id"]: r["score"]
        for r in s.scored(Q.Term("red", field="tags")).collect()
    }
    # tags-field stats: sum_ttf=6, avgdl=2; red: ttf=3
    p = (3 + 1.0) / (6 + 1.0)
    for d, tf, dl in [(0, 2, 3), (2, 1, 1)]:
        want = max(
            math.log(1 + tf / (2000.0 * p)) + math.log(2000.0 / (dl + 2000.0)), 0.0
        )
        assert got[d] == pytest.approx(want, rel=1e-9)
    assert 1 not in got
    idx.unpersist()


def test_similarity_plan_is_jvm_side(spark, tiny_index):
    """The SimilarityBase score is ONE column expression: the only Python
    eval node in the physical plan is the index-BUILD tokenizer (_tok,
    upstream lineage of the in-memory index); the scoring itself adds no
    Python/Pandas eval — the 100-TB hot path stays in whole-stage codegen."""
    import re

    from lucene_solr_intervals_spark.search.executor import Searcher

    corpus, idx = tiny_index
    s = Searcher(idx, corpus=corpus, mode="sql", similarity="dfr_inl2")
    plan = s.scored(Q.Term("apple"))._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python, ever
    assert "FlatMapGroupsInPandas" not in plan  # no grouped-pandas kernel
    for m in re.finditer(r"ArrowEvalPython \[([a-zA-Z0-9_]+)\(", plan):
        assert m.group(1) == "_tok", f"unexpected Python eval: {m.group(1)}"


def test_sweet_spot_plateau_and_degenerate():
    """SweetSpotSimilarity.computeLengthNorm (:137-156): flat 1.0 inside
    [min,max], 1/sqrt decay outside; defaults degrade to DefaultSimilarity
    (1/sqrt(dl), sqrt(tf))."""
    import math

    from pyspark.sql import functions as F

    from lucene_solr_intervals_spark.scoring.similarities import SweetSpot

    # pure-python twin of the reference formula
    def ln_ref(x, l, h, s=0.5):
        return 1.0 / math.sqrt(s * (abs(x - l) + abs(x - h) - (h - l)) + 1.0)

    assert ln_ref(30, 20, 60) == 1.0          # inside the sweet spot
    assert ln_ref(20, 20, 60) == 1.0          # boundary
    assert ln_ref(10, 20, 60) < 1.0           # below
    assert ln_ref(100, 20, 60) < ln_ref(70, 20, 60)  # decays with distance
    # defaults degrade to 1/sqrt(x)
    assert abs(ln_ref(9, 1, 1) - 1 / 3.0) < 1e-9


def test_sweet_spot_ranks_sweet_docs_first(spark):
    """A doc whose length sits in the sweet spot must outrank a same-tf doc
    outside it; under classic 1/sqrt norms the SHORTER doc would win."""
    from lucene_solr_intervals_spark.index.builder import build_index
    from lucene_solr_intervals_spark.scoring.similarities import SweetSpot
    from lucene_solr_intervals_spark.search import queries as Q
    from lucene_solr_intervals_spark.search.executor import Searcher

    filler = " ".join(f"w{i}" for i in range(28))       # 29-token doc (sweet)
    corpus = spark.createDataFrame(
        [
            (0, "hit " + filler),          # dl=29, inside [20, 60]
            (1, "hit tiny"),               # dl=2, outside (classic favorite)
        ],
        ["doc_id", "text"],
    )
    idx = build_index(corpus, analyzer="code")
    s = Searcher(
        idx, corpus=corpus, mode="sql", similarity=SweetSpot(ln_min=20, ln_max=60)
    )
    rows = s.scored(Q.Term("hit")).orderBy("doc_id").collect()
    scores = {r["doc_id"]: r["score"] for r in rows}
    assert scores[0] > scores[1]
    idx.unpersist()
