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
        # _tok / _tok_agg are the index-BUILD tokenizer variants (the r10
        # aggregated build renamed the default one); scoring adds nothing
        assert m.group(1) in ("_tok", "_tok_agg"), (
            f"unexpected Python eval: {m.group(1)}"
        )


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


# ---------------------------------------------------------- full DFR/IB matrix


def _py_tfn(norm, c, f, ttf, dl, avgdl, sum_ttf):
    if norm == "none":
        return float(f)
    if norm == "h1":
        return f * avgdl / dl
    if norm == "h2":
        return f * _log2(1 + c * avgdl / dl)
    if norm == "h3":
        return (f + c * ((ttf + 1.0) / (sum_ttf + 1.0))) / (dl + c) * c
    if norm == "z":
        return f * (avgdl / dl) ** c
    raise AssertionError(norm)


def _py_dfr(bm, ae, norm, c, f, df, ttf, dl, n, avgdl, sum_ttf):
    tfn = _py_tfn(norm, c, f, ttf, dl, avgdl, sum_ttf)
    if bm == "be":
        Fq = ttf + 1.0 + tfn
        N2 = Fq + n

        def fh(a, m):
            return (m + 0.5) * _log2(a / m) + (a - m) * _log2(a)

        basic = -_log2((N2 - 1) * math.e) + fh(N2 + Fq - 1, N2 + Fq - tfn - 2) - fh(Fq, Fq - tfn)
    elif bm == "d":
        Fq = ttf + 1.0 + tfn
        phi = tfn / Fq
        nphi = 1 - phi
        p = 1.0 / (n + 1)
        D = phi * _log2(phi / p) + nphi * _log2(nphi / (1 - p))
        basic = D * Fq + 0.5 * _log2(1 + 2 * math.pi * tfn * nphi)
    elif bm == "g":
        Fg = ttf + 1.0
        lam = Fg / (n + Fg)
        basic = _log2(lam + 1) + tfn * _log2((1 + lam) / lam)
    elif bm == "if":
        basic = tfn * _log2(1 + (n + 1) / (ttf + 0.5))
    elif bm == "in":
        basic = tfn * _log2((n + 1) / (df + 0.5))
    elif bm == "ine":
        ne = n * (1 - ((n - 1) / n) ** ttf)
        basic = tfn * _log2((n + 1) / (ne + 0.5))
    elif bm == "p":
        lam = (ttf + 1.0) / (n + 1.0)
        basic = (
            tfn * _log2(tfn / lam)
            + (lam + 1 / (12 * tfn) - tfn) * _log2(math.e)
            + 0.5 * _log2(2 * math.pi * tfn)
        )
    else:
        raise AssertionError(bm)
    if ae == "l":
        after = 1.0 / (tfn + 1.0)
    elif ae == "b":
        after = ((ttf + 1.0) + 1.0) / ((df + 1.0) * (tfn + 1.0))
    else:
        after = 1.0
    return basic * after


def _py_ib(dist, lam_kind, norm, c, f, df, ttf, dl, n, avgdl, sum_ttf):
    tfn = _py_tfn(norm, c, f, ttf, dl, avgdl, sum_ttf)
    lam = ((df if lam_kind == "df" else ttf) + 1.0) / (n + 1.0)
    if dist == "ll":
        return -math.log(lam / (tfn + lam))
    if lam == 1.0:
        lam = 0.99
    return -math.log((lam ** (tfn / (tfn + 1)) - lam) / (1 - lam))


def test_dfr_ib_full_matrix_formula_exact(spark):
    """Every DFRSimilarity composition (7 basic models x 3 after-effects x
    5 normalizations, DFRSimilarity.java:78-154) and every IBSimilarity
    composition (2 distributions x 2 lambdas, IBSimilarity.java:60) as one
    Spark select vs an independent pure-Python oracle of the reference
    formulas, float64 bit-level (rel 1e-12)."""
    from pyspark.sql import functions as F

    from lucene_solr_intervals_spark.scoring.similarities import DFR, IB

    n, avgdl, sum_ttf = 50, 7.4, 370
    rows = [  # (tf, df, ttf, dl)
        (1.0, 3.0, 5.0, 4.0),
        (2.0, 10.0, 40.0, 12.0),
        (7.0, 30.0, 200.0, 7.0),
        (1.0, 49.0, 300.0, 30.0),
    ]
    df_stats = spark.createDataFrame(rows, ["tf", "df", "ttf", "dl"])
    combos, cols = [], []
    kw = dict(n_docs=n, avgdl=avgdl, sum_ttf=sum_ttf)
    for bm in ("be", "d", "g", "if", "in", "ine", "p"):
        for ae in ("l", "b", "none"):
            for norm, c in (("none", 1.0), ("h1", 1.0), ("h2", 1.0),
                            ("h3", 800.0), ("z", 0.30)):
                sim = DFR(basic_model=bm, after_effect=ae, normalization=norm, c=c)
                combos.append(("dfr", bm, ae, norm, c))
                cols.append(sim.score_col(
                    F.col("tf"), F.col("df"), F.col("ttf"), F.col("dl"), **kw
                ).alias(f"c{len(cols)}"))
    for dist in ("ll", "spl"):
        for lk in ("df", "ttf"):
            sim = IB(distribution=dist, lam=lk, normalization="h2", c=1.0)
            combos.append(("ib", dist, lk, "h2", 1.0))
            cols.append(sim.score_col(
                F.col("tf"), F.col("df"), F.col("ttf"), F.col("dl"), **kw
            ).alias(f"c{len(cols)}"))
    got = df_stats.select(*cols).collect()
    assert len(combos) == 7 * 3 * 5 + 4
    for ri, (tf, dfv, ttf, dl) in enumerate(rows):
        for ci, combo in enumerate(combos):
            if combo[0] == "dfr":
                _, bm, ae, norm, c = combo
                want = _py_dfr(bm, ae, norm, c, tf, dfv, ttf, dl, n, avgdl, sum_ttf)
            else:
                _, dist, lk, norm, c = combo
                want = _py_ib(dist, lk, norm, c, tf, dfv, ttf, dl, n, avgdl, sum_ttf)
            assert got[ri][f"c{ci}"] == pytest.approx(want, rel=1e-12), (combo, rows[ri])


def test_dfr_matrix_end_to_end_searcher(spark, tiny_index):
    """Representative matrix members through the full Searcher path,
    including the composed-name registry entries."""
    from lucene_solr_intervals_spark.scoring.similarities import DFR
    from lucene_solr_intervals_spark.search.executor import Searcher

    corpus, idx = tiny_index
    toks, n, sum_ttf, avgdl = _corpus_stats()
    tf, df, ttf = _tf_df_ttf("apple")
    for bm, ae, norm, c in [("g", "l", "h2", 1.0), ("be", "b", "h1", 1.0),
                            ("p", "l", "z", 0.30), ("ine", "b", "h3", 800.0)]:
        sim = DFR(basic_model=bm, after_effect=ae, normalization=norm, c=c)
        s = Searcher(idx, corpus=corpus, mode="sql", similarity=sim)
        got = {r["doc_id"]: r["score"] for r in s.scored(Q.Term("apple")).collect()}
        for d, f in tf.items():
            dl = float(len(toks[d]))
            want = _py_dfr(bm, ae, norm, c, f, df, ttf, dl, n, avgdl, sum_ttf)
            assert got[d] == pytest.approx(want, rel=1e-9), (bm, ae, norm, d)


def test_dfr_inl2_legacy_equals_matrix_member(spark, tiny_index):
    """The pre-existing DFRInL2 is the (in, l, h2) matrix member."""
    from lucene_solr_intervals_spark.search.executor import Searcher

    corpus, idx = tiny_index
    a = Searcher(idx, corpus=corpus, mode="sql", similarity="dfr_inl2")
    from lucene_solr_intervals_spark.scoring.similarities import DFR

    b = Searcher(idx, corpus=corpus, mode="sql",
                 similarity=DFR(basic_model="in", after_effect="l",
                                normalization="h2"))
    ga = sorted((r["doc_id"], r["score"]) for r in a.scored(Q.Term("apple")).collect())
    gb = sorted((r["doc_id"], r["score"]) for r in b.scored(Q.Term("apple")).collect())
    assert ga == gb
