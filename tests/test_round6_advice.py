"""Regression tests for the round-5 ADVICE findings (fixed round 6).

1. merge over a mixed-schema index (pre-n_tok segments + NRT appends)
   must not crash on null n_tok and must keep sum_ttf exact.
2. decontaminate works with a non-default id column name.
3. ASCIIFolding: vulgar fractions pass through (no phantom digit
   tokens); superscript digits still fold (they ARE in the reference
   switch, ASCIIFoldingFilter.java:1560,1579,1598).
4. StandardQueryParser: explicit `term~N` beats the FuzzyConfig
   default min-sim; bare `term~` takes it.
5. suggest_stored dedupes identically with and without the aux index.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


# ---------------------------------------------------------------- 1. n_tok
def test_sidecar_row_nan_n_tok():
    from lucene_solr_intervals_spark.index.segment import _docs_sidecar_row
    from lucene_solr_intervals_spark.codecs.varbyte import vb_decode

    tok = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "doclen": [5, 7, 3],
            # row 1 came from a pre-upgrade parquet file -> null n_tok
            "n_tok": [6.0, None, 4.0],
            "norm_byte": [120, 121, 122],
            "sha256": ["a" * 64, "b" * 64, "c" * 64],
        }
    )
    row = _docs_sidecar_row(0, tok)
    n_tok = vb_decode(row["block_max_tf"])
    # null falls back to that row's doclen, not a crash / not zero
    assert n_tok.tolist() == [6, 7, 4]


def test_merge_mixed_n_tok_schema(spark, tmp_path):
    import pyspark.sql.functions as F
    from lucene_solr_intervals_spark.index.segment import (
        build_segments,
        load_docs,
        merge_segments,
        read_manifest,
    )

    idx = str(tmp_path / "idx")
    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma doc{i}") for i in range(40)], "doc_id long, text string"
    )
    build_segments(docs, idx, n_segments=2, id_col="doc_id")
    # simulate a pre-n_tok index: rewrite the docs parquet of segment 0
    # without the n_tok column (older writer), keep segment 1 intact
    import glob, os, shutil

    seg0 = glob.glob(os.path.join(idx, "docs", "seg=0"))[0]
    old = spark.read.parquet(seg0).drop("n_tok")
    tmp_out = str(tmp_path / "seg0_rw")
    old.coalesce(1).write.mode("overwrite").parquet(tmp_out)
    shutil.rmtree(seg0)
    shutil.copytree(tmp_out, seg0)

    ttf_before = read_manifest(idx)["sum_ttf"]
    merge_segments(spark, idx, seg_ids=[0, 1], new_seg=2)
    man = read_manifest(idx)
    # sum_ttf survives the merge exactly (nulls coalesced to doclen,
    # which is exact for this non-overlap analyzer)
    assert man["sum_ttf"] == ttf_before
    # merged (live) segment's docs table has no nulls — superseded seg
    # files remain on disk for point-in-time readers and stay null there
    live = load_docs(spark, idx).where(F.col("seg") == 2)
    assert live.count() == 40
    assert live.where(F.col("n_tok").isNull()).count() == 0


# ---------------------------------------------------------- 2. decontaminate
def test_decontaminate_custom_id_col(spark):
    from lucene_solr_intervals_spark.ops.dedup import decontaminate

    train = spark.createDataFrame(
        [
            (100, "one two three four five six seven eight"),
            (101, "totally different words in this training row here"),
        ],
        "row_id long, body string",
    )
    ev = spark.createDataFrame(
        [(7, "one two three four five six seven eight")], "eid long, etext string"
    )
    out = decontaminate(
        train,
        ev,
        id_col="row_id",
        text_col="body",
        n=8,
        eval_id_col="eid",
        eval_text_col="etext",
    )
    rows = out.collect()
    assert [int(r["row_id"]) for r in rows] == [101]
    assert set(out.columns) == {"row_id", "body"}


# ---------------------------------------------------------------- 3. folding
def test_fold_fractions_pass_through():
    from lucene_solr_intervals_spark.analysis.folding import fold_ascii, fold_table

    # vulgar fractions have NO case in the reference switch -> unchanged
    assert fold_ascii("a¼b ½ ¾") == "a¼b ½ ¾"
    # superscripts DO fold (reference :1560,1579,1598)
    assert fold_ascii("x¹²³") == "x123"
    # spacing marks (no reference case) pass through
    assert fold_ascii("a¨b´c") == "a¨b´c"
    # letters still fold
    assert fold_ascii("café Straße") == "cafe Strasse"
    # every table output is alphanumeric (no '14'-style phantom digit
    # tokens) or an ASCII punctuation fold the reference switch performs
    # (guillemets -> '"', ASCIIFoldingFilter.java foldToASCII parity)
    assert all(v.isalnum() or v == '"' for v in fold_table().values())


# ----------------------------------------------------------------- 4. parser
def test_standard_parser_explicit_fuzzy_wins():
    from lucene_solr_intervals_spark.search.parser import StandardQueryParser
    from lucene_solr_intervals_spark.search import queries as Q

    p = StandardQueryParser()
    p.set_fuzzy_min_sim(0.0)  # config: fuzzy disabled -> 0 edits
    bare = p.parse("merge~")
    assert isinstance(bare, Q.Fuzzy) and bare.max_edits == 0
    explicit = p.parse("merge~2")
    assert isinstance(explicit, Q.Fuzzy) and explicit.max_edits == 2
    # fractional explicit similarity resolving to 2 edits also wins
    explicit_f = p.parse("abcdefghijklmnop~0.3")
    assert isinstance(explicit_f, Q.Fuzzy) and explicit_f.max_edits == 2


# ---------------------------------------------------------------- 5. suggest
def test_suggest_stored_modes_agree_on_duplicates(spark):
    from lucene_solr_intervals_spark.search.suggest import (
        build_stored_infix_index,
        suggest_stored,
    )

    df = spark.createDataFrame(
        [("Merge Policy", 5.0), ("Merge Policy", 9.0), ("Segment Merge", 3.0)],
        "title string, views double",
    )
    aux = build_stored_infix_index(df, "title", "views")
    a = [
        (r["suggestion"], r["weight"])
        for r in suggest_stored(df, "title", "views", "merge", k=10, aux=aux).collect()
    ]
    b = [
        (r["suggestion"], r["weight"])
        for r in suggest_stored(df, "title", "views", "merge", k=10).collect()
    ]
    assert a == b
    assert ("Merge Policy", 9.0) in a and len(a) == 2
