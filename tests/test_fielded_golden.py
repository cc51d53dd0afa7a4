"""Golden transcription of TestFieldedIntervals.java
(lucene/core/src/test/org/apache/lucene/search/intervals/TestFieldedIntervals.java):
cross-field Boolean queries collect every present leaf term's positions
tagged with the field, ordered (doc, field asc, begin asc, end desc).

Corpus (addDocs, whitespace+lowercase analysis — punctuation kept):
  doc0 field1: "Pease porridge hot! Pease porridge cold!"
       field2: "Some like it hot!  Some like it cold"
  doc1 field1: "Pease porridge warm! Pease porridge tepid!"
       field2: "Some like it warm!  Some like it tepid"
       field3: "An extra field warm!"
"""

from __future__ import annotations

import pytest

from lucene_solr_intervals_spark.intervals.kernel import fielded_collect
from lucene_solr_intervals_spark.search import queries as Q


def _ws(field: str, text: str) -> dict[tuple[str, str], list[int]]:
    out: dict[tuple[str, str], list[int]] = {}
    for i, tok in enumerate(text.lower().split()):
        out.setdefault((field, tok), []).append(i)
    return out


def _doc(**fields: str) -> dict[tuple[str, str], list[int]]:
    out: dict[tuple[str, str], list[int]] = {}
    for f, text in fields.items():
        out.update(_ws(f, text))
    return out


DOCS = [
    _doc(
        field1="Pease porridge hot! Pease porridge cold!",
        field2="Some like it hot!  Some like it cold",
    ),
    _doc(
        field1="Pease porridge warm! Pease porridge tepid!",
        field2="Some like it warm!  Some like it tepid",
        field3="An extra field warm!",
    ),
]


def _check(q, expected: list[list]):
    """expected rows: [docid, field, b, e, field, b, e, ...] (the Java
    Object[][] layout)."""
    got = {}
    for di, pos in enumerate(DOCS):
        m = fielded_collect(q, pos, "field1")
        if m is not None:
            got[di] = m
    exp = {}
    for row in expected:
        di = row[0]
        exp[di] = [
            (row[j], row[j + 1], row[j + 2]) for j in range(1, len(row), 3)
        ]
    assert got == exp


def T(field, term):
    return Q.Term(term, field=field)


def test_nested_boolean_on_one_field():
    # field1:and(pease, or(porridge, cold!))  (TestFieldedIntervals.java:55)
    bq = Q.Boolean(should=(T("field1", "porridge"), T("field1", "cold!")))
    pbq = Q.Boolean(must=(T("field1", "pease"), bq))
    _check(
        pbq,
        [
            [0, "field1", 0, 0, "field1", 1, 1, "field1", 3, 3, "field1", 4, 4, "field1", 5, 5],
            [1, "field1", 0, 0, "field1", 1, 1, "field1", 3, 3, "field1", 4, 4],
        ],
    )


def test_simple_boolean_on_two_fields():
    bq = Q.Boolean(must=(T("field1", "warm!"), T("field2", "warm!")))
    _check(bq, [[1, "field1", 2, 2, "field2", 3, 3]])


def test_simple_boolean_on_disjoint_fields():
    bq = Q.Boolean(should=(T("field1", "hot!"), T("field2", "warm!")))
    _check(bq, [[0, "field1", 2, 2], [1, "field2", 3, 3]])


def test_equivalent_positions_on_separate_fields_disjunction():
    bq = Q.Boolean(should=(T("field1", "pease"), T("field2", "some")))
    _check(
        bq,
        [
            [0, "field1", 0, 0, "field1", 3, 3, "field2", 0, 0, "field2", 4, 4],
            [1, "field1", 0, 0, "field1", 3, 3, "field2", 0, 0, "field2", 4, 4],
        ],
    )


def test_equivalent_positions_on_separate_fields_conjunction():
    bq = Q.Boolean(must=(T("field1", "pease"), T("field2", "some")))
    _check(
        bq,
        [
            [0, "field1", 0, 0, "field1", 3, 3, "field2", 0, 0, "field2", 4, 4],
            [1, "field1", 0, 0, "field1", 3, 3, "field2", 0, 0, "field2", 4, 4],
        ],
    )


def test_equivalent_positions_conjunction_of_disjunction():
    bq = Q.Boolean(should=(T("field1", "pease"), T("field2", "some")))
    superq = Q.Boolean(must=(bq, T("field2", "like")))
    _check(
        superq,
        [
            [0, "field1", 0, 0, "field1", 3, 3, "field2", 0, 0, "field2", 1, 1,
             "field2", 4, 4, "field2", 5, 5],
            [1, "field1", 0, 0, "field1", 3, 3, "field2", 0, 0, "field2", 1, 1,
             "field2", 4, 4, "field2", 5, 5],
        ],
    )


def test_third_field():
    bq = Q.Boolean(should=(T("field1", "pease"), T("field2", "some")))
    superbq = Q.Boolean(must=(bq, T("field3", "an")))
    _check(
        superbq,
        [
            [1, "field1", 0, 0, "field1", 3, 3, "field2", 0, 0, "field2", 4, 4,
             "field3", 0, 0],
        ],
    )


def test_non_boolean_tree_rejected():
    with pytest.raises(ValueError):
        fielded_collect(Q.Phrase(("a", "b")), {}, "field1")
