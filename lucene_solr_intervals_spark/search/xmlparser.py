"""XML query parser: CoreParser analog.

Reference: lucene/queryparser/src/java/org/apache/lucene/queryparser/xml/
CoreParser.java:67-117 registers element builders; this module maps the
same element vocabulary onto the engine's Query dataclasses:

  TermQuery / TermsQuery / MatchAllDocsQuery / BooleanQuery+Clause /
  DisjunctionMaxQuery / ConstantScoreQuery / RangeQuery /
  NumericRangeQuery / UserQuery (delegates to the classic parser) /
  SpanTerm / SpanOr / SpanOrTerms / SpanNear / SpanFirst / SpanNot

Span elements map to the interval algebra that superseded spans in this
fork: SpanNear(inOrder) -> OrderedNear/UnorderedNear, SpanFirst(end) ->
IntervalFiltered(RangeFilter(0, end-1)) (SpanFirstBuilder.java:38),
SpanNot -> NonOverlapping (SpanNotBuilder.java:38).

Attribute conventions follow the reference builders: fieldName, boost,
slop (SpanNearBuilder.java:36 'slopFactor'), inOrder, lowerTerm/upperTerm/
includeLower/includeUpper (RangeQuery), tieBreaker (DisjunctionMax).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from . import queries as Q


def parse_xml(source: str, default_field: str | None = None, analyzer=None) -> Q.Query:
    """Parse an XML query document (string) into a Query tree."""
    an = analyzer or (lambda t: t.lower())
    root = ET.fromstring(source)
    return _XmlParser(default_field, an).build(root)


class _XmlParser:
    def __init__(self, default_field: str | None, analyzer):
        self.default_field = default_field
        self.analyzer = analyzer

    # ------------------------------------------------------------ helpers

    def _field(self, el) -> str | None:
        return el.get("fieldName", self.default_field)

    @staticmethod
    def _boost(el) -> float:
        return float(el.get("boost", "1.0"))

    def _text(self, el) -> str:
        return (el.text or "").strip()

    def _children(self, el):
        return [c for c in el if isinstance(c.tag, str)]

    # ------------------------------------------------------------- builder

    def build(self, el) -> Q.Query:
        name = el.tag
        fn = getattr(self, f"_build_{name}", None)
        if fn is None:
            raise ValueError(f"unknown query element <{name}>")
        return fn(el)

    def _build_TermQuery(self, el) -> Q.Query:
        return Q.Term(
            self.analyzer(self._text(el)), boost=self._boost(el), field=self._field(el)
        )

    def _build_TermsQuery(self, el) -> Q.Query:
        """TermsQueryBuilder.java: analyze the text, OR the produced terms."""
        terms = [self.analyzer(t) for t in self._text(el).split()]
        f = self._field(el)
        if not terms:
            raise ValueError("TermsQuery with no terms")
        if len(terms) == 1:
            return Q.Term(terms[0], boost=self._boost(el), field=f)
        return Q.Boolean(
            should=tuple(Q.Term(t, field=f) for t in terms), boost=self._boost(el)
        )

    def _build_MatchAllDocsQuery(self, el) -> Q.Query:
        return Q.MatchAll(boost=self._boost(el))

    def _build_BooleanQuery(self, el) -> Q.Query:
        must, should, must_not = [], [], []
        for clause in self._children(el):
            if clause.tag != "Clause":
                raise ValueError(f"BooleanQuery child must be <Clause>, got <{clause.tag}>")
            occurs = clause.get("occurs", "should")
            inner = self._children(clause)
            if len(inner) != 1:
                raise ValueError("Clause must wrap exactly one query element")
            q = self.build(inner[0])
            if occurs == "must":
                must.append(q)
            elif occurs == "mustNot":
                must_not.append(q)
            elif occurs == "should":
                should.append(q)
            else:
                raise ValueError(f"unknown occurs value {occurs!r}")
        msm = int(el.get("minimumNumberShouldMatch", "0"))
        return Q.Boolean(
            must=tuple(must),
            should=tuple(should),
            must_not=tuple(must_not),
            min_should_match=msm,
            boost=self._boost(el),
        )

    def _build_DisjunctionMaxQuery(self, el) -> Q.Query:
        subs = tuple(self.build(c) for c in self._children(el))
        return Q.DisjunctionMax(
            subs, tie_breaker=float(el.get("tieBreaker", "0.0")), boost=self._boost(el)
        )

    def _build_ConstantScoreQuery(self, el) -> Q.Query:
        inner = self._children(el)
        if len(inner) != 1:
            raise ValueError("ConstantScoreQuery wraps exactly one element")
        return Q.ConstantScore(self.build(inner[0]), boost=self._boost(el))

    def _build_RangeQuery(self, el) -> Q.Query:
        lo = el.get("lowerTerm")
        hi = el.get("upperTerm")
        return Q.TermRange(
            self.analyzer(lo) if lo is not None else None,
            self.analyzer(hi) if hi is not None else None,
            include_lower=el.get("includeLower", "true") == "true",
            include_upper=el.get("includeUpper", "true") == "true",
            field=self._field(el),
        )

    def _build_NumericRangeQuery(self, el) -> Q.Query:
        cast = float if el.get("type", "long") in ("float", "double") else int
        lo = el.get("lowerTerm")
        hi = el.get("upperTerm")
        return Q.NumericRange(
            self._field(el),
            cast(lo) if lo is not None else None,
            cast(hi) if hi is not None else None,
            include_lower=el.get("includeLower", "true") == "true",
            include_upper=el.get("includeUpper", "true") == "true",
        )

    def _build_UserQuery(self, el) -> Q.Query:
        from .parser import QueryParser

        return QueryParser(analyzer=self.analyzer).parse(self._text(el))

    # ------------------------------------------------------ span elements

    def _build_SpanTerm(self, el) -> Q.Query:
        return Q.Term(
            self.analyzer(self._text(el)), boost=self._boost(el), field=self._field(el)
        )

    def _build_SpanOr(self, el) -> Q.Query:
        subs = tuple(self.build(c) for c in self._children(el))
        return Q.Boolean(should=subs, boost=self._boost(el))

    def _build_SpanOrTerms(self, el) -> Q.Query:
        f = self._field(el)
        terms = [self.analyzer(t) for t in self._text(el).split()]
        return Q.Boolean(
            should=tuple(Q.Term(t, field=f) for t in terms), boost=self._boost(el)
        )

    def _build_SpanNear(self, el) -> Q.Query:
        subs = tuple(self.build(c) for c in self._children(el))
        slop = int(el.get("slopFactor", "0"))
        ordered = el.get("inOrder", "true") == "true"
        cls = Q.OrderedNear if ordered else Q.UnorderedNear
        return cls(slop, subs, boost=self._boost(el))

    def _build_SpanFirst(self, el) -> Q.Query:
        inner = self._children(el)
        if len(inner) != 1:
            raise ValueError("SpanFirst wraps exactly one span element")
        end = int(el.get("end", "1"))
        return Q.IntervalFiltered(
            self.build(inner[0]), Q.RangeFilter(0, end - 1), boost=self._boost(el)
        )

    def _build_SpanNot(self, el) -> Q.Query:
        include = el.find("Include")
        exclude = el.find("Exclude")
        if include is None or exclude is None:
            raise ValueError("SpanNot needs <Include> and <Exclude>")
        minuend = self.build(self._children(include)[0])
        subtrahend = self.build(self._children(exclude)[0])
        return Q.NonOverlapping(minuend, subtrahend, boost=self._boost(el))
