"""Surround query parser: the W/N positional query language.

Reference grammar: lucene/queryparser/src/java/org/apache/lucene/
queryparser/surround/parser/QueryParser.jj (productions OrQuery:279 ->
AndQuery:298 -> NotQuery:318 -> NQuery:338 -> WQuery:356 ->
PrimaryQuery:378), i.e. precedence loosest-to-tightest OR, AND, NOT, N, W.

Semantics mapped from the reference:

  a W b       ordered within distance (QueryParser.jj:364-371,
              "true /* ordered */"); distance prefix 2-99, default 1
              (getOpDistance, QueryParser.jj:127-132)
  a N b       unordered within distance (QueryParser.jj:345-351)
  slop        DistanceQuery.java:100 builds
              SpanNearQuery(clauses, opDistance - 1, ordered) ->
              OrderedNear/UnorderedNear(slop = distance - 1)
  a NOT b     and-not (NotQuery production -> SrndBooleanQuery)
  AND/OR      boolean must / should
  nW(a,b,c)   prefix operator form (PrefixOperatorQuery, QueryParser.jj:392)
  ab*  a?b    truncated terms (SrndPrefixQuery.java / SrndTruncQuery.java)
              -> Prefix / Wildcard, expanded against the term dictionary
              inside distance queries by Searcher._expand_tree
  q^2.5       boost (OptionalWeights)
  f:...       field restriction (FieldsQuery) — rebinds every leaf

Distance operators nest left-associatively, one binary node per operator
token, each with its own distance (the grammar resets the operand list on
every token — QueryParser.jj:345-373).

Note the javadoc comment in QueryParser.jj:67-69 has W and N swapped; the
production code (ordered flags at :351 and :370) is authoritative and is
what this module follows: W = ordered, N = unordered.
"""

from __future__ import annotations

import dataclasses
import re

from . import queries as Q

_TOKEN_RE = re.compile(r"\s*(\(|\)|,|\^\d+(?:\.\d+)?|[^\s(),^]+)")

_W_RE = re.compile(r"^(\d{1,2})?[wW]$")
_N_RE = re.compile(r"^(\d{1,2})?[nN]$")


def _tokenize(s: str) -> list[str]:
    out, pos = [], 0
    while pos < len(s):
        m = _TOKEN_RE.match(s, pos)
        if not m:
            break
        out.append(m.group(1))
        pos = m.end()
    return out


def _op_distance(tok: str) -> int:
    """W, 2W, 3W ... -> 1, 2, 3 (getOpDistance, QueryParser.jj:127-132)."""
    m = _W_RE.match(tok) or _N_RE.match(tok)
    return int(m.group(1)) if m.group(1) else 1


class SurroundParser:
    def __init__(self, field: str | None = None, analyzer=None):
        self.field = field
        self.analyzer = analyzer or (lambda t: t.lower())

    def parse(self, s: str) -> Q.Query:
        self.toks = _tokenize(s)
        self.i = 0
        q = self._or_query()
        if self._peek() is not None:
            raise ValueError(f"trailing input at token {self.i}: {self._peek()!r}")
        if q is None:
            raise ValueError(f"empty surround query: {s!r}")
        return q

    # ------------------------------------------------------------ stream

    def _peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def _next(self) -> str | None:
        t = self._peek()
        self.i += 1
        return t

    @staticmethod
    def _is_or(t):
        return t is not None and t.upper() == "OR"

    @staticmethod
    def _is_and(t):
        return t is not None and t.upper() == "AND"

    @staticmethod
    def _is_not(t):
        return t is not None and t.upper() == "NOT"

    @staticmethod
    def _is_w(t):
        return t is not None and _W_RE.match(t) is not None

    @staticmethod
    def _is_n(t):
        return t is not None and _N_RE.match(t) is not None

    def _is_prefix_op(self, t: str | None) -> bool:
        """An operator token immediately followed by '(' is the prefix form."""
        if t is None:
            return False
        nxt = self.toks[self.i + 1] if self.i + 1 < len(self.toks) else None
        return nxt == "(" and (
            self._is_or(t) or self._is_and(t) or self._is_w(t) or self._is_n(t)
        )

    # -------------------------------------------------------- productions

    def _or_query(self) -> Q.Query:
        q = self._and_query()
        clauses = None
        while self._is_or(self._peek()):
            self._next()
            if clauses is None:
                clauses = [q]
            clauses.append(self._and_query())
        return q if clauses is None else Q.Boolean(should=tuple(clauses))

    def _and_query(self) -> Q.Query:
        q = self._not_query()
        clauses = None
        while self._is_and(self._peek()):
            self._next()
            if clauses is None:
                clauses = [q]
            clauses.append(self._not_query())
        return q if clauses is None else Q.Boolean(must=tuple(clauses))

    def _not_query(self) -> Q.Query:
        q = self._n_query()
        excluded = None
        while self._is_not(self._peek()):
            self._next()
            if excluded is None:
                excluded = []
            excluded.append(self._n_query())
        if excluded is None:
            return q
        return Q.Boolean(must=(q,), must_not=tuple(excluded))

    def _n_query(self) -> Q.Query:
        q = self._w_query()
        # left-associative: each N token wraps the accumulated query
        while self._is_n(self._peek()):
            d = _op_distance(self._next())
            rhs = self._w_query()
            q = Q.UnorderedNear(d - 1, (q, rhs))
        return q

    def _w_query(self) -> Q.Query:
        q = self._primary()
        while self._is_w(self._peek()):
            d = _op_distance(self._next())
            rhs = self._primary()
            q = Q.OrderedNear(d - 1, (q, rhs))
        return q

    def _primary(self) -> Q.Query:
        t = self._peek()
        if t == "(":
            self._next()
            q = self._or_query()
            if self._next() != ")":
                raise ValueError("unbalanced parens in surround query")
            return self._weights(q)
        if self._is_prefix_op(t):
            return self._weights(self._prefix_operator())
        tok = self._next()
        if tok is None or tok in (")", ","):
            raise ValueError(f"unexpected token: {tok!r}")
        return self._weights(self._simple_term(tok))

    def _prefix_operator(self) -> Q.Query:
        op = self._next()
        qs = self._query_list()
        if self._is_or(op):
            return Q.Boolean(should=tuple(qs))
        if self._is_and(op):
            return Q.Boolean(must=tuple(qs))
        d = _op_distance(op)
        if self._is_w(op):
            return Q.OrderedNear(d - 1, tuple(qs))
        return Q.UnorderedNear(d - 1, tuple(qs))

    def _query_list(self) -> list[Q.Query]:
        """FieldsQueryList (QueryParser.jj:416): '(' q (',' q)+ ')'."""
        if self._next() != "(":
            raise ValueError("expected '(' after prefix operator")
        qs = [self._or_query()]
        while self._peek() == ",":
            self._next()
            qs.append(self._or_query())
        if self._next() != ")":
            raise ValueError("unbalanced parens in prefix operator")
        if len(qs) < 2:
            raise ValueError("prefix operator needs at least two operands")
        return qs

    def _simple_term(self, tok: str) -> Q.Query:
        # optional field prefix (OptionalFields, QueryParser.jj:262)
        field = self.field
        m = re.match(r"^([A-Za-z_][A-Za-z0-9_.]*):(.+)$", tok)
        if m:
            field, tok = m.group(1), m.group(2)
        if tok.startswith('"') and tok.endswith('"') and len(tok) >= 2:
            # quoted = literal single term (SrndQuery getTermQuery quoted)
            return Q.Term(self.analyzer(tok[1:-1]), field=field)
        if tok.endswith("*") and "*" not in tok[:-1] and "?" not in tok:
            # SrndPrefixQuery.java
            return Q.Prefix(self.analyzer(tok[:-1]), field=field)
        if "*" in tok or "?" in tok:
            # SrndTruncQuery.java
            return Q.Wildcard(self.analyzer(tok), field=field)
        return Q.Term(self.analyzer(tok), field=field)

    def _weights(self, q: Q.Query) -> Q.Query:
        """OptionalWeights (^number suffixes; multiplicative)."""
        boost = 1.0
        seen = False
        while (t := self._peek()) is not None and t.startswith("^"):
            boost *= float(self._next()[1:])
            seen = True
        if not seen:
            return q
        return dataclasses.replace(q, boost=q.boost * boost)


def parse_surround(
    s: str, field: str | None = None, analyzer=None
) -> Q.Query:
    return SurroundParser(field=field, analyzer=analyzer).parse(s)
