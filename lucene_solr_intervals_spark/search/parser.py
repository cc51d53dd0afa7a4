"""Classic query-parser subset: string -> Query tree.

Covers the grammar subset the reference query set uses
(queryparser/classic/QueryParser.java:79, QueryParserBase.parse:109):

  term                  bare word (analyzed)
  "a b c"               phrase;  "a b"~2  sloppy phrase
  field:term            fielded term / phrase / range / wildcard / fuzzy
                        (Term.java:38 — None = the index's default field)
  AND / OR / NOT / + / -   boolean structure
  wild* / wi?d          wildcard;  pre*  prefix
  fuzzy~  fuzzy~1       fuzzy (default 2 edits)
  [a TO b] / {a TO b}   term range (inclusive/exclusive)
  term^2.5              boost
  ( ... )               grouping

Default operator is OR (QueryParser.java OR_OPERATOR default).
"""

from __future__ import annotations

import re

from . import queries as Q

_FIELD = r"(?:[A-Za-z_][A-Za-z0-9_.]*:)?"

_TOKEN_RE = re.compile(
    r"""
    \s*(
      \(|\)|
      """ + _FIELD + r"""\[[^\]]*\]|""" + _FIELD + r"""\{[^}]*\}|
      """ + _FIELD + r""""(?:[^"\\]|\\.)*"(?:~\d+)?|
      AND\b|OR\b|NOT\b|
      \+|-|
      [^\s()\[\]{}]+
    )""",
    re.VERBOSE,
)

_FIELD_PREFIX_RE = re.compile(r"^([A-Za-z_][A-Za-z0-9_.]*):(.+)$", re.DOTALL)


def _split_field(t: str) -> tuple[str | None, str]:
    m = _FIELD_PREFIX_RE.match(t)
    return (m.group(1), m.group(2)) if m else (None, t)


def tokenize_query(s: str) -> list[str]:
    out, pos = [], 0
    while pos < len(s):
        m = _TOKEN_RE.match(s, pos)
        if not m:
            break
        out.append(m.group(1))
        pos = m.end()
    return out


class QueryParser:
    """Recursive-descent parser over the token stream."""

    def __init__(self, default_operator: str = "OR", analyzer=None):
        assert default_operator in ("OR", "AND")
        self.default_operator = default_operator
        self.analyzer = analyzer or (lambda t: t.lower())

    def parse(self, s: str) -> Q.Query:
        self.toks = tokenize_query(s)
        self.i = 0
        q = self._parse_bool()
        if q is None:
            raise ValueError(f"empty query: {s!r}")
        return q

    def _peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def _next(self):
        t = self._peek()
        self.i += 1
        return t

    def _parse_bool(self) -> Q.Query | None:
        must: list[Q.Query] = []
        should: list[Q.Query] = []
        must_not: list[Q.Query] = []
        pending_op = None
        prev_slot = None  # which list got the previous clause

    # clause loop
        while True:
            t = self._peek()
            if t is None or t == ")":
                break
            if t in ("AND", "OR"):
                pending_op = self._next()
                continue
            occur = None
            if t in ("+", "-", "NOT"):
                occur = "+" if t == "+" else "-"
                self._next()
                t = self._peek()
                if t is None:
                    break
            clause = self._parse_clause()
            if clause is None:
                continue
            if occur == "-":
                must_not.append(clause)
                prev_slot = None
            elif occur == "+":
                must.append(clause)
                prev_slot = must
            elif pending_op == "AND":
                # AND binds the previous clause too (a AND b -> both MUST)
                if prev_slot is should and should:
                    must.append(should.pop())
                must.append(clause)
                prev_slot = must
            elif pending_op == "OR":
                should.append(clause)
                prev_slot = should
            else:
                if self.default_operator == "AND":
                    must.append(clause)
                    prev_slot = must
                else:
                    should.append(clause)
                    prev_slot = should
            pending_op = None

        if not must and not must_not and len(should) == 1:
            return should[0]
        if not should and not must_not and len(must) == 1:
            return must[0]
        if not must and not should and not must_not:
            return None
        return Q.Boolean(must=tuple(must), should=tuple(should), must_not=tuple(must_not))

    def _parse_clause(self) -> Q.Query | None:
        t = self._next()
        if t == "(":
            inner = self._parse_bool()
            assert self._next() == ")", "unbalanced parens"
            return self._with_boost(inner)
        if (
            t.endswith(":")
            and re.fullmatch(r"[A-Za-z_][A-Za-z0-9_.]*:", t)
            and self._peek() == "("
        ):
            # field:(a b ...) — grouped fielded clause (QueryParser.java
            # Clause production: the field distributes over the group)
            fname = t[:-1]
            self._next()
            inner = self._parse_bool()
            assert self._next() == ")", "unbalanced parens"
            return self._distribute_field(inner, fname)
        field = None
        if not (t.startswith('"') or t.startswith("[") or t.startswith("{")):
            maybe_field, rest = _split_field(t)
            if maybe_field and (
                rest.startswith('"') or rest.startswith("[") or rest.startswith("{")
            ):
                field, t = maybe_field, rest
        if t.startswith('"'):
            m = re.match(r'"((?:[^"\\]|\\.)*)"(?:~(\d+))?$', t)
            phrase, slop = m.group(1), int(m.group(2) or 0)
            terms = tuple(self.analyzer(w) for w in phrase.split())
            if len(terms) == 1:
                return Q.Term(terms[0], field=field)
            return Q.Phrase(terms, slop=slop, field=field)
        if t.startswith("[") or t.startswith("{"):
            inc_lo = t.startswith("[")
            inc_hi = t.endswith("]")
            body = t[1:-1].strip()
            m = re.match(r"(\S+)\s+TO\s+(\S+)", body)
            lo = None if m.group(1) == "*" else self.analyzer(m.group(1))
            hi = None if m.group(2) == "*" else self.analyzer(m.group(2))
            return Q.TermRange(
                lo, hi, include_lower=inc_lo, include_upper=inc_hi, field=field
            )
        return self._with_boost(self._parse_term(t))

    def _parse_term(self, t: str) -> Q.Query:
        boost = 1.0
        m = re.match(r"(.*)\^(\d+(?:\.\d+)?)$", t)
        if m:
            t, boost = m.group(1), float(m.group(2))
        field, t = _split_field(t)
        fm = re.match(r"(.*?)~(\d+(?:\.\d+)?)?$", t)
        if fm and fm.group(1):
            body = self.analyzer(fm.group(1))
            sim = fm.group(2)
            if not sim:
                max_e = 2
            else:
                # FuzzyQuery.floatToEdits: >= 1 -> min((int) sim, 2);
                # 0.0 -> 0; else min((1 - sim) * termLen, 2)
                v = float(sim)
                if v >= 1:
                    max_e = min(int(v), 2)
                elif v == 0.0:
                    max_e = 0
                else:
                    max_e = min(2, int((1.0 - v) * len(body)))
            return Q.Fuzzy(
                body, max_edits=max_e, boost=boost, field=field,
                edits_explicit=bool(sim),
            )
        if t.endswith("*") and "*" not in t[:-1] and "?" not in t:
            return Q.Prefix(self.analyzer(t[:-1]), boost=boost, field=field)
        if "*" in t or "?" in t:
            return Q.Wildcard(self.analyzer(t), boost=boost, field=field)
        return Q.Term(self.analyzer(t), boost=boost, field=field)

    @classmethod
    def _distribute_field(cls, q: Q.Query | None, fname: str) -> Q.Query | None:
        """Apply a group's field to every default-field leaf inside it."""
        from dataclasses import replace

        if q is None:
            return None
        if isinstance(q, Q.Boolean):
            return Q.Boolean(
                must=tuple(cls._distribute_field(x, fname) for x in q.must),
                should=tuple(cls._distribute_field(x, fname) for x in q.should),
                must_not=tuple(
                    cls._distribute_field(x, fname) for x in q.must_not
                ),
                min_should_match=q.min_should_match,
                boost=q.boost,
            )
        if getattr(q, "field", "absent") is None:
            return replace(q, field=fname)
        return q

    @staticmethod
    def _with_boost(q: Q.Query | None) -> Q.Query | None:
        return q


def parse(s: str, default_operator: str = "OR") -> Q.Query:
    return QueryParser(default_operator).parse(s)


# --------------------------------------------------- analyzing query parser

# gobble escaped chars or find a run of wildcard characters
# (AnalyzingQueryParser.java:43 wildcardPattern)
_WILDCARD_CHUNK = re.compile(r"(\\.)|([?*]+)")


class AnalyzingQueryParser(QueryParser):
    """analyzing/AnalyzingQueryParser.java:41: the classic parser, but
    Fuzzy-, Prefix-, Range- and Wildcard operands are passed through the
    FIELD ANALYZER too (so `Mötl?*` matches a folded index as `motl?*`),
    while wildcard characters `*`/`?` survive analysis verbatim.

    Behavior pinned to the reference:
    * wildcard terms are split on wildcard runs; each non-wildcard chunk is
      analyzed separately and must yield EXACTLY one token
      (analyzeSingleChunk, :162-203 — zero tokens or multiple tokens raise);
    * escaped characters (backslash + char) are gobbled — they stay inside
      their chunk and never act as wildcard boundaries (:77-80);
    * a leading `*`/`?` raises unless allow_leading_wildcard (:68-71);
    * prefix bodies, fuzzy bodies and range bounds are analyzed as single
      chunks (getPrefixQuery/getFuzzyQuery/setAnalyzeRangeTerms(true)).

    `analyzer` names a registered analyzer chain (ANALYZERS registry) —
    typically a folded/stemmed chain; the reference's warning applies: use
    with analyzers that neither drop (stopwords) nor add tokens.
    """

    def __init__(
        self,
        analyzer: str = "code",
        default_operator: str = "OR",
        allow_leading_wildcard: bool = False,
    ):
        from ..analysis.tokenizer import ANALYZERS

        self._chain = ANALYZERS[analyzer]
        self.allow_leading_wildcard = allow_leading_wildcard
        super().__init__(default_operator, analyzer=self._analyze_operand)

    def _analyze_single_chunk(self, chunk: str) -> str:
        terms = self._chain(chunk)[0]
        if not terms:
            raise ValueError(f'Analyzer returned nothing for "{chunk}"')
        if len(terms) > 1:
            listed = ",".join(f'"{t}"' for t in terms)
            raise ValueError(
                f'Analyzer created multiple terms for "{chunk}": {listed}'
            )
        return terms[0]

    def _analyze_operand(self, t: str) -> str:
        if "*" not in t and "?" not in t:
            return self._analyze_single_chunk(t)
        if not self.allow_leading_wildcard and t[0] in "*?":
            raise ValueError(
                "'*' or '?' not allowed as first character in WildcardQuery"
            )
        out, last = [], 0
        for m in _WILDCARD_CHUNK.finditer(t):
            if m.group(1) is not None:
                continue  # escaped char: stays inside the chunk
            if m.start() > 0:  # same guard as the reference (:82)
                out.append(self._analyze_single_chunk(t[last : m.start()]))
            out.append(m.group(2))
            last = m.end()
        if last < len(t):
            out.append(self._analyze_single_chunk(t[last:]))
        return "".join(out)


# ------------------------------------- flexible StandardQueryParser facade


class StandardQueryParser:
    """flexible/standard/StandardQueryParser.java:113 — the flexible
    framework's classic-syntax parser.  Its parsing behavior matches the
    classic QueryParser (same grammar, same flat-clause quirks); what the
    flexible framework adds is a mutable CONFIG surface
    (StandardQueryConfigHandler.ConfigurationKeys), which this facade
    reproduces over the engine's parsers:

      set_default_operator(op)        DEFAULT_OPERATOR
      set_allow_leading_wildcard(b)   ALLOW_LEADING_WILDCARD (default False,
                                      enforced like the reference)
      set_fuzzy_min_sim(f)            FUZZY_CONFIG minSimilarity — applied
                                      to BARE `term~` fuzzies via
                                      FuzzyQuery.floatToEdits
      set_phrase_slop(n)              PHRASE_SLOP — default slop for
                                      phrases without an explicit ~n
      set_multi_fields(fields)        MULTI_FIELDS — unfielded clauses
                                      expand across fields (parse() then
                                      needs no default field)
      set_fields_boost(map)           FIELD_BOOST_MAP
      set_analyzer(name)              run operands through a registered
                                      analyzer chain (AnalyzingQueryParser
                                      semantics for wildcard/fuzzy/range)
    """

    def __init__(self, analyzer: str | None = None):
        self._default_operator = "OR"
        self._allow_leading_wildcard = False
        self._fuzzy_min_sim: float | None = None
        self._phrase_slop = 0
        self._multi_fields: tuple[str, ...] | None = None
        self._fields_boost: dict[str, float] = {}
        self._analyzer_name = analyzer

    # -- config handler surface (get/set pairs like the reference) --------
    def set_default_operator(self, op: str) -> None:
        assert op in ("AND", "OR")
        self._default_operator = op

    def get_default_operator(self) -> str:
        return self._default_operator

    def set_allow_leading_wildcard(self, allow: bool) -> None:
        self._allow_leading_wildcard = allow

    def set_fuzzy_min_sim(self, min_sim: float) -> None:
        self._fuzzy_min_sim = min_sim

    def set_phrase_slop(self, slop: int) -> None:
        self._phrase_slop = slop

    def set_multi_fields(self, fields: tuple[str, ...]) -> None:
        self._multi_fields = tuple(fields)

    def set_fields_boost(self, boosts: dict[str, float]) -> None:
        self._fields_boost = dict(boosts)

    def set_analyzer(self, name: str) -> None:
        self._analyzer_name = name

    # ---------------------------------------------------------------------
    def parse(self, s: str, default_field: str | None = None) -> Q.Query:
        import dataclasses

        if self._analyzer_name is not None:
            base = AnalyzingQueryParser(
                self._analyzer_name,
                default_operator=self._default_operator,
                allow_leading_wildcard=self._allow_leading_wildcard,
            )
            q = base.parse(s)
        elif self._multi_fields is not None:
            q = parse_multi_field(
                s,
                self._multi_fields,
                boosts=self._fields_boost or None,
                default_operator=self._default_operator,
            )
        else:
            q = QueryParser(self._default_operator).parse(s)

        def walk(node: Q.Query) -> Q.Query:
            if isinstance(node, Q.Boolean):
                return dataclasses.replace(
                    node,
                    must=tuple(walk(c) for c in node.must),
                    should=tuple(walk(c) for c in node.should),
                    must_not=tuple(walk(c) for c in node.must_not),
                )
            if isinstance(node, Q.Wildcard) and not self._allow_leading_wildcard:
                if node.pattern[:1] in ("*", "?"):
                    raise ValueError(
                        "'*' or '?' not allowed as first character in "
                        "WildcardQuery"
                    )
            if isinstance(node, Q.Phrase) and node.slop == 0 and self._phrase_slop:
                node = dataclasses.replace(node, slop=self._phrase_slop)
            if isinstance(node, Q.Fuzzy) and self._fuzzy_min_sim is not None:
                if not node.edits_explicit:  # bare `term~` used the default
                    v = self._fuzzy_min_sim
                    edits = (
                        0
                        if v == 0.0
                        else min(2, int((1.0 - v) * len(node.term)))
                    )
                    node = dataclasses.replace(node, max_edits=edits)
            if (
                default_field is not None
                and getattr(node, "field", "__nofield__") is None
                and self._multi_fields is None
            ):
                node = dataclasses.replace(node, field=default_field)
            return node

        return walk(q)


# ------------------------------------------- precedence (flexible) parser


class PrecedenceQueryParser(QueryParser):
    """flexible/precedence/PrecedenceQueryParser.java:61 (the flexible
    framework's precedence dialect): classic syntax, but with REAL boolean
    precedence — NOT binds tightest, then AND, then OR — instead of the
    classic parser's flat clause-list quirks.  Pinned to the reference's
    TestPrecedenceQueryParser expectations (:217-253):

        a AND b OR c AND d      ->  (+a +b) (+c +d)
        ((a OR b) AND NOT c) OR d -> (+(a b) -c) d
        c OR (a AND b)          ->  c (+a +b)

    `&&` / `||` are accepted as AND / OR (:223,227).  The default operator
    applies at its own precedence level (implicit adjacency groups like an
    explicit default operator would)."""

    def parse(self, s: str) -> Q.Query:
        self.toks = tokenize_query(s)
        self.i = 0
        sign, q = self._parse_or()
        if q is None:
            raise ValueError(f"empty query: {s!r}")
        if sign == "-":
            return Q.Boolean(must_not=(q,))
        return q

    # parens inside _parse_clause recurse through the precedence grammar
    def _parse_bool(self):
        sign, q = self._parse_or()
        if sign == "-" and q is not None:
            return Q.Boolean(must_not=(q,))
        return q

    def _op(self, t):
        return {"&&": "AND", "||": "OR"}.get(t, t)

    def _parse_or(self):
        units = [self._parse_and()]
        while True:
            t = self._op(self._peek())
            if t == "OR":
                self._next()
                units.append(self._parse_and())
            elif (
                self.default_operator == "OR"
                and t is not None
                and t not in (")", "AND", "OR")
            ):
                units.append(self._parse_and())
            else:
                break
        return self._merge(units, "should")

    def _parse_and(self):
        units = [self._parse_unary()]
        while True:
            t = self._op(self._peek())
            if t == "AND":
                self._next()
                units.append(self._parse_unary())
            elif (
                self.default_operator == "AND"
                and t is not None
                and t not in (")", "AND", "OR")
            ):
                units.append(self._parse_unary())
            else:
                break
        return self._merge(units, "must")

    def _parse_unary(self):
        t = self._op(self._peek())
        sign = None
        if t in ("+", "-", "NOT"):
            self._next()
            sign = "+" if t == "+" else "-"
            t = self._op(self._peek())
        if t is None or t == ")":
            return (sign, None)
        clause = self._parse_clause()
        return (sign, clause)

    @staticmethod
    def _merge(units, plain_slot: str):
        units = [(s, q) for s, q in units if q is not None]
        if not units:
            return (None, None)
        if len(units) == 1:
            return units[0]
        must, should, must_not = [], [], []
        for s, q in units:
            if s == "-":
                must_not.append(q)
            elif s == "+" or plain_slot == "must":
                must.append(q)
            else:
                should.append(q)
        return (
            None,
            Q.Boolean(
                must=tuple(must), should=tuple(should), must_not=tuple(must_not)
            ),
        )


# ------------------------------------------- multi-field query parser


def parse_multi_field(
    s: str,
    fields: tuple[str, ...],
    boosts: dict[str, float] | None = None,
    default_operator: str = "OR",
    analyzer=None,
) -> Q.Query:
    """MultiFieldQueryParser (queryparser/classic/MultiFieldQueryParser.java:35):
    every clause WITHOUT an explicit field expands to a SHOULD disjunction of
    per-field copies (getFieldQuery :135-160), optionally boosted per field;
    clauses the user fielded explicitly stay as written."""
    import dataclasses

    q = QueryParser(default_operator, analyzer=analyzer).parse(s)
    boosts = boosts or {}

    def expand(node: Q.Query) -> Q.Query:
        if isinstance(node, Q.Boolean):
            return Q.Boolean(
                must=tuple(expand(c) for c in node.must),
                should=tuple(expand(c) for c in node.should),
                must_not=tuple(expand(c) for c in node.must_not),
                min_should_match=node.min_should_match,
                boost=node.boost,
            )
        if isinstance(node, Q.DisjunctionMax):
            return dataclasses.replace(
                node, subs=tuple(expand(c) for c in node.subs)
            )
        if getattr(node, "field", "__nofield__") is None:
            copies = tuple(
                dataclasses.replace(
                    node,
                    field=f,
                    boost=getattr(node, "boost", 1.0) * boosts.get(f, 1.0),
                )
                for f in fields
            )
            return copies[0] if len(copies) == 1 else Q.Boolean(should=copies)
        return node

    return expand(q)


# ------------------------------------------------- complex phrase parser

_CP_TOKEN_RE = re.compile(r"\(|\)|[^\s()]+")


def parse_complex_phrase(
    s: str, slop: int | None = None, field: str | None = None, analyzer=None
) -> Q.ComplexPhrase:
    """ComplexPhraseQueryParser subset (ComplexPhraseQueryParser.java:60):
    the CONTENT of a quoted phrase whose words may carry wildcards / fuzzy
    suffixes, with parenthesized alternation groups:

        parse_complex_phrase('(john jonathon) smyth*')
        parse_complex_phrase('"vec* window"~2')        # quoted + slop

    Each word becomes a slot sub-query via the classic term grammar
    (wildcard/prefix/fuzzy/term); a parenthesized group becomes one slot
    with several alternatives."""
    an = analyzer or (lambda t: t.lower())
    s = s.strip()
    m = re.match(r'^"((?:[^"\\]|\\.)*)"(?:~(\d+))?$', s)
    if m:
        body = m.group(1)
        if slop is None:
            slop = int(m.group(2) or 0)
    else:
        body = s
    slop = slop or 0
    p = QueryParser(analyzer=an)
    slots: list[tuple[Q.Query, ...]] = []
    group: list[Q.Query] | None = None
    for tok in _CP_TOKEN_RE.findall(body):
        if tok == "(":
            group = []
        elif tok == ")":
            if not group:
                raise ValueError("empty alternation group")
            slots.append(tuple(group))
            group = None
        else:
            sub = p._parse_term(tok)
            if field is not None:
                import dataclasses

                sub = dataclasses.replace(sub, field=field)
            if group is not None:
                group.append(sub)
            else:
                slots.append((sub,))
    if group is not None:
        raise ValueError("unbalanced parens in complex phrase")
    if not slots:
        raise ValueError(f"empty complex phrase: {s!r}")
    return Q.ComplexPhrase(tuple(slots), slop=slop, field=field)
