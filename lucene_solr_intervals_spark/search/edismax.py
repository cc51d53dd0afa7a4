"""eDisMax-style query parser — the Solr default user-facing dialect.

Reference:
  solr/core/src/java/org/apache/solr/search/ExtendedDismaxQParser.java:64
    parse():140-220 (main user query MUST + phrase-field SHOULD boosts),
    splitIntoClauses():725-860 (the never-throws clause lexer),
    addShingledPhraseQueries (pf/pf2/pf3 word-gram phrase boosts, one
    DisjunctionMax per (wordGram, slop) group)
  solr/core/src/java/org/apache/solr/util/SolrPluginUtils.java:584
    calculateMinShouldMatch (the "3<-25% 10<-3" mm spec grammar)

The defining property (ExtendedDismaxQParserPlugin javadoc): any syntax a
user types produces a query — unbalanced quotes, stray operators, and
unknown fields degrade to plain terms instead of raising.

Subset implemented (documented deviations):
  * clause lexer: +/- prefixes, "quoted phrases" (unbalanced quote ->
    re-lex ignoring quotes, like the reference's splitIntoClauses retry),
    field:value with a `uf` allow-list (disallowed fields re-attach the
    raw text as a term, reference :752-760), special-char escaping.
  * uppercase AND/OR/NOT connectives in the flat form (a AND b -> both
    MUST, NOT x -> MUST_NOT).
  * STRUCTURED FIRST PASS (reference parse():183-187 — parseOriginalQuery
    before parseEscapedQuery): the full string is first handed to the
    classic lucene parser (search/parser.py), so parenthesized groups,
    ranges, wildcards, fuzzy and explicit phrase slop carry their real
    lucene semantics; default-field leaves are aliased onto the qf
    DisjunctionMax exactly like the reference's IMPOSSIBLE_FIELD_NAME
    alias trick.  Any lex/parse/alias failure falls back to the escaped
    dialect (never throws).  A `uf`-rejected field prefix is escaped into
    the rebuilt string BEFORE the classic parse (the reference's
    rebuildUserQuery), so the allow-list holds on both paths.  Deviation:
    a bare TO outside a range falls back to the escaped dialect (the
    real parser raises there; ours would read it as a term).
  * qf with per-field boosts -> per-term DisjunctionMax(tie); pf/pf2/pf3
    word-gram phrase boosts with ps slop; qs slop for explicit phrases;
    mm applied to the optional clauses of the main query.
  * bq/bf/boost functions are composed by the caller (`extra_should`) —
    the engine's FunctionQuery surface already covers them.
"""

from __future__ import annotations

import re

from . import queries as Q

_FIELD_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_.]*")
_SPECIAL = set('!():^[]{}~*?"+-\\|&/')
_WS_LT = re.compile(r"\s*<\s*")
_SP = re.compile(r"\s+")


def calculate_min_should_match(optional_clause_count: int, spec: str) -> int:
    """SolrPluginUtils.calculateMinShouldMatch:584 — exact transcription.

    Simple forms: "3" (absolute), "-2" (all but 2), "75%" (floor),
    "-25%" (all but floor(25%)).  Conditional chains "3<-25% 10<-3":
    each `upper<spec` applies when clause count exceeds `upper`; counts
    at or below the first bound require every clause.
    """
    result = optional_clause_count
    spec = spec.strip()
    if "<" in spec:
        spec = _WS_LT.sub("<", spec)
        for s in _SP.split(spec):
            upper_s, _, sub = s.partition("<")
            if optional_clause_count <= int(upper_s):
                return result
            result = calculate_min_should_match(optional_clause_count, sub)
        return result
    if "%" in spec:
        percent = int(spec[: spec.index("%")])
        calc = result * percent / 100.0
        result = result + int(calc) if calc < 0 else int(calc)
    else:
        calc = int(spec)
        result = result + calc if calc < 0 else calc
    return min(optional_clause_count, max(result, 0))


class Clause:
    """One lexed clause (ExtendedDismaxQParser.Clause)."""

    __slots__ = ("must", "field", "val", "is_phrase", "has_special", "raw",
                 "disallowed")

    def __init__(self):
        self.must = ""  # '+', '-' or ''
        self.field = None
        self.val = ""
        self.is_phrase = False
        self.has_special = False
        self.raw = ""
        self.disallowed = None  # field prefix rejected by the uf allow-list

    def is_bare_word(self) -> bool:
        return not self.must and self.field is None and not self.is_phrase


def _get_field_name(s: str, pos: int) -> str | None:
    m = _FIELD_RE.match(s, pos)
    if m and m.end() < len(s) and s[m.end()] == ":" and m.end() + 1 < len(s):
        return m.group(0)
    return None


def split_into_clauses(s: str, ignore_quote: bool = False,
                       uf: tuple[str, ...] | None = None) -> list[Clause]:
    """ExtendedDismaxQParser.splitIntoClauses:725 — whitespace-separated
    clauses with +/-, optional field: prefix (kept only when allowed by
    `uf`), and quote tracking; unbalanced quotes retry with quotes treated
    as ordinary characters (reference :833-837)."""
    out: list[Clause] = []
    pos, end = 0, len(s)
    while pos < end:
        while pos < end and s[pos].isspace():
            pos += 1
        if pos >= end:
            break
        start = pos
        c = Clause()
        ch = s[pos]
        if ch in "+-" and pos + 1 < end:
            c.must = ch
            pos += 1
        fname = _get_field_name(s, pos)
        if fname is not None and (uf is None or fname in uf or "*" in uf):
            c.field = fname
            pos += len(fname) + 1
        elif fname is not None:
            c.disallowed = fname  # reference :752-760 — escaped into a term
        if pos >= end:
            # a bare trailing '+'/'-': the reference appends it as a term
            c.val = s[start:end]
            c.must = ""
            out.append(c)
            break
        in_string = ""
        if not ignore_quote and s[pos] == '"':
            c.is_phrase = True
            in_string = '"'
            pos += 1
        buf = []
        while pos < end:
            ch = s[pos]
            pos += 1
            if ch == "\\":  # skip escaped char, drop the backslash
                if pos < end:
                    buf.append(s[pos])
                    pos += 1
                continue
            if in_string and ch == in_string:
                in_string = ""
                break
            if ch.isspace():
                if not in_string:
                    pos -= 1
                    break
                buf.append(ch)
                continue
            if not in_string and ch in _SPECIAL:
                c.has_special = True
            buf.append(ch)
        c.val = "".join(buf)
        c.raw = s[start:pos]
        if c.is_phrase and in_string:
            # unbalanced quote: re-lex treating '"' as an ordinary char
            return split_into_clauses(s, ignore_quote=True, uf=uf)
        if c.val:
            out.append(c)
    return out


def _default_analyze(text: str) -> list[str]:
    return re.findall(r"[a-z0-9_]+", text.lower())


class EDisMaxParser:
    """qf/tie/mm/pf/ps/qs configuration -> Query trees that never raise.

    qf: {field: boost}; tie: DisjunctionMax tieBreaker; mm: min-should-
    match spec (applied to the optional clauses of the main query);
    pf/pf2/pf3: phrase-boost fields (whole phrase / bigrams / trigrams,
    ExtendedDismaxQParser.addShingledPhraseQueries); ps: phrase-boost
    slop; qs: slop for user-typed quoted phrases; uf: user-field
    allow-list ('*' = all).
    """

    def __init__(
        self,
        qf: dict[str, float],
        tie: float = 0.0,
        mm: str | None = None,
        pf: tuple[str, ...] = (),
        pf2: tuple[str, ...] = (),
        pf3: tuple[str, ...] = (),
        ps: int = 0,
        qs: int = 0,
        uf: tuple[str, ...] = ("*",),
        default_field: str | None = None,
        analyze=None,
    ):
        if not qf:
            raise ValueError("qf must name at least one query field")
        self.qf = dict(qf)
        self.tie = float(tie)
        self.mm = mm
        self.pf, self.pf2, self.pf3 = tuple(pf), tuple(pf2), tuple(pf3)
        self.ps = int(ps)
        self.qs = int(qs)
        self.uf = tuple(uf)
        # None field on a leaf means the INDEX default; when qf names it,
        # emit None so single-field setups need no field column at all
        self.default_field = default_field
        self.analyze = analyze or _default_analyze

    def _leaf_field(self, f: str) -> str | None:
        return None if f == self.default_field else f

    def _field_query(self, field: str, boost: float, toks: list[str],
                     phrase: bool, slop: int) -> Q.Query | None:
        if not toks:
            return None
        if len(toks) == 1 and not phrase:
            return Q.Term(toks[0], boost=boost, field=self._leaf_field(field))
        if phrase:
            return Q.Phrase(tuple(toks), slop=slop, boost=boost,
                            field=self._leaf_field(field))
        # multi-token bare clause (e.g. "wi-fi" after escaping): implicit
        # per-token SHOULD bq (reference getFieldQuery:1227 comment)
        return Q.Boolean(
            should=tuple(
                Q.Term(t, field=self._leaf_field(field)) for t in toks
            ),
            boost=boost,
        )

    def _dismax(self, toks: list[str], phrase: bool, slop: int) -> Q.Query | None:
        subs = []
        for f, b in sorted(self.qf.items()):
            sub = self._field_query(f, b, toks, phrase, slop)
            if sub is not None:
                subs.append(sub)
        if not subs:
            return None
        if len(subs) == 1:
            return subs[0]
        return Q.DisjunctionMax(tuple(subs), tie_breaker=self.tie)

    def parse(self, user_query: str) -> Q.Query:
        clauses = split_into_clauses(user_query or "", uf=self.uf)
        main = None
        try:
            main = self._parse_structured(
                self._rebuild(user_query or "", clauses), clauses
            )
        except Exception:
            main = None  # reference: lucene parse failed -> escaped
        if main is None:
            main = self._parse_escaped(clauses)
        normal_toks = self._normal_toks(clauses)
        boosts = self._phrase_boosts(normal_toks)
        if not boosts:
            return main
        # reference parse():189 — main query MUST, phrase boosts SHOULD,
        # scores add (coord disabled: BooleanQuery(true))
        return Q.Boolean(must=(main,), should=tuple(boosts))

    def _normal_toks(self, clauses) -> list[str]:
        """pf/pf2/pf3 input: non-fielded, non-phrase, non-required clause
        words (addPhraseFieldQueries' normalClauses), shared by both parse
        paths."""
        out: list[str] = []
        for c in clauses:
            if c.is_bare_word() and c.val in ("AND", "OR", "NOT", "TO"):
                continue
            if c.is_phrase or c.must or c.field is not None:
                continue
            out.extend(self.analyze(c.val))
        return out

    @staticmethod
    def _rebuild(s: str, clauses) -> str:
        """rebuildUserQuery role: the structured pass parses the ORIGINAL
        string unless the uf allow-list rejected a field prefix — then the
        string is reassembled from the lexed clauses with the rejected
        colon escaped, so the classic parser reads it as a term (the
        reference escapes disallowed fields before its lucene pass)."""
        if not any(c.disallowed for c in clauses):
            return s
        parts = []
        for c in clauses:
            raw = c.raw
            if c.disallowed:
                raw = raw.replace(f"{c.disallowed}:", f"{c.disallowed}\\:", 1)
            parts.append(raw)
        return " ".join(parts)

    # ------------------------------------------------ structured first pass
    def _parse_structured(self, s: str, clauses) -> Q.Query | None:
        """parseOriginalQuery (ExtendedDismaxQParser.java:140-220 flow):
        run the classic lucene parser over the full string, then alias
        default-field leaves onto the qf DisjunctionMax.  Returns None /
        raises to select the escaped fallback."""
        from .parser import QueryParser, tokenize_query

        # lex completeness: the classic tokenizer silently stops at
        # characters outside its grammar (lone ']' etc.) — a partial lex
        # would DROP query text, so demand full coverage
        toks = tokenize_query(s)
        if "TO" in toks:
            # a stray TO outside a range (ranges lex as ONE token) makes
            # the real lucene parser raise -> escaped; ours would silently
            # read it as a term
            return None
        if "".join("".join(t.split()) for t in toks) != "".join(s.split()):
            return None
        parser = QueryParser(analyzer=str.lower)
        q = parser.parse(s)
        if parser.i != len(parser.toks):
            return None  # trailing unconsumed tokens (stray ')') would be
            # silently dropped — the real parser raises here -> escaped
        q = self._alias(q)
        if isinstance(q, Q.Boolean):
            msm = (
                calculate_min_should_match(len(q.should), self.mm)
                if (self.mm is not None and q.should)
                else 0
            )
            return Q.Boolean(
                must=q.must, should=q.should, must_not=q.must_not,
                min_should_match=msm, boost=q.boost,
            )
        msm = (
            calculate_min_should_match(1, self.mm)
            if self.mm is not None
            else 0
        )
        return Q.Boolean(should=(q,), min_should_match=msm)

    def _alias(self, q: Q.Query) -> Q.Query:
        """Rewrite default-field leaves onto the qf dismax (the reference's
        IMPOSSIBLE_FIELD_NAME alias), re-analyzing term/phrase text with
        the chain analyzer; explicitly-fielded leaves keep their field."""
        from dataclasses import replace

        if isinstance(q, Q.Boolean):
            return Q.Boolean(
                must=tuple(self._alias(x) for x in q.must),
                should=tuple(self._alias(x) for x in q.should),
                must_not=tuple(self._alias(x) for x in q.must_not),
                min_should_match=q.min_should_match,
                boost=q.boost,
            )
        if isinstance(q, Q.DisjunctionMax):
            return replace(q, subs=tuple(self._alias(x) for x in q.subs))
        if isinstance(q, Q.Term):
            toks = self.analyze(q.term)
            if not toks:
                raise ValueError(f"analyzer dropped term {q.term!r}")
            return self._alias_text(q.field, toks, False, 0, q.boost)
        if isinstance(q, Q.Phrase):
            toks = [t for w in q.terms for t in self.analyze(w)]
            if not toks:
                raise ValueError("analyzer dropped phrase")
            slop = q.slop if q.slop else self.qs
            return self._alias_text(q.field, toks, True, slop, q.boost)
        if isinstance(q, (Q.Prefix, Q.Wildcard, Q.Fuzzy, Q.TermRange)):
            if q.field is not None:
                return q
            subs = tuple(
                replace(
                    q,
                    field=self._leaf_field(f),
                    boost=q.boost * b,
                )
                for f, b in sorted(self.qf.items())
            )
            if len(subs) == 1:
                return subs[0]
            return Q.DisjunctionMax(subs, tie_breaker=self.tie)
        return q

    def _alias_text(
        self, field: str | None, toks: list[str], phrase: bool, slop: int,
        boost: float,
    ) -> Q.Query:
        from dataclasses import replace

        if field is not None:
            out = self._field_query(field, 1.0, toks, phrase, slop)
        else:
            out = self._dismax(toks, phrase, slop)
        if out is None:
            raise ValueError("empty aliased clause")
        return out if boost == 1.0 else replace(out, boost=out.boost * boost)

    # --------------------------------------------------- escaped fallback
    def _parse_escaped(self, clauses) -> Q.Query:
        must: list[Q.Query] = []
        should: list[Q.Query] = []
        must_not: list[Q.Query] = []
        mode = None  # pending connective: None | 'AND' | 'NOT'
        i = 0
        n = len(clauses)
        while i < n:
            c = clauses[i]
            i += 1
            if c.is_bare_word() and c.val in ("AND", "OR", "NOT", "TO"):
                if c.val == "AND":
                    # a AND b: promote the clause to the left (if it is
                    # still optional — '+a AND b' / 'a AND b AND c' leave
                    # the left already required) and ALWAYS arm the
                    # pending connective so the right operand is required
                    # too (round-7 ADVICE: the old `and should` guard
                    # left the right operand optional whenever the left
                    # was already MUST, diverging from the reference
                    # ExtendedDismaxQParser under mm).
                    if should:
                        must.append(should.pop())
                    mode = "AND"
                elif c.val == "NOT":
                    mode = "NOT"
                elif c.val == "OR":
                    mode = None
                continue
            toks = self.analyze(c.val)
            if not toks:
                mode = None
                continue
            if c.field is not None:
                q = self._field_query(
                    c.field, 1.0, toks, c.is_phrase,
                    self.qs if c.is_phrase else 0,
                )
            else:
                q = self._dismax(toks, c.is_phrase, self.qs if c.is_phrase else 0)
            if q is None:
                mode = None
                continue
            if c.must == "-" or mode == "NOT":
                must_not.append(q)
            elif c.must == "+" or mode == "AND":
                must.append(q)
            else:
                should.append(q)
            mode = None
        msm = 0
        if self.mm is not None and should:
            msm = calculate_min_should_match(len(should), self.mm)
        return Q.Boolean(
            must=tuple(must), should=tuple(should), must_not=tuple(must_not),
            min_should_match=msm,
        )

    def _phrase_boosts(self, toks: list[str]) -> list[Q.Query]:
        out: list[Q.Query] = []
        for fields, gram in ((self.pf, 0), (self.pf2, 2), (self.pf3, 3)):
            if not fields:
                continue
            grams = (
                [toks] if gram == 0
                else [toks[j : j + gram] for j in range(len(toks) - gram + 1)]
            )
            grams = [g for g in grams if len(g) >= 2]
            if not grams:
                continue
            for g in grams:
                subs = [
                    Q.Phrase(tuple(g), slop=self.ps,
                             field=self._leaf_field(f))
                    for f in fields
                ]
                out.append(
                    subs[0] if len(subs) == 1
                    else Q.DisjunctionMax(tuple(subs), tie_breaker=self.tie)
                )
        return out
