"""SimpleQueryParser: the degrade-gracefully end-user query dialect.

Transcription of lucene/queryparser/src/java/org/apache/lucene/queryparser/
simple/SimpleQueryParser.java (:96) onto the fork's Query dataclasses.  The
defining property (class javadoc :44-45): "Any errors in query syntax will
be ignored and the parser will attempt to decipher what it can" — no
exception ever escapes parse().

Operators (each individually maskable via `flags`, :103-121):
    +   AND            |  OR           -   NOT (doubling negates, :188-194)
    "  phrase ("..."~N = NEAR slop)    *   trailing = prefix
    ~N  fuzzy on a term                ( ) precedence
    whitespace delimits; \\ escapes    unmatched ( ) " are IGNORED

Tree building reproduces buildQueryTree (:414-455): right-to-left simple
precedence — each operator CHANGE wraps the current tree in a new parent
and the run of same-operator clauses share that parent; a negated branch
becomes (MatchAll SHOULD, branch MUST_NOT) exactly like :419-424.
"""

from __future__ import annotations

from . import queries as Q

# operator flags (SimpleQueryParser.java:103-121)
AND_OPERATOR = 1 << 0
NOT_OPERATOR = 1 << 1
OR_OPERATOR = 1 << 2
PREFIX_OPERATOR = 1 << 3
PHRASE_OPERATOR = 1 << 4
PRECEDENCE_OPERATORS = 1 << 5
ESCAPE_OPERATOR = 1 << 6
WHITESPACE_OPERATOR = 1 << 7
FUZZY_OPERATOR = 1 << 8
NEAR_OPERATOR = 1 << 9
ALL_OPERATORS = -1

_MAX_EDITS = 2  # LevenshteinAutomata.MAXIMUM_SUPPORTED_DISTANCE


class _Node:
    """Mutable BooleanQuery under construction (one operator run)."""

    __slots__ = ("op", "clauses")

    def __init__(self, op: str, clauses: list):
        self.op = op
        self.clauses = clauses


def _freeze(node):
    if isinstance(node, _Node):
        cl = tuple(_freeze(c) for c in node.clauses)
        if node.op == "MUST":
            return Q.Boolean(must=cl)
        return Q.Boolean(should=cl)
    return node


class _State:
    __slots__ = ("data", "length", "index", "top", "prev_op", "cur_op", "not_")

    def __init__(self, data: str, start: int, end: int):
        self.data = data
        self.length = end
        self.index = start
        self.top = None
        self.prev_op: str | None = None
        self.cur_op: str | None = None
        self.not_ = 0


class SimpleQueryParser:
    """One default field, or a `weights` map {field: boost} — the reference
    constructor's Map<String, Float> form (:129-137): every produced leaf
    becomes a SHOULD disjunction of per-field copies, each carrying its
    field's weight (newDefaultQuery :513-524 and siblings)."""

    def __init__(
        self,
        analyzer=None,
        default_operator: str = "SHOULD",
        flags: int = ALL_OPERATORS,
        field: str | None = None,
        weights: dict[str, float] | None = None,
    ):
        # analyzer: text -> list[str] terms (the createBooleanQuery chain)
        if analyzer is None:
            from ..analysis.tokenizer import code_tokenize

            analyzer = lambda t: code_tokenize(t)[0]  # noqa: E731
        self.analyzer = analyzer
        self.default_operator = default_operator
        self.flags = flags
        self.field = field
        self.weights = weights

    def _fields(self):
        if self.weights:
            return sorted(self.weights.items())
        return [(self.field, 1.0)]

    def _per_field(self, make):
        """simplify(BooleanQuery of per-field SHOULD copies) (:513-524)."""
        parts = [q for f, w in self._fields() if (q := make(f, w)) is not None]
        if not parts:
            return None
        return parts[0] if len(parts) == 1 else Q.Boolean(should=tuple(parts))

    # ---------------------------------------------------------- factories

    def _default_query(self, text: str):
        terms = self.analyzer(text)
        if not terms:
            return None

        def make(f, w):
            if len(terms) == 1:
                return Q.Term(terms[0], field=f, boost=w)
            cl = tuple(Q.Term(t, field=f) for t in terms)
            if self.default_operator == "MUST":
                return Q.Boolean(must=cl, boost=w)
            return Q.Boolean(should=cl, boost=w)

        return self._per_field(make)

    def _phrase_query(self, text: str, slop: int):
        terms = self.analyzer(text)
        if not terms:
            return None

        def make(f, w):
            if len(terms) == 1:
                return Q.Term(terms[0], field=f, boost=w)
            return Q.Phrase(tuple(terms), slop=slop, field=f, boost=w)

        return self._per_field(make)

    def _prefix_query(self, text: str):
        terms = self.analyzer(text)
        if not terms:
            return None
        return self._per_field(
            lambda f, w: Q.Prefix(terms[-1], field=f, boost=w)
        )

    def _fuzzy_query(self, text: str, max_edits: int):
        terms = self.analyzer(text)
        if not terms:
            return None
        return self._per_field(
            lambda f, w: Q.Fuzzy(terms[-1], max_edits=max_edits, field=f, boost=w)
        )

    # -------------------------------------------------------------- parse

    def parse(self, s: str) -> Q.Query | None:
        """Never raises; returns None when no token survives (the reference
        returns null for all-garbage input — TestSimpleQueryParser
        testGarbageEmpty)."""
        state = _State(s, 0, len(s))
        self._parse_sub(state)
        return _freeze(state.top)

    def _parse_sub(self, state: _State) -> None:
        flags = self.flags
        data = state.data
        while state.index < state.length:
            c = data[state.index]
            if c == "(" and flags & PRECEDENCE_OPERATORS:
                self._consume_subquery(state)
            elif c == ")" and flags & PRECEDENCE_OPERATORS:
                state.index += 1  # extraneous, ignored (:158-160)
            elif c == '"' and flags & PHRASE_OPERATOR:
                self._consume_phrase(state)
            elif c == "+" and flags & AND_OPERATOR:
                # ignored unless a clause exists and no op already set (:164-172)
                if state.cur_op is None and state.top is not None:
                    state.cur_op = "MUST"
                state.index += 1
            elif c == "|" and flags & OR_OPERATOR:
                if state.cur_op is None and state.top is not None:
                    state.cur_op = "SHOULD"
                state.index += 1
            elif c == "-" and flags & NOT_OPERATOR:
                state.not_ += 1  # two nots negate each other (:188-191)
                state.index += 1
                continue  # keep not_ across the loop bottom
            elif c in " \t\n\r" and flags & WHITESPACE_OPERATOR:
                state.index += 1
            else:
                self._consume_token(state)
            state.not_ = 0

    def _consume_subquery(self, state: _State) -> None:
        data = state.data
        start = state.index = state.index + 1
        precedence = 1
        escaped = False
        while state.index < state.length:
            if not escaped:
                c = data[state.index]
                if c == "\\" and self.flags & ESCAPE_OPERATOR:
                    escaped = True
                    state.index += 1
                    continue
                if c == "(":
                    precedence += 1
                elif c == ")":
                    precedence -= 1
                    if precedence == 0:
                        break
            escaped = False
            state.index += 1
        if state.index == state.length:
            # no closing paren: opening one is extraneous (:253-256)
            state.index = start
        elif state.index == start:
            state.cur_op = None  # "()": op it would bind to resets (:257-262)
            state.index += 1
        else:
            sub = _State(data, start, state.index)
            self._parse_sub(sub)
            self._build(state, _freeze(sub.top))
            state.index += 1

    def _consume_phrase(self, state: _State) -> None:
        data = state.data
        start = state.index = state.index + 1
        buf: list[str] = []
        escaped = False
        has_slop = False
        while state.index < state.length:
            if not escaped:
                c = data[state.index]
                if c == "\\" and self.flags & ESCAPE_OPERATOR:
                    escaped = True
                    state.index += 1
                    continue
                if c == '"':
                    # "..."~N = NEAR (:294-303)
                    if (
                        state.index + 1 < state.length
                        and data[state.index + 1] == "~"
                        and self.flags & NEAR_OPERATOR
                    ):
                        state.index += 1
                        if state.index + 1 < state.length:
                            has_slop = True
                        break
                    break
            escaped = False
            buf.append(data[state.index])
            state.index += 1
        if state.index == state.length:
            state.index = start  # unmatched quote ignored (:316-319)
        elif state.index == start:
            state.cur_op = None
            state.index += 1
        else:
            phrase = "".join(buf)
            slop = self._parse_fuzziness(state) if has_slop else 0
            self._build(state, self._phrase_query(phrase, slop))
            state.index += 1

    def _consume_token(self, state: _State) -> None:
        data = state.data
        buf: list[str] = []
        escaped = False
        prefix = False
        fuzzy = False
        while state.index < state.length:
            if not escaped:
                c = data[state.index]
                if c == "\\" and self.flags & ESCAPE_OPERATOR:
                    escaped = True
                    prefix = False
                    state.index += 1
                    continue
                if self._token_finished(state):
                    break
                if buf and c == "~" and self.flags & FUZZY_OPERATOR:
                    fuzzy = True
                    break
                prefix = bool(buf) and c == "*" and bool(self.flags & PREFIX_OPERATOR)
            escaped = False
            buf.append(data[state.index])
            state.index += 1
        if not buf:
            return
        if fuzzy:
            token = "".join(buf)
            edits = min(self._parse_fuzziness(state), _MAX_EDITS)
            branch = (
                self._default_query(token)
                if edits == 0
                else self._fuzzy_query(token, edits)
            )
        elif prefix:
            branch = self._prefix_query("".join(buf[:-1]))
        else:
            branch = self._default_query("".join(buf))
        self._build(state, branch)

    def _token_finished(self, state: _State) -> bool:
        c = state.data[state.index]
        flags = self.flags
        return (
            (c == '"' and flags & PHRASE_OPERATOR)
            or (c == "|" and flags & OR_OPERATOR)
            or (c == "+" and flags & AND_OPERATOR)
            or (c in "()" and flags & PRECEDENCE_OPERATORS)
            or (c in " \t\n\r" and flags & WHITESPACE_OPERATOR)
        ) != 0

    def _parse_fuzziness(self, state: _State) -> int:
        """Digits after '~'; unparsable or negative -> 0 (:458-489)."""
        data = state.data
        if state.index >= state.length or data[state.index] != "~":
            return 0
        digits: list[str] = []
        while state.index < state.length:
            state.index += 1
            if state.index < state.length:
                if self._token_finished(state):
                    break
                digits.append(data[state.index])
        try:
            n = int("".join(digits))
        except ValueError:
            return 0
        return max(n, 0)

    def _build(self, state: _State, branch) -> None:
        """buildQueryTree (:414-455)."""
        if branch is None:
            return
        if state.not_ % 2 == 1:
            branch = Q.Boolean(should=(Q.MatchAll(),), must_not=(branch,))
        if state.top is None:
            state.top = branch
        else:
            if state.cur_op is None:
                state.cur_op = self.default_operator
            if state.prev_op != state.cur_op:
                state.top = _Node(state.cur_op, [state.top])
            state.top.clauses.append(branch)
            state.prev_op = state.cur_op
        state.cur_op = None
