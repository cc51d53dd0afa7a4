"""Lucene RegExp dialect -> Spark term-dictionary conditions.

The reference's RegexpQuery uses Lucene's own automaton syntax
(org.apache.lucene.util.automaton.RegExp, RegExp.java:40-315), which is NOT
Java/Spark regex: whole-term anchored, `~` complement, `&` intersection,
`@` anystring, `#` empty language, `"..."` quoted literals, `<n-m>` numeric
intervals, and reserved characters must be escaped even inside classes.

This module parses the full RegExp grammar (RegExp.java:840-988) into an
AST, then compiles it to a Spark Column predicate over the term column:

* the regular core (union/concat/repeat/class/anychar/interval/quoted)
  translates to an anchored Java regex for `rlike` — JVM-side, pushdown-
  friendly;
* `~` (complement) and `&` (intersection) compile EXACTLY as Boolean
  combinations of rlike conditions when their operands are complete
  alternatives of the expression (`foo&.*bar.*`, `~(ab.*)`, `x|~(y)`) —
  the automaton-level complement/intersection of an embedded subexpression
  (e.g. `a~(bc)d`) has no regex equivalent and raises UnsupportedRegexp.

Numeric intervals follow Automata.makeInterval (Automata.java:207-220):
digits fixed by same-length bounds (zero-padded), otherwise any number of
leading zeros.
"""

from __future__ import annotations

import re as _re
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F


class UnsupportedRegexp(ValueError):
    """Lucene-RegExp feature with no Spark-regex equivalent in this position."""


# ------------------------------------------------------------------- AST


@dataclass(frozen=True)
class Node:
    pass


@dataclass(frozen=True)
class Union(Node):
    subs: tuple[Node, ...]


@dataclass(frozen=True)
class Inter(Node):
    subs: tuple[Node, ...]


@dataclass(frozen=True)
class Concat(Node):
    subs: tuple[Node, ...]


@dataclass(frozen=True)
class Repeat(Node):
    sub: Node
    lo: int
    hi: int | None  # None = unbounded


@dataclass(frozen=True)
class Compl(Node):
    sub: Node


@dataclass(frozen=True)
class CharClass(Node):
    items: tuple[tuple[str, str], ...]  # (lo, hi) ranges; single char lo==hi
    negated: bool


@dataclass(frozen=True)
class Literal(Node):
    text: str


@dataclass(frozen=True)
class AnyChar(Node):
    pass


@dataclass(frozen=True)
class AnyString(Node):
    pass


@dataclass(frozen=True)
class Empty(Node):
    """The empty LANGUAGE (#) — matches nothing."""


@dataclass(frozen=True)
class Interval(Node):
    lo: int
    hi: int
    digits: int


# ---------------------------------------------------------------- parser


class _Parser:
    """Recursive-descent parser for the RegExp grammar (RegExp.java:840-988),
    all optional operators enabled (the RegExp(String) default, flags=ALL)."""

    def __init__(self, s: str):
        self.s = s
        self.pos = 0

    def _more(self) -> bool:
        return self.pos < len(self.s)

    def _peek(self, chars: str) -> bool:
        return self._more() and self.s[self.pos] in chars

    def _match(self, c: str) -> bool:
        if self._peek(c):
            self.pos += 1
            return True
        return False

    def _next(self) -> str:
        if not self._more():
            raise ValueError(f"unexpected end of regexp at {self.pos}")
        c = self.s[self.pos]
        self.pos += 1
        return c

    def parse(self) -> Node:
        e = self.parse_union()
        if self._more():
            raise ValueError(f"end-of-string expected at position {self.pos}")
        return e

    def parse_union(self) -> Node:
        e = self.parse_inter()
        if self._match("|"):
            rest = self.parse_union()
            subs = (e,) + (rest.subs if isinstance(rest, Union) else (rest,))
            return Union(subs)
        return e

    def parse_inter(self) -> Node:
        e = self.parse_concat()
        if self._match("&"):
            rest = self.parse_inter()
            subs = (e,) + (rest.subs if isinstance(rest, Inter) else (rest,))
            return Inter(subs)
        return e

    def parse_concat(self) -> Node:
        subs = [self.parse_repeat()]
        while self._more() and not self._peek(")|&"):
            subs.append(self.parse_repeat())
        return subs[0] if len(subs) == 1 else Concat(tuple(subs))

    def parse_repeat(self) -> Node:
        e = self.parse_compl()
        while self._more():
            if self._match("?"):
                e = Repeat(e, 0, 1)
            elif self._match("*"):
                e = Repeat(e, 0, None)
            elif self._match("+"):
                e = Repeat(e, 1, None)
            elif self._peek("{"):
                start = self.pos
                self.pos += 1
                digits = ""
                while self._more() and self.s[self.pos].isdigit():
                    digits += self._next()
                if not digits:
                    # '{' not followed by a number is a literal (Lucene allows)
                    self.pos = start
                    break
                lo = int(digits)
                hi: int | None = lo
                if self._match(","):
                    digits2 = ""
                    while self._more() and self.s[self.pos].isdigit():
                        digits2 += self._next()
                    hi = int(digits2) if digits2 else None
                if not self._match("}"):
                    raise ValueError(f"expected '}}' at position {self.pos}")
                e = Repeat(e, lo, hi)
            else:
                break
        return e

    def parse_compl(self) -> Node:
        if self._match("~"):
            return Compl(self.parse_compl())
        return self.parse_charclass()

    def parse_charclass(self) -> Node:
        if self._match("["):
            negated = self._match("^")
            items: list[tuple[str, str]] = []
            while self._more() and not self._peek("]"):
                lo = self._parse_char()
                if self._match("-"):
                    hi = self._parse_char()
                    items.append((lo, hi))
                else:
                    items.append((lo, lo))
            if not self._match("]"):
                raise ValueError(f"expected ']' at position {self.pos}")
            return CharClass(tuple(items), negated)
        return self.parse_simple()

    def _parse_char(self) -> str:
        self._match("\\")  # escaped char inside/outside classes
        return self._next()

    def parse_simple(self) -> Node:
        if self._match("."):
            return AnyChar()
        if self._match("#"):
            return Empty()
        if self._match("@"):
            return AnyString()
        if self._match('"'):
            start = self.pos
            while self._more() and not self._peek('"'):
                self.pos += 1
            if not self._match('"'):
                raise ValueError(f"expected '\"' at position {self.pos}")
            return Literal(self.s[start : self.pos - 1])
        if self._match("("):
            if self._match(")"):
                return Literal("")
            e = self.parse_union()
            if not self._match(")"):
                raise ValueError(f"expected ')' at position {self.pos}")
            return e
        if self._match("<"):
            start = self.pos
            while self._more() and not self._peek(">"):
                self.pos += 1
            if not self._match(">"):
                raise ValueError(f"expected '>' at position {self.pos}")
            body = self.s[start : self.pos - 1]
            i = body.find("-")
            if i <= 0 or i == len(body) - 1 or body.rfind("-") != i:
                raise UnsupportedRegexp(
                    f"<identifier> automata are not supported: <{body}>"
                )
            smin, smax = body[:i], body[i + 1 :]
            digits = len(smin) if len(smin) == len(smax) else 0
            lo, hi = int(smin), int(smax)
            if lo > hi:
                lo, hi = hi, lo
            return Interval(lo, hi, digits)
        if self._match("\\"):
            return Literal(self._next())
        return Literal(self._next())


def parse(pattern: str) -> Node:
    return _Parser(pattern).parse()


# ------------------------------------------------- decimal interval regex


def _same_len_range(lo: str, hi: str) -> list[str]:
    """Regex alternatives matching decimal strings lo..hi (equal length)."""
    if lo == hi:
        return [_re.escape(lo)]
    if len(lo) == 1:
        return [f"[{lo}-{hi}]"]
    if lo[0] == hi[0]:
        return [_re.escape(lo[0]) + p for p in _same_len_range(lo[1:], hi[1:])]
    out = [_re.escape(lo[0]) + p for p in _same_len_range(lo[1:], "9" * (len(lo) - 1))]
    d_lo, d_hi = int(lo[0]), int(hi[0])
    if d_hi - d_lo >= 2:
        mid = str(d_lo + 1) if d_hi - d_lo == 2 else f"[{d_lo + 1}-{d_hi - 1}]"
        out.append(mid + "[0-9]" * (len(lo) - 1))
    out += [_re.escape(hi[0]) + p for p in _same_len_range("0" * (len(hi) - 1), hi[1:])]
    return out


def interval_regex(lo: int, hi: int, digits: int) -> str:
    """Java regex for Automata.makeInterval(lo, hi, digits)
    (Automata.java:207-220): digits>0 -> exact width, zero-padded; digits==0
    -> any number of leading zeros."""
    if digits > 0:
        slo, shi = str(lo).zfill(digits), str(hi).zfill(digits)
        if len(shi) > digits:
            raise ValueError(f"interval bound {hi} exceeds {digits} digits")
        return "(?:" + "|".join(_same_len_range(slo, shi)) + ")"
    alts = []
    for width in range(len(str(lo)), len(str(hi)) + 1):
        wlo = max(lo, 10 ** (width - 1) if width > 1 else 0)
        whi = min(hi, 10**width - 1)
        if wlo > whi:
            continue
        alts += _same_len_range(str(wlo).zfill(width), str(whi).zfill(width))
    return "0*(?:" + "|".join(alts) + ")"


# ------------------------------------------------------------- translate

_JAVA_META = set("\\^$.|?*+()[]{}")


def _esc(c: str) -> str:
    return "\\" + c if c in _JAVA_META else c


def to_java_regex(node: Node) -> str:
    """Compile the regular core to an (unanchored) Java regex fragment.
    Raises UnsupportedRegexp on embedded complement/intersection."""
    if isinstance(node, Literal):
        return "".join(_esc(c) for c in node.text)
    if isinstance(node, AnyChar):
        return "."
    if isinstance(node, AnyString):
        return "(?s:.*)"
    if isinstance(node, Empty):
        return "(?!)"  # matches nothing
    if isinstance(node, CharClass):
        body = "".join(
            _cls_esc(lo) if lo == hi else f"{_cls_esc(lo)}-{_cls_esc(hi)}"
            for lo, hi in node.items
        )
        return ("[^" if node.negated else "[") + body + "]"
    if isinstance(node, Interval):
        return interval_regex(node.lo, node.hi, node.digits)
    if isinstance(node, Union):
        return "(?:" + "|".join(to_java_regex(s) for s in node.subs) + ")"
    if isinstance(node, Concat):
        return "".join(_group(s) for s in node.subs)
    if isinstance(node, Repeat):
        inner = _group(node.sub)
        if node.lo == 0 and node.hi is None:
            return inner + "*"
        if node.lo == 1 and node.hi is None:
            return inner + "+"
        if node.lo == 0 and node.hi == 1:
            return inner + "?"
        if node.hi is None:
            return inner + "{%d,}" % node.lo
        if node.lo == node.hi:
            return inner + "{%d}" % node.lo
        return inner + "{%d,%d}" % (node.lo, node.hi)
    if isinstance(node, (Compl, Inter)):
        raise UnsupportedRegexp(
            "embedded ~/& have automaton semantics with no regex equivalent; "
            "use them as complete alternatives (e.g. 'a.*&.*b', '~(abc)')"
        )
    raise ValueError(type(node).__name__)


def _cls_esc(c: str) -> str:
    return "\\" + c if c in "\\^]-[&" else c


def _group(node: Node) -> str:
    r = to_java_regex(node)
    if isinstance(node, (Union, Concat)) or (len(r) > 1 and not (
        r.startswith("(") or r.startswith("[") or r.startswith("\\") and len(r) == 2
    )):
        return "(?:" + r + ")"
    return r


def to_term_condition(pattern: str, col: Column) -> Column:
    """Whole-term match condition for a Lucene RegExp pattern.

    Top-level union / intersection / complement become Boolean combinations
    of anchored `rlike` predicates — EXACT automaton semantics for those
    operators at alternative granularity, all JVM-side."""
    return _cond(parse(pattern), col)


def _cond(node: Node, col: Column) -> Column:
    if isinstance(node, Union):
        out = _cond(node.subs[0], col)
        for s in node.subs[1:]:
            out = out | _cond(s, col)
        return out
    if isinstance(node, Inter):
        out = _cond(node.subs[0], col)
        for s in node.subs[1:]:
            out = out & _cond(s, col)
        return out
    if isinstance(node, Compl):
        return ~_cond(node.sub, col)
    return col.rlike("^(?:" + to_java_regex(node) + ")$")
