"""MemoryIndex analog: a single-document, in-process index for percolation.

The reference's MemoryIndex (lucene/memory/src/java/org/apache/lucene/index/
memory/MemoryIndex.java:79) inverts ONE document into RAM so queries can be
matched against it without touching a Directory — the building block for
percolation / alerting ("which stored queries match this new document?").

Here the same contract needs no index machinery at all: one document's
inverted form IS a positions dict, the interval kernel IS the matcher, and
BM25 scoring degenerates to the single-doc statistics the caller supplies.
Percolation at scale composes with Spark: broadcast the parsed query set,
`mapInPandas` over the incoming documents, one MemoryIndex per row
(see `percolate`).
"""

from __future__ import annotations

import math

from .analysis.tokenizer import ANALYZERS
from .intervals import kernel as IK
from .search import queries as Q


class MemoryIndex:
    """One inverted document; `match` evaluates any engine query against it."""

    def __init__(self, text: str, analyzer: str = "code", field: str = "text"):
        terms, positions, doclen = ANALYZERS[analyzer](text)
        self.field = field
        self.doclen = doclen
        self.positions: dict[str, list[int]] = {}
        self.tf: dict[str, int] = {}
        for t, p in zip(terms, positions):
            self.positions.setdefault(t, []).append(p)
            self.tf[t] = self.tf.get(t, 0) + 1

    def match(self, q: Q.Query) -> bool:
        """Doc-level predicate — the MemoryIndex.search >= 0 contract."""
        if isinstance(q, Q.Term):
            return bool(self.positions.get(q.term))
        if isinstance(q, Q.MatchAll):
            return True
        if isinstance(q, Q.ConstantScore):
            return self.match(q.inner)
        if isinstance(q, Q.Prefix):
            return any(t.startswith(q.prefix) for t in self.tf)
        if isinstance(q, Q.TermRange):
            return any(
                (q.lower is None or (t >= q.lower if q.include_lower else t > q.lower))
                and (q.upper is None or (t <= q.upper if q.include_upper else t < q.upper))
                for t in self.tf
            )
        if isinstance(q, Q.Fuzzy):
            from difflib import SequenceMatcher  # noqa: F401  (doc only)

            return any(_levenshtein(t, q.term) <= q.max_edits for t in self.tf)
        if isinstance(q, Q.Boolean):
            if any(self.match(c) for c in q.must_not):
                return False
            if not all(self.match(c) for c in q.must):
                return False
            if q.should:
                n = sum(1 for c in q.should if self.match(c))
                msm = q.min_should_match if q.must else max(q.min_should_match, 1)
                if n < msm:
                    return False
            return True
        return IK.build_iter(q, self.positions) is not None

    def score(self, term: str, k1: float = 1.2, b: float = 0.75) -> float:
        """Single-doc BM25 with degenerate collection stats (N=1, avgdl =
        this doc's length) — the MemoryIndex score convention: >0 iff match."""
        tf = self.tf.get(term, 0)
        if not tf:
            return 0.0
        idf = math.log(1 + 0.5 / 1.5)  # N=1, df=1
        return idf * (k1 + 1) * tf / (tf + k1)


def _levenshtein(a: str, b: str) -> int:
    if abs(len(a) - len(b)) > 2:
        return 3  # early out past FuzzyQuery's max supported edits
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def percolate(docs, queries: dict[str, Q.Query], text_col: str = "text",
              id_col: str = "doc_id", analyzer: str = "code"):
    """Percolation at scale: for every incoming document, which of the
    registered queries match?  The parsed query dict rides the closure
    (broadcast) and each partition evaluates locally — no per-query jobs.
    Returns (doc_id, query_name) pairs."""
    import pandas as pd
    from pyspark.sql import functions as F  # noqa: F401
    from pyspark.sql import types as T

    names = sorted(queries)
    qlist = [queries[n] for n in names]
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("query_name", T.StringType()),
        ]
    )

    def fn(batches):
        for pdf in batches:
            out_d, out_q = [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                mi = MemoryIndex(text, analyzer)
                for name, q in zip(names, qlist):
                    if mi.match(q):
                        out_d.append(int(doc_id))
                        out_q.append(name)
            yield pd.DataFrame({"doc_id": out_d, "query_name": out_q})

    return docs.select(id_col, text_col).mapInPandas(fn, schema)
