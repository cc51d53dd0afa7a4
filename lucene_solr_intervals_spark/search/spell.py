"""Direct spell checking over the term dictionary.

DirectSpellChecker analog (lucene/suggest/src/java/org/apache/lucene/search/
spell/DirectSpellChecker.java:59): candidate suggestions come straight from
the live term dictionary (no side index), filtered by a Levenshtein edit
budget and a shared prefix, scored by string similarity and document
frequency.  The dictionary scan is a pruned DataFrame filter — the
Levenshtein-automaton intersection re-expressed as a JVM `levenshtein`
predicate over the (small) term_stats table.

Similarity follows LuceneLevenshteinDistance-style normalization:
1 - edits / max(|query|, |candidate|); ranking (similarity desc, df desc,
term asc) mirrors SuggestWordFrequencyComparator + score comparator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def suggest_terms(
    index,
    term: str,
    k: int = 5,
    max_edits: int = 2,
    min_prefix: int = 1,
    accuracy: float = 0.5,
    min_df: int = 1,
    field: str | None = None,
) -> DataFrame:
    """Top-k spelling suggestions: (suggestion, df, similarity).

    Matches DirectSpellChecker defaults: maxEdits<=2, minPrefix=1 (the
    automaton's common-prefix optimization, :71), accuracy 0.5, candidates
    must actually occur (thresholdFrequency via min_df); the query term
    itself is never suggested."""
    assert 1 <= max_edits <= 2, "DirectSpellChecker supports 1-2 edits"
    f = field or getattr(index, "default_field", "text")
    ts = index.term_stats.where(F.col("field") == f)
    cond = (
        (F.col("term") != term)
        # sound length band first: an edit changes length by at most 1, so
        # the expensive levenshtein only runs on the banded survivors
        & (F.length(F.col("term")) >= len(term) - max_edits)
        & (F.length(F.col("term")) <= len(term) + max_edits)
        & (F.levenshtein(F.col("term"), F.lit(term)) <= max_edits)
        & (F.col("df") >= min_df)
    )
    if min_prefix > 0:
        cond = cond & (
            F.substring(F.col("term"), 1, min_prefix) == term[:min_prefix]
        )
    sim = F.lit(1.0) - F.levenshtein(F.col("term"), F.lit(term)) / F.greatest(
        F.length(F.col("term")), F.lit(len(term))
    ).cast("double")
    return (
        ts.where(cond)
        .select(
            F.col("term").alias("suggestion"),
            F.col("df").cast("long").alias("df"),
            F.round(sim, 4).alias("similarity"),
        )
        .where(F.col("similarity") >= accuracy)
        .orderBy(F.desc("similarity"), F.desc("df"), F.asc("suggestion"))
        .limit(k)
    )
