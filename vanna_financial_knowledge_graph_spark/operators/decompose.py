"""Deterministic query-decomposition fallback (reference
query/decomposer.py:166-237 `_fallback_decomposition`): the entry point of
every reference `query()` call when the LLM path is unavailable.

Semantics, ported rule-for-rule:
  * entity hints = words after the first, stripped of punctuation
    (re.sub(r"[^\\w\\s]", "")), kept when the first character is uppercase
    and the lowercase form is not in {the, a, an, is, are, was, were},
    in question order (decomposer.py:183-196).
  * question_type = first match in priority order comparison > causal >
    temporal > enumeration, else factual, via substring tests on the
    lowercased question (decomposer.py:198-208).

Spark-first shape: pure column expressions — split + transform/filter
higher-order functions, zero shuffle, zero UDF, fully codegen-able; at
100 TB of questions this is a narrow map over the scan."""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# decomposer.py:190 — words excluded even when capitalized
STOP_WORDS = ["the", "a", "an", "is", "are", "was", "were"]

# decomposer.py:199-206 — FIRST match wins, in this order
TYPE_KEYWORDS = [
    ("comparison", ["compare", "differ", "versus", " vs ", "between"]),
    ("causal", ["why", "because", "cause", "reason", "effect"]),
    ("temporal", ["when", "before", "after", "during", "changed"]),
    ("enumeration", ["list", "which", "what are", "enumerate"]),
]


def question_type_expr(question: Column) -> Column:
    """CASE-chain classification of the lowercased question text."""
    ql = F.lower(question)

    def _any(kws: list[str]) -> Column:
        return reduce(lambda a, b: a | b, [ql.contains(k) for k in kws])

    expr = F.lit("factual")
    for qtype, kws in reversed(TYPE_KEYWORDS):
        expr = F.when(_any(kws), F.lit(qtype)).otherwise(expr)
    return expr


def entity_hints_expr(question: Column) -> Column:
    """Comma-joined capitalized-word entities, in question order."""
    toks = F.split(F.trim(question), r"\s+")
    indexed = F.transform(
        toks,
        lambda w, i: F.struct(
            i.alias("i"),
            F.regexp_replace(w, "[^A-Za-z0-9_]", "").alias("w"),
        ),
    )
    kept = F.filter(
        indexed,
        lambda s: (s["i"] > 0)
        & (s["w"] != "")
        & (s["w"].substr(1, 1) >= "A")
        & (s["w"].substr(1, 1) <= "Z")
        & ~F.lower(s["w"]).isin(STOP_WORDS),
    )
    return F.array_join(F.transform(kept, lambda s: s["w"]), ",")


def decompose_questions(
    questions: DataFrame, question_col: str = "question"
) -> DataFrame:
    """-> (question, entity_hints, question_type) per input row."""
    q = F.col(question_col)
    return questions.select(
        q.alias("question"),
        entity_hints_expr(q).alias("entity_hints"),
        question_type_expr(q).alias("question_type"),
    )
