"""Parity tests for the deterministic query-decomposition fallback against
a line-for-line Python reimplementation of the reference's
_fallback_decomposition (query/decomposer.py:183-208)."""

import re

from pyspark.sql import functions as F

from vanna_financial_knowledge_graph_spark.operators.decompose import (
    decompose_questions,
)

_STOP = {"the", "a", "an", "is", "are", "was", "were"}


def ref_fallback(question: str) -> tuple[str, str]:
    """Reference decomposer.py:183-208, reimplemented for the oracle."""
    words = question.split()
    entities = []
    for i, word in enumerate(words):
        clean = re.sub(r"[^\w\s]", "", word)
        if i > 0 and clean and clean[0].isupper() and clean.lower() not in _STOP:
            entities.append(clean)
    ql = question.lower()
    if any(k in ql for k in ["compare", "differ", "versus", " vs ", "between"]):
        qtype = "comparison"
    elif any(k in ql for k in ["why", "because", "cause", "reason", "effect"]):
        qtype = "causal"
    elif any(k in ql for k in ["when", "before", "after", "during", "changed"]):
        qtype = "temporal"
    elif any(k in ql for k in ["list", "which", "what are", "enumerate"]):
        qtype = "enumeration"
    else:
        qtype = "factual"
    return ",".join(entities), qtype


QUESTIONS = [
    # one per reference question type, reference-doc style
    "How does Apple Inc. compare versus Microsoft Corporation?",
    "Why did the SEC investigate Tesla?",
    "When did Berkshire Hathaway acquire GEICO?",
    "Which companies did Oracle acquire?",
    "Tell me about Goldman Sachs.",
    # stop-word capitalization, sentence-initial skip, punctuation strip
    "The Fed raised rates.",
    "Is Amazon a monopoly?",
    "What happened to FTX, Celsius, and Voyager?",
    "Summarize JPMorgan's earnings, please",
    # empty-entity and no-keyword cases
    "tell me everything",
    "An overview of market conditions",
    # multiple keywords: first matching type wins (comparison > causal)
    "Why compare Visa and Mastercard?",
    # ' vs ' needs surrounding spaces
    "Pepsi vs Coke market share",
    "Pepsi vs. Coke market share",
]


def test_decompose_matches_reference_fallback(spark):
    df = spark.createDataFrame([(q,) for q in QUESTIONS], "question string")
    got = {
        r["question"]: (r["entity_hints"], r["question_type"])
        for r in decompose_questions(df).collect()
    }
    for q in QUESTIONS:
        assert got[q] == ref_fallback(q), q


def test_decompose_is_narrow_no_udf(spark):
    """Pure column expressions: no shuffle, no Python eval in the plan."""
    df = spark.createDataFrame([(q,) for q in QUESTIONS], "question string")
    plan = decompose_questions(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "EvalPython" not in plan


def test_decompose_entry_runs(spark):
    import __spark_entry__ as entry

    out = entry.kg_decompose(spark, "/root/testdata/sf0.001")
    rows = out.collect()
    assert len(rows) == 25
    types = {r["question_type"] for r in rows}
    assert types == {"comparison", "causal", "temporal", "enumeration", "factual"}
    # every synthesized question names its nation -> non-empty hints
    assert all(r["entity_hints"] for r in rows)
    # cross-check each row against the reference reimplementation
    for r in rows:
        assert (r["entity_hints"], r["question_type"]) == ref_fallback(
            r["question"]
        ), r["question"]
