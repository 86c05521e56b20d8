"""Mention matcher + triple-rule unit tests (the deterministic stand-ins for
the reference's extraction behavior tests, e.g. test_extraction_proper_nouns)."""

from vanna_financial_knowledge_graph_spark.functions.matching import (
    Matcher,
    extract_triples,
)
from vanna_financial_knowledge_graph_spark.gazetteer import gazetteer_entries

ENTRIES = gazetteer_entries()
M = Matcher(ENTRIES)


def find_names(text):
    return [(m["name_norm"], m["kind"]) for m in M.find(text)]


def test_longest_match_wins():
    ms = M.find("The Federal Reserve Bank of San Francisco reported growth.")
    assert ("federal reserve bank of san francisco", "entity") in [
        (m["name_norm"], m["kind"]) for m in ms
    ]
    # not also matched as the shorter "Federal Reserve"
    assert "federal reserve" not in [m["name_norm"] for m in ms]


def test_alias_and_ticker_match():
    # mentions keep the SURFACE norm; canonicalization maps aapl/the fed to
    # Apple Inc./Federal Reserve later (test_canonicalize.test_merge_rules)
    ms = find_names("AAPL rose while the Fed held rates.")
    assert ("aapl", "entity") in ms
    assert ("the fed", "entity") in ms


def test_case_insensitive_and_dot_suffix():
    ms = find_names("apple inc announced something about MICROSOFT.")
    assert ("apple inc.", "entity") in ms
    assert ("microsoft", "entity") in ms  # alias surface; canonical later


def test_topic_synonym_match():
    ms = find_names("Concerns about price pressures and the job market grew.")
    assert ("price pressures", "topic") in ms
    assert ("job market", "topic") in ms


def test_proper_noun_rule_unnamed_not_extracted():
    # mirrors reference test_extraction_proper_nouns.py:19-28 — "a
    # manufacturer based in Hawaii": only Hawaii is an entity
    ms = M.find("A manufacturer based in Hawaii reported steady orders.")
    names = [m["name_norm"] for m in ms]
    assert "hawaii" in names
    assert not any("manufacturer" in n for n in names)


def test_caps_fallback_unknown_entity():
    ms = M.find("Shares of Zenith Robotics climbed after the announcement.")
    unk = [m for m in ms if m["ref_uuid"] is None]
    assert any(m["name_norm"] == "zenith robotics" for m in unk)


def test_caps_fallback_skips_sentence_initial_single():
    ms = M.find("Analysts expected more.")
    assert all(m["ref_uuid"] is not None for m in ms)


def test_mention_offsets_exact():
    text = "Today Apple Inc. acquired Stripe Inc. for cash."
    for m in M.find(text):
        assert text[m["begin"] : m["end"]] == m["name"]


# --- triple rules ------------------------------------------------------------


def _triples(text, date="2025-06-01"):
    ms = M.find(text)
    return extract_triples("chunk1", text, date, ms)


def test_triple_basic():
    fs = _triples("Apple Inc. acquired Stripe Inc. in Q3 2024.")
    assert len(fs) == 1
    f = fs[0]
    assert f["subject_norm"] == "apple inc."
    assert f["object_norm"] == "stripe inc."
    assert f["relationship_type"] == "ACQUIRED"
    assert f["date_context"] == "Q3 2024"


def test_triple_date_fallback():
    fs = _triples("Apple Inc. acquired Stripe Inc. for cash.")
    assert fs and fs[0]["date_context"] == "Document date: 2025-06-01"


def test_triple_requires_relation_verb():
    assert _triples("Apple Inc. and Microsoft and Tesla.") == []


def test_triple_topic_object():
    fs = _triples("Microsoft warned that inflation could hurt margins in Q1 2025.")
    assert any(
        f["object_kind"] == "topic" and f["object_norm"] == "inflation" for f in fs
    )


def test_triple_topics_attached():
    fs = _triples("Tesla reported strong earnings despite inflation in Q1 2025.")
    assert fs and "inflation" in fs[0]["topics"] and "earnings" in fs[0]["topics"]


def test_triple_content_is_sentence():
    text = "Irrelevant lead-in. Apple Inc. acquired Stripe Inc. in 2024. Trailing words."
    fs = _triples(text)
    assert fs[0]["content"] == "Apple Inc. acquired Stripe Inc. in 2024."


def test_triple_survives_newline_in_sentence():
    # Regression: the old prefix re-find drifted when a sentence spanned a
    # newline, mis-scoping mentions and silently dropping the fact.
    text = "Apple\nInc. acquired Microsoft."
    fs = _triples(text)
    assert len(fs) == 1
    assert fs[0]["subject_norm"] == "apple inc."
    assert fs[0]["object_norm"] == "microsoft"
    assert fs[0]["content"] == "Apple Inc. acquired Microsoft."


def test_sentence_spans_exact_offsets():
    from vanna_financial_knowledge_graph_spark.functions.textops import (
        sentence_spans,
    )

    text = "First one.  Second\nspans lines. Third!"
    spans = sentence_spans(text)
    assert [t for _, _, t in spans] == [
        "First one.",
        "Second spans lines.",
        "Third!",
    ]
    for s, e, t in spans:
        assert text[s:e].replace("\n", " ") == t


def test_triple_deterministic_uuid():
    a = _triples("Apple Inc. acquired Stripe Inc. in 2024.")
    b = _triples("Apple Inc. acquired Stripe Inc. in 2024.")
    assert a[0]["fact_uuid"] == b[0]["fact_uuid"]
