"""Property-based tests (hypothesis) for the pure deterministic core —
the layer whose total-function guarantees everything else leans on.
No Spark involved; these run on arbitrary adversarial inputs."""

from hypothesis import given, settings
from hypothesis import strategies as st

from vanna_financial_knowledge_graph_spark.functions import textops as T
from vanna_financial_knowledge_graph_spark.functions.matching import Matcher
from vanna_financial_knowledge_graph_spark.gazetteer import gazetteer_entries

MATCHER = Matcher(gazetteer_entries())

text_st = st.text(max_size=400)
bytes_st = st.binary(max_size=400)


@settings(max_examples=200, deadline=None)
@given(bytes_st)
def test_extract_text_total_and_idempotent_shape(b):
    out = T.extract_text(b)
    assert isinstance(out, str)
    assert "\r" not in out
    assert "\n\n\n" not in out
    assert out == out.strip()


@settings(max_examples=200, deadline=None)
@given(text_st)
def test_chunk_text_invariants(s):
    chunks = T.chunk_text(s)
    # positions are contiguous from 0
    assert [c["position"] for c in chunks] == list(range(len(chunks)))
    for c in chunks:
        assert len(c["content"]) >= 50
        # every chunk's characters come from the input (modulo whitespace
        # normalization the chunker performs via strip/rejoin)
        assert c["content"].strip() == c["content"]


@settings(max_examples=200, deadline=None)
@given(text_st)
def test_normalize_relationship_total(s):
    out = T.normalize_relationship_type(s)
    assert out
    assert out == out.upper()
    assert len(out.split("_")) <= 8
    assert all(ch.isalnum() or ch == "_" for ch in out)


@settings(max_examples=200, deadline=None)
@given(text_st)
def test_norm_name_idempotent(s):
    n = T.norm_name(s)
    assert T.norm_name(n) == n
    assert n == n.lower()


@settings(max_examples=200, deadline=None)
@given(text_st)
def test_strip_corp_suffix_never_empty_on_nonempty(s):
    n = T.norm_name(s)
    if n:
        assert T.strip_corp_suffix(n)


@settings(max_examples=100, deadline=None)
@given(text_st)
def test_matcher_offsets_and_no_overlap(s):
    ms = MATCHER.find(s)
    prev_end = -1
    for m in sorted(ms, key=lambda m: m["begin"]):
        assert s[m["begin"] : m["end"]] == m["name"]
        assert m["begin"] >= prev_end  # non-overlapping
        prev_end = m["end"]


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=200), st.dates())
def test_date_context_always_nonempty(s, d):
    out = T.date_context(s, d.isoformat())
    assert out


@settings(max_examples=50, deadline=None)
@given(st.lists(st.text(min_size=1, max_size=20), max_size=30), st.integers(1, 6))
def test_even_partition_conserves_items(items, maxp):
    from vanna_financial_knowledge_graph_spark.functions.textops import (
        _even_partition,
    )

    groups = _even_partition(items, maxp)
    flat = [x for g in groups for x in g]
    assert flat == items
    if items:
        sizes = [len(g) for g in groups]
        assert max(sizes) - min(sizes) <= 1  # even-split guarantee
        assert max(sizes) <= max(maxp, sizes[0])


from hypothesis import given, settings
from hypothesis import strategies as st


@given(st.text(max_size=200))
@settings(max_examples=200, deadline=None)
def test_embedding_total_deterministic_normalized(s):
    import numpy as np

    from vanna_financial_knowledge_graph_spark.functions.embedding import (
        EMBED_DIM,
        embed_batch,
        embed_text,
    )

    v = embed_text(s)
    assert len(v) == EMBED_DIM
    assert v == embed_text(s)  # deterministic
    n = float(np.linalg.norm(v))
    assert n == 0.0 or abs(n - 1.0) < 1e-5  # unit or zero
    # batch path agrees with the single path exactly
    assert list(embed_batch([s])[0]) == v
