"""Embedding generation (U3/U4), vector table, semantic search, two-stage
search, context assembly, and the MERGE upsert sink."""

import pytest
from pyspark.sql import functions as F

from vanna_financial_knowledge_graph_spark.functions.embedding import (
    EMBED_DIM,
    embed_batch,
    embed_text,
)


def test_embed_deterministic_and_normalized():
    a = embed_text("Apple acquired Stripe in Q3 2024")
    b = embed_text("Apple acquired Stripe in Q3 2024")
    assert a == b and len(a) == EMBED_DIM
    import numpy as np

    assert np.linalg.norm(a) == pytest.approx(1.0, abs=1e-5)
    assert embed_text("") == [0.0] * EMBED_DIM


def test_embed_batch_matches_single():
    texts = ["alpha beta gamma", "", "Apple reported earnings", "alpha beta gamma"]
    mat = embed_batch(texts)
    assert mat.shape == (4, EMBED_DIM)
    for i, t in enumerate(texts):
        assert list(mat[i]) == embed_text(t)
    assert list(mat[0]) == list(mat[3])


def test_spark_embedding_matches_python(spark):
    from vanna_financial_knowledge_graph_spark.operators.embed import with_embedding

    df = spark.createDataFrame(
        [(1, "Apple reported earnings"), (2, None), (3, "markets rallied today")],
        "id long, text string",
    )
    got = {r["id"]: r["embedding"] for r in with_embedding(df, "text").collect()}
    assert got[1] == embed_text("Apple reported earnings")
    assert got[2] == [0.0] * EMBED_DIM
    assert got[3] == embed_text("markets rallied today")


def test_vectors_stage_and_entity_search(spark, kg):
    from vanna_financial_knowledge_graph_spark.operators.embed import search_entities

    v = kg["vectors"]
    kinds = {r["kind"]: r["n"] for r in v.groupBy("kind").count().withColumnRenamed("count", "n").collect()}
    assert kinds["chunk"] == kg["chunks"].count()
    assert kinds["entity"] == kg["entities"].count()
    assert kinds["fact"] == kg["facts"].count()
    # all embeddings full-dim
    assert v.where(F.size("embedding") != EMBED_DIM).count() == 0

    hits = search_entities(
        spark, v, kg["entities"], "Apple Inc. technology company", k=5
    ).collect()
    assert len(hits) == 5
    assert [h["rank"] for h in hits] == [1, 2, 3, 4, 5]
    # the query embeds the exact name+summary tokens of Apple Inc. — it must
    # be the closest or near-closest entity
    assert any(h["name"] == "Apple Inc." for h in hits)


def test_two_stage_search(spark, kg):
    from vanna_financial_knowledge_graph_spark.operators.embed import two_stage_search

    got = two_stage_search(
        spark,
        kg["facts"],
        kg["vectors"],
        ["Apple Inc.", "Microsoft Corporation"],
        "acquisition announcement",
        k=10,
    ).collect()
    assert 0 < len(got) <= 10
    # ranked by cosine descending
    scores = [r["cosine"] for r in got]
    assert scores == sorted(scores, reverse=True)
    # every hit involves one of the filter entities (stage-1 contract)
    for r in got:
        assert r["subject_name"] in ("Apple Inc.", "Microsoft Corporation") or r[
            "object_name"
        ] in ("Apple Inc.", "Microsoft Corporation")


def test_topic_vectors_present_and_searchable(spark, kg):
    """The vectors table carries kind='topic' rows (reference topics index,
    indices.py:449-477) and a definition-phrased query retrieves the right
    topic at rank 1."""
    from vanna_financial_knowledge_graph_spark.operators.embed import search_topics

    v = kg["vectors"]
    n_topic_vecs = v.where(F.col("kind") == "topic").count()
    assert n_topic_vecs == kg["topics"].count() > 0

    # self-selecting probe: query a known topic by its own definition text
    t0 = kg["topics"].orderBy("name").first()
    got = search_topics(
        spark, v, kg["topics"], f"{t0['name']}: {t0['definition']}", k=3
    ).collect()
    assert got and got[0]["name"] == t0["name"] and got[0]["rank"] == 1
    assert {"uuid", "name", "definition", "parent_name", "cosine", "rank"} == set(
        got[0].asDict().keys()
    )


def test_fact_and_chunk_search_kinds(spark, kg):
    """search_facts / search_chunks over the same search_kind surface
    (knowledge_graph.py:995-1061): k rows, rank-ordered, kind-scoped."""
    from vanna_financial_knowledge_graph_spark.operators.embed import search_kind

    for kind in ("fact", "chunk"):
        got = search_kind(
            spark, kg["vectors"], kind, "quarterly earnings report", k=5
        ).collect()
        assert len(got) == 5
        assert [r["rank"] for r in sorted(got, key=lambda r: r["rank"])] == list(
            range(1, 6)
        )
        valid = {
            r["uuid"]
            for r in kg["vectors"].where(F.col("kind") == kind).select("uuid").collect()
        }
        assert all(r["vec_id"] in valid for r in got)


def test_context_build_composition(spark, kg):
    from vanna_financial_knowledge_graph_spark.operators.context import build_context

    ctx = build_context(
        spark,
        kg["entities"],
        kg["relationships"],
        kg["chunks"],
        kg["vectors"],
        "Apple Inc.",
        "earnings in the technology sector",
        caps={"high": 5, "low": 4, "topic": 3, "global": 2},
    )
    rows = ctx.collect()
    assert rows, "context must be non-empty for the hot entity"
    by_tier = {}
    seen = set()
    for r in rows:
        assert r["chunk_uuid"] not in seen, "A8 dedup violated"
        seen.add(r["chunk_uuid"])
        assert r["relevance"] in ("high", "low", "topic")
        by_tier[r["relevance"]] = by_tier.get(r["relevance"], 0) + 1
    # reference tier caps (context_builder.py:94-100): high/low after the
    # cross-source dedup, topic as its own separately-capped category
    assert by_tier.get("high", 0) <= 5
    assert by_tier.get("low", 0) <= 4
    assert by_tier.get("topic", 0) <= 3
    # topic-tier rows come only from the topic source
    assert all(r["source"] == "topic" for r in rows if r["relevance"] == "topic")
    assert all(r["source"] != "topic" for r in rows if r["relevance"] != "topic")


def test_context_caps_respected_hand_fixture(spark):
    """Hand-computed fixture: known graph -> exact expected context rows."""
    from vanna_financial_knowledge_graph_spark.operators.context import build_context
    from vanna_financial_knowledge_graph_spark.operators.embed import with_embedding

    ents = spark.createDataFrame(
        [("e1", "Acme", "", "company", [], "default"),
         ("e2", "Bolt", "", "company", [], "default")],
        "uuid string, name string, summary string, entity_type string, "
        "aliases array<string>, group_id string",
    )
    rels = spark.createDataFrame(
        [("r1", "e1", "entity", "e2", "entity", "R", "c1", "f1", "", "", "default"),
         ("r2", "e2", "entity", "e1", "entity", "R", "c2", "f2", "", "", "default")],
        "id string, from_uuid string, from_type string, to_uuid string, "
        "to_type string, rel_type string, chunk_uuid string, fact_id string, "
        "description string, date_context string, group_id string",
    )
    chunks = spark.createDataFrame(
        [("c1", "Acme acquired Bolt.", "default"),
         ("c2", "Bolt sued Acme.", "default"),
         ("c3", "Unrelated filler text.", "default")],
        "chunk_uuid string, content string, group_id string",
    )
    vectors = with_embedding(
        chunks.select(
            F.lit("chunk").alias("kind"),
            F.col("chunk_uuid").alias("uuid"),
            F.col("content").alias("text"),
            "group_id",
        ),
        "text",
    ).drop("text")
    ctx = build_context(
        spark, ents, rels, chunks, vectors, "Acme", "acquisition",
        caps={"high": 10, "low": 10, "topic": 10, "global": 1},
    ).collect()
    got = {(r["chunk_uuid"], r["source"]) for r in ctx}
    # c1 and c2 both touch e1 -> source 'entity' wins the A8 dedup for both
    assert ("c1", "entity") in got and ("c2", "entity") in got
    # c3 only reachable via global; cap 1 admits at most one global row
    assert sum(1 for _, s in got if s == "global") <= 1


def test_context_neighbor_chunks_bidirectional(spark):
    """A top-k neighbor contributes chunks from edges where it is EITHER
    endpoint (reference researcher.py:732-769 uses the full J2 OR-join per
    neighbor): a chunk reachable only via neighbor-as-OBJECT must appear."""
    from vanna_financial_knowledge_graph_spark.operators.context import build_context
    from vanna_financial_knowledge_graph_spark.operators.embed import with_embedding

    ents = spark.createDataFrame(
        [("e1", "Acme", "", "company", [], "default"),
         ("e2", "Bolt", "", "company", [], "default"),
         ("e3", "Corp", "", "company", [], "default")],
        "uuid string, name string, summary string, entity_type string, "
        "aliases array<string>, group_id string",
    )
    # e2 is Acme's only neighbor; c4 attaches to edge e3 -> e2, i.e. the
    # neighbor appears only as the OBJECT endpoint there
    rels = spark.createDataFrame(
        [("r1", "e1", "entity", "e2", "entity", "R", "c1", "f1", "", "", "default"),
         ("r2", "e3", "entity", "e2", "entity", "R", "c4", "f2", "", "", "default")],
        "id string, from_uuid string, from_type string, to_uuid string, "
        "to_type string, rel_type string, chunk_uuid string, fact_id string, "
        "description string, date_context string, group_id string",
    )
    chunks = spark.createDataFrame(
        [("c1", "Acme partnered with Bolt.", "default"),
         ("c4", "Corp sued Bolt over patents.", "default"),
         ("c5", "Unrelated filler text.", "default")],
        "chunk_uuid string, content string, group_id string",
    )
    vectors = with_embedding(
        chunks.select(
            F.lit("chunk").alias("kind"),
            F.col("chunk_uuid").alias("uuid"),
            F.col("content").alias("text"),
            "group_id",
        ),
        "text",
    ).drop("text")
    ctx = build_context(
        spark, ents, rels, chunks, vectors, "Acme", "lawsuit",
        caps={"high": 10, "low": 10, "topic": 10, "global": 0},
    ).collect()
    by_chunk = {r["chunk_uuid"]: r["source"] for r in ctx}
    assert by_chunk.get("c4") == "neighbor", by_chunk
    assert "c5" not in by_chunk


def test_context_modes_agree(spark, kg):
    """The staged driver-assisted path (materialize=True) and the single
    lazy plan (materialize=False) must produce identical context rows."""
    from vanna_financial_knowledge_graph_spark.operators.context import build_context

    kwargs = dict(
        entity_name="Apple Inc.",
        query_text="earnings in the technology sector",
        caps={"high": 7, "low": 5, "topic": 4, "global": 3},
    )
    handles = []
    eager = build_context(
        spark, kg["entities"], kg["relationships"], kg["chunks"],
        kg["vectors"], materialize=True, **kwargs,
    ).collect()
    lazy = build_context(
        spark, kg["entities"], kg["relationships"], kg["chunks"],
        kg["vectors"], materialize=False, caches=handles, **kwargs,
    ).collect()
    for h in handles:
        h.unpersist()
    key = lambda r: (r["chunk_uuid"], r["source"], r["relevance"], round(r["score"], 4))
    assert sorted(map(key, eager)) == sorted(map(key, lazy))
    assert eager, "context must be non-empty"


def test_context_unknown_entity_empty(spark, kg):
    from vanna_financial_knowledge_graph_spark.operators.context import build_context

    out = build_context(
        spark, kg["entities"], kg["relationships"], kg["chunks"],
        kg["vectors"], "No Such Entity Anywhere", "anything",
    )
    assert out.count() == 0
    assert out.columns == ["chunk_uuid", "source", "relevance", "score", "content"]


def test_context_materialized_releases_all_caches(spark, kg):
    """materialize=True must leave ZERO lingering cached RDDs: a long-lived
    session answering many questions must not grow executor storage
    (round-3 regression guard, kept across the round-4 restage)."""
    from vanna_financial_knowledge_graph_spark.operators.context import build_context

    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    for q in ("earnings", "acquisitions", "regulation"):
        assert (
            build_context(
                spark, kg["entities"], kg["relationships"], kg["chunks"],
                kg["vectors"], "Apple Inc.", q,
            ).count()
            >= 0
        )
    assert jsc.getPersistentRDDs().size() == before


def test_context_lazy_mode_returns_cache_handles(spark, kg):
    """materialize=False with caches=[] hands the internal cached branches
    to the caller so composed usage can release them (ADVICE r3)."""
    from vanna_financial_knowledge_graph_spark.operators.context import build_context

    handles = []
    ctx = build_context(
        spark, kg["entities"], kg["relationships"], kg["chunks"],
        kg["vectors"], "Apple Inc.", "earnings",
        materialize=False, caches=handles,
    )
    assert ctx.count() > 0
    assert len(handles) == 3
    for h in handles:
        assert h.is_cached
        h.unpersist()
    assert not any(h.is_cached for h in handles)


def test_recrawl_upsert_equals_from_scratch(spark, kg):
    """Incremental-crawl MERGE: recrawl 3 urls with changed html, merge into
    the existing KG tables, and assert every table is row-equal to a
    from-scratch build over the updated corpus (reference update semantics,
    backend.py:499-553)."""
    from vanna_financial_knowledge_graph_spark.operators.upsert import (
        build_kg_tables,
        recrawl_upsert,
    )

    pages = kg["pages"]
    urls = [r["url"] for r in pages.select("url").orderBy("url").limit(3).collect()]
    modified = (
        pages.where(F.col("url").isin(urls))
        .withColumn(
            "html",
            F.encode(
                F.regexp_replace(F.decode("html", "utf-8"), "acquired", "sold"),
                "utf-8",
            ),
        )
        .withColumn("warc_ts", F.col("warc_ts") + F.expr("INTERVAL 1 DAY"))
    )
    merged = recrawl_upsert(spark, kg, modified)

    # the recrawl must actually change the recrawled docs' chunks
    doc_uuids = [r["doc_uuid"] for r in merged["docs"].join(
        modified.select("url"), "url").select("doc_uuid").collect()]
    old_c = kg["chunks"].where(F.col("doc_uuid").isin(doc_uuids)).select(
        "chunk_uuid", "content")
    new_c = merged["chunks"].where(F.col("doc_uuid").isin(doc_uuids)).select(
        "chunk_uuid", "content")
    assert new_c.exceptAll(old_c).count() > 0, "recrawl produced no change"

    scratch = build_kg_tables(
        spark, pages.where(~F.col("url").isin(urls)).unionByName(modified)
    )

    def _multiset(df):
        return sorted(
            tuple(str(v) for v in row) for row in df.collect()
        )

    for name in [
        "docs", "chunks", "mentions", "facts_raw",
        "canonical_map", "entities", "topics", "facts", "relationships",
    ]:
        a, b = merged[name], scratch[name].select(*merged[name].columns)
        assert _multiset(a) == _multiset(b), f"{name}: merged != from-scratch"


def test_merge_upsert(spark):
    from vanna_financial_knowledge_graph_spark.operators.upsert import (
        merge_upsert,
        update_entity_summaries,
        upsert_parquet,
    )

    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, name string, v double",
    )
    updates = spark.createDataFrame(
        [(2, "b2", 99.0), (4, "d", 40.0)], "k long, name string, v double"
    )
    got = {r["k"]: (r["name"], r["v"]) for r in merge_upsert(target, updates, ["k"]).collect()}
    assert got == {1: ("a", 10.0), 2: ("b2", 99.0), 3: ("c", 30.0), 4: ("d", 40.0)}

    ents = spark.createDataFrame(
        [("u1", "Acme", "old", "company"), ("u2", "Bolt", "keep", "company")],
        "uuid string, name string, summary string, entity_type string",
    )
    new = spark.createDataFrame([("u1", "new summary")], "uuid string, summary string")
    got2 = {r["uuid"]: r["summary"] for r in update_entity_summaries(ents, new).collect()}
    assert got2 == {"u1": "new summary", "u2": "keep"}


def test_upsert_parquet_in_place(spark, tmp_path):
    from vanna_financial_knowledge_graph_spark.operators.upsert import upsert_parquet

    path = str(tmp_path / "tbl")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "k long, name string"
    ).write.parquet(path)
    updates = spark.createDataFrame([(2, "B"), (3, "c")], "k long, name string")
    out = upsert_parquet(spark, path, updates, ["k"])
    assert {(r["k"], r["name"]) for r in out.collect()} == {(1, "a"), (2, "B"), (3, "c")}
    # durable: a fresh read sees the merged rows
    again = spark.read.parquet(path)
    assert again.count() == 3


def test_upsert_parquet_crash_recovery(spark, tmp_path):
    """A retry after a crash BETWEEN the two renames (path absent, .__old__
    = original, .__tmp__ = complete merged copy) must restore the original
    and re-apply the merge — never delete the only surviving copies."""
    import os
    import shutil

    from vanna_financial_knowledge_graph_spark.operators.upsert import upsert_parquet

    path = str(tmp_path / "tbl")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "k long, name string"
    ).write.parquet(path)
    updates = spark.createDataFrame([(2, "B"), (3, "c")], "k long, name string")

    # simulate the mid-swap crash state
    shutil.copytree(path, path + ".__tmp__")  # stand-in for the merged copy
    os.rename(path, path + ".__old__")
    assert not os.path.exists(path)

    out = upsert_parquet(spark, path, updates, ["k"])
    assert {(r["k"], r["name"]) for r in out.collect()} == {
        (1, "a"), (2, "B"), (3, "c")
    }
    assert not os.path.exists(path + ".__old__")
    assert not os.path.exists(path + ".__tmp__")


def test_build_context_rejects_unknown_caps(spark, kg):
    """The pre-round-3 per-source caps contract must fail loudly, not fall
    back to defaults silently."""
    import pytest as _pytest

    from vanna_financial_knowledge_graph_spark.operators.context import build_context

    with _pytest.raises(ValueError, match="unknown caps keys"):
        build_context(
            spark, kg["entities"], kg["relationships"], kg["chunks"],
            kg["vectors"], "Apple Inc.", "earnings",
            caps={"entity": 5, "neighbor": 4, "topic": 3, "global": 2},
        )


def test_embedding_near_dup_paths_agree(spark, tmp_path):
    from vanna_financial_knowledge_graph_spark.operators.dedup import (
        embedding_near_dups,
        embedding_near_dups_fast,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_near_dups(emb, "label", 0.30).collect()
    }
    fast = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_near_dups_fast(emb, "label", 0.30).collect()
    }
    assert set(exact) == set(fast)
    for k in exact:
        assert fast[k] == pytest.approx(exact[k], abs=1e-6)


def test_ontology_topic_search(spark, kg):
    """search_topics against the group_id='ontology' vector space (the
    reference researcher resolves topics there, topic_resolver.py:357-369):
    hits come only from the ontology namespace and carry its vertex fields."""
    from vanna_financial_knowledge_graph_spark.operators.embed import search_topics
    import pyspark.sql.functions as F

    onto = kg["topics"].where(F.col("group_id") == "ontology")
    got = search_topics(
        spark, kg["vectors"], onto,
        "general increase in prices and fall in purchasing power",
        k=5, group_id="ontology",
    ).collect()
    assert len(got) == 5
    onto_ids = {r["uuid"] for r in onto.select("uuid").collect()}
    assert all(r["uuid"] in onto_ids for r in got)
    assert all(r["name"] and r["definition"] is not None for r in got)
    # the duplicated-uuid trap: corpus topics share uuids with ontology
    # rows, so hits must NOT fan out through the two-namespace topics table
    assert len({r["uuid"] for r in got}) == 5


def test_cap_tiers_null_scores_agree(spark):
    """NULL relevance scores (zero-norm embedding / zero query vector) must
    land in the LOW tier in BOTH context modes (ADVICE r4: the staged
    path's score<t filter silently dropped them while the lazy path kept
    them as 'low')."""
    from vanna_financial_knowledge_graph_spark.operators.context import (
        _cap_tiers,
        _cap_tiers_takeordered,
    )

    scored = spark.createDataFrame(
        [
            ("c1", "entity", 0.9),
            ("c2", "global", 0.05),
            ("c3", "entity", None),
            ("c3", "neighbor", None),
            ("c4", "neighbor", 0.4),
        ],
        "chunk_uuid string, source string, score double",
    )
    topic_scored = spark.createDataFrame(
        [("c5", "topic", None), ("c6", "topic", 0.3)],
        "chunk_uuid string, source string, score double",
    )
    caps = {"high": 30, "low": 20, "topic": 15}
    lazy = _cap_tiers(scored, topic_scored, caps, 0.2)
    staged = _cap_tiers_takeordered(scored, topic_scored, caps, 0.2)
    key = lambda rows: sorted(
        (r["chunk_uuid"], r["source"], r["relevance"], r["score"]) for r in rows
    )
    assert key(lazy.collect()) == key(staged.collect())
    rel = {r["chunk_uuid"]: r["relevance"] for r in staged.collect()}
    assert rel["c3"] == "low" and rel["c5"] == "topic"


def test_context_child_session_mode_agrees(spark, kg, monkeypatch):
    """Opt-in AQE isolation (VKG_CTX_CHILD_SESSION=1): the staged build runs
    on an AQE-off child session with rebound inputs; rows must equal the
    default locked-toggle path and the primary session's AQE conf must be
    untouched throughout."""
    from vanna_financial_knowledge_graph_spark.operators.context import build_context

    args = (
        spark, kg["entities"], kg["relationships"], kg["chunks"],
        kg["vectors"], "Apple Inc.", "earnings and acquisitions",
    )
    key = lambda rows: sorted(map(tuple, rows))
    default_rows = key(build_context(*args).collect())
    monkeypatch.setenv("VKG_CTX_CHILD_SESSION", "1")
    child_rows = key(build_context(*args).collect())
    assert child_rows == default_rows and child_rows
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
