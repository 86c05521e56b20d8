"""Read-path operator tests over a small hand-built graph (the reference's
DuckDB query-layer semantics, queries.py:328-669)."""

import pyspark.sql.functions as F
import pytest

from vanna_financial_knowledge_graph_spark.operators import readpath as R


@pytest.fixture(scope="module")
def graph(spark):
    entities = spark.createDataFrame(
        [
            ("e1", "Apple Inc.", "maker", "company", "default"),
            ("e2", "Tim Cook", "ceo", "person", "default"),
            ("e3", "Microsoft", "rival", "company", "default"),
            ("e4", "Orphan", "none", "company", "default"),
        ],
        "uuid string, name string, summary string, entity_type string, group_id string",
    )
    topics = spark.createDataFrame(
        [("t1", "Inflation", "def", "uri", "default")],
        "uuid string, name string, definition string, uri string, group_id string",
    )
    rels = spark.createDataFrame(
        [
            ("r1", "e1", "entity", "e2", "entity", "LED_BY", "c1", "f1", "d", "2024", "default"),
            ("r2", "e1", "entity", "e3", "entity", "COMPETES", "c2", "f2", "d", "2024", "default"),
            ("r3", "e1", "entity", "e3", "entity", "SUED", "c3", "f3", "d", "2024", "default"),
            ("r4", "e3", "entity", "e1", "entity", "COMPETES", "c3", "f4", "d", "2024", "default"),
            ("r5", "e2", "entity", "t1", "topic", "DISCUSSED", "c4", "f5", "d", "2024", "default"),
        ],
        "id string, from_uuid string, from_type string, to_uuid string, to_type string,"
        " rel_type string, chunk_uuid string, fact_id string, description string,"
        " date_context string, group_id string",
    )
    chunks = spark.createDataFrame(
        [
            (f"c{i}", f"content {i}", "H", "2024-01-0%d" % i, f"u{i}", "default")
            for i in range(1, 5)
        ],
        "chunk_uuid string, content string, header_path string, document_date string,"
        " url string, group_id string",
    )
    return entities, topics, rels, chunks


def test_one_hop_union_rewrite(spark, graph):
    """J2: chunks where entity is source OR target — union of equi-joins."""
    entities, _, rels, chunks = graph
    got = {
        r["chunk_uuid"]
        for r in R.entity_one_hop_chunks(entities, rels, chunks, "apple inc.").collect()
    }
    # e1 appears in r1(c1), r2(c2), r3(c3) as from; r4(c3) as to
    assert got == {"c1", "c2", "c3"}


def test_one_hop_doc_name_enrichment(spark, graph):
    """Reference J2 carries d.name via LEFT JOIN documents
    (queries.py:477-485): enrichment fills doc_name, missing docs -> null."""
    entities, _, rels, chunks = graph
    chunks2 = chunks.withColumn(
        "doc_uuid", F.concat(F.lit("d-"), F.col("chunk_uuid"))
    )
    docs = spark.createDataFrame(
        [("d-c1", "Doc One", "default")],
        "doc_uuid string, doc_name string, group_id string",
    )
    got = {
        r["chunk_uuid"]: r["doc_name"]
        for r in R.entity_one_hop_chunks(
            entities, rels, chunks2, "apple inc.", documents=docs
        ).collect()
    }
    assert got == {"c1": "Doc One", "c2": None, "c3": None}


def test_two_hop_neighbor_counts(spark, graph):
    entities, _, rels, _ = graph
    rows = R.two_hop_neighbors(entities, rels, "Apple Inc.", 10).collect()
    by_name = {r["neighbor_name"]: r["connection_count"] for r in rows}
    assert by_name == {"Microsoft": 2, "Tim Cook": 1}
    # ranked by count desc
    assert rows[0]["neighbor_name"] == "Microsoft"


def test_topic_one_hop(spark, graph):
    _, topics, rels, chunks = graph
    got = R.topic_one_hop_chunks(topics, rels, chunks, "inflation").collect()
    assert [r["chunk_uuid"] for r in got] == ["c4"]


def test_facts_around_and_between(spark, kg):
    facts = kg["facts"]
    around = R.facts_for_entities(facts, ["Apple Inc."], "around", 20)
    assert around.count() == 20
    names = {"apple inc."}
    for r in around.collect():
        assert (
            r["subject_name"].lower() in names or r["object_name"].lower() in names
        )
    between = R.facts_for_entities(
        facts, ["Apple Inc.", "Securities and Exchange Commission"], "between", 20
    )
    for r in between.collect():
        assert r["subject_name"].lower() in {
            "apple inc.",
            "securities and exchange commission",
        } and r["object_name"].lower() in {
            "apple inc.",
            "securities and exchange commission",
        }


def test_facts_date_filtered(spark, kg):
    """Reference get_facts_by_entities date path (queries.py:395-430): the
    date bounds sit on the LEFT-JOINed chunk's document_date, the top-N is
    ordered by it DESC NULLS LAST, and output keeps only fact columns."""
    import pyspark.sql.functions as F

    facts, chunks = kg["facts"], kg["chunks"]
    # corpus chunks all carry document_date 2025-06-01: a window containing
    # it keeps every dated Apple fact, a window before it keeps none
    out_in = R.facts_for_entities(
        facts, ["Apple Inc."], "around", limit=10**6,
        chunks=chunks, date_from="2025-01-01", date_to="2025-12-31",
    )
    assert out_in.columns == facts.columns
    n_in = out_in.count()
    assert n_in > 0
    out_none = R.facts_for_entities(
        facts, ["Apple Inc."], "around", limit=10**6,
        chunks=chunks, date_from="2000-01-01", date_to="2024-12-31",
    )
    assert out_none.count() == 0

    # hand fixture: date ordering DESC NULLS LAST + null-date drop when a
    # bound is set (the reference's WHERE sits on the left-joined column)
    f2 = spark.createDataFrame(
        [("f1", "Apple Inc.", "X", "c1", "default"),
         ("f2", "Apple Inc.", "Y", "c2", "default"),
         ("f3", "Apple Inc.", "Z", "c-missing", "default")],
        "uuid string, subject_name string, object_name string, "
        "chunk_uuid string, group_id string",
    )
    c2 = spark.createDataFrame(
        [("c1", "2024-01-01", "default"), ("c2", "2024-06-01", "default")],
        "chunk_uuid string, document_date string, group_id string",
    )
    # no date bounds: undated fact survives, sorted NULLS LAST
    rows = R.facts_for_entities(
        f2, ["Apple Inc."], "around", limit=10, chunks=c2
    ).collect()
    assert [r["uuid"] for r in rows] == ["f2", "f1", "f3"]
    # a bound drops the undated fact
    rows = R.facts_for_entities(
        f2, ["Apple Inc."], "around", limit=10, chunks=c2,
        date_from="2024-03-01",
    ).collect()
    assert [r["uuid"] for r in rows] == ["f2"]
    # date args without the chunks table must fail loudly
    import pytest as _pytest

    with _pytest.raises(ValueError):
        R.facts_for_entities(facts, ["Apple Inc."], date_from="2020-01-01")
    _ = F


def test_point_lookups(spark, graph, kg):
    """get_topics_by_names / get_chunks_by_uuids point lookups
    (queries.py:594-625 / :290-306): case-insensitive name set, uuid set,
    tenant-filtered, empty set -> empty result."""
    _, topics, _, chunks = graph
    got = {r["name"] for r in R.topics_by_names(topics, ["INFLATION", "nope"]).collect()}
    assert got == {"Inflation"}
    assert R.topics_by_names(topics, []).count() == 0
    ids = [r["chunk_uuid"] for r in chunks.limit(2).collect()]
    got2 = {r["chunk_uuid"] for r in R.chunks_by_uuids(chunks, ids).collect()}
    assert got2 == set(ids)
    assert R.chunks_by_uuids(chunks, ["missing"]).count() == 0
    # real KG tables: lookup round-trips through the pipeline output
    t = kg["topics"].limit(1).collect()
    if t:
        assert (
            R.topics_by_names(kg["topics"], [t[0]["name"].upper()]).count() >= 1
        )


def test_kg_stats(spark, graph):
    entities, topics, rels, chunks = graph
    rows = {
        r["table_name"]: r["row_count"]
        for r in R.kg_stats(
            {"entities": entities, "topics": topics, "relationships": rels}
        ).collect()
    }
    assert rows == {"entities": 4, "topics": 1, "relationships": 5}


def test_paginate(spark):
    df = spark.range(100).select(F.col("id"))
    got = [r["id"] for r in R.paginate(df, "id", limit=10, offset=25).collect()]
    assert got == list(range(25, 35))


def test_dedup_max_score(spark):
    df = spark.createDataFrame(
        [("a", 1, 0.5), ("a", 2, 0.9), ("b", 3, 0.1)],
        "k string, v int, score double",
    )
    got = {(r["k"], r["v"]) for r in R.dedup_max_score(df, "k", "score").collect()}
    assert got == {("a", 2), ("b", 3)}


def test_topk_per_query(spark):
    df = spark.createDataFrame(
        [("q1", i, float(i)) for i in range(10)] + [("q2", 1, 1.0)],
        "query_id string, vec_id int, score double",
    )
    got = R.topk_per_query(df, "query_id", "score", 3)
    assert got.where(F.col("query_id") == "q1").count() == 3
    assert got.where(F.col("query_id") == "q2").count() == 1


def test_relevance_split_and_caps(spark):
    df = spark.createDataFrame(
        [("x", float(i)) for i in range(10)], "cat string, score double"
    )
    split = R.relevance_split(df, "score", threshold=5.0)
    assert split.where("relevance = 'high'").count() == 5
    capped = R.context_caps(split, "relevance", "score", {"high": 2, "low": 3})
    assert capped.where("relevance = 'high'").count() == 2
    assert capped.where("relevance = 'low'").count() == 3


def test_group_id_validation(spark):
    import pytest

    assert R.check_group_id("tenant-A_1") == "tenant-A_1"
    for bad in ["", "has space", "a" * 65, "semi;colon", None]:
        with pytest.raises(ValueError):
            R.check_group_id(bad)
    df = spark.createDataFrame(
        [("ok-1",), ("bad id",), ("ok_2",)], "group_id string"
    )
    kept = {r["group_id"] for r in R.validate_group_ids(df).collect()}
    assert kept == {"ok-1", "ok_2"}


def test_paginate_matches_offset_limit(spark):
    df = spark.createDataFrame(
        [(i, f"n{i:03d}") for i in range(100)], "k int, name string"
    )
    got = [r["k"] for r in R.paginate(df, "name", limit=10, offset=20).collect()]
    assert got == list(range(20, 30))


def test_topic_hierarchy_and_namespace(spark):
    from vanna_financial_knowledge_graph_spark.gazetteer import ontology_rows
    from vanna_financial_knowledge_graph_spark.operators.assemble import (
        ONTOLOGY_GROUP_ID,
        ontology_topics,
    )

    rows = ontology_rows()
    by_label = {r["label"]: r for r in rows}
    # every parent_label is itself a topic, and roots have no parent
    for r in rows:
        if r["parent_label"]:
            assert r["parent_label"] in by_label
            assert by_label[r["parent_label"]]["parent_label"] is None
            assert r["parent_uuid"] == by_label[r["parent_label"]]["topic_uuid"]
    assert by_label["Inflation"]["parent_label"] == "Macroeconomics"

    onto = ontology_topics(spark)
    assert onto.count() == len(rows)
    assert {r["group_id"] for r in onto.select("group_id").distinct().collect()} == {
        ONTOLOGY_GROUP_ID
    }


def test_topic_parent_rollup(spark):
    topics = spark.createDataFrame(
        [
            ("t1", "Inflation", "", "", "p1", "Macroeconomics", "default"),
            ("t2", "GDP", "", "", "p1", "Macroeconomics", "default"),
            ("t3", "Earnings", "", "", "p2", "Corporate Finance", "default"),
            ("p1", "Macroeconomics", "", "", None, None, "default"),
        ],
        "uuid string, name string, definition string, uri string, "
        "parent_uuid string, parent_name string, group_id string",
    )
    rels = spark.createDataFrame(
        [
            ("r1", "e1", "entity", "t1", "topic", "R", "c1", "f1", "", "", "default"),
            ("r2", "e1", "entity", "t2", "topic", "R", "c1", "f2", "", "", "default"),
            ("r3", "e1", "entity", "t3", "topic", "R", "c1", "f3", "", "", "default"),
            ("r4", "e1", "entity", "p1", "topic", "R", "c1", "f4", "", "", "default"),
            ("r5", "e1", "entity", "e2", "entity", "R", "c1", "f5", "", "", "default"),
        ],
        "id string, from_uuid string, from_type string, to_uuid string, "
        "to_type string, rel_type string, chunk_uuid string, fact_id string, "
        "description string, date_context string, group_id string",
    )
    got = {
        r["root_topic"]: (r["n_fact_edges"], r["n_topics"])
        for r in R.topic_parent_rollup(topics, rels).collect()
    }
    assert got == {"Macroeconomics": (3, 3), "Corporate Finance": (1, 1)}


def test_by_uuid_point_lookups(spark, kg):
    """get_entities(uuids) / get_facts_by_uuids (queries.py:140-160 /
    :287-306): the reference's hydration calls — uuid set, tenant-filtered,
    empty set -> empty result, foreign tenant -> empty."""
    ents = kg["entities"]
    ids = [r["uuid"] for r in ents.orderBy("uuid").limit(3).collect()]
    got = {r["uuid"] for r in R.entities_by_uuids(ents, ids).collect()}
    assert got == set(ids)
    assert R.entities_by_uuids(ents, []).count() == 0
    assert R.entities_by_uuids(ents, ids, group_id="other").count() == 0
    facts = kg["facts"]
    fids = [r["uuid"] for r in facts.orderBy("uuid").limit(5).collect()]
    got2 = {r["uuid"] for r in R.facts_by_uuids(facts, fids).collect()}
    assert got2 == set(fids)
    assert R.facts_by_uuids(facts, ["missing"]).count() == 0
