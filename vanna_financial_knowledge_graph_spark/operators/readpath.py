"""Read-path query catalog over the materialized graph tables.

Spark SQL re-expression of the reference's DuckDB query layer
(vanna_kg/storage/duckdb/queries.py) and MCP command layer — the operators a
user of the reference runs today:

  * J2  entity 1-hop chunks (queries.py:460-502): the reference's OR-join
        `ON (r.from_uuid = e.uuid OR r.to_uuid = e.uuid)` would make Catalyst
        pick a BroadcastNestedLoopJoin; rewritten as a UNION of two
        equi-joins + dropDuplicates (SURVEY.md §2.3 J2).
  * J3  2-hop neighbor counts (queries.py:504-547).
  * J4  topic 1-hop chunks (queries.py:549-592).
  * J5/J6 around/between fact search (queries.py:328-435) incl. the
        date-ordered top-N (W1).
  * A1  per-table stats (queries.py:639-669).
  * W2  pagination, W4 vector-style top-k, A8 max-score dedup,
        W5/W6 context caps + relevance split (query/context_builder.py).

Every function takes DataFrames and returns a DataFrame; group_id filtering
(P1) is a partition-prunable predicate pushed to the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# P8: tenant/group ids must be short, url-safe tokens (the reference
# validates group_id format before any query touches storage)
GROUP_ID_PATTERN = "^[A-Za-z0-9_-]{1,64}$"


def validate_group_ids(df: DataFrame, col: str = "group_id") -> DataFrame:
    """P8 guard: keep only rows whose group_id matches the format rule —
    a codegen-friendly rlike predicate, pushed to the scan."""
    return df.where(F.col(col).rlike(GROUP_ID_PATTERN))


def check_group_id(group_id: str) -> str:
    """Driver-side P8 validation for user-supplied tenant ids."""
    import re

    if not re.match(GROUP_ID_PATTERN, group_id or ""):
        raise ValueError(
            f"invalid group_id {group_id!r}: must match {GROUP_ID_PATTERN}"
        )
    return group_id


def entity_one_hop_chunks(
    entities: DataFrame,
    relationships: DataFrame,
    chunks: DataFrame,
    entity_name: str,
    group_id: str = "default",
    documents: DataFrame | None = None,
) -> DataFrame:
    """Chunks mentioning an entity via graph edges (J2 union rewrite).

    When `documents` is given, each chunk row carries its document name via
    LEFT JOIN — the reference's J2 selects d.name alongside the chunk
    (queries.py:477-485). The join key is doc_uuid (equi, dimension-side
    broadcastable at query scale); missing docs leave doc_name null, as a
    LEFT JOIN should."""
    e = entities.where(
        (F.lower(F.col("name")) == entity_name.lower())
        & (F.col("group_id") == group_id)
    ).select(F.col("uuid").alias("euuid"))
    r = relationships.where(F.col("group_id") == group_id)
    hits_from = r.join(F.broadcast(e), r["from_uuid"] == F.col("euuid")).select(
        "chunk_uuid"
    )
    hits_to = r.join(F.broadcast(e), r["to_uuid"] == F.col("euuid")).select(
        "chunk_uuid"
    )
    hit_chunks = hits_from.union(hits_to).distinct()
    cols = ["chunk_uuid", "content", "header_path", "document_date", "url"]
    out = (
        chunks.where(F.col("group_id") == group_id)
        .join(hit_chunks, "chunk_uuid")
        .select(*cols, *(["doc_uuid"] if documents is not None else []))
        .dropDuplicates(["chunk_uuid"])
    )
    if documents is not None:
        d = documents.where(F.col("group_id") == group_id).select(
            "doc_uuid", "doc_name"
        )
        out = out.join(d, "doc_uuid", "left").drop("doc_uuid")
    return out


def two_hop_neighbors(
    entities: DataFrame,
    relationships: DataFrame,
    entity_name: str,
    top_k: int = 10,
    group_id: str = "default",
) -> DataFrame:
    """Neighbor entities ranked by connection count (J3 + A2 + W3)."""
    e = entities.where(
        (F.lower(F.col("name")) == entity_name.lower())
        & (F.col("group_id") == group_id)
    ).select(F.col("uuid").alias("euuid"))
    r = relationships.where(
        (F.col("group_id") == group_id) & (F.col("to_type") == "entity")
    )
    neigh = (
        r.join(F.broadcast(e), r["from_uuid"] == F.col("euuid"))
        .where(F.col("to_uuid") != F.col("euuid"))
        .join(
            entities.select(
                F.col("uuid").alias("to_uuid"),
                F.col("name").alias("neighbor_name"),
                F.col("summary").alias("neighbor_summary"),
                F.col("entity_type").alias("neighbor_type"),
            ),
            "to_uuid",
        )
        .groupBy("neighbor_name", "neighbor_summary", "neighbor_type")
        .agg(F.count(F.lit(1)).alias("connection_count"))
        .orderBy(F.desc("connection_count"), "neighbor_name")
        .limit(top_k)
    )
    return neigh


def facts_for_entities(
    facts: DataFrame,
    entity_names: list[str],
    mode: str = "around",
    limit: int = 50,
    group_id: str = "default",
    chunks: DataFrame | None = None,
    date_from: str | None = None,
    date_to: str | None = None,
) -> DataFrame:
    """Wide-net fact lookup (J5/J6): mode 'around' = subject OR object in the
    name set; 'between' = both endpoints in the set.

    When `chunks` is given, each fact LEFT JOINs its chunk for
    document_date, optional date_from/date_to filter on it, and the top-N is
    ordered by document_date DESC NULLS LAST — exactly the reference's
    get_facts_by_entities date path (queries.py:395-430: the date predicate
    sits on the left-joined chunk column, so undated facts drop when a date
    bound is set). Without `chunks` the order falls back to the fact's own
    date_context (queries.py:356-358). The chunk side is projected to
    (chunk_uuid, document_date) before the join — at scale a
    dimension-vs-fact equi-join that bucketing co-locates.

    Output columns are the fact columns only (reference SELECT f.*)."""
    if (date_from or date_to) and chunks is None:
        raise ValueError(
            "facts_for_entities: date_from/date_to need the chunks table "
            "(document_date lives on the chunk, queries.py:412-417)"
        )
    names = [n.lower() for n in entity_names]
    f = facts.where(F.col("group_id") == group_id)
    subj_in = F.lower(F.col("subject_name")).isin(names)
    obj_in = F.lower(F.col("object_name")).isin(names)
    cond = (subj_in | obj_in) if mode == "around" else (subj_in & obj_in)
    f = f.where(cond)
    if chunks is None:
        return f.orderBy(F.desc_nulls_last("date_context"), "uuid").limit(limit)
    fact_cols = f.columns
    c = chunks.where(F.col("group_id") == group_id).select(
        F.col("chunk_uuid").alias("__cuuid"),
        F.col("document_date").alias("__doc_date"),
    )
    j = f.join(c, f["chunk_uuid"] == F.col("__cuuid"), "left")
    if date_from is not None:
        j = j.where(F.col("__doc_date") >= date_from)
    if date_to is not None:
        j = j.where(F.col("__doc_date") <= date_to)
    return (
        j.orderBy(F.desc_nulls_last("__doc_date"), "uuid")
        .limit(limit)
        .select(*fact_cols)
    )


def topic_one_hop_chunks(
    topics: DataFrame,
    relationships: DataFrame,
    chunks: DataFrame,
    topic_name: str,
    group_id: str = "default",
) -> DataFrame:
    """Chunks attached to a topic (J4); the topic lookup is the
    topics_by_names point lookup (queries.py:594-625)."""
    t = topics_by_names(topics, [topic_name], group_id).select(
        F.col("uuid").alias("tuuid")
    )
    r = relationships.where(
        (F.col("group_id") == group_id) & (F.col("to_type") == "topic")
    )
    hit = r.join(F.broadcast(t), r["to_uuid"] == F.col("tuuid")).select("chunk_uuid")
    return (
        chunks.where(F.col("group_id") == group_id)
        .join(hit.distinct(), "chunk_uuid")
        .select("chunk_uuid", "content", "header_path", "document_date")
        .dropDuplicates(["chunk_uuid"])
    )


def topics_by_names(
    topics: DataFrame, names: list[str], group_id: str = "default"
) -> DataFrame:
    """Point lookup: topics by case-insensitive name set
    (queries.py:594-625). A P3 IN-list over the topic dimension — at scale
    this is a pushable isin filter on a broadcastable table."""
    lower_names = [n.lower() for n in names]
    cols = [
        c for c in ("uuid", "name", "definition", "parent_name")
        if c in topics.columns
    ]
    return topics.where(
        F.lower(F.col("name")).isin(lower_names) & (F.col("group_id") == group_id)
    ).select(*cols)


def entities_by_uuids(
    entities: DataFrame, uuids: list[str], group_id: str = "default"
) -> DataFrame:
    """Point lookup: entity rows by uuid set — the reference's most-called
    enrichment shape, get_entities(uuids) (queries.py:140-160): search
    returns uuids, this hydrates them (J7). The isin predicate pushes to
    the parquet scan; on a uuid-bucketed table it prunes to the matching
    buckets, and at 100 TB it is a broadcast-hash semi-join against a
    literal set, never a shuffle."""
    return entities.where(
        F.col("uuid").isin(uuids) & (F.col("group_id") == group_id)
    )


def facts_by_uuids(
    facts: DataFrame, uuids: list[str], group_id: str = "default"
) -> DataFrame:
    """Point lookup: fact rows by uuid set (get_facts_by_uuids,
    queries.py:287-306) — hydrates fact-search hits into full rows. Same
    pushdown/bucket-pruning shape as entities_by_uuids."""
    return facts.where(
        F.col("uuid").isin(uuids) & (F.col("group_id") == group_id)
    )


def chunks_by_uuids(
    chunks: DataFrame, uuids: list[str], group_id: str = "default"
) -> DataFrame:
    """Point lookup: chunks by uuid set (queries.py:290-306 shape for
    facts/chunks). The isin predicate pushes to the parquet scan; on a
    chunk_uuid-bucketed table this prunes to the matching buckets."""
    return chunks.where(
        F.col("chunk_uuid").isin(uuids) & (F.col("group_id") == group_id)
    )


def topic_parent_rollup(
    topics: DataFrame, relationships: DataFrame, group_id: str = "default"
) -> DataFrame:
    """Hierarchical aggregation over the topic ontology: fact-edge counts
    per ROOT topic (children roll up to their parent_name; roots stand for
    themselves). The topic dimension broadcasts; only edges shuffle —
    by root key, a handful of groups."""
    t = topics.where(F.col("group_id") == group_id).select(
        F.col("uuid").alias("tuuid"),
        F.coalesce("parent_name", "name").alias("root_topic"),
    )
    r = relationships.where(
        (F.col("group_id") == group_id) & (F.col("to_type") == "topic")
    )
    return (
        r.join(F.broadcast(t), r["to_uuid"] == F.col("tuuid"))
        .groupBy("root_topic")
        .agg(
            F.count(F.lit(1)).alias("n_fact_edges"),
            F.countDistinct("tuuid").alias("n_topics"),
        )
        .orderBy(F.desc("n_fact_edges"), "root_topic")
    )


def kg_stats(tables: dict[str, DataFrame], group_id: str = "default") -> DataFrame:
    """Per-table row counts (A1, queries.py:639-669)."""
    parts = []
    for name, df in tables.items():
        filtered = (
            df.where(F.col("group_id") == group_id) if "group_id" in df.columns else df
        )
        parts.append(
            filtered.groupBy().agg(F.count(F.lit(1)).alias("n")).select(
                F.lit(name).alias("table_name"), F.col("n").alias("row_count")
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def paginate(df: DataFrame, order_col: str, limit: int, offset: int) -> DataFrame:
    """ORDER BY ... LIMIT ? OFFSET ? (W2).

    Expressed as orderBy().offset().limit() so Catalyst plans a distributed
    TakeOrderedAndProject (per-partition top-(offset+limit) then a driver
    merge of tiny heads) — NOT a row_number window with no partitionBy,
    which would shuffle the whole table onto a single task."""
    order = [F.col(order_col), *[F.col(c) for c in df.columns if c != order_col]]
    return df.orderBy(*order).offset(offset).limit(limit)


def dedup_max_score(df: DataFrame, key: str, score: str) -> DataFrame:
    """Keep the max-score row per key (A8, context_builder.py:114-146)."""
    w = Window.partitionBy(key).orderBy(F.desc(score), *df.columns)
    return df.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")


def topk_per_query(
    scored: DataFrame, query_col: str, score_col: str, k: int
) -> DataFrame:
    """Vector-search style per-query top-k (W4) via a rank window."""
    w = Window.partitionBy(query_col).orderBy(F.desc(score_col))
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .drop("_rk")
    )


def relevance_split(df: DataFrame, score_col: str, threshold: float = 0.45) -> DataFrame:
    """high/low relevance partition (W6, context_builder.py:148-169)."""
    return df.withColumn(
        "relevance",
        F.when(F.col(score_col) >= threshold, F.lit("high")).otherwise(F.lit("low")),
    )


def context_caps(
    df: DataFrame,
    category_col: str,
    score_col: str,
    caps: dict[str, int],
) -> DataFrame:
    """Per-category score-sorted caps (W5, context_builder.py:86-112;
    defaults max_high=30 max_facts=40 max_topic=15 max_low=20). Remaining
    columns break score ties so the capped set is deterministic."""
    w = Window.partitionBy(category_col).orderBy(
        F.desc(score_col),
        *[F.col(c) for c in df.columns if c not in (category_col, score_col)],
    )
    cap_expr = F.coalesce(
        *[
            F.when(F.col(category_col) == c, F.lit(n))
            for c, n in caps.items()
        ],
        F.lit(0),
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= cap_expr)
        .drop("_rk")
    )
