"""GraphRAG context assembly over the KG tables (reference
query/context_builder.py:59-169): union of entity / neighbor / topic /
global chunk sources (SET1) -> per-chunk max-score dedup (A8) -> relevance
split (W6) -> per-source caps (W5), returned as ONE composed DataFrame — the
query a reference user actually runs per question.

Plan shape at scale: every driver of the composition (seed entity row,
neighbor uuid set, topic uuid set, query vector) is dimension-sized and
broadcast; the chunk table — the 100TB side — is scanned once for scoring
and joined only against broadcast hit sets. The global source is a
TakeOrderedAndProject top-k, not a full sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.embedding import EMBED_DIM, embed_text
from .dedup import cosine_expr
from .readpath import context_caps, dedup_max_score, relevance_split

DEFAULT_CAPS = {"entity": 30, "neighbor": 20, "topic": 15, "global": 10}


def build_context(
    spark: SparkSession,
    entities: DataFrame,
    relationships: DataFrame,
    chunks: DataFrame,
    vectors: DataFrame,
    entity_name: str,
    query_text: str,
    k_neighbors: int = 5,
    caps: dict[str, int] | None = None,
    relevance_threshold: float = 0.2,
    group_id: str = "default",
) -> DataFrame:
    """-> (chunk_uuid, source, relevance, score, content) context rows."""
    caps = caps or DEFAULT_CAPS

    seed = entities.where(
        (F.lower(F.col("name")) == entity_name.lower())
        & (F.col("group_id") == group_id)
    ).select(F.col("uuid").alias("euuid"))
    r = relationships.where(F.col("group_id") == group_id)

    # J2 union rewrite: edges touching the seed from either endpoint
    e_from = r.join(F.broadcast(seed), r["from_uuid"] == F.col("euuid"))
    e_to = r.join(F.broadcast(seed), r["to_uuid"] == F.col("euuid"))

    src_entity = (
        e_from.select("chunk_uuid")
        .union(e_to.select("chunk_uuid"))
        .distinct()
        .withColumn("source", F.lit("entity"))
    )

    # top-k neighbor entities by connection count (A2/W3), then THEIR chunks
    neighbors = (
        e_from.where(
            (F.col("to_type") == "entity") & (F.col("to_uuid") != F.col("euuid"))
        )
        .select(F.col("to_uuid").alias("nuuid"))
        .union(
            e_to.where(F.col("from_uuid") != F.col("euuid")).select(
                F.col("from_uuid").alias("nuuid")
            )
        )
        .groupBy("nuuid")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "nuuid")
        .limit(k_neighbors)
        .select("nuuid")
    )
    src_neighbor = (
        r.join(F.broadcast(neighbors), r["from_uuid"] == F.col("nuuid"))
        .select("chunk_uuid")
        .distinct()
        .withColumn("source", F.lit("neighbor"))
    )

    # topics the seed entity co-occurs with -> chunks attached to those topics
    seed_topics = (
        e_from.where(F.col("to_type") == "topic")
        .select(F.col("to_uuid").alias("tuuid"))
        .distinct()
    )
    src_topic = (
        r.where(F.col("to_type") == "topic")
        .join(F.broadcast(seed_topics), r["to_uuid"] == F.col("tuuid"))
        .select("chunk_uuid")
        .distinct()
        .withColumn("source", F.lit("topic"))
    )

    # global semantic source: top-k chunks by cosine vs the query vector
    q_emb = F.array(*[F.lit(x) for x in embed_text(query_text, EMBED_DIM)])
    chunk_vecs = vectors.where(
        (F.col("kind") == "chunk") & (F.col("group_id") == group_id)
    ).select(F.col("uuid").alias("chunk_uuid"), "embedding")
    # scored once, consumed twice (global top-k + union-source scoring):
    # localCheckpoint materializes the per-chunk scores so the cosine over
    # the full chunk-vector table doesn't run twice in the final plan
    scored_vecs = (
        chunk_vecs.withColumn("emb_q", q_emb)
        .withColumn("score", cosine_expr("embedding", "emb_q"))
        .select("chunk_uuid", "score")
        .localCheckpoint(eager=False)
    )
    src_global = (
        scored_vecs.orderBy(F.desc("score"), "chunk_uuid")
        .limit(caps.get("global", 10))
        .select("chunk_uuid")
        .withColumn("source", F.lit("global"))
    )

    # SET1 union of sources, scored once per (chunk, source)
    all_src = (
        src_entity.unionByName(src_neighbor)
        .unionByName(src_topic)
        .unionByName(src_global)
    )
    scored = all_src.join(scored_vecs.select("chunk_uuid", "score"), "chunk_uuid")

    # A8: one row per chunk, max score (source tie broken deterministically)
    deduped = dedup_max_score(scored, "chunk_uuid", "score")
    # W6 relevance split + W5 per-source caps
    split = relevance_split(deduped, "score", threshold=relevance_threshold)
    capped = context_caps(split, "source", "score", caps)

    return (
        capped.join(
            chunks.where(F.col("group_id") == group_id).select(
                "chunk_uuid", "content"
            ),
            "chunk_uuid",
        )
        .select(
            "chunk_uuid",
            "source",
            "relevance",
            F.round("score", 4).alias("score"),
            "content",
        )
        .orderBy(F.desc("score"), "chunk_uuid")
    )
