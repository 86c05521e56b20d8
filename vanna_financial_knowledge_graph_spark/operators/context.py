"""GraphRAG context assembly over the KG tables (reference
query/context_builder.py:59-169): union of entity / neighbor / global chunk
sources (SET1) -> per-chunk max-score dedup (A8) -> relevance split (W6) ->
per-TIER caps (W5: max_high=30, max_low=20), with topic chunks deduped and
capped SEPARATELY (max_topic=15, context_builder.py:86-112 — topic chunks
are their own category in StructuredContext, not part of the high/low
split), returned as ONE composed DataFrame — the query a reference user
actually runs per question.

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

# reference ContextBuilder defaults (context_builder.py:36-41): high/low are
# RELEVANCE-tier caps applied after the cross-source dedup; topic is its own
# separately-deduped category; global is the vector-search fetch size.
DEFAULT_CAPS = {"high": 30, "low": 20, "topic": 15, "global": 10}


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
    materialize: bool = True,
) -> DataFrame:
    """-> (chunk_uuid, source, relevance, score, content) context rows.

    relevance is 'high'/'low' for entity/neighbor/global-sourced chunks
    (tier caps caps['high']/caps['low']) and 'topic' for topic-sourced
    chunks (their own dedup + caps['topic'], matching the reference's
    separate topic_chunks category).

    materialize=True (default) eagerly computes the tiny capped selection
    and RELEASES the internal caches before returning — the right mode for
    a long-lived session answering many questions. materialize=False
    returns the fully lazy plan (for composition or plan inspection); the
    shared seed-edge/chunk-score branches stay cached and the CALLER owns
    their lifetime."""
    caps = caps or DEFAULT_CAPS
    unknown = set(caps) - set(DEFAULT_CAPS)
    if unknown:
        raise ValueError(
            f"build_context: unknown caps keys {sorted(unknown)} — expected "
            f"a subset of {sorted(DEFAULT_CAPS)} (per-source caps were "
            "replaced by reference relevance-TIER caps in round 3)"
        )

    seed = entities.where(
        (F.lower(F.col("name")) == entity_name.lower())
        & (F.col("group_id") == group_id)
    ).select(F.col("uuid").alias("euuid"))
    r = relationships.where(F.col("group_id") == group_id)

    # J2 union rewrite: edges touching the seed from either endpoint.
    # seed_edges is SEED-SIZED (one entity's incident edges) but feeds FIVE
    # consumers below (entity source, both neighbor directions, seed topics)
    # — materialize it once so the edge table (the 100TB side) is scanned
    # exactly twice in the whole plan (here + src_neighbor/src_topic below)
    # instead of once per consumer.
    e_from = r.join(F.broadcast(seed), r["from_uuid"] == F.col("euuid")).withColumn(
        "dir", F.lit("from")
    )
    e_to = r.join(F.broadcast(seed), r["to_uuid"] == F.col("euuid")).withColumn(
        "dir", F.lit("to")
    )
    # cache, not localCheckpoint: same scan-once property for the plan's
    # many consumers, but materialization happens inside the main action
    # instead of as a separate checkpoint job (measured ~2x less first-call
    # latency; steady-state identical)
    seed_edges = (
        e_from.unionByName(e_to)
        .select("from_uuid", "to_uuid", "to_type", "chunk_uuid", "euuid", "dir")
        .cache()
    )

    src_entity = (
        seed_edges.select("chunk_uuid")
        .distinct()
        .withColumn("source", F.lit("entity"))
    )

    # top-k neighbor entities by connection count (A2/W3), then THEIR chunks
    neighbors = (
        seed_edges.where(
            (F.col("dir") == "from")
            & (F.col("to_type") == "entity")
            & (F.col("to_uuid") != F.col("euuid"))
        )
        .select(F.col("to_uuid").alias("nuuid"))
        .union(
            seed_edges.where(
                (F.col("dir") == "to") & (F.col("from_uuid") != F.col("euuid"))
            ).select(F.col("from_uuid").alias("nuuid"))
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
        seed_edges.where((F.col("dir") == "from") & (F.col("to_type") == "topic"))
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
    # scored once, consumed three times (global top-k + non-topic scoring +
    # topic scoring): cache materializes the per-chunk scores so the cosine
    # over the full chunk-vector table runs once in the final plan
    scored_vecs = (
        chunk_vecs.withColumn("emb_q", q_emb)
        .withColumn("score", cosine_expr("embedding", "emb_q"))
        .select("chunk_uuid", "score")
        .cache()
    )
    src_global = (
        scored_vecs.orderBy(F.desc("score"), "chunk_uuid")
        .limit(caps.get("global", 10))
        .select("chunk_uuid")
        .withColumn("source", F.lit("global"))
    )

    # SET1 union of NON-TOPIC sources (reference: all_chunks = entity +
    # neighbor + global, context_builder.py:87-89), scored per (chunk, source)
    all_src = src_entity.unionByName(src_neighbor).unionByName(src_global)
    scored = all_src.join(scored_vecs.select("chunk_uuid", "score"), "chunk_uuid")

    # A8: one row per chunk, max score (source tie broken deterministically)
    deduped = dedup_max_score(scored, "chunk_uuid", "score")
    # W6 relevance split + W5 per-TIER caps (high[:max_high], low[:max_low])
    split = relevance_split(deduped, "score", threshold=relevance_threshold)
    capped = context_caps(
        split, "relevance", "score", {"high": caps.get("high", 30), "low": caps.get("low", 20)}
    )

    # topic chunks: separate dedup + cap (context_builder.py:98-100); tagged
    # relevance='topic' — their own category, never in the high/low split
    topic_scored = src_topic.join(
        scored_vecs.select("chunk_uuid", "score"), "chunk_uuid"
    )
    topic_capped = (
        dedup_max_score(topic_scored, "chunk_uuid", "score")
        .orderBy(F.desc("score"), "chunk_uuid")
        .limit(caps.get("topic", 15))
        .withColumn("relevance", F.lit("topic"))
    )

    # a chunk already admitted via the high/low tiers wins over its topic
    # copy (global uniqueness of chunk_uuid in the final context)
    topic_only = topic_capped.join(
        capped.select("chunk_uuid"), "chunk_uuid", "left_anti"
    )
    # eagerly materialize the (tiny: <= high+low+topic rows) selection, then
    # RELEASE the two cached branches — a long-lived session answers many
    # questions, and each distinct (entity, query) pair would otherwise pin
    # a fresh corpus-sized score cache in executor storage forever
    final = capped.unionByName(topic_only)
    if materialize:
        final = final.localCheckpoint(eager=True)
        seed_edges.unpersist()
        scored_vecs.unpersist()

    return (
        final.join(
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
