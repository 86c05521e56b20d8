"""GraphRAG context assembly over the KG tables (reference
query/context_builder.py:59-169): union of entity / neighbor / global chunk
sources (SET1) -> per-chunk max-score dedup (A8) -> relevance split (W6) ->
per-TIER caps (W5: max_high=30, max_low=20), with topic chunks deduped and
capped SEPARATELY (max_topic=15, context_builder.py:86-112 — topic chunks
are their own category in StructuredContext, not part of the high/low
split), returned as ONE composed DataFrame — the query a reference user
actually runs per question.

Plan shape at scale: every driver of the composition (seed entity row,
neighbor uuid set, topic uuid set, query vector, candidate chunk-id set) is
dimension-sized and broadcast. The chunk-vector table — the 100TB side — is
scanned with the cosine evaluated corpus-wide exactly ONCE (the global
top-k, a TakeOrderedAndProject, never a full sort); every other score is
computed only for the hit-set∪top-k candidate rows via a broadcast
semi-style join, so the expensive aggregate-HOF cosine runs over at most a
few hundred rows outside that single pass. The final capped selection is
<= high+low+topic rows: materialize=True collects it driver-side (one job,
no checkpoint write) and releases every internal cache before returning.
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
    caches: list[DataFrame] | None = None,
) -> DataFrame:
    """-> (chunk_uuid, source, relevance, score, content) context rows.

    relevance is 'high'/'low' for entity/neighbor/global-sourced chunks
    (tier caps caps['high']/caps['low']) and 'topic' for topic-sourced
    chunks (their own dedup + caps['topic'], matching the reference's
    separate topic_chunks category).

    materialize=True (default) collects the tiny capped selection to the
    driver (one job) and RELEASES the internal caches before returning —
    the right mode for a long-lived session answering many questions.
    materialize=False returns the fully lazy plan (for composition or plan
    inspection); the internal cached branches stay alive and the CALLER
    owns their lifetime — pass `caches=[]` to receive the cached DataFrames
    and unpersist them when done (without the handle the only release path
    is spark.catalog.clearCache())."""
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
    # seed_edges is SEED-SIZED (one entity's incident edges) but feeds
    # several consumers below (entity source, neighbor ranking, seed topics)
    # — cache it once so the edge table is not re-scanned per consumer.
    e_from = r.join(F.broadcast(seed), r["from_uuid"] == F.col("euuid")).withColumn(
        "dir", F.lit("from")
    )
    e_to = r.join(F.broadcast(seed), r["to_uuid"] == F.col("euuid")).withColumn(
        "dir", F.lit("to")
    )
    # cache, not localCheckpoint: same scan-once property for the plan's
    # many consumers, but materialization happens inside the main action
    # instead of as a separate checkpoint job
    seed_edges = (
        e_from.unionByName(e_to)
        .select("from_uuid", "to_uuid", "to_type", "chunk_uuid", "euuid", "dir")
        .cache()
    )
    internal_caches = [seed_edges]

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
    # a neighbor's chunks come from edges where the neighbor is EITHER
    # endpoint — the reference fetches per-neighbor chunks via the full J2
    # OR-join (researcher.py:732-769 -> queries.py:460-502); matching only
    # from_uuid would silently drop chunks where the neighbor is the object
    src_neighbor = (
        r.join(F.broadcast(neighbors), r["from_uuid"] == F.col("nuuid"))
        .select("chunk_uuid")
        .union(
            r.join(F.broadcast(neighbors), r["to_uuid"] == F.col("nuuid")).select(
                "chunk_uuid"
            )
        )
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

    # global semantic source: top-k chunks by cosine vs the query vector.
    # This is the ONE corpus-wide cosine pass — a TakeOrderedAndProject, so
    # only k rows survive it; the result (k rows) is cached because it feeds
    # both the source union and the candidate hit set below.
    q_emb = F.array(*[F.lit(x) for x in embed_text(query_text, EMBED_DIM)])
    chunk_vecs = vectors.where(
        (F.col("kind") == "chunk") & (F.col("group_id") == group_id)
    ).select(F.col("uuid").alias("chunk_uuid"), "embedding")
    src_global = (
        chunk_vecs.withColumn("emb_q", q_emb)
        .withColumn("score", cosine_expr("embedding", "emb_q"))
        .orderBy(F.desc("score"), "chunk_uuid")
        .limit(caps.get("global", 10))
        .select("chunk_uuid")
        .withColumn("source", F.lit("global"))
        .cache()
    )
    internal_caches.append(src_global)

    # SET1 union of NON-TOPIC sources (reference: all_chunks = entity +
    # neighbor + global, context_builder.py:87-89)
    all_src = src_entity.unionByName(src_neighbor).unionByName(src_global)

    # score ONLY the candidate hit set (entity ∪ neighbor ∪ global ∪ topic
    # chunk ids — a few hundred rows at most): broadcast the id set against
    # the chunk-vector table and evaluate the cosine post-join, so the
    # expensive expression never runs corpus-wide here
    hit_ids = (
        all_src.select("chunk_uuid")
        .union(src_topic.select("chunk_uuid"))
        .distinct()
    )
    scored_hits = (
        chunk_vecs.join(F.broadcast(hit_ids), "chunk_uuid")
        .withColumn("emb_q", q_emb)
        .withColumn("score", cosine_expr("embedding", "emb_q"))
        .select("chunk_uuid", "score")
        .cache()
    )
    internal_caches.append(scored_hits)

    scored = all_src.join(scored_hits, "chunk_uuid")

    # A8: one row per chunk, max score (source tie broken deterministically)
    deduped = dedup_max_score(scored, "chunk_uuid", "score")
    # W6 relevance split + W5 per-TIER caps (high[:max_high], low[:max_low])
    split = relevance_split(deduped, "score", threshold=relevance_threshold)
    capped = context_caps(
        split, "relevance", "score", {"high": caps.get("high", 30), "low": caps.get("low", 20)}
    )

    # topic chunks: separate dedup + cap (context_builder.py:98-100); tagged
    # relevance='topic' — their own category, never in the high/low split
    topic_scored = src_topic.join(scored_hits, "chunk_uuid")
    topic_capped = (
        dedup_max_score(topic_scored, "chunk_uuid", "score")
        .orderBy(F.desc("score"), "chunk_uuid")
        .limit(caps.get("topic", 15))
        .withColumn("relevance", F.lit("topic"))
    )

    # a chunk already admitted via the high/low tiers wins over its topic
    # copy (global uniqueness of chunk_uuid in the final context; documented
    # divergence from the reference, which lists topic_chunks separately and
    # CAN repeat a chunk_id across categories — see COVERAGE.md)
    topic_only = topic_capped.join(
        capped.select("chunk_uuid"), "chunk_uuid", "left_anti"
    )
    final = capped.unionByName(topic_only)
    if materialize:
        # the selection is <= high+low+topic rows: collect it driver-side
        # (ONE job, no checkpoint write) and release every internal cache —
        # a long-lived session answers many questions, and each distinct
        # (entity, query) pair would otherwise pin caches forever
        rows = final.collect()
        schema = final.schema
        for c in internal_caches:
            c.unpersist()
        final = spark.createDataFrame(rows, schema)
    elif caches is not None:
        caches.extend(internal_caches)

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
