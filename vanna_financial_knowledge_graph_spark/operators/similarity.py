"""Similarity search over embedding columns (array<float>).

Covers the reference's vector top-k surface (LanceDB cosine search with
threshold, storage/lancedb/indices.py:155-181; similarity = 1 - cosine
distance) Spark-first:

  * brute_force_topk — exact cosine top-k per query via a JVM-side
    zip_with/aggregate dot product + a rank window. The baseline and the
    deterministic oracle-checkable path.
  * lsh_bucketize / lsh_topk — the scale path: sign-random-projection
    buckets (SimHash over the embedding space) so candidate sets shrink from
    N to a bucket; exact re-rank inside the bucket. Deterministic seeds.

Scores are computed in double precision and exposed rounded, so DuckDB's
list_cosine_similarity agrees bit-for-bit after rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import cosine_expr


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    threshold: float = -1.0,
) -> DataFrame:
    """Exact top-k neighbors for each query vector.

    queries: (query_id, q_emb). Broadcast the (small) query side; the corpus
    side streams — no shuffle of the big table at all.
    """
    q = F.broadcast(queries.select("query_id", F.col("q_emb").alias("emb_q")))
    scored = (
        embeddings.select(F.col("vec_id"), F.col("embedding").alias("emb_c"))
        .crossJoin(q)
        .where(F.col("vec_id") != F.col("query_id"))
        .withColumn("cosine", cosine_expr("emb_c", "emb_q"))
        .where(F.col("cosine") >= threshold)
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id", "vec_id", F.round("cosine", 4).alias("cosine"), "rank"
        )
    )


def lsh_bucketize(
    embeddings: DataFrame, dim: int = 64, n_planes: int = 12, seed: int = 7
) -> DataFrame:
    """Sign-random-projection bucket per vector, JVM-side.

    Hyperplanes come from a seeded np.random.RandomState(seed) on the driver
    and are baked into the plan as literals — deterministic for a given
    seed, no RNG state on executors, identical everywhere.
    """
    import numpy as np

    rng = np.random.RandomState(seed)
    planes = rng.randn(n_planes, dim).tolist()
    bits = [
        (
            F.aggregate(
                F.zip_with(
                    F.col("embedding"),
                    F.array(*[F.lit(float(w)) for w in planes[p]]),
                    lambda x, wcol: x.cast("double") * wcol,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            >= 0
        ).cast("long")
        for p in range(n_planes)
    ]
    bucket = bits[0]
    for b in bits[1:]:
        bucket = bucket * 2 + b
    return embeddings.withColumn("bucket", bucket)


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    dim: int = 64,
    n_planes: int = 8,
    probe_hamming: int = 1,
) -> DataFrame:
    """Approximate top-k via multi-probe LSH (Lv et al., VLDB'07 shape):
    the query side probes its own bucket PLUS every bucket within
    probe_hamming bit flips — a near-neighbor that lands just across one
    hyperplane is still found, which single-probe LSH misses for points
    near a boundary (recall asserted by
    tests/test_similarity.py::test_lsh_topk_recall_planted_clusters).
    Probing multiplies only the tiny broadcast query side (x (1+n_planes)
    at hamming 1); the corpus keeps one bucket per vector and never
    rescans. At 100TB the bucket join replaces the full scan."""
    corpus_b = lsh_bucketize(embeddings, dim, n_planes)
    q_b = lsh_bucketize(
        queries.select(F.col("query_id"), F.col("q_emb").alias("embedding")),
        dim,
        n_planes,
    )
    probes = [F.col("bucket")]
    if probe_hamming >= 1:
        probes += [
            F.col("bucket").bitwiseXOR(F.lit(1 << p)) for p in range(n_planes)
        ]
    if probe_hamming >= 2:
        probes += [
            F.col("bucket").bitwiseXOR(F.lit((1 << p) | (1 << q)))
            for p in range(n_planes)
            for q in range(p + 1, n_planes)
        ]
    q_probed = q_b.select(
        F.col("query_id"),
        F.col("embedding").alias("emb_q"),
        F.explode(F.array(*probes)).alias("bucket"),
    )
    scored = (
        corpus_b.select("vec_id", F.col("embedding").alias("emb_c"), "bucket")
        .join(F.broadcast(q_probed), "bucket")
        .where(F.col("vec_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "vec_id"])
        .withColumn("cosine", cosine_expr("emb_c", "emb_q"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", F.round("cosine", 4).alias("cosine"), "rank")
    )
