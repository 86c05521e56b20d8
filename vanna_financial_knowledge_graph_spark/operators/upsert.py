"""MERGE-style table update sink (SURVEY S6).

The reference rewrites rows in place (update_entity_summary,
storage/parquet/backend.py:499-553). Spark-first that is `MERGE INTO target
USING updates ON key WHEN MATCHED THEN UPDATE * WHEN NOT MATCHED THEN
INSERT *` on the Iceberg table; in this repo (plain parquet dirs standing in
for Iceberg) the identical logical result is computed relationally —
anti-join out the matched keys, union the update rows — and committed as an
atomic rewrite.

Scale notes: one shuffle keyed by the merge key. When `updates` is
dimension-sized (the common incremental-crawl case: today's recrawled urls
vs the full corpus), broadcast it so the 100TB target never moves; the
left_anti below lets Catalyst/AQE pick that automatically once the update
side is under the broadcast threshold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame, updates: DataFrame, keys: list[str]
) -> DataFrame:
    """Row-level upsert: matched keys take the update row wholly; unmatched
    update rows insert; everything else passes through unchanged."""
    kept = target.join(
        updates.select(*keys).distinct(), keys, "left_anti"
    )
    return kept.unionByName(updates.select(*target.columns))


def upsert_parquet(
    spark: SparkSession, path: str, updates: DataFrame, keys: list[str]
) -> DataFrame:
    """Apply merge_upsert to a materialized table in place (the parquet
    stand-in for `MERGE INTO` on Iceberg). localCheckpoint materializes the
    merged rows BEFORE the overwrite so the write never reads the files it
    is replacing."""
    target = spark.read.parquet(path)
    merged = merge_upsert(target, updates, keys).localCheckpoint(eager=True)
    merged.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def update_entity_summaries(
    entities: DataFrame, new_summaries: DataFrame
) -> DataFrame:
    """The reference's update_entity_summary (backend.py:499-553) as a
    column-level merge: rows in new_summaries(uuid, summary) overwrite the
    summary of matching entities; all other columns/rows unchanged."""
    u = F.broadcast(
        new_summaries.select("uuid", F.col("summary").alias("_new_summary"))
    )
    return (
        entities.join(u, "uuid", "left")
        .withColumn("summary", F.coalesce("_new_summary", "summary"))
        .drop("_new_summary")
    )
