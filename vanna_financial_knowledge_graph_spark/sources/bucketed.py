"""Bucketed (pre-partitioned) tables for ZERO-SHUFFLE co-located joins.

At 100 TB the dominant read-path shuffle is the fact/chunk equi-join on
chunk_uuid (and the mention/doc join on doc_uuid): both sides are corpus-
sized, so neither broadcasts, and every query pays a full exchange of the
bigger table. Bucketing both tables BY THE JOIN KEY AT WRITE TIME (Spark
`bucketBy`; on Iceberg the `bucket(N, key)` partition transform) persists a
hash-partitioned layout, and Catalyst then plans the join as a zip of
co-located buckets — `SortMergeJoin` with NO Exchange on either side
(asserted by tests/test_plans.py::test_bucketed_join_no_exchange).

The bucket count is a write-time contract: pick it once per table family
(both sides MUST agree for the zip to apply) and size it so one bucket of
the biggest table fits an executor (~at 100 TB of chunks, 2^13-2^15
buckets). Also sort WITHIN buckets by the key: the merge join then needs no
per-task sort either.

This is the batch analogue of the repartition(width, "url") the pipeline
does in memory — persisted, so EVERY downstream job inherits the
co-location instead of re-paying the exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    key: str,
    buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist df hash-bucketed (and bucket-sorted) by `key` as a saved
    table. Overwrites an existing table of the same name (including a stale
    warehouse location orphaned by a previous session — the default catalog
    is in-memory, so DROP TABLE alone cannot see it). Stale-location wipe
    handles `db.table` names (Spark lays them out as <wh>/<db>.db/<table>)
    and is attempted only for local warehouse dirs — on hdfs://s3a://
    warehouses the cleanup is the catalog service's job."""
    import os
    import shutil

    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    wh = spark.conf.get("spark.sql.warehouse.dir", "")
    if wh and "://" not in wh.removeprefix("file://"):
        parts = table_name.lower().split(".")
        rel = (
            os.path.join(f"{parts[0]}.db", parts[1])
            if len(parts) == 2
            else parts[-1]
        )
        loc = os.path.join(wh.removeprefix("file://").removeprefix("file:"), rel)
        if os.path.isdir(loc):
            shutil.rmtree(loc, ignore_errors=True)
    writer = (
        df.write.mode("overwrite").format("parquet").bucketBy(buckets, key)
    )
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table_name)


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    """Read a bucketed table back; the bucket spec rides in the catalog, so
    joins on the bucket key skip the exchange automatically."""
    return spark.table(table_name)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    key: str,
) -> DataFrame:
    """Equi-join two same-bucketed tables on their bucket key. The merge
    hint steers Catalyst away from broadcasting a small side so the plan
    demonstrates the zero-exchange bucket zip (on real 100TB inputs neither
    side would broadcast anyway)."""
    a = read_bucketed(spark, left_table).hint("merge")
    b = read_bucketed(spark, right_table)
    return a.join(b, key)
