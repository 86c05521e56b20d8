"""SparkSession factory with scale-oriented defaults.

Tuned for local[$SPARK_GRAFT_CPUS] in this sandbox but every knob is the one
you would set on a 1000-executor cluster: AQE (runtime coalesce + skew-join
splitting), Arrow-batched Python exchange, an explicit shuffle-partition
count, and a generous broadcast threshold so dimension/gazetteer joins never
shuffle the fact side.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "vkg-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's standard config."""
    n = cpus if cpus is not None else default_parallelism()
    sp = shuffle_partitions if shuffle_partitions is not None else max(2 * n, 8)
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        # AQE: runtime partition coalescing + skew-join splitting (hot
        # entities like AAPL/SEC produce skewed shuffle blocks; AQE splits
        # them, complementing our explicit two-phase salted aggregations).
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(sp))
        # Arrow for every pandas UDF / mapInPandas exchange.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
        # Gazetteer / canonical-map / ontology joins must broadcast.
        .config("spark.sql.autoBroadcastJoinThreshold", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("VKG_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    return builder.getOrCreate()
