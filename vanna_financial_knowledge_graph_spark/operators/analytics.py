"""Event-log analytics operators for web-scale pipelines (beyond-reference
surface, oracle-checked against DuckDB).

A crawl/training-data platform's event stream (clicks, fetches, errors)
needs the classic log-analytics shapes alongside the KG read path:
sessionization (gap-based), hierarchical rollups, exact quantiles, and
JSON property extraction. All four are pure DataFrame/SQL compositions —
one shuffle each, no UDFs, fully codegen'd.

Scale notes (100 TB of events): sessionize shuffles once on user_id and
every window runs inside that partition — skew only if one user dominates
(bound it upstream); rollup is a single hash aggregate (Spark plans ROLLUP
as one Expand + one shuffle); percentiles use the exact `percentile`
aggregate (map-side partial, one shuffle); JSON extraction is a narrow map
(get_json_object codegen) — never a Python UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization: per user, a new session starts when the
    gap to the previous event exceeds `gap_minutes`. Returns one row per
    session: (user_id, session_seq, session_start, session_end, n_events,
    duration_sec). The classic lag -> boundary-flag -> cumulative-sum
    composition.

    ONE data shuffle: the lag/cumsum windows exchange on user_id, and the
    per-(user_id, session_seq) aggregate reuses that partitioning — Spark's
    ClusteredDistribution is satisfied by hash partitioning on a SUBSET of
    the grouping keys, so no second exchange (plan-asserted by
    tests/test_plans.py::test_sessionize_single_data_shuffle). The only
    other exchange in the plan is the presentation orderBy."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # ts may be TIMESTAMP_NTZ (parquet): cast through timestamp (session tz
    # is UTC) to get epoch seconds
    epoch = F.col("ts").cast("timestamp").cast("long")
    prev = F.lag(epoch, 1).over(w)
    boundary = F.when(
        prev.isNull() | (epoch - prev > gap_minutes * 60), F.lit(1)
    ).otherwise(F.lit(0))
    sessions = events.withColumn("_new", boundary).withColumn(
        "session_seq", F.sum("_new").over(w)
    )
    return (
        sessions.groupBy("user_id", "session_seq")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            (
                F.max(F.col("ts").cast("timestamp").cast("long"))
                - F.min(F.col("ts").cast("timestamp").cast("long"))
            ).alias("duration_sec"),
        )
        .orderBy("user_id", "session_seq")
    )


def rollup_event_counts(events: DataFrame) -> DataFrame:
    """Hierarchical ROLLUP over (event_type, day): per-(type, day) counts,
    per-type subtotals, and the grand total in ONE aggregate — Spark plans
    this as a single Expand + hash aggregate, not three passes."""
    with_day = events.withColumn(
        "day", F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd")
    )
    return (
        with_day.rollup("event_type", "day")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .orderBy(
            F.col("event_type").asc_nulls_first(), F.col("day").asc_nulls_first()
        )
    )


def percentile_summary(events: DataFrame) -> DataFrame:
    """Exact interpolated percentiles per event_type (p50/p95 of value) via
    the `percentile` aggregate — map-side partials, one shuffle. (At
    10^12 rows swap for approx_percentile and drop the oracle: the exact
    aggregate holds per-group values; the approximate one holds a bounded
    sketch.)"""
    return (
        events.groupBy("event_type")
        .agg(
            F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(value, 0.95)"), 4).alias("p95"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("event_type")
    )


def distinct_user_sketch(events: DataFrame, rsd: float = 0.02) -> DataFrame:
    """HyperLogLog++ distinct-user counts per event_type alongside the
    exact count — the sketch is THE 100TB path (bounded memory per group,
    map-side mergeable; the exact distinct shuffles every distinct value).
    rsd = target relative standard deviation. Error bound asserted in
    tests/test_analytics.py::test_hll_sketch_within_rsd."""
    return (
        events.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=rsd).alias("approx_users"),
            F.countDistinct("user_id").alias("exact_users"),
        )
        .orderBy("event_type")
    )


def json_props_extract(events: DataFrame) -> DataFrame:
    """JSON property extraction (F8 surface over raw logs): pull props.k
    with get_json_object (codegen'd path expression, no UDF), bucket it,
    aggregate."""
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (
        events.withColumn("k_bucket", F.floor(k / 10).cast("int"))
        .groupBy("k_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg("value"), 4).alias("avg_value"),
        )
        .orderBy("k_bucket")
    )
