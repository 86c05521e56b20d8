"""Temporal joins (SURVEY §2.3 J11 — previously n/a, added round 5 as a
first-class training-pipeline operator).

`asof_join` is the distributed as-of (a.k.a. temporal / point-in-time)
join: each left row picks the most recent right row for the same key at or
before its timestamp. The classic single-node form (pandas merge_asof,
DuckDB ASOF JOIN) sorts both sides; the Spark-first form here is the
union-tag + running-last formulation:

  * both sides union into one keyed stream, right rows tagged to sort
    BEFORE left rows at equal timestamps (inclusive match),
  * ONE hash shuffle by key, then a per-key window carries the last
    non-null right payload forward (`last(ignorenulls)` over rows
    unbounded-preceding..current),
  * left rows read their matched payload off the window.

No range cross-join, no per-row probing: cost is one Exchange + one sort
per key group — the shape that survives 10^12 rows (and skewed keys can
reuse skew.salted_join's salting on the unioned stream). Verified against
DuckDB's native ASOF JOIN by the asof_join_events oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of-backward join: every left row gains `prefix`-named
    columns holding the payload of the latest right row with the same
    `key` and right_ts <= left_ts (NULLs when no prior right row).

    Right-side duplicates at the exact same (key, ts) are the caller's
    responsibility to disambiguate (pre-aggregate or add a tiebreak
    column) — like every as-of implementation, ties are otherwise
    arbitrary."""
    pay = F.struct(*[F.col(c) for c in payload_cols])
    r = right.select(
        F.col(key),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_tag"),
        pay.alias("_pay"),
    )
    l = left.select(
        "*",
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_tag"),
        F.lit(None).cast(r.schema["_pay"].dataType).alias("_pay"),
    )
    unioned = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(key)
        .orderBy("_ts", "_tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn("_m", F.last("_pay", ignorenulls=True).over(w))
    out = matched.where(F.col("_tag") == 1).drop("_ts", "_tag", "_pay")
    for c in payload_cols:
        out = out.withColumn(prefix + c, F.col("_m")[c])
    return out.drop("_m")
