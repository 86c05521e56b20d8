"""Incremental ingestion via Structured Streaming (stretch surface).

The reference is strictly batch (SURVEY.md §2.9) and the north rule's
incremental requirement is checkpoint-resume of batch stages — which
plans/pipeline.py provides. This module adds the optional streaming skin:
`readStream` over a pages directory with `Trigger.AvailableNow` runs the
same extraction DAG incrementally, exactly-once per file, writing the same
chunk schema. New page files landing between runs are picked up from the
stream checkpoint — the Spark-idiomatic version of "re-run the batch DAG on
what's new".
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..operators.extract import build_chunks, extract_pages_text
from ..schemas import PAGES


def incremental_chunks(
    spark: SparkSession,
    pages_dir: str,
    out_dir: str,
    checkpoint_dir: str,
):
    """Stream pages parquet -> chunks parquet with AvailableNow semantics.

    Returns the StreamingQuery; caller awaits termination. Files already
    committed in the checkpoint are never reprocessed (idempotent resume at
    the file granularity, complementing the batch manifests)."""
    pages = (
        spark.readStream.schema(PAGES)
        .format("parquet")
        .load(pages_dir)
    )
    chunks = build_chunks(extract_pages_text(pages))
    return (
        chunks.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
