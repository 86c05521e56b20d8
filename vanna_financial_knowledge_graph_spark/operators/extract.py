"""Extraction stage: pages -> extracted text -> docs + chunks.

Spark-first layout: one Arrow-batched mapInPandas pass over the pages table
runs the *same pure functions* the single-node oracle uses
(functions/textops.extract_text + chunk_text), so the byte-identity invariant
holds by construction. Everything downstream of the UDF boundary is plain
DataFrame code that Catalyst can prune/push down.

Reference semantics covered: chunking (markdown.py:36-242), chunk ids
(utils/text.py:48-50), document-date propagation onto chunks
(backend.py:143-153 schema). The reference's PDF-OCR source (pdf.py:39-99)
is replaced by the deterministic HTML extractor per BASELINE.json input_hint.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.textops import chunk_id, chunk_text, chunk_uuid, doc_uuid, extract_text
from ..schemas import CHUNKS

GROUP_ID = "default"


def extract_pages_text(pages: DataFrame) -> DataFrame:
    """pages -> (url, warc_ts, lang, text) with text recomputed from html.

    Column-pruned input (url, warc_ts, lang, html); the scan never reads the
    pre-filled text column.
    """

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[["url", "warc_ts", "lang"]].copy()
            out["text"] = [extract_text(h) for h in pdf["html"]]
            yield out

    schema = "url string, warc_ts timestamp, lang string, text string"
    return pages.select("url", "warc_ts", "lang", "html").mapInPandas(_run, schema=schema)


def build_docs(extracted: DataFrame, group_id: str = GROUP_ID) -> DataFrame:
    """Documents table with deterministic ids (sha256 over 'doc\\x1furl').

    `metadata` is the typed map column the reference keeps as a JSON dict
    per document (backend.py:191 stores it, queries.py:720-722 decodes it;
    SURVEY.md §1.2 maps it to MapType(String,String)). Populated from page
    headers — language, crawl host, crawl-day bucket — all as narrow
    codegen expressions, no UDF."""
    return extracted.select(
        F.sha2(F.concat_ws("\x1f", F.lit("doc"), F.col("url")), 256).alias("doc_uuid"),
        F.col("url"),
        F.element_at(F.split(F.col("url"), "/"), -1).alias("doc_name"),
        F.date_format(F.col("warc_ts"), "yyyy-MM-dd").alias("doc_date"),
        F.col("lang"),
        F.map_from_arrays(
            F.array(F.lit("lang"), F.lit("host"), F.lit("crawl_day")),
            F.array(
                F.coalesce(F.col("lang"), F.lit("")),
                F.coalesce(F.parse_url(F.col("url"), F.lit("HOST")), F.lit("")),
                F.coalesce(
                    F.date_format(F.col("warc_ts"), "yyyy-MM-dd"), F.lit("")
                ),
            ),
        ).alias("metadata"),
        F.lit(group_id).alias("group_id"),
    )


def build_chunks(extracted: DataFrame, group_id: str = GROUP_ID) -> DataFrame:
    """Chunk the extracted text; one UDF pass, rows explode inside the batch.

    Positions are per-document (assigned by the pure chunker), so no global
    ordering shuffle is ever needed — the reference's posexplode-style
    positional indexing (SURVEY.md W8).
    """

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, text, ts in zip(pdf["url"], pdf["text"], pdf["warc_ts"]):
                d_uuid = doc_uuid(url)
                d_date = str(pd.Timestamp(ts).date()) if ts is not None else None
                for ch in chunk_text(text or ""):
                    rows.append(
                        {
                            "chunk_uuid": chunk_uuid(url, ch["position"]),
                            "chunk_id": chunk_id(d_uuid[:12], ch["position"]),
                            "doc_uuid": d_uuid,
                            "url": url,
                            "content": ch["content"],
                            "header_path": ch["header_path"],
                            "position": ch["position"],
                            "document_date": d_date,
                            "group_id": group_id,
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in CHUNKS.fields])

    return extracted.select("url", "warc_ts", "text").mapInPandas(_run, schema=CHUNKS)


def byte_identity_mismatches(pages: DataFrame, extracted: DataFrame) -> DataFrame:
    """Per-url rows where the Spark-extracted text differs byte-for-byte
    from the stored text column (the per-row invariant). Empty when the
    invariant holds — use byte_identity_report for a driver-checkable
    summary."""
    lhs = pages.select("url", F.col("text").alias("text_stored"))
    rhs = extracted.select("url", F.col("text").alias("text_spark"))
    return (
        lhs.join(rhs, "url", "full_outer")
        .where(
            ~(F.col("text_stored").eqNullSafe(F.col("text_spark")))
        )
        .select("url", "text_stored", "text_spark")
    )


def byte_identity_report(pages: DataFrame, extracted: DataFrame) -> DataFrame:
    """ONE summary row (n_urls, n_mismatched): a green check is an explicit
    `n_mismatched = 0` over a positive url count — distinguishable from a
    query that silently returned nothing (an empty mismatch set is not)."""
    lhs = pages.select("url", F.col("text").alias("text_stored"))
    rhs = extracted.select("url", F.col("text").alias("text_spark"))
    return (
        lhs.join(rhs, "url", "full_outer")
        .groupBy()
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.sum(
                (~F.col("text_stored").eqNullSafe(F.col("text_spark"))).cast("long")
            ).alias("n_mismatched"),
        )
    )
