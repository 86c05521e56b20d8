"""Triple extraction: chunks -> facts_raw (rule+pattern fact generation).

Deterministic replacement for the reference's LLM fact-generation step
(extractor.py:85-117): sentence-scoped mention pairs joined by a
relation-verb phrase become (subject, predicate, object) rows with
UPPER_SNAKE predicates (utils/text.py:12-28), required date_context with the
document-date fallback (extractor.py:100-103), and per-fact topic lists.

Runs as a single mapInPandas pass over chunks, re-using the per-worker trie
(the matcher cache) — mention detection and pair scanning share one tokenizer
run per chunk, so this stage is narrow (no shuffle at all): pages were
already url-partitioned, and everything per-chunk stays in its partition.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..functions.matching import extract_triples, get_matcher
from ..gazetteer import gazetteer_entries
from ..schemas import FACTS_RAW

GROUP_ID = "default"


def extract_facts_raw(
    spark: SparkSession, chunks: DataFrame, group_id: str = GROUP_ID
) -> DataFrame:
    bc = spark.sparkContext.broadcast(gazetteer_entries())

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        matcher = get_matcher(bc.value)
        for pdf in batches:
            rows = []
            for c_uuid, d_uuid, content, d_date in zip(
                pdf["chunk_uuid"], pdf["doc_uuid"], pdf["content"], pdf["document_date"]
            ):
                ms = matcher.find(content or "")
                for f in extract_triples(c_uuid, content or "", d_date or "", ms):
                    f["doc_uuid"] = d_uuid
                    f["group_id"] = group_id
                    rows.append(f)
            yield pd.DataFrame(rows, columns=[f.name for f in FACTS_RAW.fields])

    return chunks.select(
        "chunk_uuid", "doc_uuid", "content", "document_date"
    ).mapInPandas(_run, schema=FACTS_RAW)
