"""Mention detection: chunks -> mentions via a broadcast gazetteer trie.

The gazetteer (registry names/aliases/tickers + ontology labels/synonyms) is
broadcast once; each executor builds the token trie a single time per worker
process (functions/matching.get_matcher cache) and streams Arrow batches
through it. This is the deterministic replacement for the reference's LLM
entity-enumeration step (extractor.py:36-63) and implements the
"dictionary+gazetteer tries broadcast to executors" requirement directly.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..functions.matching import get_matcher
from ..gazetteer import gazetteer_entries
from ..schemas import MENTIONS

GROUP_ID = "default"


def detect_mentions(
    spark: SparkSession, chunks: DataFrame, group_id: str = GROUP_ID
) -> DataFrame:
    bc = spark.sparkContext.broadcast(gazetteer_entries())

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        matcher = get_matcher(bc.value)
        for pdf in batches:
            rows = []
            for c_uuid, d_uuid, content in zip(
                pdf["chunk_uuid"], pdf["doc_uuid"], pdf["content"]
            ):
                for m in matcher.find(content or ""):
                    rows.append(
                        {
                            "chunk_uuid": c_uuid,
                            "doc_uuid": d_uuid,
                            "name": m["name"],
                            "name_norm": m["name_norm"],
                            "kind": m["kind"],
                            "ref_uuid": m["ref_uuid"],
                            "entity_type": m["entity_type"],
                            "begin": m["begin"],
                            "end": m["end"],
                            "group_id": group_id,
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in MENTIONS.fields])

    return chunks.select("chunk_uuid", "doc_uuid", "content").mapInPandas(
        _run, schema=MENTIONS
    )
