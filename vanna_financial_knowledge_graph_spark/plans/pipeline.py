"""Full KG-construction DAG with per-stage checkpoint-resume and lineage.

Stage protocol (the Spark-first replacement for the reference's append-only
part files + metadata.json, backend.py:114-123,427-449):

  * every stage writes parquet to <work_dir>/<stage>/ plus a _MANIFEST.json
    (underscore-prefixed, so Spark scans ignore it) that records the stage
    fingerprint = sha256(code version, params, upstream fingerprints), row
    count and per-partition rows (the lineage manifest the north rule asks
    for).
  * on re-run, a stage whose manifest fingerprint matches is SKIPPED and its
    parquet is read back — deterministic ids everywhere make this exact:
    resuming after a crash reproduces byte-identical tables.
  * per-stage, per-partition metrics rows accumulate into <work_dir>/metrics.

At cluster scale the parquet dirs become Iceberg tables and the manifest
becomes snapshot metadata; the protocol is unchanged.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import CODE_VERSION
from ..operators.assemble import (
    build_relationships,
    build_topics,
    link_facts,
    ontology_topics,
)
from ..operators.canonicalize import build_canonical_map, build_entities
from ..operators.embed import build_vectors
from ..operators.extract import (
    build_docs,
    extract_pages_text,
)
from ..operators.ingest import (
    build_annotations,
    chunks_from_annotations,
    facts_raw_from_annotations,
    mentions_from_annotations,
)
from ..sources.pages import synthesize_pages

STAGES = [
    "pages",
    "extracted",
    "docs",
    "annotations",
    "chunks",
    "mentions",
    "facts_raw",
    "canonical_map",
    "entities",
    "topics",
    "facts",
    "relationships",
    "vectors",
]


def _manifest_path(work_dir: str, stage: str) -> str:
    return os.path.join(work_dir, stage, "_MANIFEST.json")


def _read_manifest(work_dir: str, stage: str) -> dict | None:
    p = _manifest_path(work_dir, stage)
    try:
        with open(p) as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError):
        return None


class PipelineRun:
    """Orchestrates the DAG; collects per-stage timing + row metrics."""

    def __init__(
        self,
        spark: SparkSession,
        sf_dir: str,
        work_dir: str,
        *,
        group_id: str = "default",
        repartition: int | None = None,
        replicate: int = 1,
        dedup_urls: bool = True,
    ) -> None:
        from ..operators.readpath import check_group_id

        self.spark = spark
        self.sf_dir = sf_dir
        self.work_dir = work_dir
        self.group_id = check_group_id(group_id)  # P8 tenant-id format guard
        # explicit url-hash repartitioning width for the ingest fan-out
        self.repartition = repartition
        # corpus multiplier (scaling benchmark sizes work to core count)
        self.replicate = replicate
        # collapse duplicate urls (latest crawl wins) before extraction
        self.dedup_urls = dedup_urls
        self.stage_stats: dict[str, dict] = {}
        self.executed: list[str] = []
        self.skipped: list[str] = []
        # Stage-write codec (guide §6): compression trades CPU for I/O, and
        # on a RAM-backed scratch (tmpfs) there is no I/O to win — zstd on
        # /dev/shm measured ~20% of the whole DAG's wall in pure compressor
        # CPU at sf1.0. Default adapts to the work dir's medium; override
        # with VKG_STAGE_CODEC (production on real disks/object stores wants
        # zstd, which stays the default off tmpfs).
        self.stage_codec = os.environ.get("VKG_STAGE_CODEC") or (
            "uncompressed"
            if os.path.abspath(work_dir).startswith(("/dev/shm", "/run/shm"))
            else "zstd"
        )
        os.makedirs(work_dir, exist_ok=True)

    # -- stage runner ------------------------------------------------------

    def _fingerprint(self, stage: str, upstream: list[str], params: str = "") -> str:
        import hashlib

        up = "|".join(
            (self._read_fp(u) or "missing") for u in upstream
        )
        key = f"v{CODE_VERSION}|{stage}|{self.sf_dir}|{self.group_id}|{params}|{up}"
        return hashlib.sha256(key.encode()).hexdigest()

    def _read_fp(self, stage: str) -> str | None:
        m = _read_manifest(self.work_dir, stage)
        return m["fingerprint"] if m else None

    def _run_stage(
        self,
        stage: str,
        upstream: list[str],
        build,
        *,
        params: str = "",
    ) -> DataFrame:
        path = os.path.join(self.work_dir, stage)
        fp = self._fingerprint(stage, upstream, params)
        man = _read_manifest(self.work_dir, stage)
        if man and man.get("fingerprint") == fp:
            self.skipped.append(stage)
            self.stage_stats[stage] = {"rows": man.get("rows"), "sec": 0.0, "skipped": True}
            return self.spark.read.parquet(path)

        t0 = time.time()
        df = build()
        df.write.mode("overwrite").option(
            "compression", self.stage_codec
        ).parquet(path)
        out = self.spark.read.parquet(path)
        # per-partition lineage metrics (north rule): rows per output file,
        # read from the parquet FOOTERS — no second pass over the data
        import pyarrow.parquet as pq

        part_rows = []
        for i, fname in enumerate(
            sorted(f for f in os.listdir(path) if f.endswith(".parquet"))
        ):
            md = pq.read_metadata(os.path.join(path, fname))
            part_rows.append({"partition_id": i, "rows_out": md.num_rows})
        rows = sum(p["rows_out"] for p in part_rows)
        sec = time.time() - t0
        with open(_manifest_path(self.work_dir, stage), "w") as f:
            json.dump(
                {
                    "stage": stage,
                    "fingerprint": fp,
                    "rows": rows,
                    "partitions": part_rows,
                    "group_id": self.group_id,
                    "code_version": CODE_VERSION,
                    "upstream": {u: self._read_fp(u) for u in upstream},
                    "elapsed_sec": round(sec, 3),
                },
                f,
            )
        self.executed.append(stage)
        self.stage_stats[stage] = {"rows": rows, "sec": round(sec, 3), "skipped": False}
        return out

    # -- the DAG -----------------------------------------------------------

    def _parallel(self, jobs: dict[str, callable]) -> dict[str, DataFrame]:
        """Run a ready frontier of independent stages.

        The grouping documents the dependency DAG (each dict is a frontier
        a cluster scheduler could dispatch concurrently). On THIS host the
        concurrent variant (driver threads submitting simultaneous Spark
        jobs) was measured a clear net loss — e.g. the chunks/mentions/
        facts_raw frontier took 23s wall concurrent vs 12s sequential at
        local[8], and the relationships/vectors frontier 75s vs 19s:
        simultaneous scans of the same parquet plus overlapping zstd writes
        thrash a single-JVM local mode. Sequential dispatch is therefore
        deliberate; on a real multi-executor cluster with idle slots,
        swapping this loop for a ThreadPoolExecutor is a one-line change."""
        return {name: fn() for name, fn in jobs.items()}

    def run(self) -> dict[str, DataFrame]:
        spark, gid = self.spark, self.group_id

        def _pages():
            # explicit repartition by doc/url hash: uniform ingest fan-out,
            # applied to the UDF *input* so synthesis itself parallelizes
            df = synthesize_pages(
                spark, self.sf_dir, self.repartition, self.replicate
            )
            if self.dedup_urls:
                from ..sources.pages import dedupe_pages

                df = dedupe_pages(df)
            return df

        pages = self._run_stage(
            "pages",
            [],
            _pages,
            params=f"{self.repartition}|{self.replicate}|{self.dedup_urls}",
        )
        # Width of the CPU-bound python stages. The parquet scans feeding
        # them CANNOT deliver parallelism by themselves at small scale:
        # AQE's 8MB advisory coalesces the url-dedup shuffle to ~16 dense
        # output files, each a single (unsplittable) row group — so without
        # an explicit re-fan, extract/annotate run 16-wide no matter how
        # many cores exist, and scaling flatlines. One cheap exchange of
        # the text buys exact, uniform width for ~100x its cost in
        # downstream per-row CPU. Round-6: the ANNOTATIONS re-fan is gated
        # on the actual scan width — the extracted stage's own url-hash
        # repartition (kept unconditional: it also guarantees the written
        # file layout is balanced for every downstream scan) means the
        # extracted parquet re-scans at >= width balanced partitions at
        # larger scale factors, and re-exchanging all text a second time
        # bought nothing (measured ~2s of the sf1.0 annotations stage;
        # guide §2.4).
        width = self.repartition or self.spark.sparkContext.defaultParallelism * 2

        def _fan(df: DataFrame) -> DataFrame:
            if df.rdd.getNumPartitions() < width:
                return df.repartition(width, "url")
            return df

        extracted = self._run_stage(
            "extracted",
            ["pages"],
            lambda: extract_pages_text(pages.repartition(width, "url")),
        )
        # fused ingest kernel over the ALREADY-extracted text: ONE Arrow
        # crossing produces chunk+mention+fact rows, and extract_text (the
        # dominant Python cost) runs exactly once in the whole DAG — in the
        # extracted stage, which doubles as the byte-identity branch. The
        # chunks/mentions/facts_raw tables are column-pruned JVM-side
        # selects/explodes of the one annotations table.
        #
        # Independent stages run as parallel groups (see _parallel): the DAG
        # below dispatches each ready frontier concurrently.
        g1 = self._parallel(
            {
                "docs": lambda: self._run_stage(
                    "docs", ["extracted"], lambda: build_docs(extracted, gid)
                ),
                "annotations": lambda: self._run_stage(
                    "annotations",
                    ["extracted"],
                    lambda: build_annotations(spark, _fan(extracted), gid),
                ),
            }
        )
        docs, annotations = g1["docs"], g1["annotations"]
        g2 = self._parallel(
            {
                "chunks": lambda: self._run_stage(
                    "chunks",
                    ["annotations"],
                    lambda: chunks_from_annotations(annotations),
                ),
                "mentions": lambda: self._run_stage(
                    "mentions",
                    ["annotations"],
                    lambda: mentions_from_annotations(annotations),
                ),
                "facts_raw": lambda: self._run_stage(
                    "facts_raw",
                    ["annotations"],
                    lambda: facts_raw_from_annotations(annotations),
                ),
            }
        )
        chunks, mentions, facts_raw = g2["chunks"], g2["mentions"], g2["facts_raw"]
        # dimension-sized outputs: coalesce so we don't write 64 tiny files
        g3 = self._parallel(
            {
                "canonical_map": lambda: self._run_stage(
                    "canonical_map",
                    ["mentions"],
                    lambda: build_canonical_map(spark, mentions, gid).coalesce(8),
                ),
                # corpus topics UNION the full ontology under the reserved
                # group_id='ontology' namespace — the reference keeps the
                # ontology in the same topics table/vector space behind that
                # tenant filter (topic_resolver.py:357-369), so the vectors
                # stage below embeds both and search_topics(group_id=
                # 'ontology') resolves against the ontology space
                # repartition(1), NOT coalesce(1): coalesce over this
                # union (broadcast-joined corpus topics + local-relation
                # ontology rows) collapses the whole upstream into one
                # task and measured ~5x slower (5.5 s vs 1.4 s at sf0.1);
                # the explicit exchange keeps the distinct/join parallel
                # and only the tiny 102-row result lands on one writer
                "topics": lambda: self._run_stage(
                    "topics",
                    ["mentions"],
                    lambda: build_topics(spark, mentions, gid)
                    .unionByName(ontology_topics(spark))
                    .repartition(1),
                ),
            }
        )
        canonical_map, topics = g3["canonical_map"], g3["topics"]
        g4 = self._parallel(
            {
                "entities": lambda: self._run_stage(
                    "entities",
                    ["canonical_map", "mentions"],
                    lambda: build_entities(
                        spark, canonical_map, mentions, gid
                    ).coalesce(4),
                ),
                "facts": lambda: self._run_stage(
                    "facts",
                    ["facts_raw", "canonical_map"],
                    lambda: link_facts(spark, facts_raw, canonical_map, gid),
                ),
            }
        )
        entities, facts = g4["entities"], g4["facts"]
        g5 = self._parallel(
            {
                "relationships": lambda: self._run_stage(
                    "relationships",
                    ["facts"],
                    lambda: build_relationships(facts, gid),
                ),
                # per-kind vector index rows (reference: LanceDB per-table
                # indices, incl. the topics index at indices.py:449-477)
                "vectors": lambda: self._run_stage(
                    "vectors",
                    ["chunks", "entities", "facts", "topics"],
                    lambda: build_vectors(
                        chunks, entities, facts, topics, width=width
                    ),
                ),
            }
        )
        relationships, vectors = g5["relationships"], g5["vectors"]
        # threaded groups append out of order; normalize to STAGES order so
        # executed/skipped read deterministically
        self.executed = [s for s in STAGES if s in set(self.executed)]
        self.skipped = [s for s in STAGES if s in set(self.skipped)]
        return {
            "pages": pages,
            "extracted": extracted,
            "docs": docs,
            "annotations": annotations,
            "chunks": chunks,
            "mentions": mentions,
            "facts_raw": facts_raw,
            "canonical_map": canonical_map,
            "entities": entities,
            "topics": topics,
            "facts": facts,
            "relationships": relationships,
            "vectors": vectors,
        }


def run_pipeline(
    spark: SparkSession,
    sf_dir: str,
    work_dir: str,
    *,
    group_id: str = "default",
    repartition: int | None = None,
    replicate: int = 1,
    dedup_urls: bool = True,
) -> dict[str, DataFrame]:
    """Run the full DAG. dedup_urls (default ON — crawl-shaped inputs carry
    recrawls) collapses duplicate urls latest-crawl-wins before extraction,
    so doc/chunk/fact uuids stay unique under input duplication."""
    return PipelineRun(
        spark,
        sf_dir,
        work_dir,
        group_id=group_id,
        repartition=repartition,
        replicate=replicate,
        dedup_urls=dedup_urls,
    ).run()
