"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints exactly ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

value = wall seconds of the full KG-construction DAG (fresh run, resume
checkpoints wiped first so nothing is skipped). queries = per-query seconds
for the headline operator set. Extra keys: docs, docs_per_sec.

Measurement protocol (fixed after round 2, where per-query numbers were
contaminated by same-JVM contention with the just-finished DAG — q1 read
17.1 s in the record vs 1.7 s in a fresh JVM):
  * /dev/shm/vkg_bench is wiped up front, and a small warmup job primes the
    JVM/codegen paths before anything is timed;
  * the headline operator queries run BEFORE the full DAG, so nothing they
    measure shares the JVM with the pipeline's heap/page-cache footprint;
  * every per-query number is best-of-2 (min), which absorbs one-off JIT /
    scheduling noise without hiding a real regression.

Scaling-efficiency evidence (north rule, N vs 4N): scripts/bench_scaling.py
runs this same DAG at two parallelism levels in separate JVMs and writes
BENCH.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time


def _best_of(n: int, fn) -> float:
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return round(best, 3)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or "?"

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from vanna_financial_knowledge_graph_spark.plans.pipeline import run_pipeline
    from vanna_financial_knowledge_graph_spark.session import get_spark

    # partitioning sized to the data (see scripts/bench_scaling.py): 32-way
    # is right for sf0.1; more partitions means more files/fsyncs than work
    spark = get_spark("vkg-bench", cpus=cpus, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    # wipe the RAM-backed work area BEFORE timing anything: stale files from
    # a prior run both skew page-cache pressure and could let resume skip
    shutil.rmtree("/dev/shm/vkg_bench", ignore_errors=True)
    # JVM / codegen / parquet-reader warmup (untimed)
    spark.sql("SELECT sum(id) FROM range(1000000)").collect()
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()

    timings: dict[str, float] = {}

    # --- headline operator queries (timed in a quiet JVM, before the DAG) --
    import __spark_entry__ as entry

    qs = entry.queries()
    # production paths only (r3 verdict item 7): the exact Catalyst twin
    # emb_near_dup is a correctness baseline, not a headline — its equality
    # with emb_near_dup_fast stays pytest-pinned
    # (tests/test_dedup.py::test_embedding_near_dup_paths_agree)
    headline = [
        "q1_pricing_summary",
        "or_join_union_rewrite",
        "two_hop_group_count",
        "window_dedup_max",
        "semi_join_around_between",
        "dedup_exact_hash",
        "minhash_near_dup",
        "simhash_verified",
        "ann_topk_bruteforce",
        "emb_near_dup_fast",
        "lang_id",
        "quality_score",
        "token_count",
        "kg_decompose",
    ]
    for name in headline:
        timings[name] = _best_of(2, lambda: qs[name](spark, sf_dir).count())

    # --- flagship: full KG DAG, cold (no resume skips) ---------------------
    # RAM-backed work dir: the sandbox disk throttles erratically; see
    # scripts/bench_scaling.py
    work = f"/dev/shm/vkg_bench/{os.path.basename(sf_dir.rstrip('/'))}"
    t0 = time.time()
    out = run_pipeline(spark, sf_dir, work, repartition=32)
    n_docs = out["docs"].count()
    n_facts = out["facts"].count()
    pipeline_sec = time.time() - t0
    timings["kg_pipeline_full"] = round(pipeline_sec, 3)

    # KG read-path over the just-built graph, best-of-2. Settle the JVM
    # first: the DAG leaves the heap full of shuffle/broadcast carcasses and
    # the first post-DAG query otherwise pays its GC (measured 3-4x).
    spark.sparkContext._jvm.System.gc()
    time.sleep(2)
    from vanna_financial_knowledge_graph_spark.operators.readpath import (
        facts_for_entities,
        two_hop_neighbors,
    )

    timings["kg_two_hop"] = _best_of(
        2,
        lambda: two_hop_neighbors(
            out["entities"], out["relationships"], "Apple Inc.", 10
        ).count(),
    )
    timings["kg_facts_around"] = _best_of(
        2, lambda: facts_for_entities(out["facts"], ["Apple Inc."], "around", 50).count()
    )

    from vanna_financial_knowledge_graph_spark.operators.context import build_context
    from vanna_financial_knowledge_graph_spark.operators.embed import two_stage_search

    timings["kg_context_build"] = _best_of(
        2,
        lambda: build_context(
            spark, out["entities"], out["relationships"], out["chunks"],
            out["vectors"], "Apple Inc.", "earnings and acquisitions",
        ).count(),
    )
    timings["kg_search_two_stage"] = _best_of(
        2,
        lambda: two_stage_search(
            spark, out["facts"], out["vectors"],
            ["Apple Inc.", "Microsoft Corporation"], "acquisition announcement",
        ).count(),
    )

    result = {
        "metric": "kg_pipeline_full_dag_sec",
        "value": round(pipeline_sec, 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "docs": n_docs,
        "facts": n_facts,
        "docs_per_sec": round(n_docs / pipeline_sec, 2),
        "cpus": cpus,
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
