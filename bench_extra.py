"""Optimization-round instrumentation (bench.py stays FROZEN for driver
measurement; this file is the working bench per guide §1):

  * per-stage wall/rows for the full KG DAG (PipelineRun.stage_stats)
  * per-query isolation through the noop sink (guide §1.4) — times the
    computation, not .count()'s pruned plan
  * a pure-CPU stall sentinel (seeded NumPy GEMM of constant size) timed
    before/after each query, so host throttle windows are visible in the
    artifact itself (VERDICT r5 ask 1)
  * optional .explain("formatted") dumps to plans/r06/<query>_<tag>.txt

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py \
      [--queries q1,...|all] [--pipeline] [--plans TAG] [--repeats N]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time


def sentinel() -> float:
    """Fixed-size seeded GEMM: ~constant CPU work, wall time exposes host
    throttling. Returns seconds."""
    import numpy as np

    rng = np.random.RandomState(7)
    a = rng.rand(768, 768)
    t0 = time.perf_counter()
    for _ in range(8):
        a = a @ a
        a /= np.abs(a).max() + 1.0
    return round(time.perf_counter() - t0, 4)


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default="")
    ap.add_argument("--pipeline", action="store_true")
    ap.add_argument("--plans", default="")
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--readpath", action="store_true",
                    help="time the post-DAG read-path queries too")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from vanna_financial_knowledge_graph_spark.session import get_spark

    spark = get_spark("vkg-bench-extra", cpus=cpus, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    spark.sql("SELECT sum(id) FROM range(1000000)").collect()
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()

    out: dict = {"sf_dir": sf_dir, "cpus": cpus, "sentinel_unit_sec": sentinel()}

    import __spark_entry__ as entry

    qs = entry.queries()
    names = []
    if args.queries == "all":
        names = [
            "q1_pricing_summary", "or_join_union_rewrite", "two_hop_group_count",
            "window_dedup_max", "semi_join_around_between", "dedup_exact_hash",
            "minhash_near_dup", "simhash_verified", "ann_topk_bruteforce",
            "emb_near_dup_fast", "lang_id", "quality_score", "token_count",
            "kg_decompose",
        ]
    elif args.queries:
        names = args.queries.split(",")

    qtimes: dict[str, dict] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        s_pre = sentinel()
        samples = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            noop(qs[name](spark, sf_dir))
            samples.append(round(time.perf_counter() - t0, 3))
        s_post = sentinel()
        qtimes[name] = {
            "min": min(samples), "samples": samples,
            "sentinel_pre": s_pre, "sentinel_post": s_post,
        }
        if args.plans:
            os.makedirs("plans/r06", exist_ok=True)
            df = qs[name](spark, sf_dir)
            mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
            plan = df._jdf.queryExecution().explainString(mode)
            with open(f"plans/r06/{name}_{args.plans}.txt", "w") as f:
                f.write(plan)
        spark.sparkContext.setJobDescription(None)
    if qtimes:
        out["queries"] = qtimes

    if args.pipeline:
        from vanna_financial_knowledge_graph_spark.plans.pipeline import PipelineRun

        shutil.rmtree("/dev/shm/vkg_bench_extra", ignore_errors=True)
        work = f"/dev/shm/vkg_bench_extra/{os.path.basename(sf_dir.rstrip('/'))}"
        s_pre = sentinel()
        t0 = time.perf_counter()
        run = PipelineRun(spark, sf_dir, work, repartition=32)
        dfs = run.run()
        n_docs = dfs["docs"].count()
        n_facts = dfs["facts"].count()
        wall = round(time.perf_counter() - t0, 3)
        out["pipeline"] = {
            "wall": wall, "docs": n_docs, "facts": n_facts,
            "sentinel_pre": s_pre, "sentinel_post": sentinel(),
            "stages": run.stage_stats,
        }
        if args.readpath:
            spark.sparkContext._jvm.System.gc()
            time.sleep(2)
            from vanna_financial_knowledge_graph_spark.operators.context import (
                build_context,
            )
            from vanna_financial_knowledge_graph_spark.operators.embed import (
                two_stage_search,
            )

            rp: dict[str, dict] = {}
            for rname, fn in {
                "kg_context_build": lambda: build_context(
                    spark, dfs["entities"], dfs["relationships"], dfs["chunks"],
                    dfs["vectors"], "Apple Inc.", "earnings and acquisitions",
                ).count(),
                "kg_search_two_stage": lambda: two_stage_search(
                    spark, dfs["facts"], dfs["vectors"],
                    ["Apple Inc.", "Microsoft Corporation"],
                    "acquisition announcement",
                ).count(),
            }.items():
                s_pre = sentinel()
                samples = []
                for _ in range(args.repeats):
                    t0 = time.perf_counter()
                    fn()
                    samples.append(round(time.perf_counter() - t0, 3))
                rp[rname] = {
                    "min": min(samples), "samples": samples,
                    "sentinel_pre": s_pre, "sentinel_post": sentinel(),
                }
            out["readpath"] = rp

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
