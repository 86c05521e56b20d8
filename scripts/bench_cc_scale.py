"""Distributed connected-components scale datapoint (VERDICT r4 item 3).

Every pipeline/bench run to date resolved its canonical map through the
driver union-find fast path (node counts far below the 200k threshold), so
the salted min-label-propagation + pointer-jumping path in
`connected_components` had pytest correctness coverage but no measured
datapoint. This script builds a >=1.5M-node synthetic surface graph with a
planted AAPL/SEC-style mega-component and runs the DISTRIBUTED path
(small_threshold=0), validating the result analytically and reporting
per-iteration wall/changed counts plus the per-iteration shuffled-row
volume (constant across iterations by construction: |labels| + |sym| rows
into the salted min phase, 2x|nodes| into the pointer-jump join).

Graph shape (all ids deterministic, no RNG):
  * mega-component: a 1-hub star of STAR members (the hot-label case the
    two-phase salted min exists for) + a CHAIN-node path hanging off the
    hub (diameter ~CHAIN, the pointer-jumping case: O(log d) rounds, not
    O(d))
  * NSMALL/5 independent 5-node path components (the long tail)

Usage: python scripts/bench_cc_scale.py [cpus] (default 16)
Prints one JSON line; numbers are recorded in BENCH.md.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

STAR = 500_000
CHAIN = 2_000
NSMALL = 1_000_000  # 200k five-node components
SMALL_BASE = 1_000_000_000  # keep id spaces disjoint


def _n(col):
    return F.format_string("n%010d", col)


def main() -> int:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 16

    from vanna_financial_knowledge_graph_spark.operators.canonicalize import (
        connected_components,
    )
    from vanna_financial_knowledge_graph_spark.session import get_spark

    spark = get_spark("vkg-cc-scale", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # --- build the graph (distributed; ids never touch the driver) -------
    star_edges = spark.range(1, STAR).select(
        F.lit("n%010d" % 0).alias("src"), _n(F.col("id")).alias("dst")
    )
    chain_ids = spark.range(STAR, STAR + CHAIN - 1)
    chain_edges = chain_ids.select(
        _n(F.col("id")).alias("src"), _n(F.col("id") + 1).alias("dst")
    ).union(
        spark.range(1).select(
            F.lit("n%010d" % 0).alias("src"), _n(F.lit(STAR)).alias("dst")
        )
    )
    small_ids = spark.range(SMALL_BASE, SMALL_BASE + NSMALL)
    small_edges = small_ids.where(F.col("id") % 5 != 4).select(
        _n(F.col("id")).alias("src"), _n(F.col("id") + 1).alias("dst")
    )
    edges = (
        star_edges.union(chain_edges)
        .union(small_edges)
        .repartition(2 * cpus)
        .localCheckpoint(eager=True)
    )
    nodes = (
        spark.range(0, STAR + CHAIN)
        .select(_n(F.col("id")).alias("node"))
        .union(small_ids.select(_n(F.col("id")).alias("node")))
        .repartition(2 * cpus)
        .localCheckpoint(eager=True)
    )
    n_nodes, n_edges = nodes.count(), edges.count()
    print(f"graph: {n_nodes} nodes, {n_edges} edges", flush=True)

    # --- run the DISTRIBUTED path ---------------------------------------
    stats: dict = {}
    t0 = time.time()
    comp = connected_components(nodes, edges, small_threshold=0, stats=stats)
    sizes = comp.groupBy("component").count()
    n_comp = sizes.count()
    mega = sizes.orderBy(F.desc("count")).first()
    wall = time.time() - t0

    # --- validate analytically ------------------------------------------
    expected_comps = 1 + NSMALL // 5
    assert n_comp == expected_comps, (n_comp, expected_comps)
    assert mega["count"] == STAR + CHAIN, mega
    assert mega["component"] == "n%010d" % 0, mega
    # every small component labels to its min (first) member
    bad = (
        comp.where(F.col("node") >= "n1000000000")
        .withColumn(
            "expect",
            F.format_string(
                "n%010d",
                (F.substring("node", 2, 10).cast("long") / 5).cast("long") * 5,
            ),
        )
        .where(F.col("component") != F.col("expect"))
        .count()
    )
    assert bad == 0, f"{bad} small-component nodes mislabeled"

    iters = stats.get("iterations", [])
    out = {
        "metric": "distributed_cc_wall_sec",
        "value": round(wall, 1),
        "unit": "sec",
        "cpus": cpus,
        "n_nodes": n_nodes,
        "n_edges": n_edges,
        "n_components": n_comp,
        "mega_component_size": mega["count"],
        "iterations": len(iters),
        "per_iteration": iters,
        "shuffled_rows_per_iter_min_phase": n_nodes + 2 * n_edges,
        "shuffled_rows_per_iter_jump_phase": 2 * n_nodes,
    }
    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
