"""Scaling-efficiency evidence for the north rule (N vs 4N executors).

No real cluster exists in this sandbox, so per driver instruction the same
job runs at two parallelism levels (local[N] and local[4N]) in separate JVMs
on identical input; throughput at both plus efficiency goes to BENCH.md.

Efficiency = speedup / core_ratio, where speedup = t_N / t_4N. The DAG is
run cold (fresh work dir) at each level; the JVM+session startup is excluded
by timing inside the child.

Usage: python scripts/bench_scaling.py [sf_dir] [N] [runs]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

CHILD = r"""
import json, shutil, sys, time
sys.path.insert(0, "/root/repo")
from vanna_financial_knowledge_graph_spark.session import get_spark
from vanna_financial_knowledge_graph_spark.plans.pipeline import run_pipeline
cpus, sf_dir, work, rep = int(sys.argv[1]), sys.argv[2], sys.argv[3], int(sys.argv[4])
# partitioning is sized to the DATA, identical at both cluster sizes —
# exactly what you'd do on a real cluster (the file/task layout must not
# change when you add executors, or you're benchmarking the FS not the job)
spark = get_spark("vkg-scale", cpus=cpus, shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")
shutil.rmtree(work, ignore_errors=True)
t0 = time.time()
from vanna_financial_knowledge_graph_spark.plans.pipeline import PipelineRun
r = PipelineRun(spark, sf_dir, work, repartition=64, replicate=rep)
out = r.run()
n_docs = out["docs"].count()
n_facts = out["facts"].count()
sec = time.time() - t0
print("CHILD_RESULT " + json.dumps({
    "cpus": cpus, "sec": sec, "docs": n_docs, "facts": n_facts,
    "stages": {k: v["sec"] for k, v in r.stage_stats.items()},
}))
"""

# corpus multiplier: sizes the job so per-task compute dominates fixed
# overhead at 4N cores (sf0.1 x32 = 160k pages); override via argv[4]
REPLICATE = 32


def run_level(cpus: int, sf_dir: str, tag: str) -> dict:
    # RAM-backed work dir: this VM's virtio disk throttles erratically
    # (32-256 MB/s bursts), which would contaminate the scaling measurement
    # with multi-second writeback stalls unrelated to the engine
    work = f"/dev/shm/vkg_scale/{tag}_{cpus}"
    p = subprocess.run(
        [sys.executable, "-c", CHILD, str(cpus), sf_dir, work, str(REPLICATE)],
        capture_output=True,
        text=True,
        timeout=7200,
        check=False,
    )
    for line in p.stdout.splitlines():
        if line.startswith("CHILD_RESULT "):
            return json.loads(line[len("CHILD_RESULT "):])
    raise RuntimeError(f"child failed (cpus={cpus}):\n{p.stdout[-2000:]}\n{p.stderr[-2000:]}")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    global REPLICATE
    if len(sys.argv) > 4:
        REPLICATE = int(sys.argv[4])
    # interleave levels (N, 4N, N, 4N, ...) so host noisy-neighbor phases
    # hit both levels equally; take best-of per level
    levels = [n, 4 * n]
    results: dict[int, dict] = {}
    for i in range(runs):
        for cpus in levels:
            r = run_level(cpus, sf_dir, f"r{i}")
            print(f"  local[{cpus}] run {i}: {r['sec']:.1f}s "
                  f"({r['docs']/r['sec']:.1f} docs/s)", flush=True)
            print(f"    stages: {json.dumps(r.get('stages', {}))}", flush=True)
            if cpus not in results or r["sec"] < results[cpus]["sec"]:
                results[cpus] = r

    tn, t4n = results[n]["sec"], results[4 * n]["sec"]
    speedup = tn / t4n
    eff = speedup / 4.0
    docs = results[n]["docs"]
    summary = {
        "sf_dir": sf_dir,
        "N_cores": n,
        "4N_cores": 4 * n,
        "t_N_sec": round(tn, 2),
        "t_4N_sec": round(t4n, 2),
        "docs": docs,
        "docs_per_sec_N": round(docs / tn, 2),
        "docs_per_sec_4N": round(docs / t4n, 2),
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(summary))

    # BENCH.md is hand-curated (protocol notes, multi-round history) — the
    # script must never overwrite it (it clobbered the curated file once in
    # round 5). Raw results land in a sidecar JSON; fold numbers into
    # BENCH.md by hand.
    out_path = os.path.join(
        os.path.dirname(__file__), "..", "BENCH_SCALING_LAST.json"
    )
    with open(out_path, "w") as f:
        json.dump({"summary": summary, "levels": {str(k): v for k, v in results.items()}}, f, indent=1)
    print(f"wrote {os.path.basename(out_path)} (fold into BENCH.md manually)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
