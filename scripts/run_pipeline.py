"""spark-submit entrypoint for the full KG-construction DAG (north rule:
"runs via spark-submit --py-files at 10^12-document scale").

Package the library and submit:

    cd /root/repo && zip -qr /tmp/vkg.zip vanna_financial_knowledge_graph_spark
    spark-submit --master local[8] \
        --py-files /tmp/vkg.zip \
        scripts/run_pipeline.py \
        --sf-dir /root/testdata/sf0.001 --work-dir /tmp/vkg_submit

On a cluster, swap --master for YARN/K8s and pass the same --py-files zip;
every session knob set in session.get_spark can be given as --conf instead
(the entrypoint uses the session spark-submit built, adding only missing
defaults). Prints one JSON line of per-stage rows/seconds and exits 0 on
success.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    p = argparse.ArgumentParser(description="Run the KG construction DAG")
    p.add_argument("--sf-dir", required=True, help="input dir with documents.parquet")
    p.add_argument("--work-dir", required=True, help="stage output/checkpoint dir")
    p.add_argument("--group-id", default="default")
    p.add_argument("--repartition", type=int, default=None)
    p.add_argument("--replicate", type=int, default=1)
    p.add_argument("--no-dedup-urls", action="store_true")
    args = p.parse_args()

    from pyspark.sql import SparkSession

    from vanna_financial_knowledge_graph_spark.plans.pipeline import PipelineRun

    spark = SparkSession.builder.appName("vkg-kg-construct").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run = PipelineRun(
        spark,
        args.sf_dir,
        args.work_dir,
        group_id=args.group_id,
        repartition=args.repartition,
        replicate=args.replicate,
        dedup_urls=not args.no_dedup_urls,
    )
    out = run.run()
    print(
        json.dumps(
            {
                "facts": out["facts"].count(),
                "executed": run.executed,
                "skipped": run.skipped,
                "stages": run.stage_stats,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
