"""Driver-simulator: run each __spark_entry__.queries() entry and compare
against oracle_sql() in DuckDB (row count + column names + order-insensitive
value multiset), the same contract the grading driver applies.

Usage: python scripts/check_oracle.py [sf_dir] [only_query_name ...]
"""

from __future__ import annotations

import math
import sys


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        # collapse -0.0 and represent stably
        if v == 0:
            v = 0.0
        return f"{v:.9g}"
    if hasattr(v, "item"):  # numpy scalar
        return _norm_cell(v.item())
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    return v


def df_multiset(pdf):
    cols = sorted(pdf.columns)
    rows = [
        tuple(_norm_cell(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    ]
    return cols, sorted(rows, key=repr)


def compare(spark_pdf, duck_pdf) -> list[str]:
    problems = []
    sc, sr = df_multiset(spark_pdf)
    dc, dr = df_multiset(duck_pdf)
    if sc != dc:
        problems.append(f"columns differ: spark={sc} duck={dc}")
        return problems
    if len(sr) != len(dr):
        problems.append(f"row count differ: spark={len(sr)} duck={len(dr)}")
    if sr != dr:
        n = 0
        for a, b in zip(sr, dr):
            if a != b:
                problems.append(f"first diff row:\n  spark={a}\n  duck ={b}")
                break
            n += 1
        else:
            problems.append(f"prefix equal through {n}, lengths differ")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    sys.path.insert(0, "/root/repo")
    import os

    # kg_* oracles read the materialized pipeline parquet for this sf dir
    os.environ["VKG_ORACLE_SF_DIR"] = sf_dir
    import __spark_entry__ as entrymod
    from vanna_financial_knowledge_graph_spark.session import get_spark

    spark = get_spark("oracle-check", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            spdf = sdf.toPandas()
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            print(f"FAIL {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(spdf)} rows)")
            continue
        try:
            dpdf = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            print(f"FAIL {name}: duckdb error: {type(e).__name__}: {str(e)[:300]}")
            continue
        problems = compare(spdf, dpdf)
        if problems:
            failed.append(name)
            print(f"FAIL {name}:")
            for p in problems:
                print("   ", p)
        else:
            print(f"OK   {name}: {len(spdf)} rows match oracle")
    print(f"\n{len(failed)} failures: {failed}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
