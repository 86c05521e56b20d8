"""Structured Streaming incremental ingestion: AvailableNow over a pages
directory processes each file exactly once across restarts."""

import pyspark.sql.functions as F


def test_available_now_incremental(spark, kg, tmp_path):
    from vanna_financial_knowledge_graph_spark.streaming.stream import (
        incremental_chunks,
    )

    pages_dir = str(tmp_path / "pages")
    out_dir = str(tmp_path / "chunks")
    ckpt = str(tmp_path / "ckpt")

    first = kg["pages"].orderBy("url").limit(20)
    first.write.mode("overwrite").parquet(pages_dir)
    q = incremental_chunks(spark, pages_dir, out_dir, ckpt)
    q.awaitTermination()
    n1 = spark.read.parquet(out_dir).count()
    assert n1 > 0

    # batch run over the same 20 pages gives the same chunks
    from vanna_financial_knowledge_graph_spark.operators.extract import (
        build_chunks,
        extract_pages_text,
    )

    expected1 = build_chunks(extract_pages_text(spark.read.parquet(pages_dir))).count()
    assert n1 == expected1

    # second tranche of pages lands -> only the new files are processed
    more = kg["pages"].orderBy(F.desc("url")).limit(15)
    more.coalesce(1).write.mode("append").parquet(pages_dir)
    q2 = incremental_chunks(spark, pages_dir, out_dir, ckpt)
    q2.awaitTermination()
    n2 = spark.read.parquet(out_dir).count()
    assert n2 > n1

    # third run with nothing new: no additional rows (exactly-once)
    q3 = incremental_chunks(spark, pages_dir, out_dir, ckpt)
    q3.awaitTermination()
    assert spark.read.parquet(out_dir).count() == n2
