"""Event-log analytics operators: sessionization, rollup, percentiles,
JSON extraction (operators/analytics.py). Oracle parity is covered by
check_oracle / the driver; these are hand-computed semantic fixtures."""

import datetime as dt

from vanna_financial_knowledge_graph_spark.operators import analytics as A


def _ts(minute: int, second: int = 0):
    return dt.datetime(2024, 1, 1, 0, minute, second)


def test_sessionize_gap_boundaries(spark):
    """Events 31 min apart split sessions; <=30 min stay together; session
    stats are exact."""
    events = spark.createDataFrame(
        [
            # user 1: two events 10 min apart, then a 31-min gap, then one
            (1, _ts(0), 7, "click", 1.0, "{}"),
            (2, _ts(10), 7, "view", 1.0, "{}"),
            (3, _ts(41), 7, "click", 1.0, "{}"),
            # user 2: single event
            (4, _ts(5), 8, "error", 1.0, "{}"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = {
        (r["user_id"], r["session_seq"]): (r["n_events"], r["duration_sec"])
        for r in A.sessionize(events, gap_minutes=30).collect()
    }
    assert got == {(7, 1): (2, 600), (7, 2): (1, 0), (8, 1): (1, 0)}


def test_rollup_includes_subtotals_and_grand_total(spark):
    events = spark.createDataFrame(
        [
            (1, _ts(0), 7, "click", 2.0, "{}"),
            (2, _ts(1), 7, "click", 3.0, "{}"),
            (3, _ts(2), 7, "view", 5.0, "{}"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    rows = {
        (r["event_type"], r["day"]): (r["n_events"], r["sum_value"])
        for r in A.rollup_event_counts(events).collect()
    }
    assert rows[(None, None)] == (3, 10.0)          # grand total
    assert rows[("click", None)] == (2, 5.0)        # per-type subtotal
    assert rows[("click", "2024-01-01")] == (2, 5.0)
    assert rows[("view", "2024-01-01")] == (1, 5.0)


def test_salted_join_equals_plain_join(spark):
    """Salted join must be row-for-row identical to the plain join on a
    pathologically skewed key (one key holds 80% of the big side), for both
    inner and left, and spread the hot key across multiple salt buckets."""
    import pytest as _pytest

    from vanna_financial_knowledge_graph_spark.operators.skew import salted_join

    big = spark.createDataFrame(
        [("AAPL" if i % 5 != 0 else f"k{i}", i, float(i)) for i in range(500)],
        "sym string, event_id long, v double",
    )
    dim = spark.createDataFrame(
        [("AAPL", "Apple Inc."), ("k5", "Other Co."), ("missing", "Nobody")],
        "sym string, name string",
    )
    for how in ("inner", "left"):
        got = sorted(
            map(str, salted_join(big, dim, "sym", salt_factor=8, how=how).collect())
        )
        want = sorted(map(str, big.join(dim, "sym", how).collect()))
        assert got == want, how

    # the hot key actually spreads across salt buckets
    from pyspark.sql import functions as F

    salted = big.withColumn(
        "_salt",
        F.pmod(F.xxhash64("event_id", "v"), F.lit(8)),
    )
    n_buckets = (
        salted.where(F.col("sym") == "AAPL").select("_salt").distinct().count()
    )
    assert n_buckets >= 6

    with _pytest.raises(ValueError):
        salted_join(big, dim, "sym", how="full")
    with _pytest.raises(ValueError, match="_salt"):
        salted_join(big.withColumn("_salt", F.lit(1)), dim, "sym")


def test_salted_join_row_id_spreads_duplicate_rows(spark):
    """Deterministic-salt caveat: fully duplicate hot-key rows collapse to
    one salt bucket; passing a stable row_id spreads them (ADVICE r3)."""
    from pyspark.sql import functions as F

    from vanna_financial_knowledge_graph_spark.operators.skew import salted_join

    # 400 rows of a hot key with IDENTICAL payload + a unique row id
    big = spark.createDataFrame(
        [("AAPL", "same", i) for i in range(400)] + [("MSFT", "x", 1000)],
        "sym string, payload string, rid long",
    )
    dim = spark.createDataFrame(
        [("AAPL", "Apple Inc."), ("MSFT", "Microsoft")], "sym string, name string"
    )
    # payload-hash salt: every duplicate row lands in ONE bucket
    no_id = big.drop("rid").withColumn(
        "_salt", F.pmod(F.xxhash64("payload"), F.lit(8))
    )
    assert (
        no_id.where(F.col("sym") == "AAPL").select("_salt").distinct().count() == 1
    )
    # row_id salt: the same rows spread
    with_id = big.withColumn(
        "_salt", F.pmod(F.xxhash64("sym", "rid"), F.lit(8))
    )
    assert (
        with_id.where(F.col("sym") == "AAPL").select("_salt").distinct().count() >= 6
    )
    # and the join result stays exactly the plain join's
    got = sorted(
        map(str, salted_join(big, dim, "sym", salt_factor=8, row_id="rid").collect())
    )
    want = sorted(map(str, big.join(dim, "sym").collect()))
    assert got == want
    import pytest as _pytest

    with _pytest.raises(ValueError, match="row_id"):
        salted_join(big, dim, "sym", row_id="nope")


def test_hll_sketch_within_rsd(spark):
    """approx_count_distinct stays within ~5 rsd of the exact count on the
    driver testdata (HLL++ error is probabilistic but deterministic for a
    fixed input)."""
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    for r in A.distinct_user_sketch(events, rsd=0.02).collect():
        err = abs(r["approx_users"] - r["exact_users"]) / max(r["exact_users"], 1)
        assert err <= 0.10, (r["event_type"], r["approx_users"], r["exact_users"])


def test_percentile_and_json_extract(spark):
    events = spark.createDataFrame(
        [
            (i, _ts(i), 7, "click", float(i), '{"k": %d}' % (i * 10))
            for i in range(1, 6)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    p = A.percentile_summary(events).collect()[0]
    assert p["p50"] == 3.0 and p["n"] == 5  # exact median of 1..5
    jb = {r["k_bucket"]: r["n_events"] for r in A.json_props_extract(events).collect()}
    # k = 10,20,30,40,50 -> buckets 1..5
    assert jb == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_asof_join_hand_fixture(spark):
    """J11 as-of join semantics on a hand-computed fixture: latest right
    row at-or-before each left ts per key, inclusive at equal timestamps,
    NULL payload when no prior right row exists."""
    from vanna_financial_knowledge_graph_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [("e1", "u1", 10), ("e2", "u1", 25), ("e3", "u1", 5), ("e4", "u2", 7)],
        "id string, k string, t long",
    )
    right = spark.createDataFrame(
        [("u1", 10, "r10"), ("u1", 20, "r20"), ("u2", 8, "r8")],
        "k string, rt long, label string",
    )
    got = {
        r["id"]: r["asof_label"]
        for r in asof_join(left, right, "k", "t", "rt", ["label"]).collect()
    }
    assert got == {
        "e1": "r10",  # inclusive: rt == t matches
        "e2": "r20",  # latest prior
        "e3": None,   # nothing at or before t=5
        "e4": None,   # u2's only right row is later (8 > 7)
    }
