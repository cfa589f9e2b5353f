"""asof_join (union+window temporal join) and broadcast range join."""

from datetime import datetime

import pyspark.sql.functions as F

from pdfextractor_spark.ops.joins import asof_join, range_join_broadcast


def _events(spark):
    return spark.createDataFrame(
        [
            (1, 10, datetime(2024, 1, 5)),
            (2, 10, datetime(2024, 1, 1)),   # exactly at order ts -> order visible
            (3, 10, datetime(2023, 12, 31)),  # before any order
            (4, 20, datetime(2024, 2, 1)),
            (5, 30, datetime(2024, 2, 1)),   # user with no orders at all
        ],
        "event_id long, user_id long, ts timestamp",
    )


def _orders(spark):
    return spark.createDataFrame(
        [
            (100, 10, datetime(2024, 1, 1)),
            (101, 10, datetime(2024, 1, 4)),
            (102, 10, datetime(2024, 1, 4)),  # same-ts tie: max orderkey wins
            (200, 20, datetime(2024, 1, 15)),
        ],
        "o_orderkey long, o_custkey long, o_orderdate timestamp",
    )


def _run(spark, how):
    out = asof_join(
        _events(spark), _orders(spark),
        left_key="user_id", right_key="o_custkey",
        left_ts="ts", right_ts="o_orderdate",
        payload_cols=["o_orderkey"], right_order=["o_orderdate", "o_orderkey"],
        how=how,
    )
    return {r["event_id"]: r["asof_o_orderkey"] for r in out.collect()}


def test_asof_inner_latest_at_or_before(spark):
    got = _run(spark, "inner")
    assert got == {
        1: 102,  # ties on 2024-01-04 resolve to max orderkey
        2: 100,  # order dated exactly at event ts is visible
        4: 200,
    }


def test_asof_left_keeps_unmatched(spark):
    got = _run(spark, "left")
    assert got[3] is None and got[5] is None
    assert got[1] == 102 and got[2] == 100 and got[4] == 200
    assert len(got) == 5


def test_asof_plan_is_single_key_shuffle(spark):
    out = asof_join(
        _events(spark), _orders(spark),
        left_key="user_id", right_key="o_custkey",
        left_ts="ts", right_ts="o_orderdate", payload_cols=["o_orderkey"],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the whole as-of is a union + one window over the key: no join operator
    assert "Join" not in plan
    assert "Window" in plan and "Union" in plan


def test_range_join_broadcasts_band_table(spark):
    fact = spark.createDataFrame([(i, i % 50 + 1) for i in range(100)], "id long, size int")
    bands = spark.createDataFrame(
        [("small", 1, 10), ("medium", 11, 25), ("large", 26, 50)],
        "band string, lo int, hi int",
    )
    out = range_join_broadcast(fact, bands, "size")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan
    counts = {r["band"]: r["n"] for r in out.groupBy("band").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {"small": 20, "medium": 30, "large": 50}


def test_asof_matches_naive_reference_on_random_input(spark):
    """Randomized cross-check: asof_join == per-row argmax over the naive
    inequality join, on 3 seeded random datasets with heavy ts ties."""
    import random

    for seed in (1, 7, 42):
        rng = random.Random(seed)
        # coarse ts grid (0..19) forces many exact ties on both sides
        events = [(i, rng.randrange(5), rng.randrange(20)) for i in range(120)]
        orders = [(100 + j, rng.randrange(5), rng.randrange(20)) for j in range(60)]

        def expected(u, t):
            cand = [(ts, k) for k, ou, ts in orders if ou == u and ts <= t]
            return max(cand)[1] if cand else None

        want = {eid: expected(u, t) for eid, u, t in events}

        edf = spark.createDataFrame(
            [(e, u, t) for e, u, t in events], "event_id long, user_id long, ts long")
        odf = spark.createDataFrame(
            [(k, u, t) for k, u, t in orders], "o_orderkey long, o_custkey long, o_ts long")
        got = {
            r["event_id"]: r["asof_o_orderkey"]
            for r in asof_join(
                edf, odf, left_key="user_id", right_key="o_custkey",
                left_ts="ts", right_ts="o_ts", payload_cols=["o_orderkey"],
                right_order=["o_ts", "o_orderkey"], how="left",
            ).collect()
        }
        assert got == want, f"seed {seed}"
