"""Sketch aggregates: HLL cardinality and approximate quantiles must land
within their declared error bounds of the exact answers, and their plans
must stay partial-aggregate shaped (no row expansion)."""

import pyspark.sql.functions as F

from pdfextractor_spark.ops.sketches import cardinality_rollup, quantile_rollup


def test_hll_within_declared_rsd(spark):
    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    rows = cardinality_rollup(li, "l_orderkey", "l_returnflag", rsd=0.02).collect()
    assert len(rows) >= 2
    for r in rows:
        # 2% rsd -> 3-sigma bound 6%; exact cardinalities here are 10k+
        assert r["rel_error"] <= 0.06, (r["l_returnflag"], r["rel_error"])


def test_approx_quantiles_within_rank_error(spark):
    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    got = {r["l_returnflag"]: r for r in
           quantile_rollup(li, "l_extendedprice", "l_returnflag",
                           quantiles=(0.5, 0.9), accuracy=10000).collect()}
    exact = {r["l_returnflag"]: r for r in
             li.groupBy("l_returnflag").agg(
                 F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
                 F.expr("percentile(l_extendedprice, 0.9)").alias("p90"),
             ).collect()}
    for flag, g in got.items():
        e = exact[flag]
        # rank error 1e-4 on ~20k rows -> value should be within 1% here
        assert abs(g["p50"] - e["p50"]) / e["p50"] < 0.01
        assert abs(g["p90"] - e["p90"]) / e["p90"] < 0.01


def test_sketch_plan_is_partial_aggregate(spark):
    """HLL must partial-aggregate map-side (no Expand / no row explosion the
    way exact multi-distinct does) — the sketch state shuffles, not rows."""
    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    approx_only = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey").alias("d"))
    plan = approx_only._jdf.queryExecution().executedPlan().toString()
    assert "partial_approx_count_distinct" in plan
    assert "Expand" not in plan
    # the full rollup (exact verify + HLL) must ALSO avoid Expand: the
    # exact side is distinct-pairs -> count, not a mixed-distinct agg
    full = cardinality_rollup(li, "l_orderkey", "l_returnflag", rsd=0.02)
    fplan = full._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in fplan
