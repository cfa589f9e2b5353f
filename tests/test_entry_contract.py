"""Driver-contract tests for __spark_entry__: entry() runs, queries() and
oracle_sql() stay aligned, and a fast oracle subset matches DuckDB at
sf0.001 (the full sweep runs in scripts_check_oracles.py / driver rounds)."""

import duckdb
import pytest

import __spark_entry__ as entry_mod

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

FAST_ORACLE_SUBSET = [
    "exact_dedup_stats",
    "token_count_rollup",
    "goal_regex_rollup",
    "pricing_summary",
    "snapshot_diff",
    "latest_event_per_user",
    "ann_topk_cosine",
]


def test_entry_returns_stable_schema(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert set(df.columns) >= {"lang", "docs", "goals", "bmps"}


def test_queries_and_oracles_aligned():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert len(qs) >= 20
    # every oracle key must have a query; extraction queries may be rows-only
    missing = set(oracles) - set(qs)
    assert not missing, f"oracle_sql keys without queries(): {missing}"
    assert len(oracles) >= 14


def test_dormant_registry_aligned():
    """extra_queries() (REGISTRY.md promotion pool) must stay disjoint from
    the live registry and every extra oracle must have a query."""
    qs = entry_mod.queries()
    extra = entry_mod.extra_queries()
    extra_oracles = entry_mod.extra_oracle_sql()
    assert not set(extra) & set(qs), "dormant query shadows a live one"
    assert not set(extra_oracles) - set(extra)
    # promotion contract: the bench HEADLINE entry must exist
    assert "webclean_corpus" in extra


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", FAST_ORACLE_SUBSET)
def test_oracle_match(spark, sf_dir, duck, name):
    """Mimics the driver's compare: sorted columns, stringified sorted rows."""
    sdf = entry_mod.queries()[name](spark, sf_dir)
    oracle = entry_mod.oracle_sql()[name]
    spark_rows = sdf.collect()
    ddf = duck.execute(oracle).fetchdf()
    scols = sorted(sdf.columns)
    dcols = sorted(ddf.columns.tolist())
    assert scols == dcols, f"schema mismatch: {scols} vs {dcols}"
    s_vals = sorted(tuple(str(r[c]) for c in scols) for r in spark_rows)
    d_vals = sorted(tuple(str(v) for v in row) for row in ddf[scols].itertuples(index=False))
    assert len(s_vals) == len(d_vals)
    assert s_vals == d_vals


@pytest.mark.parametrize("name", sorted(entry_mod.extra_oracle_sql()))
def test_dormant_oracle_match(spark, sf_dir, duck, name):
    """Every dormant query that carries a full SQL oracle gets the same
    driver-style compare so (re-)promotion is risk-free (REGISTRY.md).
    After the round-5 swap this covers the five parked TPC-H queries."""
    sdf = entry_mod.extra_queries()[name](spark, sf_dir)
    oracle = entry_mod.extra_oracle_sql()[name]
    spark_rows = sdf.collect()
    ddf = duck.execute(oracle).fetchdf()
    scols = sorted(sdf.columns)
    assert scols == sorted(ddf.columns.tolist())
    s_vals = sorted(tuple(str(r[c]) for c in scols) for r in spark_rows)
    d_vals = sorted(tuple(str(v) for v in row) for row in ddf[scols].itertuples(index=False))
    assert s_vals == d_vals


def test_dormant_semdedup_stats_smoke(spark, sf_dir):
    """Rows-only gate for the semantic-dedup query: one accounting row
    whose counters tie out against the embeddings table."""
    n = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    rows = entry_mod.extra_queries()["semdedup_stats"](spark, sf_dir).collect()
    assert len(rows) == 1
    d = rows[0].asDict()
    assert d["n_docs"] == n
    assert d["n_kept"] + d["n_dropped"] == n
    assert 0 < d["n_kept"] <= n
    assert 1 <= d["n_clusters"] <= 16


def test_dormant_webclean_corpus_smoke(spark, sf_dir):
    """Rows-only gate for the composed-pipeline query: exactly one
    accounting row with non-negative stage counters."""
    rows = entry_mod.extra_queries()["webclean_corpus"](spark, sf_dir).collect()
    assert len(rows) == 1
    d = rows[0].asDict()
    assert all(v is None or v >= 0 for v in d.values()), d


def test_dormant_webclean_full_smoke(spark, sf_dir):
    """Rows-only gate for the full selection/assembly prep: one
    accounting row whose counters are internally consistent."""
    rows = entry_mod.extra_queries()["webclean_full"](spark, sf_dir).collect()
    assert len(rows) == 1
    d = rows[0].asDict()
    assert d["docs_kept"] > 0 and d["n_shards"] >= 1
    assert d["nb_scored"] == d["docs_kept"]  # every kept doc was scored
    assert d["total_tokens"] > 0
