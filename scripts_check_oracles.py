"""Local mimic of the driver's correctness gate: run each queries() entry on
Spark at sf0.01 and its oracle_sql() on DuckDB, compare row count + schema +
order-insensitive values. Also checks the DORMANT extra_queries() the same
way (driver registry is capped at 50; see REGISTRY.md)."""
import sys
import duckdb
import __spark_entry__ as entry_mod
from pdfextractor_spark.session import get_spark

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

spark = get_spark(cores=8)
con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

fails = []


def check(name: str, fn, oracle: str | None, tag: str = "") -> None:
    try:
        sdf = fn(spark, SF)
        spark_rows = sdf.collect()
        ncols = len(sdf.columns)
        if oracle is None:
            print(f"[rows-only]{tag} {name}: {len(spark_rows)} rows x {ncols} cols OK")
            return
        ddf = con.execute(oracle).fetchdf()
        # order-insensitive compare: sort columns by name, then rows
        scols = sorted(sdf.columns)
        s_vals = sorted([tuple(str(r[c]) for c in scols) for r in spark_rows])
        dcols = sorted(ddf.columns.tolist())
        if scols != dcols:
            fails.append((name, f"schema mismatch: {scols} vs {dcols}"))
            return
        d_vals = sorted([tuple(str(v) for v in row) for row in ddf[scols].itertuples(index=False)])
        if len(s_vals) != len(d_vals):
            fails.append((name, f"row count {len(s_vals)} vs {len(d_vals)}"))
            return
        mism = [i for i, (a, b) in enumerate(zip(s_vals, d_vals)) if a != b]
        if mism:
            i = mism[0]
            fails.append((name, f"{len(mism)} value mismatches; first: spark={s_vals[i]} duck={d_vals[i]}"))
        else:
            print(f"[oracle-OK]{tag}  {name}: {len(s_vals)} rows match")
    except Exception as e:
        fails.append((name, f"EXCEPTION {type(e).__name__}: {e}"))


oracles = entry_mod.oracle_sql()
for name, fn in entry_mod.queries().items():
    check(name, fn, oracles.get(name))
extra_oracles = getattr(entry_mod, "extra_oracle_sql", lambda: {})()
for name, fn in getattr(entry_mod, "extra_queries", lambda: {})().items():
    check(name, fn, extra_oracles.get(name), tag="[dormant]")
print()
if fails:
    for n, msg in fails:
        print(f"FAIL {n}: {msg[:400]}")
    sys.exit(1)
print("ALL ORACLES MATCH")
