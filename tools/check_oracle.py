#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: compare Verify's
parquet dumps against DuckDB runs of oracle_sql.json (column-name-sorted,
row-order-insensitive)."""
import sys, json, glob, os
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fail = 0
for name in sorted(os.listdir(out_dir)):
    d = os.path.join(out_dir, name)
    if not os.path.isdir(d):
        continue
    files = glob.glob(f"{d}/*.parquet")
    spark_df = duckdb.connect().execute(
        f"SELECT * FROM read_parquet({files!r})").fetchdf()
    if name not in oracle:
        print(f"  [rows-only] {name}: {len(spark_df)} rows")
        continue
    try:
        ora_df = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        print(f"✗ {name}: ORACLE SQL ERROR: {e}")
        fail += 1
        continue
    a = spark_df[sorted(spark_df.columns)]
    b = ora_df[sorted(ora_df.columns)]
    if list(a.columns) != list(b.columns):
        print(f"✗ {name}: columns {list(a.columns)} vs {list(b.columns)}")
        fail += 1
        continue
    if len(a) != len(b):
        print(f"✗ {name}: rows {len(a)} vs {len(b)}")
        fail += 1
        continue
    dt_a, dt_b = list(map(str, a.dtypes)), list(map(str, b.dtypes))
    # list/array cells (numpy arrays from parquet, lists from duckdb)
    # are unhashable/unsortable — normalize to tuples on BOTH sides so
    # multi-key sorts and exact compare treat them as plain values
    def norm(df):
        df = df.copy()
        for c in df.columns:
            if df[c].dtype == object and df[c].map(
                    lambda v: hasattr(v, "__len__") and not isinstance(v, (str, bytes))).any():
                df[c] = df[c].map(lambda v: tuple(v) if hasattr(v, "__iter__")
                                  and not isinstance(v, (str, bytes)) else v)
        return df
    a, b = norm(a), norm(b)
    a2 = a.sort_values(by=list(a.columns)).reset_index(drop=True)
    b2 = b.sort_values(by=list(b.columns)).reset_index(drop=True)
    try:
        pd.testing.assert_frame_equal(a2, b2, check_dtype=True, check_exact=True)
        print(f"✓ {name}: {len(a)} rows")
    except AssertionError as e:
        msg = str(e).split("\n")[0]
        if dt_a != dt_b:
            msg = f"dtypes {dt_a} vs {dt_b}; " + msg
        print(f"✗ {name}: {msg}")
        fail += 1
print("FAILURES:", fail)
sys.exit(1 if fail else 0)
