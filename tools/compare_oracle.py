#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
  - loads each <outDir>/<name> parquet (Spark result)
  - registers <sfDir>/*.parquet as DuckDB views, runs oracle_sql.json[name]
  - compares schema (sorted column names), row count, and a hash of the
    row-sorted, column-name-sorted values.
Usage: compare_oracle.py <sfDir> <outDir>
"""
import sys, os, json, glob, hashlib
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

def canon(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize: floats to repr with rounding guard, ints to int, None stable
    def cell(v):
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return "NULL"
        if isinstance(v, float):
            return repr(round(v, 9))
        return str(v)
    rows = sorted(",".join(cell(v) for v in row) for row in df.itertuples(index=False, name=None))
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()

fails = 0
for name, sql in sorted(oracle.items()):
    spark_path = os.path.join(out_dir, name)
    if not os.path.isdir(spark_path):
        print(f"MISSING  {name}: no spark output")
        fails += 1
        continue
    try:
        got = pd.read_parquet(spark_path)
        want = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"ERROR    {name}: {e}")
        fails += 1
        continue
    sc, wc = sorted(got.columns), sorted(want.columns)
    if sc != wc:
        print(f"SCHEMA   {name}: spark={sc} duck={wc}")
        fails += 1
        continue
    if len(got) != len(want):
        print(f"ROWS     {name}: spark={len(got)} duck={len(want)}")
        fails += 1
        continue
    if canon(got) != canon(want):
        print(f"HASH     {name}: value mismatch ({len(got)} rows)")
        # show a small diff sample
        g = got.reindex(sorted(got.columns), axis=1).sort_values(by=sorted(got.columns)).reset_index(drop=True)
        w = want.reindex(sorted(want.columns), axis=1).sort_values(by=sorted(want.columns)).reset_index(drop=True)
        neq = (g.astype(str) != w.astype(str)).any(axis=1)
        print(pd.concat([g[neq].head(3).add_prefix("s_"), w[neq].head(3).add_prefix("d_")], axis=1).to_string())
        fails += 1
        continue
    print(f"OK       {name}: {len(got)} rows")

# rows-only entries (no oracle)
import pathlib
for d in sorted(os.listdir(out_dir)):
    p = os.path.join(out_dir, d)
    if os.path.isdir(p) and d not in oracle:
        try:
            n = len(pd.read_parquet(p))
            print(f"ROWSONLY {d}: {n} rows {'OK' if n > 0 else 'EMPTY!'}")
            if n == 0: fails += 1
        except Exception as e:
            print(f"ROWSONLY {d}: ERROR {e}")
            fails += 1

sys.exit(1 if fails else 0)
