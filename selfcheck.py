"""Self-run of the correctness gate: every __ray_entry__.queries() entry
at a given sf tier, compared with its oracle_sql() via DuckDB
(row-count + schema + exact values, order-insensitive).

Usage: python selfcheck.py [SF_DIR] [QUERY ...]
(default /root/testdata/sf0.01, all queries)
Exits non-zero if any oracle-backed entry mismatches."""
import os, sys, json
sys.path.insert(0, "/root/repo"); os.chdir("/root/repo")
import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray

ray.init(address="local", num_cpus=32, include_dashboard=False,
         logging_level="ERROR")
import __ray_entry__ as E

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
qs, sqls = E.queries(), E.oracle_sql()
if len(sys.argv) > 2:
    only = set(sys.argv[2:])
    unknown = only - set(qs)
    if unknown:
        sys.exit(f"unknown queries: {sorted(unknown)}")
    qs = {k: v for k, v in qs.items() if k in only}
con = duckdb.connect()
# DuckDB's default temp dir is cwd-relative ".tmp" — route any oracle
# spill to /tmp so a heavy oracle can never dirty the repo tree
con.execute("SET temp_directory='/tmp/olu_duckdb_spill'")
for tb in ["region", "nation", "customer", "supplier", "part", "orders",
           "lineitem", "events", "documents", "embeddings"]:
    con.execute(
        f"CREATE VIEW {tb} AS SELECT * FROM read_parquet('{SF}/{tb}.parquet')"
    )

def to_df(res):
    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return pa.Table.from_pylist(res.take_all()).to_pandas() if not hasattr(res, "to_pandas") else res.to_pandas()

fails, okc, rows_only = [], 0, 0
for name, fn in qs.items():
    try:
        res = to_df(fn(SF))
        if name not in sqls:
            rows_only += 1
            print(f"{name}: rows-only ({len(res)} rows)", flush=True)
            continue
        ora = con.execute(sqls[name]).fetchdf()
        cols = sorted(res.columns)
        if sorted(ora.columns) != cols:
            fails.append((name, f"schema {sorted(ora.columns)} vs {cols}"))
            continue
        a = res[cols].sort_values(cols).reset_index(drop=True)
        b = ora[cols].sort_values(cols).reset_index(drop=True)
        if len(a) != len(b):
            fails.append((name, f"rows {len(a)} vs {len(b)}"))
            continue
        try:
            pd.testing.assert_frame_equal(
                a, b.astype(a.dtypes.to_dict()), check_exact=True
            )
        except AssertionError as ex:
            fails.append((name, "hash: " + str(ex).splitlines()[0]))
            continue
        okc += 1
        print(f"{name}: OK ({len(a)} rows)", flush=True)
    except Exception as ex:
        fails.append((name, f"ERROR {type(ex).__name__}: {ex}"))

print(f"\n=== {okc} oracle-pass, {rows_only} rows-only, {len(fails)} FAIL ===")
for n, why in fails:
    print("FAIL", n, why)
ray.shutdown()
sys.exit(1 if fails else 0)
