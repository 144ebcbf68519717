#!/usr/bin/env python3
"""Local pre-check mimicking the driver's DuckDB oracle compare.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB over the same
sfDir tables, and compares row count, column names, and values (exact;
column order normalized by sorting names, row order normalized by
sorting all columns — stricter than needed if the driver hashes in
ORDER BY order, since both sides already ORDER BY deterministically).
"""
import sys, json, glob, math
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fail = 0

# Lint EVERY declared output (oracled or not) for nested-typed columns:
# the driver's pandas harness sort_values/hashes each frame and throws
# `unhashable type: numpy.ndarray` on array/struct/map columns (the
# q191/q192 class). Catch it pre-driver.
def is_nested(v):
    return isinstance(v, (list, dict)) or type(v).__name__ == "ndarray"

for d in sorted(glob.glob(f"{outdir}/*/")):
    qname = d.rstrip("/").split("/")[-1]
    files = sorted(glob.glob(f"{d}*.parquet"))
    if not files:
        continue
    try:
        one = con.execute(
            f"SELECT * FROM read_parquet({files!r}) LIMIT 1").fetchdf()
    except Exception as e:
        print(f"FAIL {qname}: unreadable output: {str(e)[:120]}")
        fail += 1
        continue
    nested = [c for c in one.columns if len(one) and is_nested(one[c].iloc[0])]
    if nested:
        print(f"FAIL {qname}: nested-typed output column(s) {nested} "
              f"(driver pandas harness cannot hash array/struct/map)")
        fail += 1

for name, sql in sorted(oracle.items()):
    spark_files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
    if not spark_files:
        print(f"FAIL {name}: no spark output")
        fail += 1
        continue
    try:
        got = con.execute(
            f"SELECT * FROM read_parquet({spark_files!r})").fetchdf()
        want = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: {str(e)[:200]}")
        fail += 1
        continue
    gcols, wcols = sorted(got.columns), sorted(want.columns)
    if gcols != wcols:
        print(f"FAIL {name}: columns {gcols} vs {wcols}")
        fail += 1
        continue
    # The driver HASHES frames, so equal values in different dtypes
    # still fail there (e.g. DuckDB SUM(BIGINT) → HUGEINT → float64 vs
    # Spark int64 — the q162 class). Fail on dtype drift here so it
    # can never hide behind ==-equality again.
    dtype_drift = [(c, str(got[c].dtype), str(want[c].dtype))
                   for c in gcols if got[c].dtype != want[c].dtype]
    if dtype_drift:
        print(f"FAIL {name}: dtype drift (spark vs oracle): {dtype_drift}")
        fail += 1
        continue
    g = got[gcols].sort_values(gcols).reset_index(drop=True)
    w = want[wcols].sort_values(wcols).reset_index(drop=True)
    if len(g) != len(w):
        print(f"FAIL {name}: rows {len(g)} vs {len(w)}")
        fail += 1
        continue
    mismatch = None
    for c in gcols:
        for i, (a, b) in enumerate(zip(g[c], w[c])):
            eq = (a == b) or (a is None and b is None)
            if not eq:
                try:
                    import pandas as pd
                    if pd.isna(a) and pd.isna(b):
                        eq = True
                except (TypeError, ValueError):
                    pass
            if not eq:
                mismatch = (c, i, a, b)
                break
        if mismatch:
            break
    if mismatch:
        c, i, a, b = mismatch
        print(f"FAIL {name}: col {c} row {i}: spark={a!r} oracle={b!r}")
        fail += 1
    else:
        print(f"OK   {name} ({len(g)} rows)")
print(f"\n{'ALL OK' if fail == 0 else f'{fail} FAILURES'} / {len(oracle)} oracled queries")
sys.exit(1 if fail else 0)
