#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query result
parquet dumped by graft.Verify, run the matching oracle SQL in DuckDB over
the same sf tables and compare rows/schema/values (columns sorted by name,
values compared with a small float tolerance after rounding).

Usage: check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys
from pathlib import Path

import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.loads(Path(f"{outdir}/oracle_sql.json").read_text())
fails = 0
for name, sql in sorted(oracle.items()):
    res_dir = Path(outdir) / name
    if not res_dir.exists():
        print(f"FAIL {name}: no spark result dir")
        fails += 1
        continue
    got = con.sql(
        f"SELECT * FROM '{res_dir}/*.parquet'").fetchall()
    got_cols = [d[0] for d in con.sql(
        f"SELECT * FROM '{res_dir}/*.parquet' LIMIT 0").description]
    try:
        exp_rel = con.sql(sql)
        exp = exp_rel.fetchall()
        exp_cols = [d[0] for d in exp_rel.description]
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}")
        fails += 1
        continue
    if sorted(got_cols) != sorted(exp_cols):
        print(f"FAIL {name}: cols {sorted(got_cols)} != {sorted(exp_cols)}")
        fails += 1
        continue
    gi = [got_cols.index(c) for c in sorted(got_cols)]
    ei = [exp_cols.index(c) for c in sorted(exp_cols)]
    g = [tuple(r[i] for i in gi) for r in got]
    e = [tuple(r[i] for i in ei) for r in exp]
    if len(g) != len(e):
        print(f"FAIL {name}: rows {len(g)} != {len(e)}")
        fails += 1
        continue

    def eq(a, b):
        if isinstance(a, float) and isinstance(b, float):
            if math.isnan(a) and math.isnan(b):
                return True
            return abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
        return str(a) == str(b)

    bad = None
    for i, (gr, er) in enumerate(zip(sorted(g, key=str), sorted(e, key=str))):
        if not all(eq(a, b) for a, b in zip(gr, er)):
            bad = (i, gr, er)
            break
    if bad:
        print(f"FAIL {name}: row {bad[0]}\n  spark={bad[1]}\n  duck ={bad[2]}")
        fails += 1
    else:
        print(f"OK   {name}: {len(g)} rows")

print(f"\n{len(oracle) - fails}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
