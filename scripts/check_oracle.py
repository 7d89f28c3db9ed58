#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: compare each
Verify-dumped parquet result against its DuckDB oracle over the same
testdata dir. Usage: check_oracle.py <verifyOutDir> <sfDir>"""
import sys, os, json, math
import duckdb

out_dir, sf_dir = sys.argv[1], sys.argv[2]
oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

con = duckdb.connect()
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

def canon_rows(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                vals.append(f"{v!r}")
            else:
                vals.append(str(v))
        out.append("|".join(vals))
    return sorted(out)

fails = 0
for name, sql in sorted(oracle.items()):
    res_path = os.path.join(out_dir, name)
    if not os.path.isdir(res_path):
        print(f"MISSING  {name}: no spark result dumped")
        fails += 1
        continue
    try:
        exp = con.sql(sql)
        exp_cols = [c.lower() for c in exp.columns]
        exp_rows = canon_rows(exp.fetchall(), exp_cols)
    except Exception as e:
        print(f"ORACLE-ERR {name}: {e}")
        fails += 1
        continue
    try:
        act = con.sql(f"SELECT * FROM '{res_path}/*.parquet'")
        act_cols = [c.lower() for c in act.columns]
        act_rows = canon_rows(act.fetchall(), act_cols)
    except Exception as e:
        print(f"READ-ERR {name}: {e}")
        fails += 1
        continue
    if sorted(exp_cols) != sorted(act_cols):
        print(f"SCHEMA   {name}: spark={sorted(act_cols)} oracle={sorted(exp_cols)}")
        fails += 1
    elif exp_rows != act_rows:
        diff_a = [r for r in act_rows if r not in set(exp_rows)][:3]
        diff_e = [r for r in exp_rows if r not in set(act_rows)][:3]
        print(f"MISMATCH {name}: rows spark={len(act_rows)} oracle={len(exp_rows)}")
        print(f"  spark-only: {diff_a}")
        print(f"  oracle-only: {diff_e}")
        fails += 1
    else:
        print(f"OK       {name}: {len(act_rows)} rows")
print(f"\n{len(oracle) - fails}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
