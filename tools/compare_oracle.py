#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: for each query output
parquet written by graft.Verify, run the corresponding DuckDB oracle SQL on
the raw test tables and compare schema/rows/values (floats to 6 sig places).

Usage: compare_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os, math
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-len(".parquet")]
    con.sql(f"CREATE VIEW {name} AS FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6g}"
    return str(v)

fails = 0
for qname in sorted(oracle):
    sql = oracle[qname]
    qdir = f"{out_dir}/{qname}"
    try:
        got = con.sql(f"FROM read_parquet('{qdir}/*.parquet')").fetchall()
        gcols = [d[0] for d in con.sql(f"FROM read_parquet('{qdir}/*.parquet') LIMIT 0").description]
        exp = con.sql(sql).fetchall()
        ecols = [d[0] for d in con.sql(f"SELECT * FROM ({sql}) LIMIT 0").description]
    except Exception as e:
        print(f"FAIL {qname}: error {type(e).__name__}: {str(e)[:300]}")
        fails += 1
        continue
    if sorted(gcols) != sorted(ecols):
        print(f"FAIL {qname}: columns spark={sorted(gcols)} oracle={sorted(ecols)}")
        fails += 1
        continue
    # driver sorts columns by name before hashing
    gidx = [gcols.index(c) for c in sorted(gcols)]
    eidx = [ecols.index(c) for c in sorted(ecols)]
    g = [tuple(canon(r[i]) for i in gidx) for r in got]
    e = [tuple(canon(r[i]) for i in eidx) for r in exp]
    if len(g) != len(e):
        print(f"FAIL {qname}: rows spark={len(g)} oracle={len(e)}")
        fails += 1
        continue
    bad = [(i, a, b) for i, (a, b) in enumerate(zip(g, e)) if a != b]
    if bad:
        i, a, b = bad[0]
        print(f"FAIL {qname}: {len(bad)} mismatched rows; first at {i}:\n  spark={a}\n  duck ={b}  cols={sorted(gcols)}")
        fails += 1
    else:
        print(f"ok   {qname} ({len(g)} rows)")

missing = [q for q in oracle if not os.path.isdir(f"{out_dir}/{q}")]
print(f"\n{len(oracle) - fails}/{len(oracle)} oracle queries pass; missing outputs: {missing}")
sys.exit(1 if fails else 0)
