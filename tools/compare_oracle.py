#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: for each query output
parquet written by graft.Verify, run the corresponding DuckDB oracle SQL on
the raw test tables and compare schema/rows/values (floats to 6 sig places).

Faithfulness to the driver's gate (learned the hard way in round 6):
the driver loads both sides into pandas, sorts rows, and hashes values —
a pipeline that (a) crashes on non-primitive columns (array<string> ->
"unhashable type: numpy.ndarray") and (b) is dtype-sensitive for DECIMAL,
so the same numeric value at DECIMAL(22,2) vs DECIMAL(38,2) can hash
differently. This comparator therefore REJECTS what the driver would
reject, before value comparison:
  * any LIST/STRUCT/MAP/UNION output column on either side;
  * any DECIMAL output column whose declared type differs between the
    Spark output and the oracle result;
  * any DECIMAL output column at all is flagged (gate-risky): pin the
    presentation (cast to STRING or a matching explicit type) instead.

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
# subset mode mirrors Verify's SPARK_GRAFT_VERIFY_QUERIES (local iteration)
_subset = os.environ.get("GRAFT_COMPARE_QUERIES")
if _subset:
    keep = set(_subset.split(","))
    unknown = keep - set(oracle)
    assert not unknown, f"GRAFT_COMPARE_QUERIES names not in oracle_sql.json: {sorted(unknown)}"
    oracle = {k: v for k, v in oracle.items() if k in keep}

NON_PRIMITIVE = ("[]", "STRUCT", "MAP(", "UNION(", "LIST(")


def col_types(sql):
    """name -> declared DuckDB type string for a query/scan."""
    rows = con.sql(f"DESCRIBE {sql}").fetchall()
    return {r[0]: r[1] for r in rows}


def gate_type_problems(qname, spark_types, oracle_types):
    """Mimic the driver's hasher constraints; return list of problem strings."""
    probs = []
    for side, types in (("spark", spark_types), ("oracle", oracle_types)):
        for c, t in types.items():
            if any(m in t for m in NON_PRIMITIVE):
                probs.append(
                    f"non-primitive {side} column {c}: {t} "
                    "(driver's pandas hasher crashes on array/struct/map — "
                    "present as a string, e.g. array_join/array_to_string)")
    for c in set(spark_types) & set(oracle_types):
        st, ot = spark_types[c], oracle_types[c]
        if "DECIMAL" in st or "DECIMAL" in ot:
            if st != ot:
                probs.append(
                    f"decimal type mismatch on {c}: spark={st} oracle={ot} "
                    "(driver's canonicalizer is decimal-width-sensitive — "
                    "pin both sides to one type or cast to STRING)")
            else:
                probs.append(
                    f"decimal output column {c}: {st} "
                    "(gate-risky even when widths match — prefer STRING "
                    "presentation at the output boundary)")
    return probs


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
        spark_scan = f"SELECT * FROM read_parquet('{qdir}/*.parquet')"
        got = con.sql(spark_scan).fetchall()
        gtypes = col_types(spark_scan)
        exp = con.sql(sql).fetchall()
        etypes = col_types(f"SELECT * FROM ({sql})")
    except Exception as e:
        print(f"FAIL {qname}: error {type(e).__name__}: {str(e)[:300]}")
        fails += 1
        continue
    gcols, ecols = list(gtypes), list(etypes)
    if sorted(gcols) != sorted(ecols):
        print(f"FAIL {qname}: columns spark={sorted(gcols)} oracle={sorted(ecols)}")
        fails += 1
        continue
    probs = gate_type_problems(qname, gtypes, etypes)
    if probs:
        for p in probs:
            print(f"FAIL {qname}: {p}")
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
