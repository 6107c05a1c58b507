#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Reads /tmp/verify_out/<query>/ parquet dumps + oracle_sql.json, runs each
oracle in DuckDB against the same sf dir, sorts columns by name and rows by
value, and diffs. Exit 0 iff everything matches.
"""
import sys, json, math, glob
import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
ONLY = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))

def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in order))
    return [cols[i] for i in order], sorted(out, key=lambda t: tuple(
        (x is None, str(type(x)), x if not isinstance(x, (list, tuple)) else str(x)) for x in t))

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return v
    if hasattr(v, "isoformat"): return v.isoformat()
    if isinstance(v, (list, tuple)): return tuple(norm(x) for x in v)
    try:
        import decimal
        if isinstance(v, decimal.Decimal): return float(v)
    except Exception: pass
    return v

fails = []
for name, sql in sorted(oracle.items()):
    if ONLY and name not in ONLY: continue
    files = glob.glob(f"{OUT}/{name}/*.parquet")
    if not files:
        fails.append(name); print(f"FAIL {name}: no spark output"); continue
    try:
        got = con.sql(f"SELECT * FROM '{OUT}/{name}/*.parquet'")
        gcols, grows = got.columns, got.fetchall()
        exp = con.sql(sql)
        ecols, erows = exp.columns, exp.fetchall()
    except Exception as e:
        fails.append(name); print(f"FAIL {name}: error {str(e)[:200]}"); continue
    gc, gr = canon(gcols, grows)
    ec, er = canon(ecols, erows)
    if gc != ec:
        fails.append(name); print(f"FAIL {name}: cols spark={gc} oracle={ec}"); continue
    if len(gr) != len(er):
        fails.append(name); print(f"FAIL {name}: rows spark={len(gr)} oracle={len(er)}")
        for a in gr[:3]: print("   spark:", a)
        for b in er[:3]: print("  oracle:", b)
        continue
    bad = [(a, b) for a, b in zip(gr, er) if a != b]
    if bad:
        fails.append(name)
        print(f"FAIL {name}: {len(bad)}/{len(gr)} rows differ; cols={gc}; first:")
        for a, b in bad[:3]:
            print("   spark:", a)
            print("  oracle:", b)
    else:
        print(f"ok   {name} ({len(gr)} rows)")

import os
q_no_oracle = [d.split("/")[-1] for d in glob.glob(f"{OUT}/*") if os.path.isdir(d)
               and d.split("/")[-1] not in oracle]
err_path = f"{OUT}/errors.json"
if os.path.exists(err_path):
    errs = json.load(open(err_path))
    for name, msg in sorted(errs.items()):
        if ONLY and name not in ONLY: continue
        if name not in fails: fails.append(name)
        print(f"FAIL {name}: query threw: {msg[:200]}")
for name in sorted(q_no_oracle):
    n = con.sql(f"SELECT count(*) FROM '{OUT}/{name}/*.parquet'").fetchone()[0]
    print(f"rows-only {name}: {n} rows" + ("  (EMPTY!)" if n == 0 else ""))

# fails may include rows-only names (from errors.json); count oracle
# misses separately so the summary line stays honest
oracle_fails = [f for f in fails if f in oracle]
n_oracle = len([n for n in oracle if not ONLY or n in ONLY])
print(f"\n{n_oracle - len(oracle_fails)}/{n_oracle} oracle queries match")
sys.exit(1 if fails else 0)
