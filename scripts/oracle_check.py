#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run each oracle SQL in
DuckDB over the same parquet tables and compare against the Spark result
dump (columns sorted by name, values stringified and hashed)."""
import duckdb, glob, hashlib, json, math, os, sys

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_sf001"

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 6))
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)

def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    h = hashlib.sha256()
    for r in rows:
        h.update("|".join(canon(r[i]) for i in order).encode())
        h.update(b"\n")
    return h.hexdigest()

fails = 0
for name, sql in sorted(oracle.items()):
    err_marker = f"{out_dir}/{name}/_error.txt"
    if os.path.exists(err_marker):
        first = open(err_marker).readline().strip()
        print(f"ERR      {name}: {first}")
        fails += 1
        continue
    spark_glob = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not spark_glob:
        print(f"MISSING  {name}: no spark output")
        fails += 1
        continue
    s = con.execute(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
    s_cols = [d[0] for d in s.description]
    s_rows = s.fetchall()
    try:
        d = con.execute(sql)
        d_cols = [d2[0] for d2 in d.description]
        d_types = [str(d2[1]) for d2 in d.description]
        d_rows = d.fetchall()
    except Exception as e:
        print(f"ORACLE-ERR {name}: {e}")
        fails += 1
        continue
    # the driver's compare coerces DuckDB results through pandas, where an
    # int128 (HUGEINT, e.g. an uncast sum(BIGINT)) becomes float and its
    # stringified form ("3444.0") no longer matches Spark's int ("3444").
    # This local fetchall() path keeps python ints and would pass — so flag
    # the type itself, hard, before it flakes only in the driver's run.
    huge = [c for c, t in zip(d_cols, d_types) if "HUGEINT" in t.upper()]
    if huge:
        print(f"LINT     {name}: oracle returns HUGEINT column(s) {huge} — "
              f"CAST the sum to BIGINT in the oracle SQL")
        fails += 1
        continue
    if sorted(s_cols) != sorted(d_cols):
        print(f"SCHEMA   {name}: spark={sorted(s_cols)} duck={sorted(d_cols)}")
        fails += 1
        continue
    if len(s_rows) != len(d_rows):
        print(f"ROWS     {name}: spark={len(s_rows)} duck={len(d_rows)}")
        fails += 1
        continue
    hs, hd = table_hash(s_cols, s_rows), table_hash(d_cols, d_rows)
    if hs != hd:
        order_s = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
        order_d = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
        for i, (rs, rd) in enumerate(zip(s_rows, d_rows)):
            cs = [canon(rs[j]) for j in order_s]
            cd = [canon(rd[j]) for j in order_d]
            if cs != cd:
                print(f"HASH     {name}: first diff row {i}:")
                print(f"  cols:  {sorted(s_cols)}")
                print(f"  spark: {cs}")
                print(f"  duck:  {cd}")
                break
        else:
            print(f"HASH     {name}: same rows, hash diff (ordering?)")
        fails += 1
        continue
    print(f"OK       {name} ({len(s_rows)} rows)")

print(f"\n{len(oracle) - fails}/{len(oracle)} oracle queries match")
sys.exit(1 if fails else 0)
