#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool only, not part
of the shipped library): run graft.Verify first, then this script compares
each <out>/<name> parquet against the DuckDB oracle SQL in oracle_sql.json
over the same testdata parquet tables.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [queryName...]
"""
import json, math, sys
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, bytes):
        return v.hex()
    if hasattr(v, "isoformat"):  # datetime / pandas Timestamp / date
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, canon(x)) for k, x in v.items()))
    return v

def rows_of(cols_sorted, table):
    data = [table[c] for c in cols_sorted]
    return sorted(
        (tuple(canon(col[i]) for col in data) for i in range(len(data[0]) if data else 0)),
        key=repr)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failed = []
    import glob, os
    # Verify writes each result as a parquet DIRECTORY named <name>.parquet
    # (driver contract); also accept bare <name> dirs from older dumps.
    names = sorted(d.removesuffix(".parquet") for d in os.listdir(out_dir)
                   if os.path.isdir(f"{out_dir}/{d}"))
    for name in names:
        if only and name not in only:
            continue
        files = (glob.glob(f"{out_dir}/{name}.parquet/*.parquet")
                 or glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL  {name}: no spark output"); failed.append(name); continue
        spark_t = pq.read_table(files[0]).to_pydict()
        if name not in oracle:
            n = len(next(iter(spark_t.values()), []))
            print(f"SKIP  {name}: rows-only ({n} rows)"); continue
        try:
            duck = con.execute(oracle[name]).arrow().to_pydict()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}"); failed.append(name); continue
        sc, dc = sorted(spark_t.keys()), sorted(duck.keys())
        if sc != dc:
            print(f"FAIL  {name}: columns spark={sc} duck={dc}"); failed.append(name); continue
        sr, dr = rows_of(sc, spark_t), rows_of(dc, duck)
        if len(sr) != len(dr):
            print(f"FAIL  {name}: rows spark={len(sr)} duck={len(dr)}"); failed.append(name); continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(sr, dr)) if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL  {name}: {len(bad)}/{len(sr)} rows differ; first at {i}:")
            print(f"      cols : {sc}")
            print(f"      spark: {a}")
            print(f"      duck : {b}")
            failed.append(name)
        else:
            print(f"OK    {name}: {len(sr)} rows")
    print(f"\n{len(failed)} failures" + (": " + ", ".join(failed) if failed else ""))
    sys.exit(1 if failed else 0)

if __name__ == "__main__":
    main()
