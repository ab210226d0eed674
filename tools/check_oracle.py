#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB correctness gate.

Runs each oracle SQL from <outdir>/oracle_sql.json against DuckDB views
over the sf-dir parquet tables, loads the Spark result parquet written
by graft.Verify, and compares as multisets of rows (columns sorted by
name, values normalized). Dev-only tool; the real gate is driver-side.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6g}"
    if isinstance(v, list):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return str(v)


def rows_key(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm(r[i]) for i in order) for r in rows)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = n_skip = 0
    for name, sql in sorted(oracle.items()):
        import os
        if not os.path.isdir(f"{out_dir}/{name}"):
            # not dumped this run (SPARK_GRAFT_VERIFY_ONLY) — not a failure
            n_skip += 1
            continue
        try:
            o = con.sql(sql)
            ocols, orows = [d[0] for d in o.description], o.fetchall()
            s = con.sql(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            scols, srows = [d[0] for d in s.description], s.fetchall()
            if sorted(ocols) != sorted(scols):
                print(f"FAIL {name}: cols oracle={sorted(ocols)} spark={sorted(scols)}")
                n_bad += 1
                continue
            ok, sk = rows_key(orows, ocols), rows_key(srows, scols)
            if ok == sk:
                print(f"ok   {name} ({len(srows)} rows)")
                n_ok += 1
            else:
                n_bad += 1
                diff_o = [r for r in ok if r not in set(map(tuple, sk))][:3]
                diff_s = [r for r in sk if r not in set(map(tuple, ok))][:3]
                print(f"FAIL {name}: rows oracle={len(orows)} spark={len(srows)}")
                print(f"     oracle-only: {diff_o}")
                print(f"     spark-only:  {diff_s}")
        except Exception as e:
            n_bad += 1
            print(f"ERR  {name}: {str(e)[:300]}")
    print(f"== {n_ok} ok, {n_bad} bad" +
          (f", {n_skip} not dumped (skipped)" if n_skip else ""))
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
