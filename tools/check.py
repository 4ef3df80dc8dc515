#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: read Verify.scala's parquet
dumps + oracle_sql.json, run each oracle in DuckDB over the same testdata
parquet tables, and diff (column names sorted, rows sorted, exact values).

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [queryPrefix ...]

Trailing args restrict the compare to queries whose name starts with any
given prefix (for subset sweeps where Verify dumped only those queries —
e.g. the sf1 heavy-family scale sweep).
"""
import json, math, sys
from decimal import Decimal
import duckdb
import pyarrow.parquet as pq
import pyarrow.dataset as ds

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # The driver hashes raw values, so -0.0 vs +0.0 is a mismatch even
        # though Python's == treats them equal (r5 q99 lesson).
        if v == 0.0 and math.copysign(1.0, v) < 0:
            return "-0.0"
        return v
    if isinstance(v, Decimal):
        # Strict representation: trailing-zero / scale differences are
        # driver-hash mismatches even when numerically equal.
        return f"dec:{v}"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return v


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(type(x)), x) for x in t))
    return [cols[i] for i in order], out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    import os
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        # driver fixtures are single files; builder-generated sf1 tables
        # are Spark-written directories of part files
        if os.path.isdir(path):
            path += "/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    only = sys.argv[3:]
    if only:
        oracle = {k: v for k, v in oracle.items()
                  if any(k.startswith(p) for p in only)}
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            tbl = ds.dataset(f"{out_dir}/{name}", format="parquet").to_table()
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_fail += 1
            continue
        s_cols = tbl.column_names
        s_rows = [tuple(r[c] for c in s_cols) for r in tbl.to_pylist()]
        try:
            res = con.execute(sql)
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        sc, sr = norm_rows(s_cols, s_rows)
        dc, dr = norm_rows(d_cols, d_rows)
        if sc != dc:
            print(f"FAIL {name}: columns spark={sc} duckdb={dc}")
            n_fail += 1
            continue
        if len(sr) != len(dr):
            print(f"FAIL {name}: rowcount spark={len(sr)} duckdb={len(dr)}")
            print(f"  spark head: {sr[:3]}")
            print(f"  duck  head: {dr[:3]}")
            n_fail += 1
            continue
        bad = [(a, b) for a, b in zip(sr, dr) if a != b]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(sr)} rows differ; cols={sc}; first diffs:")
            for a, b in bad[:3]:
                print(f"  spark={a}\n  duck ={b}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(sr)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
