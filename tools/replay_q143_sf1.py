#!/usr/bin/env python3
"""Staged sf1 replay of the q143 (near-dedup standing-state deletes)
oracle.

Same infeasibility and same cure as replay_q94_sf16.py: the registered
one-shot oracle rebuilds every MinHash signature in one statement and
DuckDB's allocator dies (or spills the disk away) inside the
shingle x 64-param cross join at sf >= 1. The signature table is built
per doc_id chunk (identical arithmetic), then the banding / candidate /
estimate / survivor tail runs over the complete table — with q143's one
delta: history docs in the DELETED set (doc_id < 250 AND doc_id % 7 = 1)
are excluded from the SHADOWING side, exactly the tombstone anti-join's
semantics — and the survivor set is compared against the Spark dump.

Usage: python3 tools/replay_q143_sf1.py <sfDir> <verifyOutDir> [chunks]
"""
import sys
import duckdb
import pyarrow.dataset as ds

sf_dir, out_dir = sys.argv[1], sys.argv[2]
chunks = int(sys.argv[3]) if len(sys.argv) > 3 else 32

con = duckdb.connect()
con.execute("SET memory_limit='45GB'")
con.execute("SET threads=16")
con.execute("SET temp_directory='/tmp/duckdb_spill_q143'")

docs = f"read_parquet('{sf_dir}/documents.parquet/*.parquet')"
con.execute("CREATE TEMP TABLE sig (doc_id BIGINT, sg BIGINT[])")

for c in range(chunks):
    print(f"signatures chunk {c + 1}/{chunks}...", flush=True)
    con.execute(f"""
INSERT INTO sig
WITH sh AS (
  SELECT doc_id,
    unnest(list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                          for i in generate_series(1, len(toks)-2)])) AS s
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM {docs}
        WHERE doc_id % {chunks} = {c})),
hx AS (
  SELECT doc_id,
    list_reduce([CAST(strpos('0123456789abcdef', substr(md5(s), j, 1)) - 1
                   AS BIGINT) for j in generate_series(1, 15)],
                (acc, d) -> acc*16 + d) % 2147483647 AS x
  FROM sh),
params AS (
  SELECT i,
    ((i + 43) * 2654435761) % 2147483646 + 1 AS a,
    CAST(((i + 43)::HUGEINT * 1229782938247303441)
         % 2305843009213693951 AS BIGINT) AS b
  FROM generate_series(0, 63) t(i)),
mins AS (
  SELECT doc_id, i, min((x * a + b) % 2305843009213693951) AS m
  FROM hx CROSS JOIN params GROUP BY doc_id, i)
SELECT doc_id, list(m ORDER BY i) AS sg FROM mins GROUP BY doc_id""")

n_sig = con.execute("SELECT count(*) FROM sig").fetchone()[0]
print(f"signatures: {n_sig} docs", flush=True)

print("banding + delete-aware drops + survivors...", flush=True)
rows = con.execute(f"""
WITH banded AS (
  SELECT doc_id, band, sg[band*8+1 : band*8+8] AS slc
  FROM sig CROSS JOIN generate_series(0, 7) g(band)),
drops AS (
  SELECT DISTINCT y.doc_id AS doc_b
  FROM banded x JOIN banded y
    ON x.band = y.band AND x.slc = y.slc AND x.doc_id < y.doc_id
  JOIN sig sa ON sa.doc_id = x.doc_id
  JOIN sig sb ON sb.doc_id = y.doc_id
  WHERE y.doc_id >= 250
    AND (x.doc_id >= 250 OR x.doc_id % 7 <> 1)
    AND CAST(len(list_filter([sa.sg[i] = sb.sg[i]
                              for i in generate_series(1, 64)],
                             z -> z)) AS DOUBLE) / 64
          >= CAST(0.5 AS DOUBLE))
SELECT doc_id, source FROM {docs}
WHERE doc_id >= 250 AND doc_id NOT IN (SELECT doc_b FROM drops)""").fetchall()

spark_tbl = ds.dataset(f"{out_dir}/q143_dedup_deletes",
                       format="parquet").to_table()
s_cols = sorted(spark_tbl.column_names)
s_rows = sorted(tuple(r[c] for c in s_cols) for r in spark_tbl.to_pylist())
o_cols = ["doc_id", "source"]
assert s_cols == sorted(o_cols), (s_cols, o_cols)
idx = [o_cols.index(c) for c in sorted(o_cols)]
o_rows = sorted(tuple(r[i] for i in idx) for r in rows)

if s_rows == o_rows:
    print(f"PASS q143_dedup_deletes sf1 ({len(s_rows)} rows, "
          f"staged {chunks}-chunk replay)")
else:
    print(f"FAIL q143_dedup_deletes sf1: spark={len(s_rows)} "
          f"oracle={len(o_rows)} rows")
    for a, b in list(zip(s_rows, o_rows))[:5]:
        if a != b:
            print(" spark:", a, "\n oracle:", b)
    sys.exit(1)
