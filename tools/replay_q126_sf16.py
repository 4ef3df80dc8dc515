#!/usr/bin/env python3
"""Staged sf16 replay of the q126 coverage oracle at the AUTO geometry.

The registry oracle pins the gate-scale geometry (8 tables x 6 planes =
64 buckets/table): right for 2k vectors, ~1.3e10 member-level candidates
at sf16's 320k -- the r13 staged replay spilled 68 GB before finishing
one of 8 tables and was capped at the disk's edge. At the engine's
derived geometry (autoPlanes(320k, 128) = 12 planes, 4096 buckets/table,
~80 vectors/bucket) the candidate set is ~1e8 and fits this VM.

The replay is the MEMBER-LEVEL pair formulation (exactly the registry
oracle's shape, planes widened to 12); the Spark dump is the collapse
formulation at auto geometry (tools CoverageDump). Their bit-parity is
what SimilaritySpec proves at gate scale and this replay re-proves at
160x.

Stage 1 builds the per-(id, table) bucket ids chunk-by-chunk (the
2.56M-row bucket table is cheap; chunking only bounds the 64-dim
projection fold's intermediates). Stage 2 runs candidates -> verify ->
aggregate in one streaming statement: the GROUP BY state is <= one row
per vector, so only the (id, partner) candidate DISTINCT spills.

Usage: python3 tools/replay_q126_sf16.py <sfDir> <verifyOutDir>
       [chunks] [nPlanes]
"""
import sys
import duckdb
import pyarrow.dataset as ds

sf_dir, out_dir = sys.argv[1], sys.argv[2]
chunks = int(sys.argv[3]) if len(sys.argv) > 3 else 16
nplanes = int(sys.argv[4]) if len(sys.argv) > 4 else 12

con = duckdb.connect()
con.execute("SET memory_limit='45GB'")
con.execute("SET threads=16")
con.execute("SET temp_directory='/tmp/duckdb_spill_q126'")

import os
_p = f"{sf_dir}/embeddings.parquet"
emb = (f"read_parquet('{_p}/*.parquet')" if os.path.isdir(_p)
       else f"read_parquet('{_p}')")

print("vectors + norms...", flush=True)
con.execute(f"""
CREATE TEMP TABLE e AS
SELECT CAST(vec_id AS BIGINT) AS id, CAST(embedding AS DOUBLE[]) AS v,
       sqrt(list_inner_product(CAST(embedding AS DOUBLE[]),
                               CAST(embedding AS DOUBLE[]))) AS nrm
FROM {emb}""")
n_vec = con.execute("SELECT count(*) FROM e").fetchone()[0]
print(f"vectors: {n_vec}", flush=True)

con.execute("CREATE TEMP TABLE buck (id BIGINT, t INTEGER, bucket BIGINT)")
for c in range(chunks):
    print(f"buckets chunk {c + 1}/{chunks}...", flush=True)
    con.execute(f"""
INSERT INTO buck
WITH proj AS (
  SELECT e.id, g.t, gi.i,
    list_reduce([ e.v[d] *
        (CAST((((42 + g.t + gi.i*64 + (d-1)) * 2654435761 + 1013904223)
               % 2147483647) * 1597334677 % 1048576 AS DOUBLE)
         / 524288.0 - 1.0)
      for d in generate_series(1, 64)], (a, x) -> a + x) AS p
  FROM (SELECT id, v FROM e
        WHERE ((id % {chunks}) + {chunks}) % {chunks} = {c}) e
  CROSS JOIN generate_series(0, 7) g(t)
  CROSS JOIN generate_series(0, {nplanes - 1}) gi(i))
SELECT id, t,
  CAST(sum(CASE WHEN p >= 0 THEN (1::BIGINT << i) ELSE 0 END) AS BIGINT)
FROM proj GROUP BY id, t""")

n_buck = con.execute("SELECT count(*) FROM buck").fetchone()[0]
occ = con.execute(
    "SELECT max(n) FROM (SELECT count(*) n FROM buck GROUP BY t, bucket)"
).fetchone()[0]
print(f"bucket rows: {n_buck}, max occupancy: {occ}", flush=True)

# candidate DISTINCT before vector payloads (the sf4 lesson: the
# undistinct form carries two 64-double vectors per table collision)
print("candidates -> verify -> aggregate...", flush=True)
con.execute("""
CREATE TEMP TABLE d AS
WITH cand AS (
  SELECT DISTINCT b.id AS id, a.id AS partner
  FROM buck a JOIN buck b
    ON a.t = b.t AND a.bucket = b.bucket AND a.id < b.id),
ver AS (
  SELECT c.id, c.partner,
         list_inner_product(ea.v, eb.v) / (ea.nrm * eb.nrm) AS cosine
  FROM cand c
  JOIN e ea ON ea.id = c.partner
  JOIN e eb ON eb.id = c.id
  WHERE list_inner_product(ea.v, eb.v) / (ea.nrm * eb.nrm)
          >= CAST(0.4 AS DOUBLE))
SELECT id, min(partner) AS dup_min_partner, max(cosine) AS dup_max_cosine
FROM ver GROUP BY id""")
n_dup = con.execute("SELECT count(*) FROM d").fetchone()[0]
print(f"dropped vectors: {n_dup}", flush=True)

rows = con.execute("""
SELECT e.id, d.id IS NULL AS kept, d.dup_min_partner,
       round(d.dup_max_cosine, 9) AS dup_max_cosine
FROM e LEFT JOIN d ON d.id = e.id""").fetchall()

spark_tbl = ds.dataset(f"{out_dir}/q126_coverage_auto",
                       format="parquet").to_table()
def nullsafe(row):
    return tuple((v is None, v) for v in row)

s_cols = sorted(spark_tbl.column_names)
s_rows = sorted(
    (tuple(r[c] for c in s_cols) for r in spark_tbl.to_pylist()),
    key=nullsafe)
o_cols = ["id", "kept", "dup_min_partner", "dup_max_cosine"]
assert s_cols == sorted(o_cols), (s_cols, o_cols)
idx = [o_cols.index(c) for c in sorted(o_cols)]
o_rows = sorted((tuple(r[i] for i in idx) for r in rows), key=nullsafe)

if s_rows == o_rows:
    print(f"PASS q126_coverage_auto {sf_dir} ({len(s_rows)} rows, "
          f"{nplanes}-plane staged replay, max bucket {occ})")
else:
    print(f"FAIL q126_coverage_auto {sf_dir}: spark={len(s_rows)} "
          f"oracle={len(o_rows)} rows")
    bad = 0
    for a, b in zip(s_rows, o_rows):
        if a != b:
            print(" spark:", a, "\n oracle:", b)
            bad += 1
            if bad >= 5:
                break
    sys.exit(1)
