#!/usr/bin/env python3
"""Staged replay of the q61/q126 oracles (sf4 and beyond).

sf16 note: the q61 pair list is not dumped at 160x (its output is the
13.8M-pair list itself); the q61 compare below is skipped when the dump
directory is absent and the q126 per-victim fold is verified alone.

The registered single-statement oracles are exact and feasible at the
driver's gate scales (sf0.01/0.1) and at sf1, but at sf4 the LSH bucket
self-join yields 1.18e9 candidate pairs (measured: ~147M per table,
biggest bucket ~10.2k) and DuckDB materializes the candidate DISTINCT —
>77 GB of spill, more than this VM's disk. This script replays the SAME
arithmetic staged per LSH table so verification stays inline and the
only DISTINCT runs over true pairs:

  buck  (temp)          : id, t, bucket   — identical projection/bucket
                          arithmetic to the registered oracles
  per t in 0..7         : self-join buck_t, attach vectors, cosine >= 0.4
                          inline, DISTINCT (id_a, id_b, cosine)
  union of the 8 passes : DISTINCT again (a pair found in k tables has
                          one cosine, so this is the oracle's pair set)
  q61  compare          : (id_a, id_b) vs the Spark dump
  q126 compare          : per-victim fold (min partner, max cosine,
                          round 9) left-joined to all ids vs the dump

Usage: python3 tools/replay_q61_q126_sf4.py <sfDir> <verifyOutDir>
"""
import sys
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
con.execute("SET memory_limit='45GB'")
con.execute("SET threads=16")
con.execute("SET temp_directory='/tmp/duckdb_spill_replay'")

emb = f"read_parquet('{sf_dir}/embeddings.parquet/*.parquet')"
print("building buckets...", flush=True)
con.execute(f"""
CREATE TEMP TABLE e AS
  SELECT CAST(vec_id AS BIGINT) AS id, CAST(embedding AS DOUBLE[]) AS v,
         sqrt(list_inner_product(CAST(embedding AS DOUBLE[]),
                                 CAST(embedding AS DOUBLE[]))) AS nrm
  FROM {emb}""")
con.execute("""
CREATE TEMP TABLE buck AS
WITH proj AS (
  SELECT e.id, g.t, gi.i,
    list_reduce([ e.v[d] *
        (CAST((((42 + g.t + gi.i*64 + (d-1)) * 2654435761 + 1013904223)
               % 2147483647) * 1597334677 % 1048576 AS DOUBLE)
         / 524288.0 - 1.0)
      for d in generate_series(1, 64)], (a, x) -> a + x) AS p
  FROM e CROSS JOIN generate_series(0, 7) g(t)
         CROSS JOIN generate_series(0, 5) gi(i))
SELECT id, t,
  CAST(sum(CASE WHEN p >= 0 THEN (1::BIGINT << i) ELSE 0 END) AS BIGINT)
    AS bucket
FROM proj GROUP BY id, t""")

con.execute("""CREATE TEMP TABLE tp
  (id_a BIGINT, id_b BIGINT, cosine DOUBLE)""")
for t in range(8):
    con.execute(f"""
    INSERT INTO tp
    SELECT DISTINCT a.id AS id_a, b.id AS id_b,
           list_inner_product(ea.v, eb.v) / (ea.nrm * eb.nrm) AS cosine
    FROM buck a
    JOIN buck b ON b.t = a.t AND b.bucket = a.bucket AND a.id < b.id
    JOIN e ea ON ea.id = a.id
    JOIN e eb ON eb.id = b.id
    WHERE a.t = {t}
      AND list_inner_product(ea.v, eb.v) / (ea.nrm * eb.nrm)
            >= CAST(0.4 AS DOUBLE)""")
    print(f"table {t} done, true-pair rows so far:",
          con.sql("SELECT count(*) FROM tp").fetchone()[0], flush=True)

con.execute("CREATE TEMP TABLE pairs AS SELECT DISTINCT * FROM tp")
n_pairs = con.sql("SELECT count(*) FROM pairs").fetchone()[0]
print("distinct true pairs:", n_pairs, flush=True)

import os
if os.path.isdir(f"{out_dir}/q61_cosine_neardup_lsh"):
    q61 = f"read_parquet('{out_dir}/q61_cosine_neardup_lsh/*.parquet')"
    d61 = con.sql(f"""
SELECT
      (SELECT count(*) FROM (SELECT id_a, id_b FROM pairs
                             EXCEPT SELECT id_a, id_b FROM {q61})) AS oracle_only,
      (SELECT count(*) FROM (SELECT id_a, id_b FROM {q61}
                             EXCEPT SELECT id_a, id_b FROM pairs)) AS spark_only,
      (SELECT count(*) FROM {q61}) AS spark_rows""").fetchone()
    print(("PASS" if d61[0] == d61[1] == 0 else "FAIL"),
          f"q61_cosine_neardup_lsh staged replay: oracle_only={d61[0]} "
          f"spark_only={d61[1]} spark_rows={d61[2]} oracle_rows={n_pairs}",
          flush=True)
else:
    print("q61 dump absent - pair-list compare skipped (sf16: output is "
          "the pair list itself)", flush=True)

q126 = f"read_parquet('{out_dir}/q126_neardup_coverage_lsh/*.parquet')"
d126 = con.sql(f"""
WITH d AS (
  SELECT id_b AS id, min(id_a) AS dup_min_partner,
         max(cosine) AS dup_max_cosine
  FROM pairs GROUP BY id_b),
expected AS (
  SELECT e.id, d.id IS NULL AS kept, d.dup_min_partner,
         round(d.dup_max_cosine, 9) AS dup_max_cosine
  FROM e LEFT JOIN d ON d.id = e.id)
SELECT
  (SELECT count(*) FROM (SELECT * FROM expected
                         EXCEPT SELECT * FROM {q126})) AS oracle_only,
  (SELECT count(*) FROM (SELECT * FROM {q126}
                         EXCEPT SELECT * FROM expected)) AS spark_only,
  (SELECT count(*) FROM {q126}) AS spark_rows,
  (SELECT count(*) FROM expected) AS oracle_rows""").fetchone()
print(("PASS" if d126[0] == d126[1] == 0 else "FAIL"),
      f"q126_neardup_coverage_lsh staged replay: oracle_only={d126[0]} "
      f"spark_only={d126[1]} spark_rows={d126[2]} oracle_rows={d126[3]}",
      flush=True)
