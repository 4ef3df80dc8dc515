#!/usr/bin/env python3
"""Staged sf4 replay of the q114 recall-digest oracle.

The registered oracle is one 7-branch UNION ALL whose shared CTEs
DuckDB materializes concurrently; evaluated whole at sf4 it exceeds
any practical budget, and two branches are individually
disk-infeasible as single statements on this host (ENOSPC past
~60 GB of spill): cosine_lsh_neardup (its `lshp` CTE is the
1.181B-candidate LSH DISTINCT; its `pairs60` CTE the exact all-pairs
set) and semantic_dedup_drops (8 centroid cells of ~10k vectors
each → 400M within-cell pairs carrying 512-byte vectors through the
join, plus `droppable` = DISTINCT over pairs60 again).

Five branches run verbatim (shared prefix + one branch each, in their
own child process via check.py's path — DuckDB only evaluates the
CTEs a branch references). The two heavy branches are staged with the
IDENTICAL arithmetic:

  pairs60  — one sliced brute-force pass (a.id-range chunks, each
             chunk INSERTing its true pairs' id_b; a chunk's join
             intermediate is bounded, nothing big is ever
             materialized at once). This single pass serves BOTH
             branches: total = row count, droppable = DISTINCT id.
  lshp     — row-set-identical to the sf4-verified q61 dump
             (tools/replay_q61_q126_sf4.py: EXCEPT 0/0 against the
             oracle's own staged arithmetic); lshp ⊆ pairs60 by
             construction (both sides apply the identical
             list_inner_product/nrm >= 0.4 predicate), re-proven here
             by recomputing every dump pair's cosine (0 violations
             required) — so the oracle's LEFT JOIN hit count equals
             |lshp|.
  sdrops   — per-(cell, a.id-slice) INSERT loop over the within-cell
             verified pairs, DISTINCT at the end; identical
             predicate, bounded slices.
  recall   — assembled IN DuckDB with the oracle's own expression
             (CASE WHEN total > 0 THEN CAST(hits AS DOUBLE)/total
             END), so the emitted double is bit-identical.

All 7 rows are then compared to the Spark dump with check.py's own
normalization.

Usage: python3 tools/replay_q114_sf4.py <sfDir> <verifyOutDir>
"""
import json
import re
import sys
import time

sys.path.insert(0, '/root/repo/tools')
from check import run_oracle, norm_rows, norm_cell
import pyarrow.dataset as ds

sf_dir = sys.argv[1] if len(sys.argv) > 1 else 'testdata_sf4'
out_dir = sys.argv[2] if len(sys.argv) > 2 else '/tmp/verify_sf4'
name = 'q114_recall_digest'
STAGED = ('cosine_lsh_neardup', 'semantic_dedup_drops')

oracle = json.load(open(f'{out_dir}/oracle_sql.json'))
sql = oracle[name]
branches = re.split(r"\n\s*UNION ALL\s*\n", sql)
idx = branches[0].index("SELECT '")
prefix = branches[0][:idx]
parts = [branches[0][idx:]] + branches[1:]

d_cols, d_rows = None, []
for part in parts:
    label = re.search(r"SELECT '([^']+)'", part).group(1)
    if label in STAGED:
        continue
    t0 = time.time()
    cols, rws = run_oracle(sf_dir, prefix + part)
    if d_cols is None:
        d_cols = cols
    d_rows.extend(rws)
    print(f'BRANCH {label}: ok, {len(rws)} rows, {time.time()-t0:.0f}s',
          flush=True)

# --- shared staging state ---
import duckdb
con = duckdb.connect()
con.execute("SET memory_limit='40GB'")
con.execute("SET threads=16")
con.execute("SET temp_directory='/tmp/duckdb_spill_q114'")
con.execute(f"""
CREATE TEMP TABLE e AS
SELECT CAST(vec_id AS BIGINT) AS id,
       CAST(embedding AS DOUBLE[]) AS v,
       sqrt(list_inner_product(CAST(embedding AS DOUBLE[]),
                               CAST(embedding AS DOUBLE[]))) AS nrm
FROM read_parquet('{sf_dir}/embeddings.parquet/*.parquet')""")
n_vec, max_id = con.sql("SELECT count(*), max(id) FROM e").fetchone()

# one sliced brute-force pass builds pairs60's id_b stream exactly once
t0 = time.time()
con.execute("CREATE TEMP TABLE bf (id_b BIGINT)")
step = max(1, (max_id + 1) // 16)
for lo in range(0, max_id + 1, step):
    con.execute(f"""
    INSERT INTO bf
    SELECT b.id FROM e a JOIN e b ON a.id < b.id
    WHERE a.id >= {lo} AND a.id < {lo + step}
      AND list_inner_product(a.v, b.v) / (a.nrm * b.nrm)
            >= CAST(0.4 AS DOUBLE)""")
total = con.sql("SELECT count(*) FROM bf").fetchone()[0]
print(f'pairs60 staged: {total} true pairs ({n_vec} vectors, '
      f'{time.time()-t0:.0f}s)', flush=True)

# --- cosine_lsh_neardup ---
t0 = time.time()
lshp = f"read_parquet('{out_dir}/q61_cosine_neardup_lsh/*.parquet')"
viol, hits = con.sql(f"""
SELECT count(*) FILTER (WHERE NOT (
         list_inner_product(a.v, b.v) / (a.nrm * b.nrm)
           >= CAST(0.4 AS DOUBLE))),
       count(*)
FROM {lshp} d JOIN e a ON a.id = d.id_a JOIN e b ON b.id = d.id_b""") \
    .fetchone()
assert viol == 0, f'{viol} dump pairs fail the exact >=0.4 predicate'
row = con.sql(f"""
SELECT 'cosine_lsh_neardup' AS operator,
       CAST({hits} AS BIGINT) AS hits,
       CAST({total} AS BIGINT) AS total,
       CASE WHEN {total} > 0 THEN
         CAST({hits} AS DOUBLE) / {total} END AS recall""").fetchall()
d_rows.extend(tuple(norm_cell(v) for v in r) for r in row)
print(f'BRANCH cosine_lsh_neardup: ok, 1 rows (subset proof 0 '
      f'violations, {time.time()-t0:.0f}s)', flush=True)

# --- semantic_dedup_drops ---
t0 = time.time()
con.execute(f"""
CREATE TEMP TABLE nn AS
SELECT count(*) AS n,
       sum(CAST(vec_id AS BIGINT) +
           CAST(floor(abs(CAST(embedding[1] AS DOUBLE)) * 4096) AS BIGINT))
         AS fp
FROM read_parquet('{sf_dir}/embeddings.parquet/*.parquet')""")
con.execute("""
CREATE TEMP TABLE scent AS
SELECT centroid_id, v
FROM read_parquet('/tmp/graft_ann_oracle/semdedup_cents/*/*/*.parquet',
                  hive_partitioning = true)
WHERE n = (SELECT n FROM nn) AND fp = (SELECT fp FROM nn)""")
con.execute("""
CREATE TEMP TABLE scell AS
SELECT id, centroid_id AS cell FROM (
  SELECT e.id, c.centroid_id, row_number() OVER (
    PARTITION BY e.id ORDER BY
      list_inner_product(e.v, c.v) /
        (e.nrm * sqrt(list_inner_product(c.v, c.v))) DESC,
      c.centroid_id) AS rn
  FROM e CROSS JOIN scent c) WHERE rn = 1""")
cells = [r[0] for r in con.sql("SELECT DISTINCT cell FROM scell").fetchall()]
con.execute("CREATE TEMP TABLE sdrop_raw (id BIGINT)")
for cell in cells:
    for lo in range(0, max_id + 1, step):
        con.execute(f"""
        INSERT INTO sdrop_raw
        SELECT DISTINCT b.id
        FROM scell ca JOIN e a ON a.id = ca.id
        JOIN scell cb ON cb.cell = ca.cell
        JOIN e b ON b.id = cb.id
        WHERE ca.cell = {cell} AND a.id < b.id
          AND a.id >= {lo} AND a.id < {lo + step}
          AND list_inner_product(a.v, b.v) / (a.nrm * b.nrm)
                >= CAST(0.4 AS DOUBLE)""")
row = con.sql("""
WITH sdrops AS (SELECT DISTINCT id FROM sdrop_raw),
     droppable AS (SELECT DISTINCT id_b AS id FROM bf)
SELECT 'semantic_dedup_drops' AS operator,
       CAST(count(a.id) AS BIGINT) AS hits,
       CAST(count(*) AS BIGINT) AS total,
       CASE WHEN count(*) > 0 THEN
         CAST(count(a.id) AS DOUBLE) / count(*) END AS recall
FROM droppable x LEFT JOIN sdrops a ON a.id = x.id""").fetchall()
d_rows.extend(tuple(norm_cell(v) for v in r) for r in row)
print(f'BRANCH semantic_dedup_drops: ok, 1 rows ({len(cells)} cells, '
      f'{time.time()-t0:.0f}s)', flush=True)

# --- compare against the Spark dump ---
tbl = ds.dataset(f'{out_dir}/{name}', format='parquet').to_table()
s_cols = tbl.column_names
s_rows = [tuple(r[c] for c in s_cols) for r in tbl.to_pylist()]
sc, sr = norm_rows(s_cols, s_rows)
dc, dr = norm_rows(d_cols, d_rows)
if sc != dc:
    print(f'FAIL {name}: schema mismatch: spark={sc} oracle={dc}')
elif sr != dr:
    bad = sum(1 for a, b in zip(sr, dr) if a != b)
    print(f'FAIL {name}: {len(sr)} vs {len(dr)} rows, {bad} differing')
    for a, b in list(zip(sr, dr))[:7]:
        if a != b:
            print('  spark :', a)
            print('  oracle:', b)
else:
    print(f'PASS {name} ({len(sr)} rows)')
