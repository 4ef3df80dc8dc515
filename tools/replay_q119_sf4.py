#!/usr/bin/env python3
"""Staged sf4 replay of the q119 (interpolated Kneser-Ney bigram NLL)
oracle.

The registered single-statement oracle is exact and feasible at the
driver's gate scales, but at sf4 DuckDB keeps the instance-level bigram
stream AND every model hash table live at once and the replay exceeds
this VM's disk (>77 GB spill; one OOM kill and one ENOSPC across r12
attempts). This script runs the SAME arithmetic staged:

  pairs     : (doc_id, w1, w2) bigram instances   — materialized once
  bc/ctx/cont/tt : the identical model aggregates
  nll per DISTINCT bigram : the oracle computes
        floor(-ln((c12-0.75)/c1 + 0.75*t1/c1 * r2/tbig)*1e6 + 0.5)
    per instance, but the value depends only on (w1, w2) — computing it
    once per distinct bigram and joining back on an integer bigram id
    is bit-identical (same doubles, same ln, same floor)
  per doc   : sum(occurrences * nll) over BIGINT and n = sum(occurrences),
              then CAST(S AS DOUBLE)/n/1e6 exactly as the oracle divides

Usage: python3 tools/replay_q119_sf4.py <sfDir> <verifyOutDir>
"""
import sys
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
con.execute("SET memory_limit='45GB'")
con.execute("SET threads=16")
con.execute("SET temp_directory='/tmp/duckdb_spill_q119'")

docs = f"read_parquet('{sf_dir}/documents.parquet/*.parquet')"
print("building bigram instances...", flush=True)
con.execute(f"""
CREATE TEMP TABLE pairs AS
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM {docs})
SELECT doc_id, unnest([{{'w1': t[j], 'w2': t[j+1]}}
                       for j in generate_series(1, len(t) - 1)],
                      recursive := true)
FROM toks""")
print("instances:", con.sql("SELECT count(*) FROM pairs").fetchone()[0],
      flush=True)

print("building model tables...", flush=True)
con.execute("""
CREATE TEMP TABLE bc AS
SELECT row_number() OVER () AS bid, w1, w2, c12
FROM (SELECT w1, w2, count(*) AS c12 FROM pairs GROUP BY 1, 2)""")
con.execute("""
CREATE TEMP TABLE ctx AS
SELECT w1, sum(c12) AS c1, count(*) AS t1 FROM bc GROUP BY 1""")
con.execute("""
CREATE TEMP TABLE cont AS
SELECT w2, count(*) AS r2 FROM bc GROUP BY 1""")
tbig = con.sql("SELECT count(*) FROM bc").fetchone()[0]
print("distinct bigrams:", tbig, flush=True)

print("scoring distinct bigrams...", flush=True)
con.execute(f"""
CREATE TEMP TABLE nll_by_bid AS
SELECT bc.bid,
  CAST(floor(-ln(
    (CAST(c12 AS DOUBLE) - CAST(0.75 AS DOUBLE))
      / CAST(c1 AS DOUBLE) +
    CAST(0.75 AS DOUBLE) * CAST(t1 AS DOUBLE) / CAST(c1 AS DOUBLE)
      * (CAST(r2 AS DOUBLE) / CAST({tbig} AS DOUBLE))
  ) * 1000000.0 + CAST(0.5 AS DOUBLE)) AS BIGINT) AS nll
FROM bc JOIN ctx USING (w1) JOIN cont USING (w2)""")

print("mapping instances to bigram ids...", flush=True)
con.execute("""
CREATE TEMP TABLE inst AS
SELECT p.doc_id, bc.bid, count(*) AS occ
FROM pairs p JOIN bc USING (w1, w2)
GROUP BY 1, 2""")
con.execute("DROP TABLE pairs")

print("folding per doc...", flush=True)
con.execute("""
CREATE TEMP TABLE result AS
SELECT doc_id,
       CAST(sum(occ) AS BIGINT) AS n_bigrams_scored,
       CAST(sum(occ * nll) AS DOUBLE) / sum(occ) / 1000000.0 AS avg_nll
FROM inst JOIN nll_by_bid USING (bid)
GROUP BY doc_id""")

dump = f"read_parquet('{out_dir}/q119_bigram_kn/*.parquet')"
d = con.sql(f"""
SELECT
  (SELECT count(*) FROM (SELECT * FROM result
                         EXCEPT SELECT * FROM {dump})) AS oracle_only,
  (SELECT count(*) FROM (SELECT * FROM {dump}
                         EXCEPT SELECT * FROM result)) AS spark_only,
  (SELECT count(*) FROM {dump}) AS spark_rows,
  (SELECT count(*) FROM result) AS oracle_rows""").fetchone()
print(("PASS" if d[0] == d[1] == 0 else "FAIL"),
      f"q119_bigram_kn staged replay: oracle_only={d[0]} "
      f"spark_only={d[1]} spark_rows={d[2]} oracle_rows={d[3]}",
      flush=True)
