#!/usr/bin/env python3
"""Synthesize sf1 (10x sf0.1) parquet for the SCALE.md measured spot-check.
(driver-side tooling only — not part of the shipped library; /root/testdata
is read-only so the output goes to /tmp/testdata_sf1)

Construction: 10 key-offset replicas of sf0.1. For orders/lineitem the key
spaces are offset per copy, so the trade/co-purchase graphs become 10
disjoint isomorphic components — PageRank/triangle work scales exactly 10x
with no artificial skew. For documents each copy i>0 suffixes every word
with the copy digit: shingle structure and df distribution are preserved
per copy while no shingle collides across copies, so dedup posting mass
scales exactly 10x instead of quadratically (10 exact copies of every doc
would make every LSH bucket 10x deeper — a different experiment).

Usage: python3 tools/gen_sf1.py [outdir]
"""
import sys
import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/testdata_sf1"

import os
os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()

con.execute(f"""
COPY (
  SELECT o_orderkey + i * 10000000 AS o_orderkey,
         o_custkey  + i * 1000000  AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM read_parquet('{SRC}/orders.parquet'), range(10) t(i)
  ORDER BY o_orderkey
) TO '{OUT}/orders.parquet' (FORMAT parquet)
""")

con.execute(f"""
COPY (
  SELECT l_orderkey + i * 10000000 AS l_orderkey,
         l_partkey  + i * 1000000  AS l_partkey,
         l_suppkey  + i * 1000000  AS l_suppkey,
         l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
         l_returnflag, l_linestatus, l_shipdate
  FROM read_parquet('{SRC}/lineitem.parquet'), range(10) t(i)
  ORDER BY l_orderkey
) TO '{OUT}/lineitem.parquet' (FORMAT parquet)
""")

con.execute(f"""
COPY (
  SELECT doc_id + i * 1000000 AS doc_id,
         CASE WHEN i = 0 THEN text
              ELSE regexp_replace(text, '(\\S+)', '\\1' || CAST(i AS VARCHAR), 'g')
         END AS text,
         lang, source, n_chars
  FROM read_parquet('{SRC}/documents.parquet'), range(10) t(i)
  ORDER BY doc_id
) TO '{OUT}/documents.parquet' (FORMAT parquet)
""")

for t in ["orders", "lineitem", "documents"]:
    n = con.execute(f"SELECT COUNT(*) FROM read_parquet('{OUT}/{t}.parquet')").fetchone()[0]
    print(t, n)
