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

# Remaining fact/dim tables (round 8: the FULL-suite sf1 pass needs every
# table). Same isomorphic-replica construction: keys offset per copy so the
# join graphs become 10 disjoint copies; nation/region are fixed dimensions
# and copy through unchanged.
con.execute(f"""
COPY (
  SELECT c_custkey + i * 1000000 AS c_custkey,
         c_name, c_nationkey, c_acctbal, c_mktsegment
  FROM read_parquet('{SRC}/customer.parquet'), range(10) t(i)
  ORDER BY c_custkey
) TO '{OUT}/customer.parquet' (FORMAT parquet)
""")

con.execute(f"""
COPY (
  SELECT s_suppkey + i * 1000000 AS s_suppkey, s_name, s_nationkey, s_acctbal
  FROM read_parquet('{SRC}/supplier.parquet'), range(10) t(i)
  ORDER BY s_suppkey
) TO '{OUT}/supplier.parquet' (FORMAT parquet)
""")

con.execute(f"""
COPY (
  SELECT p_partkey + i * 1000000 AS p_partkey,
         p_name, p_brand, p_type, p_size, p_retailprice
  FROM read_parquet('{SRC}/part.parquet'), range(10) t(i)
  ORDER BY p_partkey
) TO '{OUT}/part.parquet' (FORMAT parquet)
""")

# events: user and event keys offset per copy — 10x the users, identical
# per-user session/funnel structure, calendar-bounded aggregates get 10x
# deeper cells (no new weeks), which is the honest 10x-rows experiment.
con.execute(f"""
COPY (
  SELECT event_id + i * 10000000 AS event_id, ts,
         user_id + i * 1000000 AS user_id, event_type, value, props
  FROM read_parquet('{SRC}/events.parquet'), range(10) t(i)
  ORDER BY event_id
) TO '{OUT}/events.parquet' (FORMAT parquet)
""")

# embeddings: copy i cyclically rotates each vector by i dimensions —
# within-copy pairwise geometry (dot products, norms, LSH buckets) is
# EXACTLY preserved per copy, while cross-copy pairs decorrelate, so
# near-dup/ANN candidate mass scales 10x instead of quadratically (10
# verbatim copies would pair every vector with its 9 clones).
con.execute(f"""
COPY (
  SELECT vec_id + i * 1000000 AS vec_id,
         CASE WHEN i = 0 THEN embedding
              ELSE list_concat(embedding[(i+1):len(embedding)], embedding[1:i])
         END AS embedding,
         label
  FROM read_parquet('{SRC}/embeddings.parquet'), range(10) t(i)
  ORDER BY vec_id
) TO '{OUT}/embeddings.parquet' (FORMAT parquet)
""")

for t in ["nation", "region"]:
    con.execute(f"""
    COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet'))
    TO '{OUT}/{t}.parquet' (FORMAT parquet)
    """)

for t in ["orders", "lineitem", "documents", "customer", "supplier", "part",
          "events", "embeddings", "nation", "region"]:
    n = con.execute(f"SELECT COUNT(*) FROM read_parquet('{OUT}/{t}.parquet')").fetchone()[0]
    print(t, n)
