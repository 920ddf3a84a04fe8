#!/usr/bin/env python3
"""Derive a 10x (sf1-equivalent) copy of the scale-family input tables
from the driver's sf0.1 parquet, for the Spark-only 100x smoke
(graft.ScaleSmoke). Replicas are id-shifted; every 10th document keeps
its text verbatim so exact and near-dup structure scales with the data
(cross-replica true duplicates), the rest get a per-replica suffix so
the corpus is not pure copies.

Usage: python3 tools/gen_sf1.py [src=/root/testdata/sf0.1] [out=/tmp/graft_sf1]
"""
import sys

import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf1"

import os
os.makedirs(out, exist_ok=True)
con = duckdb.connect()
con.sql(f"""COPY (
  SELECT d.doc_id + 5000*r.i AS doc_id,
    CASE WHEN r.i=0 OR d.doc_id % 10 = 0 THEN d.text
         ELSE d.text || ' r' || r.i END AS text,
    d.lang, d.source,
    CAST(len(CASE WHEN r.i=0 OR d.doc_id % 10 = 0 THEN d.text
         ELSE d.text || ' r' || r.i END) AS BIGINT) AS n_chars
  FROM read_parquet('{src}/documents.parquet') d,
       (SELECT unnest(range(10)) AS i) r
) TO '{out}/documents.parquet' (FORMAT PARQUET)""")
con.sql(f"""COPY (
  SELECT e.vec_id + 2000*r.i AS vec_id, e.embedding, e.label
  FROM read_parquet('{src}/embeddings.parquet') e,
       (SELECT unnest(range(10)) AS i) r
) TO '{out}/embeddings.parquet' (FORMAT PARQUET)""")
con.sql(f"""COPY (
  SELECT c.c_custkey + 15000*r.i AS c_custkey, c.* EXCLUDE (c_custkey)
  FROM read_parquet('{src}/customer.parquet') c,
       (SELECT unnest(range(10)) AS i) r
) TO '{out}/customer.parquet' (FORMAT PARQUET)""")
con.sql(f"""COPY (
  SELECT o.o_orderkey + 10000000*r.i AS o_orderkey,
         o.o_custkey + 15000*r.i AS o_custkey,
         o.* EXCLUDE (o_orderkey, o_custkey)
  FROM read_parquet('{src}/orders.parquet') o,
       (SELECT unnest(range(10)) AS i) r
) TO '{out}/orders.parquet' (FORMAT PARQUET)""")
con.sql(f"""COPY (
  SELECT l.l_orderkey + 10000000*r.i AS l_orderkey,
         l.l_suppkey + 1000*r.i AS l_suppkey,
         l.* EXCLUDE (l_orderkey, l_suppkey)
  FROM read_parquet('{src}/lineitem.parquet') l,
       (SELECT unnest(range(10)) AS i) r
) TO '{out}/lineitem.parquet' (FORMAT PARQUET)""")
con.sql(f"""COPY (
  SELECT e.event_id + 10000000*r.i AS event_id,
         e.user_id + 100000*r.i AS user_id,
         e.* EXCLUDE (event_id, user_id)
  FROM read_parquet('{src}/events.parquet') e,
       (SELECT unnest(range(10)) AS i) r
) TO '{out}/events.parquet' (FORMAT PARQUET)""")
for t in ["documents", "embeddings", "customer", "orders", "lineitem",
          "events"]:
    n = duckdb.sql(
        f"SELECT COUNT(*) FROM read_parquet('{out}/{t}.parquet')"
    ).fetchone()[0]
    print(t, n)
