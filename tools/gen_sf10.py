#!/usr/bin/env python3
"""Derive a 100x (sf10-equivalent) documents table from the sf1 copy,
for the round-14 dedup-family decade probe (q33/q35/q122/q236 via
graft.ScaleSmoke — all documents-only). Same construction as
gen_sf1.py one decade up: replicas are id-shifted (sf1 holds 50k docs),
replica 0 and every 10th doc keep their text verbatim so cross-replica
exact/near-dup structure keeps scaling, the rest get a per-replica
suffix so the corpus is not pure copies.

Usage: python3 tools/gen_sf10.py [src=/tmp/graft_sf1] [out=/tmp/graft_sf10]
"""
import os
import sys

import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf1"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf10"

os.makedirs(out, exist_ok=True)
con = duckdb.connect()
con.sql(f"""COPY (
  SELECT d.doc_id + 50000*r.i AS doc_id,
    CASE WHEN r.i=0 OR d.doc_id % 10 = 0 THEN d.text
         ELSE d.text || ' s' || r.i END AS text,
    d.lang, d.source,
    CAST(len(CASE WHEN r.i=0 OR d.doc_id % 10 = 0 THEN d.text
         ELSE d.text || ' s' || r.i END) AS BIGINT) AS n_chars
  FROM read_parquet('{src}/documents.parquet') d,
       (SELECT unnest(range(10)) AS i) r
) TO '{out}/documents.parquet' (FORMAT PARQUET)""")
print(f"wrote {out}/documents.parquet")

# round 15: the similarity/graph/spatial decade probe (q95/q93/q207)
# needs customer (DBSCAN points), orders+lineitem (PageRank edges) one
# decade past sf1 too — same id-shift construction as gen_sf1.py
# (sf1 key ranges: custkey < 150k, orderkey < 100M, suppkey < 10k+).
con.sql(f"""COPY (
  SELECT c.c_custkey + 150000*r.i AS c_custkey, c.* EXCLUDE (c_custkey)
  FROM read_parquet('{src}/customer.parquet') c,
       (SELECT unnest(range(10)) AS i) r
) TO '{out}/customer.parquet' (FORMAT PARQUET)""")
print(f"wrote {out}/customer.parquet")
con.sql(f"""COPY (
  SELECT o.o_orderkey + 100000000*r.i AS o_orderkey,
         o.o_custkey + 150000*r.i AS o_custkey,
         o.* EXCLUDE (o_orderkey, o_custkey)
  FROM read_parquet('{src}/orders.parquet') o,
       (SELECT unnest(range(10)) AS i) r
) TO '{out}/orders.parquet' (FORMAT PARQUET)""")
print(f"wrote {out}/orders.parquet")
con.sql(f"""COPY (
  SELECT l.l_orderkey + 100000000*r.i AS l_orderkey,
         l.l_suppkey + 20000*r.i AS l_suppkey,
         l.* EXCLUDE (l_orderkey, l_suppkey)
  FROM read_parquet('{src}/lineitem.parquet') l,
       (SELECT unnest(range(10)) AS i) r
) TO '{out}/lineitem.parquet' (FORMAT PARQUET)""")
print(f"wrote {out}/lineitem.parquet")

# round 16: the streaming-CMS and store-lifecycle decade probes
# (q118/q235 via graft.ScaleSmoke) read events — same id-shift
# construction (sf1 key ranges: event_id < 100M, user_id < 1M).
con.sql(f"""COPY (
  SELECT e.event_id + 100000000*r.i AS event_id,
         e.user_id + 1000000*r.i AS user_id,
         e.* EXCLUDE (event_id, user_id)
  FROM read_parquet('{src}/events.parquet') e,
       (SELECT unnest(range(10)) AS i) r
) TO '{out}/events.parquet' (FORMAT PARQUET)""")
print(f"wrote {out}/events.parquet")
for t in ["documents", "customer", "orders", "lineitem", "events"]:
    n = con.sql(
        f"SELECT COUNT(*) FROM read_parquet('{out}/{t}.parquet')"
    ).fetchone()[0]
    print(t, n)

# round 16: the ANN/similarity-search decade probe (q38/q39/q45 via
# graft.ScaleSmoke) reads embeddings — same id-shift construction
# (sf1 key range: vec_id < 20k).
con.sql(f"""COPY (
  SELECT e.vec_id + 20000*r.i AS vec_id, e.embedding, e.label
  FROM read_parquet('{src}/embeddings.parquet') e,
       (SELECT unnest(range(10)) AS i) r
) TO '{out}/embeddings.parquet' (FORMAT PARQUET)""")
print(f"wrote {out}/embeddings.parquet")
print("embeddings", con.sql(
    f"SELECT COUNT(*) FROM read_parquet('{out}/embeddings.parquet')"
).fetchone()[0])
