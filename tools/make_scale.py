#!/usr/bin/env python3
"""Build replicated scale dirs for the scaling-curve measurement.

Replicates the sf0.1 tables xN with id offsets (fact tables only; the
TPC-H-ish dimensions stay fixed, as in a dimension-stable scale-up):
  events:     event_id, user_id offset per replica (series count grows)
  documents:  doc_id offset (duplicate mass grows with the corpus)
  lineitem:   l_orderkey offset
  orders:     o_orderkey offset
  embeddings: vec_id offset
Usage: make_scale.py <src_sf_dir> <dst_dir> <factor>
"""
import sys, os, shutil
import duckdb

src, dst, n = sys.argv[1], sys.argv[2], int(sys.argv[3])
os.makedirs(dst, exist_ok=True)
con = duckdb.connect()

REPL = {
    "events": ("event_id + r*10000000000 AS event_id, ts, "
               "user_id + r*10000000 AS user_id, event_type, value, props"),
    "documents": ("doc_id + r*1000000000 AS doc_id, text, lang, source, "
                  "n_chars"),
    "lineitem": ("l_orderkey + r*1000000000 AS l_orderkey, l_partkey, "
                 "l_suppkey, l_linenumber, l_quantity, l_extendedprice, "
                 "l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate"),
    "orders": ("o_orderkey + r*1000000000 AS o_orderkey, o_custkey, "
               "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority"),
    "embeddings": "vec_id + r*1000000000 AS vec_id, embedding, label",
}

for t in ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]:
    sp, dp = f"{src}/{t}.parquet", f"{dst}/{t}.parquet"
    if t in REPL:
        con.sql(f"COPY (SELECT {REPL[t]} FROM '{sp}' "
                f"CROSS JOIN (SELECT unnest(range({n})) AS r)) "
                f"TO '{dp}' (FORMAT PARQUET)")
    else:
        shutil.copyfile(sp, dp)
    print(t, "->", dp)
