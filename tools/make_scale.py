#!/usr/bin/env python3
"""Build replicated scale dirs for the scaling-curve measurement.

Replicates the sf0.1 tables xN with id offsets (fact tables only; the
TPC-H-ish dimensions stay fixed, as in a dimension-stable scale-up):
  events:     event_id, user_id offset per replica (series count grows)
  documents:  doc_id offset (duplicate mass grows with the corpus)
  lineitem:   l_orderkey offset
  orders:     o_orderkey offset
  embeddings: vec_id offset
Usage: make_scale.py <src_sf_dir> <dst_dir> <factor> [--mutate]

--mutate: replica-noise the documents TEXT so the pair-enumeration
dedup ops (q93/q105/q106/q88/q28) scale measurably. Exact replication
multiplies every duplicate cluster xN, so candidate pairs grow xN^2 --
not a property of the algorithm, a property of the synthetic growth.
Mutation REPLACES every 3rd token with a replica-tagged marker:
  - within one replica, a near-dup pair's replacements align (same
    positions, same replica tag), so its 3-gram Jaccard is preserved
    and every planted cluster keeps its size;
  - across replicas, EVERY 3-token shingle contains a marker (window
    3 >= replacement period 3), so J(identical doc, replicas r!=s)=0:
    not only do no verified pairs form, the minhash/LSH CANDIDATE
    stages draw no cross-replica buckets either (an insertion-based
    mutation left J~0.5, and LSH at s=0.5 banded 90% of cross pairs
    -- candidate volume exploded xN^2 despite verified pairs staying
    linear). Token-VECTOR similarity (q88's sign-LSH) still sees
    ~2/3 shared vocabulary across replicas, so q88's candidate curve
    carries a documented leakage term.
"""
import sys, os, shutil
import duckdb

src, dst, n = sys.argv[1], sys.argv[2], int(sys.argv[3])
mutate = "--mutate" in sys.argv[4:]
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

# every 3rd token replaced by a replica-tagged marker (replica 0 keeps
# the original text, so the base corpus is a subset of every scale)
MUTATED_TEXT = (
    "CASE WHEN r = 0 THEN text ELSE array_to_string("
    "  list_transform(range(1, len(str_split(text, ' ')) + 1),"
    "    i -> CASE WHEN i % 3 = 0 THEN 'zzr' || r || 'x' || (i // 3)"
    "         ELSE str_split(text, ' ')[i] END), ' ') END")

# per-replica ORTHOGONAL transform of the embedding (cyclic dim rotation
# by 7r + alternating sign flips keyed to r): preserves every
# within-replica pairwise cosine EXACTLY (planted near-dup structure and
# cluster sizes are untouched) while sending cross-replica cosine of the
# same base vector to ~0, so vector near-dup/ANN candidates stay
# within-replica and scale linearly
MUTATED_EMB = (
    "CASE WHEN r = 0 THEN embedding ELSE "
    "list_transform(range(1, len(embedding) + 1), "
    "  i -> embedding[(((i - 1) * (2 * r + 13) + r * 7) % len(embedding)) + 1] * "
    "       (CASE WHEN (i * (r + 13)) % 97 < 48 THEN 1 ELSE -1 END)) END")

for t in ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]:
    sp, dp = f"{src}/{t}.parquet", f"{dst}/{t}.parquet"
    if t in REPL:
        sel = REPL[t]
        if t == "documents" and mutate:
            sel = sel.replace("text", f"{MUTATED_TEXT} AS text")
        if t == "embeddings" and mutate:
            sel = sel.replace("embedding", f"{MUTATED_EMB} AS embedding")
        # ROW_GROUP_SIZE: duckdb's default 122880-row groups make a 50 MB
        # scale file ONE unsplittable unit — every Spark scan stage over
        # it ran 1-2 tasks with 30 cores idle, and the sweep read as
        # superlinear (x10 q107 "38x") when the real cause was serial
        # scans. Real corpora arrive as many files/row groups; 8192-row
        # groups make the synthetic layout realistic (~50 splittable
        # groups per x10 fact table).
        con.sql(f"COPY (SELECT {sel} FROM '{sp}' "
                f"CROSS JOIN (SELECT unnest(range({n})) AS r)) "
                f"TO '{dp}' (FORMAT PARQUET, ROW_GROUP_SIZE 8192)")
    else:
        shutil.copyfile(sp, dp)
    print(t, "->", dp)
