#!/usr/bin/env python3
"""Synthesize a ~10x (sf1) dataset from sf0.1 for SCALE-VALIDATION
benchmarking (timing only — correctness stays gated at sf0.01).

Usage: python3 tools/make_sf1.py [outDir] [replicas]

Each replica i shifts every primary/foreign key by i*OFFSET so joins
stay consistent within a replica (nation/region stay shared dims).
Content columns are perturbed per replica so the dedup/similarity
workload SHAPE is preserved rather than amplified:
  - documents.text: every word is tagged with the replica id (i>0) —
    cross-replica docs share no tokens/shingles, so near-dup candidate
    sets grow linearly, not quadratically;
  - embeddings: deterministic per-replica jitter on every dimension —
    cross-replica vectors are not mutual near-duplicates.
"""
import os
import sys

import duckdb
import numpy as np

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/benchdata/sf1"
REPLICAS = int(sys.argv[2]) if len(sys.argv) > 2 else 10
OFFSET = 100_000_000

os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()


def gen(table, sql_tpl):
    parts = [sql_tpl.format(i=i, off=i * OFFSET) for i in range(REPLICAS)]
    q = " UNION ALL ".join(parts)
    con.execute(
        f"COPY ({q}) TO '{OUT}/{table}.parquet' (FORMAT PARQUET)")
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{OUT}/{table}.parquet')"
    ).fetchone()[0]
    print(f"{table}: {n} rows")


# shared dims: single copy
for t in ["nation", "region"]:
    con.execute(
        f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
        f"TO '{OUT}/{t}.parquet' (FORMAT PARQUET)")
    print(f"{t}: copied")

gen("supplier", f"""
  SELECT s_suppkey + {{off}} AS s_suppkey, s_name, s_nationkey, s_acctbal
  FROM read_parquet('{SRC}/supplier.parquet')""")

gen("part", f"""
  SELECT p_partkey + {{off}} AS p_partkey, p_name, p_brand, p_type,
         p_size, p_retailprice
  FROM read_parquet('{SRC}/part.parquet')""")

gen("customer", f"""
  SELECT c_custkey + {{off}} AS c_custkey, c_name, c_nationkey,
         c_acctbal, c_mktsegment
  FROM read_parquet('{SRC}/customer.parquet')""")

gen("orders", f"""
  SELECT o_orderkey + {{off}} AS o_orderkey, o_custkey + {{off}} AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM read_parquet('{SRC}/orders.parquet')""")

gen("lineitem", f"""
  SELECT l_orderkey + {{off}} AS l_orderkey, l_partkey + {{off}} AS l_partkey,
         l_suppkey + {{off}} AS l_suppkey, l_linenumber, l_quantity,
         l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
         l_shipdate
  FROM read_parquet('{SRC}/lineitem.parquet')""")

# documents: replica 0 verbatim; i>0 tags every word so shingle/token
# sets are disjoint across replicas
gen("documents", f"""
  SELECT doc_id + {{off}} AS doc_id,
         CASE WHEN {{i}} = 0 THEN text
              ELSE regexp_replace(text, '(\\S+)', '\\1r{{i}}', 'g') END AS text,
         lang, source, n_chars
  FROM read_parquet('{SRC}/documents.parquet')""")

# embeddings via numpy: per-replica deterministic jitter (seed = i),
# strong enough (sigma 0.2 per dim) that cross-replica cosine drops
# well below near-dup thresholds
emb = con.execute(
    f"SELECT vec_id, embedding, label FROM read_parquet('{SRC}/embeddings.parquet') ORDER BY vec_id"
).df()
dims = len(emb["embedding"][0])
frames = []
for i in range(REPLICAS):
    rng = np.random.default_rng(20260812 + i)
    e = emb.copy()
    e["vec_id"] = e["vec_id"] + i * OFFSET
    if i > 0:
        noise = rng.normal(0.0, 0.2, size=(len(e), dims)).astype(np.float32)
        e["embedding"] = [
            (np.asarray(v, dtype=np.float32) + noise[j]).tolist()
            for j, v in enumerate(e["embedding"])]
    frames.append(e)
import pandas as pd  # noqa: E402
allemb = pd.concat(frames, ignore_index=True)
con.register("allemb", allemb)
con.execute(
    f"COPY (SELECT vec_id, CAST(embedding AS FLOAT[]) AS embedding, "
    f"CAST(label AS INTEGER) AS label FROM allemb) "
    f"TO '{OUT}/embeddings.parquet' (FORMAT PARQUET)")
print(f"embeddings: {len(allemb)} rows")

# events: replica-shifted ids, timestamps preserved. Written through
# pandas/pyarrow with ns precision to mirror the source's
# TIMESTAMP(NANOS) physical type (graft.Tables.events expects it).
import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402
ev = pq.read_table(f"{SRC}/events.parquet")
evs = []
for i in range(REPLICAS):
    t = ev
    t = t.set_column(t.schema.get_field_index("event_id"), "event_id",
                     pa.compute.add(t["event_id"], i * OFFSET))
    t = t.set_column(t.schema.get_field_index("user_id"), "user_id",
                     pa.compute.add(t["user_id"], i * OFFSET))
    evs.append(t)
pq.write_table(pa.concat_tables(evs), f"{OUT}/events.parquet")
print(f"events: {sum(t.num_rows for t in evs)} rows")
print("done ->", OUT)
