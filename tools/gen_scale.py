#!/usr/bin/env python3
"""Scale-up generator for bench evidence (BASELINE.md scale table).

Builds an sfN-like dataset by replicating the sf0.1 fixtures R times
with key offsets: dimension tables are copied verbatim; fact tables
(orders, lineitem, events, documents, embeddings) get disjoint key
ranges per replica so joins and groupings keep their structure while
row counts scale linearly. Timestamps, values, and text are left
unchanged — replica r of a document is an exact duplicate with a new
doc_id, which is also a realistic duplication profile for web-scale
corpora (the dedup pipeline has real work to do).

Usage: gen_scale.py [dst_dir] [replicas]   (defaults: /tmp/sf1 10)
Never touches /root/testdata.
"""
import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
DST = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
R = int(sys.argv[2]) if len(sys.argv) > 2 else 10

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()


def copy(sql, name):
    con.execute(
        f"COPY ({sql}) TO '{DST}/{name}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM '{DST}/{name}.parquet'").fetchone()[0]
    print(f"{name}: {n} rows")


for t in ["region", "nation", "customer", "supplier", "part"]:
    copy(f"SELECT * FROM '{SRC}/{t}.parquet'", t)

okey = con.execute(f"SELECT max(o_orderkey)+1 FROM '{SRC}/orders.parquet'").fetchone()[0]
copy(f"""SELECT o_orderkey + r.i*{okey} AS o_orderkey, o_custkey, o_orderstatus,
                o_totalprice, o_orderdate, o_orderpriority
         FROM '{SRC}/orders.parquet', range({R}) r(i)""", "orders")
copy(f"""SELECT l_orderkey + r.i*{okey} AS l_orderkey, l_partkey, l_suppkey,
                l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
                l_returnflag, l_linestatus, l_shipdate
         FROM '{SRC}/lineitem.parquet', range({R}) r(i)""", "lineitem")

ekey = con.execute(f"SELECT max(event_id)+1 FROM '{SRC}/events.parquet'").fetchone()[0]
ukey = con.execute(f"SELECT max(user_id)+1 FROM '{SRC}/events.parquet'").fetchone()[0]
copy(f"""SELECT event_id + r.i*{ekey} AS event_id, ts,
                user_id + r.i*{ukey} AS user_id, event_type, value, props
         FROM '{SRC}/events.parquet', range({R}) r(i)""", "events")

dkey = con.execute(f"SELECT max(doc_id)+1 FROM '{SRC}/documents.parquet'").fetchone()[0]
copy(f"""SELECT doc_id + r.i*{dkey} AS doc_id, text, lang, source, n_chars
         FROM '{SRC}/documents.parquet', range({R}) r(i)""", "documents")

vkey = con.execute(f"SELECT max(vec_id)+1 FROM '{SRC}/embeddings.parquet'").fetchone()[0]
copy(f"""SELECT vec_id + r.i*{vkey} AS vec_id, embedding, label
         FROM '{SRC}/embeddings.parquet', range({R}) r(i)""", "embeddings")
