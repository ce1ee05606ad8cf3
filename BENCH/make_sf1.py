#!/usr/bin/env python
"""Synthesize an sf1 corpus (10x sf0.1) for the scale-flip check
(r5 verdict #5): deterministic key-offset replication of the
driver-provided sf0.1 parquet — NO new random data, so every DuckDB
oracle still runs on the identical input Spark reads.

Each of the 10 copies offsets every surrogate key by copy_index *
stride (stride = a round power of ten above the base table's max key),
so FK integrity (orders->customer, lineitem->orders/part/supplier,
events->user) holds copy-internally and keys never collide across
copies. region/nation are fixed dimensions and copied once.

Content perturbation (deterministic, copy-indexed) keeps the dedup/ANN
families out of the everything-is-a-duplicate regime:
  * documents.text gets a ' c<copy>' suffix (changes shingles mildly);
  * embeddings shift component 0 by copy * 1e-3.

Usage: python BENCH/make_sf1.py [--src /root/testdata/sf0.1]
                                [--dst /dev/shm/testdata_sf1] [--copies 10]
"""

from __future__ import annotations

import argparse
import os

import duckdb

FIXED = ["region", "nation"]
STRIDES = {
    "customer": ("c_custkey", 100_000),
    "supplier": ("s_suppkey", 10_000),
    "part": ("p_partkey", 100_000),
    "orders": ("o_orderkey", 1_000_000),
    "lineitem": ("l_orderkey", 1_000_000),
    "events": ("event_id", 1_000_000),
    "documents": ("doc_id", 100_000),
    "embeddings": ("vec_id", 100_000),
}


def copy_sql(table: str, src: str, c: int) -> str:
    p = f"read_parquet('{src}/{table}.parquet')"
    if table == "customer":
        return (f"SELECT c_custkey + {c}*100000 AS c_custkey, c_name, "
                f"c_nationkey, c_acctbal, c_mktsegment FROM {p}")
    if table == "supplier":
        return (f"SELECT s_suppkey + {c}*10000 AS s_suppkey, s_name, "
                f"s_nationkey, s_acctbal FROM {p}")
    if table == "part":
        return (f"SELECT p_partkey + {c}*100000 AS p_partkey, p_name, "
                f"p_brand, p_type, p_size, p_retailprice FROM {p}")
    if table == "orders":
        return (f"SELECT o_orderkey + {c}*1000000 AS o_orderkey, "
                f"o_custkey + {c}*100000 AS o_custkey, o_orderstatus, "
                f"o_totalprice, o_orderdate, o_orderpriority FROM {p}")
    if table == "lineitem":
        return (f"SELECT l_orderkey + {c}*1000000 AS l_orderkey, "
                f"l_partkey + {c}*100000 AS l_partkey, "
                f"l_suppkey + {c}*10000 AS l_suppkey, l_linenumber, "
                f"l_quantity, l_extendedprice, l_discount, l_tax, "
                f"l_returnflag, l_linestatus, l_shipdate FROM {p}")
    if table == "events":
        return (f"SELECT event_id + {c}*1000000 AS event_id, ts, "
                f"user_id + {c}*100000 AS user_id, event_type, value, "
                f"props FROM {p}")
    if table == "documents":
        # suffix AFTER n_chars is computed upstream: recompute n_chars
        # so the (text, n_chars) invariant queries keep holding
        return (f"SELECT doc_id + {c}*100000 AS doc_id, "
                f"text || ' c{c}' AS text, lang, source, "
                f"CAST(length(text || ' c{c}') AS BIGINT) AS n_chars "
                f"FROM {p}")
    if table == "embeddings":
        return (f"SELECT vec_id + {c}*100000 AS vec_id, "
                f"list_transform(embedding, (x, i) -> CASE WHEN i = 1 "
                f"THEN CAST(x + {c} * 0.001 AS FLOAT) ELSE x END) "
                f"AS embedding, label FROM {p}")
    raise ValueError(table)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/dev/shm/testdata_sf1")
    ap.add_argument("--copies", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.dst, exist_ok=True)
    con = duckdb.connect()
    for t in FIXED:
        con.sql(
            f"COPY (SELECT * FROM read_parquet('{args.src}/{t}.parquet')) "
            f"TO '{args.dst}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied")
    for t in STRIDES:
        union = " UNION ALL ".join(
            copy_sql(t, args.src, c) for c in range(args.copies)
        )
        con.sql(f"COPY ({union}) TO '{args.dst}/{t}.parquet' (FORMAT PARQUET)")
        n = con.sql(
            f"SELECT count(*) FROM read_parquet('{args.dst}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
