#!/usr/bin/env python3
"""Deterministic sf1 synthesis from the driver's sf0.1 testdata (seed 42).

The driver ships sf0.001/0.01/0.1; the 100 TB scale story needs at least one
measured decade of scaling, so this emits a 10x corpus with the SAME workload
shape per unit of data:

- TPC-H-ish fact/dim tables (customer/supplier/part/orders/lineitem/events):
  10 id-offset replicas. Every key space is shifted by replica*(max_key+1),
  so referential integrity holds within each replica and join fan-outs,
  group sizes per key, and per-user histories are IDENTICAL to sf0.1 --
  the corpus grows 10x in entities, not in per-entity skew.
- region/nation: fixed dimensions, copied verbatim (as in real TPC-H).
- documents: 10 replicas; replica r>0 maps text through a seeded alphabet
  permutation (translate(), case-preserving, punctuation/digits untouched).
  A bijection on characters is a bijection on tokens and shingles, so each
  replica's near-dup/cluster structure is EXACTLY the original's, while
  cross-replica shingle overlap is destroyed (different alphabets). Dedup
  workload therefore scales linearly by construction: 10x docs, 10x
  near-dup pairs, same cluster-size distribution. n_chars is preserved
  (translate is length-preserving).
- embeddings: 10 replicas; replica r>0 applies a seeded coordinate
  permutation + sign flip (a hypercube isometry). Within-replica pairwise
  distances/cosines are EXACTLY the original's; a vector and its
  cross-replica image are ~orthogonal in 64-dim, so ANN/k-means/SemDeDup
  workloads also scale linearly: 10x corpus, same per-replica neighborhood
  structure. vec_id offsets keep the fixed query set (vec_id < 20) and the
  k-means seeds (vec_id < K) in replica 0 -- the realistic shape: a fixed
  query/seed set against a growing corpus.

Usage: python3 tools/gen_sf1.py [out_dir] [replicas]
Defaults: out_dir=data/sf1, replicas=10. Output is gitignored (170 MB);
BENCH_sf1.json + SCALE.md carry the measured curve.
"""
import os
import random
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "data/sf1"
REPLICAS = int(sys.argv[2]) if len(sys.argv) > 2 else 10
SEED = 42

OFF = {  # key space -> offset unit (max key + 1 at sf0.1)
    "custkey": 15000, "suppkey": 1000, "partkey": 20000,
    "orderkey": 150000, "event_id": 100000, "user_id": 1500,
    "doc_id": 5000, "vec_id": 2000,
}

LOWER = "abcdefghijklmnopqrstuvwxyz"


def perm_alphabet(r: int) -> str:
    if r == 0:
        return LOWER
    rng = random.Random(f"{SEED}-alpha-{r}")
    chars = list(LOWER)
    rng.shuffle(chars)
    return "".join(chars)


def dim_isometry(r: int, dims: int = 64):
    """(permutation, signs) for replica r; identity for r=0."""
    if r == 0:
        return list(range(dims)), [1] * dims
    rng = random.Random(f"{SEED}-dims-{r}")
    perm = list(range(dims))
    rng.shuffle(perm)
    signs = [rng.choice((-1, 1)) for _ in range(dims)]
    return perm, signs


def union_all(per_replica_sql):
    return "\nUNION ALL\n".join(per_replica_sql(r) for r in range(REPLICAS))


def main():
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    # replica counts >~900 build UNION ALL chains past DuckDB's default
    # 1000-term expression depth (hit at the sf100 third-decade spot)
    con.execute("SET max_expression_depth TO 100000")
    con.execute(f"SET threads TO {os.cpu_count() or 8}")

    def src(t):
        return f"read_parquet('{SRC}/{t}.parquet')"

    def emit(table, sql):
        con.execute(
            f"COPY ({sql}) TO '{OUT}/{table}.parquet' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{OUT}/{table}.parquet')"
        ).fetchone()[0]
        print(f"{table}: {n} rows")

    for t in ("region", "nation"):
        emit(t, f"SELECT * FROM {src(t)}")

    emit("customer", union_all(lambda r: f"""
        SELECT c_custkey + {r * OFF['custkey']} AS c_custkey, c_name,
               c_nationkey, c_acctbal, c_mktsegment FROM {src('customer')}"""))

    emit("supplier", union_all(lambda r: f"""
        SELECT s_suppkey + {r * OFF['suppkey']} AS s_suppkey, s_name,
               s_nationkey, s_acctbal FROM {src('supplier')}"""))

    emit("part", union_all(lambda r: f"""
        SELECT p_partkey + {r * OFF['partkey']} AS p_partkey, p_name,
               p_brand, p_type, p_size, p_retailprice FROM {src('part')}"""))

    emit("orders", union_all(lambda r: f"""
        SELECT o_orderkey + {r * OFF['orderkey']} AS o_orderkey,
               o_custkey + {r * OFF['custkey']} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM {src('orders')}"""))

    emit("lineitem", union_all(lambda r: f"""
        SELECT l_orderkey + {r * OFF['orderkey']} AS l_orderkey,
               l_partkey + {r * OFF['partkey']} AS l_partkey,
               l_suppkey + {r * OFF['suppkey']} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM {src('lineitem')}"""))

    # ts stays in the original range: 10x the users over the same dates --
    # event RATE grows, per-user history is unchanged (sessionization,
    # retention and windowing see the same per-key shapes).
    emit("events", union_all(lambda r: f"""
        SELECT event_id + {r * OFF['event_id']} AS event_id,
               ts::TIMESTAMP AS ts,
               user_id + {r * OFF['user_id']} AS user_id,
               event_type, value, props
        FROM {src('events')}"""))

    def doc_sql(r):
        p = perm_alphabet(r)
        return f"""
        SELECT doc_id + {r * OFF['doc_id']} AS doc_id,
               translate(text, '{LOWER}{LOWER.upper()}',
                               '{p}{p.upper()}') AS text,
               lang, source, n_chars
        FROM {src('documents')}"""
    emit("documents", union_all(doc_sql))

    def emb_sql(r):
        perm, signs = dim_isometry(r)
        elems = ", ".join(
            f"embedding[{perm[d] + 1}] * {signs[d]}" for d in range(64))
        return f"""
        SELECT vec_id + {r * OFF['vec_id']} AS vec_id,
               [{elems}]::FLOAT[] AS embedding, label
        FROM {src('embeddings')}"""
    emit("embeddings", union_all(emb_sql))


if __name__ == "__main__":
    main()
