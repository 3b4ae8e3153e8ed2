#!/usr/bin/env python
"""Generate an sf1 scale-drill corpus (10x sf0.1) under .scratch/sf1.

/root/testdata is read-only and ships no sf1, so the scale-proof drill
(VERDICT r7 item 7) synthesizes one DETERMINISTICALLY from sf0.1: ten
key-offset replicas of every scaling table, foreign keys offset
consistently so join selectivities and per-key distributions are
preserved (each replica is a disjoint copy of the sf0.1 universe —
row counts, group sizes and join fan-outs scale exactly 10x, which is
the property the drill measures). Content columns are salted per
replica so text/embedding similarity structure is replicated, not
collapsed into 10-way exact duplicates (which would explode every LSH
bucket 10x and measure skew amplification instead of scale):

* documents.text gets a per-replica prefix token ("r{k} ") — shingle
  sets shift slightly, near-dup pairs stay within-replica;
* embeddings.embedding is rotated by k positions — norms and pairwise
  geometry inside a replica are preserved, replicas land in different
  regions of the space.

Bounded dims (region, nation) are copied as-is. Pure DuckDB — no
Spark session needed; output is one parquet file per table, the same
layout load_table expects. Idempotent: skips tables already present.
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
DST = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   ".scratch", "sf1")
REPLICAS = 10

# per-table key columns to offset: (column, offset_base_table)
#   offset unit = (max key of that base table) + 1, per replica k
OFFSETS = {
    "customer": [("c_custkey", "customer.c_custkey")],
    "supplier": [("s_suppkey", "supplier.s_suppkey")],
    "part": [("p_partkey", "part.p_partkey")],
    "orders": [
        ("o_orderkey", "orders.o_orderkey"),
        ("o_custkey", "customer.c_custkey"),
    ],
    "lineitem": [
        ("l_orderkey", "orders.o_orderkey"),
        ("l_partkey", "part.p_partkey"),
        ("l_suppkey", "supplier.s_suppkey"),
    ],
    "events": [
        ("event_id", "events.event_id"),
        ("user_id", "events.user_id"),
    ],
    "documents": [("doc_id", "documents.doc_id")],
    "embeddings": [("vec_id", "embeddings.vec_id")],
}


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    units: dict[str, int] = {}
    for ref in {r for cols in OFFSETS.values() for _, r in cols}:
        t, c = ref.split(".")
        (mx,) = con.execute(
            f"SELECT MAX({c}) FROM read_parquet('{SRC}/{t}.parquet')"
        ).fetchone()
        units[ref] = int(mx) + 1

    for t in ("region", "nation"):
        out = f"{DST}/{t}.parquet"
        if not os.path.exists(out):
            con.execute(
                f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet'))"
                f" TO '{out}' (FORMAT PARQUET)"
            )
        print(f"{t}: copied")

    for t, offs in OFFSETS.items():
        out = f"{DST}/{t}.parquet"
        if os.path.exists(out):
            print(f"{t}: exists, skipped")
            continue
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{t}.parquet')"
            ).fetchall()
        ]
        off_map = dict(offs)
        sel = []
        for c in cols:
            if c in off_map:
                sel.append(f"{c} + k.k * {units[off_map[c]]} AS {c}")
            elif t == "documents" and c == "text":
                # per-replica salt token; replica 0 is sf0.1 verbatim
                sel.append(
                    "CASE WHEN k.k = 0 THEN text"
                    " ELSE 'r' || k.k || ' ' || text END AS text"
                )
            elif t == "documents" and c == "n_chars":
                sel.append(
                    "CASE WHEN k.k = 0 THEN n_chars"
                    " ELSE n_chars + 3 + CAST(k.k >= 10 AS BIGINT)"
                    " END AS n_chars"
                )
            elif t == "embeddings" and c == "embedding":
                # rotate by k: geometry within a replica preserved
                sel.append(
                    "CASE WHEN k.k = 0 THEN embedding ELSE "
                    "list_cat(embedding[CAST(k.k + 1 AS INT):],"
                    " embedding[:CAST(k.k AS INT)]) END AS embedding"
                )
            else:
                sel.append(c)
        q = (
            f"COPY (SELECT {', '.join(sel)} "
            f"FROM read_parquet('{SRC}/{t}.parquet'), "
            f"range({REPLICAS}) k(k) ORDER BY {offs[0][0]}) "
            f"TO '{out}' (FORMAT PARQUET)"
        )
        con.execute(q)
        (n,) = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{out}')"
        ).fetchone()
        print(f"{t}: {n} rows")
    print(f"sf1 ready at {DST}", file=sys.stderr)


if __name__ == "__main__":
    main()
