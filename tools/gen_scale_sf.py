"""Derive a larger benchmark-only dataset from the driver's sf0.1
testdata by replicating every scaling table N times with disjoint key
spaces — the scale-curve input for BENCH_SCALE.json (sf0.1 -> sf1
per-query scaling ratios). BENCHMARK DATA ONLY: correctness runs stay
on the driver's own testdata.

Construction (N=10 -> "sf1"): each replica r offsets every key column
by r * STRIDE (one shared stride, far above any sf0.1 key), so joins
keep their exact selectivity (each fact row still matches exactly one
dim row) and group cardinalities scale linearly. Non-key values are
copied verbatim — distributions are preserved by construction.
`documents.text` gets a per-replica suffix token so the exact-dedup
signature space scales instead of collapsing into 10-way duplicate
clusters; near-dup queries DO see every cross-replica pair as a
candidate (documented: at sf1 the LSH queries measure the
high-duplication regime). region/nation stay fixed (TPC-H semantics).

Usage: python tools/gen_scale_sf.py [N] [out_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
STRIDE = 10_000_000

# key columns to offset, per table
KEYS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "embeddings": ["vec_id"],
}
COPY = ["region", "nation"]


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".scale", "sf1",
        )
    )
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE TABLE reps AS SELECT * FROM range({n}) t(r)")
    for t in COPY:
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO "
            f"'{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(t, "copied")
    for t, keys in KEYS.items():
        cols = [
            f.split(":")[0]
            for f in con.execute(
                f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'"
            ).df()["column_name"]
        ]
        sel = ", ".join(
            f"{c} + r * {STRIDE} AS {c}" if c in keys else c for c in cols
        )
        con.execute(
            f"COPY (SELECT {sel} FROM '{SRC}/{t}.parquet', reps) TO "
            f"'{out}/{t}.parquet' "
            f"(FORMAT PARQUET, ROW_GROUP_SIZE 65536)"
        )
        print(t, "x", n)
    # documents: offset ids AND make replica text distinct (suffix
    # token) so exact signatures scale; n_chars recomputed to stay
    # consistent with the mutated text
    con.execute(
        f"""COPY (
          SELECT doc_id + r * {STRIDE} AS doc_id,
                 CASE WHEN r = 0 THEN text
                      ELSE text || ' replicatag' || r END AS text,
                 lang, source,
                 CAST(LENGTH(CASE WHEN r = 0 THEN text
                      ELSE text || ' replicatag' || r END) AS BIGINT)
                   AS n_chars
          FROM '{SRC}/documents.parquet', reps
        ) TO '{out}/documents.parquet'
        (FORMAT PARQUET, ROW_GROUP_SIZE 2048)"""
    )
    print("documents x", n)


if __name__ == "__main__":
    main()
