#!/usr/bin/env python3
"""DuckDB twin of graft.BenchGraphScale (driver-side tooling only):
time the 5-iteration unrolled-CTE fixed-point PageRank on the same
k-replicated customer-supplier trading graph. Together the two timings
measure the engines' iteration machinery on identical graphs — the
crossover data behind BASELINE.md's PageRank discussion.

Usage: python3 tools/graph_scale.py <sfdir> [k ...]
"""
import sys
import time

import duckdb

ITER = """r{i} AS (SELECT e.dst AS node,
  {tp} + (85 * CAST(SUM(r.r // e.outdeg) AS BIGINT)) // 100 AS r
  FROM e JOIN r{prev} r ON e.src = r.node
  GROUP BY e.dst)"""


def main():
    sfdir = sys.argv[1]
    ks = [int(a) for a in sys.argv[2:]] or [1, 4, 16]
    con = duckdb.connect()
    con.execute(
        f"""CREATE TABLE pairs0 AS
        SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
        FROM read_parquet('{sfdir}/lineitem.parquet') l
        JOIN read_parquet('{sfdir}/orders.parquet') o
          ON l.l_orderkey = o.o_orderkey"""
    )
    n_pairs = con.sql("SELECT COUNT(*) FROM pairs0").fetchone()[0]
    for k in ks:
        # replicated pair list materialized OUTSIDE the timer (the
        # Spark twin checkpoints it before its timer too); the timed
        # region covers bidirecting + degree + the 5 iterations, the
        # same work pagerankMicro's timed region does.
        con.execute("DROP TABLE IF EXISTS pairs")
        con.execute("DROP TABLE IF EXISTS e")
        con.execute(
            f"""CREATE TABLE pairs AS
            SELECT a + rep * 1000000000 AS a, b + rep * 1000000000 AS b
            FROM pairs0 CROSS JOIN (SELECT UNNEST(range(0, {k})) AS rep)"""
        )
        t0 = time.time()
        con.execute(
            """CREATE TABLE e AS
            WITH ed AS (SELECT a AS src, b AS dst FROM pairs
                        UNION ALL SELECT b, a FROM pairs),
            deg AS (SELECT src, COUNT(*) AS outdeg FROM ed GROUP BY src)
            SELECT ed.src, ed.dst, deg.outdeg
            FROM ed JOIN deg ON ed.src = deg.src"""
        )
        # same integer fixed-point arithmetic as the graph06 oracle;
        # teleport folded per-iteration from the node count
        n = con.sql("SELECT COUNT(DISTINCT src) FROM e").fetchone()[0]
        per_node = 1000000000000 // n
        tp = (15 * per_node) // 100
        iters = ",\n".join(
            ITER.format(i=i, prev=i - 1, tp=tp) for i in range(1, 6)
        )
        con.sql(
            f"""WITH r0 AS (SELECT DISTINCT src AS node, {per_node} AS r FROM e),
            {iters}
            SELECT COUNT(*), SUM(r) FROM r5"""
        ).fetchall()
        dt = time.time() - t0
        print(
            f"k={k:<3d} pairs={n_pairs * k:<9d} edges={2 * n_pairs * k:<9d} "
            f"duckdb_sec={dt:.2f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
