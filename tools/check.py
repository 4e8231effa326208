#!/usr/bin/env python3
"""Local dev harness mimicking the driver's correctness gate.

NOT part of the library (driver-side tooling only). Usage:
    python3 tools/check.py <sfdir> <verify_outdir> [query ...]

Reads each <outdir>/<name>/ parquet (Spark result), runs the matching
oracle SQL from <outdir>/oracle_sql.json in DuckDB against views named
after the tables in <sfdir>, then compares: columns sorted by name,
rows sorted by all columns, exact value + dtype equality.
"""
import sys, json, glob

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        spark_df = con.sql(
            f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").df()
        try:
            ora_df = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        s, o = canon(spark_df), canon(ora_df)
        ok = True
        if list(s.columns) != list(o.columns):
            print(f"FAIL {name}: columns spark={list(s.columns)} oracle={list(o.columns)}")
            ok = False
        elif [str(d) for d in s.dtypes] != [str(d) for d in o.dtypes]:
            print(f"FAIL {name}: dtypes spark={list(map(str, s.dtypes))} oracle={list(map(str, o.dtypes))}")
            ok = False
        elif len(s) != len(o):
            print(f"FAIL {name}: rows spark={len(s)} oracle={len(o)}")
            ok = False
        elif not s.equals(o):
            neq = (s != o) & ~(s.isna() & o.isna())
            bad = neq.any(axis=1)
            print(f"FAIL {name}: {int(bad.sum())}/{len(s)} rows differ; first:")
            print(s[bad].head(3))
            print(o[bad].head(3))
            ok = False
        if ok:
            print(f"PASS {name} ({len(s)} rows)")
            n_pass += 1
        else:
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
