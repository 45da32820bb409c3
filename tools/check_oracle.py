#!/usr/bin/env python3
"""Local differential check mimicking the driver's DuckDB oracle gate.

Usage: python3 tools/check_oracle.py <sfdir> <verify_outdir>

Reads each <outdir>/<name> parquet (Spark result), runs the matching
oracle_sql.json SQL in DuckDB over <sfdir>'s tables, sorts columns by
name and rows by all values, and compares cell-by-cell (exact; floats
also reported with max abs diff so near-misses are visible).
"""
import sys, json, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_df = norm(con.sql(
                f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").df())
            duck_df = norm(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        errs = []
        if list(spark_df.columns) != list(duck_df.columns):
            errs.append(f"cols spark={list(spark_df.columns)} duck={list(duck_df.columns)}")
        elif len(spark_df) != len(duck_df):
            errs.append(f"rows spark={len(spark_df)} duck={len(duck_df)}")
        else:
            for c in spark_df.columns:
                a, b = spark_df[c], duck_df[c]
                neq = 0
                maxd = 0.0
                for x, y in zip(a, b):
                    if x is None and y is None:
                        continue
                    xn = isinstance(x, float) and math.isnan(x)
                    yn = isinstance(y, float) and math.isnan(y)
                    if xn and yn:
                        continue
                    if isinstance(x, float) and isinstance(y, float):
                        if x != y:
                            neq += 1
                            maxd = max(maxd, abs(x - y))
                    elif str(x) != str(y):
                        neq += 1
                if neq:
                    errs.append(f"col {c}: {neq} diffs" + (f" maxabs={maxd:g}" if maxd else ""))
        if errs:
            print(f"FAIL {name}: " + "; ".join(errs))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_df)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
