"""Local emulation of the driver's correctness gate: run every
queries() entry and its oracle_sql() side-by-side on DuckDB, compare
row count, column names, and order-insensitive values.

Usage: python tools/check_contract.py [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 4)
    return v


def norm_rows(cols, rows):
    out = []
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    for r in rows:
        out.append(tuple(norm_cell(r[i]) for i in order))
    return sorted(cols), sorted(out, key=repr)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from jivesearch_spark.session import get_spark

    spark = get_spark(master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = e.queries()
    oracles = e.oracle_sql()
    failed, passed, rows_only = [], [], []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            failed.append((name, f"spark error: {ex}"))
            print(f"[FAIL] {name}: spark error: {ex}")
            continue
        if name not in oracles:
            rows_only.append(name)
            print(f"[rows-only] {name}: {len(srows)} rows "
                  f"({time.time()-t0:.1f}s)")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
            # the driver hashes SERIALIZED values: DuckDB HUGEINT
            # (sum of ints) arrives as arrow decimal128 and hash-
            # mismatches a Spark long even when numerically equal —
            # catch that class locally, values compare equal here
            arrow_types = con.execute(oracles[name]).fetch_arrow_table().schema
            bad = [f.name for f in arrow_types if "decimal" in str(f.type)]
            if bad:
                failed.append((name, f"oracle decimal cols {bad} (CAST to BIGINT/DOUBLE)"))
                print(f"[FAIL] {name}: oracle yields decimal128 for {bad} — "
                      "add CAST(... AS BIGINT/DOUBLE) in the SQL")
                continue
        except Exception as ex:
            failed.append((name, f"duckdb error: {ex}"))
            print(f"[FAIL] {name}: duckdb error: {ex}")
            continue
        sc, sr = norm_rows(scols, srows)
        oc, orr = norm_rows(ocols, orows)
        if sc != oc:
            failed.append((name, f"cols {sc} vs {oc}"))
            print(f"[FAIL] {name}: columns {sc} vs {oc}")
        elif len(sr) != len(orr):
            failed.append((name, f"rowcount {len(sr)} vs {len(orr)}"))
            print(f"[FAIL] {name}: rowcount {len(sr)} vs {len(orr)}")
        elif sr != orr:
            diff_a = [r for r in sr if r not in set(orr)][:3]
            diff_b = [r for r in orr if r not in set(sr)][:3]
            failed.append((name, f"values differ: spark-only {diff_a} oracle-only {diff_b}"))
            print(f"[FAIL] {name}: values differ\n  spark-only: {diff_a}\n  oracle-only: {diff_b}")
        else:
            passed.append(name)
            print(f"[ok] {name}: {len(sr)} rows match ({time.time()-t0:.1f}s)")

    print(f"\n{len(passed)} passed, {len(rows_only)} rows-only, {len(failed)} FAILED")
    if failed:
        for n, why in failed:
            print(f"  FAIL {n}: {why[:200]}")
        sys.exit(1)


if __name__ == "__main__":
    main()
