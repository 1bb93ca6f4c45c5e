"""Local mirror of the driver's CORRECTNESS gate: runs every
__spark_entry__ queries()[name] on Spark and the matching oracle_sql()[name]
on DuckDB over the same sf dir, comparing row count, column names, and an
order-insensitive value multiset (columns sorted by name, rows sorted).

Usage: python scripts/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # driver hashes raw values; we canonicalize floats to 10 sig digits
        return f"{v:.10g}"
    if hasattr(v, "item"):
        return norm_cell(v.item())
    return repr(v)


def canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as E
    from astrospark.engine.session import build_session

    spark = build_session(app_name="contract-check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = E.queries()
    oracles = E.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            spark_rows = df.collect()
            spark_cols = df.columns
        except Exception as ex:  # noqa: BLE001
            failures.append((name, f"spark error: {ex}"))
            print(f"FAIL {name}: spark error: {str(ex)[:300]}")
            continue
        if name not in oracles:
            print(f"rows-only {name}: {len(spark_rows)} rows")
            continue
        try:
            res = con.execute(oracles[name])
            duck_cols = [d[0] for d in res.description]
            duck_rows = res.fetchall()
        except Exception as ex:  # noqa: BLE001
            failures.append((name, f"duckdb error: {ex}"))
            print(f"FAIL {name}: duckdb error: {str(ex)[:300]}")
            continue
        ok = True
        if sorted(spark_cols) != sorted(duck_cols):
            failures.append((name, f"columns {spark_cols} vs {duck_cols}"))
            ok = False
        elif len(spark_rows) != len(duck_rows):
            failures.append((name, f"rowcount {len(spark_rows)} vs {len(duck_rows)}"))
            ok = False
        else:
            a = canon([tuple(r) for r in spark_rows], spark_cols)
            b = canon(duck_rows, duck_cols)
            if a != b:
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                failures.append((name, f"values differ, e.g. {diff}"))
                ok = False
        print(("OK   " if ok else "FAIL ") + f"{name}: {len(spark_rows)} rows")
    spark.stop()
    print()
    if failures:
        print(f"{len(failures)} FAILURES:")
        for n, msg in failures:
            print(" -", n, ":", msg[:500])
        return 1
    print("all checked queries match")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
