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


def type_class(t) -> str:
    """Collapse an engine type name to the class that matters for a
    fetch-path-dependent harness: int64-representable, float, string.
    DuckDB HUGEINT (int128 — what sum(BIGINT) widens to) and DECIMAL are
    their OWN classes: they degrade to float64/decimal128 under
    pandas/arrow fetch, so a driver that hashes fetched frames sees
    '123.0' vs Spark's '123' even when every value is equal — the exact
    r4 trailing_window_agg failure. A green contract row requires the
    classes to MATCH, not just the values under fetchall()."""
    t = str(t).upper()
    if "HUGEINT" in t:
        return "hugeint"
    if "DECIMAL" in t:
        return "decimal"
    if any(k in t for k in ("INT", "LONG", "SHORT", "BYTE")):
        return "int"
    if any(k in t for k in ("DOUBLE", "FLOAT")):
        return "float"
    if any(k in t for k in ("STRING", "VARCHAR", "CHAR")):
        return "str"
    return t.lower()


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


def assert_sf_docs_extract_nothing(sf_dir: str) -> None:
    """Explicit precondition of the flagship golden oracle: the driver's
    filler documents must yield ZERO extractions, at EVERY sf the driver
    may use (ADVICE r1) — otherwise tests/golden/flagship_spans.parquet
    (fixture-only spans) would be the wrong expected output. Checked with
    the independent SCALAR oracle, not the kernel under test."""
    import pyarrow.parquet as pq

    from astrospark.crf import CrfModel
    from astrospark.lexicon import load_artifacts
    from astrospark.oracle import process_document
    from astrospark.train import WEIGHTS_PATH

    vocab, trie = load_artifacts()
    model = CrfModel.load(WEIGHTS_PATH)
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    n_spans = 0
    for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        spans = process_document(
            [{"kind": "text", "text": text, "media_ref": "", "offset": 0}],
            vocab, trie, model,
        )
        if spans:
            n_spans += len(spans)
            print(f"  !! sf doc {doc_id} extracted {len(spans)} spans")
    assert n_spans == 0, (
        f"{sf_dir} documents extracted {n_spans} spans — flagship golden "
        "assumption violated; regen_golden.py must include these docs"
    )
    print(f"OK   flagship precondition: {t.num_rows} sf docs → 0 extractions")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as E
    from astrospark.engine.session import build_session

    if not only or "extract_flagship" in only:
        assert_sf_docs_extract_nothing(sf_dir)

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
        finally:
            # drop operator-internal signature/shingle caches between
            # queries so a full 39-query sweep doesn't accumulate them
            from astrospark.ops.caching import release_caches

            release_caches()
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
        spark_types = {f.name: type_class(f.dataType.simpleString()) for f in df.schema.fields}
        rel = con.sql(f"SELECT * FROM ({oracles[name]}) LIMIT 0")
        duck_types = {c: type_class(t) for c, t in zip(rel.columns, rel.types)}
        type_mismatch = {
            c: (spark_types[c], duck_types[c])
            for c in spark_types
            if c in duck_types and spark_types[c] != duck_types[c]
        }
        if sorted(spark_cols) != sorted(duck_cols):
            failures.append((name, f"columns {spark_cols} vs {duck_cols}"))
            ok = False
        elif type_mismatch:
            failures.append((name, f"type classes differ: {type_mismatch}"))
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
