"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The flagship extraction is benchmarked over a cached deterministic
interleaved-docs parquet (generated once per scale from the seeded fixture
generator — BASELINE.md: "no external data"), sized ~200k docs/sf-unit.
Extra keys: extraction docs/sec (the BASELINE.json headline metric).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache")

# ops benched at the sf dir alongside extraction
OPS_QUERIES = (
    "t1_ws_token_stats",
    "j1_dict_semijoin",
    "quality_score",
    "lang_id_stopwords",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "simhash16",
    "ann_cosine_topk",
    "emb_neardup_pairs",
    "ann_rp_topk",
    "emb_neardup_banded",
    "r1_pricing_summary",
    "r2_segment_revenue",
)


def sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def ensure_bench_docs(spark, n_docs: int) -> str:
    path = os.path.join(BENCH_CACHE, f"docs_{n_docs}.parquet")
    if not os.path.exists(path):
        from astrospark.fixtures import write_docs_parquet

        write_docs_parquet(path, n_docs, seed=7, skew_every=500, rows_per_file=1024)
    return path


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_of(sf_dir)
    n_docs = max(int(200_000 * sf), 500)

    from astrospark.engine.extraction import broadcast_artifacts, extract_spans
    from astrospark.engine.session import build_session

    spark = build_session(
        app_name="astrospark-bench", master=f"local[{cpus}]", shuffle_partitions=max(cpus, 8)
    )
    import __spark_entry__ as E

    docs_path = ensure_bench_docs(spark, n_docs)
    bcast = broadcast_artifacts(spark)

    timings: dict[str, float] = {}

    # flagship: extraction throughput over the interleaved corpus
    docs = spark.read.parquet(docs_path)
    # warm ALL python workers + broadcast with one full untimed pass
    # (one-time setup at scale; limit() would coalesce to a single
    # partition and leave the other workers cold)
    extract_spans(docs, bcast).count()
    # best-of-2: this sandbox VM's wall-clock is noisy (±3× run-to-run,
    # see BENCH/BASELINE.md); min over repeats is the stable estimator
    n_spans = 0

    def time_extract() -> float:
        nonlocal n_spans
        t0 = time.time()
        n_spans = extract_spans(docs, bcast).count()
        return time.time() - t0

    dt = min(time_extract() for _ in range(2))
    timings["extract_flagship"] = round(dt, 3)
    docs_per_sec = n_docs / dt

    qs = E.queries()
    for name in OPS_QUERIES:
        fn = qs[name]
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            fn(spark, sf_dir).count()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "extraction_docs_per_sec": round(docs_per_sec, 1),
                "extraction_docs": n_docs,
                "extraction_spans": n_spans,
                "cpus": cpus,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
