"""ANN retrieval-quality evidence (VERDICT r2 "Next round" #3).

The contract queries prove the ANN operators' PLUMBING is exact (the
DuckDB twins replay signatures/cells bit-for-bit); this harness measures
what a user actually asks of an ANN index — **recall vs the exact
brute-force baseline, and the candidate-set size that buys it** — and
writes BENCH/RECALL.{json,md}. Three sections:

1. Top-k recall of every ANN operator at its shipped knobs, over a
   deterministic sample of query vectors from the driver testdata
   embeddings. NOTE this corpus is iid-random (neighbors are
   near-orthogonal, cos ≈ 0.3-0.4) — the provably hardest regime for
   hyperplane LSH (Charikar collision prob per bit = 1 - θ/π → ~0.6 at
   these angles, ^16 per band ≈ 4e-4), so these numbers are a floor.
2. The recall KNOB, measured: ann_rp_topk's probe-depth sweep
   ((16,) → (16,8,4,2)) showing recall and candidate volume rising
   together — the LSH-forest tradeoff a deployment tunes.
3. The TARGET regime: a planted near-duplicate corpus (clusters at
   cos ≈ 0.84-0.95, the semantic-dedup case these operators exist for),
   measuring near-dup pair recall of emb_neardup_banded and
   nearest-neighbor recall of knn_join.

Ground truth everywhere is an independent numpy float64 brute-force with
the operators' own ordering contract (cos round 4, vec_id asc). The
approximate side drives the REAL Spark operators; signature/index caches
are reused across probes exactly like a production index-once-probe-many
deployment, then released.

Usage: python scripts/ann_recall.py [sf_dir] [n_queries]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TOPK_OPS = ("ann_rp_topk", "ann_ivf_kmeans_topk", "ann_ivf_topk", "ann_lsh_topk")
SWEEP_DEPTHS = ((16,), (16, 8), (16, 8, 4), (16, 8, 4, 2))
PLANTED_PATH = os.path.join(REPO, ".bench_cache", "planted_emb")


def load_embeddings(sf_dir: str):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    ids = np.asarray(t["vec_id"].to_pylist())
    V = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    return ids, V, Vn @ Vn.T


def exact_topk(S: np.ndarray, ids: np.ndarray, qi: int, k: int) -> list[int]:
    """Top-k ids by (rounded cos desc, vec_id asc), excluding the query —
    the operators' exact ordering contract."""
    sims = np.round(S[qi], 4)
    order = sorted((i for i in range(len(ids)) if i != qi), key=lambda i: (-sims[i], ids[i]))
    return [int(ids[i]) for i in order[:k]]


def sample_queries(ids, n_queries: int) -> list[int]:
    sorted_ids = sorted(int(v) for v in ids)
    step = max(1, len(sorted_ids) // n_queries)
    return sorted_ids[::step][:n_queries]


def ensure_planted_corpus() -> str:
    """Deterministic planted-near-dup embeddings: 800 iid base vectors +
    100 clusters of (parent, 2 perturbed copies) at cos ≈ 0.95 / 0.84.
    Written once under .bench_cache; same {dir}/embeddings.parquet layout
    the operators read (BASELINE.md: no external data — seeded synth)."""
    path = os.path.join(PLANTED_PATH, "embeddings.parquet")
    if os.path.exists(path):
        return PLANTED_PATH
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(13)
    dim, n_base = 64, 800
    base = rng.standard_normal((n_base, dim))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    dups = []
    for j in range(200):
        parent = base[j % 100]
        sigma = 0.04 if j < 100 else 0.08  # cos ≈ 0.95 / 0.84 vs parent
        d = parent + sigma * rng.standard_normal(dim)
        dups.append(d / np.linalg.norm(d))
    V = np.vstack([base, np.asarray(dups)]).astype(np.float32)
    os.makedirs(PLANTED_PATH, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(len(V)), type=pa.int64()),
                "embedding": pa.array([list(map(float, v)) for v in V], type=pa.list_(pa.float32())),
            }
        ),
        path,
    )
    return PLANTED_PATH


def eval_topk_ops(spark, sf_dir, ids, S, sample, release_caches) -> dict:
    from astrospark.ops import similarity as sim
    from astrospark.ops.similarity import TOP_K
    from pyspark.sql import functions as F

    id_pos = {int(v): i for i, v in enumerate(ids)}
    n = len(ids)
    results = {}
    for op_name in TOPK_OPS:
        fn = getattr(sim, op_name)
        recalls, cand_counts, probe_secs = [], [], []
        for q in sample:
            t0 = time.time()
            got = [int(r["vec_id"]) for r in fn(spark, sf_dir, query_vec_id=q).collect()]
            probe_secs.append(time.time() - t0)
            want = exact_topk(S, ids, id_pos[q], TOP_K)
            recalls.append(len(set(got) & set(want)) / TOP_K)
        if op_name == "ann_rp_topk":
            cand_counts = [sim.rp_candidates(spark, sf_dir, query_vec_id=q).count() for q in sample]
        elif op_name in ("ann_ivf_kmeans_topk", "ann_ivf_topk"):
            if op_name == "ann_ivf_kmeans_topk":
                # kmeans_cells now ranks rnk 1..4; membership is rnk==1
                rows = sim.kmeans_cells(spark, sf_dir).filter("rnk = 1").collect()
            else:
                rows = sim.ivf_cells(spark, sf_dir).collect()
            cell_of = {int(r["vec_id"]): r["cell"] for r in rows}
            size_of: dict = {}
            for c in cell_of.values():
                size_of[c] = size_of.get(c, 0) + 1
            cand_counts = [size_of[cell_of[q]] - 1 for q in sample]
        else:  # ann_lsh_topk
            bsize = {r["bucket"]: r["n_vecs"] for r in sim.ann_lsh_buckets(spark, sf_dir).collect()}
            emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
            brow = emb.select("vec_id", sim.sign_bucket(F.col("embedding")).alias("b")).collect()
            bucket_of = {int(r["vec_id"]): r["b"] for r in brow}
            cand_counts = [bsize[bucket_of[q]] - 1 for q in sample]
        release_caches()
        results[op_name] = {
            "k": TOP_K,
            "n_queries": len(sample),
            "recall_mean": round(float(np.mean(recalls)), 4),
            "recall_min": round(float(np.min(recalls)), 4),
            "candidates_mean": round(float(np.mean(cand_counts)), 1),
            "candidates_frac_of_corpus": round(float(np.mean(cand_counts)) / (n - 1), 4),
            "scan_reduction_x": round((n - 1) / max(float(np.mean(cand_counts)), 1.0), 1),
            "probe_sec_mean": round(float(np.mean(probe_secs)), 3),
        }
        print(op_name, results[op_name])
    return results


def eval_depth_sweep(spark, sf_dir, ids, S, sample, release_caches) -> list[dict]:
    from astrospark.ops import similarity as sim
    from astrospark.ops.similarity import TOP_K

    id_pos = {int(v): i for i, v in enumerate(ids)}
    n = len(ids)
    sweep = []
    for depths in SWEEP_DEPTHS:
        recalls, cand_counts = [], []
        for q in sample:
            got = [
                int(r["vec_id"])
                for r in sim.ann_rp_topk(spark, sf_dir, query_vec_id=q, probe_depths=depths).collect()
            ]
            want = exact_topk(S, ids, id_pos[q], TOP_K)
            recalls.append(len(set(got) & set(want)) / TOP_K)
            cand_counts.append(
                sim.rp_candidates(spark, sf_dir, query_vec_id=q, probe_depths=depths).count()
            )
        release_caches()
        row = {
            "probe_depths": list(depths),
            "recall_mean": round(float(np.mean(recalls)), 4),
            "candidates_mean": round(float(np.mean(cand_counts)), 1),
            "candidates_frac_of_corpus": round(float(np.mean(cand_counts)) / (n - 1), 4),
        }
        sweep.append(row)
        print("sweep", row)
    return sweep


def eval_nprobe_sweep(spark, sf_dir, ids, S, sample, release_caches) -> list[dict]:
    """The IVF recall knob, measured: ann_ivf_kmeans_topk at nprobe
    1..4 (FAISS-style multi-cell probing). Candidate count = sum of the
    probed cells' member sizes, so recall and scan volume rise together
    exactly as the sweep shows."""
    from astrospark.ops import similarity as sim
    from astrospark.ops.similarity import TOP_K

    id_pos = {int(v): i for i, v in enumerate(ids)}
    n = len(ids)
    cells = sim.kmeans_cells(spark, sf_dir).collect()
    member_size: dict = {}
    probe_cells: dict[int, list] = {}
    for r in cells:
        if r["rnk"] == 1:
            member_size[r["cell"]] = member_size.get(r["cell"], 0) + 1
        probe_cells.setdefault(int(r["vec_id"]), []).append((r["rnk"], r["cell"]))
    sweep = []
    for nprobe in (1, 2, 3, 4):
        recalls, cand_counts = [], []
        for q in sample:
            got = [
                int(r["vec_id"])
                for r in sim.ann_ivf_kmeans_topk(
                    spark, sf_dir, query_vec_id=q, nprobe=nprobe
                ).collect()
            ]
            want = exact_topk(S, ids, id_pos[q], TOP_K)
            recalls.append(len(set(got) & set(want)) / TOP_K)
            probed = [c for rk, c in sorted(probe_cells[q]) if rk <= nprobe]
            cand_counts.append(sum(member_size.get(c, 0) for c in probed) - 1)
        row = {
            "nprobe": nprobe,
            "recall_mean": round(float(np.mean(recalls)), 4),
            "candidates_mean": round(float(np.mean(cand_counts)), 1),
            "candidates_frac_of_corpus": round(float(np.mean(cand_counts)) / (n - 1), 4),
        }
        sweep.append(row)
        print("nprobe sweep", row)
    release_caches()
    return sweep


def exact_l2_topk(V: np.ndarray, ids: np.ndarray, qi: int, k: int) -> list[int]:
    """Exact float64 squared-L2 top-k (dist asc, vec_id asc), excluding
    the query — the ground truth for the L2-metric PQ operators."""
    d = ((V - V[qi]) ** 2).sum(axis=1)
    order = sorted((i for i in range(len(ids)) if i != qi), key=lambda i: (d[i], ids[i]))
    return [int(ids[i]) for i in order[:k]]


def eval_pq_ops(spark, sf_dir, ids, V, sample, release_caches) -> dict:
    """PQ quantization-quality evidence vs exact float64 L2 brute force.

    ann_pq_topk scans ALL codes (no candidate pruning), so its recall
    isolates pure quantization error — the accuracy cost of compressing
    dim float32s to PQ_M byte codes. ann_ivfadc_topk composes IVF cell
    pruning on top; its sweep shows the nprobe knob buying recall back
    with candidate volume, converging to the PQ ceiling."""
    from astrospark.ops import similarity as sim
    from astrospark.ops.similarity import PQ_K, PQ_M, PQ_ORACLE_K, PQ_ORACLE_M, TOP_K

    id_pos = {int(v): i for i, v in enumerate(ids)}
    n = len(ids)
    out: dict = {}

    def adc_recall(m, k, label):
        recalls, secs = [], []
        for q in sample:
            t0 = time.time()
            got = [
                int(r["vec_id"])
                for r in sim.ann_pq_topk(
                    spark, sf_dir, query_vec_id=q, m=m, k=k
                ).collect()
            ]
            secs.append(time.time() - t0)
            want = exact_l2_topk(V, ids, id_pos[q], TOP_K)
            recalls.append(len(set(got) & set(want)) / TOP_K)
        row = {
            "k": TOP_K,
            "n_queries": len(sample),
            "metric": "L2",
            "pq_m": m,
            "pq_k": k,
            "recall_mean": round(float(np.mean(recalls)), 4),
            "recall_min": round(float(np.min(recalls)), 4),
            "candidates_frac_of_corpus": 1.0,
            "bytes_per_vector_vs_raw": f"{m} codes (<= {k} values) vs {V.shape[1]} floats",
            "probe_sec_mean": round(float(np.mean(secs)), 3),
        }
        release_caches()  # codebooks/codes are per-(m,k); don't mix caches
        print(label, row)
        return row

    # library default = production codebook (VERDICT r3 #3); the tiny
    # oracle pin is measured alongside for the honest contrast
    out["ann_pq_topk"] = adc_recall(PQ_M, PQ_K, "ann_pq_topk")
    out["ann_pq_topk_oracle_pin"] = adc_recall(
        PQ_ORACLE_M, PQ_ORACLE_K, "ann_pq_topk_oracle_pin"
    )

    cells = sim.kmeans_cells(spark, sf_dir).collect()
    member_size: dict = {}
    probe_cells: dict[int, list] = {}
    for r in cells:
        if r["rnk"] == 1:
            member_size[r["cell"]] = member_size.get(r["cell"], 0) + 1
        probe_cells.setdefault(int(r["vec_id"]), []).append((r["rnk"], r["cell"]))
    sweep = []
    for nprobe in (1, 2, 4):
        recalls, cand_counts = [], []
        for q in sample:
            got = [
                int(r["vec_id"])
                for r in sim.ann_ivfadc_topk(
                    spark, sf_dir, query_vec_id=q, nprobe=nprobe
                ).collect()
            ]
            want = exact_l2_topk(V, ids, id_pos[q], TOP_K)
            recalls.append(len(set(got) & set(want)) / TOP_K)
            probed = [c for rk, c in sorted(probe_cells[q]) if rk <= nprobe]
            cand_counts.append(sum(member_size.get(c, 0) for c in probed) - 1)
        row = {
            "nprobe": nprobe,
            "recall_mean": round(float(np.mean(recalls)), 4),
            "candidates_mean": round(float(np.mean(cand_counts)), 1),
            "candidates_frac_of_corpus": round(float(np.mean(cand_counts)) / (n - 1), 4),
        }
        sweep.append(row)
        print("ivfadc sweep", row)
    out["ivfadc_nprobe_sweep"] = sweep
    release_caches()
    return out


def eval_knn(spark, sf_dir, ids, S, release_caches) -> dict:
    from astrospark.ops import similarity as sim
    from astrospark.ops.similarity import KNN_K

    id_pos = {int(v): i for i, v in enumerate(ids)}
    n = len(ids)
    t0 = time.time()
    knn_rows = sim.knn_join(spark, sf_dir).collect()  # library default (bounded)
    knn_sec = time.time() - t0
    release_caches()
    got_nn: dict[int, list[int]] = {}
    for r in knn_rows:
        got_nn.setdefault(int(r["vec_id"]), []).append(int(r["neighbor_id"]))
    recalls = []
    for v in sorted(id_pos):
        want = set(exact_topk(S, ids, id_pos[v], KNN_K))
        recalls.append(len(set(got_nn.get(v, [])) & want) / KNN_K)
    return {
        "k": KNN_K,
        "n_queries": n,
        "recall_mean": round(float(np.mean(recalls)), 4),
        "vectors_with_full_k": int(sum(len(got_nn.get(v, [])) >= KNN_K for v in sorted(id_pos))),
        "candidate_pairs": len({(r["vec_id"], r["neighbor_id"]) for r in knn_rows}),
        "exact_pairs_would_be": n * (n - 1),
        "wall_sec": round(knn_sec, 3),
    }


def eval_planted(spark, release_caches) -> dict:
    """The target regime: recall on planted near-dup clusters."""
    from astrospark.ops import similarity as sim
    from astrospark.ops.similarity import NEARDUP_COS

    pdir = ensure_planted_corpus()
    ids, V, S = load_embeddings(pdir)
    id_pos = {int(v): i for i, v in enumerate(ids)}
    n = len(ids)

    # ground truth near-dup pairs (exact cosine >= threshold), with their
    # similarity for binned recall — cos >= 0.9 is the semantic-dedup bin
    iu = np.triu_indices(n, 1)
    sims = np.round(S[iu], 4)
    mask = sims >= NEARDUP_COS
    pair_cos = {}
    for a, b, c in zip(iu[0][mask], iu[1][mask], sims[mask]):
        key = (int(ids[a]), int(ids[b])) if ids[a] < ids[b] else (int(ids[b]), int(ids[a]))
        pair_cos[key] = float(c)
    true_pairs = set(pair_cos)
    bins = {
        "cos>=0.9": {p for p, c in pair_cos.items() if c >= 0.9},
        "0.6<=cos<0.9": {p for p, c in pair_cos.items() if 0.6 <= c < 0.9},
        f"{NEARDUP_COS}<=cos<0.6": {p for p, c in pair_cos.items() if c < 0.6},
    }
    # planted cluster pairs: parents 0..99, copies 800+j & 900+j of parent j%100
    planted = set()
    for j in range(100):
        trio = sorted([j, 800 + j, 900 + j])
        planted.update([(trio[0], trio[1]), (trio[0], trio[2]), (trio[1], trio[2])])

    # the probe_depths knob, measured: full-band default vs +8-bit prefix
    by_depth = {}
    for depths in ((sim.RP_BITS,), (sim.RP_BITS, 8)):
        rows = sim.emb_neardup_banded(spark, pdir, probe_depths=depths).collect()
        found_d = {
            (int(r["vec_a"]), int(r["vec_b"])) for r in rows if r["is_neardup"] == 1
        }
        release_caches()
        by_depth[str(tuple(depths))] = {
            "candidate_pairs": len(rows),
            "pair_recall": round(len(found_d & true_pairs) / len(true_pairs), 4),
            "planted_pair_recall": round(len(found_d & planted) / len(planted), 4),
            "recall_by_bin": {
                name: round(len(found_d & members) / len(members), 4) if members else None
                for name, members in bins.items()
            },
        }
        if tuple(depths) == (sim.RP_BITS,):
            found = found_d
            found_rows_n = len(rows)

    knn = eval_knn(spark, pdir, ids, S, release_caches)
    # NN-recall@1 over the copy vectors: did knn_join surface the true
    # nearest neighbor (the parent / sibling copy)?
    knn_rows = sim.knn_join(spark, pdir).collect()
    release_caches()
    got_nn: dict[int, set] = {}
    for r in knn_rows:
        got_nn.setdefault(int(r["vec_id"]), set()).add(int(r["neighbor_id"]))
    nn1_hits = []
    for v in range(800, 1000):
        want1 = exact_topk(S, ids, id_pos[v], 1)[0]
        nn1_hits.append(want1 in got_nn.get(v, set()))

    return {
        "n_vectors": n,
        "planted_clusters": 100,
        "true_neardup_pairs": len(true_pairs),
        "bin_sizes": {name: len(members) for name, members in bins.items()},
        "planted_pairs": len(planted),
        "neardup_found_pairs": len(found & true_pairs),
        "neardup_pair_recall": round(len(found & true_pairs) / len(true_pairs), 4),
        "planted_pair_recall": round(len(found & planted) / len(planted), 4),
        # precision of emitted is_neardup=1 pairs is 1.0 by construction
        # (exact-cosine verify, same round-4 rule as the ground truth);
        # this is the filter-verification yield instead:
        "verified_frac_of_candidates": round(len(found) / max(found_rows_n, 1), 4),
        "neardup_by_probe_depths": by_depth,
        "knn_nn1_recall_on_copies": round(float(np.mean(nn1_hits)), 4),
        "knn_overall": knn,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 24

    ids, V, S = load_embeddings(sf_dir)
    sample = sample_queries(ids, n_queries)

    from astrospark.engine.session import build_session
    from astrospark.ops import similarity as sim
    from astrospark.ops.caching import release_caches

    spark = build_session(app_name="ann-recall", master="local[8]", shuffle_partitions=8)

    results = eval_topk_ops(spark, sf_dir, ids, S, sample, release_caches)
    sweep = eval_depth_sweep(spark, sf_dir, ids, S, sample[: max(len(sample) // 2, 6)], release_caches)
    nprobe_sweep = eval_nprobe_sweep(
        spark, sf_dir, ids, S, sample[: max(len(sample) // 2, 6)], release_caches
    )
    results["knn_join"] = eval_knn(spark, sf_dir, ids, S, release_caches)
    print("knn_join", results["knn_join"])
    pq = eval_pq_ops(
        spark, sf_dir, ids, V, sample[: max(len(sample) // 2, 6)], release_caches
    )
    planted = eval_planted(spark, release_caches)
    print("planted", planted)

    out = {
        "sf_dir": sf_dir,
        "n_vectors": len(ids),
        "dim": V.shape[1],
        "knobs": {
            "RP_BANDS": sim.RP_BANDS,
            "RP_BITS": sim.RP_BITS,
            "RP_PROBE_DEPTHS": list(sim.RP_PROBE_DEPTHS),
            "N_CENTROIDS": sim.N_CENTROIDS,
            "KM_ITERS": sim.KM_ITERS,
            "SIGN_DIMS": sim.SIGN_DIMS,
            "max_bucket_default": sim.RP_MAX_BUCKET,
            "NEARDUP_COS": sim.NEARDUP_COS,
        },
        "operators": results,
        "rp_probe_depth_sweep": sweep,
        "ivf_nprobe_sweep": nprobe_sweep,
        "pq": pq,
        "planted_neardup_regime": planted,
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "RECALL.json"), "w") as fh:
        json.dump(out, fh, indent=2)
    write_recall_md(out)
    print(json.dumps({k: v["recall_mean"] for k, v in results.items()}))
    spark.stop()


def write_recall_md(out: dict) -> None:
    ops = out["operators"]
    pl = out["planted_neardup_regime"]
    lines = [
        "# BENCH/RECALL — ANN retrieval quality vs exact baseline",
        "",
        f"Corpus: `{out['sf_dir']}` — {out['n_vectors']} vectors × dim {out['dim']}. "
        "Ground truth: independent numpy float64 brute-force cosine (same round-4 /"
        " vec_id-asc tie rule as the operators). Approximate side: the shipped Spark"
        " operators at their default knobs. Reproduce: `python scripts/ann_recall.py`.",
        "",
        "## 1. Top-k recall at shipped knobs (iid-random corpus — LSH worst case)",
        "",
        "| operator | k | queries | recall@k (mean) | candidates/query | % of corpus | scan reduction |",
        "|---|---|---|---|---|---|---|",
    ]
    for name in TOPK_OPS:
        r = ops[name]
        lines.append(
            f"| {name} | {r['k']} | {r['n_queries']} | {r['recall_mean']} "
            f"| {r['candidates_mean']} | {round(r['candidates_frac_of_corpus'] * 100, 1)}% "
            f"| {r['scan_reduction_x']}× |"
        )
    k = ops["knn_join"]
    lines += [
        "",
        f"**knn_join** (whole-table approximate {k['k']}-NN): recall@{k['k']} mean "
        f"{k['recall_mean']} over {k['n_queries']} vectors; {k['candidate_pairs']} scored "
        f"pairs vs {k['exact_pairs_would_be']} exact "
        f"(×{round(k['exact_pairs_would_be'] / max(k['candidate_pairs'], 1), 1)} reduction).",
        "",
        "This corpus is iid standard normal: every neighbor sits near 90° (cos ≈ "
        "0.3-0.4), the provably hardest regime for hyperplane LSH (per-bit collision "
        "1 − θ/π ≈ 0.6 → per-16-bit-band ≈ 4·10⁻⁴). Read these rows as the floor; "
        "§3 measures the regime the operators are deployed for.",
        "",
        "## 2. The recall knob, measured: ann_rp_topk probe-depth sweep",
        "",
        "| probe_depths | recall@10 (mean) | candidates/query | % of corpus |",
        "|---|---|---|---|",
    ]
    for row in out["rp_probe_depth_sweep"]:
        lines.append(
            f"| {tuple(row['probe_depths'])} | {row['recall_mean']} | {row['candidates_mean']} "
            f"| {round(row['candidates_frac_of_corpus'] * 100, 1)}% |"
        )
    lines += [
        "",
        "Monotone tradeoff, as designed: each appended shorter prefix probes "
        "coarser LSH-forest buckets — recall and candidate volume rise together; "
        "a deployment picks the depth schedule that hits its recall target and "
        "pays exactly that candidate volume. (16, 8) is the shipped default.",
        "",
        "### ann_ivf_kmeans_topk nprobe sweep (FAISS-style multi-cell probing)",
        "",
        "| nprobe | recall@10 (mean) | candidates/query | % of corpus |",
        "|---|---|---|---|",
    ]
    for row in out.get("ivf_nprobe_sweep", []):
        lines.append(
            f"| {row['nprobe']} | {row['recall_mean']} | {row['candidates_mean']} "
            f"| {round(row['candidates_frac_of_corpus'] * 100, 1)}% |"
        )
    lines += [
        "",
        "Same tradeoff on the IVF side: nprobe nearest cells are searched per "
        "query (one cached rank≤4 assignment serves membership AND probe lists, "
        "so raising nprobe costs no extra index pass). nprobe=1 is the "
        "oracle-contract default.",
        "",
    ]
    pq = out.get("pq")
    if pq:
        p = pq["ann_pq_topk"]
        pin = pq.get("ann_pq_topk_oracle_pin")
        lines += [
            "### Product quantization (L2 metric, exact float64 L2 ground truth)",
            "",
            f"**ann_pq_topk** (full-corpus ADC scan — recall loss is pure "
            f"quantization error) at the LIBRARY DEFAULT production codebook "
            f"(PQ_M={p['pq_m']} × K={p['pq_k']}): recall@{p['k']} mean "
            f"**{p['recall_mean']}** (min {p['recall_min']}) over "
            f"{p['n_queries']} queries; index is {p['bytes_per_vector_vs_raw']} "
            "per vector.",
            "",
        ]
        if pin:
            lines += [
                f"The CONTRACT-ONLY oracle pin (PQ_M={pin['pq_m']} × "
                f"K={pin['pq_k']} — the tiny codebook the DuckDB unrolled-CTE "
                f"replay stays tractable at) measures recall@{pin['k']} mean "
                f"{pin['recall_mean']}: it exists to value-check the plan "
                "machinery, not to retrieve. Same defaults-vs-pin split as "
                "max_bucket (VERDICT r3 #3).",
                "",
            ]
        lines += [
            "| ann_ivfadc_topk nprobe | recall@10 (mean) | candidates/query | % of corpus |",
            "|---|---|---|---|",
        ]
        for row in pq["ivfadc_nprobe_sweep"]:
            lines.append(
                f"| {row['nprobe']} | {row['recall_mean']} | {row['candidates_mean']} "
                f"| {round(row['candidates_frac_of_corpus'] * 100, 1)}% |"
            )
        lines += [
            "",
            "IVFADC composes cell pruning with ADC scoring while touching only "
            "the probed cells' code rows — the memory-and-scan-feasible layout "
            "for 10^12-vector search (production reranks the ADC top-R "
            "exactly). Note IVFADC can EXCEED the full-scan ADC row: cell "
            "residency carries locality the codes alone can't express, "
            "so restricting candidates to near cells filters out ADC's "
            "quantization-error impostors.",
            "",
        ]
    lines += [
        "## 3. Target regime: planted near-duplicate clusters",
        "",
        f"{pl['n_vectors']} vectors = 800 iid base + {pl['planted_clusters']} planted clusters "
        "(parent + copies at cos ≈ 0.95 and ≈ 0.84) — the semantic-dedup case. "
        f"Ground truth: {pl['true_neardup_pairs']} pairs ≥ NEARDUP_COS="
        f"{out['knobs']['NEARDUP_COS']} (of which {pl['planted_pairs']} planted).",
        "",
        "",
        "| emb_neardup_banded probe_depths | candidate pairs | pair recall | recall cos≥0.9 | recall 0.6-0.9 | recall <0.6 | planted-pair recall |",
        "|---|---|---|---|---|---|---|",
    ]
    for depths, d in pl["neardup_by_probe_depths"].items():
        rb = d["recall_by_bin"]
        bin_vals = list(rb.values())
        lines.append(
            f"| {depths} | {d['candidate_pairs']} | {d['pair_recall']} "
            f"| {bin_vals[0]} | {bin_vals[1]} | {bin_vals[2]} | {d['planted_pair_recall']} |"
        )
    lines += [
        "",
        f"(bin sizes: {pl['bin_sizes']}; emitted-pair precision is 1.0 by "
        "construction — exact-cosine verify — so the tradeoff is recall vs "
        "candidate volume only.)",
        "",
        f"- **knn_join**: nearest-neighbor recall@1 on the 200 copy vectors "
        f"**{pl['knn_nn1_recall_on_copies']}** (does the join surface each copy's "
        f"parent/sibling); overall recall@{pl['knn_overall']['k']} "
        f"{pl['knn_overall']['recall_mean']} across all {pl['knn_overall']['n_queries']} vectors.",
        "",
        "The mass of the sub-0.6 ground-truth bins is borderline-random pairs "
        "(iid vectors whose cosine happens to clear the synthetic 0.35 "
        "threshold) — banding is not built to find those, and at a real "
        "dedup threshold (≥ 0.9) the (16, 8) setting is the operative row. "
        "(16, 8) is the SHIPPED library default as of r4 (VERDICT r3 #4); "
        "the single full-depth pass (16,) is the contract-only oracle pin.",
        "",
    ]
    with open(os.path.join(REPO, "BENCH", "RECALL.md"), "w") as fh:
        fh.write("\n".join(lines))


if __name__ == "__main__":
    main()
