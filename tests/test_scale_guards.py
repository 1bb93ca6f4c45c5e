"""Guards for the web-scale failure modes flagged in VERDICT r1:

- dedup_minhash_lsh must BOUND oversized LSH buckets by default (one
  boilerplate bucket of k near-identical docs otherwise emits k²/2 pairs);
- the embedding LSH default must key on a high-cardinality bucket space
  (the 16-bucket sign_bucket family is the oracle-contract setting only);
- the RP probe/pair plans must stay equi-join shaped (no cross products).
"""

import io
from contextlib import redirect_stdout

import pytest

SF_DIR = "/root/testdata/sf0.001"


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


@pytest.fixture(scope="module")
def patho_dir(spark, tmp_path_factory):
    """5,000 near-identical docs — every minhash band bucket holds all of
    them (the web-scale boilerplate-cluster pathology)."""
    d = tmp_path_factory.mktemp("patho")
    text = "the same boilerplate navigation footer text block repeated verbatim"
    rows = [(f"doc{i:05d}", text) for i in range(5000)]
    spark.createDataFrame(rows, "doc_id string, text string").coalesce(2).write.mode(
        "overwrite"
    ).parquet(str(d / "documents.parquet"))
    return str(d)


def test_minhash_default_is_bounded(spark, patho_dir):
    """Default max_bucket routes the 5k-identical cluster out of the
    pairwise path: output stays under budget instead of 12.5M pairs."""
    from astrospark.ops.dedup import MAX_BUCKET_DEFAULT, dedup_minhash_lsh

    assert MAX_BUCKET_DEFAULT is not None and MAX_BUCKET_DEFAULT <= 1000
    n_pairs = dedup_minhash_lsh(spark, patho_dir).count()
    assert n_pairs <= MAX_BUCKET_DEFAULT**2 / 2
    assert n_pairs == 0  # identical docs → one bucket per band, all oversized


def test_minhash_dropped_bucket_accounting(spark, patho_dir):
    """What the bound routes out is visible, not silently lost."""
    from astrospark.ops.dedup import MINHASH_SEEDS, BAND_SIZE, minhash_lsh_with_stats

    _pairs, dropped = minhash_lsh_with_stats(spark, patho_dir)
    rows = dropped.collect()
    assert len(rows) == MINHASH_SEEDS // BAND_SIZE  # one bucket per band
    assert all(r.sz == 5000 for r in rows)


def test_rp_bucket_space_not_o1(spark):
    """The RP-LSH default band key must spread vectors across a large key
    space (2^16 per band), unlike the 16-bucket sign_bucket setting where
    a bucket holds ~N/16 members."""
    from pyspark.sql import functions as F

    from astrospark.ops.similarity import RP_BANDS, RP_BITS, _band_keys, _rp_sig_df, sign_bucket

    assert RP_BITS >= 16  # bucket count per band >= 65,536
    bands = _band_keys(_rp_sig_df(spark, SF_DIR), depths=(RP_BITS,))
    per_bucket = bands.groupBy("band", "bk").count()
    stats = per_bucket.agg(
        F.max("count").alias("mx"), F.count("*").alias("n_buckets")
    ).first()
    n = bands.count() // RP_BANDS
    # the old sign_bucket puts ~n/16 vectors in a bucket; RP keys must not
    assert stats.mx <= max(4, n // 100), f"oversized RP bucket: {stats.mx}"
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    old_mx = (
        e.select(sign_bucket(F.col("embedding")).alias("b")).groupBy("b").count()
        .agg(F.max("count")).first()[0]
    )
    assert old_mx > stats.mx  # the guard is meaningful on this data


def test_rp_plans_no_cross_product(spark):
    """Candidate generation in both RP queries is equi-join/posting-list
    shaped; the only BroadcastNestedLoopJoin allowed is the 1-row query
    vector broadcast in the rerank stage of ann_rp_topk."""
    from astrospark.ops.similarity import ann_rp_topk, emb_neardup_banded

    plan = plan_of(emb_neardup_banded(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    plan = plan_of(ann_rp_topk(spark, SF_DIR), mode="simple")
    assert "CartesianProduct" not in plan
    # probe join on (band, depth, bk) must be a broadcast hash join of the
    # tiny query-key side — never a shuffle of the corpus
    assert "BroadcastHashJoin" in plan
    # one legitimate BNLJ: the 1-row q_emb rerank broadcast (simple mode
    # prints each tree node once, unlike formatted's detail blocks)
    assert plan.count("BroadcastNestedLoopJoin") <= 1


def test_knn_and_simhash_pair_plans(spark):
    """kNN self-join and banded-SimHash pairs: candidate generation is
    equi-join / posting-list shaped — no cross product anywhere, and both
    carry the bounded-bucket guard."""
    import inspect

    from astrospark.ops.dedup import dedup_simhash_pairs
    from astrospark.ops.similarity import knn_join

    for fn in (knn_join, dedup_simhash_pairs):
        assert inspect.signature(fn).parameters["max_bucket"].default == 1000
        plan = plan_of(fn(spark, SF_DIR), mode="simple")
        assert "CartesianProduct" not in plan, fn.__name__
        assert "BroadcastNestedLoopJoin" not in plan, fn.__name__


def test_kmeans_centroids_train_and_stay_deterministic(spark):
    """Lloyd refinement actually moves the seed centroids, keeps exactly
    N_CENTROIDS of them (empty cells inherit), and is reproducible
    run-to-run (the cross-engine-deterministic arithmetic contract)."""
    from astrospark.ops.similarity import N_CENTROIDS, kmeans_centroids, quantize
    from pyspark.sql import functions as F

    cents = {r.cid: list(r.qc) for r in kmeans_centroids(spark, SF_DIR).collect()}
    assert len(cents) == N_CENTROIDS
    e = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .withColumn("qv", quantize(F.col("embedding").cast("array<double>")))
    )
    seeds = {r.vec_id: list(r.qv) for r in e.filter(F.col("vec_id").between(1, N_CENTROIDS)).collect()}
    moved = sum(cents[cid] != seeds[cid] for cid in cents)
    assert moved >= N_CENTROIDS // 2  # training refined most centroids
    again = {r.cid: list(r.qc) for r in kmeans_centroids(spark, SF_DIR).collect()}
    assert again == cents


def test_rp_signature_matches_numpy_oracle(spark):
    """Spark-side signatures equal an independent numpy recomputation
    (exact integer arithmetic ⇒ no accumulation-order drift)."""
    import hashlib

    import numpy as np
    import pyarrow.parquet as pq

    from astrospark.ops.similarity import QUANT_SCALE, RP_BANDS, RP_BITS, _rp_sig_df

    got = {r.vec_id: r.sig for r in _rp_sig_df(spark, SF_DIR).collect()}
    t = pq.read_table(f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"])
    V = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    ids = t["vec_id"].to_pylist()
    q = np.floor(V * QUANT_SCALE)
    H = np.array(
        [
            [hashlib.md5(f"rp:{b}:{i}".encode()).digest()[0] - 128 for i in range(V.shape[1])]
            for b in range(RP_BANDS * RP_BITS)
        ],
        dtype=np.float64,
    )
    S = (q @ H.T) >= 0
    for row, vid in zip(S, ids):
        assert got[vid] == "".join("1" if b else "0" for b in row), vid


def test_ivf_nprobe_widens_candidates_not_results_at_1(spark):
    """The nprobe knob probes the query's nprobe nearest cells: the
    probed-cell candidate pool grows monotonically with nprobe, nprobe=1
    reproduces the oracle-contract result, and results stay a superset-
    stable top-k (every nprobe=1 hit with a strictly-better score than
    the nprobe=4 cutoff survives at nprobe=4)."""
    from astrospark.ops import similarity as sim
    from pyspark.sql import functions as F

    cells = sim.kmeans_cells(spark, SF_DIR)
    member = {r.vec_id: r.cell for r in cells.filter("rnk = 1").collect()}
    size = {}
    for c in member.values():
        size[c] = size.get(c, 0) + 1
    probes = {
        rk: r.cell
        for r in cells.filter(F.col("vec_id") == 7).collect()
        for rk in [r.rnk]
    }
    assert sorted(probes) == [1, 2, 3, 4]
    assert len(set(probes.values())) == 4  # 4 distinct cells ranked
    pools = [sum(size.get(probes[rk], 0) for rk in range(1, np_ + 1)) for np_ in (1, 2, 4)]
    assert pools[0] < pools[1] < pools[2]

    r1 = [(r.vec_id, r.cos_sim) for r in sim.ann_ivf_kmeans_topk(spark, SF_DIR, 7, nprobe=1).collect()]
    r4 = [(r.vec_id, r.cos_sim) for r in sim.ann_ivf_kmeans_topk(spark, SF_DIR, 7, nprobe=4).collect()]
    assert len(r1) == len(r4) == sim.TOP_K
    cutoff4 = min(s for _, s in r4)
    assert all((v, s) in r4 for v, s in r1 if s > cutoff4)
    assert min(s for _, s in r4) >= min(s for _, s in r1)  # wider pool can't worsen top-k


def test_cc_labels_pointer_doubling_on_long_path(spark):
    """Adversarial CC graph the LSH pair stream never produces: one
    40-node path (diameter 39 — plain neighbor propagation would need 39
    rounds; pointer doubling must land it within the CC_MAX_ROUNDS=16
    budget), one triangle, one isolated edge. Oracle: union-find."""
    from astrospark.ops.dedup import CC_MAX_ROUNDS, cc_labels

    path = [(i, i + 1) for i in range(100, 139)]
    tri = [(7, 9), (9, 11), (7, 11)]
    iso = [(500, 42)]
    pairs = spark.createDataFrame(path + tri + iso, ["doc_a", "doc_b"])

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in path + tri + iso:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in parent}

    got = {r.node: r.lbl for r in cc_labels(pairs, max_rounds=CC_MAX_ROUNDS).collect()}
    assert got == want
    assert got[138] == 100 and got[11] == 7 and got[500] == 42


def test_dedup_cc_clusters_transitive_and_canonical(spark):
    """End-to-end on the testdata corpus: cluster ids are the component
    min (canonical iff doc_id == cluster_id), every minhash edge at the
    threshold lands both endpoints in one cluster, and cluster count =
    docs - (non-canonical dups)."""
    from astrospark.ops.dedup import CC_EDGE_JACCARD, dedup_cc_clusters, dedup_minhash_lsh
    from pyspark.sql import functions as F

    rows = dedup_cc_clusters(spark, SF_DIR, max_bucket=None).collect()
    cl = {r.doc_id: r.cluster_id for r in rows}
    assert len(rows) == 500  # every document is assigned
    for r in rows:
        assert r.cluster_id <= r.doc_id
        assert r.is_canonical == int(r.doc_id == r.cluster_id)
    edges = (
        dedup_minhash_lsh(spark, SF_DIR, max_bucket=None)
        .filter(F.col("est_jaccard") >= CC_EDGE_JACCARD)
        .collect()
    )
    assert edges  # the corpus does contain near-dups
    for e in edges:
        assert cl[e.doc_a] == cl[e.doc_b]


def test_dedup_keep_best_longest_wins(spark):
    """Exactly one keep_best per cluster; the winner carries the cluster
    max n_chars (ties broken by min doc_id); singleton clusters keep
    their only member under BOTH policies."""
    from collections import defaultdict

    from astrospark.ops.dedup import dedup_keep_best

    rows = dedup_keep_best(spark, SF_DIR, max_bucket=None).collect()
    assert len(rows) == 500
    by_cluster = defaultdict(list)
    for r in rows:
        by_cluster[r.cluster_id].append(r)
    for cid, members in by_cluster.items():
        winners = [r for r in members if r.keep_best == 1]
        assert len(winners) == 1, cid
        best = min(members, key=lambda r: (-r.n_chars, r.doc_id))
        assert winners[0].doc_id == best.doc_id, cid
        if len(members) == 1:
            assert members[0].is_canonical == 1 and members[0].keep_best == 1
    # the two policies genuinely differ on this corpus (some cluster's
    # longest member is not its min-id member) — guards against the
    # keep_best column degenerating into a copy of is_canonical
    assert any(r.keep_best != r.is_canonical for r in rows)


def test_semantic_dedup_matches_numpy_rule(spark):
    """The fixed-order SemDeDup keep rule recomputed independently in
    numpy float64 (cells taken from the already-verified kmeans_cells):
    dropped iff some lower-vec_id cell-mate sits at round(cos, 4) ≥ tau."""
    import numpy as np
    import pyarrow.parquet as pq

    from astrospark.ops import similarity as sim

    got = {
        r.vec_id: (r.cell, r.is_kept)
        for r in sim.semantic_dedup(spark, SF_DIR, max_cell=None).collect()
    }
    member = {
        r.vec_id: r.cell
        for r in sim.kmeans_cells(spark, SF_DIR).filter("rnk = 1").collect()
    }
    t = pq.read_table(f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"])
    V = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    ids = t["vec_id"].to_pylist()
    vec = dict(zip(ids, V))
    assert set(got) == set(ids)
    n_dropped = 0
    for vid in ids:
        cellmates = [u for u in ids if member[u] == member[vid] and u < vid]
        dropped = any(
            np.round(
                float(vec[u] @ vec[vid])
                / (np.linalg.norm(vec[u]) * np.linalg.norm(vec[vid])),
                4,
            )
            >= sim.NEARDUP_COS
            for u in cellmates
        )
        assert got[vid] == (member[vid], 0 if dropped else 1), vid
        n_dropped += dropped
    assert n_dropped > 0  # the corpus actually exercises the drop path


def test_semantic_dedup_bounded_cells_conservatively_keep(spark):
    """max_cell routes oversized cells out of the pairwise: at max_cell=1
    every multi-member cell is skipped and the whole corpus is kept; at
    the shipped default (no cell near the bound at this sf) the result
    equals the exhaustive max_cell=None run."""
    from astrospark.ops import similarity as sim

    all_kept = sim.semantic_dedup(spark, SF_DIR, max_cell=1)
    assert all_kept.filter("is_kept = 0").count() == 0

    def as_set(df):
        return {(r.vec_id, r.cell, r.is_kept) for r in df.collect()}

    assert as_set(sim.semantic_dedup(spark, SF_DIR)) == as_set(
        sim.semantic_dedup(spark, SF_DIR, max_cell=None)
    )


def test_cc_labels_reliable_checkpoint_matches_local(spark, tmp_path):
    """VERDICT r3 #6: with a checkpoint dir configured, cc_labels writes
    per-round state via reliable DataFrame.checkpoint() — files on
    shared storage that survive executor loss (localCheckpoint blocks do
    not; that path restarts the job instead). Both lineage-truncation
    modes must land the identical fixpoint, and the reliable run must
    actually write round files into the dir."""
    import os

    from astrospark.ops.dedup import cc_labels

    path = [(i, i + 1) for i in range(100, 130)]
    tri = [(7, 9), (9, 11), (7, 11)]
    pairs = spark.createDataFrame(path + tri, ["doc_a", "doc_b"])

    local = {r.node: r.lbl for r in cc_labels(pairs, reliable=False).collect()}

    sc = spark.sparkContext
    ckdir = str(tmp_path / "cc_ckpt")
    sc.setCheckpointDir(ckdir)
    try:
        # reliable=None auto-selects the reliable path once a dir is set
        rel = {r.node: r.lbl for r in cc_labels(pairs, reliable=None).collect()}
        assert rel == local
        written = [
            os.path.join(root, f)
            for root, _, files in os.walk(ckdir)
            for f in files
            if f.startswith("part-")
        ]
        assert written, "reliable checkpoint wrote no round files"
    finally:
        # unset so later tests in this session fall back to local mode
        setter = getattr(sc._jsc.sc(), "checkpointDir_$eq")
        setter(sc._jvm.scala.Option.apply(None))


def test_cc_labels_releases_superseded_round_blocks(spark):
    """ADVICE r3: superseded rounds' localCheckpoint blocks are
    unpersisted deterministically during iteration, and the final
    round's blocks are freed by ops.caching.release_caches() — no
    reliance on nondeterministic GC/ContextCleaner reclamation."""
    from astrospark.ops.caching import release_caches
    from astrospark.ops.dedup import cc_labels

    def live_rdd_ids():
        sc = spark.sparkContext
        return set(sc._jsc.getPersistentRDDs().keySet().toArray())

    release_caches()
    before = live_rdd_ids()
    # diameter-31 path → multiple pointer-doubling rounds, each with its
    # own localCheckpoint blocks
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(200, 231)], ["doc_a", "doc_b"]
    )
    labels = cc_labels(pairs, reliable=False)
    labels.count()
    during = live_rdd_ids() - before
    # superseded rounds already freed: at most the edges cache + the
    # final round's blocks remain (not one entry per round)
    assert len(during) <= 3, f"superseded round blocks leaked: {during}"
    release_caches()
    after = live_rdd_ids() - before
    assert not after, f"release_caches left blocks live: {after}"


def test_sketches_bounded_under_pathological_skew(spark, tmp_path):
    """One source owning the whole corpus + one word owning most mass:
    the sketch state stays <=256 CM cells / <=k bottom-k rows per source
    (never keyed by word or doc count), and the bottom-k plan still
    pre-limits per partition below the single exchange."""
    import io as _io
    from contextlib import redirect_stdout

    import pandas as pd

    from astrospark.ops.text import (
        BOTTOMK_K,
        CM_D,
        CM_W,
        bottomk_sample,
        heavy_hitters_cmsketch,
        _cm_bucket,  # noqa: F401  (bucket arithmetic under test via the op)
    )
    from pyspark.sql import functions as F

    docs = pd.DataFrame(
        {
            "doc_id": range(4000),
            "text": ["spark " * 50 + f"tail{i % 11}" for i in range(4000)],
            "lang": ["en"] * 4000,
            "source": ["monolith"] * 4000,  # ALL docs in one stratum
            "n_chars": [0] * 4000,
        }
    )
    pdir = str(tmp_path / "skew")
    spark.createDataFrame(docs).repartition(8).write.parquet(
        f"{pdir}/documents.parquet"
    )

    hh = heavy_hitters_cmsketch(spark, pdir)
    rows = hh.collect()
    got = {r.word: (r.cm_est, r.true_cnt, r.overest) for r in rows}
    # the dominant word is estimated exactly-or-over, never under
    assert got["spark"][1] == 4000 * 50
    assert got["spark"][0] >= got["spark"][1]
    assert all(o >= 0 for _, _, o in got.values())

    bk = bottomk_sample(spark, pdir)
    out = bk.collect()
    assert len(out) == BOTTOMK_K  # one stratum -> exactly k rows
    assert [r.rk for r in sorted(out, key=lambda r: r.rk)] == list(
        range(1, BOTTOMK_K + 1)
    )
    buf = _io.StringIO()
    with redirect_stdout(buf):
        bk.explain(mode="formatted")
    plan = buf.getvalue()
    assert "WindowGroupLimit" in plan.split("Exchange", 1)[0]


def test_contrastive_negatives_scalar_replay(spark, tmp_path_factory):
    """Full scalar replay: hashlib gate, numpy cosine guard, md5-hex
    rank — and the near-copy of an anchor never ships as a negative."""
    import hashlib

    import numpy as np

    rng = np.random.default_rng(7)
    n, dim = 48, 8
    vecs = rng.normal(size=(n, dim)).astype("float32")
    vecs[10] = vecs[0] * 1.5  # exact-direction copy of anchor 0: cos = 1
    rows = [(int(i), [float(x) for x in vecs[i]], 0) for i in range(n)]
    d = tmp_path_factory.mktemp("negs")
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(str(d / "embeddings.parquet"))

    from astrospark.ops.similarity import (
        NEG_ANCHORS,
        NEG_K,
        NEG_MAX_COS,
        NEG_SAMPLE_HEX,
        contrastive_negatives,
    )

    got = contrastive_negatives(spark, str(d)).collect()

    expected = {}
    v64 = vecs.astype("float64")
    for a in range(NEG_ANCHORS):
        cands = []
        for v in range(n):
            if v == a:
                continue
            hk = hashlib.md5(f"{a}:{v}".encode()).hexdigest()
            if not hk.startswith(NEG_SAMPLE_HEX):
                continue
            cos = float(
                v64[v] @ v64[a] / (np.linalg.norm(v64[v]) * np.linalg.norm(v64[a]))
            )
            if round(cos, 4) < NEG_MAX_COS:
                cands.append((hk, v, cos))
        cands.sort()
        expected[a] = cands[:NEG_K]

    by_anchor = {}
    for r in got:
        by_anchor.setdefault(r.anchor_id, []).append(r)
    assert set(by_anchor) == {
        a for a in range(NEG_ANCHORS) if expected[a]
    }
    for a, rows_a in by_anchor.items():
        rows_a.sort(key=lambda r: r.rk)
        assert [(r.hk, r.vec_id) for r in rows_a] == [
            (hk, v) for hk, v, _ in expected[a]
        ]
        for r, (_, _, cos) in zip(rows_a, expected[a]):
            assert abs(r.cos_sim - round(cos, 4)) < 1e-6
        # the planted near-copy is excluded by the exact-cosine guard
        assert 10 not in [r.vec_id for r in rows_a] or a != 0


def test_embedding_dim_stats_numpy_replay(spark):
    """Quantized per-dimension sums replayed with numpy int64 exactly."""
    import numpy as np

    from astrospark.ops.similarity import QUANT_SCALE, embedding_dim_stats

    sf = "/root/testdata/sf0.001"
    rows = {r.dim: r for r in embedding_dim_stats(spark, sf).collect()}
    embs = np.array(
        [
            r.embedding
            for r in spark.read.parquet(f"{sf}/embeddings.parquet").collect()
        ],
        dtype="float64",
    )
    q = np.floor(embs * QUANT_SCALE).astype("int64")
    assert set(rows) == set(range(1, embs.shape[1] + 1))
    for d in range(embs.shape[1]):
        r = rows[d + 1]
        assert r.n_vecs == embs.shape[0]
        assert r.sum_q == int(q[:, d].sum())
        assert r.sumsq_q == int((q[:, d].astype(object) ** 2).sum())


def test_snapshot_diff_statuses(spark):
    """Every synthetic diff class appears and statuses are derived
    correctly from the doc_id residue rules."""
    from astrospark.ops.relational import snapshot_diff

    rows = {r.doc_id: r.status for r in snapshot_diff(spark, "/root/testdata/sf0.001").collect()}
    assert set(rows.values()) == {"added", "removed", "changed", "same"}
    for doc_id, status in rows.items():
        if doc_id % 19 == 7:
            assert status == "added", doc_id
        elif doc_id % 17 == 3:
            assert status == "removed", doc_id
        elif doc_id % 13 == 5:
            assert status == "changed", doc_id
        else:
            assert status == "same", doc_id


def test_semantic_decontaminate_numpy_replay(spark, tmp_path_factory):
    """Full scalar replay of the nearest-eval-vector sweep: quantized
    int64 dot/norms, rounded-score argmax with the lowest-eval_id
    tie-break, threshold flag — plus a planted exact eval copy that
    must flag contaminated at cos ~ 1."""
    import numpy as np

    from astrospark.ops.similarity import (
        DECON_COS,
        EVAL_STRIDE,
        QUANT_SCALE,
        semantic_decontaminate,
    )

    rng = np.random.default_rng(11)
    n, dim = 120, 8
    vecs = rng.normal(size=(n, dim)).astype("float32")
    vecs[51] = vecs[50]  # train 51 duplicates eval 50 exactly
    rows = [(int(i), [float(x) for x in vecs[i]]) for i in range(n)]
    d = tmp_path_factory.mktemp("decon")
    spark.createDataFrame(rows, "vec_id long, embedding array<float>").write.parquet(
        str(d / "embeddings.parquet")
    )

    got = {r.vec_id: r for r in semantic_decontaminate(spark, str(d)).collect()}

    q = np.floor(vecs.astype("float64") * QUANT_SCALE)
    evals = [i for i in range(n) if i % EVAL_STRIDE == 0]
    trains = [i for i in range(n) if i % EVAL_STRIDE != 0]
    assert set(got) == set(trains)
    for t in trains:
        best = None
        for e in evals:
            cos = round(
                float(q[t] @ q[e])
                / (np.sqrt(float(q[t] @ q[t])) * np.sqrt(float(q[e] @ q[e]))),
                4,
            )
            if best is None or cos > best[0] or (cos == best[0] and e < best[1]):
                best = (cos, e)
        r = got[t]
        assert r.nearest_eval_id == best[1], (t, r, best)
        assert abs(r.cos_sim - best[0]) < 1e-6
        assert r.contaminated == int(best[0] >= DECON_COS)
    assert got[51].nearest_eval_id == 50 and got[51].contaminated == 1
    assert got[51].cos_sim > 0.999
