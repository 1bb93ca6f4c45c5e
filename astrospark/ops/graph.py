"""Graph analytics over the co-mention graph (SURVEY §8 item 30).

Third iterative-algorithm family after connected components
(ops/dedup.py::dedup_cc_clusters) and Lloyd k-means
(ops/similarity.py::kmeans_centroids): weighted PageRank over the
dictionary co-occurrence graph — the "which entities matter" ranking a
reference consumer computes downstream of extraction (the astro
literature's object-importance graph), kept on the broadcast dictionary
so the DuckDB oracle replays it without a model.

All arithmetic is scaled integers (SCALE=10^6 mass units, damping 85/100
as exact multipliers, floor division per contribution), so the unrolled
per-iteration CTE replay is bit-identical — float PageRank sums would
drift between engines' reduction orders. The floor-div quantization
leaks <1 mass unit per edge per iteration (documented, deterministic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_ITERS = 6
PR_SCALE = 1_000_000  # initial mass per node
PR_TELEPORT = 150_000  # (1 - 0.85) * SCALE
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100


def _cooccur_edges(spark, sf_dir) -> DataFrame:
    """Symmetrized weighted edge list (src, dst, w, wdeg) from the
    dictionary co-occurrence pairs; wdeg is src's total edge weight."""
    from astrospark.ops.text import token_cooccurrence

    p = token_cooccurrence(spark, sf_dir).select(
        F.col("tok_a"), F.col("tok_b"), F.col("c_ab").alias("w")
    )
    edges = p.select(
        F.col("tok_a").alias("src"), F.col("tok_b").alias("dst"), "w"
    ).union(p.select(F.col("tok_b").alias("src"), F.col("tok_a").alias("dst"), "w"))
    wdeg = edges.groupBy("src").agg(F.sum("w").alias("wdeg"))
    # scoped_persist: the edge list rides in EVERY iteration's lineage —
    # without it the unrolled plan recomputes the corpus self-join per
    # iteration (measured 8.0s → sub-second at sf0.1). Same index-once
    # idiom as kmeans_cells; released via ops.caching.release_caches().
    from astrospark.ops.caching import scoped_persist

    return scoped_persist(edges.join(F.broadcast(wdeg), "src"))


def cooccur_pagerank(spark, sf_dir, iters: int = PR_ITERS) -> DataFrame:
    """Weighted PageRank over the co-mention graph, ``iters`` fixed
    synchronous iterations from uniform mass:

        pr'(v) = TELEPORT + Σ_{(u,v)∈E} (pr(u)·85·w_uv) div (100·wdeg_u)

    Scale shape: per iteration ONE join of the edge list against the
    rank table (broadcast here — the dictionary bounds the rank table;
    at full-gazetteer/entity-graph scale the honest shape is a
    src-keyed shuffle join, same as any bulk-synchronous PR) + ONE
    dst-keyed aggregation with map-side combine; the symmetrized edge
    list guarantees every node has in-edges, so no dangling-node join
    is needed (the DuckDB oracle keeps the LEFT-join form — its
    COALESCE provably never fires on this graph).
    Lineage grows linearly in iters like the k-means — production
    checkpoints every few rounds (see dedup_cc_clusters'
    localCheckpoint) rather than unrolling hundreds.
    """
    e = _cooccur_edges(spark, sf_dir)
    nodes = e.select(F.col("src").alias("tok")).distinct()
    pr = nodes.select("tok", F.lit(PR_SCALE).cast("bigint").alias("pr"))
    for _ in range(iters):
        # no broadcast hint: a hinted broadcast forces one eager
        # materialization JOB per iteration (~1s fixed cost each on this
        # VM, BENCH/job_overhead.json); un-hinted, the whole chain plans
        # as ONE job of chained shuffle stages — which is also the honest
        # shape at entity-graph scale where the rank table outgrows
        # broadcast range (AQE still converts small sides at runtime).
        contrib = (
            e.join(pr.withColumnRenamed("tok", "src"), "src")
            .select(
                F.col("dst").alias("tok"),
                F.expr(
                    f"pr * {PR_DAMP_NUM} * w div ({PR_DAMP_DEN} * wdeg)"
                ).alias("c"),
            )
            .groupBy("tok")
            .agg(F.sum("c").alias("s"))
        )
        # symmetrized edges ⇒ every node has in-edges, so contrib covers
        # all nodes and the dangling LEFT join is provably a no-op here
        # (kept in the oracle, where COALESCE never fires); a directed
        # variant would re-add `nodes.join(contrib, "tok", "left")`.
        pr = contrib.select(
            "tok",
            (F.lit(PR_TELEPORT) + F.col("s")).cast("bigint").alias("pr"),
        )
    return pr.select("tok", "pr")


def cooccur_triangles(spark, sf_dir) -> DataFrame:
    """Per-node triangle counts over the STRONG co-mention graph — the
    fourth graph-analytics family (after CC, k-means, PageRank): the
    local-clustering / community-density primitive ("which entities sit
    in tightly co-mentioned cliques?").

    Edge selection: the raw co-mention graph of this corpus is near-
    complete (every dictionary pair co-occurs somewhere), so edges keep
    only ABOVE-MEAN weights via the exact integer rule
    ``c_ab * n_edges > sum(c_ab)`` — scale-free, no float mean, no
    percentile (whose semantics differ across engines).

    Algorithm: degree-ordered orientation (Cohen 2009; Suri &
    Vassilvitskii WWW'11) — orient every edge from its (deg, tok)-
    smaller endpoint, emit wedges only at each edge's SOURCE, close
    each wedge with one equi-join back to the oriented edge list. The
    orientation is the whole scale story: a hub of degree d is the
    source of wedges only toward its ~sqrt-bounded higher-ordered
    neighbors, so total wedge volume is O(m^{3/2}) regardless of skew
    (an unoriented formulation emits d² wedges per hub). Every triangle
    {a<b<c} materializes exactly once (wedge at a, closed by b→c).
    Shape: two equi-joins + one explode + one combine agg — no
    cartesian, no iteration; at web scale both joins shuffle on token
    keys with the wedge join bounded by the orientation.

    All-integer (counts and lexicographic tie-breaks), so the DuckDB
    oracle replays the identical orientation, wedge set, and per-node
    counts.
    """
    from astrospark.ops.text import token_cooccurrence

    from astrospark.ops.caching import scoped_persist

    tc = token_cooccurrence(spark, sf_dir).select("tok_a", "tok_b", "c_ab")
    stats = tc.agg(
        F.sum("c_ab").alias("s_all"), F.count("*").alias("n_edges")
    )
    # scoped_persist: strong feeds degrees AND the orientation join;
    # oriented feeds both wedge sides AND the closing join — without the
    # caches each consumer re-plans the whole corpus self-join subtree
    # (measured: 45 duplicated 1-row-broadcast nodes in the raw plan).
    strong = scoped_persist(
        tc.crossJoin(F.broadcast(stats))
        .filter(F.col("c_ab") * F.col("n_edges") > F.col("s_all"))
        .select("tok_a", "tok_b")
    )
    und = strong.union(
        strong.select(F.col("tok_b").alias("tok_a"), F.col("tok_a").alias("tok_b"))
    )
    deg = und.groupBy(F.col("tok_a").alias("tok")).agg(
        F.count("*").alias("d")
    )
    da = deg.select(F.col("tok").alias("tok_a"), F.col("d").alias("d_a"))
    db = deg.select(F.col("tok").alias("tok_b"), F.col("d").alias("d_b"))
    a_first = (F.col("d_a") < F.col("d_b")) | (
        (F.col("d_a") == F.col("d_b")) & (F.col("tok_a") < F.col("tok_b"))
    )
    oriented = scoped_persist(
        strong.join(F.broadcast(da), "tok_a")
        .join(F.broadcast(db), "tok_b")
        .select(
            F.when(a_first, F.col("tok_a")).otherwise(F.col("tok_b")).alias("u"),
            F.when(a_first, F.col("tok_b")).otherwise(F.col("tok_a")).alias("v"),
            F.when(a_first, F.col("d_b")).otherwise(F.col("d_a")).alias("d_v"),
        )
    )
    e1 = oriented.select("u", F.col("v").alias("x"), F.col("d_v").alias("d_x"))
    e2 = oriented.select("u", F.col("v").alias("y"), F.col("d_v").alias("d_y"))
    wedges = e1.join(e2, "u").filter(
        (F.col("d_x") < F.col("d_y"))
        | ((F.col("d_x") == F.col("d_y")) & (F.col("x") < F.col("y")))
    )
    closing = oriented.select(F.col("u").alias("x"), F.col("v").alias("y"))
    tri = wedges.join(closing, ["x", "y"]).select("u", "x", "y")
    return (
        tri.select(F.explode(F.array("u", "x", "y")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").cast("int").alias("n_tri"))
    )
