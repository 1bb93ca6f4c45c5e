"""Similarity search over the embeddings table (array<float> column).

Brute-force cosine top-k as the exact baseline (JVM-side arithmetic via
``aggregate``/``zip_with`` higher-order functions — no Python UDF), plus an
axis-sign LSH bucketing as the scale path: bucket key = sign pattern of the
first SIGN_DIMS components (deterministic, portable to the SQL oracle);
at 10^12 scale the bucket key becomes the shuffle/partition key so
candidate generation never goes all-pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TOP_K = 10
SIGN_DIMS = 4
NEARDUP_COS = 0.35


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def ann_cosine_topk(spark, sf_dir) -> DataFrame:
    """Exact top-k by cosine against the query vector (vec_id=0)."""
    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q_emb"))
    joined = e.filter(F.col("vec_id") != 0).crossJoin(F.broadcast(q))
    sims = joined.select(
        "vec_id",
        F.round(cosine(F.col("embedding").cast("array<double>"), F.col("q_emb").cast("array<double>")), 4).alias("cos_sim"),
    )
    return sims.orderBy(F.desc("cos_sim"), F.asc("vec_id")).limit(TOP_K)


def sign_bucket(col):
    """LSH bucket: concatenated sign bits of the first SIGN_DIMS dims."""
    bits = [
        F.when(F.element_at(col, i + 1) >= 0, "1").otherwise("0")
        for i in range(SIGN_DIMS)
    ]
    return F.concat(*bits)


def ann_lsh_buckets(spark, sf_dir) -> DataFrame:
    """Bucket census for the sign-LSH index (the scale-path partitioner)."""
    e = _emb(spark, sf_dir)
    return (
        e.select(sign_bucket(F.col("embedding")).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").cast("int").alias("n_vecs"))
    )


def ann_lsh_topk(spark, sf_dir) -> DataFrame:
    """Approximate top-k: search only the query's sign bucket."""
    e = _emb(spark, sf_dir).withColumn("bucket", sign_bucket(F.col("embedding")))
    q = e.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_emb"), F.col("bucket").alias("q_bucket")
    )
    cands = e.filter(F.col("vec_id") != 0).join(
        F.broadcast(q), F.col("bucket") == F.col("q_bucket")
    )
    sims = cands.select(
        "vec_id",
        F.round(cosine(F.col("embedding").cast("array<double>"), F.col("q_emb").cast("array<double>")), 4).alias("cos_sim"),
    )
    return sims.orderBy(F.desc("cos_sim"), F.asc("vec_id")).limit(TOP_K)


N_CENTROIDS = 8


def ivf_cells(spark, sf_dir) -> DataFrame:
    """IVF coarse quantizer: assign every vector to its nearest centroid.

    Centroids are the deterministic seed vectors vec_id 1..N_CENTROIDS (a
    production build would k-means them; the assignment/search plan is
    identical). The centroid table is broadcast; assignment is a
    broadcast nested-loop over N_CENTROIDS rows + windowed argmax with a
    4-decimal rounded score and centroid-id tie-break (portable across
    engines). At 10^12 scale the cell id becomes the partition key, so
    probe-time search touches one cell's partitions only.
    """
    from pyspark.sql import Window

    e = _emb(spark, sf_dir).withColumn("emb_d", F.col("embedding").cast("array<double>"))
    cents = (
        e.filter(F.col("vec_id").between(1, N_CENTROIDS))
        .select(F.col("vec_id").alias("cid"), F.col("emb_d").alias("cemb"))
    )
    scored = e.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "cid",
        F.round(cosine(F.col("emb_d"), F.col("cemb")), 4).alias("cs"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cs"), F.asc("cid"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", F.col("cid").alias("cell"))
    )


def ann_ivf_topk(spark, sf_dir) -> DataFrame:
    """IVF probe: search only the query vector's cell (nprobe=1)."""
    e = _emb(spark, sf_dir)
    cells = ivf_cells(spark, sf_dir)
    v = e.join(cells, "vec_id")
    q = v.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_emb"), F.col("cell").alias("q_cell")
    )
    cands = v.filter(F.col("vec_id") != 0).join(
        F.broadcast(q), F.col("cell") == F.col("q_cell")
    )
    sims = cands.select(
        "vec_id",
        F.round(
            cosine(F.col("embedding").cast("array<double>"), F.col("q_emb").cast("array<double>")),
            4,
        ).alias("cos_sim"),
    )
    return sims.orderBy(F.desc("cos_sim"), F.asc("vec_id")).limit(TOP_K)


def emb_neardup_pairs(spark, sf_dir) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, bucket-prefiltered.

    Same-bucket pairs only (the LSH contract); exact cosine filter after.
    The join key is the bucket — at scale this is a hash join on a
    low-cardinality key with per-bucket locality, never a cross join.

    Norms are precomputed ONCE per vector before the pair join (the naive
    per-pair cosine re-aggregates both norms for every joined row — an
    O(pairs·dim) waste that dominates at bucket sizes in the thousands);
    the per-pair work is a single dot product. FP op order is unchanged
    (same aggregate expression per vector), so results are bit-identical
    to the per-pair formulation and to the DuckDB oracle.
    """
    e = (
        _emb(spark, sf_dir)
        .withColumn("bucket", sign_bucket(F.col("embedding")))
        .withColumn("emb_d", F.col("embedding").cast("array<double>"))
        .withColumn("nrm", _norm(F.col("emb_d")))
    )
    a = e.select(F.col("vec_id").alias("vec_a"), F.col("emb_d").alias("emb_a"), F.col("nrm").alias("nrm_a"), "bucket")
    b = e.select(F.col("vec_id").alias("vec_b"), F.col("emb_d").alias("emb_b"), F.col("nrm").alias("nrm_b"), "bucket")
    pairs = a.join(b, "bucket").filter(F.col("vec_a") < F.col("vec_b"))
    sims = pairs.select(
        "vec_a",
        "vec_b",
        F.round(
            _dot(F.col("emb_a"), F.col("emb_b")) / (F.col("nrm_a") * F.col("nrm_b")), 4
        ).alias("cos_sim"),
    )
    return sims.filter(F.col("cos_sim") >= NEARDUP_COS)
