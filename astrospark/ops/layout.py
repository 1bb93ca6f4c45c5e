"""Multi-dimensional data layout: z-order (Morton) interleaving for
min/max data skipping.

At 100 TB the fastest scan is the one that never reads the file:
parquet footers carry per-column min/max, and engines prune row groups
whose range misses the predicate. A single sort column makes that
pruning perfect on ONE dimension and useless on every other; bit
interleaving two quantized dimensions into one sort key (the z-order /
Morton curve — what Delta's and Iceberg's OPTIMIZE ZORDER BY write)
makes files cover small RECTANGLES of the (a, b) space, so min/max
pruning works on BOTH dimensions at once. tests/test_layout_zorder.py
measures it: against a two-dimensional range predicate, z-ordered files
are prunable where single-column-sorted files are not.

Everything is integer bit arithmetic (shift/and/or), so the key — and
the contract row's coarse-cell rollup — replays bit-for-bit in DuckDB;
the whole computation is JVM-side codegen, no UDF anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

ZORDER_BITS = 16  # per-dimension; the interleaved key fits in 32 bits
ZORDER_CELL_SHIFT = 24  # contract rollup: top 8 bits -> <=256 cells
PRICE_BUCKET = 100  # dollars-per-bucket quantization for l_extendedprice


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def zorder_key(a, b, bits: int = ZORDER_BITS) -> F.Column:
    """Interleave the low ``bits`` of two non-negative ints: bit i of
    ``a`` lands at position 2i+1, bit i of ``b`` at 2i. Pure
    shift/and/or column expression — whole-stage codegen, and the exact
    same arithmetic replays in any SQL engine (see zorder_key_sql)."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    key = F.lit(0).cast("long")
    for i in range(bits):
        key = key.bitwiseOR(
            F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        ).bitwiseOR(F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i))
    return key


def zorder_key_sql(a: str, b: str, bits: int = ZORDER_BITS) -> str:
    """The identical interleave as portable SQL (DuckDB oracle twin of
    zorder_key — same shift/and/or terms, OR-folded)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i})")
    return "(" + " | ".join(terms) + ")"


def _lineitem_dims(spark, sf_dir) -> DataFrame:
    """The two query dimensions of the demo workload: part key and
    price bucket — 'which files hold part P at price around V'. Each
    dim is min-max scaled to the FULL bits-wide domain (integer
    arithmetic over a broadcast 1-row stats frame): unequal effective
    bit widths are the classic z-order pitfall — the wider dimension's
    high bits dominate the key and the curve degenerates to a single
    sort (measured: part spanning 8 bits against price's 11 gave ZERO
    part-side pruning before scaling)."""
    cap = (1 << ZORDER_BITS) - 1
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.col("l_partkey").cast("long").alias("raw_part"),
        F.floor(F.col("l_extendedprice") / PRICE_BUCKET).cast("long").alias("raw_price"),
    )
    stats = li.agg(
        F.min("raw_part").alias("mn_a"),
        F.max("raw_part").alias("mx_a"),
        F.min("raw_price").alias("mn_b"),
        F.max("raw_price").alias("mx_b"),
    )

    def scaled(col, mn, mx):
        span = F.greatest(F.col(mx) - F.col(mn), F.lit(1))
        return F.floor((F.col(col) - F.col(mn)) * cap / span).cast("long")

    return li.join(F.broadcast(stats)).select(
        "l_orderkey",
        scaled("raw_part", "mn_a", "mx_a").alias("d_part"),
        scaled("raw_price", "mn_b", "mx_b").alias("d_price"),
    )


def zorder_cells(spark, sf_dir) -> DataFrame:
    """Contract row: the coarse z-cell rollup of lineitem's
    (part, price-bucket) space — per 8-bit-prefix cell, the row count
    and each dimension's min/max. This IS the file-level metadata a
    z-ordered write would produce (one cell ~ one file's footer stats),
    so the row proves the key computation and the rectangles it induces
    are cross-engine exact."""
    dims = _lineitem_dims(spark, sf_dir)
    key = zorder_key("d_part", "d_price")
    return (
        dims.withColumn("zcell", F.shiftright(key, ZORDER_CELL_SHIFT).cast("int"))
        .groupBy("zcell")
        .agg(
            F.count("*").cast("int").alias("n_rows"),
            F.min("d_part").alias("min_part"),
            F.max("d_part").alias("max_part"),
            F.min("d_price").alias("min_price"),
            F.max("d_price").alias("max_price"),
        )
    )


def zorder_cells_sql() -> str:
    """DuckDB oracle for zorder_cells (identical integer min-max
    scaling + interleave; IEEE double division of exactly-representable
    ints floors identically in both engines)."""
    cap = (1 << ZORDER_BITS) - 1
    zk = zorder_key_sql("d_part", "d_price")
    return (
        "WITH raw AS (SELECT CAST(l_partkey AS BIGINT) AS raw_part, "
        f"CAST(floor(l_extendedprice / {PRICE_BUCKET}) AS BIGINT) AS raw_price "
        "FROM lineitem), "
        "s AS (SELECT min(raw_part) AS mn_a, max(raw_part) AS mx_a, "
        "min(raw_price) AS mn_b, max(raw_price) AS mx_b FROM raw), "
        "dims AS (SELECT "
        f"CAST(floor((raw_part - mn_a) * {cap} / greatest(mx_a - mn_a, 1)) AS BIGINT) AS d_part, "
        f"CAST(floor((raw_price - mn_b) * {cap} / greatest(mx_b - mn_b, 1)) AS BIGINT) AS d_price "
        "FROM raw CROSS JOIN s) "
        f"SELECT CAST({zk} >> {ZORDER_CELL_SHIFT} AS INT) AS zcell, "
        "CAST(count(*) AS INT) AS n_rows, "
        "min(d_part) AS min_part, max(d_part) AS max_part, "
        "min(d_price) AS min_price, max(d_price) AS max_price "
        "FROM dims GROUP BY zcell"
    )


def write_zordered(
    df: DataFrame, path: str, key_col: F.Column, n_files: int
) -> None:
    """The layout write: range-partition by the key (so each output
    file covers a contiguous key range — for a z-key, a rectangle of
    the dim space) and sort within partitions so parquet row-group
    min/max stay tight. This is exactly what table-format OPTIMIZE
    ZORDER does, expressed with stock DataFrame ops."""
    (
        df.withColumn("_zk", key_col)
        .repartitionByRange(n_files, "_zk")
        .sortWithinPartitions("_zk")
        .drop("_zk")
        .write.mode("overwrite")
        .parquet(path)
    )


COMPACT_TARGET_BYTES = 128 * 1024 * 1024  # the usual HDFS/S3 block target


def compact_parquet(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    target_bytes: int = COMPACT_TARGET_BYTES,
    sort_col: str | None = None,
) -> dict:
    """Small-file compaction: rewrite a directory of parquet files into
    ceil(total_bytes / target_bytes) files of ~target size — the
    operational fix for the small-files problem every streaming /
    incremental ingest creates (each micro-batch appends a file; a
    100 TB table ingested in 1 MB dribbles is 10^8 files, and file
    OPEN cost starts to dominate scans — see
    streaming/extract_stream.py's sink note).

    Spark-idiomatic: the file inventory comes from the driver-side
    listing (bounded metadata, same discipline as checkpoint commit
    reads), the rewrite is ONE job — read → repartition(n_out) [or
    repartitionByRange(sort_col) to also restore clustering, composing
    with write_zordered's layout] → write. Row set is preserved
    exactly (asserted in tests/test_layout_zorder.py). Table formats do
    this incrementally with bin-packing + a transactional swap; on raw
    parquet the atomic-rename directory swap is the caller's move.

    Returns {files_in, files_out, bytes_total, n_target}.
    """
    import glob as _glob
    import os as _os

    files = sorted(_glob.glob(f"{in_dir}/part-*.parquet")) or sorted(
        _glob.glob(f"{in_dir}/*.parquet")
    )
    bytes_total = sum(_os.path.getsize(f) for f in files)
    n_out = max(1, -(-bytes_total // target_bytes))
    df = spark.read.parquet(in_dir)
    if sort_col is not None:
        df = df.repartitionByRange(n_out, sort_col).sortWithinPartitions(sort_col)
    else:
        df = df.repartition(n_out)
    df.write.mode("overwrite").parquet(out_dir)
    files_out = len(_glob.glob(f"{out_dir}/part-*.parquet"))
    return {
        "files_in": len(files),
        "files_out": files_out,
        "bytes_total": bytes_total,
        "n_target": n_out,
    }


def footer_stats(spark: SparkSession, path: str, col: str) -> dict:
    """count/min/max of a parquet column answered from FOOTER METADATA,
    no row scan: Spark's DSv2 parquet reader pushes whole-table
    COUNT/MIN/MAX into the scan (``PushedAggregation`` in the plan) and
    assembles the answer from each file's row count and column
    statistics — the 100 TB "how big is this table / what date range
    does it cover" query in O(files) footer reads instead of O(rows).

    The two enabling confs are flipped only for the duration of the
    call and restored after (aggregate pushdown lives on the v2 read
    path, and the library session keeps parquet on the default v1 path
    everywhere else); the aggregation executes eagerly inside the
    flipped window so the captured plan is the one that ran. Returns
    ``{"n", "min", "max", "pushed"}`` — ``pushed`` is read off the
    EXECUTED plan, so callers (and tests/test_layout_zorder.py) can
    assert the metadata-only path actually served the query. Pushdown
    requires no data filter and a non-nested column; with either
    present Spark silently falls back to a row scan, which this flag
    surfaces. Timestamp columns are one such fallback (Spark excludes
    them from footer MIN/MAX — int96-era stats are untrustworthy);
    numeric/string/date columns push.
    """
    prev = {
        k: spark.conf.get(k, None)
        for k in ("spark.sql.sources.useV1SourceList", "spark.sql.parquet.aggregatePushdown")
    }
    try:
        spark.conf.set("spark.sql.sources.useV1SourceList", "")
        spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
        agg = spark.read.parquet(path).agg(
            F.count("*").alias("n"),
            F.min(col).alias("mn"),
            F.max(col).alias("mx"),
        )
        row = agg.collect()[0]
        plan = agg._jdf.queryExecution().executedPlan().toString()
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    return {
        "n": row["n"],
        "min": row["mn"],
        "max": row["mx"],
        "pushed": "PushedAggregation: [" in plan and "COUNT(*)" in plan,
    }


def assign_contiguous_ids(
    df: DataFrame, order_col: str, n_parts: int | None = None
) -> DataFrame:
    """Contiguous 0..N-1 ids in ``order_col`` order WITHOUT the global
    single-partition sort — the example-numbering primitive every
    training-data pipeline needs (stable sample ids, shard manifests),
    where the naive ``row_number() OVER (ORDER BY ...)`` plans an
    Exchange SinglePartition and funnels 100 TB through one task.

    Three bounded steps instead: (1) range-repartition + local sort on
    the order column (the partition INDEX is then ordinal in range
    order); (2) per-partition row counts — n_parts rows to the driver,
    bounded metadata like the checkpoint commit reads, never data —
    prefix-summed into per-partition offsets; (3) broadcast the offset
    table back and add it to the per-partition local row_number. The
    local window partitions by the range-partition id, so its exchange
    moves each partition as a unit and parallelism is preserved;
    nothing ever serializes through one task. The result equals the
    global rank by ``order_col`` regardless of where the range sampler
    places boundaries (unique order keys make rank boundary-
    independent), which is what lets a DuckDB row_number() oracle
    value-check it. Returns the input columns plus ``seq`` (long).
    """
    spark = df.sparkSession
    if n_parts is None:
        n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    from astrospark.ops.caching import scoped_persist

    ranged = scoped_persist(
        df.repartitionByRange(n_parts, order_col)
        .sortWithinPartitions(order_col)
        .withColumn("_pid", F.spark_partition_id())
    )
    counts = sorted(
        (r["_pid"], r["n"])
        for r in ranged.groupBy("_pid").agg(F.count("*").alias("n")).collect()
    )
    offsets, acc = [], 0
    for pid, n in counts:
        offsets.append((pid, acc))
        acc += n
    odf = spark.createDataFrame(offsets, "_pid int, _offset long")
    local = (
        F.row_number().over(Window.partitionBy("_pid").orderBy(order_col)) - 1
    )
    return (
        ranged.withColumn("_local", local.cast("long"))
        .join(F.broadcast(odf), "_pid")
        .withColumn("seq", F.col("_local") + F.col("_offset"))
        .drop("_pid", "_local", "_offset")
    )


def contiguous_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract row: contiguous ids over documents in doc_id order —
    equals row_number() OVER (ORDER BY doc_id) - 1 but computed with
    assign_contiguous_ids' bounded three-step plan (no Exchange
    SinglePartition anywhere; plan-pinned)."""
    d = _t(spark, sf_dir, "documents").select("doc_id")
    return assign_contiguous_ids(d, "doc_id").select("doc_id", "seq")


def cost_balanced_repartition(
    df: DataFrame, weight_col: str, order_col: str, n_parts: int
) -> DataFrame:
    """Repartition so every partition carries ~equal total WEIGHT (not
    equal row count) — the straggler fix for per-row cost skew. Equal-
    row partitioning of a skewed corpus (one 10 MB document among 4 KB
    ones; extraction cost ~ doc length) leaves one task running long
    after the rest of the stage drained; here each task gets roughly
    total_weight / n_parts of work instead.

    Same bounded prefix-sum machinery as assign_contiguous_ids: range-
    repartition on ``order_col`` (unique key — makes the global cumsum
    well-defined), per-partition WEIGHT SUMS to the driver (n_parts
    rows of metadata), prefix-sum into offsets, broadcast back, and
    bucket every row by its exclusive-cumsum start:
    bucket = cum_before div ceil(total / n_parts). The final exchange
    places bucket i on partition i exactly via hash-inverse salts (see
    below). No single-partition stage anywhere. (AQE's REBALANCE hint
    is the bytes-based sibling — it splits oversized shuffle blocks by
    SIZE; this op balances an arbitrary cost column, e.g. extraction
    cost ~ n_chars, which bytes don't proxy once rows are wide-skewed.)

    A row is never split, so one row heavier than the target still owns
    its bucket alone — the bound is max(partition_load) <= target +
    max_single_weight, which is the best any row-atomic partitioner
    can do (tests/test_layout_zorder.py asserts it on a pathological
    corpus).
    """
    spark = df.sparkSession
    from astrospark.ops.caching import scoped_persist

    ranged = scoped_persist(
        df.repartitionByRange(n_parts, order_col)
        .sortWithinPartitions(order_col)
        .withColumn("_pid", F.spark_partition_id())
    )
    sums = sorted(
        (r["_pid"], r["w"])
        for r in ranged.groupBy("_pid")
        .agg(F.sum(weight_col).cast("long").alias("w"))
        .collect()
    )
    offsets, acc = [], 0
    for pid, w in sums:
        offsets.append((pid, acc))
        acc += w
    target = max(1, -(-acc // n_parts))  # ceil(total / n_parts)
    odf = spark.createDataFrame(offsets, "_pid int, _offset long")
    w_local = (
        F.sum(F.col(weight_col).cast("long")).over(
            Window.partitionBy("_pid")
            .orderBy(order_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        - F.col(weight_col).cast("long")
    )
    bucketed = (
        ranged.join(F.broadcast(odf), "_pid")
        .withColumn("_cum", w_local + F.col("_offset"))
        .withColumn("_bucket", F.expr(f"_cum div {target}"))
        .drop("_pid", "_offset", "_cum")
    )
    # Neither stock shuffle places ~n_parts known bucket ids one-per-
    # partition: hash-repartition collides buckets (measured: two heavy
    # buckets sharing a partition re-creates the skew), and range-
    # repartition samples boundaries by ROW count, merging a heavy-but-
    # few-rows bucket into its neighbor. So invert the hash: for each
    # bucket pick a salt with pmod(murmur3(salt), n_parts) == bucket
    # (found once on a tiny spark.range — driver metadata) and shuffle
    # on the salt; placement becomes the identity, deterministically.
    salts = _hash_inverse_salts(spark, n_parts)
    sdf = spark.createDataFrame(
        [(b, s) for b, s in salts.items()], "_bucket long, _salt int"
    )
    return (
        bucketed.join(F.broadcast(sdf), "_bucket")
        .repartition(n_parts, "_salt")
        .drop("_bucket", "_salt")
    )


def _hash_inverse_salts(spark: SparkSession, n_parts: int) -> dict:
    """For every partition index 0..n_parts-1, a small int whose
    Murmur3 hash lands on it under HashPartitioning — computed with
    Spark's own F.hash so the probe and the shuffle agree bit-for-bit.
    Candidate pool grows until every partition is covered (coupon-
    collector: ~n ln n candidates suffice; start at 16n)."""
    k = max(64, n_parts * 16)
    while True:
        rows = (
            spark.range(k)
            .select(
                F.col("id").cast("int").alias("s"),
                F.pmod(F.hash(F.col("id").cast("int")), F.lit(n_parts)).alias("p"),
            )
            .collect()
        )
        best: dict = {}
        for r in rows:
            best.setdefault(r["p"], r["s"])
        if len(best) == n_parts:
            return best
        k *= 4
