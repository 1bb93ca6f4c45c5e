"""Semantics + plan tests for the round-4 join-shape additions: the
bucketed point-in-interval join (range join as equi-join on quantized
time buckets) and the hot-key-salted equi-join. The contract checker
proves Spark≡DuckDB for the two contract rows; these pin the semantics
against independent replays (pandas interval scan / the unsalted Spark
join) and make the scale claims executable (no nested-loop join in the
plan; the hot key actually spreads across partitions)."""

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


# --- point-in-interval join -------------------------------------------------


def test_interval_join_pandas_replay(spark):
    """Independent oracle: a pandas nested scan over (interval, purchase)
    pairs reproduces every aggregate row, inclusive on both bounds."""
    from astrospark.ops.events import INCIDENT_WINDOW_US, interval_join

    ev = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    t_us = ev.ts.astype("int64")  # ns -> us below
    ev = ev.assign(t_us=t_us // 1000)
    errs = ev[ev.event_type == "error"]
    purch = ev[ev.event_type == "purchase"].assign(
        cents=(ev[ev.event_type == "purchase"].value * 100).round().astype("int64")
    )
    expected = {}
    for _, e in errs.iterrows():
        lo, hi = e.t_us, e.t_us + INCIDENT_WINDOW_US
        inside = purch[(purch.t_us >= lo) & (purch.t_us <= hi)]
        if len(inside):
            expected[int(e.event_id)] = (len(inside), int(inside.cents.sum()))

    got = {
        int(r.interval_id): (r.n_purchases, r.purchase_cents)
        for r in interval_join(spark, SF).collect()
    }
    assert got == expected
    assert len(got) > 10  # non-trivial at sf0.001


def test_interval_join_bucket_edges(spark):
    """Intervals that cross bucket boundaries (and ones much longer than
    the bucket width) still match exactly what a naive cross-filter
    finds — the explode(sequence(...)) covers every overlapped bucket."""
    from astrospark.ops.events import point_in_interval_join

    b = 100  # tiny bucket width to force multi-bucket intervals
    intervals = spark.createDataFrame(
        [
            (1, 95, 105),  # crosses one boundary
            (2, 0, 99),  # exactly one bucket
            (3, 50, 430),  # spans 5 buckets
            (4, 200, 200),  # zero-length, on a boundary
            (5, 601, 601),  # zero-length, off-boundary
        ],
        "iid int, lo_us long, hi_us long",
    )
    probes = spark.createDataFrame(
        [(t,) for t in [0, 50, 94, 95, 99, 100, 105, 106, 200, 201, 430, 431, 601]],
        "t_us long",
    )
    got = sorted(
        (r.iid, r.t_us)
        for r in point_in_interval_join(
            probes, intervals, bucket_us=b
        ).collect()
    )
    naive = sorted(
        (r.iid, r.t_us)
        for r in probes.crossJoin(intervals)
        .filter((F.col("lo_us") <= F.col("t_us")) & (F.col("t_us") <= F.col("hi_us")))
        .collect()
    )
    assert got == naive
    assert (4, 200) in got and (5, 601) in got  # zero-length inclusivity


def test_interval_join_plan_no_nested_loop(spark):
    """The scale claim: the range join must plan as an equi-join on the
    bucket key — never BroadcastNestedLoopJoin or a cartesian."""
    from astrospark.ops.events import interval_join

    plan = _plan(interval_join(spark, SF))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Join" in plan


# --- salted equi-join -------------------------------------------------------


def _hot_frames(spark):
    """A left side where one key carries 90% of the rows."""
    rows = [(i, "hot" if i % 10 else "cold%d" % (i % 97)) for i in range(4000)]
    left = spark.createDataFrame(rows, "row_id long, k string")
    right = spark.createDataFrame(
        [("hot", 1), ("cold5", 2), ("cold40", 3)], "k string, payload int"
    )
    return left, right


def test_salted_join_equals_plain_join(spark):
    """Salting is plan-internal: row-for-row identical to the unsalted
    join, including multiplicities, inner and left-outer."""
    from astrospark.ops.relational import salted_equi_join

    left, right = _hot_frames(spark)
    for how in ("inner", "left"):
        salted = sorted(
            map(tuple, salted_equi_join(left, right, "k", "row_id", how=how)
                .select("row_id", "k", "payload").collect())
        )
        plain = sorted(
            map(tuple, left.join(right, on="k", how=how)
                .select("row_id", "k", "payload").collect())
        )
        assert salted == plain


def test_salted_join_spreads_hot_key(spark):
    """The point of the salt: repartitioning by (k, salt) spreads the
    hot key across partitions, where (k) alone collapses 90% of rows
    into one task."""
    from astrospark.ops.relational import SALT_FACTOR

    left, _ = _hot_frames(spark)
    n_part = 16
    salted = left.withColumn(
        "_salt", F.pmod(F.xxhash64("row_id"), F.lit(SALT_FACTOR)).cast("int")
    )

    def max_partition(df, *cols):
        sizes = (
            df.repartition(n_part, *cols)
            .withColumn("pid", F.spark_partition_id())
            .groupBy("pid")
            .count()
            .collect()
        )
        return max(r["count"] for r in sizes)

    unsalted_max = max_partition(left, "k")
    salted_max = max_partition(salted, "k", "_salt")
    assert unsalted_max >= 3600  # the hot key collapses into one task
    # hot rows now spread over SALT_FACTOR partitions (allow hash-collision slack)
    assert salted_max <= unsalted_max / 2


def test_salted_salt_is_deterministic(spark):
    """Retry determinism: the salt derives from row content (xxhash64 of
    the id column), never from randomness or partition ids — two
    evaluations agree row-for-row."""
    left, right = _hot_frames(spark)
    from astrospark.ops.relational import salted_equi_join

    a = sorted(map(tuple, salted_equi_join(left, right, "k", "row_id").collect()))
    b = sorted(
        map(tuple, salted_equi_join(left.repartition(7), right, "k", "row_id").collect())
    )
    assert a == b


def test_aqe_skew_join_splits_hot_partition(spark):
    """The runtime complement to salting: with AQE's skew-join enabled
    (library session default) and thresholds scaled to test data, a
    sort-merge join against a 95%-hot key gets its hot partition SPLIT
    at runtime — the final adaptive plan carries SortMergeJoin(skew=true).
    Salting (compile-time, works for any join type) and AQE splitting
    (runtime, SMJ only, after the skewed shuffle is written) are the two
    layers of the skew story; both are now executable."""
    rows = [(i, "hot" if i % 20 else "c%d" % (i % 50), "x" * 50) for i in range(60000)]
    left = spark.createDataFrame(rows, "row_id long, k string, pad string")
    right = spark.createDataFrame(
        [("hot", 1)] + [("c%d" % i, i) for i in range(50)], "k string, v int"
    )
    tuned = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "20KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "10KB",
    }
    saved = {}
    for key, val in tuned.items():
        try:
            saved[key] = spark.conf.get(key)
        except Exception:
            saved[key] = None
        spark.conf.set(key, val)
    try:
        joined = left.join(right.hint("shuffle_merge"), "k")
        assert len(joined.collect()) == 60000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:800]
    finally:
        for key, val in saved.items():
            if val is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, val)


# --- sequential funnel ------------------------------------------------------


def test_funnel_ordering_semantics(spark, tmp_path):
    """Hand-built funnels: order matters (a click BEFORE signup does not
    advance the funnel), equal timestamps count (>=), and users with
    funnel events but no signup land at stage 0."""
    import datetime as dt

    def ts(minute):
        return dt.datetime(2024, 1, 1, 0, minute)

    rows = [
        # u1: full ordered funnel -> stage 3
        (1, ts(1), 1, "signup", 1.0, "{}"),
        (2, ts(2), 1, "click", 1.0, "{}"),
        (3, ts(3), 1, "purchase", 1.0, "{}"),
        # u2: click precedes signup, no later click -> stage 1
        (4, ts(1), 2, "click", 1.0, "{}"),
        (5, ts(2), 2, "signup", 1.0, "{}"),
        (6, ts(3), 2, "purchase", 1.0, "{}"),
        # u3: signup+click, purchase BEFORE the click -> stage 2
        (7, ts(1), 3, "signup", 1.0, "{}"),
        (8, ts(2), 3, "purchase", 1.0, "{}"),
        (9, ts(3), 3, "click", 1.0, "{}"),
        # u4: purchase only -> stage 0 (in funnel population, no signup)
        (10, ts(1), 4, "purchase", 1.0, "{}"),
        # u5: all three at the SAME instant -> stage 3 (>= boundary)
        (11, ts(5), 5, "signup", 1.0, "{}"),
        (12, ts(5), 5, "click", 1.0, "{}"),
        (13, ts(5), 5, "purchase", 1.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))

    from astrospark.ops.events import funnel_stages

    got = {r.max_stage: r.n_users for r in funnel_stages(spark, str(tmp_path)).collect()}
    assert got == {3: 2, 2: 1, 1: 1, 0: 1}


def test_funnel_single_aggregation_pass(spark):
    """Scale shape: ONE user_id exchange feeds the whole stage
    computation (sorted-array fold, no per-stage re-shuffle or
    self-join); only the tiny 4-row stage rollup exchanges after it."""
    from astrospark.ops.events import funnel_stages

    plan = _plan(funnel_stages(spark, SF))
    # formatted mode lists each node twice (tree + detail): 2 real
    # exchanges = user agg + the 4-row stage rollup
    assert plan.count("+- Exchange") <= 2, plan[:400]
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_cohort_retention_hand_matrix(spark, tmp_path):
    """Hand-built cohort matrix: cohort = first event day, offsets count
    DISTINCT active users (same-day bursts collapse), retention =
    n_active / cohort size."""
    from datetime import datetime, timedelta, timezone

    from astrospark.ops.events import COHORT_DAY_US, cohort_retention

    base = datetime(2024, 3, 1)
    # NTZ values are bucketed as-UTC (the session TZ); mirror that here
    # regardless of the host's local timezone
    day0 = (
        int(base.replace(tzinfo=timezone.utc).timestamp()) * 1_000_000
    ) // COHORT_DAY_US

    def ev(i, u, day, hour=1):
        return (i, base + timedelta(days=day, hours=hour), u, "click", 1.0, "{}")

    rows = [
        ev(1, 1, 0), ev(2, 1, 0, hour=5),  # burst: one user-day
        ev(3, 1, 1), ev(4, 1, 3),
        ev(5, 2, 0), ev(6, 2, 1),
        ev(7, 3, 1),  # later cohort
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))

    got = {
        (r.cohort_day, r.day_offset): (r.n_active, r.retention)
        for r in cohort_retention(spark, str(tmp_path)).collect()
    }
    assert got == {
        (day0, 0): (2, 1.0),
        (day0, 1): (2, 1.0),
        (day0, 3): (1, 0.5),
        (day0 + 1, 0): (1, 1.0),
    }


def test_cohort_retention_plan_no_distinct_expand(spark):
    """Plan shape: the up-front (user_id, day) distinct means NO exact
    countDistinct Expand anywhere, the activity join is the only join,
    and the cohort size comes from a window — not a second events scan."""
    from astrospark.ops.events import cohort_retention

    plan = _plan(cohort_retention(spark, SF))
    assert ") Expand" not in plan
    # one parquet scan node (formatted explain prints "(N) Scan parquet"
    # once per node): the persisted distinct frame serves both consumers
    assert plan.count(") Scan parquet") == 1
    assert plan.count(") InMemoryTableScan") == 2


# --- trailing RANGE-frame window --------------------------------------------


def test_trailing_window_scalar_replay(spark):
    """Independent two-pointer replay per user over microsecond ints:
    per-event trailing-24h count / cents sum / burst flag, inclusive
    frame, peer rows (equal ts) entering together."""
    from astrospark.ops.events import (
        TRAIL_BURST_N,
        TRAIL_WINDOW_US,
        trailing_window_agg,
    )

    rows = spark.read.parquet(f"{SF}/events.parquet").select(
        "event_id", "user_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("t_us"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    ).collect()
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append((r.t_us, r.event_id, r.cents))
    expected = {}
    for uid, evs in by_user.items():
        evs.sort()
        ts = [t for t, _, _ in evs]
        lo = 0
        for i, (t, eid, _) in enumerate(evs):
            while ts[lo] < t - TRAIL_WINDOW_US:
                lo += 1
            # RANGE frame: every peer with key <= t, from lo..last peer of t
            hi = i
            while hi + 1 < len(evs) and ts[hi + 1] == t:
                hi += 1
            n = hi - lo + 1
            c = sum(cc for _, _, cc in evs[lo : hi + 1])
            expected[eid] = (uid, n, c, int(n >= TRAIL_BURST_N))
    got = {
        r.event_id: (r.user_id, r.n_trail_1d, r.cents_trail_1d, r.is_burst)
        for r in trailing_window_agg(spark, SF).collect()
    }
    assert got == expected
    flags = {v[3] for v in got.values()}
    assert flags == {0, 1}  # burst threshold genuinely splits the corpus


def test_trailing_window_plan_single_user_exchange(spark):
    """One user_id hash exchange feeding the window sort; no join, no
    global range sort, rows never multiply."""
    from astrospark.ops.events import trailing_window_agg

    plan = _plan(trailing_window_agg(spark, SF))
    assert "Join" not in plan
    assert "rangepartitioning" not in plan.lower()
    # exactly one exchange (formatted explain: ") Name" = one per node),
    # and it hash-partitions on user_id
    assert plan.count(") Exchange") == 1
    assert "hashpartitioning(user_id" in plan
    assert plan.count(") Window") == 1


# --- session-TZ robustness (r4 post-mortem) ----------------------------------


def _write_ntz_events(path, wall_strs, values=None, users=None):
    """Write an events.parquet with NTZ micros timestamps (the exact
    physical shape of the driver testdata: isAdjustedToUTC=false)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    n = len(wall_strs)
    import datetime as dt

    ts = [dt.datetime.fromisoformat(s) for s in wall_strs]
    tbl = pa.table(
        {
            "event_id": pa.array(range(1, n + 1), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array(users or [1] * n, pa.int64()),
            "event_type": pa.array(["click"] * n),
            "value": pa.array(values or [1.0] * n, pa.float64()),
            "props": pa.array(["{}"] * n),
        }
    )
    pq.write_table(tbl, f"{path}/events.parquet")


def test_trailing_window_dst_session_tz(spark, tmp_path):
    """Regression for the r4 latent defect: two events 24.5 wall-hours
    apart straddling the 2024-03-10 US spring-forward. Under session TZ
    America/New_York the NTZ→LTZ cast compresses the epoch gap to 23.5h,
    so an UNPINNED trailing-24h RANGE frame counts 2 where the DuckDB
    oracle's naive epoch_us counts 1. @_utc_pinned must make the op
    session-TZ-independent: identical output under NY and UTC sessions,
    both equal to the naive-epoch expectation."""
    import duckdb

    import __spark_entry__ as E
    from astrospark.ops.events import trailing_window_agg

    _write_ntz_events(
        str(tmp_path), ["2024-03-09T12:00:00", "2024-03-10T12:30:00"]
    )

    key = "spark.sql.session.timeZone"
    prev = spark.conf.get(key)
    results = {}
    try:
        for tz in ("America/New_York", "UTC"):
            spark.conf.set(key, tz)
            rows = trailing_window_agg(spark, str(tmp_path)).collect()
            # the op must restore the caller's session TZ
            assert spark.conf.get(key) == tz
            results[tz] = sorted(
                (r.event_id, r.user_id, r.n_trail_1d, r.cents_trail_1d, r.is_burst)
                for r in rows
            )
    finally:
        spark.conf.set(key, prev)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{tmp_path}/events.parquet'"
    )
    oracle = sorted(
        tuple(r) for r in con.execute(E.oracle_sql()["trailing_window_agg"]).fetchall()
    )
    assert results["America/New_York"] == results["UTC"] == oracle
    # the fixture is sharp: the second event's frame holds ONLY itself
    # (an unpinned NY session would count 2 — the 23.5h compressed gap)
    assert results["UTC"][1][2] == 1


def test_event_buckets_constant_offset_session_tz(spark, tmp_path):
    """Hour/day bucketing ops need UTC pinning even for CONSTANT
    session-TZ offsets (a +05:45 zone shifts every bucket boundary):
    w1_event_windows' hour buckets and cohort_retention's day buckets
    must equal the naive-epoch buckets under Asia/Kathmandu."""
    from astrospark.ops.events import cohort_retention, w1_event_windows

    # one event 10 min before an hour/day boundary, one 10 min after
    _write_ntz_events(
        str(tmp_path),
        ["2024-01-02T23:50:00", "2024-01-03T00:10:00"],
        users=[1, 2],
    )
    key = "spark.sql.session.timeZone"
    prev = spark.conf.get(key)
    try:
        spark.conf.set(key, "Asia/Kathmandu")
        hours = sorted(
            r.hour_bucket for r in w1_event_windows(spark, str(tmp_path)).collect()
        )
        days = sorted(
            r.cohort_day for r in cohort_retention(spark, str(tmp_path)).collect()
        )
    finally:
        spark.conf.set(key, prev)
    import datetime as dt

    epoch = dt.timezone.utc
    e1 = int(dt.datetime(2024, 1, 2, 23, 50, tzinfo=epoch).timestamp())
    e2 = int(dt.datetime(2024, 1, 3, 0, 10, tzinfo=epoch).timestamp())
    assert hours == sorted({e1 // 3600, e2 // 3600})
    assert days == sorted({e1 // 86400, e2 // 86400})
