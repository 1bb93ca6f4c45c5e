"""Event-stream operators over the events table: time-window aggregation,
gap-based sessionization, and JSON scalar extraction — the generic
pipeline capabilities a training-data ingestion system needs around the
extraction core. All portable to the DuckDB oracle (epoch-bucket windows,
lag/sum window functions, json string extraction).

Every op that maps the NTZ ``ts`` column to epoch integers
(``unix_micros`` / ``unix_timestamp``) is ``@_utc_pinned``: the mapping
runs under a scoped UTC session TZ (engine/session.utc_scope), so
``unix_micros ≡ DuckDB epoch_us`` EXACTLY for any caller session. The
previous contract — "the session-TZ offset cancels inside frame bounds /
differences" — is only true for constant offsets; under a DST-transitioning
session TZ the wall→epoch map is non-linear and a trailing RANGE frame
flips near the transition (r4 post-mortem; regression fixture in
tests/test_range_skew.py). Bucketing ops (hour/day DIV) need UTC even for
constant offsets."""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from astrospark.engine.session import utc_scope
from astrospark.ops.caching import scoped_persist

SESSION_GAP_MIN = 30


def _utc_pinned(fn):
    """Build the op's whole plan under a scoped UTC session TZ (eager
    PySpark analysis bakes the zone into every cast/unix_* expression;
    the caller's conf is restored before returning)."""

    @functools.wraps(fn)
    def wrapper(spark, sf_dir, *args, **kwargs):
        with utc_scope(spark):
            return fn(spark, sf_dir, *args, **kwargs)

    return wrapper


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


@_utc_pinned
def w1_event_windows(spark, sf_dir) -> DataFrame:
    """Tumbling 1-hour windows per event_type: counts + value sums."""
    e = _events(spark, sf_dir)
    hour = F.floor(F.unix_timestamp("ts") / 3600).cast("bigint")
    return (
        e.groupBy(hour.alias("hour_bucket"), "event_type")
        .agg(
            F.count("*").cast("int").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


@_utc_pinned
def w2_user_sessions(spark, sf_dir) -> DataFrame:
    """Gap-based sessionization: a session breaks after >30 min idle;
    output = sessions per user (lag + running sum of break flags)."""
    e = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    flagged = e.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > SESSION_GAP_MIN * 60), 1).otherwise(0),
    )
    return (
        flagged.groupBy("user_id")
        .agg(F.sum("new_session").cast("int").alias("n_sessions"),
             F.count("*").cast("int").alias("n_events"))
    )


def f_json_extract(spark, sf_dir) -> DataFrame:
    """JSON scalar extraction from the props column, aggregated."""
    e = _events(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        e.groupBy("event_type")
        .agg(
            F.round(F.avg(k), 4).alias("avg_k"),
            F.max(k).cast("int").alias("max_k"),
        )
    )


@_utc_pinned
def asof_attribution(spark, sf_dir) -> DataFrame:
    """As-of join: attribute every purchase to the user's most recent
    click at-or-before it (last-touch attribution) — the point-in-time
    join Spark has no native operator for, composed as union + ordered
    window instead of the naive per-user join-then-filter.

    Shape: clicks and purchases UNION into one stream tagged by role,
    shuffle ONCE on user_id, and a single ordered window pass carries
    the last click forward (``last(..., ignorenulls)`` over rows
    unbounded-preceding..current). Ordering is (event time, role) with
    clicks first, so a click at the purchase's exact instant matches —
    the inclusive ``ts_click <= ts_purchase`` ASOF semantic. The naive
    alternative (join all clicks to all purchases per user, keep max)
    multiplies rows by per-user click counts and melts on power users;
    the union+window shape is linear per user and sort-merges at scale.

    Clicks are pre-collapsed to one row per (user_id, ts) (max event_id)
    so the as-of winner at a tied instant is well-defined in both
    engines; the DuckDB oracle replays with its native ASOF LEFT JOIN.
    Times compare as microsecond integers (timezone-free differences);
    purchases with no prior click keep NULL-free sentinels (-1).
    """
    e = _events(spark, sf_dir)
    # parquet ts loads as TIMESTAMP_NTZ; @_utc_pinned makes the cast a
    # pure reinterpretation, so t_us == DuckDB epoch_us exactly
    t_us = F.unix_micros(F.col("ts").cast("timestamp"))
    clicks = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
        .select(
            "user_id",
            t_us.alias("t_us"),
            "click_id",
            F.lit(0).alias("is_probe"),
            F.lit(None).cast("long").alias("purchase_id"),
        )
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        t_us.alias("t_us"),
        F.lit(None).cast("long").alias("click_id"),
        F.lit(1).alias("is_probe"),
        F.col("event_id").alias("purchase_id"),
    )
    stream = clicks.unionByName(purchases)
    w = (
        Window.partitionBy("user_id")
        .orderBy("t_us", "is_probe")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    last_click_id = F.last("click_id", ignorenulls=True).over(w)
    last_click_t = F.last(
        F.when(F.col("is_probe") == 0, F.col("t_us")), ignorenulls=True
    ).over(w)
    return (
        stream.withColumn("lc_id", last_click_id)
        .withColumn("lc_t", last_click_t)
        .filter(F.col("is_probe") == 1)
        .select(
            "purchase_id",
            "user_id",
            F.coalesce("lc_id", F.lit(-1)).cast("bigint").alias("click_id"),
            F.coalesce(F.col("t_us") - F.col("lc_t"), F.lit(-1))
            .cast("bigint")
            .alias("gap_us"),
        )
    )


# --- point-in-interval join -------------------------------------------------

INCIDENT_WINDOW_US = 3_600_000_000  # 1 hour, in microseconds


def point_in_interval_join(
    probe: DataFrame,
    intervals: DataFrame,
    t_col: str = "t_us",
    lo_col: str = "lo_us",
    hi_col: str = "hi_us",
    bucket_us: int = INCIDENT_WINDOW_US,
) -> DataFrame:
    """Generic point-in-interval equi-join: match every probe row whose
    integer time ``t_col`` falls inside ``[lo_col, hi_col]`` (inclusive)
    of an interval row — the range-join shape Spark has no native
    operator for.

    The naive formulation ``probe.join(intervals, (lo <= t) & (t <= hi))``
    has no equi-key, so Catalyst plans BroadcastNestedLoopJoin (or a
    cartesian) — O(|probe| x |intervals|) and a broadcast-size bomb at
    scale. This composition quantizes time into buckets of width
    ``bucket_us``: each interval explodes to the distinct buckets it
    covers (``ceil(len/bucket) + 1`` rows — 2 when interval length <=
    bucket width), the probe side computes its single bucket for free,
    and the join becomes a plain equi-join on the bucket key (shuffle
    hash / sort-merge — scales linearly, AQE-skew-splittable) followed
    by the exact range filter. A probe row's one bucket matches at most
    one exploded row per interval, so no post-join dedup is needed.

    Same decomposition DuckDB/Trino docs call the "binned range join";
    the oracle replays it as a plain inequality join.
    """
    t, lo, hi = F.col(t_col), F.col(lo_col), F.col(hi_col)
    b = F.lit(int(bucket_us))
    exploded = intervals.withColumn(
        "_bucket",
        F.explode(F.sequence(F.floor(lo / b), F.floor(hi / b))),
    )
    probed = probe.withColumn("_bucket", F.floor(t / b))
    return (
        probed.join(exploded, on="_bucket", how="inner")
        .filter((lo <= t) & (t <= hi))
        .drop("_bucket")
    )


@_utc_pinned
def interval_join(spark, sf_dir) -> DataFrame:
    """Incident enrichment: for each error event, how many purchases
    (and how much purchase value) landed in the hour that followed —
    the point-in-interval join realized as a bucketed equi-join (see
    point_in_interval_join). Times compare as microsecond integers, so
    the session-TZ offset introduced by the NTZ->timestamp cast cancels
    inside the join predicate; money sums as exact integer cents
    (order-independent across engines).
    """
    e = _events(spark, sf_dir)
    t_us = F.unix_micros(F.col("ts").cast("timestamp"))
    intervals = e.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("interval_id"),
        t_us.alias("lo_us"),
        (t_us + F.lit(INCIDENT_WINDOW_US)).alias("hi_us"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        t_us.alias("t_us"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    pairs = point_in_interval_join(purchases, intervals)
    return pairs.groupBy("interval_id").agg(
        F.count("*").cast("int").alias("n_purchases"),
        F.sum("cents").alias("purchase_cents"),
    )


# --- sequential funnel ------------------------------------------------------

FUNNEL_STAGES = ("signup", "click", "purchase")


@_utc_pinned
def funnel_stages(spark, sf_dir) -> DataFrame:
    """Ordered-funnel analysis: how far does each user get through
    signup -> click -> purchase, where each stage must occur AT OR
    AFTER the user's entry into the previous stage? The stage-k entry
    time is min(ts of stage-k events >= entry(k-1)) — the standard
    sequential-conversion semantic (a click before your signup does not
    count). Output: one row per reached stage with the user count —
    monotone non-increasing by construction.

    Shape: ONE shuffle of (user_id, stage minima) partials — the three
    stage-entry times fold in a single groupBy pass using conditional
    aggregation over the per-user sorted event array (sort_array over
    collect_list, then three aggregate() folds — all JVM higher-order
    functions, no UDF, no self-join, no re-shuffle per stage). Per-user
    state is that user's event list — the same per-key working set any
    sessionization carries; the final stage rollup is 4 rows.

    Cross-engine: timestamps compare as microsecond integers (NTZ
    offset cancels); the DuckDB oracle replays the same semantic with
    three chained conditional-min CTEs (engine-idiomatic, identical
    result by the associativity of min-over-threshold).
    """
    e = _events(spark, sf_dir)
    t_us = F.unix_micros(F.col("ts").cast("timestamp"))
    evs = (
        e.filter(F.col("event_type").isin(*FUNNEL_STAGES))
        .select(
            "user_id",
            t_us.alias("t"),
            F.col("event_type").alias("et"),
        )
        .groupBy("user_id")
        .agg(F.sort_array(F.collect_list(F.struct("t", "et"))).alias("evs"))
    )

    def entry_after(prev_col, stage):
        # min t of `stage` events with t >= prev entry; BIGINT sentinel
        # when the stage is never reached (propagates: >= sentinel fails)
        return F.aggregate(
            "evs",
            F.lit(2**62).cast("long"),
            lambda acc, x: F.when(
                (x["et"] == stage) & (x["t"] >= prev_col) & (x["t"] < acc), x["t"]
            ).otherwise(acc),
        )

    staged = (
        evs.withColumn("s1", entry_after(F.lit(0).cast("long"), FUNNEL_STAGES[0]))
        .withColumn("s2", entry_after(F.col("s1"), FUNNEL_STAGES[1]))
        .withColumn("s3", entry_after(F.col("s2"), FUNNEL_STAGES[2]))
    )
    sentinel = F.lit(2**62).cast("long")
    stage_n = (
        F.when(F.col("s3") < sentinel, 3)
        .when(F.col("s2") < sentinel, 2)
        .when(F.col("s1") < sentinel, 1)
        .otherwise(0)
    )
    per_user = staged.select(stage_n.alias("max_stage"))
    return (
        per_user.groupBy("max_stage")
        .agg(F.count("*").cast("int").alias("n_users"))
    )


COHORT_DAY_US = 86_400_000_000  # cohort bucket: one day, in microseconds


@_utc_pinned
def cohort_retention(spark, sf_dir) -> DataFrame:
    """Cohort retention matrix: bucket each user into the cohort of
    their FIRST event day, then count users active at each day offset
    from their cohort and the retained fraction — the standard "day-N
    retention" table every growth/engagement dashboard runs, here over
    the events stream.

    Scale shape: (user_id, day) is DISTINCT'd FIRST (one partial-agg
    shuffle — collapses per-user event bursts before anything else
    touches them), so every later count is a plain count(*), never an
    exact countDistinct expand. The first-event aggregation and the
    activity join share the user_id key; the final aggregation shuffles
    the tiny (day x offset) space, and the cohort size is read off that
    SAME frame with a window over cohort_day (every cohort has its
    offset-0 row by construction) — no extra join. The distinct
    user-day frame feeds both the join and the first-event aggregation,
    so it is scoped-persisted: the events scan + burst collapse run
    ONCE (plan-pinned single parquet scan), not once per consumer.
    Retention = n_active / cohort_size on identical integers, so
    round(x, 4) replays bit-exact in the DuckDB oracle.
    """
    e = (
        _events(spark, sf_dir)
        .select(
            "user_id",
            F.expr(
                f"unix_micros(cast(ts as timestamp)) div {COHORT_DAY_US}"
            ).alias("day"),
        )
        .distinct()
    )
    e = scoped_persist(e)
    first = e.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    act = (
        e.join(first, "user_id")
        .select("cohort_day", (F.col("day") - F.col("cohort_day")).alias("day_offset"))
        .groupBy("cohort_day", "day_offset")
        .agg(F.count("*").cast("int").alias("n_active"))
    )
    cohort_size = F.max(
        F.when(F.col("day_offset") == 0, F.col("n_active"))
    ).over(Window.partitionBy("cohort_day"))
    return act.select(
        F.col("cohort_day").cast("int").alias("cohort_day"),
        F.col("day_offset").cast("int").alias("day_offset"),
        "n_active",
        F.round(F.col("n_active") / cohort_size, 4).alias("retention"),
    )


# --- trailing RANGE-frame window features -----------------------------------

TRAIL_WINDOW_US = 86_400_000_000  # trailing 24 h, in microseconds
TRAIL_BURST_N = 4                 # events in-window at/above which = burst


@_utc_pinned
def trailing_window_agg(spark, sf_dir) -> DataFrame:
    """Per-event trailing-24h activity features over each user's event
    stream — the sliding RANGE-frame family (velocity / rate-limit /
    fraud features: "how many events, and how much value, did this user
    produce in the day ENDING at this event?"). The tumbling buckets of
    w1_event_windows answer the per-hour rollup; this answers the
    per-EVENT question, where every row gets its own look-back frame.

    Scale shape: ONE user_id exchange feeding a spillable window sort;
    the RANGE frame [t - W, t] evaluates as a sliding two-pointer pass
    per partition (Spark's bounded-frame WindowExec) — no self-join, no
    explode, rows never multiply, state is the in-frame aggregate only.
    Times compare as microsecond integers (@_utc_pinned ⇒ unix_micros ≡
    DuckDB epoch_us EXACTLY — offset "cancellation" is not relied on,
    since a DST-transitioning session TZ breaks it; r4 post-mortem +
    tests/test_range_skew.py DST fixture). Peer rows with equal
    timestamps enter the frame TOGETHER in both engines (RANGE includes
    all peers — ANSI), so ties need no tie-break column. Value
    accumulates as exact integer cents (order-free), and the burst flag
    compares integers — every output replays bit-for-bit in DuckDB's
    RANGE window.
    """
    e = _events(spark, sf_dir)
    base = e.select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t_us"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t_us")
        .rangeBetween(-TRAIL_WINDOW_US, Window.currentRow)
    )
    return base.select(
        "event_id",
        "user_id",
        F.count("*").over(w).cast("int").alias("n_trail_1d"),
        F.sum("cents").over(w).alias("cents_trail_1d"),
    ).withColumn(
        "is_burst", (F.col("n_trail_1d") >= TRAIL_BURST_N).cast("int")
    )


SCD2_OPEN_US = -1  # sentinel for a still-open validity interval


@_utc_pinned
def scd2_intervals(spark, sf_dir) -> DataFrame:
    """Type-2 slowly-changing-dimension build from a change stream — the
    CDC-compaction primitive every warehouse ingestion pipeline runs:
    each user's event stream is read as a sequence of state changes
    (``event_type`` = the dimension attribute), consecutive no-change
    rows collapse, and every surviving change opens a validity interval
    ``[valid_from, valid_to)`` closed by the next change (the newest
    interval stays open). Downstream point-in-time joins then hit ONE
    row per (user, as-of time) instead of replaying the raw stream.

    Shape for scale: ONE user_id exchange serves every window in the
    op — the per-user epoch base (unordered min), the change detection
    (``lag`` over (t_us, event_id)), and, on the collapsed rows, the
    version numbering and interval close (``row_number`` + ``lead``
    over the same key/order). The filter between the two window passes
    preserves the hash distribution, so Spark plans zero additional
    Exchanges; state per user is O(1) per pass and rows never multiply.
    The naive alternative — self-join "next change after t" — is a
    per-user quadratic that melts on power users.

    Cross-engine exactness: times are emitted RELATIVE to each user's
    first event (``t_us - min(t_us) OVER user``) and @_utc_pinned makes
    ``unix_micros`` ≡ ``epoch_us`` outright, so the relative times match
    bit-for-bit; ties on equal timestamps break on the
    integer event_id in both engines; the open interval is the integer
    sentinel ``SCD2_OPEN_US`` (never NULL, so hashes agree).
    """
    e = _events(spark, sf_dir)
    b = e.select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t_us"),
        F.col("event_type").alias("state"),
    )
    part = Window.partitionBy("user_id")
    w = part.orderBy("t_us", "event_id")
    r = b.select(
        "user_id",
        "event_id",
        "state",
        (F.col("t_us") - F.min("t_us").over(part)).alias("rel_us"),
        F.lag("state").over(w).alias("prev_state"),
    )
    changes = r.filter(
        F.col("prev_state").isNull() | (F.col("prev_state") != F.col("state"))
    )
    wc = Window.partitionBy("user_id").orderBy("rel_us", "event_id")
    nxt = F.lead("rel_us").over(wc)
    return changes.select(
        "user_id",
        "event_id",
        "state",
        F.row_number().over(wc).cast("int").alias("version"),
        F.col("rel_us").alias("valid_from_us"),
        F.coalesce(nxt, F.lit(SCD2_OPEN_US)).alias("valid_to_us"),
        nxt.isNull().cast("int").alias("is_current"),
    )


TRANS_PROB_SCALE = 1_000_000  # transition probability fixed point


@_utc_pinned
def event_transitions(spark, sf_dir) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences — the behavior-modeling primitive (what follows what?)
    behind session simulation, anomaly scoring, and next-event
    prediction baselines. Each user's events are ordered by time and
    consecutive (state -> next state) steps are counted corpus-wide,
    with the row-conditional probability P(to | from) emitted as an
    exact integer rate.

    Shape for scale: ONE user_id exchange feeds the lead() window
    (per-user O(1) state), then the step stream collapses via a
    map-side-combined aggregate whose key space is bounded by
    |event_type|^2 — a few dozen cells regardless of corpus size; the
    per-from totals are a window over that tiny cell frame, costing
    nothing. The naive formulation — self-join events on "next event
    of the same user" — is per-user quadratic and melts on power
    users; lead() is linear and never multiplies rows.

    Cross-engine exactness: ordering ties on equal timestamps break on
    the integer event_id in both engines; counts are exact integers
    and prob_q = (SCALE * n_trans) DIV n_from never materializes a
    fraction.
    """
    e = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(
        F.unix_micros(F.col("ts").cast("timestamp")), "event_id"
    )
    steps = (
        e.select(
            "user_id",
            "event_id",
            "ts",
            F.col("event_type").alias("from_state"),
            F.lead("event_type").over(w).alias("to_state"),
        )
        .filter(F.col("to_state").isNotNull())
    )
    cells = steps.groupBy("from_state", "to_state").agg(
        F.count("*").alias("n_trans")
    )
    wfrom = Window.partitionBy("from_state")
    return cells.select(
        "from_state",
        "to_state",
        "n_trans",
        F.sum("n_trans").over(wfrom).alias("n_from"),
        F.expr(f"{TRANS_PROB_SCALE}L * n_trans DIV sum(n_trans) OVER "
               "(PARTITION BY from_state)").alias("prob_q"),
    )
