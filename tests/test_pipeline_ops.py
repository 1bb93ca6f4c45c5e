"""Hand-computed semantics tests for the round-3 pipeline additions:
DSIR importance weights, source-level quality gating, and the as-of
attribution join. The contract checker proves Spark≡DuckDB; these pin
the values against independent scalar replays (hashlib / pandas
merge_asof), so both engines can't drift together."""

import io
from contextlib import redirect_stdout

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def test_importance_weights_python_replay(spark):
    """Full scalar replay: hashlib md5 word buckets, add-one integer
    ratio weights, per-doc integer sums — every step exact."""
    import hashlib
    from collections import Counter, defaultdict

    from astrospark.ops.text import DECON_EVAL_MOD, DSIR_SCALE, importance_weights

    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    t_cnt: Counter = Counter()
    r_cnt: Counter = Counter()
    doc_buckets = defaultdict(list)
    for r in docs:
        is_tgt = r.doc_id % DECON_EVAL_MOD == 0
        for w in r.text.split(" "):
            b = int(hashlib.md5(w.encode()).hexdigest()[:4], 16)
            (t_cnt if is_tgt else r_cnt)[b] += 1
            if not is_tgt:
                doc_buckets[r.doc_id].append(b)
    expected = {}
    for doc_id, buckets in doc_buckets.items():
        imp = sum((t_cnt[b] + 1) * DSIR_SCALE // (r_cnt[b] + 1) for b in buckets)
        expected[doc_id] = (len(buckets), imp, imp // len(buckets))

    got = {
        r.doc_id: (r.n_words, r.importance, r.importance_avg)
        for r in importance_weights(spark, SF).collect()
    }
    assert got == expected
    # eval/target docs are scored-against, never scored
    assert all(doc_id % DECON_EVAL_MOD != 0 for doc_id in got)


def test_importance_weights_broadcast_plan(spark):
    """The 2^16-row weight table broadcasts back onto the word stream —
    never a shuffled join on the bucket key, never a cross product."""
    from astrospark.ops.text import importance_weights

    plan = _plan(importance_weights(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_source_gate_python_replay(spark):
    """Exact integer rule replay (sum_chars >= THR * n_docs) and the
    domain-level invariant: every doc of a source shares one verdict,
    and the gate genuinely splits the corpus's sources."""
    from collections import defaultdict

    from astrospark.ops.text import SRC_MIN_MEAN_CHARS, source_quality_gate

    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "source", "n_chars")
        .collect()
    )
    sums = defaultdict(lambda: [0, 0])  # source -> [n_docs, sum_chars]
    for r in docs:
        sums[r.source][0] += 1
        sums[r.source][1] += r.n_chars
    expected_kept = {
        s: int(sc >= SRC_MIN_MEAN_CHARS * n) for s, (n, sc) in sums.items()
    }

    rows = source_quality_gate(spark, SF).collect()
    assert len(rows) == len(docs)
    for r in rows:
        assert r.src_kept == expected_kept[r.source]
        assert r.src_docs == sums[r.source][0]
    verdicts = set(expected_kept.values())
    assert verdicts == {0, 1}  # threshold splits: both kept and dropped sources


def test_source_gate_broadcast_plan(spark):
    """The per-source verdict table (tiny dim) broadcasts back onto the
    corpus scan — the second pass over documents never shuffles."""
    from astrospark.ops.text import source_quality_gate

    plan = _plan(source_quality_gate(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_asof_attribution_pandas_replay(spark):
    """Independent oracle: pandas merge_asof (backward, exact matches
    allowed) over the same collapsed click stream reproduces every
    attribution row, including the no-prior-click sentinels."""
    import pandas as pd

    from astrospark.ops.events import asof_attribution

    ev = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    clicks = (
        ev[ev.event_type == "click"]
        .groupby(["user_id", "ts"], as_index=False)
        .agg(click_id=("event_id", "max"))
        .sort_values("ts")
    )
    purchases = (
        ev[ev.event_type == "purchase"][["event_id", "user_id", "ts"]]
        .rename(columns={"event_id": "purchase_id"})
        .sort_values("ts")
    )
    merged = pd.merge_asof(
        purchases,
        clicks,
        on="ts",
        by="user_id",
        direction="backward",
        allow_exact_matches=True,
        suffixes=("", "_c"),
    )
    # clicks lose their ts in merge_asof; recover it for the gap
    click_ts = clicks.set_index("click_id").ts
    expected = {}
    for r in merged.itertuples():
        if pd.isna(r.click_id):
            expected[r.purchase_id] = (r.user_id, -1, -1)
        else:
            gap = (r.ts - click_ts[r.click_id]).value  # ns
            expected[r.purchase_id] = (r.user_id, int(r.click_id), gap // 1000)

    got = {
        r.purchase_id: (r.user_id, r.click_id, r.gap_us)
        for r in asof_attribution(spark, SF).collect()
    }
    assert got == expected
    assert any(v[1] == -1 for v in got.values())  # sentinel path exercised
    assert any(v[1] != -1 for v in got.values())  # matched path exercised


def test_asof_attribution_plan_no_blowup(spark):
    """The union+window shape never multiplies rows: no cross product,
    no nested-loop join, and the window sort partitions on user_id (the
    linear per-user pass), not a global range sort."""
    from astrospark.ops.events import asof_attribution

    plan = _plan(asof_attribution(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" not in plan  # there is no join at all
    assert "rangepartitioning" not in plan.lower()
