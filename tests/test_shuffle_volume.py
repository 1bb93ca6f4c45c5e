"""Measured shuffle volume — the docstring claims ("map-side combine
bounds the shuffle to sketch cells, not rows") turned into numbers read
off the executed plan's Exchange metrics (shuffleRecordsWritten /
shuffleBytesWritten). AQE is disabled during measurement so the plan
tree is the static one; every op still computes its normal result.

At sf0.001 the corpus explodes to ~28k word occurrences; the mergeable
sketch family must put only CELLS through its exchanges — two orders
of magnitude less — or the 100 TB story is fiction."""

import pytest

SF = "/root/testdata/sf0.001"
N_SOURCES = 20


def _exchanges(df):
    """Execute and return [(records, bytes)] for every Exchange node."""
    df.collect()
    out = []

    def walk(n):
        if n.nodeName() == "Exchange":
            m, it = {}, n.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                m[kv._1()] = kv._2().value()
            out.append(
                (m.get("shuffleRecordsWritten"), m.get("shuffleBytesWritten"))
            )
        ch = n.children()
        for i in range(ch.size()):
            walk(ch.apply(i))

    walk(df._jdf.queryExecution().executedPlan())
    return out


@pytest.fixture()
def no_aqe(spark):
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    yield spark
    spark.conf.set("spark.sql.adaptive.enabled", "true")


def _occurrences(spark):
    from pyspark.sql import functions as F

    d = spark.read.parquet(f"{SF}/documents.parquet")
    return d.select(F.explode(F.split("text", " "))).count()


def test_sketch_family_exchanges_carry_cells_not_rows(no_aqe):
    """Count-min, quantile sketch, HLL, bottom-k, and the overlap
    estimator: no exchange may carry more than the sketch-cell bound —
    and every one is >=20x below the exploded word-occurrence volume."""
    from astrospark.ops import text as T

    spark = no_aqe
    occ = _occurrences(spark)
    assert occ > 20_000  # the corpus genuinely explodes

    bounds = {
        # (op, per-exchange record bound)
        "heavy_hitters_cmsketch": (T.heavy_hitters_cmsketch, 4 * 64 * 8 + 200),
        "quantile_sketch": (T.quantile_sketch, N_SOURCES * 64),
        "hll_distinct_words": (T.hll_distinct_words, N_SOURCES * 64),
        "bottomk_sample": (T.bottomk_sample, N_SOURCES * 5 * 8),
    }
    for name, (fn, bound) in bounds.items():
        exs = _exchanges(fn(spark, SF))
        assert exs, name
        worst = max(r for r, _ in exs)
        assert worst <= bound, (name, exs)
        assert worst <= occ / 20, (name, worst, occ)


def test_overlap_and_funnel_exchanges_bounded(no_aqe):
    """overlap_bottomk's corpus-sized stage is the distinct
    (source, word) pass — bounded by vocabulary, not occurrences;
    everything after rides sketch rows. The funnel's exchanges carry
    only per-user partials + the 4-row stage rollup."""
    from astrospark.ops.events import funnel_stages
    from astrospark.ops.text import overlap_bottomk

    spark = no_aqe
    occ = _occurrences(spark)
    for r, _ in _exchanges(overlap_bottomk(spark, SF)):
        assert r <= occ / 20, r
    for r, _ in _exchanges(funnel_stages(spark, SF)):
        assert r <= 200, r


def test_bottomk_window_group_limit_is_effective(no_aqe):
    """The WindowGroupLimit claim, measured: the single exchange ships
    exactly the per-partition local bottom-k — sources x k records at
    one input partition per source-slice, nowhere near the 2000-doc
    corpus."""
    from astrospark.ops.text import bottomk_sample

    exs = _exchanges(bottomk_sample(no_aqe, SF))
    assert len(exs) == 1
    records, nbytes = exs[0]
    assert records <= N_SOURCES * 5 * 8  # sources x k x max input splits
    assert records < 2000 / 4  # corpus never crosses the wire
    assert nbytes < 64 * 1024


def test_window_ops_survive_external_buffering(spark):
    """Spill-path invariance: with the window operator's in-memory
    buffer capped at 50 rows (everything beyond routes through the
    external UnsafeExternalSorter — the code path that spills to disk
    under real memory pressure), the sort-heavy window ops return
    byte-identical results. Disk-spill byte counters need static task
    configs this session can't flip; routing through the external
    buffer is the runtime-testable half of the spill story."""
    from astrospark.ops.text import bottomk_sample, ntile_histogram

    sf = "/root/testdata/sf0.01"
    confs = {
        "spark.sql.windowExec.buffer.in.memory.threshold": "50",
        "spark.sql.windowExec.buffer.spill.threshold": "50",
        "spark.sql.windowGroupLimit.enabled": "false",  # force full window path
    }
    base = {
        "ntile": sorted(map(tuple, ntile_histogram(spark, sf).collect())),
        "bottomk": sorted(map(tuple, bottomk_sample(spark, sf).collect())),
    }
    saved = {}
    for key, val in confs.items():
        try:
            saved[key] = spark.conf.get(key)
        except Exception:
            saved[key] = None
        spark.conf.set(key, val)
    try:
        assert sorted(map(tuple, ntile_histogram(spark, sf).collect())) == base["ntile"]
        assert (
            sorted(map(tuple, bottomk_sample(spark, sf).collect())) == base["bottomk"]
        )
    finally:
        for key, val in saved.items():
            if val is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, val)


def test_bpe_exchanges_vocab_bounded_not_corpus(no_aqe):
    """bpe_merges' central claim measured: pair statistics flow through
    the word-frequency table, so NO exchange carries the exploded
    occurrence stream — the widest shuffle is the vocab-keyed count agg
    (31 distinct words / 82 distinct pairs at sf0.001 vs ~28k
    occurrences)."""
    from pyspark.sql import functions as F

    from astrospark.ops import text as T
    from astrospark.ops.caching import release_caches

    spark = no_aqe
    occ = _occurrences(spark)
    d = spark.read.parquet(f"{SF}/documents.parquet")
    vocab = (
        d.select(F.explode(F.split("text", " ")).alias("w"))
        .filter("w <> ''")
        .distinct()
        .count()
    )
    exs = _exchanges(T.bpe_merges(spark, SF))
    release_caches()
    assert exs
    worst = max(r for r, _ in exs)
    # generous task-partial slack on the vocab bound; the point is the
    # order-of-magnitude gap to the occurrence stream
    assert worst <= vocab * 64 + 200, (worst, vocab)
    assert worst <= occ / 10, (worst, occ)


def test_bigram_lm_aggregate_exchanges_bounded(no_aqe):
    """bigram_lm_score: the count aggregates put only (bigram|context)
    vocabulary partials through their exchanges, never the exploded
    bigram stream; the per-doc mean exchange is bounded by the doc
    count."""
    from pyspark.sql import functions as F

    from astrospark.ops import text as T

    spark = no_aqe
    occ = _occurrences(spark)
    d = spark.read.parquet(f"{SF}/documents.parquet")
    n_docs = d.count()
    n_bigram_vocab = (
        d.select(F.split("text", " ").alias("ws"))
        .filter(F.size("ws") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(2, size(ws)), i -> struct("
                    "element_at(ws, i - 1) AS w1, element_at(ws, i) AS w2))"
                )
            ).alias("b")
        )
        .select("b.w1", "b.w2")
        .distinct()
        .count()
    )
    exs = _exchanges(T.bigram_lm_score(spark, SF))
    assert exs
    worst = max(r for r, _ in exs)
    assert worst <= max(n_bigram_vocab * 64, n_docs * 8) + 200, (
        worst,
        n_bigram_vocab,
        n_docs,
    )
    # the synthetic corpus has an unusually rich bigram vocabulary, so
    # the gap to the exploded stream is smaller than the sketch family's
    # — but still a multiple, and it GROWS with corpus size (vocab
    # saturates, occurrences don't)
    assert worst <= occ / 5, (worst, occ)


def test_zscore_and_decontaminate_exchanges_bounded(no_aqe):
    """quality_zscore's single exchange carries source-moment partials
    (|sources| x task slack), never doc rows; semantic_decontaminate's
    single exchange carries at most one argmax partial per training
    vector — the eval cross-expansion (n_train x n_eval rows) never
    shuffles."""
    from astrospark.ops import similarity as S
    from astrospark.ops import text as T

    spark = no_aqe
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()

    exs = _exchanges(T.quality_zscore(spark, SF))
    assert len(exs) == 1, exs  # the moment agg; the join side broadcasts
    assert exs[0][0] <= N_SOURCES * 64, exs
    assert exs[0][0] <= n_docs / 10, (exs, n_docs)

    from astrospark.ops.similarity import EVAL_STRIDE

    n_vecs = spark.read.parquet(f"{SF}/embeddings.parquet").count()
    n_eval = sum(1 for _ in range(0, n_vecs, EVAL_STRIDE))
    n_train = n_vecs - n_eval
    exs = _exchanges(S.semantic_decontaminate(spark, SF))
    assert len(exs) == 1, exs  # the argmax agg; the eval side broadcasts
    # per-task partial slack over the one-row-per-vector ideal
    assert exs[0][0] <= n_train * 8, (exs, n_train)
    # and far below the broadcast-join expansion it collapses
    assert exs[0][0] <= n_train * n_eval / 5, (exs, n_train, n_eval)


def test_boilerplate_report_is_take_ordered(no_aqe):
    """boilerplate_ngrams' top-k must compile to TakeOrderedAndProject
    (no global-sort exchange); the gram exchanges carry distinct
    (gram, doc) partials, bounded by the occurrence stream."""
    from astrospark.ops import text as T

    spark = no_aqe
    occ = _occurrences(spark)
    df = T.boilerplate_ngrams(spark, SF)
    exs = _exchanges(df)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    big = [r for r, _ in exs if r > 100]
    assert len(big) == 2, exs  # the two-phase partial-distinct pair
    assert all(r <= occ * 2 for r in big), (big, occ)
