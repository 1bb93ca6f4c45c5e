"""Hand-computed semantics tests for the repetition quality filters
(Gopher/MassiveText rules, Rae et al. 2021 Table A1). The contract
checker proves Spark≡DuckDB; these pin the *values* against arithmetic
done by hand, so both engines can't drift together."""

import pytest


@pytest.fixture(scope="module")
def rep_rows(spark, tmp_path_factory):
    docs = [
        # "a b a b a b": bigram "a b"×3 (len 3) → 9/11 chars = 0.8182;
        # trigrams 4 total / 2 distinct → dup 0.5  → flagged
        (0, "a b a b a b"),
        # single word: no bigrams, no trigrams → 0.0/0.0, not flagged
        (1, "hello"),
        # empty text: n_chars=0 guard → 0.0/0.0, not flagged
        (2, ""),
        # all-distinct words: top bigram appears once; trigrams unique.
        # "alpha beta gamma delta epsilon" n_chars=30, longest bigram
        # "delta epsilon" → max(cnt*len)=1*13
        # → 13/30 = 0.4333 (>0.18 — tiny docs trip the char-frac rule by
        # construction; Gopher applies it to web-scale docs); dup_tri 0.0
        (3, "alpha beta gamma delta epsilon"),
        # exactly two words, repeated trigram threshold edge: 3 words
        # "x y x": bigrams "x y","y x" ×1 → max 3/5=0.6; 1 trigram,
        # distinct → dup 0.0
        (4, "x y x"),
    ]
    d = tmp_path_factory.mktemp("repdocs")
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        str(d / "documents.parquet")
    )
    from astrospark.ops.text import repetition_filters

    out = repetition_filters(spark, str(d)).collect()
    return {r.doc_id: r for r in out}


def test_repeated_bigram_doc_flagged(rep_rows):
    r = rep_rows[0]
    assert r.top_bigram_char_frac == pytest.approx(round(9 / 11, 4))
    assert r.dup_trigram_frac == pytest.approx(0.5)
    assert r.rep_flagged == 1


def test_single_word_and_empty_not_flagged(rep_rows):
    for doc_id in (1, 2):
        r = rep_rows[doc_id]
        assert r.top_bigram_char_frac == 0.0
        assert r.dup_trigram_frac == 0.0
        assert r.rep_flagged == 0


def test_distinct_words_no_trigram_dup(rep_rows):
    r = rep_rows[3]
    assert r.top_bigram_char_frac == pytest.approx(round(13 / 30, 4))
    assert r.dup_trigram_frac == 0.0
    r4 = rep_rows[4]
    assert r4.top_bigram_char_frac == pytest.approx(0.6)
    assert r4.dup_trigram_frac == 0.0


@pytest.fixture(scope="module")
def decon_rows(spark, tmp_path_factory):
    docs = [
        (0, "one two three four five six"),            # eval (doc_id%10==0)
        (10, "alpha beta gamma delta epsilon"),        # eval
        (1, "zzz one two three four five yyy"),        # shares 1 gram
        (2, "completely different words here now ok"), # shares none
        (3, "one two three four"),                     # <5 words: no grams
        (4, "one two three four five six"),            # exact eval copy: 2 grams
    ]
    d = tmp_path_factory.mktemp("decondocs")
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        str(d / "documents.parquet")
    )
    from astrospark.ops.text import decontaminate_ngram

    out = decontaminate_ngram(spark, str(d)).collect()
    return {r.doc_id: r for r in out}


def test_decontaminate_flags_overlap(decon_rows):
    # eval docs are excluded from the output
    assert set(decon_rows) == {1, 2, 3, 4}
    assert (decon_rows[1].n_shared_grams, decon_rows[1].contaminated) == (1, 1)
    assert (decon_rows[2].n_shared_grams, decon_rows[2].contaminated) == (0, 0)
    assert (decon_rows[3].n_shared_grams, decon_rows[3].contaminated) == (0, 0)
    assert (decon_rows[4].n_shared_grams, decon_rows[4].contaminated) == (2, 1)


def test_decontaminate_broadcasts_eval_grams(spark):
    """The eval gram set joins as a broadcast — the exploded training
    grams must never shuffle on the gram key."""
    import io
    from contextlib import redirect_stdout

    from astrospark.ops.text import decontaminate_ngram

    df = decontaminate_ngram(spark, "/root/testdata/sf0.001")
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode="formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_sample_stratified_rates_and_plan(spark):
    """Keep fractions land near the configured per-lang rates, the kept
    set is a pure function of (doc_id, lang) (rerun-identical), and the
    plan is scan → filter with NO exchange."""
    import io
    from contextlib import redirect_stdout

    from astrospark.ops.text import SAMPLE_RATES, sample_stratified

    sf = "/root/testdata/sf0.01"
    kept = sample_stratified(spark, sf).groupBy("lang").count().collect()
    totals = {
        r.lang: r["count"]
        for r in spark.read.parquet(f"{sf}/documents.parquet")
        .groupBy("lang")
        .count()
        .collect()
    }
    for r in kept:
        frac = r["count"] / totals[r.lang]
        # binomial tolerance at n~70-218 per stratum
        assert abs(frac - SAMPLE_RATES[r.lang]) < 0.15, (r.lang, frac)
    # rate-1.0 strata keep everything (threshold 2^32 > any u32)
    by_lang = {r.lang: r["count"] for r in kept}
    for lang, rate in SAMPLE_RATES.items():
        if rate == 1.0:
            assert by_lang[lang] == totals[lang], lang

    df = sample_stratified(spark, sf)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode="formatted")
    assert "Exchange" not in buf.getvalue()
    # deterministic: two independent builds collect the identical set
    a = sorted(r.doc_id for r in df.collect())
    b = sorted(r.doc_id for r in sample_stratified(spark, sf).collect())
    assert a == b


def test_no_cross_product_in_plan(spark):
    """The bigram count is explode→groupBy (two bounded shuffles), never
    a pairwise self-join."""
    import io
    from contextlib import redirect_stdout

    from astrospark.ops.text import repetition_filters

    df = repetition_filters(spark, "/root/testdata/sf0.001")
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode="formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pack_sequences_python_replay(spark):
    """Full scalar replay of the packing layout: shard hash, per-shard
    cumsum, block arithmetic — all exact integers, recomputed with
    hashlib + a dict of running totals."""
    import hashlib

    from astrospark.ops.text import PACK_CTX, PACK_SHARDS, pack_sequences

    sf = "/root/testdata/sf0.001"
    docs = (
        spark.read.parquet(f"{sf}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    expected = {}
    running = [0] * PACK_SHARDS
    for r in sorted(docs, key=lambda r: r.doc_id):
        n_tok = r.text.count(" ") + 1
        h = hashlib.md5(str(r.doc_id).encode()).hexdigest()
        shard = int(h[:8], 16) % PACK_SHARDS
        running[shard] += n_tok
        cum = running[shard]
        expected[r.doc_id] = (
            shard,
            n_tok,
            (cum - n_tok) // PACK_CTX,
            (cum - 1) // PACK_CTX,
        )

    got = {
        r.doc_id: (r.shard, r.n_tok, r.start_block, r.end_block)
        for r in pack_sequences(spark, sf).collect()
    }
    assert got == expected


def test_pack_sequences_block_invariants(spark):
    """Blocks tile each shard stream with no gaps: within a shard, doc
    k+1 continues exactly where doc k's tokens ended (cum carries over),
    and end_block >= start_block always."""
    from collections import defaultdict

    from astrospark.ops.text import pack_sequences

    rows = pack_sequences(spark, "/root/testdata/sf0.001").collect()
    by_shard = defaultdict(list)
    for r in rows:
        by_shard[r.shard].append(r)
    assert len(by_shard) > 1  # hash actually spreads the streams
    for shard, members in by_shard.items():
        members.sort(key=lambda r: r.doc_id)
        cum = 0
        for r in members:
            assert r.end_block >= r.start_block
            # replay the stream: this doc spans (cum, cum + n_tok]
            assert r.start_block == cum // 2048 if r.n_tok > 0 else True
            cum += r.n_tok
            assert r.end_block == (cum - 1) // 2048


def test_pack_sequences_single_exchange(spark):
    """ONE shuffle (the shard window partition), nothing else — the
    global-sort funnel the docstring forbids would show a rangepartitioning
    Exchange."""
    import io
    from contextlib import redirect_stdout

    from astrospark.ops.text import pack_sequences

    df = pack_sequences(spark, "/root/testdata/sf0.001")
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode="formatted")
    plan = buf.getvalue()
    # formatted mode prints each node twice (tree line + detail header)
    assert plan.count("hashpartitioning") == 1
    assert "rangepartitioning" not in plan
    assert "CartesianProduct" not in plan


@pytest.fixture(scope="module")
def bpe_rows(spark, tmp_path_factory):
    # vocab: aaa:2, bb:1, ab:2, cc:1, aaaa:1
    # round-1 pair counts: aa = 2*2 + 3*1 = 7, ab = 2, bb = 1, cc = 1
    # merge "aa" -> S (U+E000):
    #   aaa  -> S a   (leftmost)    aaaa -> S S (non-overlapping)
    # round-2 counts: ab=2, Sa=2, bb=1, cc=1, SS=1
    docs = [
        (0, "aaa bb aaa"),
        (1, "ab ab cc"),
        (2, "aaaa"),
    ]
    d = tmp_path_factory.mktemp("bpedocs")
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        str(d / "documents.parquet")
    )
    from astrospark.ops.text import bpe_merges

    rows = bpe_merges(spark, str(d)).collect()
    return {(r.merge_round, r.rk): (r.pair, r.cnt) for r in rows}


def test_bpe_round1_pair_counts(bpe_rows):
    assert bpe_rows[(1, 1)] == ("aa", 7)
    assert bpe_rows[(1, 2)] == ("ab", 2)
    # cnt ties rank pair-ascending
    assert bpe_rows[(1, 3)] == ("bb", 1)
    assert bpe_rows[(1, 4)] == ("cc", 1)


def test_bpe_round2_merge_semantics(bpe_rows):
    # "ab" (plain ascii) sorts before the sentinel pair at equal count
    assert bpe_rows[(2, 1)] == ("ab", 2)
    # S+a displayed with the merged symbol expanded: "aa"+"a"
    assert bpe_rows[(2, 2)] == ("aaa", 2)
    # leftmost NON-overlapping merge: "aaaa" -> S S, displayed "aaaa"
    assert bpe_rows[(2, 5)] == ("aaaa", 1)


def test_bpe_no_pairs_from_single_chars(spark, tmp_path_factory):
    # 1-char words generate no pairs (and must not hit Spark's
    # DESCENDING sequence(1, 0) trap)
    d = tmp_path_factory.mktemp("bpe1")
    spark.createDataFrame(
        [(0, "a b c a")], "doc_id long, text string"
    ).write.parquet(str(d / "documents.parquet"))
    from astrospark.ops.text import bpe_merges

    assert bpe_merges(spark, str(d)).count() == 0


def test_bigram_lm_hand_values(spark, tmp_path_factory):
    # corpus: doc0 "a b a", doc1 "a b", doc2 "solo"
    # V = |{a, b, solo}| = 3 (vocabulary counts ALL tokens, including
    # docs too short to produce bigrams)
    # bigrams: doc0 (a,b),(b,a); doc1 (a,b) -> cb(a,b)=2 cb(b,a)=1
    # contexts: c1(a)=2, c1(b)=1; S = 2^20
    # sr(a,b) = (2+3)S div 3 = 1747626 -> log2q=20*1024+682 -> sq=682
    # sr(b,a) = (1+3)S div 2 = 2S      -> log2q=21*1024     -> sq=1024
    d = tmp_path_factory.mktemp("bilm")
    spark.createDataFrame(
        [(0, "a b a"), (1, "a b"), (2, "solo")], "doc_id long, text string"
    ).write.parquet(str(d / "documents.parquet"))
    from astrospark.ops.text import bigram_lm_score

    rows = {r.doc_id: r for r in bigram_lm_score(spark, str(d)).collect()}
    assert rows[0].n_bigrams == 2
    assert rows[0].sur_sum == 682 + 1024
    assert rows[0].sur_avg == (682 + 1024) // 2
    assert rows[1].n_bigrams == 1
    assert rows[1].sur_sum == 682
    # sub-2-word docs are the unigram filter's jurisdiction: not emitted
    assert 2 not in rows


def test_temperature_sample_scalar_replay(spark, tmp_path_factory):
    """Exact replay of the α=1/2 rebalance: IEEE sqrt-ratio thresholds
    via math.sqrt/floor and the md5-u32 keep verdict via hashlib."""
    import hashlib
    import math

    # source A: 4 docs x 8 tokens = 32; source B: 2 docs x 4 tokens = 8
    docs = [(i, " ".join(["w"] * 8), "en", "A", 0) for i in range(4)] + [
        (i + 10, " ".join(["w"] * 4), "en", "B", 0) for i in range(2)
    ]
    d = tmp_path_factory.mktemp("tempdocs")
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars int"
    ).write.parquet(str(d / "documents.parquet"))
    from astrospark.ops.text import _U32, temperature_sample

    rows = {r.doc_id: r for r in temperature_sample(spark, str(d)).collect()}
    masses = {"A": 32, "B": 8}
    m_min = 8
    for doc_id, text, _, src, _ in docs:
        t_q = math.floor((_U32 * math.sqrt(m_min)) / math.sqrt(masses[src]))
        u32 = int(
            hashlib.md5(f"{doc_id}:{src}".encode()).hexdigest()[:8], 16
        )
        r = rows[doc_id]
        assert (r.t_q, r.kept) == (t_q, int(u32 < t_q)), doc_id
    # smallest source: ratio is x/x = exactly 1.0 → t_q = 2^32 keeps all
    assert all(rows[i + 10].kept == 1 for i in range(2))
    assert rows[10].t_q == _U32
    # bigger source thresholds at sqrt(8/32) = 1/2 of the hash space
    assert rows[0].t_q == _U32 // 2


def test_lang_confusion_cells_consistent(spark):
    """Cells sum to the corpus size and agree with a doc-level join of
    the declared label with the lang_id prediction."""
    import collections

    from astrospark.ops.text import lang_confusion, lang_id_stopwords

    sf = "/root/testdata/sf0.001"
    cells = {
        (r.decl_lang, r.pred_lang): r.n_docs
        for r in lang_confusion(spark, sf).collect()
    }
    docs = {
        r.doc_id: r.lang
        for r in spark.read.parquet(f"{sf}/documents.parquet")
        .select("doc_id", "lang")
        .collect()
    }
    preds = {
        r.doc_id: r.pred_lang for r in lang_id_stopwords(spark, sf).collect()
    }
    expected = collections.Counter(
        (docs[i], preds[i]) for i in docs
    )
    assert cells == dict(expected)
    assert sum(cells.values()) == len(docs)


def test_winsorize_bounds_order_stats(spark, tmp_path_factory):
    # source A: n_chars 0,10,...,100 (n=11):
    #   lo rank = 1 + 10*10//100 = 2  -> lo = 10
    #   hi rank = 1 + 10*90//100 = 10 -> hi = 90
    docs = [(i, "x", "en", "A", i * 10) for i in range(11)]
    # source B: 2 docs -> lo rank 1+(1*10)//100=1, hi rank 1+(1*90)//100=1:
    # both bounds collapse onto the FIRST order stat
    docs += [(100, "x", "en", "B", 5), (101, "x", "en", "B", 500)]
    d = tmp_path_factory.mktemp("windocs")
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars int"
    ).write.parquet(str(d / "documents.parquet"))
    from astrospark.ops.text import winsorize_bounds

    rows = {r.doc_id: r for r in winsorize_bounds(spark, str(d)).collect()}
    assert (rows[0].lo, rows[0].hi) == (10, 90)
    assert rows[0].clamped == 10      # 0 clamps up to lo
    assert rows[10].clamped == 90     # 100 clamps down to hi
    assert rows[5].clamped == 50      # interior untouched
    assert (rows[100].lo, rows[100].hi) == (5, 5)
    assert rows[101].clamped == 5


def test_dup_rate_by_source(spark, tmp_path_factory):
    docs = [
        (0, "same text", "en", "A", 9),
        (1, "same text", "en", "A", 9),
        (2, "other", "en", "A", 5),
        (3, "third", "en", "A", 5),
        (4, "unique", "en", "B", 6),
    ]
    d = tmp_path_factory.mktemp("dupdocs")
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars int"
    ).write.parquet(str(d / "documents.parquet"))
    from astrospark.ops.text import dup_rate_by_source

    rows = {r.source: r for r in dup_rate_by_source(spark, str(d)).collect()}
    assert (rows["A"].n_docs, rows["A"].n_distinct, rows["A"].dup_rate_q) == (4, 3, 2500)
    assert (rows["B"].n_docs, rows["B"].n_distinct, rows["B"].dup_rate_q) == (1, 1, 0)


def test_bpe_encode_hand_values(spark, tmp_path_factory):
    """Merge application replayed by hand on the bpe_merges fixture
    corpus: round-1 winner 'aa', round-2 winner = 'ab' (S='aa' merged)."""
    docs = [
        (0, "aaa bb aaa"),
        (1, "ab ab cc"),
        (2, "aaaa"),
    ]
    d = tmp_path_factory.mktemp("bpeenc")
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        str(d / "documents.parquet")
    )
    from astrospark.ops.text import bpe_encode

    rows = {r.doc_id: r for r in bpe_encode(spark, str(d)).collect()}
    # winners (test_bpe_round1/2): p0='aa', p1='ab' (counts: ab=2 beats
    # S+a=2 on pair-ascending tiebreak)
    # doc0 "aaa bb aaa": aaa -> S a (2 symbols) x2, bb -> bb (2) [p1='ab'
    #   absent] => chars 8, symbols 2+2+2 = 6
    assert (rows[0].n_chars_in, rows[0].n_symbols, rows[0].n_merged) == (8, 6, 2)
    # doc1 "ab ab cc": ab -> T (1 symbol) x2, cc -> 2 => 6 chars, 4 symbols
    assert (rows[1].n_chars_in, rows[1].n_symbols, rows[1].n_merged) == (6, 4, 2)
    # doc2 "aaaa" -> S S (2 symbols), 4 chars
    assert (rows[2].n_chars_in, rows[2].n_symbols, rows[2].n_merged) == (4, 2, 2)


def test_boilerplate_ngrams_hand_values(spark, tmp_path_factory):
    """3-gram df/occ report replayed by hand; short docs contribute
    nothing, repeated grams within one doc count occurrences but one
    document."""
    docs = [
        (0, "a b c d"),          # grams: "a b c", "b c d"
        (1, "a b c a b c"),      # grams: "a b c" x2, "b c a", "c a b"
        (2, "x y"),              # < 3 words -> no grams
    ]
    d = tmp_path_factory.mktemp("boiler")
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        str(d / "documents.parquet")
    )
    from astrospark.ops.text import boilerplate_ngrams

    rows = [tuple(r) for r in boilerplate_ngrams(spark, str(d)).collect()]
    # total_docs = 3; df_bps = n_docs*10000 DIV 3
    assert rows == [
        ("a b c", 2, 3, 6666),
        ("b c a", 1, 1, 3333),
        ("b c d", 1, 1, 3333),
        ("c a b", 1, 1, 3333),
    ]


def test_quality_zscore_scalar_replay(spark, tmp_path_factory):
    """Per-source z replayed with the identical integer-moment formula;
    single-doc sources pin z = 0, the planted long doc is the only
    outlier."""
    import math

    docs = [(i, "x", "en", "A", c) for i, c in enumerate((10, 20, 30))]
    docs += [(10, "x", "en", "B", 7)]                       # n=1 -> z=0
    docs += [(20 + i, "x", "en", "C", 0) for i in range(9)]
    docs += [(29, "x", "en", "C", 100)]                     # planted outlier
    d = tmp_path_factory.mktemp("zdocs")
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars int"
    ).write.parquet(str(d / "documents.parquet"))
    from astrospark.ops.text import quality_zscore

    rows = {r.doc_id: r for r in quality_zscore(spark, str(d)).collect()}
    assert len(rows) == 14

    by_source = {}
    for i, _, _, s, c in docs:
        by_source.setdefault(s, []).append(c)
    for i, _, _, s, c in docs:
        vals = by_source[s]
        n, s1, s2 = len(vals), sum(vals), sum(v * v for v in vals)
        if n < 2 or n * s2 == s1 * s1:
            z = 0.0
        else:
            sd = math.sqrt((n * s2 - s1 * s1) / (n * (n - 1)))
            z = round((c - s1 / n) / sd, 4)
        assert abs(rows[i].z - z) < 1e-9, (i, rows[i].z, z)
        assert rows[i].len_outlier == int(abs(z) > 2.0)
    # spot values: source A sd=10 -> z in {-1,0,1}; C's planted 100 is
    # 90/sqrt(1000) = 2.846 (outlier), its zeros -0.3162 (not)
    assert (rows[0].z, rows[1].z, rows[2].z) == (-1.0, 0.0, 1.0)
    assert rows[10].z == 0.0 and rows[10].len_outlier == 0
    assert rows[29].z == 2.846 and rows[29].len_outlier == 1
    assert rows[20].z == -0.3162 and rows[20].len_outlier == 0
