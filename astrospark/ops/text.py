"""Text-analysis operators over the flat documents table (SURVEY.md §2 P/T/A
families + the training-data-pipeline text ops).

Every function here is deliberately expressible in portable ANSI SQL so the
driver's DuckDB oracle can replay it; the Spark side uses the DataFrame API
(Catalyst plans: scan → project/filter/agg, predicate pushdown + column
pruning reach the parquet scan). Engine-specific hash functions are avoided
— md5 is the only hash used cross-engine (bit parity in both).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from astrospark.ops.caching import scoped_persist

# tokens for the J1-style broadcast dictionary semi-join demo — a mix of
# gazetteer tokens (astro) and the synthetic document vocabulary so the
# join is non-degenerate on the driver's tables
DICT_TOKENS = (
    "GRB", "NGC", "Magellanic", "Clouds", "spark", "table", "join", "window",
    "filter", "vector", "stream", "batch", "merge", "column",
)

STOPWORDS = {
    "en": ("the", "a", "of", "and"),
    "es": ("el", "la", "de", "que"),
    "de": ("der", "die", "das", "und"),
    "fr": ("le", "la", "les", "et"),
}


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def p1_whitespace_normalize(spark, sf_dir) -> DataFrame:
    """P1 (AstroParser.java:101-102): \\n/\\t → space, projected per doc."""
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.translate("text", "\n\t", "  ").alias("norm_text"),
    )


def p2_blank_filter(spark, sf_dir) -> DataFrame:
    """P2 (AstroParser.java:96-98): drop blank docs before extraction."""
    return (
        _docs(spark, sf_dir)
        .filter(F.length(F.trim("text")) > 0)
        .select("doc_id", "n_chars")
    )


def t1_ws_token_stats(spark, sf_dir) -> DataFrame:
    """T1 scan stats: whitespace token counts (portable formulation)."""
    d = _docs(spark, sf_dir)
    n_tok = F.length("text") - F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))) + F.lit(1)
    return d.select(
        "doc_id",
        n_tok.cast("int").alias("n_ws_tokens"),
        F.length("text").alias("len_chars"),
    )


def t2_regex_token_count(spark, sf_dir) -> DataFrame:
    """T1/T2 approximation with a portable regex (letter runs | digit runs |
    single other non-space) — the BPE-ish token counter."""
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("text"), F.lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"), F.lit(0)))
        .alias("n_tokens"),
    )


def s3_sentence_chunks(spark, sf_dir) -> DataFrame:
    """S3-style chunking: sentence-ish split with per-chunk index (the
    explode(spans) shape on a flat table)."""
    d = _docs(spark, sf_dir)
    parts = F.split(F.col("text"), "\\. ")
    e = d.select("doc_id", F.posexplode(parts).alias("chunk_idx", "chunk_text"))
    return e.filter(F.length("chunk_text") > 0)


def j1_dict_semijoin(spark, sf_dir) -> DataFrame:
    """J1 (AstroLexicon.inAstroDictionary): per-doc count of tokens found in
    a broadcast dictionary. Realized as explode → broadcast hash join."""
    d = _docs(spark, sf_dir)
    dict_df = spark.createDataFrame([(t,) for t in DICT_TOKENS], "tok string")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    joined = toks.join(F.broadcast(dict_df), "tok", "inner")
    return (
        joined.groupBy("doc_id")
        .agg(F.count("*").cast("int").alias("n_dict_tokens"))
    )


def o1_top_docs(spark, sf_dir) -> DataFrame:
    """O1-style deterministic order + limit."""
    return (
        _docs(spark, sf_dir)
        .select("doc_id", "n_chars")
        .orderBy(F.desc("n_chars"), F.asc("doc_id"))
        .limit(20)
    )


def o3_corpus_split(spark, sf_dir) -> DataFrame:
    """O3 (AstroTrainer.java:140-150): deterministic train/eval split —
    portable md5-based bucketing instead of Math.random()."""
    d = _docs(spark, sf_dir)
    bucket = F.when(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) < "8", "train"
    ).otherwise("eval")
    return d.select("doc_id", bucket.alias("split"))


def a4_source_stats(spark, sf_dir) -> DataFrame:
    """A4-style aggregation: per (source, lang) doc counts + size stats."""
    return (
        _docs(spark, sf_dir)
        .groupBy("source", "lang")
        .agg(
            F.count("*").cast("int").alias("n_docs"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
    )


def quality_score(spark, sf_dir) -> DataFrame:
    """Document quality heuristics: length, punctuation ratio, mean word
    length, stopword hits — the standard pretraining-corpus filters."""
    d = _docs(spark, sf_dir)
    text = F.col("text")
    n_chars = F.length(text)
    n_words = F.size(F.split(text, " "))
    n_punct = n_chars - F.length(F.regexp_replace(text, "[^A-Za-z0-9 ]", ""))
    n_the = (
        F.length(text) - F.length(F.replace(text, F.lit(" the "), F.lit("")))
    ) / F.lit(5)
    mean_word_len = (n_chars - n_words + 1) / n_words
    return d.select(
        "doc_id",
        n_chars.alias("n_chars_q"),
        n_words.alias("n_words"),
        F.round(n_punct / n_chars, 4).alias("punct_ratio"),
        F.round(mean_word_len, 4).alias("mean_word_len"),
        F.round(n_the / n_words, 4).alias("the_ratio"),
    )


def _pred_lang_expr():
    """Stopword language-ID argmax as a reusable Column (consumed by
    lang_id_stopwords and lang_confusion from the SAME scan)."""
    padded = F.concat(F.lit(" "), F.lower("text"), F.lit(" "))

    def count_of(w):
        pat = F.lit(" " + w + " ")
        return (F.length(padded) - F.length(F.replace(padded, pat, F.lit("")))) / F.lit(len(w) + 2)

    scores = {
        lang: sum_exprs([count_of(w) for w in words])
        for lang, words in STOPWORDS.items()
    }
    # deterministic argmax: iterate fixed lang order, strict > keeps first
    langs = list(STOPWORDS.keys())
    best_score = scores[langs[0]]
    best = F.lit(langs[0])
    for lang in langs[1:]:
        cond = scores[lang] > best_score
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, scores[lang]).otherwise(best_score)
    return best


def lang_id_stopwords(spark, sf_dir) -> DataFrame:
    """N-gram/stopword language-ID heuristic with a portable argmax."""
    return _docs(spark, sf_dir).select(
        "doc_id", _pred_lang_expr().alias("pred_lang")
    )


def lang_confusion(spark, sf_dir) -> DataFrame:
    """Language-ID confusion matrix — declared corpus metadata vs the
    stopword detector: the quality-eval diagnostic that decides whether
    metadata or the detector should gate the corpus mix (mislabeled
    sources show up as hot off-diagonal cells). ONE corpus scan — the
    detector argmax is computed inline next to the declared label, NOT
    joined back on doc_id (a self-join would shuffle the corpus twice
    for a |langs|²-cell answer); the count aggregate's key space is
    |langs|², so its shuffle is corpus-size-independent."""
    return (
        _docs(spark, sf_dir)
        .select(
            F.col("lang").alias("decl_lang"),
            _pred_lang_expr().alias("pred_lang"),
        )
        .groupBy("decl_lang", "pred_lang")
        .agg(F.count("*").cast("int").alias("n_docs"))
    )


def sum_exprs(exprs):
    acc = exprs[0]
    for e in exprs[1:]:
        acc = acc + e
    return acc


BOILERPLATE_MIN_WORDS = 8


def b1_boilerplate_strip(spark, sf_dir) -> DataFrame:
    """Main-content extraction: drop boilerplate sentences, keep content.

    jusText/Readability-style length heuristic, fully JVM-side (split →
    higher-order filter → join, no UDF, no shuffle): a sentence is
    content iff it has >= BOILERPLATE_MIN_WORDS words — short fragments
    (menus, captions, nav crumbs) are boilerplate. At web scale richer
    scores (link density, stopword density — see quality_score) slot into
    the same filter lambda; the plan shape is unchanged.
    """
    d = _docs(spark, sf_dir)
    sents = F.split("text", "\\. ")
    is_content = lambda x: F.size(F.split(x, " ")) >= BOILERPLATE_MIN_WORDS  # noqa: E731
    kept = F.filter(sents, is_content)
    return d.select(
        "doc_id",
        F.array_join(kept, ". ").alias("main_text"),
        F.size(kept).cast("int").alias("n_kept"),
        F.size(sents).cast("int").alias("n_sent"),
    )


# Gopher-style repetition thresholds (Rae et al. 2021, Table A1): docs
# whose most common word 2-gram covers >18% of characters, or where >30%
# of word 3-gram occurrences are repeats, are flagged low-quality
REP_TOP_BIGRAM_MAX = 0.18
REP_DUP_TRIGRAM_MAX = 0.30


def repetition_filters(spark, sf_dir) -> DataFrame:
    """Repetition-based quality filters (Gopher/MassiveText rules over a
    flat word-stream corpus): per document,

    - ``top_bigram_char_frac`` — characters covered by the most common
      word 2-gram (count × gram length / doc length). Computed by the
      scalable shape: explode bigrams → (doc_id, bigram) count with
      map-side partial aggregation → per-doc max — never a per-row
      O(n²) scan, so million-token documents cost two bounded shuffles.
    - ``dup_trigram_frac`` — fraction of word 3-gram occurrences that
      are repeats (1 − distinct/total). Same explode → agg shape
      (count + count_distinct per doc). An earlier in-row version
      (transform + array_distinct) was dropped: array_distinct is
      quadratic per document and the expression tree gets re-evaluated
      per referencing column, which measured ~20s for 5k docs at sf0.1
      vs <1s for the explode path — and a million-token doc would make
      the in-row version quadratic-blow-up where explode stays linear.
    - ``rep_flagged`` — 1 iff either measure crosses its Gopher
      threshold; downstream selection is ``WHERE rep_flagged = 0``.

    Both measures are exact integer arithmetic divided once into a
    double, so the DuckDB oracle replays them bit-for-bit.
    """
    d = _docs(spark, sf_dir).select("doc_id", "text", F.length("text").alias("n_chars"))
    words = F.split("text", " ")
    nw = F.size(words)

    bigrams = F.transform(
        F.sequence(F.lit(1), nw - 1),
        lambda i: F.concat_ws(" ", F.element_at(words, i), F.element_at(words, i + 1)),
    )
    # Spark's sequence(1, n) runs DESCENDING when n < 1 — guard short docs
    exploded = (
        d.filter(nw >= 2)
        .select("doc_id", F.explode(bigrams).alias("bg"))
        .groupBy("doc_id", "bg")
        .agg(F.count("*").alias("cnt"))
        .groupBy("doc_id")
        .agg(F.max(F.col("cnt") * F.length("bg")).alias("top_bg_chars"))
    )

    trigrams = F.transform(
        F.sequence(F.lit(1), nw - 2),
        lambda i: F.concat_ws(" ", F.slice(words, i, 3)),
    )
    tri_stats = (
        d.filter(nw >= 3)
        .select("doc_id", F.explode(trigrams).alias("tg"))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tri"),
            F.count_distinct("tg").alias("n_tri_d"),
        )
    )
    dup_tri = F.when(
        F.col("n_tri").isNotNull(),
        F.round(
            (F.col("n_tri") - F.col("n_tri_d")).cast("double") / F.col("n_tri"), 4
        ),
    ).otherwise(F.lit(0.0))

    top_bg = F.when(
        F.col("n_chars") > 0,
        F.round(
            F.coalesce(F.col("top_bg_chars"), F.lit(0)).cast("double") / F.col("n_chars"),
            4,
        ),
    ).otherwise(F.lit(0.0))
    return (
        d.join(exploded, "doc_id", "left")
        .join(tri_stats, "doc_id", "left")
        .select(
            "doc_id",
            top_bg.alias("top_bigram_char_frac"),
            dup_tri.alias("dup_trigram_frac"),
            (
                (top_bg > REP_TOP_BIGRAM_MAX) | (dup_tri > REP_DUP_TRIGRAM_MAX)
            ).cast("int").alias("rep_flagged"),
        )
    )


# decontamination params: word n-gram size and the deterministic eval
# split (doc_id % DECON_EVAL_MOD == 0 models the held-out benchmark set;
# in production the eval side is the real benchmark corpus)
DECON_NGRAM = 5
DECON_EVAL_MOD = 10


def decontaminate_ngram(spark, sf_dir, n: int = DECON_NGRAM) -> DataFrame:
    """Benchmark decontamination: flag training documents that share any
    word ``n``-gram with the held-out eval set (the standard n-gram
    overlap rule used to scrub pretraining corpora of test-set leakage).

    Scale shape: the eval side is tiny relative to the corpus (benchmarks
    are millions of grams vs 10^12 training grams), so its distinct gram
    set is BROADCAST and the exploded training grams never shuffle on the
    gram key — the only shuffle is the per-doc count of matched grams
    (doc_id-keyed, bounded by matches, not by corpus gram volume). Gram
    construction is in-row (higher-order transform over slice), no UDF.

    Output per training doc: ``n_shared_grams`` (distinct grams also in
    the eval set) and ``contaminated`` (1 iff any overlap); downstream
    selection is ``WHERE contaminated = 0``.
    """
    d = _docs(spark, sf_dir).select("doc_id", "text")
    words = F.split("text", " ")
    nw = F.size(words)
    grams = F.when(
        nw >= n,
        F.transform(
            F.sequence(F.lit(1), nw - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(words, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    with_grams = d.select("doc_id", grams.alias("grams"))

    is_eval = F.col("doc_id") % DECON_EVAL_MOD == 0
    eval_grams = (
        with_grams.filter(is_eval)
        .select(F.explode("grams").alias("gram"))
        .distinct()
    )
    train = with_grams.filter(~is_eval)
    matched = (
        train.select("doc_id", F.explode("grams").alias("gram"))
        .join(F.broadcast(eval_grams), "gram")
        .groupBy("doc_id")
        .agg(F.count_distinct("gram").alias("n_shared_grams"))
    )
    return (
        train.select("doc_id")
        .join(matched, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_shared_grams", F.lit(0)).cast("int").alias("n_shared_grams"),
            (F.coalesce("n_shared_grams", F.lit(0)) > 0).cast("int").alias("contaminated"),
        )
    )


# stratified-sampling rates: rebalance the en-heavy corpus (keep rates
# by lang stratum). Thresholds are exact 32-bit integers so the keep
# decision is integer-compared on both engines, never a float compare.
SAMPLE_RATES = {"en": 0.5, "de": 1.0, "es": 1.0, "fr": 1.0, "zh": 0.8}
SAMPLE_DEFAULT_RATE = 1.0
_U32 = 1 << 32


def _sample_thresholds() -> dict[str, int]:
    return {lang: int(rate * _U32) for lang, rate in SAMPLE_RATES.items()}


def _hex32(col):
    """First 32 bits of an md5 hex digest via portable nibble arithmetic
    (same construction as _word_hash16, widened to 8 nibbles)."""
    val = None
    for i in range(8):
        nib = (F.instr(F.lit(_HEXMAP), F.substring(col, i + 1, 1)) - 1).cast("long")
        val = nib if val is None else val * 16 + nib
    return val


def sample_stratified(spark, sf_dir) -> DataFrame:
    """Deterministic stratified sampling: per-language keep rates applied
    via a hash-uniform, NOT rand() — the keep decision is a pure function
    of (doc_id, lang), so task retries, reruns, and both engines agree
    row-for-row (rand()-based sampling is non-reproducible under Spark's
    task retry semantics and would never oracle-match).

    u32 = first 32 md5 bits of "doc_id:lang"; keep iff u32 < rate·2^32
    (exact integer threshold). Plan is scan → project → filter — zero
    shuffle, and at 10^12 rows the sample decision costs one hash per
    row with no coordination, which is why production corpus mixing uses
    exactly this shape.
    """
    thresholds = _sample_thresholds()
    default_thr = int(SAMPLE_DEFAULT_RATE * _U32)
    d = _docs(spark, sf_dir).select("doc_id", "lang")
    h = F.md5(F.concat_ws(":", F.col("doc_id").cast("string"), "lang"))
    u32 = _hex32(h)
    thr = F.lit(default_thr)
    for lang, t in sorted(thresholds.items()):
        thr = F.when(F.col("lang") == lang, F.lit(t)).otherwise(thr)
    return (
        d.select("doc_id", "lang", u32.alias("u32"), thr.alias("thr"))
        .filter(F.col("u32") < F.col("thr"))
        .select(
            "doc_id",
            "lang",
            F.round(F.col("u32") / F.lit(float(_U32)), 6).alias("sample_u"),
        )
    )


def fingerprint_md5(spark, sf_dir) -> DataFrame:
    """Document fingerprint: md5 over the punctuation-stripped lowercase
    text (portable; the rolling-hash variant is fingerprint_rolling)."""
    d = _docs(spark, sf_dir)
    normed = F.regexp_replace(F.lower("text"), "[^a-z0-9 ]", "")
    return d.select("doc_id", F.md5(normed).alias("fingerprint"))


# rolling-hash params: word value = first 16 md5 bits, chained with the
# classic (acc*B + h) mod P polynomial — order-sensitive (unlike a bag
# hash), so reordered documents fingerprint differently
ROLL_B = 65599
ROLL_P = 1_000_000_007
_HEXMAP = "0123456789abcdef"


def _word_hash16(wd):
    """First 16 bits of md5(word) via portable nibble arithmetic (same
    construction as dedup.simhash16)."""
    h = F.md5(wd)
    val = None
    for i in range(4):
        nib = (F.instr(F.lit(_HEXMAP), F.substring(h, i + 1, 1)) - 1).cast("long")
        val = nib if val is None else val * 16 + nib
    return val


def fingerprint_rolling(spark, sf_dir) -> DataFrame:
    """Order-sensitive polynomial rolling-hash fingerprint over words.

    Entirely JVM-side (higher-order aggregate over the split word array);
    one linear scan per document, no shuffle beyond the scan projection.
    The DuckDB oracle replays it with list_reduce over the same md5-nibble
    word values — identical left-fold order, identical bigint arithmetic.
    """
    d = _docs(spark, sf_dir)
    words = F.split("text", " ")
    fp = F.aggregate(
        F.transform(words, _word_hash16),
        F.lit(0).cast("long"),
        lambda acc, h: (acc * ROLL_B + h) % ROLL_P,
    )
    return d.select("doc_id", fp.cast("bigint").alias("roll_fp"))


# packing params: context length of a training block and the shard count
# of the salted packing streams (production scales PACK_SHARDS with the
# corpus so each shard stays a bounded, independently-sortable stream)
PACK_CTX = 2048
PACK_SHARDS = 8


def pack_sequences(spark, sf_dir, ctx: int = PACK_CTX, shards: int = PACK_SHARDS) -> DataFrame:
    """Concatenate-and-chunk sequence packing — the GPT-style pretraining
    layout: documents are concatenated in a deterministic order and cut
    into fixed ``ctx``-token blocks; each document learns which block
    range it lands in (start_block..end_block of its shard's stream).

    Order is NOT global: a single totally-ordered cumsum would funnel
    10^12 rows through one sort. Instead each document hashes to one of
    ``shards`` independent streams (first 32 md5 bits of doc_id — the
    sample_stratified hash-uniform construction, so placement is a pure
    function of doc_id, reproducible under task retries), and the running
    token total is a window cumsum per shard ordered by doc_id. Scale
    shape: ONE shuffle keyed by shard + a within-shard sort; production
    grows ``shards`` with the corpus so every stream stays bounded, and
    the window never crosses shard boundaries. Token counts use the T1
    whitespace formulation; every step is exact integer arithmetic, so
    the DuckDB window replay is bit-identical.
    """
    d = _docs(spark, sf_dir).select("doc_id", "text")
    n_tok = (
        F.length("text")
        - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
        + F.lit(1)
    ).cast("long")
    shard = _hex32(F.md5(F.col("doc_id").cast("string"))) % shards
    from pyspark.sql import Window

    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    staged = d.select(
        "doc_id", shard.cast("int").alias("shard"), n_tok.alias("n_tok")
    ).withColumn("cum", F.sum("n_tok").over(w))
    return staged.select(
        "doc_id",
        "shard",
        F.col("n_tok").cast("int").alias("n_tok"),
        F.floor((F.col("cum") - F.col("n_tok")) / ctx).cast("int").alias("start_block"),
        F.floor((F.col("cum") - 1) / ctx).cast("int").alias("end_block"),
    )


# DSIR importance-weight params: hashed-unigram buckets (2^16 — the
# bucket-weight table stays broadcastable at any corpus size) and the
# integer quantization scale for the target/raw ratio. The "target"
# distribution is the DECON eval split (doc_id % DECON_EVAL_MOD == 0),
# standing in for the high-quality domain sample a real DSIR run fits.
DSIR_SCALE = 1_000_000


def importance_weights(spark, sf_dir) -> DataFrame:
    """DSIR-style data selection with hashed n-gram importance weights
    (Xie et al. 2023): score every raw document by how target-like its
    hashed-unigram distribution is, so selection can keep the top mass.

    Each word hashes to one of 2^16 buckets (first 16 md5 bits — the
    simhash16 construction, identical in both engines). Bucket weight is
    the add-one-smoothed target/raw count ratio, quantized to an exact
    integer ``(t+1)*SCALE div (r+1)`` — no float logs, so the per-doc sum
    is order-free and the DuckDB replay is bit-identical (float log-ratio
    sums would drift between engines' reduction orders). A document's
    importance is the sum of its words' bucket weights; ``importance_avg``
    (per-word integer mean) is the length-normalized selection key.

    Scale shape: bucket counting is ONE shuffle on a 2^16-key space
    (map-side combine collapses 10^12 words to <=65536 rows per task);
    the weight table then BROADCASTS back to the exploded word stream, so
    scoring shuffles only on doc_id for the final per-doc sum. Nothing
    global, nothing driver-side.
    """
    d = _docs(spark, sf_dir).select("doc_id", "text")
    words = d.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    b = words.select(
        "doc_id",
        _word_hash16(F.col("w")).alias("bucket"),
        (F.col("doc_id") % DECON_EVAL_MOD == 0).cast("long").alias("is_tgt"),
    )
    counts = b.groupBy("bucket").agg(
        F.sum("is_tgt").alias("t_cnt"),
        F.sum(F.lit(1) - F.col("is_tgt")).alias("r_cnt"),
    )
    weights = counts.select(
        "bucket",
        F.expr(f"(t_cnt + 1) * {DSIR_SCALE} div (r_cnt + 1)").alias("wt"),
    )
    scored = (
        b.filter(F.col("is_tgt") == 0)
        .join(F.broadcast(weights), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("int").alias("n_words"),
            F.sum("wt").cast("bigint").alias("importance"),
        )
    )
    return scored.select(
        "doc_id",
        "n_words",
        "importance",
        F.expr("importance div n_words").cast("bigint").alias("importance_avg"),
    )


# source-level gate: drop whole sources whose mean document length falls
# below this floor — the domain/host-level filter (spam hosts, boilerplate
# mirrors) applied before per-document scoring in web-corpus pipelines
SRC_MIN_MEAN_CHARS = 280


def source_quality_gate(spark, sf_dir) -> DataFrame:
    """Domain-level quality gating: aggregate a quality statistic per
    source (here mean document length; richer per-doc scores from
    quality_score slot into the same agg) and keep/drop every document
    of a source together — the host-level pass (UT1 blocklists, spam
    domains, low-quality mirrors) that precedes per-document filters in
    web-corpus curation.

    The keep decision compares exact integers — ``sum_chars >=
    SRC_MIN_MEAN_CHARS * n_docs`` — never a float mean, so boundary
    sources resolve identically in both engines; the reported
    ``src_mean_chars`` is display-only rounding of identical operands.

    Scale shape: ONE shuffle keyed by source with map-side combine (the
    source dimension is tiny — hosts number millions, not trillions);
    the per-source verdict table then BROADCASTS back onto the corpus
    scan, so per-doc gating costs no second corpus shuffle.
    """
    d = _docs(spark, sf_dir).select("doc_id", "source", "n_chars")
    src = d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
    )
    verdict = src.select(
        "source",
        F.col("n_docs").cast("int").alias("src_docs"),
        F.round(F.col("sum_chars") / F.col("n_docs"), 4).alias("src_mean_chars"),
        (F.col("sum_chars") >= F.lit(SRC_MIN_MEAN_CHARS) * F.col("n_docs"))
        .cast("int")
        .alias("src_kept"),
    )
    return d.select("doc_id", "source").join(F.broadcast(verdict), "source").select(
        "doc_id", "source", "src_docs", "src_mean_chars", "src_kept"
    )

# ---------------------------------------------------------------------------
# Full-text retrieval + LM-based filtering share one cross-engine primitive:
# an integer log2 with LOG2Q_FBITS mantissa-interpolated fractional bits.
# floor(log2 x) comes from the binary-string length (Spark `bin()`, DuckDB
# `format('{:b}')` — both exact for positive BIGINT); the fractional part
# linearly interpolates the mantissa, log2q(x) = (b-1)*2^F + (x-2^(b-1))*2^F
# div 2^(b-1). Monotone in x, max error ~0.086 bits (peak of log2(1+m)-m),
# and — unlike float log() — bit-identical between JVM and DuckDB, so scores
# summed in any order reproduce exactly.
LOG2Q_FBITS = 1024  # 2^10: ten fractional bits


def _log2q_sql(x: str) -> str:
    """Integer log2 of a positive bigint SQL expression (Spark dialect).

    ``x`` is referenced several times — pass a simple column name, not a
    computed expression (compute it in a prior select).
    """
    b = f"(length(bin({x})) - 1)"
    msb = f"shiftleft(cast(1 as bigint), {b})"
    return f"({b} * {LOG2Q_FBITS} + ({x} - {msb}) * {LOG2Q_FBITS} div {msb})"


def log2q(x: int) -> int:
    """Pure-Python replay of _log2q_sql for oracle-free value tests."""
    b = x.bit_length() - 1
    msb = 1 << b
    return b * LOG2Q_FBITS + (x - msb) * LOG2Q_FBITS // msb


# BM25 retrieval constants: Robertson k1=1.2, b=0.75 appear below as the
# exact integer multipliers 22/10 (=2·(k1+1)·...), 3 (=10·k1·(1-b)) and
# 9 (=10·k1·b); idf is Lucene's non-negative log(1 + (N-df+0.5)/(df+0.5))
# (base 2 here — a constant factor that rescales every score identically).
# The demo query spans the synthetic corpus's df spectrum: 'dup' is rare
# (high idf), 'merge'/'vector' are common (idf near the clamp floor).
BM25_QUERY = ("dup", "merge", "vector")
BM25_TOPK = 20
BM25_RATIO_SCALE = 1 << 20  # idf ratio fixed point; (2N+2)·2^20 < 2^63
BM25_DL_SCALE = 1024  # avgdl fixed point — keeps score terms < 2^50


def _term_eq(t: str):
    return lambda x: x == F.lit(t)


def bm25_topk(spark, sf_dir, terms=BM25_QUERY, k: int = BM25_TOPK) -> DataFrame:
    """BM25 top-k full-text search over the documents table — the retrieval
    primitive (training-data sourcing, eval-set mining) the engine lacked.

    Everything integer: per-term score = (22·tf·avgdl_q·idf_q) div
    (10·avgdl_q·tf + 3·avgdl_q + 9·dl·DL_SCALE) with idf_q =
    log2q((2N+2)·2^20 div (2df+1)) − 20·2^10 ≥ 0, so the DuckDB oracle
    replays every score bit-for-bit (float BM25 would drift in the last
    ulp across engines and flip tie-adjacent ranks).

    Scale shape: per-term tf/dl are array expressions over ONE corpus scan
    (no explode, no tokenize shuffle — query terms are columns, the plan is
    built per query exactly like a search engine's); the global (N, Σdl,
    df_t) aggregate is one partial-combined reduce to a 1-row frame that
    BROADCASTS back (BroadcastNestedLoopJoin on a 1-row build side); the
    top-k is TakeOrdered (per-partition heads, no sort shuffle). Zero wide
    exchanges at any corpus size.
    """
    nt = len(terms)
    d = _docs(spark, sf_dir).select("doc_id", F.split("text", " ").alias("ws"))
    per = d.select(
        "doc_id",
        F.size("ws").alias("dl"),
        *[
            # single-arg lambda via factory: a 2-arg lambda would be read
            # by pyspark as the (element, index) filter variant
            F.size(F.filter("ws", _term_eq(t))).alias(f"tf{i}")
            for i, t in enumerate(terms)
        ],
    )
    stats = per.agg(
        F.count("*").alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("long")).alias(f"df{i}")
            for i in range(nt)
        ],
    )
    sr = stats.select(
        F.expr(f"sum_dl * {BM25_DL_SCALE} div n_docs").alias("avgdl_q"),
        *[
            F.expr(f"(2 * n_docs + 2) * {BM25_RATIO_SCALE} div (2 * df{i} + 1)")
            .alias(f"sr{i}")
            for i in range(nt)
        ],
    )
    # 2^20 ratio scale contributes exactly 20·LOG2Q_FBITS to log2q
    idf = sr.select(
        "avgdl_q",
        *[
            F.expr(f"{_log2q_sql(f'sr{i}')} - {20 * LOG2Q_FBITS}").alias(f"idf{i}")
            for i in range(nt)
        ],
    )
    scored = per.join(F.broadcast(idf))
    term_score = [
        F.expr(
            f"IF(tf{i} > 0, 22 * tf{i} * avgdl_q * idf{i} div "
            f"(10 * avgdl_q * tf{i} + 3 * avgdl_q + 9 * dl * {BM25_DL_SCALE}), 0)"
        )
        for i in range(nt)
    ]
    res = scored.select(
        "doc_id",
        sum_exprs([(F.col(f"tf{i}") > 0).cast("int") for i in range(nt)])
        .cast("int")
        .alias("n_hit"),
        sum_exprs(term_score).cast("bigint").alias("bm25"),
    ).filter(F.col("n_hit") > 0)
    return res.orderBy(F.desc("bm25"), "doc_id").limit(k)


# CCNet-style LM filter: surprisal of word w under the add-one-smoothed
# corpus unigram LM, log2((T+V)/(c_w+1)) in log2q fixed point; documents
# whose per-word mean surprisal exceeds the ceiling are flagged (gibberish
# / OOV-heavy pages score high, fluent in-domain text low). The ceiling
# sits in the corpus-typical distribution's upper tail (p90 ~5009, max
# ~5872 across the sf dirs) so the flag is non-degenerate: ~96% kept,
# the rare-word-heavy ~4% flagged — the CCNet "tail" regime.
PPL_RATIO_SCALE = 1 << 20
PPL_MAX_XENT_AVG = 5060


def perplexity_filter(spark, sf_dir) -> DataFrame:
    """Unigram-LM perplexity filtering (the CCNet/LLaMA wellformedness
    pass): score every document by its mean per-word surprisal under a
    language model fit on the corpus itself, flag the high-perplexity tail.

    Surprisal is integer log2q — summed integers are order-free, so the
    DuckDB replay is bit-identical (a float log LM would need a tolerance
    and tolerances can't feed an exact keep/drop flag).

    Scale shape: LM fitting is ONE vocab-keyed shuffle with map-side
    combine (10^12 words collapse to the vocab cardinality per task); the
    (T, V) normalizer is a 1-row broadcast. Scoring joins the word stream
    against the surprisal table on the word key — auto-broadcast here;
    at web scale the vocab table exceeds broadcast range and the honest
    shape is a shuffle join on the word key, or the hashed-vocab variant
    (importance_weights) which stays broadcastable at ANY corpus size by
    construction. The final per-doc mean shuffles once on doc_id.
    """
    d = _docs(spark, sf_dir).select("doc_id", "text")
    words = d.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    counts = words.groupBy("w").agg(F.count("*").alias("c"))
    tv = counts.agg(
        F.sum("c").alias("t_words"), F.count("*").alias("v_size")
    )
    sur = (
        counts.join(F.broadcast(tv))
        .select(
            "w",
            F.expr(f"(t_words + v_size) * {PPL_RATIO_SCALE} div (c + 1)").alias(
                "sr"
            ),
        )
        .select("w", F.expr(f"{_log2q_sql('sr')} - {20 * LOG2Q_FBITS}").alias("sq"))
    )
    scored = words.join(sur, "w").groupBy("doc_id").agg(
        F.count("*").cast("int").alias("n_words"),
        F.sum("sq").cast("bigint").alias("xent_sum"),
    )
    return scored.select(
        "doc_id",
        "n_words",
        "xent_sum",
        F.expr("xent_sum div n_words").cast("bigint").alias("xent_avg"),
        F.expr(f"CAST(xent_sum div n_words <= {PPL_MAX_XENT_AVG} AS INT)").alias(
            "ppl_kept"
        ),
    )


# PII scrubbing patterns — backref-free character-class regexes that parse
# identically under Java regex (Spark) and RE2 (DuckDB). The synthetic
# corpus carries no PII, so the query injects deterministic addresses into
# a doc_id-derived slice first (both engines build the identical string);
# the redaction machinery itself is exactly what a real scrub runs.
PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PII_PHONE = "\\+1-555-[0-9]{4}"
PII_IP = "192\\.168\\.[0-9]{1,3}\\.[0-9]{1,3}"


def pii_redact(spark, sf_dir) -> DataFrame:
    """PII redaction — the scrub stage every pretraining pipeline runs
    before tokenization: emails / phone numbers / private-range IPs are
    counted then replaced with typed placeholder tokens.

    Scale shape: scan → project, zero shuffles and zero UDFs — the
    regexes run JVM-side inside whole-stage codegen (regexp_extract_all
    + regexp_replace), so the scrub rides the same pass as any other
    per-doc projection at 10^12 rows. The patterns avoid backreferences
    and lookaround, keeping Java-regex and RE2 semantics identical (and
    leaving the door open to Spark's RE2-based codegen paths).
    """
    d = _docs(spark, sf_dir).select("doc_id", "text")
    aug = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com or +1-555-0"),
                F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
                F.lit("."),
            ),
        )
        .when(
            F.col("doc_id") % 11 == 3,
            F.concat(
                F.lit(" node 192.168."),
                (F.col("doc_id") % 256).cast("string"),
                F.lit(".17 logged it"),
            ),
        )
        .otherwise(F.lit("")),
    )
    step = d.select("doc_id", aug.alias("aug"))
    return step.select(
        "doc_id",
        F.size(F.regexp_extract_all("aug", F.lit(PII_EMAIL), F.lit(0))).alias("n_emails"),
        F.size(F.regexp_extract_all("aug", F.lit(PII_PHONE), F.lit(0))).alias("n_phones"),
        F.size(F.regexp_extract_all("aug", F.lit(PII_IP), F.lit(0))).alias("n_ips"),
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace("aug", PII_EMAIL, "<EMAIL>"),
                PII_PHONE,
                "<PHONE>",
            ),
            PII_IP,
            "<IP>",
        ).alias("redacted"),
    )


def corpus_stats_rollup(spark, sf_dir) -> DataFrame:
    """Corpus reporting cube: ROLLUP over (lang, source) — per-cell,
    per-language and grand-total document counts and exact character
    sums in ONE pass (the multi-level aggregation a curation dashboard
    reads; SURVEY §2.5's aggregation family extended to grouping sets).

    Spark plans this as Expand → partial agg → ONE exchange on the
    grouping-set key — the replicated rows are 3× the input of a plain
    agg but map-side combine collapses them before the shuffle, so the
    wire cost stays ~(distinct groups × 3). Grouping markers are
    coalesced to literal '(all)' so the key space is explicit and
    NULL-free in both engines.
    """
    d = _docs(spark, sf_dir).select("lang", "source", "n_chars")
    return (
        d.rollup("lang", "source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
        )
        .select(
            F.coalesce("lang", F.lit("(all)")).alias("lang"),
            F.coalesce("source", F.lit("(all)")).alias("source"),
            "n_docs",
            "sum_chars",
        )
    )


def token_cooccurrence(spark, sf_dir) -> DataFrame:
    """Dictionary-term co-occurrence with lift — the co-mention analytics
    a user runs over extraction output (which catalogue objects appear
    together?; reference consumers do this downstream of
    AstroParser.extractAstroEntities), expressed over the broadcast
    DICT_TOKENS dictionary so the oracle needs no model.

    ``lift = n_docs·c_ab / (c_a·c_b)`` divides identical integer operands
    in both engines, then rounds — safe cross-engine (the operands are
    exact; only the final display division is floating point).

    Scale shape: per-doc distinct dictionary hits are bounded by the
    dictionary (not by document length), so the doc_id self-join fans
    out at most |dict|² pairs per document — no cross product, no skew
    amplification; the pair aggregation keys a |dict|²-bounded space
    with map-side combine, and the marginal table (≤|dict| rows)
    broadcasts back onto it.
    """
    d = _docs(spark, sf_dir).select("doc_id", "text")
    toks = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.col("tok").isin(list(DICT_TOKENS)))
        .distinct()
    )
    n = d.agg(F.count("*").alias("n_docs"))
    marg = toks.groupBy("tok").agg(F.count("*").alias("c"))
    a = toks.alias("a")
    b = toks.alias("b")
    pairs = (
        a.join(b, (F.col("a.doc_id") == F.col("b.doc_id")) & (F.col("a.tok") < F.col("b.tok")))
        .groupBy(F.col("a.tok").alias("tok_a"), F.col("b.tok").alias("tok_b"))
        .agg(F.count("*").alias("c_ab"))
    )
    return (
        pairs.join(F.broadcast(marg.select(F.col("tok").alias("tok_a"), F.col("c").alias("c_a"))), "tok_a")
        .join(F.broadcast(marg.select(F.col("tok").alias("tok_b"), F.col("c").alias("c_b"))), "tok_b")
        .join(F.broadcast(n))
        .select(
            "tok_a",
            "tok_b",
            F.col("c_ab").cast("bigint").alias("c_ab"),
            F.round((F.col("n_docs") * F.col("c_ab")) / (F.col("c_a") * F.col("c_b")), 4).alias("lift"),
        )
    )


# HyperLogLog sketch parameters: m = 2^HLL_P registers; rho measured over
# HLL_W hash bits (15 md5 nibbles = 60 bits, < 2^63 everywhere); the
# register power-sum is scaled by 2^HLL_W so it stays an exact integer
# (64 registers × 2^60 < 2^66 would overflow — rho is capped at HLL_W,
# giving sum ≤ m·2^HLL_W-per-register bounded by construction below).
HLL_P = 6  # 64 registers
HLL_M = 1 << HLL_P
HLL_W = 40  # power-sum scale bits; rho > 40 clamps (P(rho>40) ≈ 2^-40)
# alpha_64 = 0.7213/(1 + 1.079/64), the standard HLL bias constant
HLL_ALPHA = 0.7213 / (1 + 1.079 / 64)


def _hll_fields(wd):
    """(bucket, v) for a word: bucket = first 8 md5 bits mod m; v = the
    next 60 hash bits (15 nibbles) from which rho (leading-zero count
    + 1, via the binary-string length — the log2q primitive) is derived
    AFTER v materializes as a column. Portable nibble arithmetic,
    bit-identical in DuckDB."""
    h = F.md5(wd)
    b = None
    for i in range(2):
        nib = (F.instr(F.lit(_HEXMAP), F.substring(h, i + 1, 1)) - 1).cast("long")
        b = nib if b is None else b * 16 + nib
    v = None
    for i in range(2, 17):
        nib = (F.instr(F.lit(_HEXMAP), F.substring(h, i + 1, 1)) - 1).cast("long")
        v = nib if v is None else v * 16 + nib
    return (b % HLL_M).alias("bucket"), v.alias("v")


def hll_distinct_words(spark, sf_dir) -> DataFrame:
    """Cross-engine-exact HyperLogLog: per-source distinct-word estimate
    from 64 max-registers — the mergeable cardinality sketch every
    distributed OLAP engine ships (Flajolet et al. 2007), built so even
    the ESTIMATE replays bit-for-bit in DuckDB: md5-nibble bucket/rho,
    and the harmonic-mean denominator kept as an exact integer
    Σ 2^(W−min(rho,W)) (a float Σ2^−rho rounds order-dependently once
    exponents span > 53 bits; the scaled-integer sum never rounds). The
    raw estimate α·m²·2^W / S divides identical exact operands → one
    IEEE division, then round(,4).

    Scale shape: THE point of a sketch — registers are max-mergeable, so
    the shuffle is ONE (source, bucket) max-aggregation with map-side
    combine: 10^12 words collapse to ≤ 64 rows per source per task, and
    register tables from different days/partitions union+max without
    rescanning anything. ``n_exact`` (count_distinct) rides along here
    as the accuracy reference; at real scale you would ship only the
    sketch. No small/large-range corrections (documented raw-HLL
    regime; the test pins relative error ≪ the 1.04/√64 = 13% bound).
    """
    d = _docs(spark, sf_dir).select("source", "text")
    words = d.select("source", F.explode(F.split("text", " ")).alias("w"))
    bucket, v = _hll_fields(F.col("w"))
    fields = words.select("source", bucket, v).select(
        "source",
        "bucket",
        F.when(F.col("v") == 0, F.lit(61))
        .otherwise(F.lit(61) - (F.length(F.expr("bin(v)"))))
        .cast("int")
        .alias("rho"),
    )
    regs = fields.groupBy("source", "bucket").agg(F.max("rho").alias("m_rho"))
    per_src = regs.groupBy("source").agg(
        F.count("*").alias("n_regs"),
        F.sum(
            F.expr(f"shiftleft(cast(1 as bigint), {HLL_W} - least(m_rho, {HLL_W}))")
        ).alias("s_used"),
    )
    exact = (
        words.distinct()
        .groupBy("source")
        .agg(F.count("*").cast("int").alias("n_exact"))
    )
    # small-range regime (raw <= 2.5m with empty registers): standard HLL
    # switches to linear counting m·ln(m/V). ln via the log2q primitive
    # (· ln2) so the corrected estimate is STILL cross-engine exact — a
    # float ln(m/V) is not guaranteed bit-identical between libm and the
    # JVM, log2q is integers.
    # alpha is CAST to DOUBLE explicitly: both engines would otherwise
    # parse the long literal as DECIMAL (Spark silently widens to
    # DECIMAL(38), DuckDB overflows DECIMAL(18) — and decimal vs double
    # arithmetic would diverge between them anyway)
    raw = (
        f"CAST({HLL_ALPHA} AS DOUBLE) * {HLL_M} * {HLL_M} "
        f"* shiftleft(cast(1 as bigint), {HLL_W}) "
        f"/ (s_used + ({HLL_M} - n_regs) * shiftleft(cast(1 as bigint), {HLL_W}))"
    )
    s1 = per_src.select(
        "source",
        F.expr(f"{HLL_M} - n_regs").alias("v_empty"),
        F.expr(raw).alias("raw"),
    )
    s2 = s1.select(
        "source",
        "raw",
        "v_empty",
        F.expr(
            f"IF(v_empty > 0, ({HLL_M} * {1 << 20}) div v_empty, 1)"
        ).alias("lcr"),
    )
    est = s2.select(
        "source",
        F.expr(
            f"CASE WHEN raw <= {2.5 * HLL_M} AND v_empty > 0 THEN "
            f"round(({HLL_M} * ({_log2q_sql('lcr')} - {20 * LOG2Q_FBITS})) "
            f"* CAST(0.6931471805599453 AS DOUBLE) / {LOG2Q_FBITS}.0, 4) "
            "ELSE round(raw, 4) END"
        ).alias("hll_est"),
    )
    return exact.join(est, "source").select("source", "n_exact", "hll_est")


# Count-min sketch params: CM_D independent hash rows x CM_W counters.
# Error bound: est - true <= 2N/CM_W with prob >= 1 - 2^-CM_D (Cormode &
# Muthukrishnan 2005); the est >= true side is unconditional, which the
# tests pin. Buckets come from disjoint md5 nibble pairs (row i reads hex
# chars 2i..2i+1), so the CM_D hashes are independent-enough and --- like
# the HLL/rolling-hash rows --- bit-identical in DuckDB.
CM_D = 4
CM_W = 64


def _cm_bucket(wd, row: int):
    """Counter index of word ``wd`` in sketch row ``row``: two md5
    nibbles -> 0..255, mod CM_W. Portable nibble arithmetic (instr over
    the hex alphabet), the same trick as _hll_fields."""
    h = F.md5(wd)
    n1 = (F.instr(F.lit(_HEXMAP), F.substring(h, 2 * row + 1, 1)) - 1).cast("long")
    n2 = (F.instr(F.lit(_HEXMAP), F.substring(h, 2 * row + 2, 1)) - 1).cast("long")
    return (n1 * 16 + n2) % CM_W


def heavy_hitters_cmsketch(spark, sf_dir) -> DataFrame:
    """Cross-engine-exact count-min sketch + heavy-hitter readout: the
    frequency-estimation sketch a training-data pipeline uses to find
    polluting high-frequency tokens/boilerplate WITHOUT a full
    word-keyed aggregation (the word key space at 10^12 docs is the
    expensive shuffle; the sketch is 256 integer cells).

    Build: every word occurrence increments CM_D=4 counters (one per
    hash row, disjoint md5 nibble pairs). Readout: a word's estimate is
    the MIN of its 4 counters — always >= the true count (collisions
    only ever add). Here the readout set is the broadcast DICT_TOKENS
    dictionary, and the exact count rides along as the harness's ground
    truth: ``overest = cm_est - true_cnt`` is the visible collision
    error (>= 0 unconditionally — pinned by tests and by both engines
    agreeing on the identical integers).

    Scale shape: THE sketch argument, same as hll_distinct_words —
    counters are SUM-mergeable, so the build is ONE (row, bucket)
    aggregation with map-side combine: 10^12 occurrences collapse to
    <= 256 rows per task, and sketches from different shards/days add
    without rescanning. The readout joins |dict| rows against the
    broadcast 256-cell sketch. (The exact-count branch exists only for
    error accounting at harness scale; production ships the sketch.)
    """
    d = _docs(spark, sf_dir).select("text")
    words = d.select(F.explode(F.split("text", " ")).alias("w")).filter(
        F.col("w") != ""
    )
    rows = F.array(
        *[
            F.struct(F.lit(r).alias("row"), _cm_bucket(F.col("w"), r).alias("bucket"))
            for r in range(CM_D)
        ]
    )
    cells = (
        words.select(F.explode(rows).alias("c"))
        .select(F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket"))
        .groupBy("row", "bucket")
        .agg(F.count("*").alias("cnt"))
    )
    dict_df = spark.createDataFrame([(t,) for t in DICT_TOKENS], ["word"])
    probes = dict_df.select(
        "word",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        _cm_bucket(F.col("word"), r).alias("bucket"),
                    )
                    for r in range(CM_D)
                ]
            )
        ).alias("p"),
    ).select("word", F.col("p.row").alias("row"), F.col("p.bucket").alias("bucket"))
    est = (
        probes.join(F.broadcast(cells), ["row", "bucket"], "left")
        .groupBy("word")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).cast("bigint").alias("cm_est"))
    )
    true_cnt = (
        words.filter(F.col("w").isin(*DICT_TOKENS))
        .groupBy(F.col("w").alias("word"))
        .agg(F.count("*").alias("tc"))
    )
    return est.join(true_cnt, "word", "left").select(
        "word",
        "cm_est",
        F.coalesce("tc", F.lit(0)).cast("bigint").alias("true_cnt"),
        (F.col("cm_est") - F.coalesce("tc", F.lit(0))).cast("bigint").alias("overest"),
    )


BOTTOMK_K = 5


def bottomk_sample(spark, sf_dir, k: int = BOTTOMK_K) -> DataFrame:
    """Mergeable deterministic uniform sample: per source, the ``k``
    documents with the smallest md5(doc_id) — the bottom-k sketch
    (Cohen & Kaplan 2007). md5 is a fixed uniform-ish rank, so the
    bottom-k set IS a uniform-without-replacement sample that is (a)
    reproducible run-to-run and engine-to-engine (no RNG — the same
    determinism rule as every contract row), and (b) MERGEABLE: the
    bottom-k of a union is the bottom-k of the unioned bottom-k sets,
    so shards/days sample independently and combine without
    re-shuffling the corpus — the property a seeded random sample
    lacks. The pipeline use: eval-set carving and corpus inspection
    panels that stay STABLE as the corpus grows (a doc leaves the
    sample only when a smaller hash arrives).

    Scale shape: ONE exchange on source — and Catalyst derives the
    two-phase distributed top-k automatically from the declarative
    rank<=k filter: a ``WindowGroupLimit`` BELOW the exchange keeps only
    each input partition's local bottom-k, so the shuffle moves
    O(k · partitions) rows per source, not the corpus (plan-pinned in
    tests/test_pipeline_ops.py). At extreme skew a hash-threshold
    pre-filter (h < scaled k/n_est) composes on top; not needed at
    bench scale."""
    from pyspark.sql import Window

    d = _docs(spark, sf_dir).select("source", "doc_id")
    h = d.select(
        "source", "doc_id", F.md5(F.col("doc_id").cast("string")).alias("h")
    )
    w = Window.partitionBy("source").orderBy(F.asc("h"), F.asc("doc_id"))
    return (
        h.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= k)
        .select("source", "rk", "doc_id", "h")
    )


NTILE_BUCKETS = 4


def ntile_histogram(spark, sf_dir, buckets: int = NTILE_BUCKETS) -> DataFrame:
    """Equi-depth histogram of document length per source — the
    optimizer/stats primitive behind skew detection and range-partition
    planning (equi-depth boundaries are what an engine range-partitions
    a 100 TB sort or join on so every task gets equal ROWS, not equal
    key ranges). Deterministic cross-engine: the ntile assignment runs
    over the total order (n_chars asc, doc_id asc) and Spark and DuckDB
    share the ANSI bucket-size rule (first n mod k buckets take the
    extra row), so bucket membership — hence every (count, lo, hi)
    cell — is value-exact.

    Scale shape: ONE exchange on source; the per-source sort is the
    spillable window sort (same shuffle as bottomk_sample, but no group
    limit — every row is assigned). At extreme scale an engine samples
    instead; the exact version IS the ground truth that a sampled
    histogram approximates, and the per-source parallelism is the
    partition layout."""
    from pyspark.sql import Window

    d = _docs(spark, sf_dir).select("source", "doc_id", "n_chars")
    w = Window.partitionBy("source").orderBy(F.asc("n_chars"), F.asc("doc_id"))
    return (
        d.withColumn("q", F.ntile(buckets).over(w))
        .groupBy("source", "q")
        .agg(
            F.count("*").cast("bigint").alias("n_docs_q"),
            F.min("n_chars").cast("bigint").alias("lo"),
            F.max("n_chars").cast("bigint").alias("hi"),
        )
        .select("source", F.col("q").cast("int").alias("q"), "n_docs_q", "lo", "hi")
    )


QSKETCH_QS = (25, 50, 75, 95)


def qsketch_cells(d: DataFrame) -> DataFrame:
    """The sketch STATE: per (source, log2-bucket) document counts.

    bucket = length(bin(n_chars)) = floor(log2 n_chars) + 1 (bucket 1
    holds {0,1}), so a BIGINT domain needs at most 64 cells per source.
    This is the mergeable half of the operator: cells from different
    shards/days merge by SUMMING counts (asserted in tests), which is
    what makes it the 100 TB path — each ingest batch contributes its
    cells without ever rescanning history, exactly like the HLL
    register max-merge and count-min cell sum-merge beside it.
    """
    return d.groupBy(
        "source", F.length(F.bin("n_chars")).cast("int").alias("bucket")
    ).agg(F.count("*").cast("bigint").alias("cnt"))


def qsketch_quantiles(cells: DataFrame, qs=QSKETCH_QS) -> DataFrame:
    """Quantile READOUT from sketch cells — pure integer arithmetic.

    Rank rule: r = ceil(q*n/100) as (q*n + 99) div 100; the estimate
    interpolates linearly inside the containing bucket's exact integer
    bounds [lo, hi] with a single div, so both engines produce the
    identical BIGINT (a float lerp would differ in the last ulp).
    """
    from pyspark.sql import Window

    w_cum = Window.partitionBy("source").orderBy("bucket")
    w_all = Window.partitionBy("source")
    qarr = F.array(*[F.lit(int(q)) for q in qs])
    return (
        cells.withColumn("cum", F.sum("cnt").over(w_cum))
        .withColumn("n_docs", F.sum("cnt").over(w_all))
        .withColumn("q", F.explode(qarr))
        .withColumn("r", F.expr("(q * n_docs + 99) div 100"))
        .filter((F.col("cum") - F.col("cnt") < F.col("r")) & (F.col("r") <= F.col("cum")))
        .withColumn(
            "lo",
            F.expr(
                "CASE WHEN bucket = 1 THEN CAST(0 AS BIGINT) "
                "ELSE shiftleft(CAST(1 AS BIGINT), bucket - 1) END"
            ),
        )
        .withColumn("hi", F.expr("shiftleft(CAST(1 AS BIGINT), bucket) - 1"))
        .select(
            "source",
            F.col("q").cast("int").alias("q"),
            F.col("n_docs").cast("bigint").alias("n_docs"),
            "bucket",
            "lo",
            "hi",
            F.expr(
                "CAST(lo + ((hi - lo) * (r - (cum - cnt) - 1)) "
                "div greatest(cnt - 1, CAST(1 AS BIGINT)) AS BIGINT)"
            ).alias("est_chars"),
        )
    )


def quantile_sketch(spark, sf_dir) -> DataFrame:
    """Mergeable quantile sketch of document length per source — the
    SCALE path beside ``ntile_histogram``'s exact equi-depth readout.

    ntile is the ground truth but costs a per-source SORT of every row
    (the spillable window sort); at 10^12 rows an engine keeps a sketch
    instead. This one is the log2 histogram: the corpus collapses
    map-side into <= 64 (source, bucket) cells — the ONLY exchange that
    sees data carries cells, not documents, and cells sum-merge across
    shards/days/streams without rescanning history. The quantile
    readout (rank walk + in-bucket integer interpolation) runs on the
    sketch alone, so its windows/joins touch <= 64 rows per source.
    Error is bounded by the bucket width (relative error <= 2x, i.e.
    exact to the binary order of magnitude) — the right tradeoff for
    skew detection and range-partition planning, where the planner
    needs "which decade is p95 in", not the exact character count;
    tests assert the exact ntile-rule quantile falls inside every
    reported [lo, hi].
    """
    d = _docs(spark, sf_dir).select("source", "n_chars")
    return qsketch_quantiles(qsketch_cells(d))


OVERLAP_K = 64


def overlap_bottomk(spark, sf_dir, k: int = OVERLAP_K) -> DataFrame:
    """Cross-source vocabulary-overlap estimation from bottom-k word
    sketches (Cohen & Kaplan 2007; the theta-sketch intersection idiom
    every warehouse ships as ``theta_intersect``): estimate the Jaccard
    similarity of every source pair's vocabulary WITHOUT joining
    vocabularies — each source keeps only its k smallest md5(word)
    hashes, and for a pair the fraction of the union-sketch's bottom-k
    that lies in BOTH sides is an unbiased Jaccard estimate (stderr
    ~ sqrt(J(1-J)/k)). The pipeline use: corpus-mixture planning and
    cross-crawl contamination screens over 10^4 sources whose pairwise
    exact joins would be 10^8 vocabulary intersections.

    Scale shape: distinct (source, word) is the only corpus-sized
    shuffle; the per-source bottom-k then rides the SAME
    WindowGroupLimit two-phase top-k as bottomk_sample (each input
    partition ships only its local bottom-k). Everything after operates
    on <= sources x k sketch rows: the pair table (sources^2/2, itself
    dictionary-bounded) joins the sketch rows via a broadcast
    nested-loop against the TINY sketch side — bounded by construction,
    like every other dictionary crossJoin in this repo. Sketches
    sum-merge across shards/days (bottom-k of a union == bottom-k of
    unioned bottom-k sets — asserted for bottomk_sample), so day-2
    estimation never rescans old corpora.

    Cross-engine: md5 ranks, integer counts, one round(x,4) on an
    identical double division — the standard portability kit.
    """
    from pyspark.sql import Window

    d = _docs(spark, sf_dir)
    words = d.select(
        "source", F.explode(F.split("text", " ")).alias("w")
    ).filter(F.length("w") > 0)
    hashed = words.select("source", F.md5("w").alias("h")).distinct()
    w = Window.partitionBy("source").orderBy(F.asc("h"))
    bk = (
        hashed.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("source", "h")
    )
    srcs = bk.select("source").distinct()
    pairs = (
        srcs.select(F.col("source").alias("sa"))
        .join(srcs.select(F.col("source").alias("sb")), F.col("sa") < F.col("sb"))
    )
    # pair x sketch membership: theta join against the <= sources*k
    # sketch frame (tiny, broadcast) — GROUP BY collapses each hash's
    # two possible rows into union membership flags
    u = (
        pairs.join(
            F.broadcast(bk),
            (F.col("source") == F.col("sa")) | (F.col("source") == F.col("sb")),
        )
        .groupBy("sa", "sb", "h")
        .agg(
            F.max(F.when(F.col("source") == F.col("sa"), 1).otherwise(0)).alias("ina"),
            F.max(F.when(F.col("source") == F.col("sb"), 1).otherwise(0)).alias("inb"),
        )
    )
    wu = Window.partitionBy("sa", "sb").orderBy(F.asc("h"))
    ranked = u.withColumn("urk", F.row_number().over(wu)).filter(F.col("urk") <= k)
    return (
        ranked.groupBy(F.col("sa").alias("source_a"), F.col("sb").alias("source_b"))
        .agg(
            F.count("*").cast("int").alias("ku"),
            F.sum(F.col("ina") * F.col("inb")).cast("int").alias("inter"),
        )
        .withColumn("jaccard_est", F.round(F.col("inter") / F.col("ku"), 4))
    )


SAMPLE_W_K = 100
SAMPLE_W_MAX = 8


def sample_weighted(spark, sf_dir, k: int = SAMPLE_W_K, salt: str = "") -> DataFrame:
    """EXACT weight-proportional sampling without replacement, no RNG:
    the min-of-w-uniforms trick. A doc with integer weight w gets w
    deterministic md5 replicas keyed (doc_id, replica, salt); its key
    is the MINIMUM — distributed like the minimum of w iid uniforms, so
    P(doc_i outranks doc_j) = w_i / (w_i + w_j), which is precisely the
    A-ES / Efraimidis-Spirakis weighted-sampling order for integer
    weights (u^(1/w) ~ max of w uniforms, mirrored). The global
    bottom-k by that key IS a weighted sample: deterministic,
    shard-stable, replayable in any engine — and re-keyable by salt for
    independent draws (the statistical test sweeps salts and recovers
    the 8:1 inclusion ratio).

    Weights here: least(8, 1 + n_chars div 256) — longer documents
    proportionally more likely, the "sample long-context training data
    preferentially" knob.

    Scale shape: ZERO pre-limit shuffles — the replica minimum folds
    in-row via transform+array_min (no explode, no doc_id re-agg), and
    the global bottom-k is TakeOrderedAndProject (per-partition local
    top-k, driver merge of k x partitions rows). The DuckDB oracle
    replays via unnest+group-min — engine-idiomatic, identical keys.
    """
    d = _docs(spark, sf_dir)
    w = F.least(F.lit(SAMPLE_W_MAX), F.expr("1 + n_chars div 256")).cast("int")
    wkey = F.array_min(
        F.transform(
            F.sequence(F.lit(1), F.col("w")),
            lambda r: F.md5(
                F.concat(
                    F.col("doc_id").cast("string"),
                    F.lit(":"),
                    r.cast("string"),
                    F.lit(":"),
                    F.lit(salt),
                )
            ),
        )
    )
    return (
        d.select("doc_id", w.alias("w"))
        .withColumn("wkey", wkey)
        .orderBy("wkey", "doc_id")
        .limit(k)
    )


CHUNK_W = 64  # tokens per chunk
CHUNK_S = 48  # stride; overlap = CHUNK_W - CHUNK_S = 16 tokens


def chunk_sliding(
    spark, sf_dir, window: int = CHUNK_W, stride: int = CHUNK_S
) -> DataFrame:
    """RAG/embedding-style sliding-window chunking: split each document
    into overlapping windows of ``window`` whitespace tokens advancing
    by ``stride`` (trailing chunk keeps the remainder), emitting
    (doc_id, chunk_idx, start_tok, n_tok, chunk_text). The complement
    of pack_sequences: packing concatenates SHORT docs up to a context
    budget, chunking splits LONG docs down to one — together they are
    the two halves of context-window shaping for training/retrieval
    corpora.

    Scale shape: ZERO shuffles — whitespace-collapse, tokenize, the
    start-offset sequence, the posexplode into chunk rows, and the
    slice+join chunk assembly are all per-row JVM expressions (one
    Generate, no Exchange; plan-pinned). Row growth is bounded by
    ceil(n_tok / stride) per doc, linear in corpus token count — at
    100 TB the op is a pure map stage that pipelines into whatever
    shuffle the downstream embedder/indexer needs. The DuckDB oracle
    replays the identical arithmetic (generate_series + 1-based
    inclusive list slice); chunk_idx is derived as
    (start_tok - 1) // stride in both engines.
    """
    d = _docs(spark, sf_dir)
    # explicit class, not \s: Java's \s matches \x0B, RE2's does not —
    # the one shorthand divergence that would break the oracle replay
    norm = F.trim(F.regexp_replace(F.col("text"), r"[ \t\n\f\r]+", " "))
    e = (
        d.select("doc_id", F.split(norm, " ").alias("toks"), norm.alias("norm"))
        # trim strips only 0x20 in both engines, so filter the COLLAPSED
        # text — a tabs/newlines-only doc must emit nothing
        .filter(F.length("norm") > 0)
        .select("doc_id", "toks")
        .select(
            "doc_id",
            "toks",
            F.posexplode(
                F.sequence(F.lit(1), F.size("toks"), F.lit(stride))
            ).alias("chunk_idx", "start_tok"),
        )
    )
    return e.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.col("start_tok").cast("int").alias("start_tok"),
        F.least(F.lit(window), F.size("toks") - F.col("start_tok") + 1)
        .cast("int")
        .alias("n_tok"),
        F.array_join(F.slice("toks", F.col("start_tok"), window), " ").alias(
            "chunk_text"
        ),
    )


PIVOT_LANGS = ("de", "en", "es", "fr", "zh")


def lang_source_pivot(spark, sf_dir) -> DataFrame:
    """Wide lang-per-source matrix via DataFrame pivot — the reshape
    every corpus-composition dashboard wants (one row per source, one
    column per language, counts in the cells).

    Scale shape: the pivot value list is PINNED (PIVOT_LANGS), so Spark
    skips the extra values-discovery job an unpinned pivot runs (a full
    distinct over the pivot column — a whole corpus scan at 100 TB).
    The plan is two map-side-combined aggregations: a (source, lang)
    cell count whose shuffle carries at most sources x |langs| cells,
    then pivot_first over the already-tiny cell frame. Unseen combos
    coalesce to 0 so the frame is dense and NULL-free; the DuckDB
    oracle is the classic conditional-aggregation spelling
    (count(*) FILTER (WHERE lang = ...)), value-identical.
    """
    p = (
        _docs(spark, sf_dir)
        .groupBy("source")
        .pivot("lang", list(PIVOT_LANGS))
        .count()
    )
    return p.select(
        "source",
        *[
            F.coalesce(F.col(lang), F.lit(0)).cast("int").alias(f"n_{lang}")
            for lang in PIVOT_LANGS
        ],
    )


BUDGET_NUM, BUDGET_DEN = 1, 2  # per-source token budget = 1/2 of source mass
BUDGET_Q_SCALE = 100_000       # quality = stopword hits per 10^5 words (int)


def budget_select(spark, sf_dir) -> DataFrame:
    """Quality-ranked data selection under a per-source token budget —
    the "pick the best N tokens per domain" step that turns a filtered
    corpus into a training mix (cf. the budget/mixing stage in every
    LLM data pipeline). Each source keeps its highest-quality documents
    until BUDGET_NUM/BUDGET_DEN of the source's token mass is spent.

    Shape for scale — threshold selection, NOT a per-document sort: a
    per-source ordered prefix over 10^11 documents would sort whole
    domains on single partitions. Instead (1) docs aggregate into
    (source, quality-class) token masses — one map-side-combined
    shuffle whose key space is bounded by sources x quality classes
    (quality is an INTEGER rate, <= BUDGET_Q_SCALE+1 distinct values);
    (2) the tiny class frame takes an ordered cumulative sum per source
    (descending quality); (3) the keep/cut verdict per class broadcasts
    back onto the doc stream. Whole classes are kept or cut — never
    split — so the decision is a pure function of (source, quality) and
    re-runs/retries agree row-for-row. Per-doc work is hash-agg +
    broadcast-probe only; nothing ever sorts documents.

    Cross-engine exactness: quality is the all-integer stopword rate
    ``(BUDGET_Q_SCALE * the_hits) DIV n_words`` (the " the " counter of
    quality_score, integer-divided); the budget test multiplies through
    (``cum * DEN <= total * NUM``) so no fraction is ever materialized.
    """
    d = _docs(spark, sf_dir)
    text = F.col("text")
    n_words = F.size(F.split(text, " "))
    the_hits = (
        (F.length(text) - F.length(F.replace(text, F.lit(" the "), F.lit(""))))
        / F.lit(5)
    ).cast("bigint")
    base = d.select(
        "doc_id",
        "source",
        n_words.cast("bigint").alias("n_toks"),
        (F.lit(BUDGET_Q_SCALE).cast("bigint") * the_hits).alias("q_num"),
    ).select(
        "doc_id",
        "source",
        "n_toks",
        F.expr("q_num DIV n_toks").alias("quality_q"),
    )
    cls = base.groupBy("source", "quality_q").agg(
        F.sum("n_toks").alias("t_q")
    )
    wsrc = Window.partitionBy("source")
    wcum = wsrc.orderBy(F.col("quality_q").desc())
    verdict = cls.select(
        "source",
        "quality_q",
        (
            F.sum("t_q").over(wcum) * BUDGET_DEN
            <= F.sum("t_q").over(wsrc) * BUDGET_NUM
        )
        .cast("int")
        .alias("kept"),
    )
    return base.join(F.broadcast(verdict), ["source", "quality_q"]).select(
        "doc_id", "source", "quality_q", "n_toks", "kept"
    )


TFIDF_TOPK = 5
TFIDF_RATIO_SCALE = 1 << 20  # N/df fixed point fed to log2q


def tfidf_top_terms(spark, sf_dir, k: int = TFIDF_TOPK) -> DataFrame:
    """Per-document top-k keywords by tf-idf — the corpus-summarization
    / tagging primitive (inspection panels, topic routing, weak labels
    for quality classifiers). Everything integer so the DuckDB oracle
    replays every score bit-for-bit: idf_q = log2q((N * 2^20) DIV df)
    - 20*FBITS (>= 0, exactly 0 for corpus-universal words), score_q =
    tf * idf_q; float tf-idf would drift in the last ulp and flip
    tie-adjacent ranks between engines.

    Shape for scale: per-doc (word, tf) pairs are built IN-ROW
    (array_distinct + a nested higher-order filter — O(u*n) per doc,
    JVM codegen, no (doc, word) pre-aggregation shuffle); document
    frequency is a map-side-combined aggregate over the exploded
    distinct words whose key space is the VOCABULARY, not the corpus;
    the resulting idf frame broadcasts back onto the pair stream
    (BroadcastHashJoin — no corpus-side shuffle); zero-idf words
    (df = N) are cut BEFORE the ranking exchange, so the only wide
    exchange in the plan is the final per-doc top-k window on doc_id,
    and Spark's rank-limit pushdown (WindowGroupLimit) ships only each
    partition's local top-k candidates through it.

    Ties: (score_q DESC, word ASC) — word is unique within a doc, so
    the order is total and both engines pick identical rows.
    """
    d = _docs(spark, sf_dir)
    pairs = (
        d.select("doc_id", F.split("text", " ").alias("ws"))
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(array_distinct(ws), w -> "
                    "struct(w AS word, size(filter(ws, x -> x = w)) AS tf))"
                )
            ).alias("p"),
        )
        .select("doc_id", "p.word", "p.tf")
        .filter(F.col("word") != "")
    )
    n_docs = d.select(F.count("*").alias("n_docs"))
    idf = (
        pairs.groupBy("word")
        .agg(F.count("*").alias("df"))
        .join(F.broadcast(n_docs))
        .select(
            "word",
            F.expr(f"n_docs * {TFIDF_RATIO_SCALE}L DIV df").alias("sr"),
        )
        .select(
            "word",
            F.expr(_log2q_sql("sr") + f" - {20 * LOG2Q_FBITS}").alias("idf_q"),
        )
        .filter(F.col("idf_q") > 0)
    )
    scored = pairs.join(F.broadcast(idf), "word").select(
        "doc_id",
        "word",
        "tf",
        "idf_q",
        (F.col("tf").cast("long") * F.col("idf_q")).alias("score_q"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score_q").desc(), F.col("word").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            "doc_id",
            "word",
            F.col("tf").cast("int").alias("tf"),
            F.col("idf_q").cast("bigint").alias("idf_q"),
            F.col("score_q").cast("bigint").alias("score_q"),
            F.col("rk").cast("int").alias("rk"),
        )
    )


BPE_TOPK = 10
BPE_SENT = "\ue000"  # private-use sentinel standing in for the merged symbol


def bpe_merges(spark, sf_dir, k: int = BPE_TOPK) -> DataFrame:
    """BPE vocabulary induction, two unrolled merge rounds (Sennrich et
    al. 2016) — the tokenizer-training primitive of every LLM data
    pipeline. Round 1 ranks adjacent character pairs by corpus count;
    the winning pair is merged into one symbol and round 2 re-ranks on
    the merged text. Output: top-k (merge_round, pair, cnt, rk) rows per
    round, round-2 pairs displayed with the merged symbol expanded.

    Shape for scale — the classic BPE trick: pair statistics are
    computed over the *word-frequency table*, never the raw token
    stream. 10^12 corpus words collapse into one vocab-keyed map-side-
    combined aggregate; pair generation is an in-row higher-order
    transform over vocab entries (JVM codegen, O(len) per word); the
    pair aggregate's key space is the symbol-alphabet square, so its
    shuffle is corpus-size-independent, and the top-k is
    TakeOrderedAndProject over that bounded frame (no SinglePartition
    sort of anything corpus-sized). The round-1 winner joins back as a
    broadcast 1-row nested-loop side; the vocab frame is scoped_persist-
    cached because both rounds and the winner selection consume it.

    Cross-engine exactness: counts are integers; the merge is leftmost
    non-overlapping ``replace`` in both engines (exactly BPE's
    left-to-right merge order at round 0, where both pieces are single
    characters); ties rank (cnt DESC, pair ASC) — pair is unique after
    the aggregate, so the order is total. The sentinel is a single BMP
    private-use codepoint, counted as one character by both engines'
    ``length``/``substring``.
    """
    d = _docs(spark, sf_dir)
    vocab = scoped_persist(
        d.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("c"))
    )

    def pair_counts(frame: DataFrame) -> DataFrame:
        # sequence(1, 0) is DESCENDING in Spark — the length guard is
        # load-bearing, not cosmetic
        return (
            frame.filter(F.length("w") >= 2)
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(1, length(w) - 1), "
                        "i -> substring(w, i, 2))"
                    )
                ).alias("pair"),
                "c",
            )
            .groupBy("pair")
            .agg(F.sum("c").alias("cnt"))
        )

    def topk(frame: DataFrame) -> DataFrame:
        ranked = frame.orderBy(F.col("cnt").desc(), F.col("pair").asc()).limit(k)
        w = Window.orderBy(F.col("cnt").desc(), F.col("pair").asc())
        return ranked.withColumn("rk", F.row_number().over(w))

    r1 = scoped_persist(topk(pair_counts(vocab)))
    top1 = r1.filter(F.col("rk") == 1).select(F.col("pair").alias("p0"))
    merged = vocab.crossJoin(F.broadcast(top1)).select(
        F.replace(F.col("w"), F.col("p0"), F.lit(BPE_SENT)).alias("w"), "c"
    )
    r2 = topk(pair_counts(merged)).crossJoin(F.broadcast(top1))
    out1 = r1.select(
        F.lit(1).cast("int").alias("merge_round"),
        "pair",
        F.col("cnt").cast("bigint").alias("cnt"),
        F.col("rk").cast("int").alias("rk"),
    )
    out2 = r2.select(
        F.lit(2).cast("int").alias("merge_round"),
        F.replace(F.col("pair"), F.lit(BPE_SENT), F.col("p0")).alias("pair"),
        F.col("cnt").cast("bigint").alias("cnt"),
        F.col("rk").cast("int").alias("rk"),
    )
    return out1.unionByName(out2)


BIGRAM_RATIO_SCALE = 1 << 20


def bigram_lm_score(spark, sf_dir) -> DataFrame:
    """Bigram-LM (first-order conditional) surprisal per document — the
    sharper wellformedness signal the unigram ``perplexity_filter``
    misses: a document of real words in scrambled order scores
    identically under a unigram LM, while the bigram model penalizes
    implausible transitions. Add-one smoothing over the corpus
    vocabulary: P(w2|w1) = (c(w1,w2) + 1) / (c1(w1) + V), where c1
    counts CONTEXT occurrences (w1 positions of the bigram stream, so
    sum_w2 c(w1,w2) == c1(w1) exactly) and V is the distinct unigram
    vocabulary. Surprisal is integer log2q of the inverted ratio —
    sr >= 2^20 always (c1 >= cb, V >= 1), so scores are non-negative
    integers and DuckDB replays the doc sums bit-for-bit.

    Shape for scale: the bigram stream is built IN-ROW from the split
    array (element_at over sequence(2, n) — no positional self-join,
    which would shuffle the corpus twice on (doc_id, pos)); bigram and
    context counts are map-side-combined aggregates keyed by the
    OBSERVED bigram/context vocabulary, not the corpus; V is a 1-row
    broadcast; scoring joins the stream on the (w1, w2) key —
    auto-broadcast at bench scale, a plain shuffle join at web scale
    (the same honest posture as perplexity_filter); the per-doc mean
    shuffles once on doc_id. Sub-2-word docs have no bigrams and are
    not emitted (their wellformedness is the unigram filter's
    jurisdiction). Spark's sequence(2, 1) would be DESCENDING — the
    size >= 2 guard is load-bearing.
    """
    d = _docs(spark, sf_dir).select("doc_id", "text")
    bi = (
        d.select("doc_id", F.split("text", " ").alias("ws"))
        .filter(F.size("ws") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(2, size(ws)), i -> struct("
                    "element_at(ws, i - 1) AS w1, element_at(ws, i) AS w2))"
                )
            ).alias("b"),
        )
        .select("doc_id", "b.w1", "b.w2")
    )
    vocab = d.select(F.explode(F.split("text", " ")).alias("w")).agg(
        F.count_distinct("w").alias("v_size")
    )
    cb = bi.groupBy("w1", "w2").agg(F.count("*").alias("cb"))
    c1 = bi.groupBy("w1").agg(F.count("*").alias("c1"))
    sur = (
        cb.join(c1, "w1")
        .join(F.broadcast(vocab))
        .select(
            "w1",
            "w2",
            F.expr(f"(c1 + v_size) * {BIGRAM_RATIO_SCALE} div (cb + 1)").alias(
                "sr"
            ),
        )
        .select(
            "w1",
            "w2",
            F.expr(f"{_log2q_sql('sr')} - {20 * LOG2Q_FBITS}").alias("sq"),
        )
    )
    return (
        bi.join(sur, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("int").alias("n_bigrams"),
            F.sum("sq").cast("bigint").alias("sur_sum"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "sur_sum",
            F.expr("sur_sum div n_bigrams").cast("bigint").alias("sur_avg"),
        )
    )


def temperature_sample(spark, sf_dir) -> DataFrame:
    """Temperature-based source rebalancing at α = 1/2 — the
    multilingual/multi-domain mixing rule (sample sources ∝ mass^α so
    giant domains stop drowning small ones; the XLM-R / mT5 recipe).
    Keep rate per source = sqrt(m_min / m_s): the smallest source keeps
    everything, a 100× bigger source keeps 10% — post-sample masses are
    ∝ sqrt(m_s).

    Shape for scale: token masses collapse into one source-keyed
    map-side-combined aggregate (key space = |sources|); the per-source
    threshold frame (tiny) broadcasts back onto the doc stream; the
    keep verdict is a pure function of (doc_id, source) via the md5
    u32 — task retries, reruns, and the DuckDB oracle agree
    row-for-row, and no document-level sort or rand() exists anywhere.

    Cross-engine exactness: the threshold is
    floor((2^32 · sqrt(m_min)) / sqrt(m_s)) — two IEEE sqrts, one
    multiply, one divide, one floor, in the IDENTICAL order in both
    engines (each op correctly rounded on identical inputs ⇒ identical
    doubles ⇒ identical floor). For the smallest source the ratio is
    the same double divided by itself = exactly 1.0, so t_q = 2^32
    keeps every row.
    """
    d = _docs(spark, sf_dir)
    base = d.select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("bigint").alias("n_toks"),
    )
    masses = base.groupBy("source").agg(F.sum("n_toks").alias("m_s"))
    mn = masses.agg(F.min("m_s").alias("m_min"))
    thr = (
        masses.crossJoin(F.broadcast(mn))
        .select(
            "source",
            F.expr(
                f"CAST(floor(({_U32}D * sqrt(CAST(m_min AS DOUBLE))) "
                "/ sqrt(CAST(m_s AS DOUBLE))) AS BIGINT)"
            ).alias("t_q"),
        )
    )
    u32 = _hex32(F.md5(F.concat_ws(":", F.col("doc_id"), F.col("source"))))
    return base.join(F.broadcast(thr), "source").select(
        "doc_id",
        "source",
        "n_toks",
        "t_q",
        (u32 < F.col("t_q")).cast("int").alias("kept"),
    )


WINSOR_LO_PCT, WINSOR_HI_PCT = 10, 90


def winsorize_bounds(spark, sf_dir) -> DataFrame:
    """Per-source exact-rank winsorization of document length — the
    robust-scaling step before length-based quality features (a handful
    of giant or empty documents otherwise dominate any mean/variance
    normalization). Bounds are ORDER STATISTICS, not approximations:
    lo = the (1 + (n-1)·10 DIV 100)-th value, hi = the 90% twin, per
    source, under the TOTAL order (n_chars, doc_id) — so both engines
    pick the identical bound rows and the clamp replays bit-for-bit
    (approximate quantiles have no cross-engine contract; the sketch
    path for web scale is ``quantile_sketch``).

    Shape for scale: ONE source-keyed window shuffle computes ranks
    (exact per-group quantiles genuinely cost a per-group sort — that
    is the honest price, paid once; sources are the partition key so
    the sort never goes global); per-source counts ride the same
    window; the tiny (source, lo, hi) frame broadcasts back onto the
    doc stream for the clamp.
    """
    d = _docs(spark, sf_dir).select("doc_id", "source", "n_chars")
    w = Window.partitionBy("source").orderBy(
        F.col("n_chars").asc(), F.col("doc_id").asc()
    )
    ranked = d.select(
        "doc_id",
        "source",
        "n_chars",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("source")).alias("n"),
    )
    bounds = (
        ranked.filter(
            (F.col("rn") == 1 + F.expr(f"(n - 1) * {WINSOR_LO_PCT} DIV 100"))
            | (F.col("rn") == 1 + F.expr(f"(n - 1) * {WINSOR_HI_PCT} DIV 100"))
        )
        .groupBy("source")
        .agg(
            F.min("n_chars").cast("int").alias("lo"),
            F.max("n_chars").cast("int").alias("hi"),
        )
    )
    return d.join(F.broadcast(bounds), "source").select(
        "doc_id",
        "source",
        F.col("n_chars").cast("int").alias("n_chars"),
        "lo",
        "hi",
        F.least(F.greatest(F.col("n_chars"), F.col("lo")), F.col("hi"))
        .cast("int")
        .alias("clamped"),
    )


def dup_rate_by_source(spark, sf_dir) -> DataFrame:
    """Per-source exact-duplicate rate — the "which domain is spammy"
    report that decides where aggressive dedup budgets go (web crawls
    routinely show order-of-magnitude dup-rate differences by host).
    Two map-side-combined aggregates: (source, content-md5) group
    sizes, then per-source doc/distinct totals; the integer rate is
    10000·(n_docs − n_distinct) DIV n_docs. Key spaces: distinct
    contents, then |sources| — nothing corpus-keyed leaves the second
    exchange."""
    d = _docs(spark, sf_dir)
    g = d.groupBy("source", F.md5("text").alias("h")).agg(
        F.count("*").alias("n")
    )
    return (
        g.groupBy("source")
        .agg(
            F.sum("n").cast("bigint").alias("n_docs"),
            F.count("*").cast("bigint").alias("n_distinct"),
        )
        .select(
            "source",
            "n_docs",
            "n_distinct",
            F.expr("10000 * (n_docs - n_distinct) DIV n_docs")
            .cast("int")
            .alias("dup_rate_q"),
        )
    )


BPE_SENT2 = ""  # second merge round's symbol


def bpe_encode(spark, sf_dir) -> DataFrame:
    """Apply the induced BPE merges (the two bpe_merges rounds) to every
    document and report the compression — the tokenizer-fertility eval
    run before committing a vocabulary (chars per symbol decides context
    -window economics; fertility regressions are how bad merge tables
    get caught). Each document's words are encoded with merge 1 then
    merge 2 (leftmost non-overlapping ``replace``, BPE's merge order);
    symbols = characters after both rewrites, so
    n_symbols = Σ length(merged word).

    Shape for scale: the two winner pairs are 1-row broadcast sides
    (the same TakeOrdered frames bpe_merges ranks — winner selection
    re-runs here; production would read the stored merge table); the
    encode itself is a zero-shuffle map over the corpus — the only
    exchange below is none at all: scan → join(broadcast 1-row) →
    project. Integer counts replay exactly in DuckDB.

    The round-2 winner may CONTAIN the round-1 sentinel (a 3-char
    source sequence); applying replace(p0)→replace(p1) to raw text
    reproduces the symbol-level merge exactly because merges are
    applied in training order.
    """
    d = _docs(spark, sf_dir)
    vocab = scoped_persist(
        d.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("c"))
    )

    def pair_counts(frame: DataFrame) -> DataFrame:
        return (
            frame.filter(F.length("w") >= 2)
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(1, length(w) - 1), "
                        "i -> substring(w, i, 2))"
                    )
                ).alias("pair"),
                "c",
            )
            .groupBy("pair")
            .agg(F.sum("c").alias("cnt"))
        )

    def top1(frame: DataFrame, alias: str) -> DataFrame:
        return (
            frame.orderBy(F.col("cnt").desc(), F.col("pair").asc())
            .limit(1)
            .select(F.col("pair").alias(alias))
        )

    p0 = top1(pair_counts(vocab), "p0")
    merged = vocab.crossJoin(F.broadcast(p0)).select(
        F.replace(F.col("w"), F.col("p0"), F.lit(BPE_SENT)).alias("w"), "c"
    )
    p1 = top1(pair_counts(merged), "p1")
    enc = (
        d.select("doc_id", "text")
        .crossJoin(F.broadcast(p0))
        .crossJoin(F.broadcast(p1))
        .select(
            "doc_id",
            F.split("text", " ").alias("ws"),
            "p0",
            "p1",
        )
        .select(
            "doc_id",
            F.expr(
                "aggregate(transform(filter(ws, w -> w <> ''), "
                f"w -> length(replace(replace(w, p0, '{BPE_SENT}'), "
                f"p1, '{BPE_SENT2}'))), "
                "0L, (acc, v) -> acc + v)"
            ).alias("n_symbols"),
            F.expr(
                "aggregate(transform(filter(ws, w -> w <> ''), w -> length(w)), "
                "0L, (acc, v) -> acc + v)"
            ).alias("n_chars_in"),
        )
    )
    return enc.select(
        "doc_id",
        F.col("n_chars_in").cast("bigint").alias("n_chars_in"),
        F.col("n_symbols").cast("bigint").alias("n_symbols"),
        (F.col("n_chars_in") - F.col("n_symbols"))
        .cast("bigint")
        .alias("n_merged"),
    )


BOILERPLATE_TOP_K = 20  # report size for the corpus-frequent-gram sweep


def boilerplate_ngrams(spark, sf_dir) -> DataFrame:
    """Corpus-frequent word-3-gram report — the detection half of the
    CCNet/C4-style repeated-content strip (navigation chrome, license
    footers, cookie banners recur across thousands of pages; grams whose
    document frequency is far above background are boilerplate, not
    content). Emits the top ``BOILERPLATE_TOP_K`` grams by document
    frequency with occurrence totals and a basis-point df rate; the
    removal half is a broadcast semi-join of this (tiny) verdict table
    against the gram stream, exactly like ``decontaminate_ngram``.

    Shape for scale: the gram stream is shuffled only for the df
    statistic (inherent — df is gram-keyed); ``count_distinct`` +
    ``count`` plan as Spark's standard two-exchange partial-distinct
    (keyed (gram, doc) then gram), each map-side-combined so exchanges
    carry distinct pairs, not raw occurrences; the report is TakeOrdered
    top-k (no global sort); total_docs enters as a broadcast 1-row side.
    The (df desc, occ desc, gram asc) ordering is a total order, so
    both engines pick identical report rows.
    """
    d = _docs(spark, sf_dir)
    sh = F.expr(
        "CASE WHEN size(ws) < 3 THEN array() "
        "ELSE transform(sequence(0, size(ws) - 3), "
        "i -> concat_ws(' ', slice(ws, i + 1, 3))) END"
    )
    grams = d.withColumn("ws", F.split("text", " ")).select(
        "doc_id", F.explode(sh).alias("shingle")
    )
    total = d.agg(F.count("*").alias("total_docs"))
    stats = grams.groupBy("shingle").agg(
        F.count_distinct("doc_id").cast("int").alias("n_docs"),
        F.count("*").cast("int").alias("n_occ"),
    )
    return (
        stats.crossJoin(F.broadcast(total))
        .select(
            "shingle",
            "n_docs",
            "n_occ",
            F.expr("CAST(n_docs * 10000L DIV total_docs AS INT)").alias("df_bps"),
        )
        .orderBy(F.desc("n_docs"), F.desc("n_occ"), F.asc("shingle"))
        .limit(BOILERPLATE_TOP_K)
    )


ZSCORE_OUTLIER = 2.0  # |z| above this marks a length outlier


def quality_zscore(spark, sf_dir) -> DataFrame:
    """Per-source z-score calibration of document length — the
    cross-source normalization step before mixing heterogeneous crawls
    (a "long" GitHub file and a "long" tweet are different animals; raw
    thresholds over-prune one source and under-prune another). The
    parametric twin of ``winsorize_bounds``' order statistics.

    Cross-engine determinism: per-source count/sum/sum-of-squares are
    EXACT BIGINTs (n_chars ≤ ~10^4, so n·Q and S² stay far under 2^63
    through ~10^9 docs per source; beyond that the sums would carry as
    DECIMAL(38)), and mean/variance/z are then a fixed dag of IEEE
    double ops on identical integers — bit-identical in both engines,
    with no float aggregation-order hazard. Degenerate sources (n < 2
    or zero variance) pin z to 0.0 in both engines.

    Shape for scale: one map-side-combined aggregate to a |sources|-row
    frame, broadcast back onto the doc stream — zero corpus-sized
    shuffles, same plan family as ``temperature_sample``.
    """
    d = _docs(spark, sf_dir).select("doc_id", "source", "n_chars")
    stats = d.groupBy("source").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("n_chars").cast("long").alias("s1"),
        F.sum(F.col("n_chars") * F.col("n_chars")).cast("long").alias("s2"),
    )
    j = d.join(F.broadcast(stats), "source")
    var = (
        (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")).cast("double")
        / (F.col("n") * (F.col("n") - F.lit(1))).cast("double")
    )
    z = (
        F.col("n_chars").cast("double")
        - F.col("s1").cast("double") / F.col("n").cast("double")
    ) / F.sqrt(var)
    z_safe = F.when(
        (F.col("n") < 2) | (F.col("n") * F.col("s2") == F.col("s1") * F.col("s1")),
        F.lit(0.0),
    ).otherwise(F.round(z, 4))
    return j.select(
        "doc_id",
        "source",
        F.col("n_chars").cast("int").alias("n_chars"),
        z_safe.alias("z"),
        (F.abs(z_safe) > ZSCORE_OUTLIER).cast("int").alias("len_outlier"),
    )
