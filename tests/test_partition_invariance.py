"""Physical-layout invariance: every operator's OUTPUT VALUES must be a
pure function of the input tables — never of shuffle partition count or
input split sizing. This is the distributed-correctness property behind
the contract's determinism claims (hash-derived sampling, per-shard
cumsum packing, integer sketch merges, synchronous iterative updates):
at 1000 executors the layout is whatever AQE picks that day, so any
layout-dependence is a silent nondeterminism bug. Each op runs under a
deliberately mismatched pair of configs — few fat partitions vs many
tiny input splits — and must produce identical sorted rows."""

import pytest

from astrospark.ops.caching import cache_scope

SF = "/root/testdata/sf0.001"

# (shuffle.partitions, files.maxPartitionBytes): 2 fat vs 17 skinny
_LAYOUTS = [("2", str(128 * 1024 * 1024)), ("17", str(64 * 1024))]


def _op_cases():
    from astrospark.ops import dedup, graph, similarity, text

    return [
        ("pack_sequences", text.pack_sequences),
        ("quantile_sketch", text.quantile_sketch),
        ("hll_distinct_words", text.hll_distinct_words),
        ("cooccur_pagerank", graph.cooccur_pagerank),
        ("dedup_incremental", dedup.dedup_incremental),
        # round-4 late additions: the BPE winner selection, the bigram-LM
        # joins, the sqrt-threshold rebalance, and the hash-gated negative
        # sample must all survive arbitrary layout re-picks
        ("bpe_merges", text.bpe_merges),
        ("bigram_lm_score", text.bigram_lm_score),
        ("temperature_sample", text.temperature_sample),
        ("containment_pairs", dedup.containment_pairs),
        ("contrastive_negatives", similarity.contrastive_negatives),
        # the argmax tie-break, top-k total order, and broadcast-back
        # moment frames must hold under any layout re-pick
        ("semantic_decontaminate", similarity.semantic_decontaminate),
        ("boilerplate_ngrams", text.boilerplate_ngrams),
        ("quality_zscore", text.quality_zscore),
    ]


@pytest.mark.parametrize("name,op", _op_cases(), ids=lambda c: c if isinstance(c, str) else "")
def test_output_invariant_under_layout(spark, name, op):
    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in ("spark.sql.shuffle.partitions", "spark.sql.files.maxPartitionBytes")
    }
    results = []
    try:
        for parts, split_bytes in _LAYOUTS:
            conf.set("spark.sql.shuffle.partitions", parts)
            conf.set("spark.sql.files.maxPartitionBytes", split_bytes)
            with cache_scope():
                results.append(sorted(map(tuple, op(spark, SF).collect())))
    finally:
        for k, v in saved.items():
            conf.set(k, v)
    assert results[0] == results[1], f"{name} output depends on physical layout"
    assert len(results[0]) > 0
