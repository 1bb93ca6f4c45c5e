"""Property-based checks (hypothesis): tokenizer equivalence + reversibility
and kernel-vs-oracle span equality on generated documents."""

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from astrospark.analyzer import tokenize, tokenize_reference_port

# alphabet mixing word chars, digits, delimiters, unicode variants
_ALPHABET = st.sampled_from(
    list("abcXYZ019 .,-()[]\"'`/+=<>!?;:%$^*")
    + ["σ", "β", "–", "—", " ", " ", "\n", "\t", "‰", "°", "≈", "…", "日"]
)
_TEXT = st.text(alphabet=_ALPHABET, max_size=120)


@settings(max_examples=300, deadline=None)
@given(_TEXT)
def test_tokenizer_regex_equals_char_loop(text):
    assert tokenize(text) == tokenize_reference_port(text)


@settings(max_examples=300, deadline=None)
@given(_TEXT)
def test_tokens_tile_input(text):
    assert "".join(tokenize(text)) == text


@settings(max_examples=60, deadline=None)
@given(st.lists(_TEXT, min_size=1, max_size=4), st.sampled_from(["text", "table", "figure"]))
def test_kernel_equals_oracle_on_generated_docs(artifacts, chunks, kind):
    from astrospark.kernel import extract_batch
    from astrospark.oracle import process_document

    vocab, trie, model = artifacts
    spans = []
    off = 0
    for c in chunks:
        spans.append({"kind": kind, "text": c, "media_ref": "", "offset": off})
        off += len(c) + 1
    pdf = pd.DataFrame({"doc_id": ["h0"], "spans": [spans]})
    out = extract_batch(pdf, vocab, trie, model).drop(columns=["end"])
    got = [
        dict(seq=int(r.seq), kind=r.kind, text=r.text, media_ref=r.media_ref, offset=int(r.offset))
        for r in out.itertuples()
    ]
    assert got == process_document(spans, vocab, trie, model)


@given(st.integers(min_value=1, max_value=(1 << 62) - 1))
@settings(max_examples=300, deadline=None)
def test_log2q_bounds_and_floor(x):
    """log2q over the full bigint range: floor(log2 x) recovered exactly
    from the integer part, fractional part in [0, 2^F), and the value
    never exceeds true log2 (mantissa interpolation is a lower bound)."""
    import math

    from astrospark.ops.text import LOG2Q_FBITS, log2q

    v = log2q(x)
    assert v // LOG2Q_FBITS == x.bit_length() - 1
    assert 0 <= v - (x.bit_length() - 1) * LOG2Q_FBITS < LOG2Q_FBITS
    # lower bound with < 0.09-bit slack; exact at powers of two
    assert v <= math.log2(x) * LOG2Q_FBITS + 1e-9
    assert math.log2(x) - v / LOG2Q_FBITS < 0.09


@given(
    st.lists(st.integers(min_value=1, max_value=(1 << 61)), min_size=2, max_size=40)
)
@settings(max_examples=200, deadline=None)
def test_log2q_monotone(xs):
    from astrospark.ops.text import log2q

    xs = sorted(set(xs))
    vals = [log2q(x) for x in xs]
    assert all(a <= b for a, b in zip(vals, vals[1:]))


_WORDS = st.lists(
    st.text(alphabet=st.sampled_from(list("abcdeXYZ019")), min_size=1, max_size=8),
    min_size=0,
    max_size=200,
)


@settings(max_examples=150, deadline=None)
@given(_WORDS, st.lists(st.text(alphabet=st.sampled_from(list("abcXYZ01")), min_size=1, max_size=6), min_size=1, max_size=8))
def test_cmsketch_overestimates_and_cell_merges(words, probe_words):
    """Count-min invariants on arbitrary corpora: (1) every estimate >=
    the true count (collisions only add); (2) cell-level sum-merge of a
    split equals the whole-corpus sketch (the shard/day merge)."""
    import hashlib
    from collections import Counter

    from astrospark.ops.text import CM_D, CM_W

    def bucket(w, r):
        h = hashlib.md5(w.encode()).hexdigest()
        return (int(h[2 * r], 16) * 16 + int(h[2 * r + 1], 16)) % CM_W

    def cells_of(ws):
        c = Counter()
        for w in ws:
            for r in range(CM_D):
                c[(r, bucket(w, r))] += 1
        return c

    whole = cells_of(words)
    half = cells_of(words[::2])
    other = cells_of(words[1::2])
    assert whole == half + other  # Counter + is cell-wise sum

    true = Counter(words)
    for w in probe_words:
        est = min(whole.get((r, bucket(w, r)), 0) for r in range(CM_D))
        assert est >= true.get(w, 0)


@settings(max_examples=150, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=10**9), min_size=0, max_size=120, unique=True),
    st.integers(min_value=1, max_value=8),
    st.integers(min_value=2, max_value=5),
)
def test_bottomk_merge_is_associative_and_order_free(ids, k, n_shards):
    """Bottom-k invariants: merging per-shard bottom-k sets (any
    sharding) then re-taking bottom-k equals the whole-corpus bottom-k,
    and adding documents can only ever REPLACE sample members with
    smaller-hash ones (stability)."""
    import hashlib

    def h(d):
        return hashlib.md5(str(d).encode()).hexdigest()

    hs = sorted((h(d), d) for d in ids)
    whole = hs[:k]

    shards = [ids[i::n_shards] for i in range(n_shards)]
    merged = sorted(
        hd for s in shards for hd in sorted((h(d), d) for d in s)[:k]
    )[:k]
    assert merged == whole

    # growth stability: the sample after adding docs is the bottom-k of
    # (old sample ∪ new docs) — no resampling of survivors
    new_docs = [d + 10**10 for d in ids[:7]]
    grown = sorted((h(d), d) for d in ids + new_docs)[:k]
    via_sample = sorted(whole + [(h(d), d) for d in new_docs])[:k]
    assert grown == via_sample
