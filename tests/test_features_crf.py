"""Feature columns: vectorized vs scalar equivalence; CRF decode + artifact."""

import numpy as np
import pandas as pd
import pytest

from astrospark.crf import (
    CrfModel,
    shift_codes,
    shift_within_sequences,
    template_values,
    viterbi_batched,
    viterbi_single,
)
from astrospark.features import compute_columns
from astrospark.oracle import scalar_columns
from astrospark.templates import BOUNDARY, N_LABELS, TEMPLATES

TOKENS = [
    "GRB", "020819B", "the", "detect", "(", ")", "[", "]", ".", ",", "-",
    '"', "'", "`", "NGC", "1275", "Magellanic", "x", "X", "3", "GHz", "4",
    "σ", "M", "ALLCAPS", "Ab1", "a1b2", "..", "--", "?!", "%", "I",
]


def test_columns_vectorized_matches_scalar():
    an = np.array([t == "GRB" for t in TOKENS])
    ia = np.array([t in ("GRB", "020819B") for t in TOKENS])
    cols = compute_columns(pd.Series(TOKENS, dtype="object"), an, ia)
    for i, tok in enumerate(TOKENS):
        exp = scalar_columns(tok, bool(an[i]), bool(ia[i]))
        got = [str(np.asarray(c, dtype=object)[i]) for c in cols]
        assert got == exp, tok


def test_shift_codes_matches_shift_strings():
    rng = np.random.default_rng(5)
    col = np.array(list("abcdefghij"), dtype=object)
    seq = np.array([0, 0, 0, 1, 1, 2, 2, 2, 2, 3])
    codes = np.arange(10, dtype=np.int64)
    for d in range(-4, 5):
        s = shift_within_sequences(col, seq, d)
        c = shift_codes(codes, seq, d)
        for i in range(10):
            if c[i] == -1:
                assert s[i] == BOUNDARY
            else:
                assert s[i] == col[c[i]]


def test_viterbi_batched_matches_single():
    rng = np.random.default_rng(9)
    trans = rng.normal(size=(N_LABELS, N_LABELS)).astype(np.float32)
    lengths = [1, 2, 3, 7, 20, 64, 5, 1, 13]
    emits = [rng.normal(size=(T, N_LABELS)).astype(np.float32) for T in lengths]
    seq_ids = np.repeat(np.arange(len(lengths)), lengths)
    flat = np.concatenate(emits)
    batched = viterbi_batched(flat, seq_ids, trans, bucket_size=4)
    pos = 0
    for T, em in zip(lengths, emits):
        single = viterbi_single(em.astype(np.float64), trans.astype(np.float64))
        assert batched[pos : pos + T].tolist() == single.tolist()
        pos += T


def test_emissions_fast_path_matches_template_values(artifacts):
    """The factorized LUT scorer must equal the string-join scorer."""
    _, _, model = artifacts
    rng = np.random.default_rng(2)
    toks = [TOKENS[i] for i in rng.integers(0, len(TOKENS), size=60)]
    an = rng.random(60) < 0.3
    ia = rng.random(60) < 0.3
    cols = compute_columns(pd.Series(toks, dtype="object"), an, ia)
    seq_ids = np.sort(rng.integers(0, 5, size=60))
    fast = model.emissions(cols, seq_ids)
    values = template_values(cols, seq_ids)
    slow = np.zeros_like(fast)
    for k, vals in enumerate(values):
        vocab, w = model.vocabs[k], model.weights[k]
        oov = len(vocab)
        ids = np.array([vocab.get(v, oov) for v in vals], dtype=np.int64)
        slow += w[ids]
    assert np.allclose(fast, slow, atol=1e-4)


def test_model_artifact_roundtrip(tmp_path, artifacts):
    _, _, model = artifacts
    p = str(tmp_path / "w.npz")
    model.save(p)
    m2 = CrfModel.load(p)
    assert np.allclose(model.trans, m2.trans)
    assert len(m2.vocabs) == len(TEMPLATES)
    for a, b in zip(model.weights, m2.weights):
        assert np.allclose(a, b)


def test_compound_int_path_matches_string_path(artifacts):
    """The mixed-radix integer compound probe must be bit-identical to the
    string-join probe, including the NaN→boundary factorize quirk and the
    SEP-bearing-token fallback."""
    _, _, model = artifacts
    assert model._compound_tables() is not None  # shipped vocabs decompose
    rng = np.random.default_rng(3)
    n = 80
    toks = np.array(["alpha", "beta", "NGC", "1275", "SDSS"], dtype=object)
    col0 = toks[rng.integers(0, len(toks), n)].astype(object)
    col0[7] = np.nan  # factorize code -1: boundary on both paths
    cols = [col0] + [np.array(["x"] * n, dtype=object) for _ in range(17)]
    seq = np.zeros(n, dtype=np.int64)
    seq[40:] = 1
    e_int = model.emissions(cols, seq)
    model._ctab = False
    try:
        e_str = model.emissions(cols, seq)
    finally:
        model._ctab = None
    assert np.array_equal(e_int, e_str)

    # a SEP inside a token makes join-equality ambiguous — the scorer must
    # fall back to the string path (and therefore stay equal to it)
    col0_sep = col0.copy()
    col0_sep[3] = "a\x1fb"
    cols[0] = col0_sep
    e_int2 = model.emissions(cols, seq)
    model._ctab = False
    try:
        e_str2 = model.emissions(cols, seq)
    finally:
        model._ctab = None
    assert np.array_equal(e_int2, e_str2)


def test_viterbi_unrolled_tie_breaks_match_scalar():
    """Integer-valued emissions/transitions create exact score ties; the
    unrolled 3-label forward step must reproduce argmax's first-max
    tie-break (lower previous label wins)."""
    rng = np.random.default_rng(0)
    for _ in range(25):
        n_seq = int(rng.integers(1, 30))
        lens = rng.integers(1, 50, n_seq)
        seq = np.repeat(np.arange(n_seq), lens)
        n = int(lens.sum())
        emit = rng.integers(-3, 4, (n, N_LABELS)).astype(np.float64)
        trans = rng.integers(-2, 3, (N_LABELS, N_LABELS)).astype(np.float32)
        got = viterbi_batched(emit, seq, trans)
        starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
        pos = 0
        for s, ln in zip(starts, lens):
            single = viterbi_single(emit[s : s + ln], trans.astype(np.float64))
            assert np.array_equal(got[s : s + ln], single)
