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
