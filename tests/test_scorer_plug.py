"""Pluggable-scorer contract (SURVEY §2.9): the reference swaps its
sequence scorer by config (wapiti CRF ↔ delft BiLSTM,
resources/config/grobid-astro.yaml:7-8,14-19) with the calling pipeline
unchanged. Our equivalent: two training families (structured averaged
perceptron vs per-token maxent + generative transition prior) producing
the SAME broadcastable artifact shape, decoded by the SAME kernel path.
"""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def both_models():
    from astrospark.corpus import make_corpus
    from astrospark.lexicon import load_artifacts
    from astrospark.train import SCORERS, paragraph_to_sequence

    vocab, trie = load_artifacts()
    paras = make_corpus(100, seed=42)
    n_train = int(len(paras) * 0.8)
    seqs = [
        s
        for text, spans in paras[:n_train]
        if (s := paragraph_to_sequence(text, spans, vocab, trie)) is not None
    ]
    crf = SCORERS["crf"](seqs, n_iter=8, seed=42)
    logistic = SCORERS["logistic"](seqs, n_iter=200, seed=42)
    return vocab, trie, crf, logistic, paras[n_train:]


def test_both_scorers_decode_same_fixture_batch(both_models):
    """One extract_batch call per scorer over the identical fixture batch —
    the kernel takes either artifact without knowing which family it is."""
    from astrospark.fixtures import make_docs
    from astrospark.kernel import extract_batch

    vocab, trie, crf, logistic, _ = both_models
    docs = pd.DataFrame(make_docs(40, seed=5, skew_every=0))
    out_crf = extract_batch(docs, vocab, trie, crf)
    out_log = extract_batch(docs, vocab, trie, logistic)
    assert list(out_crf.columns) == list(out_log.columns)
    # both scorers must find real object spans, media passthrough identical
    assert (out_crf["kind"] == "object").sum() > 50
    assert (out_log["kind"] == "object").sum() > 50
    media_crf = out_crf[out_crf["kind"] == "media"][["doc_id", "media_ref", "offset"]]
    media_log = out_log[out_log["kind"] == "media"][["doc_id", "media_ref", "offset"]]
    assert media_crf.reset_index(drop=True).equals(media_log.reset_index(drop=True))


def test_scorer_quality_floor(both_models):
    """Held-out entity F1: structured scorer strong, local maxent plug
    usable (mirrors the reference's wapiti-vs-delft quality spread)."""
    from astrospark.train import evaluate

    vocab, trie, crf, logistic, eval_paras = both_models
    f_crf = evaluate(crf, eval_paras, vocab, trie)["f1"]
    f_log = evaluate(logistic, eval_paras, vocab, trie)["f1"]
    assert f_crf >= 0.90, f_crf
    assert f_log >= 0.75, f_log


def test_logistic_artifact_round_trips(both_models, tmp_path):
    """The plug family serializes through the SAME save/load/broadcast
    payload format as the default scorer."""
    from astrospark.crf import CrfModel

    vocab, trie, _, logistic, _ = both_models
    p = str(tmp_path / "logistic.npz")
    logistic.save(p)
    back = CrfModel.load(p)
    assert np.allclose(back.trans, logistic.trans, atol=1e-6)
    assert all(
        np.allclose(a, b, atol=1e-6)
        for a, b in zip(back.weights, logistic.weights)
    )
