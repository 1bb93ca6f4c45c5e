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
